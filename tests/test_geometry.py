"""Grid geometry, Legendre projection, and nearMapping semantics."""

import numpy as np
import pytest
from scipy.special import eval_legendre

from aniso_tpu.core.geometry import make_grid
from aniso_tpu.core.legendre import (
    legendre_all_np,
    basis2d_np,
    basis_norms_np,
)


def test_legendre_recurrence_vs_scipy(rng):
    x = rng.uniform(-1, 1, size=50)
    p = legendre_all_np(6, x)
    for n in range(6):
        assert np.allclose(p[n], eval_legendre(n, x), atol=1e-14)


def test_norms_analytic():
    g = make_grid(4, 3)
    deg = 3
    expect = np.array(
        [2.0 / np.sqrt((2 * n + 1) * (2 * k + 1)) for n in range(deg) for k in range(deg)]
    )
    assert np.allclose(g.norms, expect, atol=1e-13)


def test_node_layout():
    # reference Geometry.cpp:50-61
    sz, deg = 4, 3
    g = make_grid(sz, deg)
    dx = 1.0 / sz
    i, j, k = 2, 1, 5
    r, c = divmod(k, deg)
    assert np.isclose(g.nodes_x[i, j, k], (0.5 + i) * dx + 0.5 * g.rule.points[r] * dx)
    assert np.isclose(g.nodes_y[i, j, k], (0.5 + j) * dx + 0.5 * g.rule.points[c] * dx)
    assert np.isclose(np.sum(g.weights), 1.0)  # area of unit square


def test_projection_roundtrip(rng):
    # fields polynomial of degree < deg per square are reproduced exactly
    sz, deg = 4, 3
    g = make_grid(sz, deg)
    # global polynomial of degree <= deg-1 in each variable
    f = 1.5 + 2.0 * g.nodes_x - 0.7 * g.nodes_y + 0.3 * g.nodes_x ** 2 * g.nodes_y
    coeffs = np.einsum("bq,ijq->ijb", g.proj, f)
    # evaluate expansion back at the nodes (local coordinates)
    bt = basis2d_np(deg, g.qx, g.qy) / g.norms[:, None]  # (nq_basis, nq_pts)
    recon = np.einsum("bq,ijb->ijq", bt, coeffs)
    assert np.allclose(recon, f, atol=1e-12)


def test_near_mapping_interpolates(rng):
    """nearMapping maps (nodal*sqrt w) to (refined values * sqrt(rw)).

    Semantics from refineAddOnFast (KernelFactory.cpp:684-699): with
    oldValues = u * sqrt(w2d), newValues_r = uhat(refined_r) * sqrt(rw_r)
    where uhat is the per-square Legendre interpolant of u.
    """
    g = make_grid(4, 3)
    u = np.cos(g.qx * 1.3) * (1.0 + 0.5 * g.qy)  # arbitrary smooth nodal values
    # interpolant coefficients and direct evaluation at refined points
    coeffs = g.proj @ u
    bt_ref = basis2d_np(g.deg, g.refine_x, g.refine_y) / g.norms[:, None]
    direct = (bt_ref.T @ coeffs) * np.sqrt(g.refine_w)
    via_mapping = g.near_mapping @ (u * g.sqrt_w2d)
    assert np.allclose(via_mapping, direct, atol=1e-12)


def test_refined_quadrature_integrates():
    g = make_grid(4, 3)
    assert np.isclose(np.sum(g.refine_w), 4.0)  # area of [-1,1]^2
    # refined rule integrates smooth functions accurately
    val = np.sum(g.refine_w * np.exp(g.refine_x) * g.refine_y ** 2)
    exact = (np.e - 1 / np.e) * (2.0 / 3.0)
    assert abs(val - exact) < 1e-7
