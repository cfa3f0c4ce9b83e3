"""Duffy singular quadrature vs adaptive integration."""

import numpy as np
import pytest
from scipy import integrate

from aniso_tpu.core.geometry import make_grid
from aniso_tpu.ops.duffy import duffy_tables


def test_partition_covers_square():
    g = make_grid(2, 3)
    X, Y, W = duffy_tables(3, 8, g.qx, g.qy)
    # the 8 triangles tile [-1,1]^2: plain integration weight sums to area 4
    assert np.allclose(np.sum(W, axis=1), 4.0, atol=1e-12)
    assert np.all(X >= -1 - 1e-12) and np.all(X <= 1 + 1e-12)
    assert np.all(Y >= -1 - 1e-12) and np.all(Y <= 1 + 1e-12)


def test_smooth_integrand():
    g = make_grid(2, 2)
    X, Y, W = duffy_tables(2, 10, g.qx, g.qy)
    f = lambda x, y: np.exp(0.3 * x) * np.cos(0.5 * y)
    exact = (np.exp(0.3) - np.exp(-0.3)) / 0.3 * (2 * np.sin(0.5) / 0.5) / 2 * 2
    # exact = int e^{0.3x} dx * int cos(0.5 y) dy on [-1,1]^2
    exact = ((np.exp(0.3) - np.exp(-0.3)) / 0.3) * (2 * np.sin(0.5) / 0.5)
    got = np.sum(W * f(X, Y), axis=1)
    assert np.allclose(got, exact, rtol=1e-10)


def _exact_inv_r_over_square(tx, ty):
    """Closed form of int_{[-1,1]^2} 1/|p - t| dp: per-quadrant
    int_0^a int_0^b 1/r = a asinh(b/a) + b asinh(a/b)."""
    total = 0.0
    for a in (1.0 - tx, 1.0 + tx):
        for b in (1.0 - ty, 1.0 + ty):
            total += a * np.arcsinh(b / a) + b * np.arcsinh(a / b)
    return total


@pytest.mark.parametrize("k", [0, 4, 8])
def test_singular_integrand(k):
    """int_square 1 / |p - t_k| dp via Duffy vs the closed form.

    At ns=32 the fan rule is converged to machine precision; at the
    production orders (8-10, data.cfg:24 / aniso.m:24) accuracy is ~1e-4,
    which is a property of the reference scheme itself.
    """
    deg = 3
    g = make_grid(2, deg)
    tx, ty = g.qx[k], g.qy[k]
    exact = _exact_inv_r_over_square(tx, ty)
    errs = []
    for ns in (8, 32):
        X, Y, W = duffy_tables(deg, ns, g.qx, g.qy)
        r = np.sqrt((X[k] - tx) ** 2 + (Y[k] - ty) ** 2)
        got = np.sum(W[k] / np.where(r == 0, 1.0, r))
        errs.append(abs(got - exact))
    assert errs[-1] < 1e-12, (k, errs)
    assert errs[0] < 2e-4  # production-order sanity
