"""Exact line-integral attenuation vs closed forms and a direct
transcription of the reference's split-and-integrate semantics."""

import numpy as np
import jax.numpy as jnp
import pytest

from aniso_tpu.core.geometry import make_grid
from aniso_tpu.ops.attenuation import (
    make_line_integral,
    make_sigma_eval,
    line_integral_batch,
)
from aniso_tpu.ops.fields import project


def _project(grid, f):
    vals = f(grid.nodes_x, grid.nodes_y)
    return jnp.asarray(np.einsum("bq,ijq->ijb", grid.proj, vals))


def test_constant_sigma(rng):
    g = make_grid(8, 3)
    coeffs = _project(g, lambda x, y: 3.7 + 0 * x)
    li = make_line_integral(g, max_cross=8)
    for _ in range(20):
        p = rng.uniform(0.01, 0.99, size=4)
        E = li(coeffs, *p)
        d = np.hypot(p[0] - p[2], p[1] - p[3])
        assert np.isclose(float(E), 3.7 * d, rtol=1e-12), p


def test_polynomial_sigma_exact(rng):
    # sigma(x,y) = 1 + 2x + y^2 is degree <=2 per square -> exact per-cell rule
    g = make_grid(4, 3)
    coeffs = _project(g, lambda x, y: 1.0 + 2.0 * x + y * y)
    li = make_line_integral(g, max_cross=4)

    def exact(x0, y0, x1, y1):
        # parametrize t in [0,1]
        L = np.hypot(x1 - x0, y1 - y0)
        # integral of sigma along the segment
        from scipy.integrate import quad
        f = lambda t: (1.0 + 2.0 * (x0 + t * (x1 - x0)) + (y0 + t * (y1 - y0)) ** 2)
        v, _ = quad(f, 0.0, 1.0, epsabs=1e-14, epsrel=1e-14)
        return v * L

    for _ in range(20):
        p = rng.uniform(0.01, 0.99, size=4)
        E = float(li(coeffs, *p))
        assert np.isclose(E, exact(*p), rtol=1e-11), p


def _reference_line_integral(grid, coeffs, x0, y0, x1, y1, compat):
    """Direct transcription of the reference algorithm (KernelFactory.cpp:67-190):
    recursively bisect until endpoints lie in the same or adjacent cells,
    split at the cell boundary, Gauss-integrate per piece."""
    sz, deg = grid.sz, grid.deg
    norms = grid.norms
    pts, wts = grid.rule.points, grid.rule.weights
    coeffs = np.asarray(coeffs).reshape(sz * sz, deg * deg)

    def sigma_hat(x, y, ci, cj):
        if compat:
            ex, ey = x, y
        else:
            ex = 2.0 * (x * sz - ci) - 1.0
            ey = 2.0 * (y * sz - cj) - 1.0
        from aniso_tpu.core.legendre import legendre_all_np
        px = legendre_all_np(deg, np.array(ex))
        py = legendre_all_np(deg, np.array(ey))
        b = (px[:, None] * py[None, :]).reshape(-1) / norms
        return float(b @ coeffs[ci * sz + cj])

    def helper(x0, y0, x1, y1):
        ci = min(max(int(np.floor((x0 + x1) / 2 * sz)), 0), sz - 1)
        cj = min(max(int(np.floor((y0 + y1) / 2 * sz)), 0), sz - 1)
        ret = 0.0
        for i in range(deg):
            x = (x0 + x1) / 2 + (x0 - x1) / 2 * pts[i]
            y = (y0 + y1) / 2 + (y0 - y1) / 2 * pts[i]
            ret += sigma_hat(x, y, ci, cj) * wts[i]
        return ret * np.hypot(x0 - x1, y0 - y1) / 2.0

    def rec(x0, y0, x1, y1):
        c0, c1 = int(np.floor(x0 * sz)), int(np.floor(x1 * sz))
        r0, r1 = int(np.floor(y0 * sz)), int(np.floor(y1 * sz))
        if abs(c0 - c1) <= 1 and abs(r0 - r1) <= 1:
            # split at the (at most one per axis) crossing
            ts = [0.0, 1.0]
            if c0 != c1:
                xc = max(c0, c1) / sz
                ts.append((xc - x0) / (x1 - x0))
            if r0 != r1:
                yc = max(r0, r1) / sz
                ts.append((yc - y0) / (y1 - y0))
            ts = sorted(ts)
            tot = 0.0
            for a, b in zip(ts[:-1], ts[1:]):
                tot += helper(x0 + a * (x1 - x0), y0 + a * (y1 - y0),
                              x0 + b * (x1 - x0), y0 + b * (y1 - y0))
            return tot
        xm, ym = (x0 + x1) / 2, (y0 + y1) / 2
        return rec(x0, y0, xm, ym) + rec(xm, ym, x1, y1)

    return rec(x0, y0, x1, y1)


@pytest.mark.parametrize("compat", [False, True])
def test_vs_reference_transcription(rng, compat):
    g = make_grid(8, 3)
    # heterogeneous sigma_t: reference main.cpp:38-40
    coeffs = _project(g, lambda x, y: 16 * 0.5 * (1 - np.cos(2 * np.pi * x)) + 0.2)
    li = make_line_integral(g, max_cross=8, compat_global_basis=compat)
    for _ in range(15):
        p = rng.uniform(0.01, 0.99, size=4)
        mine = float(li(coeffs, *p))
        ref = _reference_line_integral(g, coeffs, *p, compat)
        assert np.isclose(mine, ref, rtol=1e-10, atol=1e-13), (p, mine, ref)


def test_batch_shape(rng):
    g = make_grid(4, 2)
    coeffs = _project(g, lambda x, y: 1.0 + x)
    p0 = jnp.asarray(rng.uniform(0.1, 0.9, size=(5, 7, 2)))
    p1 = jnp.asarray(rng.uniform(0.1, 0.9, size=(5, 7, 2)))
    E = line_integral_batch(g, coeffs, p0, p1, max_cross=4)
    assert E.shape == (5, 7)
    assert np.all(np.asarray(E) >= 0)


def test_sigma_eval_matches_field():
    g = make_grid(4, 3)
    f = lambda x, y: 2.0 + x * y
    coeffs = _project(g, f)
    ev = make_sigma_eval(g)
    x = jnp.asarray(g.nodes_x.reshape(-1))
    y = jnp.asarray(g.nodes_y.reshape(-1))
    got = np.asarray(ev(coeffs, x, y))
    assert np.allclose(got, f(np.asarray(x), np.asarray(y)), atol=1e-12)
