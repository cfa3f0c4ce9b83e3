"""Quadrature generation vs closed forms and reference table values."""

import numpy as np
import pytest

from aniso_tpu.core.quadrature import gauss_legendre, affine_01, tensor_rule


def test_low_order_closed_form():
    r3 = gauss_legendre(3)
    assert np.allclose(sorted(r3.points), [-np.sqrt(3 / 5), 0.0, np.sqrt(3 / 5)],
                       atol=1e-15)
    assert np.allclose(sorted(r3.weights), sorted([5 / 9, 8 / 9, 5 / 9]),
                       atol=1e-15)


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 16, 64, 128])
def test_polynomial_exactness(n):
    r = gauss_legendre(n)
    # exact for degree 2n-1
    for d in range(0, 2 * n):
        exact = 2.0 / (d + 1) if d % 2 == 0 else 0.0
        got = np.sum(r.weights * r.points ** d)
        assert abs(got - exact) < 1e-13 * max(1, abs(exact)), (n, d)


def test_weights_sum():
    for n in (1, 4, 32, 128):
        assert abs(np.sum(gauss_legendre(n).weights) - 2.0) < 1e-14


def test_affine_01():
    r = affine_01(gauss_legendre(8))
    assert np.all(r.points > 0) and np.all(r.points < 1)
    assert abs(np.sum(r.weights) - 1.0) < 1e-14
    # integral of x on [0,1]
    assert abs(np.sum(r.weights * r.points) - 0.5) < 1e-14


def test_tensor_rule_ordering():
    # reference Geometry.cpp:28-35: k = r*deg + c, x follows r, y follows c
    r = gauss_legendre(3)
    qx, qy, w = tensor_rule(r)
    assert qx[1] == qx[2] == r.points[0]
    assert qy[3] == r.points[0] and qy[4] == r.points[1]
    assert abs(np.sum(w) - 4.0) < 1e-14
