"""Native host runtime (csrc/aniso_host.cpp) parity vs the JAX reference path."""

import numpy as np
import jax.numpy as jnp
import pytest

from aniso_tpu.core.geometry import make_grid, project_field
from aniso_tpu import native

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


@pytest.fixture(scope="module")
def setup():
    g = make_grid(8, 3)
    rng = np.random.default_rng(7)
    sigma = 1.0 + np.cos(2 * np.pi * g.nodes_x) * np.sin(np.pi * g.nodes_y)
    coeffs = project_field(g, sigma)
    return g, coeffs


@pytest.mark.parametrize("compat", [False, True])
def test_attenuation_matches_jax(setup, compat):
    g, coeffs = setup
    from aniso_tpu.ops.attenuation import line_integral_batch

    rng = np.random.default_rng(3)
    p0 = rng.random((64, 2))
    p1 = rng.random((64, 2))
    want = np.asarray(line_integral_batch(
        g, jnp.asarray(coeffs), jnp.asarray(p0), jnp.asarray(p1),
        max_cross=8, compat_global_basis=compat,
    ))
    got = native.attenuation_batch(g, coeffs, p0, p1, compat)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_attenuation_constant_sigma_exact(setup):
    """E of a constant field is sigma * segment length, to roundoff."""
    g, _ = setup
    coeffs = project_field(g, np.full((g.sz, g.sz, g.nq), 3.0))
    p0 = np.array([[0.05, 0.1], [0.9, 0.85], [0.1, 0.9]])
    p1 = np.array([[0.95, 0.8], [0.1, 0.15], [0.85, 0.05]])
    want = 3.0 * np.linalg.norm(p1 - p0, axis=1)
    got = native.attenuation_batch(g, coeffs, p0, p1)
    np.testing.assert_allclose(got, want, rtol=1e-13)


def test_smooth_rows_matches_dense(setup):
    g, coeffs = setup
    from aniso_tpu.ops.dense import build_dense_smooth

    for m in (0, 1):
        want = np.asarray(build_dense_smooth(
            g, m, jnp.asarray(coeffs), dtype=jnp.float64, use_native=False,
        ))
        got = np.vstack([
            native.smooth_rows(g, coeffs, m, 0, 100),
            native.smooth_rows(g, coeffs, m, 100, g.n_nodes - 100),
        ])
        np.testing.assert_allclose(got, want, rtol=1e-11, atol=1e-13)


def test_csv_roundtrip(tmp_path):
    x = np.random.default_rng(0).standard_normal(33)
    p = str(tmp_path / "x.csv")
    native.write_csv(p, x)
    back = native.read_csv(p, 33)
    np.testing.assert_array_equal(back, x)
    # interoperable with the Python IO layer
    from aniso_tpu.utils.io import load_result_csv
    np.testing.assert_array_equal(load_result_csv(p, n=33), x)
