"""GMRES unit tests against direct solves."""

import numpy as np
import jax
import jax.numpy as jnp

from aniso_tpu.solver.gmres import gmres


def _random_system(rng, n, cond=10.0):
    A = rng.standard_normal((n, n))
    # shift to make it well conditioned and nonsymmetric
    A = A / np.linalg.norm(A, 2) + np.eye(n) * cond / 5
    b = rng.standard_normal(n)
    return jnp.asarray(A), jnp.asarray(b)


def test_converges_to_direct(rng):
    A, b = _random_system(rng, 50)
    res = gmres(lambda v: A @ v, b, restart=20, max_iter=200, tol=1e-12)
    x_direct = np.linalg.solve(np.asarray(A), np.asarray(b))
    assert bool(res.converged)
    assert np.allclose(np.asarray(res.x), x_direct, rtol=1e-9, atol=1e-10)


def test_no_restart_needed(rng):
    A, b = _random_system(rng, 30)
    res = gmres(lambda v: A @ v, b, restart=40, max_iter=100, tol=1e-12)
    assert bool(res.converged)
    assert int(res.iterations) <= 35


def test_restarted(rng):
    A, b = _random_system(rng, 60)
    res = gmres(lambda v: A @ v, b, restart=8, max_iter=400, tol=1e-10)
    assert bool(res.converged)
    r = np.asarray(A) @ np.asarray(res.x) - np.asarray(b)
    assert np.linalg.norm(r) / np.linalg.norm(np.asarray(b)) < 1e-9


def test_warm_start(rng):
    A, b = _random_system(rng, 40)
    x_direct = np.linalg.solve(np.asarray(A), np.asarray(b))
    res = gmres(lambda v: A @ v, b, x0=jnp.asarray(x_direct),
                restart=10, max_iter=50, tol=1e-10)
    assert int(res.iterations) <= 1
    assert bool(res.converged)


def test_left_preconditioner(rng):
    A, b = _random_system(rng, 50)
    Minv = jnp.linalg.inv(A)  # perfect preconditioner
    res = gmres(lambda v: A @ v, b, restart=10, max_iter=50, tol=1e-10,
                precond=lambda v: Minv @ v)
    assert bool(res.converged)
    assert int(res.iterations) <= 3
    x_direct = np.linalg.solve(np.asarray(A), np.asarray(b))
    assert np.allclose(np.asarray(res.x), x_direct, rtol=1e-8, atol=1e-9)


def test_multidim_shape(rng):
    A, b = _random_system(rng, 48)
    b3 = b.reshape(4, 4, 3)
    res = gmres(lambda v: (A @ v.reshape(-1)).reshape(4, 4, 3), b3,
                restart=20, max_iter=100, tol=1e-11)
    assert res.x.shape == (4, 4, 3)
    assert bool(res.converged)


def test_jit_compatible(rng):
    A, b = _random_system(rng, 32)

    @jax.jit
    def solve(bb):
        return gmres(lambda v: A @ v, bb, restart=16, max_iter=64, tol=1e-11).x

    x = solve(b)
    assert np.allclose(np.asarray(A) @ np.asarray(x), np.asarray(b), atol=1e-8)
