"""Multi-device sharding equivalence (SURVEY.md section 4 consequence).

The suite runs on an 8-virtual-device CPU backend (conftest.py).  These
tests assert that the GSPMD domain-decomposed corrected matvec and the
sharded GMRES solve reproduce the single-device results: the distributed
path may differ only by floating-point reduction order.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aniso_tpu import SolverConfig
from aniso_tpu.solver.operator import TransportSolver
from aniso_tpu.parallel.api import (
    make_mesh,
    replicate,
    shard_field,
    sharded_solver,
)


@pytest.fixture(scope="module")
def fmm_solver():
    cfg = SolverConfig(
        domain_size=16, quad_rule=2, kernel_size=1, g=0.9,
        sing_rule=8, np_cheb=3, dtype="float64",
    )
    solver = TransportSolver(cfg, backend="fmm")
    g = solver.grid
    sigma_s = 8.0 * 0.5 * (1 - np.cos(2 * np.pi * g.nodes_x))
    solver.set_coeff(sigma_s, sigma_s + 0.2)
    return solver


@pytest.fixture(scope="module")
def charge(fmm_solver):
    g = fmm_solver.grid
    return np.exp(-25 * ((g.nodes_x - 0.5) ** 2 + (g.nodes_y - 0.5) ** 2))


def test_mesh_uses_all_devices():
    mesh = make_mesh()
    # conftest requests 8 virtual devices but respects ambient XLA_FLAGS;
    # assert only self-consistency with whatever the backend provides
    assert mesh.devices.size == len(jax.devices())
    if mesh.devices.size == 8:   # as square as possible: 8 -> 2 x 4
        assert sorted(mesh.shape.values()) == [2, 4]


def test_sharded_matvec_matches_single_device(fmm_solver, charge):
    u = jnp.asarray(charge, dtype=fmm_solver.dtype)
    ref = np.asarray(fmm_solver.apply_mode(0, u))

    mesh = make_mesh()
    apply_fn, caches, mode_statics = sharded_solver(fmm_solver, mesh)
    u_sh = shard_field(mesh, u)
    out = apply_fn(caches, mode_statics[0], 0, u_sh)
    # output really is distributed over the mesh
    assert len(out.sharding.device_set) == len(jax.devices())
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12, atol=1e-13)


def test_sharded_gmres_solve_matches_single_device(fmm_solver, charge):
    from aniso_tpu.solver.gmres import gmres

    u = jnp.asarray(charge, dtype=fmm_solver.dtype)
    sigma_s = fmm_solver.sigma_s

    # single device
    b_ref = fmm_solver.apply_mode(0, u)
    res_ref = gmres(
        lambda v: v - fmm_solver.apply_mode(0, sigma_s * v),
        b_ref, restart=30, max_iter=60, tol=1e-10,
    )

    mesh = make_mesh()
    apply_fn, caches, mode_statics = sharded_solver(fmm_solver, mesh)
    u_sh = shard_field(mesh, u)
    sig_sh = shard_field(mesh, sigma_s)

    @jax.jit
    def solve(u0):
        def matvec(v):
            return v - apply_fn(caches, mode_statics[0], 0, sig_sh * v)

        b = apply_fn(caches, mode_statics[0], 0, u0)
        return gmres(matvec, b, restart=30, max_iter=60, tol=1e-10)

    res = solve(u_sh)
    assert float(res.residual) < 1e-10
    np.testing.assert_allclose(
        np.asarray(res.x), np.asarray(res_ref.x), rtol=1e-8, atol=1e-10
    )


def test_shard_field_layout(fmm_solver, charge):
    mesh = make_mesh()
    u = shard_field(mesh, jnp.asarray(charge))
    # spatial dims split over ("x", "y"), per-square quadrature dim local
    shard_shapes = {s.data.shape for s in u.addressable_shards}
    sz, nq = fmm_solver.grid.sz, fmm_solver.grid.nq
    mx, my = mesh.shape["x"], mesh.shape["y"]
    assert shard_shapes == {(sz // mx, sz // my, nq)}
    r = replicate(mesh, jnp.ones((3,)))
    assert len(r.sharding.device_set) == len(jax.devices())
