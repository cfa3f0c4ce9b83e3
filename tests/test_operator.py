"""Dense corrected matvec vs the scalar-loop reference-semantics oracle,
plus end-to-end GMRES solves."""

import numpy as np
import jax.numpy as jnp
import pytest

from aniso_tpu.core.config import SolverConfig
from aniso_tpu.core.geometry import make_grid
from aniso_tpu.ops.fields import project
from aniso_tpu.solver.operator import TransportSolver

from reference_impl import apply_mapping_reference


def _fields(grid):
    sig_s = 4.0 * 0.5 * (1 - np.cos(2 * np.pi * grid.nodes_x))
    sig_t = sig_s + 0.2
    return sig_s, sig_t


@pytest.mark.parametrize("m", [0, 1, 2])
@pytest.mark.parametrize("compat", [False, True])
def test_apply_mode_vs_reference_semantics(rng, m, compat):
    sz, deg = 3, 2
    cfg = SolverConfig(domain_size=sz, quad_rule=deg, kernel_size=2,
                       sing_rule=4, compat_global_basis=compat)
    solver = TransportSolver(cfg)
    grid = solver.grid
    sig_s, sig_t = _fields(grid)
    solver.set_coeff(sig_s, sig_t)

    u = rng.standard_normal((sz, sz, grid.nq))
    got = np.asarray(solver.apply_mode(m, jnp.asarray(u)))
    want = apply_mapping_reference(
        grid, m, u, solver.sigma_t_coeff, cfg.sing_rule, compat=compat
    )
    assert np.allclose(got, want, rtol=1e-9, atol=1e-11), np.abs(got - want).max()


def test_end_to_end_single_mode(rng):
    """Minimum end-to-end slice: isotropic g=0 solve, residual verified."""
    sz, deg = 4, 2
    cfg = SolverConfig(domain_size=sz, quad_rule=deg, kernel_size=1, g=0.0,
                       sing_rule=6, tol=1e-10, restart=30, max_iter=100)
    solver = TransportSolver(cfg)
    grid = solver.grid
    sig_s, sig_t = _fields(grid)
    solver.set_coeff(sig_s, sig_t)

    q = np.exp(-25 * ((grid.nodes_x - 0.5) ** 2 + (grid.nodes_y - 0.5) ** 2))
    res = solver.solve(q)
    assert bool(res.converged), float(res.residual)
    # verify the residual claim independently
    x = res.x
    b = solver.rhs(jnp.asarray(q)[None])
    r = np.asarray(solver.forward(x) - b)
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(b))
    assert rel < 5e-10, rel


def test_end_to_end_multimode(rng):
    """N=2 anisotropic solve; mode coupling via chi weights."""
    sz, deg = 3, 2
    cfg = SolverConfig(domain_size=sz, quad_rule=deg, kernel_size=2, g=0.5,
                       sing_rule=6, tol=1e-10, restart=30, max_iter=100)
    solver = TransportSolver(cfg)
    grid = solver.grid
    sig_s, sig_t = _fields(grid)
    solver.set_coeff(sig_s, sig_t)

    N = cfg.kernel_size
    q = np.zeros((N, sz, sz, grid.nq))
    q[0] = np.exp(-25 * ((grid.nodes_x - 0.5) ** 2 + (grid.nodes_y - 0.5) ** 2))
    res = solver.solve(q)
    assert bool(res.converged), float(res.residual)
    x = res.x
    b = solver.rhs(jnp.asarray(q))
    r = np.asarray(solver.forward(x) - b)
    rel = np.linalg.norm(r) / np.linalg.norm(np.asarray(b))
    assert rel < 5e-10, rel


def test_chi_weights():
    cfg = SolverConfig(kernel_size=3, g=0.5, domain_size=2, quad_rule=1)
    s = TransportSolver(cfg)
    chi = np.asarray(s.chi)
    g, N = 0.5, 3
    want = (g ** np.arange(N) - g ** N) / (1 - g ** N)
    assert np.allclose(chi, want)
    assert chi[0] == 1.0
