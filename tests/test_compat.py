"""Global-basis compat mode: coefficient-transform equivalence and FMM
support (the reference evaluates per-square Legendre expansions at global
coordinates, KernelFactory.cpp:180-205; ops.compat turns that quirk into an
exact per-square coefficient transform so the translation-invariant fast
path applies unchanged)."""

import numpy as np
import jax.numpy as jnp

from aniso_tpu.core.config import SolverConfig
from aniso_tpu.core.geometry import make_grid
from aniso_tpu.ops.fields import project
from aniso_tpu.ops.attenuation import make_sigma_eval, make_line_integral
from aniso_tpu.ops.compat import to_local_equivalent
from aniso_tpu.solver.operator import TransportSolver


def test_transform_matches_global_eval(rng):
    g = make_grid(8, 3)
    f = 2.0 + np.sin(2 * np.pi * g.nodes_x) * g.nodes_y \
        + 0.1 * rng.standard_normal(g.nodes_x.shape)
    c = project(g, jnp.asarray(f))
    ct = to_local_equivalent(g, c)
    ev_g = make_sigma_eval(g, compat_global_basis=True)
    ev_l = make_sigma_eval(g, compat_global_basis=False)
    x = jnp.asarray(rng.uniform(0, 1, 300))
    y = jnp.asarray(rng.uniform(0, 1, 300))
    np.testing.assert_allclose(
        np.asarray(ev_l(ct, x, y)), np.asarray(ev_g(c, x, y)),
        rtol=1e-12, atol=1e-12,
    )


def test_transform_matches_global_line_integral(rng):
    g = make_grid(8, 2)
    f = 1.0 + g.nodes_x + 0.3 * g.nodes_y ** 2
    c = project(g, jnp.asarray(f))
    ct = to_local_equivalent(g, c)
    li_g = make_line_integral(g, 8, compat_global_basis=True)
    li_l = make_line_integral(g, 8, compat_global_basis=False)
    for _ in range(5):
        a = rng.uniform(0, 1, 2)
        b = rng.uniform(0, 1, 2)
        Eg = float(li_g(c, a[0], a[1], b[0], b[1]))
        El = float(li_l(ct, a[0], a[1], b[0], b[1]))
        assert np.isclose(Eg, El, rtol=1e-12, atol=1e-14)


def test_fmm_compat_matches_dense_compat(rng):
    """The FMM backend under compat_global_basis == the (oracle-validated)
    dense compat backend, within Chebyshev truncation error."""
    sz, deg = 8, 3
    cfg = SolverConfig(domain_size=sz, quad_rule=deg, kernel_size=1, g=0.95,
                       sing_rule=8, np_cheb=4, compat_global_basis=True)
    dense = TransportSolver(cfg, backend="dense")
    fmm = TransportSolver(cfg, backend="fmm")
    g = dense.grid
    sig_s = 16 * 0.5 * (1 - np.cos(2 * np.pi * g.nodes_x))
    dense.set_coeff(sig_s, sig_s + 0.2)
    fmm.set_coeff(sig_s, sig_s + 0.2)
    u = rng.standard_normal((sz, sz, g.nq))
    a = np.asarray(dense.apply_mode(0, jnp.asarray(u)))
    b = np.asarray(fmm.apply_mode(0, jnp.asarray(u)))
    err = np.abs(a - b).max() / np.abs(a).max()
    assert err < 6e-3, err


def test_multimode_forward_one_program_matches_dense(rng):
    """The single-jit multi-mode forward/rhs (fmm) == the dense per-mode
    loop composition (aniso.m:121-156 semantics)."""
    sz, deg, N = 8, 2, 3
    cfg = SolverConfig(domain_size=sz, quad_rule=deg, kernel_size=N, g=0.7,
                       sing_rule=6, np_cheb=5)
    dense = TransportSolver(cfg, backend="dense")
    fmm = TransportSolver(cfg, backend="fmm")
    g = dense.grid
    sig_s = 4.0 + 2.0 * np.sin(2 * np.pi * g.nodes_x) * g.nodes_y
    dense.set_coeff(sig_s, sig_s + 0.2)
    fmm.set_coeff(sig_s, sig_s + 0.2)
    u = jnp.asarray(rng.standard_normal((N, sz, sz, g.nq)))
    fa = np.asarray(dense.forward(u))
    fb = np.asarray(fmm.forward(u))
    assert np.abs(fa - fb).max() / np.abs(fa).max() < 1e-3
    ra = np.asarray(dense.rhs(u))
    rb = np.asarray(fmm.rhs(u))
    assert np.abs(ra - rb).max() / np.abs(ra).max() < 1e-3
