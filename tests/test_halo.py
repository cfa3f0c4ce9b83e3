"""shard_map + ppermute near-field equals the single-device near field."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aniso_tpu import SolverConfig
from aniso_tpu.solver.operator import TransportSolver
from aniso_tpu.fmm.apply import _near_apply
from aniso_tpu.parallel.api import make_mesh, shard_field, shard_pytree, replicate
from aniso_tpu.parallel.halo import make_near_apply_shardmap, halo_exchange_1


def test_halo_exchange_matches_zero_pad():
    """1-axis halo exchange == global zero padding, on the virtual mesh."""
    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh()
    mx = mesh.shape["x"]
    sz = 8 * mx
    u = jnp.arange(sz * 4, dtype=jnp.float32).reshape(sz, 4)

    f = shard_map(
        lambda v: halo_exchange_1(v, "x", mx, 0)[1:-1],
        mesh=mesh, in_specs=P("x"), out_specs=P("x"),
    )
    out = f(shard_field(mesh, u) if False else jax.device_put(
        u, jax.sharding.NamedSharding(mesh, P("x"))))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(u))


@pytest.mark.parametrize("mode", [0, 1])
def test_near_apply_shardmap_matches_single_device(mode):
    cfg = SolverConfig(
        domain_size=16, quad_rule=2, kernel_size=2, g=0.9,
        sing_rule=4, np_cheb=3, dtype="float64",
    )
    s = TransportSolver(cfg, backend="fmm")
    g = s.grid
    sig = 8 * 0.5 * (1 - np.cos(2 * np.pi * g.nodes_x))
    s.set_coeff(sig, sig + 0.2)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.random((g.sz, g.sz, g.nq)))

    ms = s._mode_statics[mode]
    ref = np.asarray(_near_apply(s._caches, ms, mode, u))

    mesh = make_mesh()
    if mesh.devices.size < 2:
        pytest.skip("needs multiple devices")
    caches = shard_pytree(mesh, s._caches)
    ms_sh = shard_pytree(mesh, ms)
    duffy = ms_sh.get("duffy")
    f = make_near_apply_shardmap(mesh, mode, duffy is not None)
    out = f(
        caches["near_E"], ms_sh["near_cosrw"], ms_sh["near_static"],
        caches["sigma_w"], duffy, shard_field(mesh, u),
    )
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-12, atol=1e-13)
