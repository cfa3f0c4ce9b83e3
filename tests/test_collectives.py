"""Collective-traffic gates for the SPMD matvec (VERDICT round-1 item 6).

The domain-decomposed corrected matvec must scale by exchanging halos,
not by gathering the volume: GSPMD should lower the 3x3 near-field conv
and the parity-plane M2L gathers to `collective-permute` of O(halo)
bytes over the mesh, with no `all-gather` of field-sized operands.
These tests compile the real sharded program on the virtual device mesh
and assert on the HLO it actually emits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aniso_tpu import SolverConfig
from aniso_tpu.solver.operator import TransportSolver
from aniso_tpu.parallel.api import make_mesh, shard_field, sharded_solver
from aniso_tpu.parallel.inspect import collective_stats, compiled_collective_stats


def test_collective_stats_parser():
    hlo = """
  %ag = f32[8,16]{1,0} all-gather(f32[1,16]{1,0} %p), replica_groups={}
  %cp = f32[2,16]{1,0} collective-permute(f32[2,16]{1,0} %q)
  %cp2 = f32[2,16]{1,0} collective-permute-start(f32[2,16]{1,0} %q)
  %cp3 = f32[2,16]{1,0} collective-permute-done(f32[2,16]{1,0} %cp2)
  %ar = f32[] all-reduce(f32[] %r), to_apply=%sum
"""
    st = collective_stats(hlo)
    assert st.counts == {"all-gather": 1, "collective-permute": 2,
                         "all-reduce": 1}
    assert st.bytes["all-gather"] == 8 * 16 * 4
    assert st.bytes["collective-permute"] == 2 * (2 * 16 * 4)


@pytest.fixture(scope="module")
def sharded_matvec():
    cfg = SolverConfig(
        domain_size=32, quad_rule=2, kernel_size=1, g=0.9,
        sing_rule=4, np_cheb=3, dtype="float32",
    )
    s = TransportSolver(cfg, backend="fmm")
    g = s.grid
    sig = 8 * 0.5 * (1 - np.cos(2 * np.pi * g.nodes_x))
    s.set_coeff(sig, sig + 0.2)
    mesh = make_mesh()
    apply_fn, caches, mode_statics = sharded_solver(s, mesh)
    u = shard_field(mesh, jnp.asarray(np.random.default_rng(0).random((32, 32, 4)), jnp.float32))
    compiled = apply_fn.lower(caches, mode_statics[0], 0, u).compile()
    return s, mesh, compiled


def test_sharded_matvec_moves_halo_not_volume(sharded_matvec):
    s, mesh, compiled = sharded_matvec
    if mesh.devices.size < 2:
        pytest.skip("needs a multi-device mesh")
    st = compiled_collective_stats(compiled)
    field_bytes = s.grid.n_nodes * 4
    # no all-gather at all: every spatial exchange must be a permute
    assert st.counts.get("all-gather", 0) == 0, st
    assert st.counts.get("collective-permute", 0) > 0, st
    # O(halo) gate: total permuted bytes well under one volume per device
    # (a volume-moving design would transfer >= n_dev * field_bytes;
    # measured on 8 virtual devices: ~55 KB vs 32^2*4*4 = 16 KB field,
    # i.e. ~3.4 fields summed across the whole FMM hierarchy + caches)
    n_dev = mesh.devices.size
    assert st.total_bytes() < n_dev * field_bytes, (
        st, n_dev * field_bytes,
    )
