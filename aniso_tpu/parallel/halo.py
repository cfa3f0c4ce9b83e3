"""Explicit shard_map + ppermute halo exchange for the near field.

The GSPMD path (parallel.api) already lowers the 3x3 near-field stencil to
collective-permute halos chosen by XLA (gated by tests/test_collectives).
This module is the hand-scheduled variant from SURVEY section 7 stage 6:
the one-square boundary ring is exchanged explicitly with
`jax.lax.ppermute` inside `shard_map`, which (a) pins the communication
pattern independent of compiler heuristics, and (b) is the substrate for
overlapping the exchange with interior compute on real ICI meshes.

The reference's analogue is simply OpenMP threads sharing one address
space (KernelFactory.cpp:446-448): the halo IS the new work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.8
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map


def halo_exchange_1(u: jnp.ndarray, axis_name: str, size: int, dim: int):
    """Extend the local block by one slab on each side along `dim`, filled
    from the +-1 neighbours on mesh axis `axis_name` (zeros at the global
    boundary -- identical to the zero padding of the global 3x3 stencil).
    """
    lo_slab = lax.slice_in_dim(u, u.shape[dim] - 1, u.shape[dim], axis=dim)
    hi_slab = lax.slice_in_dim(u, 0, 1, axis=dim)
    fwd = [(i, i + 1) for i in range(size - 1)]
    bwd = [(i + 1, i) for i in range(size - 1)]
    # devices with no source in the permutation receive zeros
    from_prev = lax.ppermute(lo_slab, axis_name, fwd)
    from_next = lax.ppermute(hi_slab, axis_name, bwd)
    return jnp.concatenate([from_prev, u, from_next], axis=dim)


def _patch_3x3_local(ue: jnp.ndarray) -> jnp.ndarray:
    """(lx+2, ly+2, q) halo-extended block -> (q, 3, 3, lx, ly) windows."""
    q = ue.shape[-1]
    patches = jax.lax.conv_general_dilated_patches(
        ue.transpose(2, 0, 1)[None], filter_shape=(3, 3),
        window_strides=(1, 1), padding="VALID",
        precision=lax.Precision.HIGHEST,
    )  # (1, q*9, lx, ly)
    return patches[0].reshape(q, 3, 3, ue.shape[0] - 2, ue.shape[1] - 2)


def make_near_apply_shardmap(mesh: Mesh, mode: int, has_duffy: bool):
    """Build the shard_map near-field matvec for one mode.

    Returns f(near_E, near_cosrw, near_static, sigma_w, duffy_or_None, u)
    with the same semantics as fmm.apply._near_apply, inputs sharded as by
    parallel.api.shard_pytree and u sharded P("x", "y").
    """
    mx, my = mesh.shape["x"], mesh.shape["y"]
    HP = lax.Precision.HIGHEST

    def local(near_E, ncos, nstat, sigma_w, duffy, u):
        ue = halo_exchange_1(u, "x", mx, 0)
        ue = halo_exchange_1(ue, "y", my, 1)
        block = (
            jnp.expm1(-near_E) * ncos[..., None, None]
            + nstat[..., None, None]
        )
        out = jnp.einsum(
            "abtsij,sabij->ijt", block, _patch_3x3_local(ue), precision=HP
        )
        if mode == 0:
            out = out + sigma_w * u
        if duffy is not None:
            out = out + jnp.einsum("tsij,ijs->ijt", duffy, u, precision=HP)
        return out

    duffy_spec = P(None, None, "x", "y") if has_duffy else None
    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(
            P(None, None, None, None, "x", "y"),   # near_E
            P(), P(),                              # cosrw, static stencil
            P("x", "y"),                           # sigma_w
            duffy_spec,                            # duffy (or None)
            P("x", "y"),                           # u
        ),
        out_specs=P("x", "y"),
    )
    if not has_duffy:
        return lambda nE, nc, ns, sw, _d, u: f(nE, nc, ns, sw, None, u)
    return f
