"""Pallas TPU kernel for the factored M2L translate (SURVEY section 7.2-3).

The factored fine-level path (fmm.smooth.build_m2l_patch_fine) computes, per
parity class and box (x, y):

    E_row = patch[x, y, :] @ W          (Q -> P = r * OB)
    out[x, y, a] = sum_q  exp(-E_row[a*OB + q]) * cosr[a*OB + q] * g[x, y, q]

The XLA fallback (fmm.apply._m2l_translate) materializes the E chunks to
HBM between the matmul and the contraction -- ~1.8 GB of transient traffic
per matvec at the 256^2 leaf.  This kernel fuses the whole pipeline inside
VMEM: one (T, Q) @ (Q, OB) MXU matmul per (row-tile, a) grid step, exp and
the cosr scaling on the VPU, and a lane reduction against the gathered
multipoles -- E never leaves the chip.

Enabled for factored levels on the TPU backend via ANISO_PALLAS_M2L=1
(fmm.apply checks the env; the XLA path remains the default and the
fallback everywhere else).  Reference counterpart: the M2L half of
downPassFast (bbfmm.h:1041-1129) -- per-node dgemv from a per-node cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(patch_ref, W_ref, cosr_ref, g_ref, out_ref):
    E = jax.lax.dot_general(
        patch_ref[:], W_ref[:],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    op = jnp.exp(-E) * cosr_ref[0][None, :]
    out_ref[:, 0] = jnp.sum(op * g_ref[:], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def m2l_translate_class_pallas(patch_c, W_c, cosr_c, g_c, interpret=False):
    """One parity class: (m2, m2, Q), (Q, P), (P,), (m2, m2, OB) ->
    (m2, m2, r).  P = r * OB with the pair axis in (a, o, b) order."""
    m2, Q = patch_c.shape[0], patch_c.shape[-1]
    P = W_c.shape[-1]
    OB = g_c.shape[-1]
    r = P // OB
    NB = m2 * m2
    T = min(512, NB)
    # grid=(NB // T, r) drops trailing rows if T doesn't divide NB; today
    # m2 is a power of two so NB % T == 0 always holds -- fail loudly if a
    # future tree shape breaks that instead of silently computing garbage
    assert NB % T == 0, f"pallas M2L tile {T} must divide boxes {NB}"

    out = pl.pallas_call(
        _kernel,
        grid=(NB // T, r),
        in_specs=[
            # index_map returns BLOCK indices (units of the block shape)
            pl.BlockSpec((T, Q), lambda i, a: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Q, OB), lambda i, a: (0, a),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, OB), lambda i, a: (a, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, OB), lambda i, a: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, 1), lambda i, a: (i, a),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, r), patch_c.dtype),
        interpret=interpret,
    )(
        patch_c.reshape(NB, Q),
        W_c,
        cosr_c.reshape(r, OB),
        g_c.reshape(NB, OB),
    )
    return out.reshape(m2, m2, r)
