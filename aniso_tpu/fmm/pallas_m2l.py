"""Pallas TPU kernels for the fused M2L translate (SURVEY section 7.2-3).

Two kernels, one per E-cache representation (fmm.smooth):

factored level -- per parity class and box (x, y):

    E_row = patch[x, y, :] @ W          (Q -> P = r * OB)
    out[x, y, a] = sum_q  exp(-E_row[a*OB + q]) * cosr[a*OB + q] * g[x, y, q]

  The XLA fallback (fmm.apply._m2l_translate) materializes the re-formed E
  chunks to HBM between the matmul and the contraction -- ~GBs of transient
  traffic per matvec at 256^2+.  The kernel fuses the pipeline inside VMEM:
  one (T, Q) @ (Q, OB) MXU matmul per (row-tile, a) grid step, exp and the
  cosr scaling on the VPU, a lane reduction against the gathered
  multipoles -- E never leaves the chip.

dense level -- E is stored (NB, P) in HBM; XLA still materializes the
  fused operator exp(-E) * cosr as an HBM transient (elementwise producers
  don't fuse into dot_general), tripling the level's traffic.  The kernel
  reads each E tile once into VMEM and does exp + scale + reduce in place:
  the level's HBM traffic drops to its E footprint.

Mosaic tiling: every BlockSpec keeps its last two dims either equal to the
array dims or (8, 128)-aligned -- the operand layouts are reshaped so OB
(= 27 r, not 128-aligned) only ever appears as a full trailing dim.

OPT-IN, not the default: round-3 chip qualification (TPU v5e) found both
kernels correct on hardware (<= 7e-8 vs XLA) but SLOWER than the XLA
paths at the measured sizes (256^2 all-dense: ~31 ms vs 7.6 ms XLA;
factored: ~parity) -- XLA's transient traffic is cheaper than this
kernel's per-grid-step overheads there, so fmm.apply defaults
ANISO_PALLAS_M2L to '0' (XLA).  Round-4 follow-up at the 512^2 factored
leaf (the config where the kernel's motivation was strongest): Mosaic
FAILS to compile the factored kernel at those shapes ("failed to
legalize operation 'func.return'", m2 = 256 grid;
benchmarks/results_pallas_512.json), while the XLA factored path runs
117.4 ms/apply -- and the round-4 dense redesign (4D y-minor storage +
fused multiply-reduce, fmm.apply) removed the transient traffic this
kernel was written to avoid, so the production answer at every measured
size is XLA.  Enable with ANISO_PALLAS_M2L=1, or 'auto' (Pallas on
non-CPU backends); f64 always runs XLA.  Reference counterpart: the M2L
half of downPassFast (bbfmm.h:1041-1129) -- per-node dgemv from a
per-node cache.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _factored_kernel(patch_ref, W_ref, cosr_ref, g_ref, out_ref):
    E = jax.lax.dot_general(
        patch_ref[:], W_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    op = jnp.exp(-E) * cosr_ref[0]
    out_ref[0, :, 0] = jnp.sum(op * g_ref[:], axis=1)


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

    # per-a operand layouts with OB as a full trailing dim (Mosaic-legal)
    W3 = W_c.reshape(Q, r, OB).transpose(1, 0, 2)      # (r, Q, OB)
    cosr3 = cosr_c.reshape(r, 1, OB)

    out = pl.pallas_call(
        _factored_kernel,
        grid=(NB // T, r),
        in_specs=[
            # index_map returns BLOCK indices (units of the block shape)
            pl.BlockSpec((T, Q), lambda i, a: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Q, OB), lambda i, a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, OB), lambda i, a: (a, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, OB), lambda i, a: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, 1), lambda i, a: (a, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, NB, 1), patch_c.dtype),
        interpret=interpret,
    )(
        patch_c.reshape(NB, Q),
        W3,
        cosr3,
        g_c.reshape(NB, OB),
    )
    return out[:, :, 0].T.reshape(m2, m2, r)


def _dense_kernel(E_ref, cosr_ref, g_ref, out_ref):
    op = jnp.exp(-E_ref[:]) * cosr_ref[:][None]        # (T, r, OB)
    out_ref[:] = jnp.sum(op * g_ref[:][:, None, :], axis=-1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def m2l_translate_class_dense_pallas(E_c, cosr_c, g_c, interpret=False):
    """One parity class from the dense E cache: (m2, m2, P), (P,),
    (m2, m2, OB) -> (m2, m2, r).  Reads E exactly once (no operator
    transient); all-r outputs per row tile."""
    m2, P = E_c.shape[0], E_c.shape[-1]
    OB = g_c.shape[-1]
    r = P // OB
    NB = m2 * m2
    # E tile (T, r, OB) f32 must sit in VMEM twice (double buffering)
    T = min(128, NB)
    assert NB % T == 0, f"pallas dense M2L tile {T} must divide boxes {NB}"

    out = pl.pallas_call(
        _dense_kernel,
        grid=(NB // T,),
        in_specs=[
            pl.BlockSpec((T, r, OB), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, OB), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((T, OB), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((T, r), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((NB, r), E_c.dtype),
        interpret=interpret,
    )(
        E_c.reshape(NB, r, OB),
        cosr_c.reshape(r, OB),
        g_c.reshape(NB, OB),
    )
    return out.reshape(m2, m2, r)
