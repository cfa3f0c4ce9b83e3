"""The implicit-quadtree Chebyshev FMM matvec as batched tensor sweeps.

Reference counterpart: bbfmm.h upPass/downPass (:825-945) -- recursive
pointer-tree traversals with per-node dgemv.  Here each phase is a handful
of einsums over whole levels:

  P2M   one (r, nq) matrix shared by every leaf (weights folded in)
  M2M   4 static (r, r) tensor-product transfers, level -> level-1
  M2L   per level: translation-invariant ops for cos(m theta)/r (40 distinct
        (r, r) matrices -- the redundancy the reference's per-node Cache
        stores in GBs, Aniso.cpp:19-47) + the sigma-dependent smooth cache
  L2L   transpose of M2M
  L2T   transpose of P2M (no weights)

plus the U-list near field: sigma-dependent smooth blocks and the
translation-invariant real-kernel correction stencil (ops.near).  The real
kernel's own U-list is *omitted*: the reference subtracts those coarse 3x3
contributions right back out in nearRemoval (KernelFactory.cpp:445-478), so
skipping both is exact (and tighter than the reference, whose FMM U-list and
removal sets differ slightly by tree geometry).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import Grid
from ..ops.near import real_kernel_np
from .cheb import cheb_grid_2d, m2m_tensor, p2m_matrix
from .structure import TreeConfig, coarsest_m2l_level, vlist_offsets


def build_real_m2l(
    grid: Grid, tcfg: TreeConfig, np_cheb: int, modes, dtype=jnp.float32
):
    """TI M2L operators for cos(m theta)/r.

    Returns dict level -> dict m -> dict class -> (n_off, r, r) jnp arrays.
    """
    out = {}
    for level in range(coarsest_m2l_level(), tcfg.leaf_level + 1):
        B = tcfg.box_size_squares(level)
        cheb = (cheb_grid_2d(np_cheb) + 1.0) / 2.0 * B * grid.dx  # (r, 2)
        lv = {m: {} for m in modes}
        for px in (0, 1):
            for py in (0, 1):
                offs = vlist_offsets(px, py)
                ops = {m: [] for m in modes}
                for (di, dj) in offs:
                    shift = np.array([di, dj]) * B * grid.dx
                    src = cheb[None, :, :] + shift
                    tgt = cheb[:, None, :]
                    for m in modes:
                        k = real_kernel_np(
                            m, src[..., 0], src[..., 1], tgt[..., 0], tgt[..., 1]
                        )
                        ops[m].append(k)
                for m in modes:
                    lv[m][(px, py)] = jnp.asarray(
                        np.stack(ops[m]), dtype=dtype
                    )
        out[level] = lv
    return out


def build_fmm_static(grid: Grid, np_cheb: int, dtype=jnp.float32) -> dict:
    """Static sweep operators shared by every mode and every sigma."""
    p2m = p2m_matrix(grid.qx, grid.qy, np_cheb)      # (r, nq)
    wglob = grid.w2d * 0.25 * grid.dx * grid.dx
    return {
        "p2m_w": jnp.asarray(p2m * wglob[None, :], dtype=dtype),
        "l2t": jnp.asarray(p2m.T, dtype=dtype),
        "m2m": jnp.asarray(m2m_tensor(np_cheb), dtype=dtype),
    }


@functools.lru_cache(maxsize=None)
def parity_shift_table_np() -> np.ndarray:
    """(4, 27, 4) int: per class c = 2px+py and V offset o, the source
    parity plane and its box-grid shift: (sx, sy, shx+1, shy+1).

    Source box 2x+px+di has absolute axis index a = px+di in [-2, 3]
    (structure.axis_offsets), i.e. parity sx = a mod 2 on the coarse
    (m/2, m/2) plane shifted by shx = (a - sx)/2 in {-1, 0, 1}: every
    V-list source is at most ONE box away on its parity plane.  This is
    what makes M2L a halo-1 stencil under spatial sharding (GSPMD's
    supported halo regime) instead of a stride-2 window conv.
    """
    out = np.empty((4, 27, 4), dtype=np.int64)
    for px in (0, 1):
        for py in (0, 1):
            for o, (di, dj) in enumerate(vlist_offsets(px, py)):
                ax, ay = px + di, py + dj
                sx, sy = ax & 1, ay & 1
                out[2 * px + py, o] = (
                    sx, sy, (ax - sx) // 2 + 1, (ay - sy) // 2 + 1
                )
    return out


def fuse_m2l_level(real_lv: dict, smooth_lv: dict, dtype) -> jnp.ndarray:
    """Fold the TI real ops into the per-box smooth cache at one level.

    real_lv: {(px,py): (27, r, r)}; smooth_lv: {(px,py): (m2, m2, 27, r, r)}
    -> (4, m2, m2, 27, r, r) with class order c = 2*px + py.  One fused
    tensor per level makes the whole V-list translation a single batched
    contraction on the MXU (cf. the reference's per-node cached dgemvs,
    bbfmm.h:1041-1129).
    """
    per_class = []
    for px in (0, 1):
        for py in (0, 1):
            s = jnp.asarray(smooth_lv[(px, py)], dtype=dtype)
            rl = jnp.asarray(real_lv[(px, py)], dtype=dtype)
            per_class.append(s + rl[None, None])
    return jnp.stack(per_class)


def _up_pass(static, leaf_level: int, u: jnp.ndarray):
    """Leaf charges -> multipoles per level: dict level -> (m, m, r).

    One einsum per level: the 4 child->parent transfers are batched through
    the (2, 2, r, r) m2m tensor acting on (m2, 2, m2, 2, r) children.
    """
    m2m = static["m2m"]
    M = {leaf_level: jnp.einsum("ck,ijk->ijc", static["p2m_w"], u)}
    for level in range(leaf_level, coarsest_m2l_level(), -1):
        child = M[level]
        m2 = child.shape[0] // 2
        r = child.shape[-1]
        c4 = child.reshape(m2, 2, m2, 2, r)
        M[level - 1] = jnp.einsum("hgac,xhygc->xya", m2m, c4)
    return M


def _m2l_level(M_l, fused_ops):
    """V-list translation at one level -> local expansions (m, m, r).

    fused_ops: (4, m2, m2, 27, r, r).  Multipoles are split into the 4 box
    parity planes; every V-list source is then a <= 1-box shift of one plane
    (parity_shift_table_np), so the whole gather is 36 static zero-padded
    slices -- a halo-1 stencil that shards cleanly over a device mesh (a
    stride-2 window conv here needs a 5-wide halo, which GSPMD mis-shards
    for small per-device box counts).  The translation itself is one batched
    einsum per parity class over (offset, source-coeff).
    """
    m = M_l.shape[0]
    r = M_l.shape[-1]
    m2 = m // 2
    # parity planes P[gx][gy][x, y] = M[2x+gx, 2y+gy], each zero-padded by
    # one box and pre-sliced into its 9 shifts (views, nothing materalized
    # until the stack below)
    P4 = M_l.reshape(m2, 2, m2, 2, r)
    shifted = [[None] * 2 for _ in range(2)]
    for gx in (0, 1):
        for gy in (0, 1):
            pad = jnp.pad(P4[:, gx, :, gy], ((1, 1), (1, 1), (0, 0)))
            shifted[gx][gy] = [
                [pad[a : a + m2, b : b + m2] for b in range(3)]
                for a in range(3)
            ]
    tab = parity_shift_table_np()
    outs = []
    for c in range(4):
        gsel = jnp.stack(
            [
                shifted[tab[c, o, 0]][tab[c, o, 1]][tab[c, o, 2]][tab[c, o, 3]]
                for o in range(tab.shape[1])
            ]
        )  # (27, m2, m2, r)
        outs.append(jnp.einsum("xyoab,oxyb->xya", fused_ops[c], gsel))
    # interleave the 4 parity classes: L[2x+px, 2y+py] = outs[2px+py][x, y]
    return (
        jnp.stack(outs)
        .reshape(2, 2, m2, m2, r)
        .transpose(2, 0, 3, 1, 4)
        .reshape(m, m, r)
    )


def _down_pass(static, leaf_level: int, M, m2l_fused):
    """M2L + L2L sweep; one fused M2L and one L2L einsum per level."""
    m2m = static["m2m"]
    lo = coarsest_m2l_level()
    L = None
    for level in range(lo, leaf_level + 1):
        T = _m2l_level(M[level], m2l_fused[level])
        if L is None:
            L = T
        else:
            m2 = L.shape[0]
            r = L.shape[-1]
            Lc = jnp.einsum("hgac,xya->xhygc", m2m, L)
            L = Lc.reshape(2 * m2, 2 * m2, r) + T
    return L


def _patch_3x3(u: jnp.ndarray) -> jnp.ndarray:
    """(sz, sz, q) -> (q, 3, 3, sz, sz) zero-padded neighbour windows
    (one im2col instead of 9 shifted slices)."""
    q = u.shape[-1]
    inp = u.transpose(2, 0, 1)[None]
    patches = jax.lax.conv_general_dilated_patches(
        inp, filter_shape=(3, 3), window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
    )  # (1, q*9, sz, sz)
    return patches[0].reshape(q, 3, 3, u.shape[0], u.shape[1])


def fmm_apply_mode(leaf_level: int, static, mode_data, u: jnp.ndarray):
    """Corrected mode matvec K_m u including the 1/2pi scaling.

    mode_data: {'near': (sz,sz,3,3,nq,nq) fused smooth+real U-list blocks,
                'm2l':  {level: (4, m2, m2, 27, r, r) fused V-list ops}}
    (the reference's six-pass corrected matvec, main.cpp:78-119, collapsed
    into one up sweep, one fused translation per level, and one U-list
    contraction).
    """
    M = _up_pass(static, leaf_level, u)
    L = _down_pass(static, leaf_level, M, mode_data["m2l"])
    far = jnp.einsum("kc,ijc->ijk", static["l2t"], L)
    near = jnp.einsum("ijabts,sabij->ijt", mode_data["near"], _patch_3x3(u))
    return (far + near) / (2.0 * jnp.pi)
