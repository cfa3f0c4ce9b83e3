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


def _up_pass(static, leaf_level: int, u: jnp.ndarray):
    """Leaf charges -> multipoles per level: dict level -> (m, m, r)."""
    m2m = static["m2m"]
    M = {leaf_level: jnp.einsum("ck,ijk->ijc", static["p2m_w"], u)}
    for level in range(leaf_level, coarsest_m2l_level(), -1):
        child = M[level]
        acc = 0.0
        for hx in (0, 1):
            for hy in (0, 1):
                acc = acc + jnp.einsum(
                    "ac,ijc->ija", m2m[hx, hy], child[hx::2, hy::2]
                )
        M[level - 1] = acc
    return M


def _m2l_level(M_l, real_ops, smooth_ops):
    """V-list translation at one level -> local expansions (m, m, r)."""
    m = M_l.shape[0]
    r = M_l.shape[-1]
    pad = jnp.pad(M_l, ((3, 3), (3, 3), (0, 0)))
    L = jnp.zeros_like(M_l)
    for px in (0, 1):
        for py in (0, 1):
            offs = vlist_offsets(px, py)
            m2 = m // 2
            acc = jnp.zeros((m2, m2, r), dtype=M_l.dtype)
            for oi, (di, dj) in enumerate(offs):
                src = pad[
                    px + di + 3 : px + di + 3 + 2 * m2 : 2,
                    py + dj + 3 : py + dj + 3 + 2 * m2 : 2,
                ]
                acc = acc + jnp.einsum(
                    "ab,ijb->ija", real_ops[(px, py)][oi], src
                )
                if smooth_ops is not None:
                    acc = acc + jnp.einsum(
                        "ijab,ijb->ija", smooth_ops[(px, py)][:, :, oi], src
                    )
            L = L.at[px::2, py::2].add(acc)
    return L


def _down_pass(static, leaf_level: int, M, m2l_real, m2l_smooth):
    m2m = static["m2m"]
    lo = coarsest_m2l_level()
    L = None
    for level in range(lo, leaf_level + 1):
        T = _m2l_level(
            M[level],
            m2l_real[level],
            m2l_smooth[level] if m2l_smooth is not None else None,
        )
        if L is None:
            L = T
        else:
            Lnext = jnp.zeros_like(T)
            for hx in (0, 1):
                for hy in (0, 1):
                    Lnext = Lnext.at[hx::2, hy::2].set(
                        jnp.einsum("ac,ija->ijc", m2m[hx, hy], L)
                    )
            L = Lnext + T
    return L


def fmm_apply_mode(leaf_level: int, static, mode_data, u: jnp.ndarray):
    """Corrected mode matvec K_m u including the 1/2pi scaling.

    mode_data: {'near_real': (3,3,nq,nq), 'near_smooth': (sz,sz,3,3,nq,nq),
                'm2l_real': {level: {class: (n_off,r,r)}},
                'm2l_smooth': {level: {class: (m2,m2,n_off,r,r)}}}
    """
    from ..ops.stencil import apply_near_stencil
    from .smooth import shifted_patch

    M = _up_pass(static, leaf_level, u)
    L = _down_pass(
        static, leaf_level, M, mode_data["m2l_real"], mode_data["m2l_smooth"]
    )
    far = jnp.einsum("kc,ijc->ijk", static["l2t"], L)
    upatch = shifted_patch(u, 1)                       # (sz,sz,3,3,nq)
    near_s = jnp.einsum("ijabts,ijabs->ijt", mode_data["near_smooth"], upatch)
    near_r = apply_near_stencil(mode_data["near_real"], u)
    return (far + near_s + near_r) / (2.0 * jnp.pi)
