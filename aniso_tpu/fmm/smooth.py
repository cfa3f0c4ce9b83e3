"""Sigma-dependent caches for the attenuated ("smooth") kernel.

The smooth kernel (exp(-E) - 1) cos(m theta) / r is the only sigma_t-
dependent part of the operator.  Its caches are the TPU analogue of the
reference's FMM cache passes (runKernelsCache, KernelFactory.cpp:323-334;
downPassCache bbfmm.h:948-1039):

  * near blocks: (sz, sz, 3, 3, nq, nq) dense 3x3-neighbour blocks -- the
    U-list of the implicit tree (leaf = one grid square);
  * M2L cache: per level / parity class / V-list offset, (m/2, m/2, r, r)
    operators between scaled Chebyshev grids.

E for every (pair) family is computed with the static segment-quadrature
stencil (ops.segment_stencil): a gather-free einsum of precomputed weights
with a shifted patch of sigma_t Legendre coefficients.  The kernel factor
cos(m theta)/r and distances are translation invariant and static per
family, so the per-mode caches come almost for free once E is known.

Coarse levels (box size >= 4 squares) have few boxes but long segments; they
use the generic per-pair path (ops.attenuation) in fixed-size chunks so the
compiled program is small and reused across levels.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..core.geometry import Grid
from ..ops.segment_stencil import near_pair_weights, segment_weights
from ..ops.attenuation import make_line_integral
from .cheb import cheb_grid_2d
from .structure import TreeConfig, vlist_offsets


def shifted_patch(field: jnp.ndarray, half: int) -> jnp.ndarray:
    """(sz, sz, q) -> (sz, sz, 2h+1, 2h+1, q) zero-padded neighbour stack."""
    sz = field.shape[0]
    w = 2 * half + 1
    pad = jnp.pad(field, ((half, half), (half, half), (0, 0)))
    return jnp.stack(
        [
            jnp.stack([pad[a : a + sz, b : b + sz] for b in range(w)], axis=2)
            for a in range(w)
        ],
        axis=2,
    )


def near_pair_positions(grid: Grid):
    """Static physical (dx_vec, dy_vec, r) for near pairs (3,3,nq_t,nq_s)."""
    dx = grid.dx
    tx = 0.5 * dx + 0.5 * grid.qx * dx
    ty = 0.5 * dx + 0.5 * grid.qy * dx
    offs = np.array([-1.0, 0.0, 1.0])
    sx = (0.5 + offs)[:, None] * dx + 0.5 * grid.qx[None, :] * dx  # (3, nq)
    sy = (0.5 + offs)[:, None] * dx + 0.5 * grid.qy[None, :] * dx
    dxv = sx[:, None, None, :] - tx[None, None, :, None]   # (3,1,nq_t,nq_s)
    dxv = np.broadcast_to(dxv, (3, 3, grid.nq, grid.nq))
    dyv = sy[None, :, None, :] - ty[None, None, :, None]
    dyv = np.broadcast_to(dyv, (3, 3, grid.nq, grid.nq))
    r = np.sqrt(dxv ** 2 + dyv ** 2)
    return dxv, dyv, r


def build_near_E(grid: Grid, coeffs: jnp.ndarray, dtype=jnp.float32):
    """E for all near pairs: (sz, sz, 3, 3, nq_t, nq_s)."""
    W = near_pair_weights(grid)          # (3,3,nq,nq,3,3,nq_b) static f64
    W = jnp.asarray(W, dtype=dtype)
    patch = shifted_patch(coeffs.astype(dtype), 1)   # (sz,sz,3,3,nq_b)
    E = jnp.einsum("abtscdq,ijcdq->ijabts", W, patch)
    return E * grid.dx


def build_near_smooth_blocks(
    grid: Grid,
    coeffs: jnp.ndarray,
    modes,
    sigma_nodes: jnp.ndarray | None = None,
    dtype=jnp.float32,
):
    """Near smooth blocks per mode acting on *raw* charge.

    Returns dict m -> (sz, sz, 3, 3, nq_t, nq_s) with entries
    smooth_m(src, tgt) * w_glob[src]; the m = 0 self-node diagonal is
    sigma_hat(node) (reference KernelFactory.cpp:260).
    """
    E = build_near_E(grid, coeffs, dtype)
    dxv, dyv, r = near_pair_positions(grid)
    wsrc = jnp.asarray(
        grid.w2d * 0.25 * grid.dx * grid.dx, dtype=dtype
    )  # (nq_s,)
    r_j = jnp.asarray(r, dtype=dtype)
    safe = jnp.where(r_j == 0.0, 1.0, r_j)
    factor = jnp.expm1(-E) / safe        # (sz,sz,3,3,nq,nq)

    ang = np.arctan2(dyv, dxv)
    out = {}
    for m in modes:
        cosm = jnp.asarray(np.cos(m * ang), dtype=dtype)
        block = factor * cosm
        if m == 0 and sigma_nodes is not None:
            # diagonal of the self block: kernel value = sigma_hat(node)
            diag = jnp.eye(grid.nq, dtype=dtype)
            selfmask = jnp.zeros((3, 3), dtype=dtype).at[1, 1].set(1.0)
            mask = selfmask[:, :, None, None] * diag[None, None]
            block = block * (1.0 - mask)
            block = block + mask * sigma_nodes.astype(dtype)[:, :, None, None, :, None]
        else:
            block = jnp.where(r_j == 0.0, 0.0, block)
        out[m] = block * wsrc
    return out


# ---------------------------------------------------------------------------
# M2L smooth cache
# ---------------------------------------------------------------------------


def build_m2l_smooth_level_fine(
    grid: Grid,
    tcfg: TreeConfig,
    level: int,
    np_cheb: int,
    coeffs: jnp.ndarray,
    modes,
    dtype=jnp.float32,
):
    """M2L smooth cache at a fine level (box size B in {1, 2} squares) via
    the static patch-stencil einsum.

    Returns dict m -> dict (px, py) -> (m2, m2, n_off, r, r) arrays, where
    m2 = 2^level / 2 and n_off = len(vlist_offsets(px, py)).
    """
    B = tcfg.box_size_squares(level)
    r = np_cheb * np_cheb
    cheb = (cheb_grid_2d(np_cheb) + 1.0) / 2.0 * B    # (r, 2) cell units
    half = 3 * B + (B - 1)  # patch halo in cells; common patch [-3B, 4B)
    # common patch covers cells [-3B, 4B) per axis relative to box corner
    PX = 7 * B
    patch_lo = np.array([-3 * B, -3 * B])

    m_boxes = tcfg.boxes(level)
    out = {m: {} for m in modes}

    # build static weights + kernel factors per parity class
    for px in (0, 1):
        for py in (0, 1):
            offs = vlist_offsets(px, py)
            n_off = len(offs)
            p0 = np.empty((n_off, r, r, 2))
            p1 = np.empty((n_off, r, r, 2))
            for oi, (di, dj) in enumerate(offs):
                src = cheb[None, :, :] + np.array([di * B, dj * B])
                tgt = cheb[:, None, :]
                p0[oi] = np.broadcast_to(src, (r, r, 2))
                p1[oi] = np.broadcast_to(tgt, (r, r, 2))
            W = segment_weights(
                grid,
                p0.reshape(-1, 2),
                p1.reshape(-1, 2),
                patch_lo=patch_lo,
                patch_shape=(PX, PX),
            ).reshape(n_off, r, r, PX, PX, grid.nq)
            W = jnp.asarray(W, dtype=dtype)

            # patch of coefficients per box of this parity class
            # cells: x = (2*I2+px)*B + patch_lo + cx
            m2 = m_boxes // 2
            pad = 3 * B
            cpad = jnp.pad(
                coeffs.astype(dtype), ((pad, pad + B), (pad, pad + B), (0, 0))
            )
            rows = []
            for cx in range(PX):
                cols = []
                start_x = px * B + cx  # + pad + patch_lo = cancel: pad-3B=0
                for cy in range(PX):
                    start_y = py * B + cy
                    sl = cpad[
                        start_x : start_x + 2 * B * m2 : 2 * B,
                        start_y : start_y + 2 * B * m2 : 2 * B,
                    ]
                    cols.append(sl)
                rows.append(jnp.stack(cols, axis=2))
            patch = jnp.stack(rows, axis=2)     # (m2, m2, PX, PX, nq)

            E = jnp.einsum("pcdq,xycdq->xyp", W.reshape(-1, PX, PX, grid.nq), patch)
            E = (E * grid.dx).reshape(m2, m2, n_off, r, r)

            # kernel factor
            dx_phys = grid.dx
            dvec = np.empty((n_off, r, r, 2))
            for oi, (di, dj) in enumerate(offs):
                src = (cheb[None, :, :] + np.array([di * B, dj * B])) * dx_phys
                tgt = cheb[:, None, :] * dx_phys
                dvec[oi] = src - tgt
            rr = np.sqrt(dvec[..., 0] ** 2 + dvec[..., 1] ** 2)
            ang = np.arctan2(dvec[..., 1], dvec[..., 0])
            inv_r = jnp.asarray(1.0 / rr, dtype=dtype)
            base = jnp.expm1(-E) * inv_r[None, None]
            for m in modes:
                cosm = jnp.asarray(np.cos(m * ang), dtype=dtype)
                out[m][(px, py)] = base * cosm[None, None]
    return out


def build_m2l_smooth_level_coarse(
    grid: Grid,
    tcfg: TreeConfig,
    level: int,
    np_cheb: int,
    coeffs: jnp.ndarray,
    modes,
    dtype=jnp.float32,
    chunk: int = 4096,
):
    """M2L smooth cache at a coarse level (box >= 4 squares) via the generic
    per-pair line-integral path, chunked to keep compiles small and shared.
    """
    B = tcfg.box_size_squares(level)
    r = np_cheb * np_cheb
    dx = grid.dx
    cheb = (cheb_grid_2d(np_cheb) + 1.0) / 2.0 * B    # cell units in box
    m_boxes = tcfg.boxes(level)
    m2 = m_boxes // 2

    # host-side E assembly: native OpenMP engine when present (the
    # reference's C++ cache-pass role, KernelFactory.cpp:550-609), else the
    # generic JAX per-pair path in pieces sized so each piece crosses <= 8
    # cells/axis
    from .. import native
    use_native = native.available()
    if use_native:
        coeffs_np = np.asarray(coeffs, np.float64)
        pair_E = None
    else:
        span = 5 * B
        n_pieces = max(1, -(-span // 6))
        li = make_line_integral(grid, 8, n_pieces=n_pieces)
        pair_E = jax.jit(
            jax.vmap(lambda c, a, b: li(c, a[0], a[1], b[0], b[1]),
                     in_axes=(None, 0, 0))
        )

    out = {m: {} for m in modes}
    for px in (0, 1):
        for py in (0, 1):
            offs = vlist_offsets(px, py)
            n_off = len(offs)
            # box corner cells for this class
            I2 = np.arange(m2)
            bx = ((2 * I2 + px) * B)[:, None]
            by = ((2 * I2 + py) * B)[None, :]
            # endpoints for all (box, off, pair): build in cell units
            # assemble in chunks over the flattened pair axis
            E_all = np.empty((m2, m2, n_off, r, r), dtype=np.float64)
            dvec = np.empty((n_off, r, r, 2))
            for oi, (di, dj) in enumerate(offs):
                src_rel = cheb[None, :, :] + np.array([di * B, dj * B])
                tgt_rel = cheb[:, None, :]
                dvec[oi] = (src_rel - tgt_rel) * dx
                # absolute positions: (m2, m2, r, r, 2)
                tgt = np.empty((m2, m2, r, r, 2))
                src = np.empty((m2, m2, r, r, 2))
                tgt[..., 0] = (bx[:, :, None, None] + tgt_rel[None, None, :, :, 0]) * dx
                tgt[..., 1] = (by[:, :, None, None] + tgt_rel[None, None, :, :, 1]) * dx
                src[..., 0] = (bx[:, :, None, None] + src_rel[None, None, :, :, 0]) * dx
                src[..., 1] = (by[:, :, None, None] + src_rel[None, None, :, :, 1]) * dx
                flat_s = src.reshape(-1, 2)
                flat_t = tgt.reshape(-1, 2)
                n_pairs = flat_s.shape[0]
                if use_native:
                    Es = native.attenuation_batch(
                        grid, coeffs_np, flat_s, flat_t
                    )
                else:
                    Es = np.empty(n_pairs)
                    for st in range(0, n_pairs, chunk):
                        en = min(st + chunk, n_pairs)
                        seg_s = np.zeros((chunk, 2)); seg_s[: en - st] = flat_s[st:en]
                        seg_t = np.zeros((chunk, 2)); seg_t[: en - st] = flat_t[st:en]
                        Echunk = pair_E(coeffs.astype(dtype),
                                        jnp.asarray(seg_s, dtype=dtype),
                                        jnp.asarray(seg_t, dtype=dtype))
                        Es[st:en] = np.asarray(Echunk)[: en - st]
                E_all[:, :, oi] = Es.reshape(m2, m2, r, r)

            rr = np.sqrt(dvec[..., 0] ** 2 + dvec[..., 1] ** 2)
            ang = np.arctan2(dvec[..., 1], dvec[..., 0])
            base = np.expm1(-E_all) / rr[None, None]
            for m in modes:
                cosm = np.cos(m * ang)
                out[m][(px, py)] = jnp.asarray(
                    base * cosm[None, None], dtype=dtype
                )
    return out


def build_m2l_smooth_cache(
    grid: Grid,
    tcfg: TreeConfig,
    np_cheb: int,
    coeffs: jnp.ndarray,
    modes,
    dtype=jnp.float32,
):
    """Full per-level M2L smooth cache: dict level -> (per-mode per-class)."""
    from .structure import coarsest_m2l_level

    cache = {}
    for level in range(coarsest_m2l_level(), tcfg.leaf_level + 1):
        B = tcfg.box_size_squares(level)
        if B <= 2:
            cache[level] = build_m2l_smooth_level_fine(
                grid, tcfg, level, np_cheb, coeffs, modes, dtype
            )
        else:
            cache[level] = build_m2l_smooth_level_coarse(
                grid, tcfg, level, np_cheb, coeffs, modes, dtype
            )
    return cache
