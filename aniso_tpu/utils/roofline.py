"""Roofline accounting for the corrected FMM matvec (round-3 VERDICT
item 6: the bench records pts/s only; judging "actually fast" needs bytes
streamed and FLOPs per matvec against the chip's peaks).

The model counts the MINIMUM HBM traffic (every resident cache byte read
exactly once per matvec -- the algorithm is a streaming evaluation of its
caches) and the arithmetic of every contraction.  Achieved bandwidth =
min_bytes / measured_time is therefore a LOWER bound on what the chip
actually moved; %HBM-peak computed from it is a lower bound on roofline
position.  Factored levels add their exact re-form matmul FLOPs and the
written+re-read E transient.

Peaks default to TPU v5e (one chip): 819 GB/s HBM, 197 TFLOP/s bf16 MXU.
Every contraction in this framework pins jax.lax.Precision.HIGHEST, which
the TPU executes as a 6-pass bf16x6 ("f32 emulation") matmul, so the
relevant MXU ceiling for %peak is 197/6 = 32.8 TFLOP/s.

The reference has no analogue (SURVEY section 6: it publishes no numbers
at all); this module is what lets BASELINE.md state each row's roofline
position instead of a bare pts/s figure.
"""

from __future__ import annotations

import numpy as np

# one TPU v5e chip (public spec numbers)
V5E_HBM_GBPS = 819.0
V5E_MXU_BF16_TFLOPS = 197.0
V5E_MXU_F32_HIGHEST_TFLOPS = V5E_MXU_BF16_TFLOPS / 6.0  # 6-pass bf16x6


def _nbytes(a) -> int:
    return int(np.prod(a.shape)) * a.dtype.itemsize


def _roundup(n: int, q: int) -> int:
    return -(-n // q) * q


def _nbytes_tiled(a) -> int:
    """Real HBM bytes of a 4D per-class dense block under the TPU (8,128)
    tile: the 27r lane dim pads 432 -> 512 (what the matvec streams)."""
    if a.ndim != 4:
        return _nbytes(a)
    s = a.shape
    return (int(np.prod(s[:-2])) * _roundup(s[-2], 8)
            * _roundup(s[-1], 128) * a.dtype.itemsize)


def matvec_costs(solver) -> dict:
    """Per corrected single-mode matvec: minimum HBM bytes + FLOPs.

    Reads the ACTUAL cache pytree (dense per-class tuples / stacked
    arrays / factored {'patch','W'} levels, stored or virtual near
    field), so the accounting always matches the representation that
    ran.  Small operands (multipole pyramids, static sweep tables,
    cosr tables) are counted too -- they are minor but free to count.
    """
    g = solver.grid
    caches = solver._caches
    tcfg = solver._tcfg
    r = solver.cfg.np_cheb ** 2
    sz, nq = g.sz, g.nq

    bytes_read = 0
    flops = 0
    transient_bytes = 0
    detail = {}

    # --- M2L levels ---
    for lv, E_l in caches["m2l_E"].items():
        m2 = tcfg.boxes(lv) // 2
        P = r * 27 * r
        if isinstance(E_l, dict) and "Wo" in E_l:
            # per-offset virtual (build_m2l_offsets_fine): one window
            # dot per CANONICAL (class, offset) block, exp shared with
            # the mirror -- half the generic exp count
            from ..fmm.smooth import _fine_offset_entries

            entries, keys, _ = _fine_offset_entries(solver.cfg.np_cheb)
            itemsize = E_l["Wo"][0].dtype.itemsize
            bytes_read += sum(_nbytes(v) for v in E_l["Wo"])
            bytes_read += sz * sz * nq * itemsize   # coeff field read
            blk = m2 * m2 * r * r
            for (_c, _o, _px, _py, _di, _dj, ki) in entries:
                flops += 2 * blk * E_l["Wo"][ki].shape[1]
            # E transient written + re-read per canonical block; exp on
            # the canonical half only; contract over all 4*27 blocks
            transient_bytes += 2 * len(entries) * blk * itemsize
            flops += 3 * len(entries) * blk
            flops += 2 * 4 * m2 * m2 * P
            bytes_read += 2 * 4 * m2 * m2 * r * 4
            detail[f"m2l_level_{lv}"] = "offsets"
            continue
        if isinstance(E_l, dict):            # factored {patch?, W}
            W = E_l["W"]
            itemsize = W.dtype.itemsize
            Q = W.shape[1]
            stored = sum(_nbytes(v) for v in E_l.values())
            if "patch" not in E_l:           # virtual: patch re-formed
                stored += sz * sz * nq * itemsize   # coeff field read
            bytes_read += stored
            # re-form matmul (4, m2*m2, Q) @ (Q, P) + the E transient
            # written then re-read by the fused exp/contract consumer
            flops += 2 * 4 * m2 * m2 * Q * P
            transient_bytes += 2 * 4 * m2 * m2 * P * itemsize
            detail[f"m2l_level_{lv}"] = "factored"
        else:                                # dense: tuple or stacked
            blocks = E_l if isinstance(E_l, (list, tuple)) else (E_l,)
            lvl_bytes = sum(_nbytes_tiled(b) for b in blocks)
            bytes_read += lvl_bytes
            detail[f"m2l_level_{lv}"] = "dense"
        # fused operator exp(-E)*cosr (~3 VPU ops/element) + the batched
        # (r x 27r) @ (27r) translate per box per class
        flops += 3 * 4 * m2 * m2 * P
        flops += 2 * 4 * m2 * m2 * P
        # multipole/local planes at this level
        bytes_read += 2 * 4 * m2 * m2 * r * 4

    # --- near field ---
    itemsize = 4
    if "near_E" in caches:
        bytes_read += _nbytes(caches["near_E"])
        itemsize = caches["near_E"].dtype.itemsize
    else:                                    # virtual near field
        W = caches["near_W"]
        itemsize = W.dtype.itemsize
        bytes_read += sz * sz * nq * itemsize
        flops += 2 * 9 * nq * sz * sz * (9 * nq * nq)   # E re-form einsum
        transient_bytes += 2 * 9 * nq * nq * sz * sz * itemsize
    near_elems = 9 * nq * nq * sz * sz
    flops += 2 * near_elems          # block contract
    flops += 3 * near_elems          # expm1 + scale + stencil add
    bytes_read += _nbytes(caches["sigma_w"])
    if "duffy" in solver._mode_statics[0]:
        bytes_read += _nbytes(solver._mode_statics[0]["duffy"])
        flops += 2 * nq * nq * sz * sz

    # --- sweeps (P2M/M2M/L2L/L2T) ---
    flops += 2 * 2 * sz * sz * nq * r        # P2M + L2T
    for lv in range(2, tcfg.leaf_level):
        m = tcfg.boxes(lv + 1)
        flops += 2 * 2 * m * m * r * r       # M2M + L2L through this level
    bytes_read += 3 * sz * sz * nq * itemsize   # u in, out, weights fold

    return {
        "min_hbm_bytes": int(bytes_read),
        "transient_hbm_bytes": int(transient_bytes),
        "flops": int(flops),
        "level_repr": detail,
    }


def roofline_summary(
    solver, matvec_s: float,
    hbm_peak_gbps: float = V5E_HBM_GBPS,
    mxu_peak_tflops: float = V5E_MXU_F32_HIGHEST_TFLOPS,
) -> dict:
    """Roofline position of a measured matvec time on the given chip."""
    c = matvec_costs(solver)
    gbps = c["min_hbm_bytes"] / matvec_s / 1e9
    gbps_incl = (c["min_hbm_bytes"] + c["transient_hbm_bytes"]) \
        / matvec_s / 1e9
    tflops = c["flops"] / matvec_s / 1e12
    return {
        **c,
        "matvec_ms": round(matvec_s * 1e3, 3),
        "achieved_gbps_min": round(gbps, 1),
        "achieved_gbps_incl_transients": round(gbps_incl, 1),
        "pct_hbm_peak": round(100.0 * gbps / hbm_peak_gbps, 1),
        "pct_hbm_peak_incl_transients": round(
            100.0 * gbps_incl / hbm_peak_gbps, 1),
        "achieved_tflops": round(tflops, 4),
        "pct_mxu_peak_f32_highest": round(
            100.0 * tflops / mxu_peak_tflops, 2),
        "peaks": {
            "hbm_gbps": hbm_peak_gbps,
            "mxu_tflops_f32_highest": mxu_peak_tflops,
        },
    }
