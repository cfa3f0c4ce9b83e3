"""Guarded amortized-matvec timing (VERDICT round-2 weak item 2).

The chained-scan differencing used by the round-2 harnesses -- time K and
5K applies, difference to cancel fixed dispatch/transfer latency -- can go
~zero or negative under remote-TPU tunnel noise, and nothing guarded it:
results_scale.json shipped a physically impossible 0.002 ms / 68 G pts/s
row at 128^2.  This helper keeps the differencing (it is the right
steady-state estimator) but cross-checks it against the absolute chain
rate and falls back when implausible.

Returns (seconds_per_apply, detail) where detail records the raw samples
and which estimator was used, for inclusion in the results JSON.
"""

from __future__ import annotations

import time

import numpy as np


def amortized_apply_time(run_chain, K: int, reps: int = 3):
    """run_chain(k, rep) -> wall seconds for a k-long blocked chain.

    The caller's chain must end in a value transfer (float(...)) so lazy
    execution cannot fake completion."""
    t_k = [run_chain(K, r) for r in range(reps)]
    t_5k = [run_chain(5 * K, r + reps) for r in range(reps)]
    diffs = [(b - a) / (4 * K) for a, b in zip(t_k, t_5k)]
    per_diff = float(np.median(diffs))
    per_abs = float(np.median(t_5k)) / (5 * K)

    spread = (max(diffs) - min(diffs)) / per_diff if per_diff > 0 else np.inf
    plausible = (
        per_diff > 0
        and per_diff >= 0.3 * per_abs   # differencing can't beat the
        and per_diff <= 1.2 * per_abs   # absolute rate by >3x (noise) nor
        and spread < 0.5                # exceed it; samples must agree
    )
    per = per_diff if plausible else per_abs
    detail = {
        "timing_mode": "differenced" if plausible else
                       "absolute-fallback (differencing implausible)",
        "K": K,
        "t_K_s": [round(t, 4) for t in t_k],
        "t_5K_s": [round(t, 4) for t in t_5k],
        "per_apply_differenced_ms": round(per_diff * 1e3, 4),
        "per_apply_absolute_ms": round(per_abs * 1e3, 4),
    }
    return per, detail
