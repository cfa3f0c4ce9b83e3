#!/usr/bin/env python
"""Nail the warm-set_coeff process-history degradation (round-5 item 2).

Observed: warm 512^2 set_coeff is ~8 s in a fresh process but ~103 s
after other sizes ran earlier in the SAME process (results_scale r5-f32
series), and the round-4 multimode series showed the same pattern (warm
2.7 s at N=1 -> 11.5 s at N=3, each after a previous run_one).  This
probe measures warm set_coeff before/after loading unrelated programs +
buffers, with live-buffer counts, to separate:
  (a) cross-size program/executable churn (plugin executable cache),
  (b) live-buffer/HBM fragmentation,
  (c) a genuine leak in set_coeff itself (warm2/warm3 in a quiet process).

Usage: python benchmarks/probe_warm_degrade.py [--sz 512] [--other 64]
"""

import argparse
import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.makedirs("/tmp/aniso_tpu_jax_cache", exist_ok=True)
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/aniso_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_enable_x64", True)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sz", type=int, default=512)
    ap.add_argument("--other", type=int, default=64)
    args = ap.parse_args()

    import jax.numpy as jnp
    from aniso_tpu import SolverConfig
    from aniso_tpu.solver.operator import TransportSolver

    def build(sz):
        cfg = SolverConfig(
            domain_size=sz, quad_rule=3, kernel_size=1, g=0.5,
            sing_rule=8, np_cheb=4, dtype="float32", tol=1e-7,
            restart=40, max_iter=400,
        )
        return TransportSolver(cfg, backend="fmm")

    def warm(solver, mult):
        g = solver.grid
        sig = mult * 16 * 0.5 * (1 - np.cos(2 * np.pi * g.nodes_x))
        t0 = time.time()
        solver.set_coeff(sig, sig + 0.2)
        dt = time.time() - t0
        return round(dt, 2), dict(solver.set_coeff_phases)

    out = {"sz": args.sz, "other": args.other, "steps": []}

    def rec(label, dt, phases):
        n_live = len(jax.live_arrays())
        out["steps"].append({
            "step": label, "s": dt, "phases": phases, "live_arrays": n_live,
        })
        print(label, dt, "s", phases, f"live={n_live}", flush=True)

    A = build(args.sz)
    dt, ph = warm(A, 1.00); rec("cold", dt, ph)
    dt, ph = warm(A, 1.01); rec("warm1", dt, ph)
    dt, ph = warm(A, 1.02); rec("warm2", dt, ph)
    dt, ph = warm(A, 1.03); rec("warm3", dt, ph)

    # load unrelated programs + buffers: a second solver at another size,
    # with a few compiled applies (what run_one / the multimode series do)
    B = build(args.other)
    gB = B.grid
    sigB = 16 * 0.5 * (1 - np.cos(2 * np.pi * gB.nodes_x))
    t0 = time.time()
    B.set_coeff(sigB, sigB + 0.2)
    rec("other_cold_set_coeff", round(time.time() - t0, 2),
        dict(B.set_coeff_phases))
    u = jnp.asarray(
        np.exp(-25 * ((gB.nodes_x - .5) ** 2 + (gB.nodes_y - .5) ** 2)),
        jnp.float32)
    t0 = time.time()
    for _ in range(10):
        u2 = B.apply_mode(0, u)
    float(jnp.sum(u2))
    rec("other_applies", round(time.time() - t0, 2), {})

    dt, ph = warm(A, 1.04); rec("warm_after_other", dt, ph)
    dt, ph = warm(A, 1.05); rec("warm_after_other2", dt, ph)

    del B
    gc.collect()
    dt, ph = warm(A, 1.06); rec("warm_after_del_other", dt, ph)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_warm_degrade.json")
    recs = []
    if os.path.exists(path):
        with open(path) as fh:
            recs = json.load(fh)
    recs.append(out)
    with open(path, "w") as fh:
        json.dump(recs, fh, indent=1)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
