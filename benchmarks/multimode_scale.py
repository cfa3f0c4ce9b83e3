#!/usr/bin/env python
"""Multi-mode coupling at scale (round-3 VERDICT item 7).

Proves the mode-independent-cache claim where it matters: set_coeff cost
and cache footprint must be ~flat in the mode count N (the reference
caches a full per-mode FMM operator, AnisoWrapper.cpp:72-90), while the
multi-mode forward (aniso.m:139-156) rides ONE compiled program whose
cost scales with the N x D mode-pair translates, sharing the up sweep
and V-list gathers.

Per (sz, N): warm set_coeff seconds, E-cache MB, amortized forward()
wall (chained scan, as the jitted GMRES sees it), and the derived
per-mode-pair translate throughput.  Appends to results_multimode.json.

Usage: python benchmarks/multimode_scale.py --sz 256 --modes 1 3 5
"""

import argparse
import functools
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

RESULTS = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "results_multimode.json"
)


def run_one(sz, N, g, deg, reps, leaf_virtual=False):
    import jax.numpy as jnp
    from aniso_tpu import SolverConfig
    from aniso_tpu.solver.operator import TransportSolver
    import aniso_tpu.fmm.smooth as smooth
    from aniso_tpu.fmm.smooth import m2l_cache_bytes

    cfg = SolverConfig(
        domain_size=sz, quad_rule=deg, kernel_size=N, g=g,
        sing_rule=8, np_cheb=4, dtype="float32", tol=1e-7,
        restart=40, max_iter=400,
    )
    # --leaf-virtual: evict the leaf from the dense budget (per-offset
    # recompute form, fmm.smooth.build_m2l_offsets_fine).  At 512^2 the
    # 10.4 GB all-dense caches + the multi-mode chain's program temps
    # exceed the axon plugin's practical HBM ceiling (measured OOM at
    # N=1); the per-offset leaf frees 7.25 GB and is exactly the
    # representation the refined 512^2 north-star config runs.  The
    # row's claim (E byte-identical in N, shared-sweep amortization) is
    # representation-independent.
    saved_cap = smooth._DENSE_E_LEVEL_CAP_BYTES
    if leaf_virtual:
        smooth._DENSE_E_LEVEL_CAP_BYTES = (
            smooth.fine_dense_level_bytes(
                (1 << (sz.bit_length() - 2)), 4, 4) // 4 - 1
        )
    try:
        return _run_one_body(
            cfg, N, reps, time, jnp, TransportSolver, m2l_cache_bytes
        )
    finally:
        smooth._DENSE_E_LEVEL_CAP_BYTES = saved_cap


def _run_one_body(cfg, N, reps, time, jnp, TransportSolver, m2l_cache_bytes):
    sz, g, deg = cfg.domain_size, cfg.g, cfg.quad_rule
    solver = TransportSolver(cfg, backend="fmm")
    grid = solver.grid
    sig_s = 20 * 0.5 * (1 - np.cos(2 * np.pi * grid.nodes_x))
    t0 = time.time()
    solver.set_coeff(sig_s, sig_s + 0.2)
    cold_s = time.time() - t0
    cold_phases = getattr(solver, "set_coeff_phases", None)
    t0 = time.time()
    solver.set_coeff(sig_s * 1.01, sig_s * 1.01 + 0.2)
    warm_s = time.time() - t0
    warm_phases = getattr(solver, "set_coeff_phases", None)
    # a second warm rep separates a one-time per-process effect (e.g. a
    # compile the N=1 run paid earlier in the same process) from a real
    # N-dependence (round-4 VERDICT item 2: 2.7 -> 11.5 s warm at N=3)
    t0 = time.time()
    solver.set_coeff(sig_s * 1.02, sig_s * 1.02 + 0.2)
    warm2_s = time.time() - t0
    warm2_phases = getattr(solver, "set_coeff_phases", None)

    q = np.exp(-25 * ((grid.nodes_x - 0.5) ** 2 + (grid.nodes_y - 0.5) ** 2))
    u = jnp.asarray(
        np.stack([q] + [0.1 * q] * (N - 1)), dtype=jnp.float32
    )

    st = solver._fmm_static
    caches = solver._caches
    mss = solver._mode_statics
    C = solver._C_fwd
    sig = solver.sigma_s
    fwd = solver._forward_impl_jit
    K = reps

    @functools.partial(jax.jit, static_argnums=(5,))
    def chain(st_, c_, ms_, C_, s_, k, v):
        def body(w, _):
            return fwd(st_, c_, ms_, C_, s_, w), None
        return jnp.sum(jax.lax.scan(body, v, None, length=k)[0])

    t0 = time.time()
    float(chain(st, caches, mss, C, sig, K, u))
    compile_s = time.time() - t0
    float(chain(st, caches, mss, C, sig, 5 * K, u))
    ts = []
    for rep in range(3):
        ur = u + jnp.float32(1e-6 * (rep + 1))
        ur.block_until_ready()
        t0 = time.perf_counter()
        float(chain(st, caches, mss, C, sig, K, ur))
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(chain(st, caches, mss, C, sig, 5 * K, ur))
        t2 = time.perf_counter() - t0
        ts.append((t2 - t1) / (4 * K))
    per = float(np.median(ts))

    cache_mb = (
        m2l_cache_bytes(caches["m2l_E"])
        + caches["near_E"].size * caches["near_E"].dtype.itemsize
    ) / 1e6
    D = 2 * N - 1
    pairs = N * D          # translate count per forward
    return {
        "sz": sz, "modes": N, "g": g, "deg": deg, "nodes": grid.n_nodes,
        "set_coeff_cold_s": round(cold_s, 2),
        "set_coeff_warm_s": round(warm_s, 2),
        "set_coeff_warm2_s": round(warm2_s, 2),
        "set_coeff_phases_cold": cold_phases,
        "set_coeff_phases_warm": warm_phases,
        "set_coeff_phases_warm2": warm2_phases,
        "e_cache_mb": round(cache_mb, 1),
        "level_repr": {
            int(lv): ("offsets" if isinstance(v, dict) and "Wo" in v
                      else "factored" if isinstance(v, dict) else "dense")
            for lv, v in caches["m2l_E"].items()
        },
        "forward_ms": round(per * 1e3, 3),
        "forward_compile_s": round(compile_s, 1),
        "mode_pair_translates": pairs,
        "ms_per_mode_pair": round(per * 1e3 / pairs, 3),
        "mode_node_throughput_per_s": round(N * grid.n_nodes / per, 0),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sz", type=int, default=256)
    ap.add_argument("--deg", type=int, default=3)
    ap.add_argument("--g", type=float, default=0.8)
    ap.add_argument("--modes", type=int, nargs="+", default=[1, 3, 5])
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--tag", type=str, default="")
    ap.add_argument("--leaf-virtual", action="store_true")
    args = ap.parse_args()

    all_recs = []
    if os.path.exists(RESULTS):
        with open(RESULTS) as f:
            all_recs = json.load(f)
    for N in args.modes:
        try:
            rec = run_one(args.sz, N, args.g, args.deg, args.reps,
                          leaf_virtual=args.leaf_virtual)
            import gc

            gc.collect()
        except Exception as e:
            rec = {"sz": args.sz, "modes": N,
                   "error": f"{type(e).__name__}: {e}"}
        rec["tag"] = args.tag
        print(json.dumps(rec), flush=True)
        key = (args.sz, N, args.deg)
        all_recs = [
            r for r in all_recs
            if (r.get("sz"), r.get("modes"), r.get("deg")) != key
        ] + [rec]
        with open(RESULTS, "w") as f:
            json.dump(all_recs, f, indent=1)


if __name__ == "__main__":
    main()
