#!/usr/bin/env python
"""Headline benchmark: corrected-matvec throughput on one TPU chip.

Runs the flagship FMM transport operator on the reference CLI's default
problem (main.cpp:29-46: 64x64 squares, deg 3 => 36,864 nodes, g=0.95,
heterogeneous sigma) and prints ONE JSON line:

  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is the ratio to the measured reference C++/OpenMP CPU matvec
throughput on this machine (benchmarks/baseline_ref.json, produced from
benchmarks/oracle_64/run.log: 0.938 s per corrected matvec).

The matvec is timed amortized (applies chained in one lax.scan program):
a jitted GMRES pays no per-dispatch latency, so chained cost is what the
solver actually sees (the remote-TPU tunnel adds ~25 ms per *blocked*
dispatch, which round 1 mistakenly measured).  A full device-resident
GMRES solve is also run and reported on stderr + benchmarks/results_r02.json.
"""

import json
import os
import sys
import time

import jax

# persistent compile cache: TPU compiles are slow (remote helper); steady
# state is what we measure
os.makedirs("/tmp/aniso_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/aniso_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)

import numpy as np
import jax.numpy as jnp


def main():
    from aniso_tpu import SolverConfig
    from aniso_tpu.solver.operator import TransportSolver
    from aniso_tpu.fmm import apply as A

    sz, deg = 64, 3
    cfg = SolverConfig(
        domain_size=sz, quad_rule=deg, kernel_size=1, g=0.95,
        sing_rule=8, np_cheb=4, dtype="float32",
        tol=1e-7, restart=80, max_iter=400,
    )
    solver = TransportSolver(cfg, backend="fmm")
    g = solver.grid
    sigma_s = 16 * 0.5 * (1 - np.cos(2 * np.pi * g.nodes_x))
    t0 = time.time()
    solver.set_coeff(sigma_s, sigma_s + 0.2)
    setup_s = time.time() - t0

    q = np.exp(-25 * ((g.nodes_x - 0.5) ** 2 + (g.nodes_y - 0.5) ** 2))
    u = jnp.asarray(q, dtype=jnp.float32)

    caches = solver._caches
    ms = solver._mode_statics[0]
    leaf = solver._tcfg.leaf_level
    static = solver._fmm_static

    # Two guards against remote-TPU tunnel timing artifacts: the chain ends
    # in a scalar reduce whose VALUE is transferred (execution cannot
    # complete lazily), and two chain lengths are differenced to cancel
    # fixed dispatch/transfer latency.
    import functools

    K = 50

    @functools.partial(jax.jit, static_argnums=(1,))
    def chain(u, k):
        def body(v, _):
            return A.fmm_apply_mode(leaf, static, caches, ms, 0, v), None
        return jnp.sum(jax.lax.scan(body, u, None, length=k)[0])

    float(chain(u, K))                     # compile
    float(chain(u, 5 * K))

    def timed(k, rep):
        urep = u + jnp.float32(1e-6 * (rep + 1))
        urep.block_until_ready()
        t0 = time.perf_counter()
        float(chain(urep, k))
        return time.perf_counter() - t0

    sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "benchmarks"))
    from timing import amortized_apply_time

    # best-of-5 measurement epochs ~12 s apart: the remote-TPU tunnel
    # wanders between at least three dispatch states on a minutes
    # timescale (quiet-host epochs measured 0.292 / ~0.36 / ~0.46 ms
    # per apply for the identical program; within an epoch samples
    # agree to <2%).  Noise is strictly additive, so the minimum time
    # is the estimator; every epoch's value is recorded in the detail.
    epochs = []
    for e in range(5):
        if e:
            time.sleep(12)
        epochs.append(amortized_apply_time(timed, K))
    per, timing_detail = min(epochs, key=lambda pe: pe[0])
    timing_detail = dict(timing_detail)
    timing_detail["epoch_per_apply_ms"] = [
        round(p * 1e3, 4) for p, _ in epochs
    ]
    gps = g.n_nodes / per

    # full device-resident GMRES solve (reference main.cpp:141 flow);
    # f32 floor is ~1e-7 relative residual, so tol is set there (the
    # reference solves the same problem to 1e-12 in f64 in 55.8 s)
    t0 = time.time()
    res = solver.solve(q)
    jax.block_until_ready(res.x)
    solve_s = time.time() - t0
    t0 = time.time()
    res = solver.solve(q)
    jax.block_until_ready(res.x)
    solve_warm_s = time.time() - t0

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "baseline_ref.json",
    )
    vs = None
    ref = None
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            ref = json.load(f)
        vs = gps / ref["matvec_grid_points_per_s"]

    print(json.dumps({
        "metric": "fmm_corrected_matvec_throughput_64x64_deg3",
        "value": round(gps, 1),
        "unit": "grid-points/s/chip",
        "vs_baseline": None if vs is None else round(vs, 2),
    }))
    from aniso_tpu.utils.roofline import roofline_summary

    detail = {
        "setup_set_coeff_s": round(setup_s, 2),
        "matvec_ms": round(per * 1e3, 3),
        # bytes-streamed / FLOPs / %peak accounting (VERDICT r3 item 6)
        "roofline": roofline_summary(solver, per),
        "m2l_translate_path": "xla",
        "level_repr": {
            int(lv): ("offsets" if isinstance(v, dict) and "Wo" in v
                      else "factored" if isinstance(v, dict) else "dense")
            for lv, v in caches["m2l_E"].items()
        },
        "timing": timing_detail,
        "nodes": g.n_nodes,
        "solve_wall_s_cold": round(solve_s, 2),
        "solve_wall_s_warm": round(solve_warm_s, 2),
        "solve_iterations": int(res.iterations),
        "solve_residual": float(res.residual),
        "solve_tol": cfg.tol,
        "ref_solve_wall_s": None if ref is None else ref.get("solve_wall_seconds"),
    }
    print(f"# {json.dumps(detail)}", file=sys.stderr)
    out_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "results_r02.json",
    )
    try:
        with open(out_path, "w") as f:
            json.dump(detail, f, indent=1)
    except OSError:
        pass


if __name__ == "__main__":
    main()
