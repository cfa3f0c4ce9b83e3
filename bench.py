#!/usr/bin/env python
"""Headline benchmark: corrected-matvec throughput on one TPU chip.

Runs the flagship FMM transport operator on the reference CLI's default
problem (main.cpp:29-46: 64x64 squares, deg 3 => 36,864 nodes, g=0.95,
heterogeneous sigma) and prints ONE JSON line:

  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

vs_baseline is the ratio to the measured reference C++/OpenMP CPU matvec
throughput on this machine (benchmarks/baseline_ref.json, produced from
benchmarks/oracle_64/run.log: 0.938 s per corrected matvec).
"""

import json
import os
import time

import jax

# persistent compile cache: TPU compiles are slow (remote helper); steady
# state is what we measure
os.makedirs("/tmp/aniso_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/aniso_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import numpy as np
import jax.numpy as jnp


def main():
    from aniso_tpu import SolverConfig
    from aniso_tpu.solver.operator import TransportSolver

    sz, deg = 64, 3
    cfg = SolverConfig(
        domain_size=sz, quad_rule=deg, kernel_size=1, g=0.95,
        sing_rule=8, np_cheb=4, dtype="float32",
    )
    solver = TransportSolver(cfg, backend="fmm")
    g = solver.grid
    sigma_s = 16 * 0.5 * (1 - np.cos(2 * np.pi * g.nodes_x))
    t0 = time.time()
    solver.set_coeff(sigma_s, sigma_s + 0.2)
    setup_s = time.time() - t0

    q = np.exp(-25 * ((g.nodes_x - 0.5) ** 2 + (g.nodes_y - 0.5) ** 2))
    u = jnp.asarray(q, dtype=jnp.float32)

    # warm up (compile)
    solver.apply_mode(0, u).block_until_ready()

    reps = 30
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = solver.apply_mode(0, u)
        out.block_until_ready()
        times.append(time.perf_counter() - t0)
    per = float(np.median(times))
    gps = g.n_nodes / per

    baseline_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "benchmarks", "baseline_ref.json",
    )
    vs = None
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
    # secondary detail on stderr-ish (not the JSON line contract)
    import sys
    print(
        f"# setup(set_coeff)={setup_s:.1f}s matvec={per*1e3:.2f}ms "
        f"nodes={g.n_nodes} reps={reps}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
