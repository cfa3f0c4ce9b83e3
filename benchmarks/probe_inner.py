#!/usr/bin/env python
"""Diagnose the inner-solve overhead at the refine config (round-5 item 1).

The round-4 512^2 refined solve spent 21.6 s in 27 inner f32 iterations
(800 ms/iter) while the chained-scan matvec measures 117 ms.  This probe
separates: (a) solver.forward (the GMRES operator) standalone, (b) the
same inside a scan chain, (c) a full gmres() call with the real operator,
(d) gmres() framework overhead with a trivial operator at the same n.

Usage: python benchmarks/probe_inner.py --sz 512 [--no-refine]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sz", type=int, default=512)
    ap.add_argument("--no-refine", action="store_true")
    ap.add_argument("--restart", type=int, default=40)
    args = ap.parse_args()

    import jax.numpy as jnp
    from aniso_tpu import SolverConfig
    from aniso_tpu.solver.operator import TransportSolver
    from aniso_tpu.solver.gmres import gmres

    cfg = SolverConfig(
        domain_size=args.sz, quad_rule=3, kernel_size=1, g=0.5,
        sing_rule=8, np_cheb=4, dtype="float32",
        refine=not args.no_refine, tol=1e-8 if not args.no_refine else 1e-7,
        restart=args.restart, max_iter=400,
    )
    solver = TransportSolver(cfg, backend="fmm")
    grid = solver.grid
    sig = 16 * 0.5 * (1 - np.cos(2 * np.pi * grid.nodes_x))
    t0 = time.time()
    solver.set_coeff(sig, sig + 0.2)
    print(f"set_coeff: {time.time()-t0:.1f} s", flush=True)

    rng = np.random.default_rng(0)
    shape = (1,) + grid.nodes_x.shape
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)

    out = {"sz": args.sz, "refine": not args.no_refine}

    # (a) standalone forward, individually timed.  Every timed section
    # ends in a SCALAR VALUE TRANSFER: through the axon tunnel,
    # block_until_ready returns before execution completes (measured
    # 0.1 ms for a 117 ms matvec), so only a value dependency is a sync.
    f = solver.forward
    fsum = lambda v: float(jnp.sum(f(v)))
    fsum(u)                              # compile
    ts = []
    for rep in range(5):
        ur = u + jnp.float32(1e-6 * rep)
        float(jnp.sum(ur))
        t0 = time.perf_counter()
        fsum(ur)
        ts.append(time.perf_counter() - t0)
    out["forward_single_ms"] = round(float(np.median(ts)) * 1e3, 1)
    print("forward single:", out["forward_single_ms"], "ms", flush=True)

    # (b) forward in a scan chain (the round-4 matvec methodology)
    @functools.partial(jax.jit, static_argnums=(0,))
    def chain(k, v):
        def body(w, _):
            return f(w), None
        return jnp.sum(jax.lax.scan(body, v, None, length=k)[0])

    K = 10
    float(chain(K, u)); float(chain(5 * K, u))
    t0 = time.perf_counter(); float(chain(K, u)); t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(chain(5 * K, u)); t2 = time.perf_counter() - t0
    out["forward_chain_ms"] = round((t2 - t1) / (4 * K) * 1e3, 1)
    print("forward chained:", out["forward_chain_ms"], "ms", flush=True)

    # (c) full jitted gmres with the real operator (the refined inner
    # solve path, solver.inner_gmres: caches as program arguments)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    b = b / jnp.linalg.norm(b)
    res = solver.inner_gmres(b, 1e-6)
    it = int(res.iterations)             # scalar transfer = sync
    t0 = time.perf_counter()
    res = solver.inner_gmres(b, 1e-6)
    it = int(res.iterations)
    gw = time.perf_counter() - t0
    out["gmres_s"] = round(gw, 2)
    out["gmres_iters"] = it
    out["gmres_ms_per_matvec"] = round(gw / (it + 2) * 1e3, 1)
    print(f"gmres: {gw:.2f} s / {it} iters "
          f"({out['gmres_ms_per_matvec']} ms per matvec incl r0/r_new)",
          flush=True)

    # (d) gmres framework floor: trivial operator, forced iteration count
    cheap = lambda v: v * jnp.float32(1.0001)
    res = gmres(cheap, b, restart=args.restart, max_iter=it, tol=0.0)
    int(res.iterations)
    t0 = time.perf_counter()
    res = gmres(cheap, b, restart=args.restart, max_iter=it, tol=0.0)
    fit = int(res.iterations)
    fw = time.perf_counter() - t0
    out["gmres_framework_s"] = round(fw, 2)
    out["gmres_framework_ms_per_iter"] = round(fw / max(1, fit) * 1e3, 1)
    print(f"gmres framework ({fit} iters, trivial op): "
          f"{fw:.2f} s = {out['gmres_framework_ms_per_iter']} ms/iter",
          flush=True)

    print(json.dumps(out), flush=True)
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "results_probe_inner.json")
    recs = []
    if os.path.exists(path):
        with open(path) as fh:
            recs = json.load(fh)
    recs.append(out)
    with open(path, "w") as fh:
        json.dump(recs, fh, indent=1)


if __name__ == "__main__":
    main()
