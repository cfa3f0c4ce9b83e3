#!/usr/bin/env python
"""Per-phase timing of the corrected FMM matvec on the bench problem.

Times (jitted separately): up sweep, down sweep (M2L+L2L), L2T, near field,
and the full fused apply.  Run on TPU to see which phase holds the roofline.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

os.makedirs("/tmp/aniso_tpu_jax_cache", exist_ok=True)
jax.config.update("jax_compilation_cache_dir", "/tmp/aniso_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from aniso_tpu import SolverConfig
    from aniso_tpu.solver.operator import TransportSolver
    from aniso_tpu.fmm import apply as A

    sz, deg = 64, 3
    cfg = SolverConfig(domain_size=sz, quad_rule=deg, kernel_size=1, g=0.95,
                       sing_rule=8, np_cheb=4, dtype="float32")
    solver = TransportSolver(cfg, backend="fmm")
    g = solver.grid
    sig_s = 16 * 0.5 * (1 - np.cos(2 * np.pi * g.nodes_x))
    solver.set_coeff(sig_s, sig_s + 0.2)
    u = jnp.asarray(
        np.exp(-25 * ((g.nodes_x - 0.5) ** 2 + (g.nodes_y - 0.5) ** 2)),
        dtype=jnp.float32,
    )
    static = solver._fmm_static
    caches = solver._caches
    ms = solver._mode_statics[0]
    leaf = solver._tcfg.leaf_level

    reps = int(os.environ.get("PROFILE_REPS", "10"))

    # NOTE: per-phase wall times include a fixed per-dispatch latency
    # (~2.5 ms through the remote-TPU tunnel); the chained full-apply row
    # is the true amortized per-matvec cost (what a jitted GMRES pays).
    upf = jax.jit(lambda u: A._up_pass(static, leaf, u))
    M = {k: jax.block_until_ready(v) for k, v in upf(u).items()}
    t_up = timeit(upf, u, reps=reps)

    down = jax.jit(
        lambda M: jnp.einsum(
            "kc,ijc->ijk", static["l2t"],
            A._down_pass(static, leaf, M, caches["m2l_E"], ms["m2l_cosr"]),
        )
    )
    t_down = timeit(down, M, reps=reps)

    near = jax.jit(lambda u: A._near_apply(caches, ms, 0, u))
    t_near = timeit(near, u, reps=reps)

    full = jax.jit(lambda u: A.fmm_apply_mode(leaf, static, caches, ms, 0, u))
    t_full = timeit(full, u, reps=reps)

    K = 50

    @jax.jit
    def chain(u):
        def body(v, _):
            return A.fmm_apply_mode(leaf, static, caches, ms, 0, v), None
        v, _ = jax.lax.scan(body, u, None, length=K)
        return v

    chain(u).block_until_ready()
    t0 = time.perf_counter()
    chain(u).block_until_ready()
    t_chain = (time.perf_counter() - t0) / K

    from aniso_tpu.fmm.smooth import m2l_cache_bytes
    m2l_bytes = m2l_cache_bytes(caches["m2l_E"])
    near_bytes = int(np.prod(caches["near_E"].shape)) * 4
    print(f"up      {t_up*1e3:8.3f} ms")
    print(f"down    {t_down*1e3:8.3f} ms   (m2l E cache {m2l_bytes/1e6:.1f} MB)")
    print(f"near    {t_near*1e3:8.3f} ms   (near E cache {near_bytes/1e6:.1f} MB)")
    print(f"full    {t_full*1e3:8.3f} ms   (single dispatch, latency-bound)")
    print(f"chained {t_chain*1e3:8.3f} ms/apply over {K} scanned applies")
    hbm = (m2l_bytes + near_bytes) / t_chain / 1e9
    print(f"effective cache bandwidth {hbm:.1f} GB/s "
          f"({g.n_nodes / t_chain / 1e6:.1f} M nodes/s)")


if __name__ == "__main__":
    main()
