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
    md = solver._mode_data[0]
    leaf = solver._tcfg.leaf_level

    reps = int(os.environ.get("PROFILE_REPS", "10"))

    upf = jax.jit(lambda u: A._up_pass(static, leaf, u))
    M = {k: jax.block_until_ready(v) for k, v in upf(u).items()}
    t_up = timeit(upf, u, reps=reps)

    down = jax.jit(
        lambda M: jnp.einsum(
            "kc,ijc->ijk", static["l2t"],
            A._down_pass(static, leaf, M, md["m2l"]),
        )
    )
    t_down = timeit(down, M, reps=reps)
    t_l2t = 0.0

    near = jax.jit(
        lambda u: jnp.einsum("ijabts,sabij->ijt", md["near"], A._patch_3x3(u))
    )
    t_near = timeit(near, u, reps=reps)

    full = jax.jit(lambda u: A.fmm_apply_mode(leaf, static, md, u))
    t_full = timeit(full, u, reps=reps)

    m2l_bytes = sum(int(np.prod(v.shape)) * 4 for v in md["m2l"].values())
    near_bytes = int(np.prod(md["near"].shape)) * 4
    print(f"up    {t_up*1e3:8.3f} ms")
    print(f"down  {t_down*1e3:8.3f} ms   (m2l cache {m2l_bytes/1e6:.1f} MB)")
    print(f"l2t   {t_l2t*1e3:8.3f} ms")
    print(f"near  {t_near*1e3:8.3f} ms   (near cache {near_bytes/1e6:.1f} MB)")
    print(f"full  {t_full*1e3:8.3f} ms")
    hbm = (m2l_bytes + near_bytes) / t_full / 1e9
    print(f"effective cache bandwidth {hbm:.1f} GB/s")


if __name__ == "__main__":
    main()
