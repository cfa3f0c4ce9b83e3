"""The corrected transport operator and the end-to-end solver facade.

Composition per corrected mode-m matvec (reference main.cpp:78-119,
AnisoWrapper.cpp:92-136):

  K_m u = (1/2pi) [ smooth_m(w u) + real_m(w u) + NearStencil_m u ]

Forward operators:
  single mode (main.cpp:125-136):   A x = x - K_0(sigma_s x)
  multi mode  (aniso.m:139-156):    (A u)_i = u_i - sum_j chi_|j| K_|i-j|(sigma_s u_|j|)
  rhs         (aniso.m:121-137):    rhs_i = sum_j K_|i-j|(q_|j|)

Backends: 'dense' materializes the all-pairs matrices (exact; for validation
and small grids), 'fmm' uses the implicit-quadtree Chebyshev fast path.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import SolverConfig
from ..core.geometry import Grid, make_grid
from ..ops import dense as dense_ops
from ..ops.fields import project
from ..ops.near import build_near_stencil
from ..ops.stencil import apply_near_stencil, apply_per_square
from .gmres import gmres, GmresResult


class TransportSolver:
    """Facade playing the role of reference `Aniso` + `aniso.m` orchestration.

    Parameters mirror Aniso(domain, quadRule, kernelSize, g, singRule, np,
    maxLevel) (Aniso.h:14-15) through SolverConfig.
    """

    def __init__(self, cfg: SolverConfig, backend: str = "dense"):
        cfg.validate()
        self.cfg = cfg
        self.grid = make_grid(cfg.domain_size, cfg.quad_rule)
        self.n_modes = 2 * cfg.kernel_size - 1
        self.backend_name = backend
        # float64 silently degrades to float32 when x64 is disabled; resolve
        # once here so downstream asarray calls don't warn per-array
        requested = jnp.float64 if cfg.dtype == "float64" else jnp.float32
        self.dtype = jax.dtypes.canonicalize_dtype(requested)

        # chi_i = (g^i - g^N) / (1 - g^N)  (KernelFactory.cpp:18-20)
        N, g = cfg.kernel_size, cfg.g
        if g == 0.0:
            chi = np.array([1.0] + [0.0] * (N - 1))
        else:
            chi = (g ** np.arange(N) - g ** N) / (1.0 - g ** N)
        self.chi = jnp.asarray(chi, dtype=self.dtype)

        if backend == "fmm" and cfg.compat_global_basis:
            raise NotImplementedError(
                "compat_global_basis is only supported by the dense backend"
            )

        # geometry-only near stencils per mode; the FMM path omits the
        # real-kernel U list, so its stencil carries no removal term
        self._stencils = []
        self._duffys = []
        for m in range(self.n_modes):
            s, d = build_near_stencil(
                self.grid, m, cfg.sing_rule, cfg.compat_global_basis,
                include_removal=(backend == "dense"),
            )
            self._stencils.append(jnp.asarray(s, dtype=self.dtype))
            self._duffys.append(
                None if d is None else jnp.asarray(d, dtype=self.dtype)
            )

        self._k_real = None
        self._k_smooth = None
        self.sigma_s = None
        self.sigma_t = None
        self.sigma_t_coeff = None

        if backend == "fmm":
            from ..fmm.structure import tree_config
            from ..fmm.apply import build_fmm_static, build_real_m2l

            self._tcfg = tree_config(cfg.domain_size)
            self._fmm_static = build_fmm_static(
                self.grid, cfg.np_cheb, dtype=self.dtype
            )
            self._m2l_real = build_real_m2l(
                self.grid, self._tcfg, cfg.np_cheb,
                list(range(self.n_modes)), dtype=self.dtype,
            )
            self._mode_data = None
            self._fmm_jit = None

    # -- coefficient setting (reference AnisoWrapper 'setCoeff' + 'cache') --

    def set_coeff(self, sigma_s: np.ndarray, sigma_t: np.ndarray):
        """sigma_s / sigma_t: nodal fields shaped (sz, sz, nq) (or flat).

        Triggers the sigma-dependent precompute (the reference's interpolation
        + cache passes, AnisoWrapper.cpp:46-90).
        """
        g = self.grid
        shape = (g.sz, g.sz, g.nq)
        self.sigma_s = jnp.asarray(sigma_s, dtype=self.dtype).reshape(shape)
        self.sigma_t = jnp.asarray(sigma_t, dtype=self.dtype).reshape(shape)
        self.sigma_t_coeff = project(g, self.sigma_t)

        if self.backend_name == "dense":
            self._k_real = [
                dense_ops.build_dense_real(g, m, dtype=self.dtype)
                for m in range(self.n_modes)
            ]
            self._k_smooth = [
                dense_ops.build_dense_smooth(
                    g, m, self.sigma_t_coeff,
                    compat_global_basis=self.cfg.compat_global_basis,
                    dtype=self.dtype,
                )
                for m in range(self.n_modes)
            ]
        elif self.backend_name == "fmm":
            self._build_fmm_caches()
        else:
            raise NotImplementedError(self.backend_name)

    def _build_fmm_caches(self):
        from ..fmm.apply import fmm_apply_mode, fuse_m2l_level
        from ..fmm.smooth import (
            build_near_smooth_blocks,
            build_m2l_smooth_cache,
        )
        from ..ops.fields import evaluate_at_nodes

        g = self.grid
        modes = list(range(self.n_modes))
        sigma_nodes = evaluate_at_nodes(g, self.sigma_t_coeff)
        near_smooth = build_near_smooth_blocks(
            g, self.sigma_t_coeff, modes, sigma_nodes, dtype=self.dtype
        )
        m2l_smooth = build_m2l_smooth_cache(
            g, self._tcfg, self.cfg.np_cheb, self.sigma_t_coeff, modes,
            dtype=self.dtype,
        )
        # fuse the TI real operators into the sigma-dependent caches once at
        # set_coeff time so every apply is a minimal batched-einsum graph
        self._mode_data = []
        for m in modes:
            self._mode_data.append(
                {
                    "near": near_smooth[m] + self._stencils[m][None, None],
                    "m2l": {
                        lv: fuse_m2l_level(
                            self._m2l_real[lv][m], m2l_smooth[lv][m],
                            self.dtype,
                        )
                        for lv in m2l_smooth
                    },
                }
            )
        leaf = self._tcfg.leaf_level
        static = self._fmm_static
        self._fmm_jit = jax.jit(
            lambda data, u: fmm_apply_mode(leaf, static, data, u)
        )

    # -- corrected matvec (reference MEX 'mapping') --

    def apply_mode(self, m: int, u: jnp.ndarray) -> jnp.ndarray:
        """K_m u on (sz, sz, nq) charge (AnisoWrapper.cpp:92-136)."""
        if self.backend_name == "fmm":
            if self._mode_data is None:
                raise RuntimeError("call set_coeff first")
            return self._fmm_jit(self._mode_data[m], u)
        if self._k_smooth is None:
            raise RuntimeError("call set_coeff first")
        return dense_ops.dense_apply(
            self._k_smooth[m], self._k_real[m], self._stencils[m],
            self._duffys[m], self.grid, u,
        )

    # -- forward operators --

    def rhs(self, charge: jnp.ndarray) -> jnp.ndarray:
        """Multi-mode rhs (aniso.m:121-137).  charge: (N, sz, sz, nq)."""
        N = self.cfg.kernel_size
        charge = charge.reshape((N,) + self.grid.nodes_x.shape)
        out = []
        for i in range(N):
            acc = jnp.zeros_like(charge[0])
            for j in range(-(N - 1), N):
                acc = acc + self.apply_mode(abs(i - j), charge[abs(j)])
            out.append(acc)
        return jnp.stack(out)

    def forward(self, u: jnp.ndarray) -> jnp.ndarray:
        """(A u)_i = u_i - sum_j chi_|j| K_|i-j|(sigma_s u_|j|)  (aniso.m:139-156)."""
        N = self.cfg.kernel_size
        shape = (N,) + self.grid.nodes_x.shape
        u = u.reshape(shape)
        v = self.sigma_s[None] * u  # (N, sz, sz, nq)
        # T[a][d] = K_d(sigma_s u_a), computed once per needed pair
        needed = {}
        for i in range(N):
            for j in range(-(N - 1), N):
                needed.setdefault((abs(j), abs(i - j)), None)
        for (a, d) in needed:
            needed[(a, d)] = self.apply_mode(d, v[a])
        out = []
        for i in range(N):
            acc = u[i]
            for j in range(-(N - 1), N):
                acc = acc - self.chi[abs(j)] * needed[(abs(j), abs(i - j))]
            out.append(acc)
        return jnp.stack(out)

    # -- solve (aniso.m:159-173 / main.cpp:138-141) --

    def solve(
        self,
        charge: jnp.ndarray,
        x0: Optional[jnp.ndarray] = None,
        precond=None,
    ) -> GmresResult:
        N = self.cfg.kernel_size
        shape = (N,) + self.grid.nodes_x.shape
        charge = jnp.asarray(charge, dtype=self.dtype).reshape(shape)
        b = self.rhs(charge)
        return gmres(
            self.forward,
            b,
            x0,
            restart=self.cfg.restart,
            max_iter=self.cfg.max_iter,
            tol=self.cfg.tol,
            precond=precond,
        )
