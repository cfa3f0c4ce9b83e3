"""Fourier-mode transport kernels.

Reference semantics (KernelFactory.cpp:240-267 `makeKernels`): for mode m,

  real_m(a, b)   = cos(m * theta) / r                  (0 at r = 0)
  smooth_m(a, b) = (exp(-E(a,b)) - 1) cos(m * theta) / r
                   (at r = 0: sigma_t(a) for m = 0, else 0)

with r = |a - b|, theta = atan2(a - b).  cos(m*theta) is even in theta so the
kernels are symmetric in (a, b).  real_m is translation invariant; smooth_m
depends on sigma_t through the attenuation line integral E.

The reference evaluates these through a scalar `std::function` per point pair
(bbfmm.h:457); here they are shape-polymorphic jnp expressions fused by XLA.
"""

from __future__ import annotations

import jax.numpy as jnp


def cos_m_theta(m: int, dx: jnp.ndarray, dy: jnp.ndarray) -> jnp.ndarray:
    """cos(m * atan2(dy, dx)) without trig, via the Chebyshev recurrence.

    cos(m*theta) = T_m(cos theta); cos(theta) = dx / r.  Exact at r = 0 is
    irrelevant (masked by callers).  For m = 0 returns ones.
    """
    if m == 0:
        return jnp.ones_like(dx)
    r = jnp.sqrt(dx * dx + dy * dy)
    c = dx / jnp.where(r == 0.0, 1.0, r)
    if m == 1:
        return c
    t_prev, t = jnp.ones_like(c), c
    for _ in range(2, m + 1):
        t_prev, t = t, 2.0 * c * t - t_prev
    return t


def real_kernel(m: int, ax, ay, bx, by):
    """cos(m theta)/r with 0 on the diagonal (KernelFactory.cpp:243-253)."""
    dx = ax - bx
    dy = ay - by
    r = jnp.sqrt(dx * dx + dy * dy)
    safe = jnp.where(r == 0.0, 1.0, r)
    return jnp.where(r == 0.0, 0.0, cos_m_theta(m, dx, dy) / safe)


def smooth_kernel_from_E(m: int, ax, ay, bx, by, E, diag_sigma=None):
    """(exp(-E)-1) cos(m theta)/r given precomputed E (KernelFactory.cpp:255-265).

    diag_sigma: values of sigma_t at `a` used on the diagonal for m = 0
    (reference `evaluate(a)`); pass None when no pair coincides.
    """
    dx = ax - bx
    dy = ay - by
    r = jnp.sqrt(dx * dx + dy * dy)
    safe = jnp.where(r == 0.0, 1.0, r)
    val = jnp.expm1(-E) * cos_m_theta(m, dx, dy) / safe
    if m == 0 and diag_sigma is not None:
        return jnp.where(r == 0.0, diag_sigma, val)
    return jnp.where(r == 0.0, 0.0, val)


def anisotropy_weights(g: float, n_modes: int) -> jnp.ndarray:
    """chi_i = (g^i - g^N) / (1 - g^N), i = 0..N-1 (KernelFactory.cpp:18-20)."""
    i = jnp.arange(n_modes, dtype=jnp.float64 if jnp.array(0.0).dtype == jnp.float64 else jnp.float32)
    gN = g ** n_modes
    if g == 0.0:
        # isotropic: chi_0 = 1, rest 0 (g^0 = 1 convention)
        return jnp.where(i == 0, 1.0, 0.0)
    return (g ** i - gN) / (1.0 - gN)
