"""Application of the 3x3 near-field stencil as a channelled convolution.

out[x, y, kt] = sum_{a, b, ks} stencil[a, b, kt, ks] * u[x-1+a, y-1+b, ks]

with zero boundary (squares outside the domain contribute nothing, matching
the reference's boundary guards, KernelFactory.cpp:462-463).  XLA lowers this
conv onto the MXU; it replaces the reference's three near-field passes and
their gigabyte caches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def apply_near_stencil(stencil: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """stencil: (3, 3, nq, nq) [a, b, kt, ks]; u: (sz, sz, nq) -> (sz, sz, nq)."""
    inp = u.transpose(2, 0, 1)[None]                 # (1, nq, sz, sz)
    ker = stencil.transpose(2, 3, 0, 1)              # (kt, ks, 3, 3)
    out = lax.conv_general_dilated(
        inp,
        ker,
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=u.dtype,
        precision=lax.Precision.HIGHEST,
    )
    return out[0].transpose(1, 2, 0)


def apply_per_square(mats: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Per-square (sz, sz, nq, nq) block-diagonal application (compat Duffy)."""
    return jnp.einsum("ijts,ijs->ijt", mats, u,
                      precision=lax.Precision.HIGHEST)
