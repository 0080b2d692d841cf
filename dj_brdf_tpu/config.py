"""Global configuration.

Mirrors the reference's compile-time switches (dj_brdf.h:44-51):
``DJB_USE_DOUBLE_PRECISION`` -> :func:`use_x64`, ``DJB_EPSILON`` ->
:data:`EPSILON`.
"""

from __future__ import annotations

import logging

import jax
import jax.numpy as jnp

logger = logging.getLogger("dj_brdf_tpu")

#: Numerical epsilon used for horizon / degeneracy clamps
#: (reference DJB_EPSILON, dj_brdf.h:49-51).
EPSILON = 1e-4


def use_x64(enable: bool = True) -> None:
    """Enable float64 globally (reference DJB_USE_DOUBLE_PRECISION)."""
    jax.config.update("jax_enable_x64", enable)


def default_float() -> jnp.dtype:
    return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
