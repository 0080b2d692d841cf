"""Lambertian BRDF (reference djb::lambert, dj_brdf.h:111-123, 847-868)."""

from __future__ import annotations

import jax.numpy as jnp

from dj_brdf_tpu.core.pytree import pytree_dataclass


@pytree_dataclass
class Lambert:
    """Constant-albedo BRDF: f_r = reflectance / pi."""

    reflectance: jnp.ndarray  # (..., 3)

    def eval(self, i, o):
        shape = jnp.broadcast_shapes(i[..., 2].shape, o[..., 2].shape)
        return jnp.broadcast_to(self.reflectance / jnp.pi, shape + (3,))

    def evalp(self, i, o):
        return self.eval(i, o) * i[..., 2:3]
