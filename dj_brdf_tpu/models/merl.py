"""MERL measured-BRDF evaluation.

TPU-native version of ``djb::merl`` (dj_brdf.h:870-1024): the
90x90x180x3 table lives in HBM as one f32 array (~6.3 MB, replicated
per device — never sharded); evaluation is a fused angle transform
(Rusinkiewicz io->hd), the three MERL index warps (non-linear sqrt
theta_h bin, reciprocity-folded phi_d), and a 3-channel gather.

Lookup is nearest-neighbour, exactly like the reference — gradients
w.r.t. directions are therefore zero a.e.; the *table* is the
differentiable leaf (e.g. for fitting or neural re-parameterization).

Binary file I/O lives in :mod:`dj_brdf_tpu.io.merl_io`.
"""

from __future__ import annotations

import jax.numpy as jnp

from dj_brdf_tpu.core.math import io_to_hd, to_spherical
from dj_brdf_tpu.core.pytree import pytree_dataclass, static_field

RES_THETA_H = 90
RES_THETA_D = 90
RES_PHI_D = 360  # table stores RES_PHI_D / 2 = 180 bins (reciprocity)

#: Per-channel radiometric scales (dj_brdf.h:897-899).
RED_SCALE = 1.00 / 1500.0
GREEN_SCALE = 1.15 / 1500.0
BLUE_SCALE = 1.66 / 1500.0


def theta_half_index(theta_half):
    """Non-linear sqrt-warped theta_h bin (dj_brdf.h:906-920)."""
    theta_half_deg = theta_half / (jnp.pi / 2.0) * RES_THETA_H
    temp = jnp.sqrt(jnp.maximum(theta_half_deg * RES_THETA_H, 0.0))
    idx = jnp.floor(temp).astype(jnp.int32)
    idx = jnp.clip(idx, 0, RES_THETA_H - 1)
    return jnp.where(theta_half <= 0.0, 0, idx)


def theta_diff_index(theta_diff):
    """(dj_brdf.h:926-936)."""
    idx = jnp.floor(theta_diff / (jnp.pi * 0.5) * RES_THETA_D).astype(jnp.int32)
    return jnp.clip(idx, 0, RES_THETA_D - 1)


def phi_diff_index(phi_diff):
    """Reciprocity fold phi_d -> phi_d + pi for negative phi_d
    (dj_brdf.h:940-957)."""
    phi_diff = jnp.where(phi_diff < 0.0, phi_diff + jnp.pi, phi_diff)
    idx = jnp.floor(phi_diff / jnp.pi * (RES_PHI_D // 2)).astype(jnp.int32)
    return jnp.clip(idx, 0, RES_PHI_D // 2 - 1)


@pytree_dataclass
class Merl:
    """MERL table BRDF. ``table``: (3, 90, 90, 180) raw (unscaled)
    samples, channel-major like the binary file."""

    table: jnp.ndarray

    def eval(self, i, o):
        """f_r lookup (reference merl::eval, dj_brdf.h:987-1024).
        Returns (..., 3); negative raw entries (below-horizon) map to 0."""
        h, d = io_to_hd(i, o)
        theta_h, _ = to_spherical(h)
        theta_d, phi_d = to_spherical(d)

        ih = theta_half_index(theta_h)
        id_ = theta_diff_index(theta_d)
        ip = phi_diff_index(phi_d)

        flat = self.table.reshape(3, -1)
        idx = (ih * RES_THETA_D + id_) * (RES_PHI_D // 2) + ip
        r = jnp.take(flat[0], idx) * RED_SCALE
        g = jnp.take(flat[1], idx) * GREEN_SCALE
        b = jnp.take(flat[2], idx) * BLUE_SCALE
        rgb = jnp.stack([r, g, b], axis=-1)
        below_horizon = jnp.any(rgb < 0.0, axis=-1, keepdims=True)
        return jnp.where(below_horizon, 0.0, rgb)

    def evalp(self, i, o):
        return self.eval(i, o) * i[..., 2:3]
