"""UTIA measured-BRDF evaluation.

TPU-native version of ``djb::utia`` (dj_brdf.h:1026-1177, after Jiri
Filip's implementation): a (3, 6, 48, 6, 48) table evaluated with
quadrilinear interpolation in *degree* space over
(theta_i, phi_i, theta_v, phi_v), followed by the per-channel
sRGB-like decode and the x100 radiometric scale. The 16-tap gather +
weights is fully differentiable w.r.t. both directions and the table.

The load-time clamp-negatives and the 1/140 magic scale
(dj_brdf.h:1162-1177) are applied by the loader
(:mod:`dj_brdf_tpu.io.utia_io`), matching ``utia::normalize``.
"""

from __future__ import annotations

import jax.numpy as jnp

from dj_brdf_tpu.core.pytree import pytree_dataclass

STEP_T = 15.0
STEP_P = 7.5
NTI = 6
NPI = 48
NTV = 6
NPV = 48


def _axis_theta(theta_deg, n):
    """Edge-clamped linear bin + extrapolating weights (dj_brdf.h:1082-1111)."""
    i0 = jnp.floor(theta_deg / STEP_T).astype(jnp.int32)
    i0 = jnp.minimum(i0, n - 2)
    i1 = i0 + 1
    w1 = theta_deg - STEP_T * i0
    w0 = STEP_T * i1 - theta_deg
    s = w0 + w1
    return i0, i1, w0 / s, w1 / s


def _axis_phi(phi_deg, n):
    """Periodic azimuth bin: weights use the unwrapped upper index
    (dj_brdf.h:1095-1127)."""
    i0 = jnp.floor(phi_deg / STEP_P).astype(jnp.int32)
    i1 = i0 + 1
    w1 = phi_deg - STEP_P * i0
    w0 = STEP_P * i1 - phi_deg
    s = w0 + w1
    i1 = jnp.where(i1 == n, 0, i1)
    i0 = jnp.clip(i0, 0, n - 1)
    return i0, i1, w0 / s, w1 / s


@pytree_dataclass
class Utia:
    """UTIA table BRDF. ``table``: (3, NTI, NPI, NTV, NPV) after the
    loader's clamp + 1/140 normalization."""

    table: jnp.ndarray

    def eval(self, i, o):
        """f_r (reference utia::eval, dj_brdf.h:1063-1157). Returns (..., 3)."""
        r2d = 180.0 / jnp.pi
        theta_i = r2d * jnp.arccos(jnp.clip(i[..., 2], -1.0, 1.0))
        theta_o = r2d * jnp.arccos(jnp.clip(o[..., 2], -1.0, 1.0))
        phi_i = jnp.mod(r2d * jnp.arctan2(i[..., 1], i[..., 0]), 360.0)
        phi_o = jnp.mod(r2d * jnp.arctan2(o[..., 1], o[..., 0]), 360.0)

        below = (theta_i >= 90.0) | (theta_o >= 90.0)
        # clamp angles fed to the interpolator so gathers stay in range;
        # the result is masked out anyway when below the horizon
        theta_i = jnp.minimum(theta_i, 90.0)
        theta_o = jnp.minimum(theta_o, 90.0)

        iti0, iti1, wti0, wti1 = _axis_theta(theta_i, NTI)
        itv0, itv1, wtv0, wtv1 = _axis_theta(theta_o, NTV)
        ipi0, ipi1, wpi0, wpi1 = _axis_phi(phi_i, NPI)
        ipv0, ipv1, wpv0, wpv1 = _axis_phi(phi_o, NPV)

        flat = self.table.reshape(3, -1)

        def flat_idx(iti, ipi, itv, ipv):
            return ((iti * NPI + ipi) * NTV + itv) * NPV + ipv

        rgb = 0.0
        for iti, wti in ((iti0, wti0), (iti1, wti1)):
            for itv, wtv in ((itv0, wtv0), (itv1, wtv1)):
                for ipi, wpi in ((ipi0, wpi0), (ipi1, wpi1)):
                    for ipv, wpv in ((ipv0, wpv0), (ipv1, wpv1)):
                        w = (wti * wtv * wpi * wpv)[..., None]
                        idx = flat_idx(iti, ipi, itv, ipv)
                        taps = jnp.stack([jnp.take(flat[c], idx) for c in range(3)],
                                         axis=-1)
                        rgb = rgb + w * taps

        # per-channel sRGB-like decode + x100 scale (dj_brdf.h:1146-1150)
        decoded = jnp.where(rgb > 0.0375,
                            jnp.power(jnp.maximum(rgb + 0.055, 0.0) / 1.055, 2.4),
                            rgb / 12.92) * 100.0
        decoded = jnp.maximum(decoded, 0.0)
        return jnp.where(below[..., None], 0.0, decoded)

    def evalp(self, i, o):
        return self.eval(i, o) * i[..., 2:3]
