"""Synthetic measured-dataset baking.

Bakes any analytic BRDF into the MERL 90x90x180 half/diff binary
layout or the UTIA 6x48x6x48 layout. Used for tests (no measured
datasets ship with the repo) and for data-pipeline benchmarks. The
bin-center angle conventions invert the reference's index warps
(dj_brdf.h:906-957 for MERL, 1082-1127 for UTIA).
"""

from __future__ import annotations

import jax
import numpy as np
import jax.numpy as jnp

from dj_brdf_tpu.core.math import from_spherical, hd_to_io
from dj_brdf_tpu.models import merl as merl_mod
from dj_brdf_tpu.models import utia as utia_mod


def bake_merl(eval_fn) -> np.ndarray:
    """Evaluate ``eval_fn(i, o) -> (..., 3)`` at MERL bin centers.
    Returns a raw (3, 90, 90, 180) table (inverse channel scales
    applied; below-horizon bins set to -1 like real MERL files)."""
    nh, nd, npd = (merl_mod.RES_THETA_H, merl_mod.RES_THETA_D,
                   merl_mod.RES_PHI_D // 2)
    ih = np.arange(nh)
    theta_h = ((ih + 0.5) ** 2 / nh) * (np.pi / 2) / nh
    theta_d = (np.arange(nd) + 0.5) / nd * (np.pi / 2)
    phi_d = (np.arange(npd) + 0.5) / npd * np.pi

    TH, TD, PD = np.meshgrid(theta_h, theta_d, phi_d, indexing="ij")

    @jax.jit
    def _bake(TH, TD, PD):
        h = from_spherical(TH, jnp.zeros_like(TH))
        d = from_spherical(TD, PD)
        i, o = hd_to_io(h, d)
        return i, o, eval_fn(i, o)

    i, o, vals = _bake(jnp.asarray(TH, jnp.float32), jnp.asarray(TD, jnp.float32),
                       jnp.asarray(PD, jnp.float32))
    vals = np.asarray(vals, np.float64)  # (nh, nd, npd, 3)
    below = (np.asarray(i)[..., 2] <= 0.0) | (np.asarray(o)[..., 2] <= 0.0)
    inv_scales = np.asarray([1.0 / merl_mod.RED_SCALE,
                             1.0 / merl_mod.GREEN_SCALE,
                             1.0 / merl_mod.BLUE_SCALE])
    table = vals * inv_scales
    table[below] = -1.0
    return np.moveaxis(table, -1, 0)  # (3, nh, nd, npd)


def bake_utia(eval_fn) -> np.ndarray:
    """Evaluate ``eval_fn`` at UTIA bin centers. Returns the raw
    (3, 6, 48, 6, 48) table in file units (inverse of the sRGB-like
    decode + scales applied)."""
    theta = np.arange(utia_mod.NTI) * utia_mod.STEP_T * np.pi / 180.0
    phi = np.arange(utia_mod.NPI) * utia_mod.STEP_P * np.pi / 180.0
    TI, PI, TV, PV = np.meshgrid(theta, phi, theta, phi, indexing="ij")
    # clamp the last elevation ring just above the horizon
    TI = np.minimum(TI, np.radians(89.0))
    TV = np.minimum(TV, np.radians(89.0))
    i = from_spherical(jnp.asarray(TI, jnp.float32), jnp.asarray(PI, jnp.float32))
    o = from_spherical(jnp.asarray(TV, jnp.float32), jnp.asarray(PV, jnp.float32))
    vals = np.asarray(eval_fn(i, o), np.float64)  # (6,48,6,48,3)
    vals = np.moveaxis(vals, -1, 0)
    # invert eval's decode chain (dj_brdf.h:1146-1150): the table value t
    # satisfies eval = decode(t) * 100 with decode(t) = ((t+.055)/1.055)^2.4
    # for t > 0.0375 else t/12.92; the stored file value is t * 140
    decoded = vals / 100.0
    thr = 0.0375 / 12.92  # decoded-domain switch point
    t = np.where(decoded > thr,
                 1.055 * np.power(np.maximum(decoded, 0.0), 1.0 / 2.4) - 0.055,
                 decoded * 12.92)
    return t * 140.0
