"""Structure-of-arrays fast path for the GGX hot loop.

The general microfacet path (:mod:`dj_brdf_tpu.microfacet.brdf`) works
on (..., 3) direction arrays; XLA handles those well but the stacked
layout costs ~2x on TPU versus flat component arrays (lane-major, no
slice/concat traffic). This module is the speed-of-light formulation
used by the benchmark and the batch fitter: plain f32 component
arrays, GGX + Schlick specialization of evalp (the reference's
F*D*G/(4 o.z) chain, dj_brdf.h:1529-1547, with the closed-form GGX
sigma sigma(k) = (|warp(k)| + c)/2), and the relative-L2 fitting loss.

Semantics match ``mf.evalp(GGX(), Schlick(f0), params, i, o)`` to f32
rounding (tested), including the horizon/validity gates.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ggx_evalp_soa(pvec, ix, iy, iz, ox, oy, oz):
    """GGX+Schlick evalp on component arrays.

    ``pvec``: (8,) = [ax, ay, rho, txn, tyn, f0r, f0g, f0b] (already in
    constrained space). Returns (r, g, b) component arrays."""
    ax, ay, rho = pvec[0], pvec[1], pvec[2]
    txn, tyn = pvec[3], pvec[4]
    f0r, f0g, f0b = pvec[5], pvec[6], pvec[7]
    s = jnp.sqrt(jnp.maximum(1.0 - rho * rho, 0.0))
    # scalar reciprocals hoisted out of the per-element chain
    inv_ax = 1.0 / ax
    inv_axays = 1.0 / (ax * ay * s)
    ay_rho = ay * rho
    ay_s = ay * s

    hx, hy, hz = ix + ox, iy + oy, iz + oz
    hn = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-24))
    hx, hy, hz = hx * hn, hy * hn, hz * hn

    def sigma(kx, ky, kz):
        # warp + closed-form GGX sigma_std (dj_brdf.h:1620-1631, 2062-2065)
        a = kx * ax + ky * ay_rho
        b = ky * ay_s
        c = kz - kx * txn - ky * tyn
        nrm = jnp.sqrt(a * a + b * b + c * c)
        return (nrm + c) * 0.5, c

    si, ci = sigma(ix, iy, iz)
    so, co = sigma(ox, oy, oz)
    g1i = jnp.where((ci > 0) & (jnp.abs(si) >= 1e-12), iz / jnp.where(jnp.abs(si) < 1e-12, 1.0, si), 0.0)
    g1o = jnp.where((co > 0) & (jnp.abs(so) >= 1e-12), oz / jnp.where(jnp.abs(so) < 1e-12, 1.0, so), 0.0)
    tmp = g1i * g1o
    den = g1i + g1o - tmp
    g = jnp.where((tmp > 0) & (jnp.abs(den) >= 1e-12),
                  tmp / jnp.where(jnp.abs(den) < 1e-12, 1.0, den), 0.0)

    # ndf (dj_brdf.h:1559-1587): slopes, affine warp, GGX p22 — one
    # per-element reciprocal (inv_hz) covers slopes and the cos^4
    valid_h = hz > 1e-4
    inv_hz = 1.0 / jnp.where(valid_h, hz, 1.0)
    sx = -hx * inv_hz - txn
    sy = -hy * inv_hz - tyn
    x_ = sx * inv_ax
    y_ = (ax * sy - ay_rho * sx) * inv_axays
    r2 = x_ * x_ + y_ * y_
    t1 = 1.0 + r2
    inv_hz2 = inv_hz * inv_hz
    d_num = (1.0 / jnp.pi) * inv_axays * (inv_hz2 * inv_hz2)
    d = jnp.where(valid_h, d_num / (t1 * t1), 0.0)

    cosd = jnp.clip(ox * hx + oy * hy + oz * hz, 0.0, 1.0)
    c1 = 1.0 - cosd
    c2 = c1 * c1
    c5 = c2 * c2 * c1

    oz4 = 4.0 * oz
    base = jnp.where((g > 0) & (jnp.abs(oz4) >= 1e-12),
                     d * g / jnp.where(jnp.abs(oz4) < 1e-12, 1.0, oz4), 0.0)
    r = (f0r + c5 * (1.0 - f0r)) * base
    gg = (f0g + c5 * (1.0 - f0g)) * base
    b = (f0b + c5 * (1.0 - f0b)) * base
    return r, gg, b


def raw_to_pvec(raw):
    """RawFit (unconstrained, see fit.lsq) -> constrained (8,) pvec."""
    return jnp.stack([
        jnp.exp(raw.log_ax) + 1e-4,
        jnp.exp(raw.log_ay) + 1e-4,
        0.99 * jnp.tanh(raw.raw_rho),
        raw.txn, raw.tyn,
        jax.nn.sigmoid(raw.logit_f0[0]),
        jax.nn.sigmoid(raw.logit_f0[1]),
        jax.nn.sigmoid(raw.logit_f0[2]),
    ])


def ggx_lsq_loss_soa(pvec, ix, iy, iz, ox, oy, oz, tr, tg, tb,
                     eps: float = 1e-2):
    """Relative-L2 fitting loss on component arrays (mean over samples
    and channels, matching fit.lsq.relative_l2)."""
    r, g, b = ggx_evalp_soa(pvec, ix, iy, iz, ox, oy, oz)
    lr = (r - tr) / (tr + eps)
    lg = (g - tg) / (tg + eps)
    lb = (b - tb) / (tb + eps)
    return (jnp.mean(lr * lr) + jnp.mean(lg * lg) + jnp.mean(lb * lb)) / 3.0


def split_dirs(i, o):
    """(..., 3) pairs -> component arrays."""
    return (i[..., 0], i[..., 1], i[..., 2],
            o[..., 0], o[..., 1], o[..., 2])
