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


def ggx_lsq_fwdbwd_soa(pvec, ix, iy, iz, ox, oy, oz, tr, tg, tb,
                       eps: float = 1e-2, recip=None):
    """Hand-written forward + adjoint of the fitting loss.

    Returns ``(loss_sum, grad(8,))`` where ``loss_sum`` is the
    per-sample channel-mean loss *summed* over samples and ``grad`` is
    its exact derivative w.r.t. ``pvec``. Dividing both by the sample
    count reproduces :func:`ggx_lsq_loss_soa` and its autodiff
    gradient (tested); the point of writing the adjoint by hand is
    that every backward term reuses a forward intermediate — no
    recomputed transcendentals, no residual round-trips — which is
    what the fused kernel (`ops/fused_fit.py`) needs to stay
    compute-bound at the VPU roofline instead of the AD graph's.

    All gates mirror :func:`ggx_evalp_soa` exactly; gated-out samples
    contribute exactly zero to every gradient component.
    """
    if recip is None:
        recip = lambda x: 1.0 / x
    ax, ay, rho = pvec[0], pvec[1], pvec[2]
    txn, tyn = pvec[3], pvec[4]
    f0r, f0g, f0b = pvec[5], pvec[6], pvec[7]

    s = jnp.sqrt(jnp.maximum(1.0 - rho * rho, 0.0))
    inv_ax = 1.0 / ax
    inv_ay = 1.0 / ay
    inv_s = 1.0 / s
    inv_axays = inv_ax * inv_ay * inv_s
    ay_rho = ay * rho
    ay_s = ay * s

    hx, hy, hz = ix + ox, iy + oy, iz + oz
    hn = jax.lax.rsqrt(jnp.maximum(hx * hx + hy * hy + hz * hz, 1e-24))
    hx, hy, hz = hx * hn, hy * hn, hz * hn

    def sigma(kx, ky, kz):
        a = kx * ax + ky * ay_rho
        b = ky * ay_s
        c = kz - kx * txn - ky * tyn
        q = a * a + b * b + c * c
        inv_nrm = jax.lax.rsqrt(jnp.maximum(q, 1e-24))
        nrm = q * inv_nrm
        return (nrm + c) * 0.5, a, b, c, inv_nrm

    si, a_i, b_i, c_i, inrm_i = sigma(ix, iy, iz)
    so, a_o, b_o, c_o, inrm_o = sigma(ox, oy, oz)
    ok_i = (c_i > 0) & (jnp.abs(si) >= 1e-12)
    ok_o = (c_o > 0) & (jnp.abs(so) >= 1e-12)
    inv_si = jnp.where(ok_i, recip(jnp.where(ok_i, si, 1.0)), 0.0)
    inv_so = jnp.where(ok_o, recip(jnp.where(ok_o, so, 1.0)), 0.0)
    g1i = iz * inv_si
    g1o = oz * inv_so
    tmp = g1i * g1o
    den = g1i + g1o - tmp
    ok_g = (tmp > 0) & (jnp.abs(den) >= 1e-12)
    inv_den = jnp.where(ok_g, recip(jnp.where(ok_g, den, 1.0)), 0.0)
    g = tmp * inv_den

    valid_h = hz > 1e-4
    inv_hz = recip(jnp.where(valid_h, hz, 1.0))
    sx = -hx * inv_hz - txn
    sy = -hy * inv_hz - tyn
    u = sx * inv_ax
    v = sy * inv_ay
    y_ = (v - rho * u) * inv_s
    r2 = u * u + y_ * y_
    inv_t1 = recip(1.0 + r2)
    inv_hz2 = inv_hz * inv_hz
    d = jnp.where(valid_h,
                  ((1.0 / jnp.pi) * inv_axays) * (inv_hz2 * inv_hz2)
                  * (inv_t1 * inv_t1), 0.0)

    cosd = jnp.clip(ox * hx + oy * hy + oz * hz, 0.0, 1.0)
    c1 = 1.0 - cosd
    c2 = c1 * c1
    c5 = c2 * c2 * c1

    oz4 = 4.0 * oz
    ok_b = (g > 0) & (jnp.abs(oz4) >= 1e-12)
    inv_oz4 = jnp.where(ok_b, recip(jnp.where(ok_b, oz4, 1.0)), 0.0)
    base = d * g * inv_oz4

    # --- loss (per-sample mean over channels) + upstream weights
    third = jnp.float32(1.0 / 3.0)
    inv_tr = recip(tr + eps)
    inv_tg = recip(tg + eps)
    inv_tb = recip(tb + eps)
    Fr = f0r + c5 * (1.0 - f0r)
    Fg = f0g + c5 * (1.0 - f0g)
    Fb = f0b + c5 * (1.0 - f0b)
    rr = (Fr * base - tr) * inv_tr
    rg = (Fg * base - tg) * inv_tg
    rb = (Fb * base - tb) * inv_tb
    loss_sum = third * jnp.sum(rr * rr + rg * rg + rb * rb)

    wr = (2.0 * third) * rr * inv_tr        # dL/dpred_c
    wg = (2.0 * third) * rg * inv_tg
    wb = (2.0 * third) * rb * inv_tb

    one_m_c5_base = (1.0 - c5) * base
    g_f0r = jnp.sum(wr * one_m_c5_base)
    g_f0g = jnp.sum(wg * one_m_c5_base)
    g_f0b = jnp.sum(wb * one_m_c5_base)

    gbase = wr * Fr + wg * Fg + wb * Fb
    gd = gbase * g * inv_oz4                # dL/dD (inv_oz4 gates)
    gg = gbase * d * inv_oz4                # dL/dG

    # --- G path: dG/dg1 = (other/den)^2; dg1/dsigma = -g1/sigma
    gG1i = gg * (g1o * inv_den) ** 2
    gG1o = gg * (g1i * inv_den) ** 2
    gsig_i = -gG1i * g1i * inv_si
    gsig_o = -gG1o * g1o * inv_so

    def sigma_bwd(gsig, a, b, c, inv_nrm, kx, ky):
        da = 0.5 * gsig * a * inv_nrm       # dL/da
        db = 0.5 * gsig * b * inv_nrm
        dc = 0.5 * gsig * (c * inv_nrm + 1.0)
        gax = da * kx
        gay = ky * (da * rho + db * s)
        grho = ky * ay * (da - db * rho * inv_s)
        gtx = -dc * kx
        gty = -dc * ky
        return gax, gay, grho, gtx, gty

    ax_i, ay_i, rho_i, tx_i, ty_i = sigma_bwd(gsig_i, a_i, b_i, c_i,
                                              inrm_i, ix, iy)
    ax_o, ay_o, rho_o, tx_o, ty_o = sigma_bwd(gsig_o, a_o, b_o, c_o,
                                              inrm_o, ox, oy)

    # --- D path: dD/dp = D * (-dlog(ax ay s)/dp - 2 dt1/dp / t1)
    S = gd * d
    q4 = 4.0 * inv_t1
    d_ax = S * inv_ax * (q4 * (u * u - y_ * rho * u * inv_s) - 1.0)
    d_ay = S * inv_ay * (q4 * y_ * v * inv_s - 1.0)
    d_rho = S * (rho * (inv_s * inv_s)
                 - q4 * y_ * (y_ * rho * (inv_s * inv_s) - u * inv_s))
    d_tx = S * q4 * inv_ax * (u - y_ * rho * inv_s)
    d_ty = S * q4 * inv_ay * inv_s * y_

    grad = jnp.stack([
        jnp.sum(ax_i + ax_o + d_ax),
        jnp.sum(ay_i + ay_o + d_ay),
        jnp.sum(rho_i + rho_o + d_rho),
        jnp.sum(tx_i + tx_o + d_tx),
        jnp.sum(ty_i + ty_o + d_ty),
        g_f0r, g_f0g, g_f0b,
    ])
    return loss_sum, grad
