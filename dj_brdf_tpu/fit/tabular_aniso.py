"""Anisotropic (elevation x azimuth) tabulation pipeline.

TPU-native version of the ``djb::tabular_anisotropic`` constructor
(dj_brdf.h:2238-2273) and its precomputations: the (w*h)^2 kernel
matrix + power iteration (2525-2579), 2D normalization (2306-2338),
2D projected-area table (2388-2432), and the marginal-azimuth /
conditional-elevation sampling tables pdf1/cdf1/qf1/pdf2/cdf2/qf2
(2848-3103).

The kernel matrix (8010^2 for the reference's 90x90 resolution) is
built as one batched device expression; the power iteration is a
row-shardable matvec (see :mod:`dj_brdf_tpu.parallel`). Table layout
is (azimuthal_res, elevation_res) with the elevation axis fast,
matching the reference's flat ``m_p22[i + w*j]``.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from dj_brdf_tpu import fresnel as fresnel_mod
from dj_brdf_tpu.core.math import from_spherical
from dj_brdf_tpu.fit.tabular import compute_fresnel as _compute_fresnel_iso
from dj_brdf_tpu.microfacet.ndf import TabularAnisotropic


def _p22_query(p22_table, theta, phi):
    """p22_std_theta_phi on a raw (H, W) table (dj_brdf.h:2185-2196)."""
    d = TabularAnisotropic(
        p22=p22_table, sigma=p22_table, pdf1=p22_table[:, 0],
        cdf1=p22_table[:, 0], qf1_table=p22_table[:, 0],
        pdf2=p22_table, cdf2=p22_table, qf2_table=p22_table)
    return d.p22_std_theta_phi(theta, phi)


def kernel_matrix(eval_fn, elevation_res: int, azimuthal_res: int) -> jnp.ndarray:
    """The (w*h, w*h) matrix A with A[col, row] = K(row, col) so a
    power step is ``A @ v`` (reference compute_p22_smith aniso,
    dj_brdf.h:2525-2566; matrix layout 2442-2465). Flat index is
    i2 * w + i1 (azimuth-major)."""
    w = elevation_res - 1
    h = azimuthal_res
    dtheta = np.sqrt(np.pi * 0.5) / w
    dphi = 2.0 * np.pi / h

    t1 = jnp.arange(w, dtype=jnp.float32) / w
    t2 = jnp.arange(h, dtype=jnp.float32) / h
    theta = t1 * np.float32(0.5 * np.pi)      # (w,)
    phi = t2 * np.float32(2.0 * np.pi)        # (h,)

    T, P = jnp.meshgrid(theta, phi)           # (h, w) azimuth-major
    sin_t = jnp.sin(T)
    zo = jnp.cos(T)
    xo = sin_t * jnp.cos(P)
    yo = sin_t * jnp.sin(P)

    d = from_spherical(T, P)
    fr_i = jnp.einsum("hwc,c->hw", eval_fn(d, d),
                      jnp.asarray([0.2126, 0.7152, 0.0722], jnp.float32))
    kji_tmp1 = (dtheta * dphi) * (4.0 * fr_i * zo ** 5)   # (h, w) columns

    tan_t = jnp.tan(T)
    cos_t = jnp.cos(T)
    slope1 = -tan_t * jnp.cos(P)              # (h, w) rows
    slope2 = -tan_t * jnp.sin(P)

    # m_dot_o[row, col] = zo_col - xo_col*slope1_row - yo_col*slope2_row
    zo_f = zo.reshape(-1)
    xo_f = xo.reshape(-1)
    yo_f = yo.reshape(-1)
    s1_f = slope1.reshape(-1)
    s2_f = slope2.reshape(-1)
    m_dot_o = (zo_f[None, :] - s1_f[:, None] * xo_f[None, :]
               - s2_f[:, None] * yo_f[None, :])
    kji_tmp2 = (tan_t / (cos_t * cos_t)).reshape(-1)[:, None] \
        * jnp.maximum(0.0, m_dot_o)
    K = kji_tmp1.reshape(-1)[None, :] * kji_tmp2      # K[row, col]
    return K.T                                         # A[col, row]


def power_iteration_p22(A, elevation_res: int, azimuthal_res: int,
                        iterations: int = 4) -> jnp.ndarray:
    """Unnormalized float64 power iteration + table assembly with the
    zero elevation-edge column (dj_brdf.h:2568-2578). Returns (H, W)."""
    w = elevation_res - 1
    Ah = np.asarray(A, np.float64)
    v = np.ones(Ah.shape[0], np.float64)
    for _ in range(iterations):
        v = Ah @ v
    grid = v.reshape(azimuthal_res, w)
    table = np.concatenate([grid, np.zeros((azimuthal_res, 1))], axis=1)
    return jnp.asarray(table, jnp.float32)


def normalize_p22(p22: jnp.ndarray) -> jnp.ndarray:
    """(dj_brdf.h:2306-2338)."""
    ntheta, nphi = 128, 256
    dtheta = np.sqrt(0.5 * np.pi) / ntheta
    dphi = 2.0 * np.pi / nphi
    u_t = jnp.arange(ntheta, dtype=jnp.float32) / ntheta
    u_p = jnp.arange(nphi, dtype=jnp.float32) / nphi
    theta = u_t * np.float32(np.sqrt(np.pi * 0.5))
    theta_sqr = theta * theta
    phi = u_p * np.float32(2.0 * np.pi)
    T2, P = jnp.meshgrid(theta_sqr, phi)
    Tw = jnp.meshgrid(theta, phi)[0]
    c = jnp.cos(T2)
    pdf = _p22_query(p22, T2, P)
    weight = (Tw * jnp.tan(T2)) / (c * c)
    k = jnp.sum(weight * pdf) * (2.0 * dtheta * dphi)
    return p22 / k


def compute_sigma(p22: jnp.ndarray) -> jnp.ndarray:
    """(dj_brdf.h:2388-2432). Returns (H, W)."""
    H, W = p22.shape
    w = W - 1
    ntheta, nphi = 45, 90
    dtheta = np.sqrt(np.pi * 0.5) / ntheta
    dphi = 2.0 * np.pi / nphi

    i2 = jnp.arange(H, dtype=jnp.float32) / H
    i1 = jnp.arange(w, dtype=jnp.float32) / w
    phi_k = i2 * np.float32(2.0 * np.pi)          # (H,)
    theta_k = i1 * np.float32(0.5 * np.pi)        # (w,)

    jt = jnp.arange(ntheta, dtype=jnp.float32) / ntheta
    jp = jnp.arange(nphi, dtype=jnp.float32) / nphi
    theta_w = jt * np.float32(np.sqrt(np.pi * 0.5))   # (ntheta,)
    theta_sq = theta_w * theta_w
    phi = jp * np.float32(2.0 * np.pi)            # (nphi,)

    # ndf at standard params: p22_std(theta, phi)/cos^4 via slope angles
    T2, P = jnp.meshgrid(theta_sq, phi)           # (nphi, ntheta)
    sin_t = jnp.sin(T2)
    cos_t = jnp.cos(T2)
    # p22_std of the slopes of h(theta,phi): direction-h slopes have
    # magnitude tan(theta) at azimuth phi; p22_std(x,y) evaluates
    # p22_std_theta_phi(atan(|slope|), atan2(-y,-x)) = (theta, phi)
    ndf_h = _p22_query(p22, T2, P) / cos_t ** 4   # (nphi, ntheta)
    weight = (jnp.meshgrid(theta_w, phi)[0] * sin_t)  # theta * sin(theta^2)

    # m_dot_k[k_elev, k_azim, j_phi, j_theta]
    sin_tk = jnp.sin(theta_k)
    cos_tk = jnp.cos(theta_k)
    cos_dphi = jnp.cos(phi[None, :] - phi_k[:, None])   # (H, nphi)
    term1 = (sin_tk[:, None, None, None]
             * sin_t[None, None, :, :]
             * cos_dphi[None, :, :, None])
    term2 = cos_tk[:, None, None, None] * cos_t[None, None, :, :]
    masking = jnp.maximum(0.0, term1 + term2) * ndf_h[None, None, :, :]
    nint = jnp.sum(weight[None, None] * masking, axis=(2, 3)) \
        * np.float32(2.0 * dtheta * dphi)            # (w, H)
    sigma = jnp.maximum(cos_tk[:, None], nint).T     # (H, w)
    return jnp.concatenate([sigma, sigma[:, -1:]], axis=1)


def compute_pdf1(p22: jnp.ndarray) -> jnp.ndarray:
    """Marginal azimuth PDF + its normalization (dj_brdf.h:2848-2875,
    3046-3067). Returns (H,)."""
    H = p22.shape[0]
    ntheta = 256
    dtheta = 0.5 * np.pi / ntheta
    u_p = jnp.arange(H, dtype=jnp.float32) / H
    phi = u_p * np.float32(2.0 * np.pi)
    u_t = jnp.arange(ntheta, dtype=jnp.float32) / ntheta
    theta = u_t * np.float32(0.5 * np.pi)
    T, P = jnp.meshgrid(theta, phi)
    c = jnp.cos(T)
    pdf = _p22_query(p22, T, P)
    nint = jnp.sum(pdf * jnp.tan(T) / (c * c), axis=1) * np.float32(dtheta)

    # normalize_pdf1: 512-pt quadrature of the *spline* of pdf1
    cnt = 512
    u = jnp.arange(cnt, dtype=jnp.float32) / cnt
    from dj_brdf_tpu.core import spline
    vals = spline.eval1d(nint, u, wrap="repeat")
    total = jnp.sum(vals) * np.float32(2.0 * np.pi / cnt)
    return nint / total


def compute_cdf1(pdf1: jnp.ndarray) -> jnp.ndarray:
    """(dj_brdf.h:2879-2901). Returns (H,)."""
    from dj_brdf_tpu.core import spline
    H = pdf1.shape[0]
    cnt = H - 1
    dphi = 2.0 * np.pi / cnt
    u = jnp.arange(1, cnt, dtype=jnp.float32) / cnt
    vals = spline.eval1d(pdf1, u, wrap="repeat")
    inner = jnp.cumsum(vals) * np.float32(dphi)
    return jnp.concatenate([jnp.zeros(1, jnp.float32), inner,
                            jnp.ones(1, jnp.float32)])


def compute_qf1(cdf1: jnp.ndarray) -> jnp.ndarray:
    """Inverse-CDF scan (dj_brdf.h:2905-2936). Returns (H,)."""
    from dj_brdf_tpu.core import spline
    cnt = cdf1.shape[0] - 1
    res = cnt * 8
    u = jnp.arange(res, dtype=jnp.float32) / res
    cdf_vals = spline.eval1d(cdf1, u, wrap="repeat")
    targets = jnp.arange(1, cnt, dtype=jnp.float32) / cnt
    idx = jnp.searchsorted(cdf_vals, targets, side="left")
    qf_mid = jnp.where(idx >= res, 1.0, jnp.take(u, jnp.minimum(idx, res - 1)))
    return jnp.concatenate([jnp.zeros(1, jnp.float32), qf_mid,
                            jnp.ones(1, jnp.float32)])


def compute_pdf2(p22: jnp.ndarray, pdf1: jnp.ndarray) -> jnp.ndarray:
    """Conditional elevation PDF + per-azimuth normalization
    (dj_brdf.h:2945-2970, 3071-3103). Returns (H, W)."""
    from dj_brdf_tpu.core import spline
    H, W = p22.shape
    ntheta = W - 1
    u_p = jnp.arange(H, dtype=jnp.float32) / H
    phi = u_p * np.float32(2.0 * np.pi)
    u_t = jnp.arange(ntheta, dtype=jnp.float32) / ntheta
    theta = u_t * np.float32(0.5 * np.pi)
    T, P = jnp.meshgrid(theta, phi)
    p22_v = _p22_query(p22, T, P)
    p1 = spline.eval1d(pdf1, u_p, wrap="repeat")[:, None]
    pdf2 = jnp.concatenate([p22_v / p1, jnp.zeros((H, 1), jnp.float32)],
                           axis=1)

    # normalize_pdf2: 256-pt theta quadrature of the 2D spline per phi
    nq = 256
    uq = jnp.arange(nq, dtype=jnp.float32) / nq
    theta_q = uq * np.float32(0.5 * np.pi)
    TQ, PQ = jnp.meshgrid(theta_q, phi)
    vals = spline.eval2d(pdf2, TQ * 2.0 / jnp.pi, PQ * 0.5 / jnp.pi,
                         wrap1="edge", wrap2="repeat")
    cq = jnp.cos(TQ)
    nint = jnp.sum(vals * jnp.tan(TQ) / (cq * cq), axis=1) \
        * np.float32(0.5 * np.pi / nq)
    return pdf2 / nint[:, None]


def compute_cdf2(pdf2: jnp.ndarray) -> jnp.ndarray:
    """(dj_brdf.h:2974-3001). Returns (H, W)."""
    from dj_brdf_tpu.core import spline
    H, W = pdf2.shape
    ntheta = W - 1
    dtheta = 0.5 * np.pi / ntheta
    u_p = jnp.arange(H, dtype=jnp.float32) / H
    phi = u_p * np.float32(2.0 * np.pi)
    u_t = jnp.arange(ntheta, dtype=jnp.float32) / ntheta
    theta = u_t * np.float32(0.5 * np.pi)
    T, P = jnp.meshgrid(theta, phi)
    vals = spline.eval2d(pdf2, T * 2.0 / jnp.pi, P * 0.5 / jnp.pi,
                         wrap1="edge", wrap2="repeat")
    c = jnp.cos(T)
    inner = jnp.cumsum(vals * jnp.tan(T) / (c * c), axis=1) \
        * np.float32(dtheta)
    return jnp.concatenate([inner, jnp.ones((H, 1), jnp.float32)], axis=1)


def compute_qf2(cdf2: jnp.ndarray) -> jnp.ndarray:
    """Per-azimuth inverse-CDF scan (dj_brdf.h:3005-3042). Returns (H, W)."""
    from dj_brdf_tpu.core import spline
    H, W = cdf2.shape
    ntheta = W - 1
    res = ntheta * 8
    u_p = jnp.arange(H, dtype=jnp.float32) / H
    phi = u_p * np.float32(2.0 * np.pi)
    u = jnp.arange(res, dtype=jnp.float32) / res
    theta = u * np.float32(0.5 * np.pi)
    T, P = jnp.meshgrid(theta, phi)
    cdf_vals = spline.eval2d(cdf2, T * 2.0 / jnp.pi, P * 0.5 / jnp.pi,
                             wrap1="edge", wrap2="repeat")  # (H, res)
    targets = jnp.arange(1, ntheta, dtype=jnp.float32) / ntheta

    def per_row(row):
        idx = jnp.searchsorted(row, targets, side="left")
        return jnp.where(idx >= res, 1.0, jnp.take(u, jnp.minimum(idx, res - 1)))

    mid = jax.vmap(per_row)(cdf_vals)             # (H, ntheta-1)
    return jnp.concatenate([jnp.zeros((H, 1), jnp.float32), mid,
                            jnp.ones((H, 1), jnp.float32)], axis=1)


def build_tabular_anisotropic(eval_fn, elevation_res: int,
                              azimuthal_res: int, shadow: bool = True,
                              use_jit: bool = True):
    """Full pipeline (reference ctor dj_brdf.h:2238-2273).
    Returns (TabularAnisotropic, SplineFresnel)."""
    def stage1():
        return kernel_matrix(eval_fn, elevation_res, azimuthal_res)

    def stage2(p22_raw):
        p22 = normalize_p22(p22_raw)
        sigma = compute_sigma(p22)
        pdf1 = compute_pdf1(p22)
        cdf1 = compute_cdf1(pdf1)
        qf1 = compute_qf1(cdf1)
        pdf2 = compute_pdf2(p22, pdf1)
        cdf2 = compute_cdf2(pdf2)
        qf2 = compute_qf2(cdf2)
        return p22, sigma, pdf1, cdf1, qf1, pdf2, cdf2, qf2

    if use_jit:
        stage1 = jax.jit(stage1)
        stage2 = jax.jit(stage2)

    A = stage1()
    p22_raw = power_iteration_p22(A, elevation_res, azimuthal_res)
    p22, sigma, pdf1, cdf1, qf1, pdf2, cdf2, qf2 = stage2(p22_raw)

    dist = TabularAnisotropic(p22=p22, sigma=sigma, pdf1=pdf1, cdf1=cdf1,
                              qf1_table=qf1, pdf2=pdf2, cdf2=cdf2,
                              qf2_table=qf2)
    # fresnel: identical to the iso routine at elevation_res
    # (dj_brdf.h:2643-2701); evaluate with the anisotropic tables
    fres_pts = _compute_fresnel_aniso(eval_fn, dist, elevation_res, shadow,
                                      use_jit)
    return dist, fresnel_mod.SplineFresnel(points=fres_pts)


def _compute_fresnel_aniso(eval_fn, dist, res, shadow, use_jit):
    from dj_brdf_tpu.fit import tabular as _t

    def run():
        # reuse the iso fresnel ratio logic but with the aniso
        # distribution's eval (microfacet eval with standard params)
        from dj_brdf_tpu.microfacet import brdf as mf
        from dj_brdf_tpu.microfacet.params import MicrofacetParams
        from dj_brdf_tpu.core.math import hd_to_io
        import jax.numpy as jnp
        cnt = res - 1
        params = MicrofacetParams.standard()
        ideal = fresnel_mod.Ideal()
        tmp = jnp.arange(cnt, dtype=jnp.float32) / cnt
        theta_d = tmp * np.float32(np.pi * 0.5)
        nj = 2 * cnt
        j = jnp.arange(nj, dtype=jnp.float32)
        theta_h = (j / cnt) ** 2 * np.float32(np.pi * 0.5)
        theta_h_prev = jnp.concatenate([jnp.zeros(1, jnp.float32),
                                        theta_h[:-1]])
        active = (theta_h_prev[None, :]
                  < (np.float32(np.pi * 0.5) - theta_d[:, None])) \
            & (theta_h[None, :] <= np.float32(np.pi * 0.5))
        TH = jnp.broadcast_to(theta_h[None, :], (cnt, nj))
        TD = jnp.broadcast_to(theta_d[:, None], (cnt, nj))
        dir_h = from_spherical(TH, jnp.zeros_like(TH))
        dir_d = from_spherical(TD, jnp.full_like(TD, np.float32(np.pi * 0.5)))
        _, dir_o = hd_to_io(dir_h, dir_d)
        dir_i = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0], jnp.float32),
                                 dir_o.shape)
        fr1 = eval_fn(dir_i, dir_o)
        fr2 = mf.eval(dist, ideal, params, dir_i, dir_o, shadow)
        ok = active[..., None] & (fr2 > 1e-4)
        ratio = jnp.where(ok, fr1 / jnp.where(ok, fr2, 1.0), 0.0)
        count = jnp.sum(ok, axis=1)
        total = jnp.sum(ratio, axis=1)
        avg = jnp.where(count == 0, 1.0,
                        jnp.minimum(1.0, total / jnp.maximum(count, 1)))
        return jnp.concatenate([avg, avg[-1:]], axis=0)

    if use_jit:
        run = jax.jit(run)
    return run()
