"""Microfacet normal/slope distributions.

TPU-native versions of the reference's distribution hierarchy:
``djb::beckmann`` (dj_brdf.h:1863-2051), ``djb::ggx`` (2053-2146),
``djb::tabular`` (2148-2176, 2215-2762) and
``djb::tabular_anisotropic`` (2178-2211, 2238-3122).

Each distribution is a pytree dataclass exposing the *standard-frame*
interface consumed by :mod:`dj_brdf_tpu.microfacet.brdf`:

  * ``p22_std(x, y)``        — standard slope PDF
  * ``sigma_std(k)``         — standard projected area (microflake sigma)
  * ``sample_vp22_std(u1,u2,k)`` — visible-slope sampling (Smith VNDF
    for Beckmann/GGX; NDF ("nmap") sampling for tabulated ones)

Everything is branchless (``jnp.where`` instead of the reference's
``if`` trees) so one code path serves jit/vmap/grad on TPU. Tables in
the tabulated distributions are differentiable pytree leaves.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from dj_brdf_tpu.core import spline
from dj_brdf_tpu.core.math import vec3
from dj_brdf_tpu.core.pytree import pytree_dataclass, static_field
from dj_brdf_tpu.core.special import erf, erfinv

_SQRT_PI_INV = 0.5641895835477563  # 1/sqrt(pi)
_HALF_SQRT_PI = 0.8862269254527580  # sqrt(pi)/2


def beckmann_qf2_erf_domain(u, cos_theta_k, sin_theta_k,
                            iterations: int = 4, recip=None):
    """Beckmann visible-slope quantile solve in the erf domain —
    returns b with erfinv(b) the sampled slope.

    The reference (dj_brdf.h:1897-1952, after Wenzel Jakob's Mitsuba
    routine) runs <=9 safeguarded *Newton* steps with an early break;
    here each lockstep iteration takes a *Halley* step instead. The
    second derivative is nearly free — f'' / (2 f') =
    -tan(theta) * (sqrt(pi)/2) * e^{+ie^2} / (2 (1 - ie tan)) reuses
    the iteration's e^{-ie^2} through one reciprocal — and the cubic
    convergence reaches the reference's |CDF - u| < 1e-5 stopping
    criterion in <=4 iterations everywhere a measured 512x256 (u,
    theta) grid reaches it at all (iterations 4 and 5 agree to p999
    there), cutting the per-sample erfinv+exp count by half. Falls
    back to the
    plain Newton step where the Gaussian underflows (far tail) or the
    Halley denominator degenerates; same bisection safeguard and
    convergence mask, so converged results agree with the reference
    solver to its own stopping tolerance.

    ``recip``: optional fast-reciprocal hook (Pallas kernels pass the
    VPU approximate reciprocal)."""
    if recip is None:
        recip = lambda x: 1.0 / x
    safe_sin = jnp.maximum(sin_theta_k, 1e-12)
    safe_cos = jnp.maximum(cos_theta_k, 1e-12)
    cot_theta_k = safe_cos * recip(safe_sin)
    tan_theta_k = sin_theta_k * recip(safe_cos)

    c0 = erf(cot_theta_k)
    u = jnp.maximum(u, 1e-6)

    fit = 1.0 + cos_theta_k * (-0.876 + cos_theta_k
                               * (0.4265 - 0.0594 * cos_theta_k))
    b0 = c0 - (1.0 + c0) * jnp.power(1.0 - u, fit)
    normalization = recip(1.0 + c0 + _SQRT_PI_INV * tan_theta_k
                          * jnp.exp(-cot_theta_k * cot_theta_k))

    def body(_, carry):
        a, b, c, done = carry
        # bisection fix-up; also catches NaN (comparisons are false)
        fix = jnp.logical_not((b >= a) & (b <= c))
        b = jnp.where(~done & fix, 0.5 * (a + c), b)

        inv_erf = erfinv(b)
        eneg = jnp.exp(-inv_erf * inv_erf)
        value = normalization * (1.0 + b + _SQRT_PI_INV * tan_theta_k
                                 * eneg) - u
        dfac = 1.0 - inv_erf * tan_theta_k

        newly_done = jnp.abs(value) < 1e-5
        upd = ~done & ~newly_done
        c = jnp.where(upd & (value > 0), b, c)
        a = jnp.where(upd & (value <= 0), b, a)

        r = value * recip(normalization * dfac)       # Newton step
        h = -tan_theta_k * _HALF_SQRT_PI \
            * recip(jnp.maximum(eneg, 1e-10) * (2.0 * dfac))
        denom = 1.0 - r * h
        ok_h = (eneg > 1e-10) & (denom > 0.5)
        step = r * jnp.where(ok_h,
                             recip(jnp.where(ok_h, denom, 1.0)), 1.0)
        b = jnp.where(upd, b - step, b)
        return a, b, c, done | newly_done

    a = jnp.full_like(b0, -1.0)
    done = jnp.zeros_like(b0, dtype=bool)
    _, b, _, _ = jax.lax.fori_loop(0, iterations, body, (a, b0, c0, done))
    return b


def _sample_smith_radial(dist, u1, u2, k):
    """Rotate standard visible slopes into the azimuthal frame of k
    (reference radial::sample_vp22_std_smith, dj_brdf.h:1818-1846)."""
    cos_theta_k = k[..., 2]
    sin_theta_k = jnp.sqrt(jnp.maximum(1.0 - cos_theta_k * cos_theta_k, 0.0))
    tx = dist.qf2_radial(u1, cos_theta_k, sin_theta_k)
    ty = dist.qf3_radial(u2, tx)

    normal_incidence = sin_theta_k == 0.0
    nrm = jax.lax.rsqrt(jnp.maximum(k[..., 0] ** 2 + k[..., 1] ** 2, 1e-24))
    cos_phi_k = jnp.where(normal_incidence, 1.0, k[..., 0] * nrm)
    sin_phi_k = jnp.where(normal_incidence, 0.0, k[..., 1] * nrm)
    xslope = cos_phi_k * tx - sin_phi_k * ty
    yslope = sin_phi_k * tx + cos_phi_k * ty
    return xslope, yslope


def _sample_nmap_radial(dist, u1, u2):
    """Polar NDF sampling (reference radial::sample_vp22_std_nmap,
    dj_brdf.h:1806-1816)."""
    phi_h = u1 * 2.0 * jnp.pi
    r_h = dist.qf_radial(u2)
    return r_h * jnp.cos(phi_h), r_h * jnp.sin(phi_h)


@pytree_dataclass
class Beckmann:
    """Beckmann (Gaussian-slope) distribution (reference djb::beckmann,
    dj_brdf.h:1863-1957)."""

    supports_smith_vndf: bool = static_field(default=True)

    # -- radial queries ----------------------------------------------
    def p22_radial(self, r_sqr):
        return jnp.exp(-r_sqr) / jnp.pi

    def sigma_std_radial(self, cos_theta_k):
        """Closed-form projected area with erf (dj_brdf.h:1871-1879)."""
        c = cos_theta_k
        sin_theta_k = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0))
        safe_sin = jnp.maximum(sin_theta_k, 1e-12)
        nu = c / safe_sin
        tmp = jnp.exp(-nu * nu) * _SQRT_PI_INV
        sigma = (c * (1.0 + erf(nu)) + sin_theta_k * tmp) / 2.0
        return jnp.where(c >= 1.0, 1.0, sigma)

    def cdf_radial(self, r):
        return 1.0 - jnp.exp(-r * r)

    def qf_radial(self, u):
        return jnp.sqrt(-jnp.log(jnp.maximum(1.0 - u, 1e-38)))

    def qf1(self, u):
        return erfinv(2.0 * u - 1.0)

    def qf2_radial(self, u, cos_theta_k, sin_theta_k):
        """Visible-slope quantile (dj_brdf.h:1897-1952); see
        :func:`beckmann_qf2_erf_domain`."""
        b = beckmann_qf2_erf_domain(u, cos_theta_k, sin_theta_k)
        return erfinv(jnp.maximum(-0.9999, b))

    def qf3_radial(self, u, qf2):
        return self.qf1(u)

    # -- standard-frame interface -------------------------------------
    def p22_std(self, x, y):
        return self.p22_radial(x * x + y * y)

    def sigma_std(self, k):
        return self.sigma_std_radial(k[..., 2])

    def sample_vp22_std(self, u1, u2, k):
        return _sample_smith_radial(self, u1, u2, k)


@pytree_dataclass
class GGX:
    """GGX / Trowbridge-Reitz distribution (reference djb::ggx,
    dj_brdf.h:2053-2146)."""

    supports_smith_vndf: bool = static_field(default=True)

    def p22_radial(self, r_sqr):
        tmp = 1.0 + r_sqr
        return 1.0 / (jnp.pi * tmp * tmp)

    def sigma_std_radial(self, cos_theta_k):
        return (1.0 + cos_theta_k) / 2.0

    def cdf_radial(self, r):
        tmp = r * r
        return tmp / (1.0 + tmp)

    def qf_radial(self, u):
        return jnp.sqrt(u / jnp.maximum(1.0 - u, 1e-12))

    def qf1(self, u):
        """Closed-form marginal slope quantile (dj_brdf.h:2078-2087)."""
        t = jnp.abs(2.0 * u - 1.0)
        mag = t * jax.lax.rsqrt(jnp.maximum(1.0 - t * t, 1e-12))
        return jnp.where(u < 0.5, -mag, mag)

    def qf2_radial(self, u, cos_theta_k, sin_theta_k):
        """Closed-form visible x-slope quantile, 4-branch tan/cot form
        made branchless (dj_brdf.h:2089-2119)."""
        sin_theta = u * (1.0 + cos_theta_k) - 1.0
        cos_theta = jnp.sqrt(jnp.maximum(1.0 - sin_theta * sin_theta, 0.0))

        safe_cos = jnp.maximum(cos_theta, 1e-12)
        safe_sin_t = jnp.where(sin_theta == 0.0, 1e-12, sin_theta)
        tan_theta = sin_theta / safe_cos
        cot_theta = cos_theta / safe_sin_t

        safe_cos_k = jnp.maximum(cos_theta_k, 1e-12)
        safe_sin_k = jnp.maximum(sin_theta_k, 1e-12)
        tan_theta_k = sin_theta_k / safe_cos_k
        cot_theta_k = cos_theta_k / safe_sin_k

        # branch on cos_theta > sin(pi/4) and sin_theta_k < sin(pi/4)
        s = 0.707107
        r_tt = -(tan_theta + tan_theta_k) / (1.0 - tan_theta * tan_theta_k)
        r_tc = (1.0 + tan_theta * cot_theta_k) / (tan_theta - cot_theta_k)
        r_ct = (1.0 + tan_theta_k * cot_theta) / (tan_theta_k - cot_theta)
        r_cc = (cot_theta + cot_theta_k) / (1.0 - cot_theta * cot_theta_k)
        return jnp.where(cos_theta > s,
                         jnp.where(sin_theta_k < s, r_tt, r_tc),
                         jnp.where(sin_theta_k < s, r_ct, r_cc))

    def qf3_radial(self, u, qf2):
        """Sign-split rational approximation (dj_brdf.h:2121-2146,
        coefficients from Mitsuba)."""
        alpha = jnp.sqrt(1.0 + qf2 * qf2)
        s = jnp.where(u < 0.5, -1.0, 1.0)
        t = jnp.where(u < 0.5, 2.0 * (0.5 - u), 2.0 * (u - 0.5))
        p = t * (t * (t * (-0.365728915865723)
                 + 0.790235037209296) - 0.424965825137544) + 0.000152998850436920
        q = t * (t * (t * (t * 0.169507819808272 - 0.397203533833404)
                 - 0.232500544458471) + 1.0) - 0.539825872510702
        return s * alpha * (p / q)

    def p22_std(self, x, y):
        return self.p22_radial(x * x + y * y)

    def sigma_std(self, k):
        return self.sigma_std_radial(k[..., 2])

    def sample_vp22_std(self, u1, u2, k):
        return _sample_smith_radial(self, u1, u2, k)


@pytree_dataclass
class GGXSphericalCaps(GGX):
    """GGX with spherical-cap VNDF sampling (Dupuy & Benyoub,
    "Sampling Visible GGX Normals with Spherical Caps", 2023,
    arXiv:2306.05044): samples the visible half-vector directly from a
    uniform spherical cap — 2 transcendentals instead of the
    reference's 4-branch qf2 + rational qf3 (dj_brdf.h:2089-2146).
    Identical distribution (VNDF) and pdf; strictly a faster sampler,
    not present in the reference."""

    def sample_vp22_std(self, u1, u2, k):
        kz = k[..., 2]
        phi = 2.0 * jnp.pi * u1
        # uniform z on the cap [-kz, 1]
        z = (1.0 - u2) * (1.0 + kz) - kz
        sin_t = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
        cx = sin_t * jnp.cos(phi)
        cy = sin_t * jnp.sin(phi)
        # visible half-vector (un-normalized is fine for slopes)
        hx = cx + k[..., 0]
        hy = cy + k[..., 1]
        hz = jnp.maximum(z + kz, 1e-12)
        return -hx / hz, -hy / hz


@pytree_dataclass
class Tabular:
    """Isotropic tabulated distribution (reference djb::tabular,
    dj_brdf.h:2148-2176). Tables are device arrays produced by the
    fitting pipeline (:mod:`dj_brdf_tpu.fit.tabular`) and are
    differentiable leaves.

    * ``p22``:  (res,) slope PDF sampled in u = sqrt(2 atan(r)/pi)
    * ``sigma``: (res,) projected area sampled in u = 2 theta/pi
    * ``cdf``, ``qf``: (res,) radial CDF/quantile for nmap sampling
    """

    p22: jnp.ndarray
    sigma: jnp.ndarray
    cdf: jnp.ndarray
    qf: jnp.ndarray
    supports_smith_vndf: bool = static_field(default=False)

    def p22_radial(self, r_sqr):
        r = jnp.sqrt(jnp.maximum(r_sqr, 0.0))
        u = jnp.sqrt(2.0 * jnp.arctan(r) / jnp.pi)
        return spline.eval1d(self.p22, u, wrap="edge")

    def sigma_std_radial(self, cos_theta_k):
        u = 2.0 * jnp.arccos(jnp.clip(cos_theta_k, -1.0, 1.0)) / jnp.pi
        return spline.eval1d(self.sigma, u, wrap="edge")

    def cdf_radial(self, r):
        u = jnp.maximum(jnp.arctan(r) * 2.0 / jnp.pi, 0.0)
        return spline.eval1d(self.cdf, jnp.sqrt(u), wrap="edge")

    def qf_radial(self, u):
        qf = spline.eval1d(self.qf, u, wrap="edge")
        return jnp.tan(qf * jnp.pi / 2.0)

    def p22_std(self, x, y):
        return self.p22_radial(x * x + y * y)

    def sigma_std(self, k):
        return self.sigma_std_radial(k[..., 2])

    def sample_vp22_std(self, u1, u2, k):
        return _sample_nmap_radial(self, u1, u2)


@pytree_dataclass
class TabularAnisotropic:
    """Anisotropic tabulated distribution (reference
    djb::tabular_anisotropic, dj_brdf.h:2178-2211, 2766-3103).

    2D tables are stored as (azimuthal_res, elevation_res) so the
    elevation axis is the fast (lane) axis, matching the reference's
    flat ``points[i + w*j]`` layout. Sampling uses the marginal-azimuth
    / conditional-elevation factorization (pdf1/cdf1/qf1, pdf2/cdf2/qf2).
    """

    p22: jnp.ndarray     # (H=azimuthal, W=elevation)
    sigma: jnp.ndarray   # (H, W)
    pdf1: jnp.ndarray    # (H,)
    cdf1: jnp.ndarray    # (H,)
    qf1_table: jnp.ndarray  # (H,)
    pdf2: jnp.ndarray    # (H, W)
    cdf2: jnp.ndarray    # (H, W)
    qf2_table: jnp.ndarray  # (H, W)
    supports_smith_vndf: bool = static_field(default=False)

    # -- eval ----------------------------------------------------------
    def p22_std_theta_phi(self, theta, phi):
        """(dj_brdf.h:2185-2196)."""
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        u1 = theta * 2.0 / jnp.pi
        u2 = phi * 0.5 / jnp.pi
        return spline.eval2d(self.p22, u1, u2, wrap1="edge", wrap2="repeat")

    def p22_std(self, x, y):
        theta = jnp.arctan(jnp.sqrt(x * x + y * y))
        phi = jnp.arctan2(-y, -x)
        return self.p22_std_theta_phi(theta, phi)

    def sigma_std(self, k):
        """(dj_brdf.h:2198-2211)."""
        theta = jnp.arccos(jnp.clip(k[..., 2], -1.0, 1.0))
        phi = jnp.arctan2(k[..., 1], k[..., 0])
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        u1 = theta * 2.0 / jnp.pi
        u2 = phi * 0.5 / jnp.pi
        return spline.eval2d(self.sigma, u1, u2, wrap1="edge", wrap2="repeat")

    # -- sampling tables ----------------------------------------------
    def pdf1_eval(self, phi):
        return spline.eval1d(self.pdf1, phi * 0.5 / jnp.pi, wrap="repeat")

    def cdf1_eval(self, phi):
        return spline.eval1d(self.cdf1, phi * 0.5 / jnp.pi, wrap="repeat")

    def qf1_eval(self, u1):
        return spline.eval1d(self.qf1_table, u1, wrap="edge") * 2.0 * jnp.pi

    def pdf2_eval(self, theta, phi):
        val = spline.eval2d(self.pdf2, theta * 2.0 / jnp.pi, phi * 0.5 / jnp.pi,
                            wrap1="edge", wrap2="repeat")
        return jnp.where(theta >= 0.5 * jnp.pi, 0.0, val)

    def cdf2_eval(self, theta, phi):
        val = spline.eval2d(self.cdf2, theta * 2.0 / jnp.pi, phi * 0.5 / jnp.pi,
                            wrap1="edge", wrap2="repeat")
        return jnp.where(theta >= 0.5 * jnp.pi, 1.0, val)

    def qf2_eval(self, u, phi):
        return spline.eval2d(self.qf2_table, u, phi / (2.0 * jnp.pi),
                             wrap1="edge", wrap2="repeat") * 0.5 * jnp.pi

    def sample_vp22_std(self, u1, u2, k):
        """Marginal/conditional nmap sampling (dj_brdf.h:2826-2837)."""
        phi = self.qf1_eval(u1)
        theta = self.qf2_eval(u2, phi)
        tan_theta = jnp.tan(theta)
        return -tan_theta * jnp.cos(phi), -tan_theta * jnp.sin(phi)
