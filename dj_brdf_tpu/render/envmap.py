"""Environment-map (image-based) lighting for the path tracer.

The reference's Mitsuba scenes (the matpreview setup its LEAN maps
ship for, mitsuba/README) are lit by lat-long environment emitters;
Mitsuba importance-samples the emitter image and combines emitter and
BSDF sampling with multiple importance sampling. This module is the
TPU-native equivalent: a lat-long radiance table with the classic
two-level piecewise-constant importance scheme — a marginal CDF over
rows (sin-theta weighted) and a conditional CDF per row — built once
on device, sampled with vectorized compare-reduce searches (no
data-dependent control flow; tables are pytree leaves passed through
jit).

TPU cost model (the gather rules of DESIGN.md §6): radiance + pdf at
a direction is ONE issued row gather from a corner-packed (H*W, 16)
layout — 4 bilinear corner texels and their 4 pdf bins — and an
importance sample costs one (W,) row gather for the conditional CDF;
everything else (both CDF searches, the marginal quantities, the
sample's own pdf) is gather-free compare-reduce arithmetic.

Conventions: row j covers theta in [j, j+1] * pi/H (z-up; theta=0 is
+z), column i covers phi in [i, i+1] * 2pi/W, dir = (sin t cos p,
sin t sin p, cos t). The sampler is exact for its own piecewise-
constant density: pdf values are the true sampling density over solid
angle (bin mass / (bin angle area * sin theta)), so dividing by them
is unbiased and MIS weights can use them directly.
"""

from __future__ import annotations

import jax.numpy as jnp

from dj_brdf_tpu.core.pytree import pytree_dataclass


@pytree_dataclass
class EnvMap:
    """Lat-long environment light with two-level importance tables."""

    radiance: jnp.ndarray   # (H, W, 3)
    row_cdf: jnp.ndarray    # (H,)    inclusive cumulative row masses
    row_mass: jnp.ndarray   # (H,)
    col_cdf: jnp.ndarray    # (H, W)  inclusive cumulative per-row
    packed: jnp.ndarray     # (H*W, 16) per BASE cell: 4 bilinear
    #                         corner texels (12) + their 4 pdf bins

    @classmethod
    def build(cls, radiance):
        """Precompute the sampling tables from an (H, W, 3) lat-long
        radiance image (values >= 0)."""
        radiance = jnp.asarray(radiance, jnp.float32)
        h, w = radiance.shape[:2]
        lum = jnp.maximum(radiance, 0.0).mean(-1) + 1e-12
        sin_rows = jnp.sin((jnp.arange(h, dtype=jnp.float32) + 0.5)
                           * (jnp.pi / h))
        mass = lum * sin_rows[:, None]
        mass = mass / mass.sum()                 # (H, W), sums to 1
        row_mass = mass.sum(-1)                  # (H,)
        row_cdf = jnp.cumsum(row_mass)
        col_mass = mass / row_mass[:, None]
        col_cdf = jnp.cumsum(col_mass, axis=-1)
        dtheta = jnp.pi / h
        dphi = 2.0 * jnp.pi / w
        pdf_bins = mass / (dtheta * dphi)

        # corner packing anchored at the bilinear BASE cell (j, i):
        # corners are centers (j, i), (j, i+1 wrap), (j+1 clamp, i),
        # (j+1 clamp, i+1 wrap). The direction's pdf bin is always one
        # of the same 4 corners (selected by the half-cell bits), so
        # its density rides in the same gathered row.
        def corners(x):
            x01 = jnp.roll(x, -1, axis=1)
            down = jnp.concatenate([x[1:], x[-1:]], axis=0)
            return x, x01, down, jnp.roll(down, -1, axis=1)

        r00, r01, r10, r11 = corners(radiance)
        p00, p01, p10, p11 = corners(pdf_bins[..., None])
        packed = jnp.concatenate(
            [r00, r01, r10, r11, p00, p01, p10, p11], -1
        ).reshape(h * w, 16)
        # pdf_bins is consumed only by the packing above — the render
        # loops read densities from `packed`, so it is not a field
        return cls(radiance=radiance, row_cdf=row_cdf,
                   row_mass=row_mass, col_cdf=col_cdf, packed=packed)

    # -- queries -------------------------------------------------------
    def eval_with_pdf(self, dx, dy, dz):
        """(r, g, b, pdf) toward a direction with ONE issued row
        gather: bilinear radiance (periodic in phi, clamped in theta)
        plus the exact binned sampling density."""
        h, w = self.radiance.shape[:2]
        theta = jnp.arccos(jnp.clip(dz, -1.0, 1.0))
        phi = jnp.arctan2(dy, dx)
        phi = jnp.where(phi < 0.0, phi + 2.0 * jnp.pi, phi)
        t1 = jnp.clip(theta * (h / jnp.pi) - 0.5, 0.0, h - 1.0)
        t2 = phi * (w / (2.0 * jnp.pi)) - 0.5
        j0 = jnp.minimum(jnp.floor(t1).astype(jnp.int32), h - 1)
        i0f = jnp.floor(t2)
        f1 = t1 - j0
        f2 = t2 - i0f
        i0 = jnp.mod(i0f.astype(jnp.int32), w)

        row = jnp.take(self.packed, j0 * w + i0, axis=0)      # (..., 16)
        f1e = f1[..., None]
        f2e = f2[..., None]
        a = row[..., 0:3] + f2e * (row[..., 3:6] - row[..., 0:3])
        b = row[..., 6:9] + f2e * (row[..., 9:12] - row[..., 6:9])
        rgb = a + f1e * (b - a)

        # the true pdf bin (unshifted grid) is corner (f1>=0.5,
        # f2>=0.5) of this base cell
        hi1 = f1 >= 0.5
        hi2 = f2 >= 0.5
        pb = jnp.where(hi1, jnp.where(hi2, row[..., 15], row[..., 14]),
                       jnp.where(hi2, row[..., 13], row[..., 12]))
        sin_t = jnp.sqrt(jnp.maximum(1.0 - dz * dz, 1e-8))
        return rgb[..., 0], rgb[..., 1], rgb[..., 2], pb / sin_t

    def eval(self, dx, dy, dz):
        """Bilinear radiance only. Returns (r, g, b)."""
        r, g, b, _ = self.eval_with_pdf(dx, dy, dz)
        return r, g, b

    def pdf(self, dx, dy, dz):
        """True sampling density over solid angle at a direction."""
        return self.eval_with_pdf(dx, dy, dz)[3]

    def sample(self, u1, u2):
        """Importance-sample a direction: returns (dx, dy, dz, pdf).
        Two-level inverse CDF with in-bin uniform offsets; pdf is the
        exact density the draw came from, assembled from the marginal
        pieces already in registers (no pdf gather)."""
        h, w = self.radiance.shape[:2]
        le_r = self.row_cdf <= u1[..., None]                  # (..., H)
        j = jnp.clip(jnp.sum(le_r, axis=-1).astype(jnp.int32), 0, h - 1)
        cdf_lo = jnp.sum(jnp.where(le_r, self.row_mass, 0.0), axis=-1)
        rmass = jnp.sum(jnp.where(jnp.arange(h) == j[..., None],
                                  self.row_mass, 0.0), axis=-1)
        fr = (u1 - cdf_lo) / jnp.maximum(rmass, 1e-12)
        theta = (j + jnp.clip(fr, 0.0, 1.0)) * (jnp.pi / h)

        col_cdf_rows = jnp.take(self.col_cdf, j, axis=0)      # (..., W)
        le_c = col_cdf_rows <= u2[..., None]
        i = jnp.clip(jnp.sum(le_c, axis=-1).astype(jnp.int32), 0, w - 1)
        ccdf_hi = jnp.sum(jnp.where(jnp.arange(w) == i[..., None],
                                    col_cdf_rows, 0.0), axis=-1)
        ccdf_lo = jnp.max(jnp.where(le_c, col_cdf_rows, 0.0), axis=-1)
        cmass = ccdf_hi - ccdf_lo
        fc = (u2 - ccdf_lo) / jnp.maximum(cmass, 1e-12)
        phi = (i + jnp.clip(fc, 0.0, 1.0)) * (2.0 * jnp.pi / w)

        sin_t = jnp.sin(theta)
        dx = sin_t * jnp.cos(phi)
        dy = sin_t * jnp.sin(phi)
        dz = jnp.cos(theta)
        pdf = (rmass * cmass) / ((jnp.pi / h) * (2.0 * jnp.pi / w)
                                 * jnp.maximum(sin_t, 1e-6))
        return dx, dy, dz, pdf


def power_heuristic(pdf_a, pdf_b):
    """MIS power heuristic (beta=2) weight for strategy a against b."""
    a2 = pdf_a * pdf_a
    denom = a2 + pdf_b * pdf_b
    return jnp.where(denom > 0.0, a2 / jnp.where(denom > 0.0, denom, 1.0),
                     0.0)
