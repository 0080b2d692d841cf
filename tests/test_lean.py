"""LEAN/LEADR subsystem tests: lrep algebra (vs C++ oracle), map
builders, mip filtering, and the filtered render path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.oracle as orc
from dj_brdf_tpu.lean import maps
from dj_brdf_tpu.lean.filtered import FilteredBeckmannMaterial, filtered_params
from dj_brdf_tpu.lean.lrep import Lrep, lrep_to_params, params_to_lrep
from dj_brdf_tpu.microfacet.params import MicrofacetParams


def test_lrep_params_roundtrip():
    p = MicrofacetParams.pdfparams(0.4, 0.15, 0.3, 0.2, -0.1)
    back = lrep_to_params(params_to_lrep(p))
    for a, b in [(p.ax, back.ax), (p.ay, back.ay), (p.rho, back.rho),
                 (p.txn, back.txn), (p.tyn, back.tyn)]:
        np.testing.assert_allclose(float(a), float(b), rtol=1e-5, atol=1e-6)


@pytest.mark.skipif(not orc.available(), reason="no C++ oracle")
def test_lrep_to_params_matches_oracle():
    for e in [(0.1, -0.2, 0.3, 0.25, 0.02), (0.0, 0.0, 1.0, 1.0, 0.0),
              (0.5, 0.5, 0.3, 0.3, 0.25)]:  # last: clamps kick in
        golden = orc.run_floats("lrep_roundtrip", *e)[0]
        p = lrep_to_params(Lrep(*[jnp.float32(x) for x in e]))
        got = [float(p.ax), float(p.ay), float(p.rho), float(p.txn),
               float(p.tyn)]
        np.testing.assert_allclose(got, golden, rtol=1e-4, atol=1e-6)


def test_lrep_add_matches_independent_sum(rng):
    """E[x+y] moments for independent slope fields."""
    n = 200000
    x1 = rng.normal(0.1, 0.3, n)
    y1 = rng.normal(-0.2, 0.2, n)
    x2 = rng.normal(0.05, 0.25, n)
    y2 = rng.normal(0.15, 0.35, n)

    def emp(x, y):
        return Lrep(E1=jnp.float32(x.mean()), E2=jnp.float32(y.mean()),
                    E3=jnp.float32((x * x).mean()),
                    E4=jnp.float32((y * y).mean()),
                    E5=jnp.float32((x * y).mean()))

    combo = emp(x1, y1) + emp(x2, y2)
    direct = emp(x1 + x2, y1 + y2)
    for a, b in zip(jax.tree_util.tree_leaves(combo),
                    jax.tree_util.tree_leaves(direct)):
        np.testing.assert_allclose(float(a), float(b), atol=5e-3)


def test_dmap_nmap_lean_roundtrip():
    # a sinusoidal height field: check normals + lean stats
    h = w = 64
    y, x = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    dmap = 0.5 + 0.5 * jnp.sin(2 * jnp.pi * x / w) * jnp.sin(2 * jnp.pi * y / h)
    nmap = maps.dmap_to_nmap(dmap, scale=0.1)
    assert nmap.shape == (h, w, 3)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(nmap), axis=-1),
                               1.0, atol=1e-5)
    assert float(nmap[..., 2].min()) > 0.0

    lean = maps.nmap_to_lean(nmap, base_roughness=0.1)
    # per-texel variance = base roughness only
    var_x = np.asarray(lean.E3 - lean.E1 ** 2)
    np.testing.assert_allclose(var_x, 0.5 * 0.1 ** 2, atol=1e-5)
    # mean slope over the periodic field ~ 0
    assert abs(float(lean.E1.mean())) < 1e-4

    # biased storage roundtrips through unbias
    biased = maps.nmap_to_lean(nmap, base_roughness=0.1, bias=maps.LEAN_BIAS)
    un = maps.unbias(biased)
    np.testing.assert_allclose(np.asarray(un.E1), np.asarray(lean.E1),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(un.E5), np.asarray(lean.E5),
                               atol=1e-3)


def test_mip_filtering_grows_roughness():
    """The LEAN point: filtering a bumpy normal map must widen the
    effective NDF, which naive mip-mapping misses."""
    h = w = 64
    y, x = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    dmap = 0.5 + 0.5 * jnp.sin(8 * jnp.pi * x / w) * jnp.sin(8 * jnp.pi * y / h)
    nmap = maps.dmap_to_nmap(dmap, scale=0.5)
    lean = maps.nmap_to_lean(nmap, base_roughness=0.05)
    pyramid = maps.build_mip_pyramid(lean)
    coarsest = pyramid[-1]
    base = MicrofacetParams.isotropic(1e-3)

    p_filtered = filtered_params(coarsest, base, lean_filtering=True)
    p_naive = filtered_params(coarsest, base, lean_filtering=False)
    ax_f = float(p_filtered.ax[0, 0])
    ax_n = float(p_naive.ax[0, 0])
    # filtered roughness reflects the bump variance; naive collapses it
    assert ax_f > 5 * ax_n
    # filtered roughness approximates the slope std across the map
    slope_var = float(lean.E3.mean() - lean.E1.mean() ** 2)
    np.testing.assert_allclose(ax_f, np.sqrt(2 * slope_var), rtol=0.05)


def test_filtered_material_evalp_finite():
    mat = FilteredBeckmannMaterial(
        lean=Lrep(E1=jnp.float32(0.1), E2=jnp.float32(-0.05),
                  E3=jnp.float32(0.05), E4=jnp.float32(0.04),
                  E5=jnp.float32(0.0)),
        base_params=MicrofacetParams.isotropic(0.05),
        eta=jnp.asarray([0.2, 0.92, 1.1], jnp.float32),   # gold-ish
        k=jnp.asarray([3.9, 2.45, 2.14], jnp.float32))
    i = jnp.asarray([0.3, 0.2, 0.933], jnp.float32)
    o = jnp.asarray([0.0, 0.0, 1.0], jnp.float32)
    v = mat.evalp(i, o)
    assert v.shape == (3,)
    assert np.isfinite(np.asarray(v)).all() and float(v.max()) > 0
    # conductor fresnel should tint: R channel highest for gold eta/k
    vn = np.asarray(v) / np.asarray(v).max()
    assert vn[0] >= vn[2]
    # sample + pdf run
    idir = mat.sample(jnp.float32(0.3), jnp.float32(0.7), o)
    assert np.isfinite(np.asarray(idir)).all()
    assert float(mat.pdf(idir, o)) >= 0.0


def test_filtered_material_evalp_is_per_pixel():
    """FilteredBeckmannMaterial.evalp_is (fused SoA kernel, per-pixel
    LEAN params + conductor Fresnel) == layered mf.evalp_is with the
    conductor factor applied on top (dj_beckmannconductor.cpp:371-428)."""
    import jax
    from dj_brdf_tpu import fresnel as fm
    from dj_brdf_tpu.core.math import dot, normalize
    from dj_brdf_tpu.fresnel import conductor_fresnel
    from dj_brdf_tpu.lean.filtered import FilteredBeckmannMaterial
    from dj_brdf_tpu.microfacet import brdf as mf
    from dj_brdf_tpu.microfacet.ndf import Beckmann

    n = 8192
    key = jax.random.PRNGKey(2)
    k1, k2, k3 = jax.random.split(key, 3)
    u1 = jax.random.uniform(k1, (n,))
    u2 = jax.random.uniform(k2, (n,))
    e1 = jax.random.uniform(k3, (n,), minval=-0.3, maxval=0.3)
    lean = Lrep(E1=e1, E2=-e1 * 0.5, E3=e1 * e1 + 0.05,
                E4=e1 * e1 * 0.25 + 0.08, E5=-e1 * e1 * 0.5 + 0.01)
    mat = FilteredBeckmannMaterial(
        lean=lean, base_params=MicrofacetParams.isotropic(0.2),
        eta=jnp.asarray([0.2, 0.92, 1.1], jnp.float32),
        k=jnp.asarray([3.9, 2.45, 2.14], jnp.float32))
    o = jnp.broadcast_to(
        jnp.asarray([0.3, -0.2, jnp.sqrt(1 - 0.09 - 0.04)]), (n, 3))

    w, i, p = mat.evalp_is(u1, u2, o)
    params = mat.params()
    w2, i2, p2 = mf.evalp_is(Beckmann(), fm.Ideal(), params, u1, u2, o)
    h = normalize(i2 + o, eps=1e-24)
    f = conductor_fresnel(jnp.clip(dot(o, h), 0.0, 1.0), mat.eta, mat.k)
    w2 = w2 * f
    for got, want, atol in ((np.asarray(i), np.asarray(i2), 2e-5),
                            (np.asarray(w), np.asarray(w2), 1e-4),
                            (np.asarray(p), np.asarray(p2), 1e-4)):
        close = np.isclose(got, want, rtol=1e-3, atol=atol)
        assert close.mean() > 0.999, f"frac bad {1 - close.mean()}"
    assert float((np.asarray(p) > 0).mean()) > 0.9


@pytest.mark.skipif(not orc.available(), reason="no C++ oracle")
def test_lrep_to_params_fuzz_matches_oracle():
    """Randomized lrep->params sweep (reference dj_brdf.h:1976-1990
    incl. the alpha/rho clamps): 24 seeded moment sets spanning valid,
    near-degenerate, and clamp-triggering covariances."""
    rng = np.random.default_rng(20260821)
    for _ in range(24):
        e1 = float(rng.uniform(-0.6, 0.6))
        e2 = float(rng.uniform(-0.6, 0.6))
        vx = float(rng.uniform(1e-4, 0.6))
        vy = float(rng.uniform(1e-4, 0.6))
        # correlation in [-1.1, 1.1]: values beyond +-0.99 exercise the
        # reference's rho clamp; variances near 0 the alpha clamp
        c = float(rng.uniform(-1.1, 1.1)) * np.sqrt(vx * vy)
        e = (e1, e2, vx + e1 * e1, vy + e2 * e2, c + e1 * e2)
        golden = orc.run_floats("lrep_roundtrip", *[round(x, 6) for x in e])[0]
        p = lrep_to_params(Lrep(*[jnp.float32(round(x, 6)) for x in e]))
        got = [float(p.ax), float(p.ay), float(p.rho), float(p.txn),
               float(p.tyn)]
        np.testing.assert_allclose(got, golden, rtol=2e-4, atol=1e-5,
                                   err_msg=str(e))
