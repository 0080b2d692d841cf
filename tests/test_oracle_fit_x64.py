"""Float64 parity of the isotropic tabulation pipeline vs the C++
oracle compiled with DJB_USE_DOUBLE_PRECISION (dj_brdf.h:44-48).

With jax_enable_x64 the pipeline's quadratures run in float64
(config.default_float()), closing the f32 5e-3 tolerances of
test_oracle_fit.py to ~1e-8 on tables and ~1e-5 on fitted alphas —
the "bit-matching fits" target of BASELINE.md.
"""

import jax
import numpy as np
import pytest

import tests.oracle as orc
from dj_brdf_tpu import fresnel
from dj_brdf_tpu.fit import moments, tabular
from dj_brdf_tpu.microfacet.ndf import GGX, Beckmann
from dj_brdf_tpu.microfacet.params import MicrofacetParams

pytestmark = pytest.mark.skipif(not orc.available(), reason="no C++ oracle")


@pytest.fixture(scope="module")
def x64():
    """Enable float64 for this module only; drop dtype-keyed caches on
    the way out so the rest of the suite stays f32."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)
    jax.clear_caches()


@pytest.fixture(scope="module", params=["ggx", "beckmann"])
def case(request, x64):
    name = request.param
    alpha, res = 0.5, 90
    golden = orc.run_sections("tabular", name, alpha, res, x64=True)
    dist = {"ggx": GGX(), "beckmann": Beckmann()}[name]
    eval_fn = tabular.microfacet_eval_fn(
        dist, fresnel.Ideal(), MicrofacetParams.isotropic(alpha))
    ours_dist, ours_fres = tabular.build_tabular(eval_fn, res)
    assert ours_dist.p22.dtype == np.float64
    return golden, ours_dist, ours_fres


def test_tables_f64(case):
    golden, dist, _ = case
    for key, arr in [("p22", dist.p22), ("sigma", dist.sigma),
                     ("cdf", dist.cdf), ("qf", dist.qf)]:
        np.testing.assert_allclose(np.asarray(arr), golden[key],
                                   rtol=1e-8, atol=1e-12, err_msg=key)


def test_fresnel_f64(case):
    # one GGX spline point sits at the fr2 > 1e-4 activity threshold
    # (dj_brdf.h:2616), where a last-ulp difference flips a term of the
    # ratio average — hence the looser 1e-4 here
    golden, _, fres = case
    np.testing.assert_allclose(np.asarray(fres.points), golden["fresnel"],
                               rtol=1e-4, atol=1e-8)


def test_fitted_alphas_f64(case):
    golden, dist, _ = case
    ab = float(moments.fit_beckmann_parameters(dist).ax)
    ag = float(moments.fit_ggx_parameters(dist).ax)
    np.testing.assert_allclose(ab, golden["fit_beckmann"], rtol=1e-5)
    np.testing.assert_allclose(ag, golden["fit_ggx"], rtol=1e-5)


def test_aniso_tables_f64(x64):
    """Anisotropic pipeline f64 parity at a small resolution
    (dj_brdf.h:2238-2273 with DJB_USE_DOUBLE_PRECISION)."""
    golden = orc.run_sections("tabular_aniso", "ggx", 0.35, 0.2, 0.5,
                              16, 16, x64=True)
    eval_fn = tabular.microfacet_eval_fn(
        GGX(), fresnel.Ideal(), MicrofacetParams.elliptic(0.35, 0.2, 0.5))
    from dj_brdf_tpu.fit import tabular_aniso
    dist, _ = tabular_aniso.build_tabular_anisotropic(eval_fn, 16, 16)
    assert dist.p22.dtype == np.float64
    np.testing.assert_allclose(
        np.asarray(dist.p22).reshape(-1), golden["p22"], rtol=1e-8,
        atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(dist.sigma).reshape(-1), golden["sigma"], rtol=1e-8,
        atol=1e-12)
