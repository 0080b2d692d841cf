"""Parity of the isotropic tabulation + fitting pipeline vs the C++
oracle: p22/sigma/cdf/qf tables, fitted alphas, tabulated Fresnel."""

import jax.numpy as jnp
import numpy as np
import pytest

import tests.oracle as orc
from dj_brdf_tpu import fresnel
from dj_brdf_tpu.fit import moments, tabular
from dj_brdf_tpu.microfacet.ndf import GGX, Beckmann
from dj_brdf_tpu.microfacet.params import MicrofacetParams

pytestmark = pytest.mark.skipif(not orc.available(), reason="no C++ oracle")


@pytest.fixture(scope="module", params=["ggx", "beckmann"])
def case(request):
    name = request.param
    alpha, res = 0.5, 90
    golden = orc.run_sections("tabular", name, alpha, res)
    dist = {"ggx": GGX(), "beckmann": Beckmann()}[name]
    eval_fn = tabular.microfacet_eval_fn(
        dist, fresnel.Ideal(), MicrofacetParams.isotropic(alpha))
    ours_dist, ours_fres = tabular.build_tabular(eval_fn, res)
    return golden, ours_dist, ours_fres


def test_p22_table(case):
    golden, dist, _ = case
    np.testing.assert_allclose(np.asarray(dist.p22), golden["p22"],
                               rtol=5e-3, atol=1e-6)


def test_sigma_table(case):
    golden, dist, _ = case
    np.testing.assert_allclose(np.asarray(dist.sigma), golden["sigma"],
                               rtol=5e-3, atol=1e-5)


def test_cdf_table(case):
    golden, dist, _ = case
    np.testing.assert_allclose(np.asarray(dist.cdf), golden["cdf"],
                               rtol=5e-3, atol=2e-4)


def test_qf_table(case):
    golden, dist, _ = case
    np.testing.assert_allclose(np.asarray(dist.qf), golden["qf"],
                               rtol=5e-3, atol=2e-3)


def test_fresnel_points(case):
    golden, _, fres = case
    np.testing.assert_allclose(np.asarray(fres.points), golden["fresnel"],
                               rtol=5e-3, atol=5e-3)


def test_fitted_alphas(case):
    golden, dist, _ = case
    ab = float(moments.fit_beckmann_parameters(dist).ax)
    ag = float(moments.fit_ggx_parameters(dist).ax)
    np.testing.assert_allclose(ab, golden["fit_beckmann"], rtol=2e-3)
    np.testing.assert_allclose(ag, golden["fit_ggx"], rtol=2e-3)


def test_ggx_self_fit_recovers_alpha():
    """Fitting a GGX through the full pipeline approximately recovers
    its roughness (the pipeline's known bias stays small)."""
    for alpha in [0.1, 0.3]:
        eval_fn = tabular.microfacet_eval_fn(
            GGX(), fresnel.Ideal(), MicrofacetParams.isotropic(alpha))
        dist, _ = tabular.build_tabular(eval_fn, 90)
        fitted = float(moments.fit_ggx_parameters(dist).ax)
        assert abs(fitted - alpha) / alpha < 0.2, (alpha, fitted)
