"""Float64 parity of the anisotropic tabulation pipeline vs the C++
oracle compiled with DJB_USE_DOUBLE_PRECISION (dj_brdf.h:44-48) — the
aniso counterpart of test_oracle_fit_x64.py, closing the f32 1e-2
tolerances of test_oracle_aniso.py to ~1e-6: full tables, sampling-
table queries, and the 5-moment anisotropic fits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tests.oracle as orc
from dj_brdf_tpu import fresnel
from dj_brdf_tpu.fit import moments, tabular, tabular_aniso
from dj_brdf_tpu.microfacet.ndf import GGX, Beckmann
from dj_brdf_tpu.microfacet.params import MicrofacetParams

pytestmark = pytest.mark.skipif(not orc.available(), reason="no C++ oracle")

ELEV, AZIM = 16, 16


@pytest.fixture(scope="module")
def x64():
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)
    jax.clear_caches()


@pytest.fixture(scope="module", params=["beckmann", "ggx"])
def case(request, x64):
    name = request.param
    a1, a2, phi_a = 0.5, 0.25, 0.6
    golden = orc.run_sections("tabular_aniso", name, a1, a2, phi_a,
                              ELEV, AZIM, x64=True)
    dist_in = {"ggx": GGX(), "beckmann": Beckmann()}[name]
    eval_fn = tabular.microfacet_eval_fn(
        dist_in, fresnel.Ideal(), MicrofacetParams.elliptic(a1, a2, phi_a))
    ours, fres = tabular_aniso.build_tabular_anisotropic(eval_fn, ELEV, AZIM)
    assert ours.p22.dtype == np.float64
    return golden, ours, fres


def test_p22_table_x64(case):
    golden, ours, _ = case
    np.testing.assert_allclose(np.asarray(ours.p22).reshape(-1),
                               golden["p22"], rtol=1e-8, atol=1e-12)


def test_sigma_table_x64(case):
    golden, ours, _ = case
    np.testing.assert_allclose(np.asarray(ours.sigma).reshape(-1),
                               golden["sigma"], rtol=1e-8, atol=1e-12)


def test_sampling_table_queries_x64(case):
    golden, ours, _ = case
    q = golden["queries"]  # columns: pdf1 cdf1 qf1 pdf2 cdf2 qf2
    NQ = 32
    a = (np.arange(NQ) + 0.5) / NQ
    b = (np.arange(NQ) + 0.5) / NQ
    U, V = np.meshgrid(a, b, indexing="ij")
    u = jnp.asarray(U.ravel(), jnp.float64)
    v = jnp.asarray(V.ravel(), jnp.float64)
    phi = u * 2 * jnp.pi
    theta = v * 0.5 * jnp.pi * 0.98
    np.testing.assert_allclose(np.asarray(ours.pdf1_eval(phi)), q[:, 0],
                               rtol=1e-6, atol=1e-10)
    np.testing.assert_allclose(np.asarray(ours.cdf1_eval(phi)), q[:, 1],
                               rtol=1e-6, atol=1e-9)
    # qf tables come from an 8x-oversampled inverse-CDF *scan*
    # (dj_brdf.h:3005-3042): the result is quantized to the scan grid,
    # so agreement is bounded by one scan cell, not float precision
    np.testing.assert_allclose(np.asarray(ours.qf1_eval(u)), q[:, 2],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ours.pdf2_eval(theta, phi)), q[:, 3],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours.cdf2_eval(theta, phi)), q[:, 4],
                               rtol=1e-6, atol=1e-9)
    np.testing.assert_allclose(np.asarray(ours.qf2_eval(v, phi)), q[:, 5],
                               rtol=1e-6, atol=1e-6)


def test_aniso_fits_x64(case):
    golden, ours, _ = case
    pb = moments.fit_beckmann_parameters_anisotropic(ours)
    got_b = [float(pb.ax), float(pb.ay), float(pb.rho),
             float(pb.txn), float(pb.tyn)]
    np.testing.assert_allclose(got_b, golden["fit_beckmann"], rtol=1e-6,
                               atol=1e-9)
    pg = moments.fit_ggx_parameters_anisotropic(ours)
    got_g = [float(pg.ax), float(pg.ay), float(pg.rho),
             float(pg.txn), float(pg.tyn)]
    np.testing.assert_allclose(got_g, golden["fit_ggx"], rtol=1e-6, atol=1e-9)
