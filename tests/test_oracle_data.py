"""Measured-data parity: synthetic MERL/UTIA binaries evaluated through
dj_brdf_tpu must match the C++ reference loading the same files,
including the full tabular-fit-from-MERL pipeline."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

import tests.oracle as orc
from dj_brdf_tpu import fresnel
from dj_brdf_tpu.fit import moments, tabular
from dj_brdf_tpu.io import synth
from dj_brdf_tpu.io.merl_io import load_merl, save_merl
from dj_brdf_tpu.io.utia_io import load_utia, save_utia
from dj_brdf_tpu.microfacet import brdf as mf
from dj_brdf_tpu.microfacet.ndf import GGX
from dj_brdf_tpu.microfacet.params import MicrofacetParams
from dj_brdf_tpu.models.lambert import Lambert
from dj_brdf_tpu.models.merl import Merl
from dj_brdf_tpu.models.utia import Utia

pytestmark = pytest.mark.skipif(not orc.available(), reason="no C++ oracle")


def _analytic_eval(i, o):
    """GGX + diffuse test material."""
    spec = mf.eval(GGX(), fresnel.Schlick(f0=jnp.asarray([0.9, 0.6, 0.3], jnp.float32)),
                   MicrofacetParams.isotropic(0.3), i, o)
    diff = Lambert(reflectance=jnp.asarray([0.2, 0.1, 0.05], jnp.float32)).eval(i, o)
    return spec + diff


@pytest.fixture(scope="module")
def merl_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("merl") / "synthetic.binary")
    save_merl(path, synth.bake_merl(_analytic_eval))
    return path


@pytest.fixture(scope="module")
def utia_file(tmp_path_factory):
    path = str(tmp_path_factory.mktemp("utia") / "synthetic.bin")
    save_utia(path, synth.bake_utia(_analytic_eval))
    return path


def test_merl_eval_matches_oracle(merl_file):
    golden = orc.run_floats("eval_merl", merl_file)
    table = jnp.asarray(load_merl(merl_file))
    m = Merl(table=table)
    i, o = orc.evalp_grid_pairs()
    got = np.asarray(m.evalp(jnp.asarray(i), jnp.asarray(o)))
    np.testing.assert_allclose(got, golden, rtol=2e-4, atol=1e-6)


def test_merl_roundtrip_close_to_analytic(merl_file):
    # nearest-neighbour binning error only
    table = jnp.asarray(load_merl(merl_file))
    m = Merl(table=table)
    i, o = orc.evalp_grid_pairs()
    got = np.asarray(m.eval(jnp.asarray(i), jnp.asarray(o)))
    want = np.asarray(_analytic_eval(jnp.asarray(i), jnp.asarray(o)))
    valid = (got > 0).all(axis=-1)
    assert valid.mean() > 0.8
    err = np.abs(got[valid] - want[valid]) / (want[valid] + 0.05)
    assert np.median(err) < 0.1


def test_utia_eval_matches_oracle(utia_file):
    golden = orc.run_floats("eval_utia", utia_file)
    u = Utia(table=jnp.asarray(load_utia(utia_file)))
    i, o = orc.evalp_grid_pairs()
    got = np.asarray(u.evalp(jnp.asarray(i), jnp.asarray(o)))
    np.testing.assert_allclose(got, golden, rtol=5e-4, atol=1e-5)


def test_tabular_merl_fit_matches_oracle(merl_file):
    golden = orc.run_sections("tabular_merl", merl_file, 90)
    m = Merl(table=jnp.asarray(load_merl(merl_file)))
    dist, fres = tabular.build_tabular(m.eval, 90)
    np.testing.assert_allclose(np.asarray(dist.p22), golden["p22"],
                               rtol=5e-3, atol=1e-6)
    np.testing.assert_allclose(np.asarray(dist.sigma), golden["sigma"],
                               rtol=5e-3, atol=1e-5)
    ab = float(moments.fit_beckmann_parameters(dist).ax)
    ag = float(moments.fit_ggx_parameters(dist).ax)
    np.testing.assert_allclose(ab, golden["fit_beckmann"], rtol=2e-3)
    np.testing.assert_allclose(ag, golden["fit_ggx"], rtol=2e-3)
    np.testing.assert_allclose(np.asarray(fres.points), golden["fresnel"],
                               rtol=5e-3, atol=5e-3)


def test_sgd_abc_match_oracle():
    from dj_brdf_tpu.models.sgd import SGD
    from dj_brdf_tpu.models.abc_model import ABC
    i, o = orc.evalp_grid_pairs()
    for name in ["alum-bronze", "gold-metallic-paint", "green-latex"]:
        golden = orc.run_floats("eval_sgd", name)
        got = np.asarray(SGD.from_name(name).evalp(jnp.asarray(i), jnp.asarray(o)))
        np.testing.assert_allclose(got, golden, rtol=2e-3, atol=1e-5,
                                   err_msg=f"sgd {name}")
    for name in ["alum-bronze", "chrome", "teflon"]:
        golden = orc.run_floats("eval_abc", name)
        got = np.asarray(ABC.from_name(name).evalp(jnp.asarray(i), jnp.asarray(o)))
        # chrome's C~457 exponent amplifies the last ulp of h.z at
        # retro-reflection by ~C*B*ulp; 1e-2 relative is the f32 floor
        np.testing.assert_allclose(got, golden, rtol=1e-2, atol=1e-5,
                                   err_msg=f"abc {name}")


def test_debug_log_parity_merl_below_horizon_and_utia_clamp(
        tmp_path, caplog):
    """DJB_LOG parity (dj_brdf.h:1016-1021, 1166-1169): with DEBUG
    logging enabled, a MERL eval that hits negative (below-horizon)
    table entries logs a count, and loading a UTIA file containing
    negative samples logs the clamped count — silent otherwise."""
    import logging

    import jax

    from dj_brdf_tpu.core.math import from_spherical

    # MERL: a table with every entry negative -> every lookup warns
    table = -np.ones((3, 90, 90, 180), np.float32)
    i = from_spherical(jnp.asarray([0.3, 0.5]), jnp.asarray([0.1, 0.2]))
    m = Merl(table=jnp.asarray(table))
    with caplog.at_level(logging.DEBUG, logger="dj_brdf_tpu"):
        jax.clear_caches()  # debug gating is trace-time
        out = np.asarray(m.eval(i, o=i))
        jax.effects_barrier()
    assert (out == 0.0).all()
    assert any("below-horizon" in r.message for r in caplog.records)

    # UTIA: negative raw samples -> load-time clamp count
    caplog.clear()
    raw = np.full((3, 6, 48, 6, 48), -2.0)
    path = str(tmp_path / "neg.bin")
    save_utia(path, raw)
    with caplog.at_level(logging.DEBUG, logger="dj_brdf_tpu"):
        data = load_utia(path)
    assert (data == 0.0).all()
    assert any("clamped" in r.message for r in caplog.records)

    # and silence at the default level (the NVERBOSE analogue)
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="dj_brdf_tpu"):
        jax.clear_caches()
        np.asarray(m.eval(i, o=i))
        jax.effects_barrier()
        load_utia(path)
    assert not caplog.records
    jax.clear_caches()
