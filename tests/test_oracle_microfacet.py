"""Parity tests against the compiled C++ reference (dj_brdf.h).

The harness dumps golden evalp/sample/qf2 values over deterministic
grids; we evaluate the same grids through dj_brdf_tpu and require
float32-level agreement.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import tests.oracle as orc
from dj_brdf_tpu import fresnel
from dj_brdf_tpu.microfacet import brdf as mf
from dj_brdf_tpu.microfacet.ndf import GGX, Beckmann
from dj_brdf_tpu.microfacet.params import MicrofacetParams

pytestmark = pytest.mark.skipif(not orc.available(), reason="no C++ oracle")

DIST = {"ggx": GGX(), "beckmann": Beckmann()}

CASES = [
    # (dist, a1, a2, phi_a, txn, tyn)
    ("ggx", 0.5, 0.5, 0.0, 0.0, 0.0),
    ("ggx", 0.5, 0.2, 0.3, 0.0, 0.0),
    ("ggx", 0.8, 0.1, 1.2, 0.15, -0.1),
    ("beckmann", 0.5, 0.5, 0.0, 0.0, 0.0),
    ("beckmann", 0.6, 0.25, 0.9, 0.0, 0.0),
    ("beckmann", 0.3, 0.3, 0.0, -0.2, 0.1),
]


@pytest.mark.parametrize("case", CASES, ids=[f"{c[0]}-{k}" for k, c in enumerate(CASES)])
def test_evalp_matches_oracle(case):
    name, a1, a2, phi_a, txn, tyn = case
    golden = orc.run_floats("evalp", name, a1, a2, phi_a, txn, tyn)
    i, o = orc.evalp_grid_pairs()
    params = MicrofacetParams.elliptic(a1, a2, phi_a, txn=txn, tyn=tyn)
    got = np.asarray(mf.evalp(DIST[name], fresnel.Ideal(), params,
                              jnp.asarray(i), jnp.asarray(o)))
    np.testing.assert_allclose(got, golden, rtol=2e-4, atol=1e-5)


def test_evalp_schlick_matches_oracle():
    golden = orc.run_floats("evalp", "ggx", 0.4, 0.15, 0.5, 0.0, 0.0,
                            0.95, 0.64, 0.54)
    i, o = orc.evalp_grid_pairs()
    params = MicrofacetParams.elliptic(0.4, 0.15, 0.5)
    fres = fresnel.Schlick(f0=jnp.asarray([0.95, 0.64, 0.54], jnp.float32))
    got = np.asarray(mf.evalp(GGX(), fres, params,
                              jnp.asarray(i), jnp.asarray(o)))
    np.testing.assert_allclose(got, golden, rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("case", CASES, ids=[f"{c[0]}-{k}" for k, c in enumerate(CASES)])
def test_sample_matches_oracle(case):
    name, a1, a2, phi_a, txn, tyn = case
    golden = orc.run_floats("sample", name, a1, a2, phi_a, txn, tyn)
    u1, u2, o = orc.sample_grid()
    params = MicrofacetParams.elliptic(a1, a2, phi_a, txn=txn, tyn=tyn)
    i = np.asarray(mf.sample(DIST[name], params, jnp.asarray(u1),
                             jnp.asarray(u2), jnp.asarray(o)))
    pdf = np.asarray(mf.pdf(DIST[name], params, jnp.asarray(i),
                            jnp.asarray(o)))
    np.testing.assert_allclose(i, golden[:, :3], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(pdf, golden[:, 3], rtol=2e-3, atol=1e-4)


@pytest.mark.parametrize("name", ["ggx", "beckmann"])
def test_qf2_qf3_match_oracle(name):
    golden = orc.run_floats("qf2", name)
    nu, nt = 16, 8
    u = ((np.arange(nu) + 0.5) / nu).astype(np.float32)
    theta = ((np.arange(nt) + 0.5) / nt * (np.pi / 2) * 0.98).astype(np.float32)
    U = np.repeat(u, nt)
    T = np.tile(theta, nu)
    dist = DIST[name]
    q2 = np.asarray(dist.qf2_radial(jnp.asarray(U), jnp.cos(jnp.asarray(T)),
                                    jnp.sin(jnp.asarray(T))))
    q3 = np.asarray(dist.qf3_radial(jnp.asarray(U), jnp.asarray(q2)))
    np.testing.assert_allclose(q2, golden[:, 0], rtol=1e-3, atol=2e-4)
    np.testing.assert_allclose(q3, golden[:, 1], rtol=1e-3, atol=2e-4)
