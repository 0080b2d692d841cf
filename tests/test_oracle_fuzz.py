"""Randomized oracle parity sweep: seeded random microfacet parameter
sets across the full elliptic + mean-normal-offset space, checked
against the compiled C++ reference for both evalp and the VNDF
sampler (dj_brdf.h:1529-1547, 1669-1765). Complements the fixed CASES
of test_oracle_microfacet.py with broad-coverage fuzzing.
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


def _random_cases(n_per_dist: int = 8, seed: int = 20260821):
    rng = np.random.default_rng(seed)
    cases = []
    for name in ("ggx", "beckmann"):
        for _ in range(n_per_dist):
            a1 = float(rng.uniform(0.05, 1.2))
            a2 = float(rng.uniform(0.05, 1.2))
            phi_a = float(rng.uniform(0.0, np.pi))
            txn = float(rng.uniform(-0.5, 0.5))
            tyn = float(rng.uniform(-0.5, 0.5))
            cases.append((name, round(a1, 4), round(a2, 4), round(phi_a, 4),
                          round(txn, 4), round(tyn, 4)))
    return cases


CASES = _random_cases()


@pytest.mark.parametrize("case", CASES,
                         ids=[f"{c[0]}-{k}" for k, c in enumerate(CASES)])
def test_fuzz_evalp_matches_oracle(case):
    name, a1, a2, phi_a, txn, tyn = case
    golden = orc.run_floats("evalp", name, a1, a2, phi_a, txn, tyn)
    i, o = orc.evalp_grid_pairs()
    params = MicrofacetParams.elliptic(a1, a2, phi_a, txn=txn, tyn=tyn)
    got = np.asarray(mf.evalp(DIST[name], fresnel.Ideal(), params,
                              jnp.asarray(i), jnp.asarray(o)))
    np.testing.assert_allclose(got, golden, rtol=5e-4, atol=2e-5)


@pytest.mark.parametrize("case", CASES,
                         ids=[f"{c[0]}-{k}" for k, c in enumerate(CASES)])
def test_fuzz_sample_matches_oracle(case):
    name, a1, a2, phi_a, txn, tyn = case
    golden = orc.run_floats("sample", name, a1, a2, phi_a, txn, tyn)
    u1, u2, o = orc.sample_grid()
    params = MicrofacetParams.elliptic(a1, a2, phi_a, txn=txn, tyn=tyn)
    i = np.asarray(mf.sample(DIST[name], params, jnp.asarray(u1),
                             jnp.asarray(u2), jnp.asarray(o)))
    pdf = np.asarray(mf.pdf(DIST[name], params, jnp.asarray(i),
                            jnp.asarray(o)))
    # sampled directions: the Beckmann solver may stop at a different
    # iterate for a handful of boundary lanes; distribution-level
    i_close = np.isclose(i, golden[:, :3], rtol=2e-3, atol=5e-4)
    assert i_close.mean() > 0.995, 1 - i_close.mean()
    p_close = np.isclose(pdf, golden[:, 3], rtol=5e-3, atol=5e-4)
    assert p_close.mean() > 0.995, 1 - p_close.mean()
