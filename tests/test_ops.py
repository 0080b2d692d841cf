"""SoA fast path and fused Pallas kernel: equivalence with the general
microfacet path and with XLA autodiff (kernel runs in interpret mode
on CPU; the real TPU path is exercised by bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from dj_brdf_tpu import fresnel
from dj_brdf_tpu.core.math import from_spherical
from dj_brdf_tpu.microfacet import brdf as mf
from dj_brdf_tpu.microfacet.ndf import GGX
from dj_brdf_tpu.microfacet.params import MicrofacetParams
from dj_brdf_tpu.ops import soa
from dj_brdf_tpu.ops.fused_fit import (ggx_lsq_value_and_grad, pad_to_block)


def make_batch(rng, n):
    i = from_spherical(jnp.asarray(rng.uniform(0.02, 1.55, n), jnp.float32),
                       jnp.asarray(rng.uniform(0, 6.28, n), jnp.float32))
    o = from_spherical(jnp.asarray(rng.uniform(0.02, 1.55, n), jnp.float32),
                       jnp.asarray(rng.uniform(0, 6.28, n), jnp.float32))
    return i, o


def test_soa_matches_general_path(rng):
    i, o = make_batch(rng, 4096)
    pvec = jnp.asarray([0.45, 0.2, 0.3, 0.1, -0.05, 0.9, 0.6, 0.3],
                       jnp.float32)
    params = MicrofacetParams.pdfparams(*[pvec[k] for k in range(5)])
    fres = fresnel.Schlick(f0=pvec[5:8])
    want = np.asarray(mf.evalp(GGX(), fres, params, i, o))
    r, g, b = soa.ggx_evalp_soa(pvec, *soa.split_dirs(i, o))
    got = np.stack([np.asarray(r), np.asarray(g), np.asarray(b)], axis=-1)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-5)


def test_fused_kernel_matches_autodiff(rng):
    n = 128 * 256 * 2
    i, o = make_batch(rng, n)
    comp = soa.split_dirs(i, o)
    pvec_true = jnp.asarray([0.25, 0.25, 0.0, 0.0, 0.0, 0.9, 0.6, 0.3],
                            jnp.float32)
    tr, tg, tb = soa.ggx_evalp_soa(pvec_true, *comp)

    pvec = jnp.asarray([0.4, 0.3, 0.1, 0.02, -0.03, 0.5, 0.5, 0.5],
                       jnp.float32)
    want_val, want_grad = jax.value_and_grad(soa.ggx_lsq_loss_soa)(
        pvec, *comp, tr, tg, tb)
    got_val, got_grad = ggx_lsq_value_and_grad(
        pvec, *comp, tr, tg, tb, interpret=True)
    np.testing.assert_allclose(float(got_val), float(want_val), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(want_grad),
                               rtol=1e-4, atol=1e-6)


def test_fused_kernel_padding(rng):
    n = 1000  # not a multiple of 128*256
    i, o = make_batch(rng, n)
    comp = soa.split_dirs(i, o)
    pvec_true = jnp.asarray([0.3, 0.3, 0.0, 0.0, 0.0, 0.8, 0.8, 0.8],
                            jnp.float32)
    tr, tg, tb = soa.ggx_evalp_soa(pvec_true, *comp)
    pvec = jnp.asarray([0.5, 0.4, 0.0, 0.0, 0.0, 0.5, 0.5, 0.5], jnp.float32)

    arrays, targets, n_valid = pad_to_block(comp, (tr, tg, tb), 256)
    got_val, got_grad = ggx_lsq_value_and_grad(
        pvec, *arrays, *targets, interpret=True, n_valid=n_valid)
    want_val, want_grad = jax.value_and_grad(soa.ggx_lsq_loss_soa)(
        pvec, *comp, tr, tg, tb)
    np.testing.assert_allclose(float(got_val), float(want_val), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_grad), np.asarray(want_grad),
                               rtol=1e-4, atol=1e-6)
