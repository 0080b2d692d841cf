"""Core math / special-function / spline tests."""

import jax
import jax.numpy as jnp
import numpy as np
import scipy.special as sps

from dj_brdf_tpu.core import math as vm
from dj_brdf_tpu.core import special, spline


def random_dirs(rng, n, hemisphere=True):
    v = rng.normal(size=(n, 3))
    v /= np.linalg.norm(v, axis=-1, keepdims=True)
    if hemisphere:
        v[:, 2] = np.abs(v[:, 2])
        v[v[:, 2] < 1e-3, 2] = 1e-3
        v /= np.linalg.norm(v, axis=-1, keepdims=True)
    return jnp.asarray(v, jnp.float32)


def test_spherical_roundtrip(rng):
    d = random_dirs(rng, 256, hemisphere=False)
    theta, phi = vm.to_spherical(d)
    d2 = vm.from_spherical(theta, phi)
    np.testing.assert_allclose(d, d2, atol=1e-5)


def test_io_hd_roundtrip(rng):
    i = random_dirs(rng, 128)
    o = random_dirs(rng, 128)
    h, d = vm.io_to_hd(i, o)
    i2, o2 = vm.hd_to_io(h, d)
    np.testing.assert_allclose(i, i2, atol=2e-5)
    np.testing.assert_allclose(o, o2, atol=2e-5)
    # h is the half vector
    np.testing.assert_allclose(h, vm.normalize(i + o), atol=1e-5)


def test_rotate_vector_matches_rodrigues(rng):
    x = random_dirs(rng, 64, hemisphere=False)
    axis = jnp.asarray([0.0, 0.0, 1.0])
    axis = jnp.broadcast_to(axis, x.shape)
    ang = jnp.asarray(rng.uniform(-np.pi, np.pi, size=64), jnp.float32)
    got = vm.rotate_vector(x, axis, ang)
    # rotation about z in closed form
    c, s = jnp.cos(ang), jnp.sin(ang)
    want = jnp.stack([c * x[:, 0] - s * x[:, 1],
                      s * x[:, 0] + c * x[:, 1],
                      x[:, 2]], axis=-1)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_concentric_map_is_measure_preserving(rng):
    u = rng.uniform(size=(20000, 2)).astype(np.float32)
    x, y = vm.uniform_to_concentric(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    r2 = np.asarray(x) ** 2 + np.asarray(y) ** 2
    assert r2.max() <= 1.0 + 1e-6
    # uniform on the disk -> r^2 uniform on [0,1]
    hist, _ = np.histogram(r2, bins=10, range=(0, 1))
    assert hist.min() > 0.8 * len(r2) / 10


def test_cosine_hemisphere_mean(rng):
    u = rng.uniform(size=(200000, 2)).astype(np.float32)
    d = vm.cosine_hemisphere_sample(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    # E[z] for cosine-weighted hemisphere = 2/3
    assert abs(float(jnp.mean(d[:, 2])) - 2.0 / 3.0) < 5e-3


def test_erf_matches_scipy():
    x = jnp.linspace(-4.0, 4.0, 1001)
    np.testing.assert_allclose(special.erf(x), sps.erf(np.asarray(x)), atol=3e-6)


def test_erfinv_matches_scipy():
    u = jnp.linspace(-0.999, 0.999, 999)
    np.testing.assert_allclose(special.erfinv(u), sps.erfinv(np.asarray(u)),
                               atol=5e-5, rtol=1e-3)


def test_erf_erfinv_roundtrip():
    x = jnp.linspace(-2.5, 2.5, 101)
    np.testing.assert_allclose(special.erfinv(special.erf(x)), x, atol=2e-3)


def test_spline_eval1d_edge():
    pts = jnp.asarray([0.0, 1.0, 4.0, 9.0])
    # u=0 -> 0, u=1 -> 9, u=0.5 -> midpoint between idx 1 and 2
    np.testing.assert_allclose(spline.eval1d(pts, jnp.asarray(0.0)), 0.0)
    np.testing.assert_allclose(spline.eval1d(pts, jnp.asarray(1.0)), 9.0)
    np.testing.assert_allclose(spline.eval1d(pts, jnp.asarray(0.5)), 2.5)
    # clamped beyond edges
    np.testing.assert_allclose(spline.eval1d(pts, jnp.asarray(1.5)), 9.0)


def test_spline_eval1d_repeat():
    pts = jnp.asarray([0.0, 1.0, 2.0])
    # wraps: u=1 maps to index 2 exactly
    np.testing.assert_allclose(spline.eval1d(pts, jnp.asarray(1.0), wrap="repeat"), 2.0)


def test_spline_eval2d_bilinear():
    pts = jnp.asarray([[0.0, 1.0], [2.0, 3.0]])  # (H=2, W=2)
    np.testing.assert_allclose(spline.eval2d(pts, 0.0, 0.0), 0.0)
    np.testing.assert_allclose(spline.eval2d(pts, 1.0, 0.0), 1.0)
    np.testing.assert_allclose(spline.eval2d(pts, 0.0, 1.0), 2.0)
    np.testing.assert_allclose(spline.eval2d(pts, 0.5, 0.5), 1.5)


def test_grad_through_normalize():
    f = lambda v: vm.normalize(v)[..., 2]
    g = jax.grad(f)(jnp.asarray([0.3, 0.4, 0.8]))
    assert np.all(np.isfinite(np.asarray(g)))
