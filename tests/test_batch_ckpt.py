"""Batch material fitting, checkpointing, profiling utilities."""

import jax
import jax.numpy as jnp
import numpy as np

from dj_brdf_tpu import fresnel
from dj_brdf_tpu.fit import batch, lsq
from dj_brdf_tpu.microfacet import brdf as mf
from dj_brdf_tpu.microfacet.ndf import GGX
from dj_brdf_tpu.microfacet.params import MicrofacetParams
from dj_brdf_tpu.parallel.mesh import make_mesh


def _targets_for(alphas, f0s, i, o):
    def one(a, f0):
        return mf.evalp(GGX(), fresnel.Schlick(f0=f0),
                        MicrofacetParams.isotropic(a), i, o)
    return jax.vmap(one)(alphas, f0s)


def test_batch_fit_recovers_materials():
    i, o = batch.sample_direction_set(jax.random.PRNGKey(0), 2048)
    alphas = jnp.asarray([0.15, 0.35, 0.6], jnp.float32)
    f0s = jnp.asarray([[0.9, 0.6, 0.3], [0.5, 0.5, 0.5], [0.2, 0.4, 0.8]],
                      jnp.float32)
    targets = _targets_for(alphas, f0s, i, o)
    params, fres, losses = batch.fit_materials(targets, i, o, steps=300)
    np.testing.assert_allclose(np.asarray(params.ax), np.asarray(alphas),
                               rtol=0.08)
    np.testing.assert_allclose(np.asarray(fres.f0), np.asarray(f0s), atol=0.08)
    assert float(losses.max()) < 5e-3


def test_batch_fit_sharded_matches_unsharded():
    i, o = batch.sample_direction_set(jax.random.PRNGKey(1), 1024)
    alphas = jnp.linspace(0.1, 0.7, 8)
    f0s = jnp.broadcast_to(jnp.asarray([0.8, 0.6, 0.4]), (8, 3))
    targets = _targets_for(alphas, f0s, i, o)
    p1, _, l1 = batch.fit_materials(targets, i, o, steps=50)
    mesh = make_mesh(8)
    p2, _, l2 = batch.fit_materials(targets, i, o, steps=50, mesh=mesh)
    np.testing.assert_allclose(np.asarray(p1.ax), np.asarray(p2.ax),
                               rtol=1e-4)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-3,
                               atol=1e-6)


def test_checkpoint_roundtrip(tmp_path):
    from dj_brdf_tpu.utils import checkpoint
    params = MicrofacetParams.elliptic(0.4, 0.2, 0.7)
    fres = fresnel.SplineFresnel(points=jnp.linspace(0, 1, 30).reshape(10, 3))
    path = str(tmp_path / "ckpt")
    checkpoint.save_checkpoint(path, {"params": params, "fresnel": fres})
    restored = checkpoint.load_checkpoint(
        path, like={"params": params, "fresnel": fres})
    np.testing.assert_allclose(np.asarray(restored["params"].ax),
                               np.asarray(params.ax))
    np.testing.assert_allclose(np.asarray(restored["fresnel"].points),
                               np.asarray(fres.points))
    assert isinstance(restored["params"], MicrofacetParams)


def test_throughput_meter():
    from dj_brdf_tpu.utils.profiling import Throughput
    meter = Throughput(items_per_call=100)
    x = jnp.ones((100,))
    for _ in range(3):
        with meter:
            y = x * 2
            meter.sync(y)
    assert meter.rate() > 0


def test_tabulate_merl_batch_matches_sequential():
    """One vmapped tabulation program == per-material build_tabular
    (examples/merl_params.cpp parity path), incl. sharded run."""
    from dj_brdf_tpu.fit import moments, tabular
    from dj_brdf_tpu.io import synth
    from dj_brdf_tpu.models.merl import Merl

    tables = []
    for a in (0.2, 0.5):
        def eval_fn(i, o, a=a):
            return mf.eval(GGX(), fresnel.Schlick(f0=jnp.full((3,), 0.7)),
                           MicrofacetParams.isotropic(a), i, o)
        tables.append(synth.bake_merl(eval_fn))
    tables = jnp.asarray(np.stack(tables), jnp.float32)

    res = 24
    dists, fres_pts, ab, ag = batch.tabulate_merl_batch(tables, res)
    for k in range(2):
        d_ref, f_ref = tabular.build_tabular(Merl(table=tables[k]), res)
        np.testing.assert_allclose(np.asarray(dists.p22[k]),
                                   np.asarray(d_ref.p22), rtol=2e-5)
        np.testing.assert_allclose(np.asarray(dists.qf[k]),
                                   np.asarray(d_ref.qf), atol=1e-6)
        np.testing.assert_allclose(np.asarray(fres_pts[k]),
                                   np.asarray(f_ref.points), rtol=1e-4,
                                   atol=1e-5)
        np.testing.assert_allclose(
            float(ab[k]), float(moments.fit_beckmann_parameters(d_ref).ax),
            rtol=1e-5)
        np.testing.assert_allclose(
            float(ag[k]), float(moments.fit_ggx_parameters(d_ref).ax),
            rtol=1e-5)

    # material axis sharded over the 8-device CPU mesh (pads 2 -> 8)
    mesh = make_mesh(8)
    dists_s, _, ab_s, ag_s = batch.tabulate_merl_batch(tables, res, mesh=mesh)
    np.testing.assert_allclose(np.asarray(dists_s.p22), np.asarray(dists.p22),
                               rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ab_s), np.asarray(ab), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ag_s), np.asarray(ag), rtol=1e-6)


def test_checkpoint_roundtrip_render_pytrees(tmp_path):
    """The round-5 render pytrees — EnvMap (alias tables + rotation),
    TexturedMicrofacetMaterial, full-map FilteredBeckmannMaterial —
    persist and restore through the same checkpoint path (the
    framework's scene-state persistence; the reference rebuilds its
    fitted state from scratch at every scene load)."""
    import numpy as np
    from dj_brdf_tpu import fresnel
    from dj_brdf_tpu.lean.filtered import FilteredBeckmannMaterial
    from dj_brdf_tpu.lean.lrep import Lrep
    from dj_brdf_tpu.microfacet.ndf import GGX
    from dj_brdf_tpu.microfacet.params import MicrofacetParams
    from dj_brdf_tpu.render.envmap import EnvMap
    from dj_brdf_tpu.render.materials import TexturedMicrofacetMaterial
    from dj_brdf_tpu.utils.checkpoint import (load_checkpoint,
                                              save_checkpoint)

    rng = np.random.default_rng(0)
    em = EnvMap.build(
        jnp.asarray(rng.uniform(0.1, 1, (8, 16, 3)), jnp.float32),
        rotation=EnvMap.rotation_z(0.5))
    tex = TexturedMicrofacetMaterial(
        dist=GGX(), fres=fresnel.Schlick(f0=jnp.asarray([0.9, 0.6, 0.3])),
        alpha1=jnp.asarray(rng.uniform(0.1, 0.5, (4, 4)), jnp.float32),
        alpha2=jnp.asarray(0.2, jnp.float32),
        alpha_angle=jnp.asarray(0.0, jnp.float32))
    e1 = jnp.asarray(rng.normal(0, 0.1, (4, 4)), jnp.float32)
    lean = FilteredBeckmannMaterial(
        lean=Lrep(E1=e1, E2=e1, E3=e1 * e1 + 0.02, E4=e1 * e1 + 0.02,
                  E5=e1 * e1),
        base_params=MicrofacetParams.isotropic(0.1),
        eta=jnp.asarray([0.1, 0.3, 1.4]), k=jnp.asarray([3.9, 2.4, 1.6]),
        mip_lod=True)

    state = {"envmap": em, "sphere": tex, "floor": lean}
    save_checkpoint(str(tmp_path / "scene"), state)
    back = load_checkpoint(str(tmp_path / "scene"), like=state)
    for k in state:
        la = jax.tree_util.tree_leaves(state[k])
        lb = jax.tree_util.tree_leaves(back[k])
        assert len(la) == len(lb)
        for a, b in zip(la, lb):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert isinstance(back["envmap"], EnvMap)
    assert back["floor"].mip_lod is True  # static fields preserved
