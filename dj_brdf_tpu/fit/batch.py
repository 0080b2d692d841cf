"""Batch fitting of many materials at once.

The reference loops over MERL files one at a time
(examples/merl_params.cpp:53-68); on TPU the whole 100-material MERL
set fits in HBM (100 x 17.5 MB) and fits *in parallel*: material
tables stack on a leading axis, the LSQ fit vmaps over it, and the
material axis shards across the mesh — the data-parallel "train on
all materials" path of BASELINE.json config 4.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from dj_brdf_tpu import fresnel as fresnel_mod
from dj_brdf_tpu.core.math import from_spherical
from dj_brdf_tpu.fit import lsq
from dj_brdf_tpu.microfacet import brdf as mf
from dj_brdf_tpu.microfacet.ndf import GGX
from dj_brdf_tpu.models.merl import Merl
from dj_brdf_tpu.parallel.mesh import DATA_AXIS


def sample_direction_set(key, n: int):
    """A shared quasi-random direction set for fitting targets."""
    k1, k2, k3, k4 = jax.random.split(key, 4)
    i = from_spherical(jax.random.uniform(k1, (n,), minval=0.03, maxval=1.5),
                       jax.random.uniform(k2, (n,), maxval=2 * jnp.pi))
    o = from_spherical(jax.random.uniform(k3, (n,), minval=0.03, maxval=1.5),
                       jax.random.uniform(k4, (n,), maxval=2 * jnp.pi))
    return i, o


def merl_targets(tables, i, o):
    """Evaluate a stack of MERL tables at the direction set:
    (M, 3, 90, 90, 180) -> (M, N, 3)."""
    def one(table):
        return Merl(table=table).evalp(i, o)
    return jax.vmap(one)(tables)


def fit_materials(targets, i, o, steps: int = 300, lr: float = 5e-2,
                  mesh=None, dist=GGX()):
    """Fit per-material (MicrofacetParams, Schlick) to ``targets``
    (M, N, 3). With a mesh, the material axis shards across devices
    (fully independent fits — zero communication; the mesh turns 100
    sequential CPU fits into M/D per device)."""
    m = targets.shape[0]
    raw0 = jax.vmap(lambda _: lsq.raw_init())(jnp.arange(m))
    loss_one = lsq.make_loss(dist)

    def loss_batched(raw):
        per_mat = jax.vmap(lambda r, t: loss_one(r, i, o, t))(raw, targets)
        return jnp.mean(per_mat), per_mat

    opt = optax.adam(lr)

    @jax.jit
    def run(raw):
        opt_state = opt.init(raw)

        def step(carry, _):
            raw, opt_state = carry
            (_, per_mat), grads = jax.value_and_grad(
                loss_batched, has_aux=True)(raw)
            updates, opt_state = opt.update(grads, opt_state)
            raw = optax.apply_updates(raw, updates)
            return (raw, opt_state), per_mat

        (raw, _), per_mat = jax.lax.scan(step, (raw, opt_state), None,
                                         length=steps)
        return raw, per_mat[-1]

    if mesh is not None:
        mat_sharding = NamedSharding(mesh, P(DATA_AXIS))
        targets = jax.device_put(targets, mat_sharding)
        raw0 = jax.device_put(raw0, mat_sharding)

    raw, final_losses = run(raw0)
    params, fres = jax.vmap(lsq.raw_to_model)(raw)
    return params, fres, final_losses
