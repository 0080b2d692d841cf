"""Autodiff nonlinear least-squares BRDF fitting.

The reference extracts parameters by quadrature moments
(dj_brdf.h:3124-3307); this module is the framework's *new-capability*
fitting path (BASELINE.json north_star): fit microfacet parameters +
Fresnel directly to measured data by gradient descent on a
differentiable loss, data-parallel over a device mesh — per-shard
gradients are combined by jit's automatic psum when the sample batch
carries a sharding and the parameters are replicated.

The moment fits remain available in :mod:`dj_brdf_tpu.fit.moments` as
reference checks and good initializers.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from dj_brdf_tpu import fresnel as fresnel_mod
from dj_brdf_tpu.microfacet import brdf as mf
from dj_brdf_tpu.microfacet.params import MicrofacetParams


class RawFit(NamedTuple):
    """Unconstrained parameterization of (MicrofacetParams, Schlick f0)."""
    log_ax: jnp.ndarray
    log_ay: jnp.ndarray
    raw_rho: jnp.ndarray
    txn: jnp.ndarray
    tyn: jnp.ndarray
    logit_f0: jnp.ndarray  # (3,)


def raw_init(alpha: float = 0.3, f0: float = 0.5) -> RawFit:
    a = jnp.log(jnp.asarray(alpha, jnp.float32))
    return RawFit(log_ax=a, log_ay=a,
                  raw_rho=jnp.zeros((), jnp.float32),
                  txn=jnp.zeros((), jnp.float32),
                  tyn=jnp.zeros((), jnp.float32),
                  logit_f0=jnp.full((3,), jnp.log(f0 / (1 - f0)), jnp.float32))


def raw_to_model(raw: RawFit):
    """Map unconstrained leaves to valid microfacet + fresnel params."""
    params = MicrofacetParams(
        ax=jnp.exp(raw.log_ax) + 1e-4,
        ay=jnp.exp(raw.log_ay) + 1e-4,
        rho=0.99 * jnp.tanh(raw.raw_rho),
        txn=raw.txn, tyn=raw.tyn)
    fres = fresnel_mod.Schlick(f0=jax.nn.sigmoid(raw.logit_f0))
    return params, fres


def relative_l2(pred, target, eps: float = 1e-2):
    """Relative squared error — standard for HDR BRDF fitting (keeps
    highlights from drowning out the falloff)."""
    return jnp.mean(((pred - target) / (target + eps)) ** 2)


def make_loss(dist, shadow: bool = True,
              loss_fn: Callable = relative_l2):
    def loss(raw: RawFit, i, o, target):
        params, fres = raw_to_model(raw)
        pred = mf.evalp(dist, fres, params, i, o, shadow)
        return loss_fn(pred, target)
    return loss


def fit_lsq(dist, i, o, target, steps: int = 200, lr: float = 5e-2,
            init: RawFit | None = None, shadow: bool = True,
            in_shardings=None):
    """Fit (MicrofacetParams, Schlick) to ``target = evalp(i, o)``.

    ``in_shardings``: optional NamedSharding for the (i, o, target)
    batch — pass shardings over a mesh data axis to data-parallelize;
    gradients reduce over devices automatically.

    Returns (params, fresnel, losses)."""
    raw = init if init is not None else raw_init()
    loss = make_loss(dist, shadow)
    opt = optax.adam(lr)
    opt_state = opt.init(raw)

    if in_shardings is not None:
        i = jax.device_put(i, in_shardings)
        o = jax.device_put(o, in_shardings)
        target = jax.device_put(target, in_shardings)

    @jax.jit
    def run(raw, opt_state, i, o, target):
        def step(carry, _):
            raw, opt_state = carry
            val, grads = jax.value_and_grad(loss)(raw, i, o, target)
            updates, opt_state = opt.update(grads, opt_state)
            raw = optax.apply_updates(raw, updates)
            return (raw, opt_state), val

        (raw, opt_state), losses = jax.lax.scan(step, (raw, opt_state),
                                                None, length=steps)
        return raw, losses

    raw, losses = run(raw, opt_state, i, o, target)
    params, fres = raw_to_model(raw)
    return params, fres, losses
