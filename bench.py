"""Headline benchmark: GGX microfacet evalp forward+backward throughput
per chip (the reference's hot loop, dj_brdf.h:1529-1547, as one fused
XLA program). Prints ONE JSON line; vs_baseline is against the 1e9
evals/s/chip north-star target (BASELINE.md).

Run on the real TPU: `python bench.py`. Optional env:
  BENCH_N        batch size per step   (default 2^22)
  BENCH_ITERS    timed iterations      (default 50; keep high enough to
                 amortize the per-dispatch latency of tunneled devices)
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from dj_brdf_tpu.core.math import from_spherical
    from dj_brdf_tpu.ops import soa
    from dj_brdf_tpu.ops.fused_fit import ggx_lsq_value_and_grad

    n = int(os.environ.get("BENCH_N", 1 << 22))
    iters = int(os.environ.get("BENCH_ITERS", 50))
    use_pallas = os.environ.get("BENCH_PALLAS", "1") == "1"
    dev = jax.devices()[0]
    print(f"# device: {dev}", file=sys.stderr)

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    i = from_spherical(jax.random.uniform(k1, (n,), minval=0.02, maxval=1.5),
                       jax.random.uniform(k2, (n,), maxval=6.28))
    o = from_spherical(jax.random.uniform(k3, (n,), minval=0.02, maxval=1.5),
                       jax.random.uniform(k4, (n,), maxval=6.28))
    comp = soa.split_dirs(i, o)
    pvec_true = jnp.asarray([0.25, 0.25, 0.0, 0.0, 0.0, 0.9, 0.6, 0.3],
                            jnp.float32)
    tr, tg, tb = soa.ggx_evalp_soa(pvec_true, *comp)
    pvec = jnp.asarray([0.4, 0.3, 0.1, 0.0, 0.0, 0.5, 0.5, 0.5], jnp.float32)

    # fused Pallas forward+backward on TPU; XLA SoA elsewhere
    if use_pallas and dev.platform != "cpu":
        step = lambda: ggx_lsq_value_and_grad(pvec, *comp, tr, tg, tb,
                                              block_rows=256)
    else:
        xla = jax.jit(jax.value_and_grad(soa.ggx_lsq_loss_soa))
        step = lambda: xla(pvec, *comp, tr, tg, tb)

    def timed_round():
        t0 = time.perf_counter()
        for _ in range(iters):
            val, grads = step()
        # force a full device sync (incl. host readback) before stopping
        float(val)
        jax.block_until_ready(grads)
        return time.perf_counter() - t0

    # round 0 pays compile + first-execution warmup on the remote
    # device; take the best of the following rounds
    timed_round()
    dt = min(timed_round() for _ in range(3))

    evals_per_s = n * iters / dt
    print(f"# {n} evals x {iters} iters in {dt:.3f}s", file=sys.stderr)

    # secondary metrics (stderr): MERL table eval + power-iteration rate
    if os.environ.get("BENCH_SECONDARY", "1") == "1":
        try:
            _secondary_metrics(i, o, iters)
        except Exception as e:  # keep the primary metric robust
            print(f"# secondary metrics failed: {e}", file=sys.stderr)

    print(json.dumps({
        "metric": "ggx_evalp_fwdbwd_evals_per_s_per_chip",
        "value": evals_per_s,
        "unit": "evals/s",
        "vs_baseline": evals_per_s / 1e9,
    }))


def _secondary_metrics(i, o, iters: int) -> None:
    from dj_brdf_tpu.models.merl import Merl

    n = i.shape[0]
    # synthetic MERL table resident in HBM (values irrelevant for perf);
    # generated on-device — host->device of big arrays is slow over a
    # tunneled device link
    table = jax.random.uniform(jax.random.PRNGKey(0), (3, 90, 90, 180),
                               jnp.float32)
    m = Merl(table=table)
    ev = jax.jit(m.evalp)
    out = ev(i, o)
    jax.block_until_ready(out)

    def rnd():
        t0 = time.perf_counter()
        for _ in range(iters):
            out = ev(i, o)
        float(out[0, 0])
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    rnd()
    dt = min(rnd() for _ in range(3))
    print(f"# merl_eval_evals_per_s: {n * iters / dt:.3e}", file=sys.stderr)

    # power-iteration matvec rate on the 8010^2 anisotropic kernel size
    rows = 8010 - 8010 % 2
    A = jax.random.uniform(jax.random.PRNGKey(1), (rows, rows), jnp.float32)
    v0 = jnp.ones((rows,), jnp.float32)
    mv = jax.jit(lambda v: A @ v)
    v = mv(v0)
    jax.block_until_ready(v)
    t0 = time.perf_counter()
    v = v0
    for _ in range(50):
        v = mv(v)
    jax.block_until_ready(v)
    dt = time.perf_counter() - t0
    print(f"# power_iteration_matvecs_per_s (n={rows}): {50 / dt:.1f}",
          file=sys.stderr)


if __name__ == "__main__":
    main()
