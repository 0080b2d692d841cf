"""Scaling benchmark: data-parallel fitting-step throughput vs mesh
size. On real multi-chip hardware this measures ICI scaling
efficiency (BASELINE north-star: >=85% at 4 hosts); on a single host
it runs on virtual CPU devices to validate the sharding path
end-to-end.

Usage: python tools/bench_scaling.py [--devices 8] [--n 1048576] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--devices", type=int, default=0,
                    help="max mesh size (0 = all available)")
    ap.add_argument("--n", type=int, default=1 << 20, help="batch per step")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU with --devices virtual devices")
    args = ap.parse_args()

    if args.cpu:
        ndev = args.devices or 8
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + f" --xla_force_host_platform_device_count={ndev}")
        import jax
        jax.config.update("jax_platforms", "cpu")
    else:
        import jax

    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from dj_brdf_tpu.core.math import from_spherical
    from dj_brdf_tpu.ops import soa
    from dj_brdf_tpu.parallel.mesh import make_mesh, DATA_AXIS

    total = len(jax.devices())
    max_dev = min(args.devices or total, total)
    n = args.n

    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    i = from_spherical(jax.random.uniform(ks[0], (n,), minval=0.02, maxval=1.5),
                       jax.random.uniform(ks[1], (n,), maxval=6.28))
    o = from_spherical(jax.random.uniform(ks[2], (n,), minval=0.02, maxval=1.5),
                       jax.random.uniform(ks[3], (n,), maxval=6.28))
    comp = soa.split_dirs(i, o)
    pvec_t = jnp.asarray([0.25, 0.25, 0, 0, 0, 0.9, 0.6, 0.3], jnp.float32)
    targets = soa.ggx_evalp_soa(pvec_t, *comp)
    pvec = jnp.asarray([0.4, 0.3, 0.1, 0, 0, 0.5, 0.5, 0.5], jnp.float32)

    results = {}
    d = 1
    while d <= max_dev:
        mesh = make_mesh(d)
        sh = NamedSharding(mesh, P(DATA_AXIS))
        data = [jax.device_put(a, sh) for a in (*comp, *targets)]
        step = jax.jit(jax.value_and_grad(soa.ggx_lsq_loss_soa))
        v, g = step(pvec, *data)
        jax.block_until_ready((v, g))

        def rnd():
            t0 = time.perf_counter()
            for _ in range(args.iters):
                v, g = step(pvec, *data)
            float(v)
            jax.block_until_ready(g)
            return time.perf_counter() - t0

        rnd()
        dt = min(rnd() for _ in range(3))
        rate = n * args.iters / dt
        results[d] = rate
        eff = rate / (results[1] * d)
        print(f"devices={d}: {rate:.3e} evals/s  efficiency={eff:.1%}",
              file=sys.stderr)
        d *= 2

    base = results[1]
    print(json.dumps({
        "metric": "dp_scaling_efficiency",
        "per_device": {str(k): v for k, v in results.items()},
        "efficiency_at_max": results[max(results)] / (base * max(results)),
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
