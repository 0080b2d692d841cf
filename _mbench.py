import time, jax, jax.numpy as jnp
from dj_brdf_tpu.models.merl import Merl, theta_half_index, theta_diff_index, phi_diff_index, RES_THETA_D, RES_PHI_D
from dj_brdf_tpu.core.math import io_to_hd, to_spherical, from_spherical

N = 1 << 22
key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
i = from_spherical(jax.random.uniform(k1, (N,), minval=0.02, maxval=1.5),
                   jax.random.uniform(k2, (N,), maxval=6.28))
o = from_spherical(jax.random.uniform(k3, (N,), minval=0.02, maxval=1.5),
                   jax.random.uniform(k4, (N,), maxval=6.28))
table = jax.random.uniform(jax.random.PRNGKey(1), (3, 90, 90, 180), jnp.float32)
m = Merl(table=table)

def timeit(name, f, *a):
    f = jax.jit(f)
    out = f(*a); jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        for _ in range(20):
            out = f(*a)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:24s} {N*20/best:.3e} evals/s")

timeit("full evalp (method jit)", m.evalp, i, o)
timeit("full evalp (arg table)", lambda t, i, o: Merl(table=t).evalp(i, o), table, i, o)

def idx_only(i, o):
    h, d = io_to_hd(i, o)
    th, _ = to_spherical(h)
    td, pd = to_spherical(d)
    return (theta_half_index(th) * RES_THETA_D + theta_diff_index(td)) * (RES_PHI_D // 2) + phi_diff_index(pd)
timeit("index math only", idx_only, i, o)

def hd_only(i, o):
    h, d = io_to_hd(i, o)
    return h + d
timeit("io_to_hd only", hd_only, i, o)
