"""Microbenchmark matrix for the MERL table-gather problem.

The MERL eval is 3 gathers from a (3, 90, 90, 180) f32 table (17.5 MB)
at ~4M random indices. Round-1 baseline: 2.7e7 evals/s. Target: >=1e9.
This script times candidate formulations on the real TPU so the kernel
design is driven by measurements, not guesses.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N = 1 << 22
R_H, R_D, R_P = 90, 90, 180
NROWS = R_H * R_D          # 8100
NELEM = NROWS * R_P        # 1,458,000 per channel


def timed(name, fn, *args, iters=20, per=N):
    """Times with a scalar readback per round — `block_until_ready` is
    not a reliable sync on tunneled devices (bench.py methodology), so
    every candidate is wrapped to end in a float() of a reduction."""
    red = jax.jit(lambda *a: jnp.sum(fn(*a)))
    float(red(*args))  # warmup
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = None
        for _ in range(iters):
            s = red(*args)
        float(s)  # full device sync through the result value
        best = min(best, time.perf_counter() - t0)
    rate = per * iters / best
    print(f"{name:38s} {rate:.3e} evals/s   ({best*1e3/iters:.3f} ms/iter)")
    return rate


def main():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    table = jax.random.uniform(k1, (3, R_H, R_D, R_P), jnp.float32)
    idx = jax.random.randint(k2, (N,), 0, NELEM, jnp.int32)
    print(f"# device: {jax.devices()[0]}", file=sys.stderr)

    # V0: per-channel flat take (round-1 formulation)
    flat = table.reshape(3, -1)

    @jax.jit
    def v0(idx):
        r = jnp.take(flat[0], idx)
        g = jnp.take(flat[1], idx)
        b = jnp.take(flat[2], idx)
        return jnp.stack([r, g, b], -1)

    timed("v0 per-channel flat take", v0, idx)

    # V1: channel-interleaved (NELEM, 3) single take along axis 0
    inter = jnp.transpose(table.reshape(3, -1), (1, 0)).copy()

    @jax.jit
    def v1(idx):
        return jnp.take(inter, idx, axis=0)

    timed("v1 interleaved (N,3) row take", v1, idx)

    # V2: row gather (8100, 180*3) + one-hot inner reduce. Run at N/4:
    # the (N, 540) gather + (N, 180) one-hot materialize ~12 GB at the
    # full N and would OOM a 16 GB chip before V3-V7 get to run.
    rows3 = jnp.transpose(table, (1, 2, 3, 0)).reshape(NROWS, R_P * 3)
    N2 = N // 4

    @jax.jit
    def v2(idx):
        r = idx // R_P
        p = idx % R_P
        g = jnp.take(rows3, r, axis=0)           # (N2, 540)
        g = g.reshape(N2, R_P, 3)
        oh = (jax.lax.broadcasted_iota(jnp.int32, (N2, R_P), 1)
              == p[:, None]).astype(jnp.float32)
        return jnp.einsum("npc,np->nc", g, oh)

    try:
        timed("v2 row take + one-hot reduce (N/4)", v2, idx[:N2], per=N2)
    except Exception as e:
        print(f"v2 FAILED: {type(e).__name__}: {str(e)[:300]}")

    # V3: flattened single-axis take of interleaved table
    inter_flat = inter.reshape(-1)

    @jax.jit
    def v3(idx):
        base = idx * 3
        return jnp.stack([jnp.take(inter_flat, base + c) for c in range(3)],
                         -1)

    timed("v3 interleaved flat 3x take", v3, idx)

    # V4: pallas kernel, per-channel plane in VMEM, jnp.take inside
    plane = flat[0]  # (NELEM,)
    BLK = 4096
    plane2d = jnp.pad(plane, (0, (-NELEM) % 128)).reshape(-1, 128)

    def k4(tab_ref, idx_ref, out_ref):
        tab = tab_ref[:].reshape(-1)
        out_ref[:] = jnp.take(tab, idx_ref[:].reshape(-1),
                              axis=0).reshape(out_ref.shape)

    try:
        @jax.jit
        def v4(idx):
            idx2 = idx.reshape(-1, BLK // 8)   # (8, 128k)-aligned blocks
            return pl.pallas_call(
                k4,
                grid=(N // BLK,),
                in_specs=[
                    pl.BlockSpec((plane2d.shape[0], 128), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, BLK // 8), lambda g: (g, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((8, BLK // 8), lambda g: (g, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((N // BLK * 8, BLK // 8),
                                               jnp.float32),
            )(plane2d, idx2)

        timed("v4 pallas VMEM-plane jnp.take", v4, idx)
    except Exception as e:
        print(f"v4 pallas take FAILED: {type(e).__name__}: {str(e)[:300]}")

    # V5: pallas, gather expressed as take_along_axis on 2D VMEM table
    def k5(tab_ref, row_ref, lane_ref, out_ref):
        rows = jnp.take(tab_ref[:], row_ref[:].reshape(-1), axis=0)
        out_ref[:] = jnp.take_along_axis(
            rows, lane_ref[:].reshape(-1, 1), axis=1).reshape(out_ref.shape)

    try:
        @jax.jit
        def v5(idx):
            row = (idx // 128).reshape(-1, BLK // 8)
            lane = (idx % 128).reshape(-1, BLK // 8)
            spec = pl.BlockSpec((8, BLK // 8), lambda g: (g, 0),
                                memory_space=pltpu.VMEM)
            return pl.pallas_call(
                k5,
                grid=(N // BLK,),
                in_specs=[
                    pl.BlockSpec((plane2d.shape[0], 128), lambda g: (0, 0),
                                 memory_space=pltpu.VMEM),
                    spec, spec,
                ],
                out_specs=spec,
                out_shape=jax.ShapeDtypeStruct((N // BLK * 8, BLK // 8),
                                               jnp.float32),
            )(plane2d, row, lane)

        timed("v5 pallas row-take + take_along", v5, idx)
    except Exception as e:
        print(f"v5 FAILED: {type(e).__name__}: {str(e)[:300]}")

    # V6: sort-based: argsort + sorted gather + unsort (upper bound check)
    @jax.jit
    def v6(idx):
        order = jnp.argsort(idx)
        sidx = idx[order]
        vals = jnp.take(flat[0], sidx)
        return jnp.zeros_like(vals).at[order].set(vals)

    timed("v6 argsort+take+unsort (1ch)", v6, idx)

    # V7: sort cost alone
    @jax.jit
    def v7(idx):
        return jnp.sort(idx)

    timed("v7 sort alone", v7, idx)

    # V8: END-TO-END sorted 3-channel row gather: argsort + coherent
    # (N, 3) row take at sorted indices + inverse-permutation scatter
    # (the composition VERDICT r2 asked to measure)
    @jax.jit
    def v8(idx):
        order = jnp.argsort(idx)
        rows = jnp.take(inter, idx[order], axis=0)      # coherent (N,3)
        return jnp.zeros_like(rows).at[order].set(rows)

    timed("v8 sorted (N,3) take + unsort", v8, idx)

    # V9: same but inverse permutation via a second gather instead of
    # a scatter (scatters are often slower than gathers on TPU)
    @jax.jit
    def v9(idx):
        order = jnp.argsort(idx)
        rows = jnp.take(inter, idx[order], axis=0)
        inv = jnp.argsort(order)
        return jnp.take(rows, inv, axis=0)

    timed("v9 sorted take + gather-unsort", v9, idx)

    # V10: one-hot matmul via the MXU: rows from an (N, NROWS) one-hot
    # against the (NROWS, 540) table — trades the gather-issue limit
    # for N*NROWS*540 MACs; measured for the record (N/64)
    N10 = N // 64
    @jax.jit
    def v10(idx):
        r = idx // R_P
        p = idx % R_P
        oh = jax.nn.one_hot(r, NROWS, dtype=jnp.bfloat16)  # (N10, 8100)
        g = (oh @ rows3.astype(jnp.bfloat16)).astype(jnp.float32)
        g = g.reshape(N10, R_P, 3)
        ohp = (jax.lax.broadcasted_iota(jnp.int32, (N10, R_P), 1)
               == p[:, None]).astype(jnp.float32)
        return jnp.einsum("npc,np->nc", g, ohp)

    try:
        timed("v10 MXU one-hot matmul (N/64)", v10, idx[:N10], per=N10)
    except Exception as e:
        print(f"v10 FAILED: {type(e).__name__}: {str(e)[:300]}")


def utia_combine_experiments():
    """Round-4 UTIA combine study (VERDICT r3 #8): the last untried
    formulation — multiply the gathered (N,48) row by broadcast rank-1
    weight rows and contract the channel interleave with a constant
    (48,3) 0/1 matrix on the MXU — plus the per-channel strided-slice
    variant, against the shipped einsum combine. Measured (v5e, round
    4): current 1.54e8, MXU 1.09e8, sliced 6.6e7 evals/s — the MXU
    shape LOSES; the gather's index-major padded layout remains the
    binding constraint (docs/DESIGN.md section 6)."""
    import numpy as np
    from dj_brdf_tpu.core.math import from_spherical
    from dj_brdf_tpu.models import utia as um

    n = 1 << 22
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, kt = jax.random.split(key, 5)
    i = from_spherical(jax.random.uniform(k1, (n,), minval=0.02, maxval=1.5),
                       jax.random.uniform(k2, (n,), maxval=2 * jnp.pi))
    o = from_spherical(jax.random.uniform(k3, (n,), minval=0.02, maxval=1.5),
                       jax.random.uniform(k4, (n,), maxval=2 * jnp.pi))
    u = um.Utia.build(jax.random.uniform(kt, (3, 6, 48, 6, 48),
                                         jnp.float32) * 0.1)

    def taps_and_weights(u_model, i, o):
        theta_i, theta_o, phi_i, phi_o = um._angles_deg(i, o)
        below = (theta_i >= 90.0) | (theta_o >= 90.0)
        theta_i = jnp.minimum(theta_i, 90.0)
        theta_o = jnp.minimum(theta_o, 90.0)
        iti0, _, wti0, wti1 = um._axis_theta(theta_i, um.NTI)
        itv0, _, wtv0, wtv1 = um._axis_theta(theta_o, um.NTV)
        ipi0, _, wpi0, wpi1 = um._axis_phi(phi_i, um.NPI)
        ipv0, _, wpv0, wpv1 = um._axis_phi(phi_o, um.NPV)
        row = ((iti0 * um.NPI + ipi0) * (um.NTV - 1) + itv0) * um.NPV + ipv0
        taps = jnp.take(u_model.packed, row, axis=0, mode="clip")
        return (taps, below, (jnp.stack([wti0, wti1], -1),
                              jnp.stack([wpi0, wpi1], -1),
                              jnp.stack([wtv0, wtv1], -1),
                              jnp.stack([wpv0, wpv1], -1)))

    timed("utia current (einsum combine)",
          lambda u_m, i, o: u_m.evalp(i, o), u, i, o, per=n)

    S = jnp.asarray(np.eye(3)[np.arange(48) % 3], jnp.float32)

    def mxu(u_m, i, o):
        taps, below, (wt, wp, wv, wq) = taps_and_weights(u_m, i, o)
        wt48 = jnp.repeat(wt, 24, axis=-1)
        wp48 = jnp.tile(jnp.repeat(wp, 12, axis=-1), (1, 2))
        wv48 = jnp.tile(jnp.repeat(wv, 6, axis=-1), (1, 4))
        wq48 = jnp.tile(jnp.repeat(wq, 3, axis=-1), (1, 8))
        prod = taps * (wt48 * wp48) * (wv48 * wq48)
        rgb = jnp.dot(prod, S, preferred_element_type=jnp.float32)
        return um._decode(rgb, below) * i[..., 2:3]

    timed("utia MXU (48,3) contraction", mxu, u, i, o, per=n)

    def sliced(u_m, i, o):
        taps, below, (wt, wp, wv, wq) = taps_and_weights(u_m, i, o)
        w = (wt[..., :, None, None, None] * wp[..., None, :, None, None]
             * wv[..., None, None, :, None] * wq[..., None, None, None, :])
        w = w.reshape(*w.shape[:-4], 16)
        rgb = jnp.stack([(taps[:, c::3] * w).sum(-1) for c in range(3)], -1)
        return um._decode(rgb, below) * i[..., 2:3]

    timed("utia per-channel strided slices", sliced, u, i, o, per=n)


def envmap_onehot_experiments():
    """Can a SMALL envmap's packed-row lookup beat the gather via a
    one-hot MXU contraction? (VERDICT r4 #3 candidate reformulation.)
    A 32x64 map's packed table is (2048, 16) — 128 KB, VMEM-class —
    so `onehot(N, 2048) @ table` replaces the gather with a matmul.
    The catch this measures: building the one-hot needs an N x 2048
    compare against an iota, which is VPU work proportional to
    N * bins — the construction dwarfs the gather it replaces, and
    bf16-ing the matmul does not touch that term."""
    h, w = 32, 64
    bins = h * w
    n = 1 << 20
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    packed = jax.random.uniform(k1, (bins, 16), jnp.float32)
    idx = jax.random.randint(k2, (n,), 0, bins, jnp.int32)

    def g0(idx):
        return jnp.take(packed, idx, axis=0)
    timed("gather packed row (baseline)", g0, idx, per=n)

    def oh_f32(idx):
        oh = jax.nn.one_hot(idx, bins, dtype=jnp.float32)
        return oh @ packed
    timed("one-hot f32 @ packed", oh_f32, idx, per=n)

    def oh_bf16(idx):
        oh = jax.nn.one_hot(idx, bins, dtype=jnp.bfloat16)
        return (oh @ packed.astype(jnp.bfloat16)).astype(jnp.float32)
    timed("one-hot bf16 @ packed (MXU)", oh_bf16, idx, per=n)

    # construction alone, to attribute the cost
    def oh_only(idx):
        return jax.nn.one_hot(idx, bins, dtype=jnp.bfloat16).sum(-1)
    timed("one-hot construction only", oh_only, idx, per=n)


if __name__ == "__main__":
    if "--utia" in sys.argv:
        utia_combine_experiments()
    elif "--envmap-onehot" in sys.argv:
        envmap_onehot_experiments()
    else:
        main()
