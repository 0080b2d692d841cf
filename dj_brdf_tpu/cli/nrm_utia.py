"""White-furnace energy-conservation test for UTIA BRDFs — equivalent
of ``tests/nrm_utia.cpp``: integrate evalp*sin(theta) over the
hemisphere for a 64x256 outgoing grid and require <= 1 per channel.
Exit code 1 on violation (the reference's only machine-checkable test).

Usage: python -m dj_brdf_tpu.cli.nrm_utia file1.bin file2.bin ...
"""

from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="+")
    ap.add_argument("--mesh", type=int, default=0,
                    help="shard the outgoing grid over N devices")
    ap.add_argument("--ntheta", type=int, default=64)
    ap.add_argument("--nphi", type=int, default=256)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from dj_brdf_tpu.io.utia_io import load_utia
    from dj_brdf_tpu.models.utia import Utia
    from dj_brdf_tpu.parallel import integrals
    from dj_brdf_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(args.mesh) if args.mesh else None
    ok_all = True
    for path in args.files:
        print(f"Testing {path}...")
        u = Utia(table=jnp.asarray(load_utia(path)))
        ok, max_val = integrals.furnace_test(
            u.evalp, n_out_theta=args.ntheta, n_out_phi=args.nphi, mesh=mesh)
        print(f"=> {'ok' if ok else 'FAILURE'} (max integral {max_val:.4f})")
        ok_all = ok_all and ok
    return 0 if ok_all else 1


if __name__ == "__main__":
    raise SystemExit(main())
