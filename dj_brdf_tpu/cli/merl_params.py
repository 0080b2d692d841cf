"""GGX and Beckmann roughness extraction for MERL BRDFs.

Equivalent of ``examples/merl_params.cpp``: for each MERL binary, run
the tabulation pipeline at res 90 and append
``name beckmann_alpha ggx_alpha`` to params.txt
(merl_params.cpp:53-68).

Usage: python -m dj_brdf_tpu.cli.merl_params merl1.binary merl2.binary ...
"""

from __future__ import annotations

import argparse
import os
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("files", nargs="+", help="MERL .binary files")
    ap.add_argument("-o", "--output", default="params.txt")
    ap.add_argument("--res", type=int, default=90)
    args = ap.parse_args(argv)

    import jax.numpy as jnp
    from dj_brdf_tpu.fit import moments, tabular
    from dj_brdf_tpu.io.merl_io import load_merl
    from dj_brdf_tpu.models.merl import Merl

    with open(args.output, "w") as pf:
        pf.write("# MERL Beckmann GGX\n")
        for path in args.files:
            m = Merl(table=jnp.asarray(load_merl(path)))
            dist, _ = tabular.build_tabular(m, args.res)
            ab = float(moments.fit_beckmann_parameters(dist).ax)
            ag = float(moments.fit_ggx_parameters(dist).ax)
            name = os.path.splitext(os.path.basename(path))[0]
            pf.write(f"{name} {ab:.3f} {ag:.3f}\n")
            print(f"{name}: beckmann={ab:.3f} ggx={ag:.3f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
