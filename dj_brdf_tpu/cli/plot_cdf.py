"""Dump radial CDF (or QF) curves for analytic and tabulated
Beckmann/GGX — equivalent of ``tests/plot_cdf.cpp`` and
``tests/plot_qf.cpp``: four text files of (theta_deg, value) rows for
plotting, validating the tabulation pipeline against closed forms.

Usage: python -m dj_brdf_tpu.cli.plot_cdf [--qf] [--res 180] [--outdir .]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--qf", action="store_true", help="dump quantile fns")
    ap.add_argument("--res", type=int, default=180)
    ap.add_argument("--outdir", default=".")
    args = ap.parse_args(argv)

    import numpy as np
    import jax.numpy as jnp
    from dj_brdf_tpu import fresnel
    from dj_brdf_tpu.fit import tabular
    from dj_brdf_tpu.microfacet.ndf import GGX, Beckmann
    from dj_brdf_tpu.microfacet.params import MicrofacetParams

    kind = "qf" if args.qf else "cdf"

    def dump(dist, path):
        cnt = 90
        with open(path, "w") as pf:
            for i in range(1, cnt):
                u = i / cnt
                if args.qf:
                    # (reference plot_qf.cpp:12-20)
                    val = float(jnp.arctan(dist.qf_radial(jnp.float32(u))))
                    pf.write(f"{u} {np.degrees(val)}\n")
                else:
                    # (reference plot_cdf.cpp:9-20)
                    theta = u * np.pi / 2
                    val = float(dist.cdf_radial(jnp.float32(np.tan(theta))))
                    pf.write(f"{np.degrees(theta)} {val}\n")

    for name, dist in [("beckmann", Beckmann()), ("ggx", GGX())]:
        dump(dist, os.path.join(args.outdir, f"eval_{kind}_{name}.txt"))
        eval_fn = tabular.microfacet_eval_fn(
            dist, fresnel.Ideal(), MicrofacetParams.standard())
        tab, _ = tabular.build_tabular(eval_fn, args.res, shadow=False)
        dump(tab, os.path.join(args.outdir, f"eval_{kind}_{name}_tab.txt"))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
