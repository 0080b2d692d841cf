"""Render a directly lit sphere with any model in the framework — the
TPU-native replacement for the reference's Mitsuba matpreview scenes
(mitsuba/*.cpp expose the same six material families as BSDF plugins).

Usage examples:
  python -m dj_brdf_tpu.cli.render --model ggx --alpha1 0.3 --alpha2 0.1
  python -m dj_brdf_tpu.cli.render --model merl --file brass.binary
  python -m dj_brdf_tpu.cli.render --model sgd --material gold-metallic-paint
  python -m dj_brdf_tpu.cli.render --model merl_fit --file brass.binary
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--model", required=True,
                    choices=["ggx", "beckmann", "lambert", "merl", "utia",
                             "sgd", "abc", "merl_fit"])
    ap.add_argument("--file", help="MERL/UTIA binary (merl/utia/merl_fit)")
    ap.add_argument("--material", help="material name (sgd/abc)")
    ap.add_argument("--alpha1", type=float, default=0.3)
    ap.add_argument("--alpha2", type=float, default=None)
    ap.add_argument("--alpha-angle", type=float, default=0.0)
    ap.add_argument("--f0", type=float, nargs=3, default=[1.0, 1.0, 1.0])
    ap.add_argument("--light", type=float, nargs=3, default=[0.3, 0.4, 0.8])
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--exposure", type=float, default=1.0)
    ap.add_argument("--pathtrace", action="store_true",
                    help="multi-bounce sphere-on-plane path trace "
                         "instead of the direct-light sphere")
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--bounces", type=int, default=3)
    ap.add_argument("-o", "--output", default="render.png")
    args = ap.parse_args(argv)

    import numpy as np
    import jax
    import jax.numpy as jnp
    from dj_brdf_tpu import fresnel
    from dj_brdf_tpu.microfacet import brdf as mf
    from dj_brdf_tpu.microfacet.ndf import GGX, Beckmann
    from dj_brdf_tpu.microfacet.params import MicrofacetParams
    from dj_brdf_tpu.render.sphere import render_sphere

    from dj_brdf_tpu.models.lambert import Lambert
    from dj_brdf_tpu.render.materials import (CosineMaterial,
                                              MeasuredMaterial,
                                              MicrofacetMaterial)

    a2 = args.alpha2 if args.alpha2 is not None else args.alpha1
    params = MicrofacetParams.elliptic(args.alpha1, a2, args.alpha_angle)
    fres = fresnel.Schlick(f0=jnp.asarray(args.f0, jnp.float32))

    if args.model in ("ggx", "beckmann"):
        dist = GGX() if args.model == "ggx" else Beckmann()
        mat = MicrofacetMaterial(dist=dist, fres=fres, params=params)
    elif args.model == "lambert":
        mat = CosineMaterial(model=Lambert(
            reflectance=jnp.asarray(args.f0, jnp.float32)))
    elif args.model == "merl":
        from dj_brdf_tpu.io.merl_io import load_merl
        mat = MeasuredMaterial.from_merl(jnp.asarray(load_merl(args.file)))
    elif args.model == "utia":
        from dj_brdf_tpu.io.utia_io import load_utia
        from dj_brdf_tpu.models.utia import Utia
        mat = CosineMaterial(model=Utia(
            table=jnp.asarray(load_utia(args.file))))
    elif args.model == "sgd":
        from dj_brdf_tpu.models.sgd import SGD
        mat = MeasuredMaterial.from_model(SGD.from_name(args.material))
    elif args.model == "abc":
        from dj_brdf_tpu.models.abc_model import ABC
        mat = MeasuredMaterial.from_model(ABC.from_name(args.material))
    elif args.model == "merl_fit":
        # the dj_merl plugin path: fit a GGX proxy, render the proxy
        # parameters with the extracted Fresnel (mitsuba/dj_merl.cpp:29-33)
        from dj_brdf_tpu.fit import moments, tabular
        from dj_brdf_tpu.io.merl_io import load_merl
        from dj_brdf_tpu.models.merl import Merl
        m = Merl(table=jnp.asarray(load_merl(args.file)))
        tab, tab_fres = tabular.build_tabular(m.eval, 90, shadow=False)
        p = moments.fit_ggx_parameters(tab)
        mat = MicrofacetMaterial(dist=GGX(), fres=tab_fres, params=p)

    if args.pathtrace:
        from dj_brdf_tpu.render.pathtrace import render as pt_render
        floor = CosineMaterial(model=Lambert(
            reflectance=jnp.asarray([0.42, 0.42, 0.45], jnp.float32)))
        img = pt_render(mat, floor, tuple(args.light),
                        (3.0, 3.0, 3.0), (0.3, 0.38, 0.5),
                        res=args.res, spp=args.spp,
                        max_bounces=args.bounces)
    else:
        img = jax.jit(lambda: render_sphere(mat.evalp, tuple(args.light),
                                            res=args.res))()
    arr = np.asarray(jnp.clip(img * args.exposure, 0.0, 1.0) ** (1 / 2.2))
    from PIL import Image
    Image.fromarray((arr * 255).astype(np.uint8)).save(args.output)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
