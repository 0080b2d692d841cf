"""Normal map -> LEAN maps — equivalent of ``utils/nmap2leanmap.cpp``
(and its biased variant): per-texel slope moments with base roughness,
saved as float .npy planes (leanmap_1: E1,E2,1,1; leanmap_2:
E3,E4,E5,1 — the reference's EXR channel layout,
utils/nmap2leanmap.cpp:45-54), plus the lrep->params sanity roundtrip
(:57-76).

Usage: python -m dj_brdf_tpu.cli.nmap2leanmap [--base-roughness R] [--biased] nmap.png
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("nmap")
    ap.add_argument("--base-roughness", type=float, default=1e-5)
    ap.add_argument("--biased", action="store_true",
                    help="+25/+625 bias for unsigned storage "
                         "(nmap2leanmap_biased.cpp)")
    ap.add_argument("--out1", default="leanmap_1.npy")
    ap.add_argument("--out2", default="leanmap_2.npy")
    args = ap.parse_args(argv)

    import numpy as np
    from PIL import Image
    import jax.numpy as jnp
    from dj_brdf_tpu.lean import maps
    from dj_brdf_tpu.lean.lrep import lrep_to_params

    img = np.asarray(Image.open(args.nmap).convert("RGB"), np.float32) / 255.0
    # unpack (nmap2leanmap.cpp:36-39)
    nmap = jnp.stack([
        jnp.asarray(img[..., 0] * 2.0 - 1.0),
        jnp.asarray(img[..., 1] * 2.0 - 1.0),
        jnp.asarray(np.maximum(img[..., 2], 1e-3)),
    ], axis=-1)
    bias = maps.LEAN_BIAS if args.biased else 0.0
    lean = maps.nmap_to_lean(nmap, base_roughness=args.base_roughness,
                             bias=bias)

    # sanity roundtrip (check_lean_maps, nmap2leanmap.cpp:57-76)
    check = maps.unbias(lean, bias) if args.biased else lean
    params = lrep_to_params(check)
    assert np.isfinite(np.asarray(params.ax)).all()

    ones = np.ones(np.asarray(lean.E1).shape, np.float32)
    np.save(args.out1, np.stack([np.asarray(lean.E1), np.asarray(lean.E2),
                                 ones, ones], axis=-1))
    np.save(args.out2, np.stack([np.asarray(lean.E3), np.asarray(lean.E4),
                                 np.asarray(lean.E5), ones], axis=-1))
    print(f"wrote {args.out1} {args.out2}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
