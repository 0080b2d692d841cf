"""Displacement map -> normal map converter — equivalent of
``utils/dmap2nmap.cpp``: central-difference slopes, normal packed into
RGB8 (utils/dmap2nmap.cpp:13-44).

Usage: python -m dj_brdf_tpu.cli.dmap2nmap [--scale S] [--clamp_to_border] dmap.png
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("dmap")
    ap.add_argument("--scale", type=float, default=0.01)
    ap.add_argument("--clamp_to_border", action="store_true")
    ap.add_argument("-o", "--output", default="nmap.png")
    args = ap.parse_args(argv)

    import numpy as np
    from PIL import Image
    import jax.numpy as jnp
    from dj_brdf_tpu.lean import maps

    img = np.asarray(Image.open(args.dmap).convert("L"), np.float32) / 255.0
    nmap = maps.dmap_to_nmap(jnp.asarray(img), scale=args.scale,
                             clamp_to_border=args.clamp_to_border)
    # pack like the reference (:38-42): nx,ny -> [0,1], nz direct
    packed = np.stack([
        np.asarray(0.5 * nmap[..., 0] + 0.5),
        np.asarray(0.5 * nmap[..., 1] + 0.5),
        np.asarray(nmap[..., 2]),
    ], axis=-1)
    Image.fromarray((packed * 255).astype(np.uint8)).save(args.output)
    print(f"wrote {args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
