"""Radiance RGBE (.hdr) image IO — numpy fallback path.

The reference's environment emitters are HDR lat-long images
(mitsuba/README:21-23); host image decode there is CImg/Mitsuba
territory. The production decoder is native
(:func:`dj_brdf_tpu.io.native.load_hdr`, io/native/djbio.cpp); this
module is the pure-numpy fallback plus a minimal encoder used by
tests and tools (flat scanlines — every Radiance reader accepts them).
"""

from __future__ import annotations

import numpy as np


def _read_header(f):
    magic = f.readline()
    if not magic.startswith(b"#?"):
        raise ValueError("not a Radiance file (missing #? magic)")
    exposure = 1.0
    while True:
        line = f.readline()
        if not line:
            raise ValueError("truncated .hdr header")
        if line in (b"\n", b"\r\n"):
            break
        if line.startswith(b"EXPOSURE="):
            e = float(line[9:])
            if e > 0:
                exposure *= e
        if line.startswith(b"FORMAT=") and b"rgbe" not in line:
            raise ValueError(f"unsupported .hdr format: {line!r}")
    res = f.readline().split()
    if len(res) != 4 or res[0] != b"-Y" or res[2] != b"+X":
        raise ValueError(f"unsupported .hdr resolution line: {res!r}")
    return int(res[1]), int(res[3]), exposure


def _decode_rgbe(rgbe, inv_exposure):
    rgbe = rgbe.astype(np.int32)
    scale = np.where(rgbe[..., 3] == 0, 0.0,
                     np.ldexp(1.0, rgbe[..., 3] - 136)) * inv_exposure
    return (rgbe[..., :3] * scale[..., None]).astype(np.float32)


def load_hdr(path: str) -> np.ndarray:
    """Decode a .hdr file to (h, w, 3) float32 radiance."""
    with open(path, "rb") as f:
        h, w, exposure = _read_header(f)
        data = f.read()
    out = np.empty((h, w, 4), np.uint8)
    pos = 0
    for j in range(h):
        if (pos + 4 <= len(data) and data[pos] == 2 and data[pos + 1] == 2
                and (data[pos + 2] << 8 | data[pos + 3]) == w
                and 8 <= w < 32768):
            pos += 4
            for comp in range(4):
                i = 0
                while i < w:
                    count = data[pos]
                    pos += 1
                    if count > 128:  # run
                        out[j, i:i + count - 128, comp] = data[pos]
                        pos += 1
                        i += count - 128
                    else:            # literal span
                        out[j, i:i + count, comp] = np.frombuffer(
                            data, np.uint8, count, pos)
                        pos += count
                        i += count
        else:
            # flat / old-style scanline with (1,1,1,n) repeats
            i = 0
            shift = 0
            while i < w:
                px = np.frombuffer(data, np.uint8, 4, pos)
                pos += 4
                if px[0] == 1 and px[1] == 1 and px[2] == 1 and i > 0:
                    count = int(px[3]) << shift
                    out[j, i:i + count] = out[j, i - 1]
                    i += count
                    shift += 8
                else:
                    out[j, i] = px
                    i += 1
                    shift = 0
    return _decode_rgbe(out, 1.0 / exposure)


def write_hdr(path: str, img: np.ndarray) -> None:
    """Encode (h, w, 3) float radiance as .hdr (flat scanlines)."""
    img = np.asarray(img, np.float32)
    h, w = img.shape[:2]
    m = img.max(-1)
    exp = np.where(m > 1e-32, np.floor(np.log2(np.maximum(m, 1e-32))) + 1, 0)
    # max channel's mantissa lands in [128, 256): full 8-bit precision
    mant = np.clip(img * np.exp2(8.0 - exp)[..., None], 0, 255)
    rgbe = np.empty((h, w, 4), np.uint8)
    rgbe[..., :3] = mant.astype(np.uint8)
    rgbe[..., 3] = np.where(m > 1e-32, exp + 128, 0).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(b"#?RADIANCE\nFORMAT=32-bit_rle_rgbe\n\n")
        f.write(f"-Y {h} +X {w}\n".encode())
        f.write(rgbe.tobytes())


def load_radiance_any(path: str) -> np.ndarray:
    """Load an (h, w, 3) radiance image from .npy or .hdr, preferring
    the native decoder for .hdr (CLI front door for --envmap)."""
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    from dj_brdf_tpu.io import native
    try:
        return native.load_hdr(path)
    except Exception:
        return load_hdr(path)
