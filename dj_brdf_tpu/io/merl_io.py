"""MERL binary file I/O (host side).

Format (reference merl::merl, dj_brdf.h:963-983): three little-endian
int32 dims followed by dims[0]*dims[1]*dims[2]*3 float64 samples,
channel-major (R plane, G plane, B plane). The fast native parser in
:mod:`dj_brdf_tpu.io.native` is used when built; this numpy fallback
is always available.
"""

from __future__ import annotations

import numpy as np

from dj_brdf_tpu.models.merl import RES_THETA_H, RES_THETA_D, RES_PHI_D


def load_merl(path: str, dtype=np.float32, use_native: bool = True) -> np.ndarray:
    """Load a MERL .binary file -> (3, 90, 90, 180) raw (unscaled) array.
    Uses the native djbio parser when built; numpy fallback otherwise."""
    if use_native and dtype == np.float32:
        try:
            from dj_brdf_tpu.io import native
            if native.available():
                return native.load_merl(path)
        except Exception:
            pass
    with open(path, "rb") as f:
        dims = np.fromfile(f, dtype="<i4", count=3)
        n = int(dims[0]) * int(dims[1]) * int(dims[2])
        if n <= 0:
            raise ValueError(f"failed to read MERL header of {path}")
        data = np.fromfile(f, dtype="<f8", count=3 * n)
    if data.size != 3 * n:
        raise ValueError(f"truncated MERL file {path}")
    if n != RES_THETA_H * RES_THETA_D * (RES_PHI_D // 2):
        raise ValueError(f"unexpected MERL dims {tuple(dims)} in {path}")
    table = data.reshape(3, RES_THETA_H, RES_THETA_D,
                         RES_PHI_D // 2).astype(dtype)
    neg = int((table < 0).any(axis=0).sum())
    if neg:
        # DJB_LOG parity: the reference warns per below-horizon lookup
        # at eval time (dj_brdf.h:1016-1021); we report the count once
        # at load (eval is jitted)
        from dj_brdf_tpu.config import logger
        logger.debug("merl %s: %d below-horizon bins (negative values "
                     "evaluate to zero)", path, neg)
    return table


def save_merl(path: str, table: np.ndarray) -> None:
    """Write a (3, 90, 90, 180) raw table as a MERL .binary file
    (used to bake synthetic oracle datasets)."""
    table = np.asarray(table, dtype=np.float64)
    assert table.shape == (3, RES_THETA_H, RES_THETA_D, RES_PHI_D // 2), table.shape
    with open(path, "wb") as f:
        np.asarray([RES_THETA_H, RES_THETA_D, RES_PHI_D // 2], dtype="<i4").tofile(f)
        table.astype("<f8").tofile(f)
