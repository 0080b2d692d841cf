"""UTIA binary file I/O (host side).

Format (reference utia::utia, dj_brdf.h:1039-1059): raw float64 array
of 3 planes x 6 theta_i x 48 phi_i x 6 theta_v x 48 phi_v. Loading
clamps negatives to zero and applies the 1/140 scale, matching
``utia::normalize`` (dj_brdf.h:1162-1177).
"""

from __future__ import annotations

import numpy as np

from dj_brdf_tpu.models.utia import NTI, NPI, NTV, NPV

_COUNT = 3 * NTI * NPI * NTV * NPV


def load_utia(path: str, dtype=np.float32, use_native: bool = True) -> np.ndarray:
    """Load a UTIA binary -> normalized (3, 6, 48, 6, 48) array.
    Uses the native djbio parser when built; numpy fallback otherwise."""
    if use_native and dtype == np.float32:
        try:
            from dj_brdf_tpu.io import native
            if native.available():
                return native.load_utia(path)
        except Exception:
            pass
    data = np.fromfile(path, dtype="<f8", count=_COUNT)
    if data.size != _COUNT:
        raise ValueError(f"truncated UTIA file {path}")
    neg = int((data < 0).sum())
    if neg:
        # DJB_LOG parity with utia::normalize's negative-value clamp
        # warning (dj_brdf.h:1162-1177)
        from dj_brdf_tpu.config import logger
        logger.debug("utia %s: clamped %d negative samples", path, neg)
    data = np.maximum(data, 0.0) * (1.0 / 140.0)
    return data.reshape(3, NTI, NPI, NTV, NPV).astype(dtype)


def save_utia(path: str, table: np.ndarray) -> None:
    """Write a raw (3, 6, 48, 6, 48) table (pre-normalization values)."""
    table = np.asarray(table, dtype="<f8")
    assert table.shape == (3, NTI, NPI, NTV, NPV), table.shape
    table.tofile(path)
