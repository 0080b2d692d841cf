"""ctypes bindings for the native djbio data plane.

Builds ``io/native/libdjbio.so`` on first use (g++, OpenMP) and exposes
the native MERL/UTIA parsers and LEAN map builders. Every entry point
has a pure-numpy fallback in :mod:`dj_brdf_tpu.io.merl_io` /
``utia_io`` / :mod:`dj_brdf_tpu.lean.maps`, so the package works
without a toolchain; the native path is the production loader.
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import threading

import numpy as np

_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SO = os.path.join(_DIR, "libdjbio.so")
_lock = threading.Lock()
_lib = None


def available() -> bool:
    return os.path.exists(_SO) or shutil.which("g++") is not None


def _load():
    global _lib
    with _lock:
        if _lib is not None:
            return _lib
        src = os.path.join(_DIR, "djbio.cpp")
        if (not os.path.exists(_SO)
                or os.path.getmtime(_SO) < os.path.getmtime(src)):
            subprocess.run(["make", "-C", _DIR], check=True,
                           capture_output=True)
        lib = ctypes.CDLL(_SO)
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        lib.djbio_load_merl.argtypes = [ctypes.c_char_p, f32p]
        lib.djbio_load_merl.restype = ctypes.c_int
        lib.djbio_load_utia.argtypes = [ctypes.c_char_p, f32p]
        lib.djbio_load_utia.restype = ctypes.c_int
        lib.djbio_dmap_to_nmap.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                           ctypes.c_float, ctypes.c_int, f32p]
        lib.djbio_nmap_to_lean.argtypes = [f32p, ctypes.c_int, ctypes.c_int,
                                           ctypes.c_float, ctypes.c_float,
                                           f32p]
        lib.djbio_lean_mip_reduce.argtypes = [f32p, ctypes.c_int,
                                              ctypes.c_int, f32p]
        f64p = np.ctypeslib.ndpointer(np.float64, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        lib.djbio_build_alias.argtypes = [f64p, ctypes.c_long, f32p, i32p]
        lib.djbio_build_alias.restype = ctypes.c_int
        lib.djbio_hdr_size.argtypes = [ctypes.c_char_p,
                                       ctypes.POINTER(ctypes.c_int32),
                                       ctypes.POINTER(ctypes.c_int32)]
        lib.djbio_hdr_size.restype = ctypes.c_int
        lib.djbio_load_hdr.argtypes = [ctypes.c_char_p, f32p]
        lib.djbio_load_hdr.restype = ctypes.c_int
        _lib = lib
        return lib


def load_merl(path: str) -> np.ndarray:
    """(3, 90, 90, 180) raw float32 table via the native parser."""
    out = np.empty(3 * 90 * 90 * 180, np.float32)
    rc = _load().djbio_load_merl(path.encode(), out)
    if rc != 0:
        raise ValueError(f"djbio_load_merl({path!r}) failed: {rc}")
    return out.reshape(3, 90, 90, 180)


def load_utia(path: str) -> np.ndarray:
    """(3, 6, 48, 6, 48) normalized float32 table via the native parser.
    A positive return from the native call is the clamped-negative
    sample count (DJB_LOG parity with utia::normalize,
    dj_brdf.h:1162-1177)."""
    out = np.empty(3 * 6 * 48 * 6 * 48, np.float32)
    rc = _load().djbio_load_utia(path.encode(), out)
    if rc < 0:
        raise ValueError(f"djbio_load_utia({path!r}) failed: {rc}")
    if rc > 0:
        from dj_brdf_tpu.config import logger
        logger.debug("utia %s: clamped %d negative samples", path, rc)
    return out.reshape(3, 6, 48, 6, 48)


def dmap_to_nmap(dmap: np.ndarray, scale: float = 0.01,
                 clamp_to_border: bool = False) -> np.ndarray:
    dmap = np.ascontiguousarray(dmap, np.float32)
    h, w = dmap.shape
    out = np.empty((h, w, 3), np.float32)
    _load().djbio_dmap_to_nmap(dmap, h, w, scale, int(clamp_to_border),
                               out.reshape(-1))
    return out


def nmap_to_lean(nmap: np.ndarray, base_roughness: float = 1e-5,
                 bias: float = 0.0) -> np.ndarray:
    """Returns the 5 moment planes stacked as (5, h, w)."""
    nmap = np.ascontiguousarray(nmap, np.float32)
    h, w = nmap.shape[:2]
    out = np.empty((5, h, w), np.float32)
    _load().djbio_nmap_to_lean(nmap.reshape(-1), h, w, base_roughness, bias,
                               out.reshape(-1))
    return out


def lean_mip_reduce(lean: np.ndarray) -> np.ndarray:
    """(5, h, w) -> (5, h/2, w/2)."""
    lean = np.ascontiguousarray(lean, np.float32)
    _, h, w = lean.shape
    out = np.empty((5, h // 2, w // 2), np.float32)
    _load().djbio_lean_mip_reduce(lean.reshape(-1), h, w, out.reshape(-1))
    return out


def build_alias(mass: np.ndarray):
    """Walker/Vose alias table of an unnormalized probability vector:
    returns (prob (n,) f32, alias (n,) i32). O(n) in native code — the
    2M-bin table of a 1024x2048 environment map builds in milliseconds."""
    mass = np.ascontiguousarray(mass, np.float64).reshape(-1)
    prob = np.empty(mass.size, np.float32)
    alias = np.empty(mass.size, np.int32)
    rc = _load().djbio_build_alias(mass, mass.size, prob, alias)
    if rc != 0:
        raise ValueError(f"djbio_build_alias failed: {rc}")
    return prob, alias


def load_hdr(path: str) -> np.ndarray:
    """Decode a Radiance .hdr image to (h, w, 3) float32 radiance
    (RLE and flat scanlines; EXPOSURE headers divided out)."""
    import ctypes as _ct
    lib = _load()
    h = _ct.c_int32()
    w = _ct.c_int32()
    rc = lib.djbio_hdr_size(path.encode(), _ct.byref(h), _ct.byref(w))
    if rc != 0:
        raise ValueError(f"djbio_hdr_size({path!r}) failed: {rc}")
    out = np.empty(h.value * w.value * 3, np.float32)
    rc = lib.djbio_load_hdr(path.encode(), out)
    if rc != 0:
        raise ValueError(f"djbio_load_hdr({path!r}) failed: {rc}")
    return out.reshape(h.value, w.value, 3)
