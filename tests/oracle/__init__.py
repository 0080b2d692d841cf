"""C++ oracle: compile the reference dj_brdf.h into a dump harness and
parse its golden values. The reference is included read-only via -I;
nothing from it is copied into this repo.
"""

from __future__ import annotations

import os
import shutil
import subprocess

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_REF = os.environ.get("DJ_BRDF_REFERENCE", "/root/reference")
_BIN = os.path.join(_HERE, "build", "harness")


def available() -> bool:
    return shutil.which("g++") is not None and os.path.exists(
        os.path.join(_REF, "dj_brdf.h"))


def build(x64: bool = False) -> str:
    """Compile once per source mtime. ``x64=True`` builds the
    reference with DJB_USE_DOUBLE_PRECISION (dj_brdf.h:44-48) into a
    separate binary for float64 parity tests."""
    src = os.path.join(_HERE, "harness.cpp")
    out = _BIN + ("_x64" if x64 else "")
    os.makedirs(os.path.dirname(out), exist_ok=True)
    if (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(src)):
        cmd = ["g++", "-O2", f"-I{_REF}"]
        if x64:
            cmd.append("-DDJB_USE_DOUBLE_PRECISION=1")
        subprocess.run(cmd + ["-o", out, src, "-lm"],
                       check=True, capture_output=True)
    return out


def run(*args: str, x64: bool = False) -> str:
    return subprocess.run([build(x64), *map(str, args)], check=True,
                          capture_output=True, text=True).stdout


def run_floats(*args: str, x64: bool = False) -> np.ndarray:
    """Parse whitespace-separated float rows."""
    out = run(*args, x64=x64)
    rows = [[float(x) for x in line.split()] for line in out.splitlines() if line]
    return np.asarray(rows)


def run_sections(*args: str, x64: bool = False) -> dict:
    """Parse 'name count' sections of one value-row per line plus
    'name value' scalar lines."""
    out = run(*args, x64=x64)
    sections: dict = {}
    lines = out.splitlines()
    k = 0
    while k < len(lines):
        parts = lines[k].split()
        k += 1
        if not parts:
            continue
        name = parts[0]
        if len(parts) == 2 and parts[1].lstrip("+-").isdigit():
            n = int(parts[1])
            vals = [[float(x) for x in lines[k + j].split()] for j in range(n)]
            k += n
            arr = np.asarray(vals)
            sections[name] = arr[:, 0] if arr.shape[1] == 1 else arr
        elif len(parts) == 2:
            sections[name] = float(parts[1])
        else:
            sections[name] = np.asarray([float(x) for x in parts[1:]])
    return sections


# -- the deterministic grids mirrored from harness.cpp ----------------

def grid_dirs(nt: int = 6, np_: int = 6) -> np.ndarray:
    """All (nt*np_) directions of the harness grid, float32 math to
    match the reference's float_t."""
    it = np.arange(nt, dtype=np.float32)
    ip = np.arange(np_, dtype=np.float32)
    theta = (it + 0.5) / nt * np.float32(np.pi / 2) * np.float32(0.98)
    phi = ip / np_ * np.float32(2 * np.pi)
    T, P = np.meshgrid(theta, phi, indexing="ij")
    s = np.sin(T)
    return np.stack([s * np.cos(P), s * np.sin(P), np.cos(T)],
                    axis=-1).reshape(-1, 3).astype(np.float32)


def evalp_grid_pairs(nt: int = 6, np_: int = 6):
    """(i, o) pairs in harness dump order: outer loops over i, inner
    over o."""
    d = grid_dirs(nt, np_)
    n = d.shape[0]
    i = np.repeat(d, n, axis=0)
    o = np.tile(d, (n, 1))
    return i, o


def sample_grid(nu: int = 8, nt: int = 6):
    """(u1, u2, o) triples in harness 'sample' dump order."""
    u = ((np.arange(nu) + 0.5) / nu).astype(np.float32)
    theta = ((np.arange(nt) + 0.5) / nt * (np.pi / 2) * 0.98).astype(np.float32)
    o_dirs = np.stack([np.sin(theta), np.zeros_like(theta), np.cos(theta)],
                      axis=-1)
    u1 = np.repeat(u, nu * nt)
    u2 = np.tile(np.repeat(u, nt), nu)
    o = np.tile(o_dirs, (nu * nu, 1))
    return u1, u2, o
