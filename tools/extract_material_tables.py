"""Extract the SGD and ABC material parameter tables from the reference
header into a .npz consumed by dj_brdf_tpu.models.{sgd,abc_model}.

These are *measured fit parameters* for the 100 MERL materials —
published data credited in the reference to Bagher/Soler/Holzschuch
(SGD, EGSR 2012) and Kronander et al. (ABC); the reference embeds them
as C initializer lists (dj_brdf.h:3312-3413 and 3505-3606). This
script parses the numbers out; no code is copied.

Usage: python tools/extract_material_tables.py [ref_header] [out_npz]
"""

from __future__ import annotations

import re
import sys

import numpy as np

REF = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/dj_brdf.h"
OUT = sys.argv[2] if len(sys.argv) > 2 else "dj_brdf_tpu/models/data/material_tables.npz"

SGD_FIELDS = ["rhoD", "rhoS", "alpha", "p", "f0", "f1", "kap", "lambda_",
              "c", "k", "theta0", "error"]


def parse_rows(text: str) -> list[list]:
    """Parse `{ "name", ..., { a, b, c }, ... },` initializer rows."""
    rows = []
    depth = 0
    start = None
    for m in re.finditer(r"[{}]", text):
        if m.group() == "{":
            depth += 1
            if depth == 1:
                start = m.end()
        else:
            depth -= 1
            if depth == 0 and start is not None:
                rows.append(text[start:m.start()])
                start = None
    out = []
    for row in rows:
        names = re.findall(r'"([^"]*)"', row)
        triples = re.findall(r"\{([^{}]*)\}", row)
        nums_flat = re.sub(r'"[^"]*"', "", re.sub(r"\{[^{}]*\}", "", row))
        scalars = [float(x) for x in re.findall(
            r"[-+]?[\d.]+(?:[eE][-+]?\d+)?", nums_flat)]
        vecs = [[float(x) for x in re.findall(
            r"[-+]?[\d.]+(?:[eE][-+]?\d+)?", t)] for t in triples]
        out.append((names, vecs, scalars))
    return out


def extract_block(src: str, marker: str) -> str:
    i = src.index(marker)
    i = src.index("{", i)
    depth = 0
    for j in range(i, len(src)):
        if src[j] == "{":
            depth += 1
        elif src[j] == "}":
            depth -= 1
            if depth == 0:
                return src[i + 1:j]
    raise ValueError("unbalanced braces")


def main() -> None:
    src = open(REF).read()

    sgd_rows = parse_rows(extract_block(src, "const sgd::data sgd::s_data[]"))
    assert len(sgd_rows) == 100, len(sgd_rows)
    sgd_names, sgd_other, sgd_params = [], [], []
    for names, vecs, scalars in sgd_rows:
        assert len(names) == 2 and len(vecs) == 12 and not scalars, (names, len(vecs))
        sgd_names.append(names[0])
        sgd_other.append(names[1])
        sgd_params.append(vecs)
    sgd_arr = np.asarray(sgd_params, dtype=np.float64)  # (100, 12, 3)

    abc_rows = parse_rows(extract_block(src, "const abc::data abc::s_data[]"))
    assert len(abc_rows) == 100, len(abc_rows)
    abc_names, abc_kd, abc_a, abc_bci = [], [], [], []
    for names, vecs, scalars in abc_rows:
        assert len(names) == 1 and len(vecs) == 2 and len(scalars) == 3
        abc_names.append(names[0])
        abc_kd.append(vecs[0])
        abc_a.append(vecs[1])
        abc_bci.append(scalars)  # B, C, ior
    abc_kd = np.asarray(abc_kd, dtype=np.float64)
    abc_a = np.asarray(abc_a, dtype=np.float64)
    abc_bci = np.asarray(abc_bci, dtype=np.float64)

    np.savez_compressed(
        OUT,
        sgd_names=np.asarray(sgd_names),
        sgd_other_names=np.asarray(sgd_other),
        sgd_params=sgd_arr,
        sgd_fields=np.asarray(SGD_FIELDS),
        abc_names=np.asarray(abc_names),
        abc_kd=abc_kd,
        abc_a=abc_a,
        abc_b=abc_bci[:, 0],
        abc_c=abc_bci[:, 1],
        abc_ior=abc_bci[:, 2],
    )
    print(f"wrote {OUT}: sgd {sgd_arr.shape}, abc {abc_kd.shape}")


if __name__ == "__main__":
    main()
