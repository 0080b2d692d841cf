"""Tiny pytree-dataclass helper.

Every model/parameter container in the framework is a frozen dataclass
registered as a JAX pytree, so it can flow through ``jit``/``vmap``/
``grad``/``pjit`` directly. Fields marked with :func:`static_field` are
hashable aux data (resolution ints, flags) that participate in the jit
cache key instead of being traced.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax


def static_field(**kwargs: Any) -> dataclasses.Field:
    """A dataclass field treated as static (non-traced) pytree metadata."""
    metadata = dict(kwargs.pop("metadata", {}))
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type) -> type:
    """Decorator: frozen dataclass registered as a JAX pytree node."""
    cls = dataclasses.dataclass(frozen=True)(cls)
    data_fields = []
    meta_fields = []
    for f in dataclasses.fields(cls):
        if f.metadata.get("static", False):
            meta_fields.append(f.name)
        else:
            data_fields.append(f.name)
    jax.tree_util.register_dataclass(
        cls, data_fields=data_fields, meta_fields=meta_fields
    )

    def replace(self, **updates):
        return dataclasses.replace(self, **updates)

    cls.replace = replace
    return cls
