"""Operator registry — name → factory + declared payload schemas.

Mirrors the reference's node registry (reference node/registry.go:14-102):
each node *type* registers a factory plus what it ``consumes`` and
``produces``; sources declare only ``produces`` (registry.go:95-102).
Where the reference compares ``reflect.Type`` at config-load, we compare
declared payload StructTypes (names + types, nullability ignored) —
failures surface at plan build, before any job runs, exactly like
firebolt's startup validation and Spark's analyzer.

``consumes``/``produces`` of ``None`` means "any" (the escape hatch for
generic operators whose schema is config-dependent; their output schema
is still statically known to Spark once built).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable

from pyspark.sql.types import StructType


def schemas_compatible(produces: StructType | None, consumes: StructType | None) -> bool:
    """Edge compatibility: parent's produces vs child's consumes.

    Mirrors config.go:162-171 (exact type equality); we compare field
    names and dataTypes, ignoring nullability and field order.
    """
    if produces is None or consumes is None:
        return True
    p = {f.name: f.dataType for f in produces.fields}
    c = {f.name: f.dataType for f in consumes.fields}
    return p == c


@dataclass(frozen=True)
class NodeType:
    name: str
    factory: Callable[..., Any]
    consumes: StructType | None
    produces: StructType | None
    is_source: bool = False


class Registry:
    """Name → NodeType map (reference node/registry.go:14-30)."""

    def __init__(self) -> None:
        self._types: dict[str, NodeType] = {}

    def register_node_type(
        self,
        name: str,
        factory: Callable[..., Any],
        consumes: StructType | None,
        produces: StructType | None,
    ) -> None:
        """RegisterNodeType (registry.go:83-91). Re-registration replaces."""
        self._types[name] = NodeType(name, factory, consumes, produces)

    def register_source_type(
        self,
        name: str,
        factory: Callable[..., Any],
        produces: StructType | None,
    ) -> None:
        """RegisterSourceType (registry.go:95-102)."""
        self._types[name] = NodeType(name, factory, None, produces, is_source=True)

    def get(self, name: str) -> NodeType:
        """Unknown type is a hard error (registry.go panics; we raise)."""
        if name not in self._types:
            raise KeyError(f"node type '{name}' is not registered")
        return self._types[name]

    def has(self, name: str) -> bool:
        return name in self._types

    def names(self) -> list[str]:
        return sorted(self._types)


_REGISTRY: Registry | None = None


def get_registry() -> Registry:
    """Singleton accessor (registry.go:17-23); built-ins auto-registered."""
    global _REGISTRY
    if _REGISTRY is None:
        _REGISTRY = Registry()
        # Late import to avoid a cycle: builtins need the Registry class.
        from firebolt_spark.operators import register_builtin_node_types
        from firebolt_spark.sources import register_builtin_source_types

        register_builtin_node_types(_REGISTRY)
        register_builtin_source_types(_REGISTRY)
    return _REGISTRY
