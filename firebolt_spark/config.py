"""YAML pipeline configuration — parse, default, validate.

Keeps the reference's config surface (reference config/config.go:16-26,
node/node.go:49-59): ``application``, ``source {name, params}``, ``nodes``
— a tree of ``{id, name, workers, buffersize, params, children,
error_handler, disabled, discard_on_full_buffer}`` — plus
``shutdowntimeout``. Environment variables in the YAML text are expanded
before parsing (config.go:48-49 os.ExpandEnv).

Validation mirrors config.go:73-210:
- unique node ids across the tree (config.go:142-152);
- every node/source type registered (config.go:119-125, 154-160);
- source.produces == each root's consumes (config.go:127-137);
- parent.produces == each child's consumes (config.go:162-171);
- error_handler consumes the EventError schema and has no children and
  no error_handler of its own (config.go:192-209);
- defaults: id=name, workers=1, buffersize=1 (config.go:219-237);
- ``disabled: true`` prunes the node and its whole subtree
  (node/node.go:77-80).

``workers``/``buffersize`` are accepted for config compatibility but are
advisory in Spark: parallelism comes from partitions, buffering from the
micro-batch pull model (SURVEY §2.7 T1/T2).
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Any

import yaml

from firebolt_spark.errors import EVENT_ERROR_SCHEMA
from firebolt_spark.registry import Registry, get_registry, schemas_compatible


class ConfigError(ValueError):
    """Invalid pipeline configuration (the rebuild's analogue of the
    reference's config.Read error returns)."""


@dataclass
class NodeConfig:
    name: str
    id: str
    params: dict[str, Any] = field(default_factory=dict)
    workers: int = 1
    buffersize: int = 1
    children: list["NodeConfig"] = field(default_factory=list)
    error_handler: "NodeConfig | None" = None
    disabled: bool = False
    discard_on_full_buffer: bool = False


@dataclass
class SourceConfig:
    name: str
    params: dict[str, Any] = field(default_factory=dict)


@dataclass
class PipelineConfig:
    application: str
    source: SourceConfig
    nodes: list[NodeConfig]
    shutdown_timeout: int = 10


def _parse_node(raw: dict[str, Any]) -> NodeConfig:
    if not isinstance(raw, dict) or "name" not in raw:
        raise ConfigError(f"node entry must be a mapping with a 'name': {raw!r}")
    node = NodeConfig(
        name=str(raw["name"]),
        id=str(raw.get("id") or raw["name"]),  # default id=name (config.go:219-221)
        params=dict(raw.get("params") or {}),
        workers=int(raw.get("workers") or 1),
        buffersize=int(raw.get("buffersize") or 1),
        disabled=bool(raw.get("disabled", False)),
        discard_on_full_buffer=bool(raw.get("discard_on_full_buffer", False)),
    )
    for child in raw.get("children") or []:
        node.children.append(_parse_node(child))
    if raw.get("error_handler"):
        node.error_handler = _parse_node(raw["error_handler"])
    return node


def _prune_disabled(nodes: list[NodeConfig]) -> list[NodeConfig]:
    """disabled: true removes the node and its subtree (node.go:77-80)."""
    kept = []
    for n in nodes:
        if n.disabled:
            continue
        n.children = _prune_disabled(n.children)
        kept.append(n)
    return kept


def parse(text: str) -> PipelineConfig:
    """YAML text → PipelineConfig with env expansion and defaults."""
    raw = yaml.safe_load(os.path.expandvars(text))
    if not isinstance(raw, dict):
        raise ConfigError("config must be a YAML mapping")
    if "source" not in raw or not isinstance(raw["source"], dict):
        raise ConfigError("config requires a 'source' mapping")
    source = SourceConfig(
        name=str(raw["source"].get("name", "")),
        params=dict(raw["source"].get("params") or {}),
    )
    if not source.name:
        raise ConfigError("source requires a 'name'")
    nodes = [_parse_node(n) for n in raw.get("nodes") or []]
    nodes = _prune_disabled(nodes)
    return PipelineConfig(
        application=str(raw.get("application", "firebolt-spark")),
        source=source,
        nodes=nodes,
        shutdown_timeout=int(raw.get("shutdowntimeout") or 10),
    )


def read(path: str) -> PipelineConfig:
    with open(path, encoding="utf-8") as f:
        return parse(f.read())


def _walk(nodes: list[NodeConfig]):
    for n in nodes:
        yield n
        yield from _walk(n.children)
        if n.error_handler is not None:
            yield n.error_handler


def validate(cfg: PipelineConfig, registry: Registry | None = None) -> None:
    """Static validation before any execution (config.go:73-210)."""
    reg = registry or get_registry()

    # unique ids (config.go:142-152)
    seen: set[str] = set()
    for n in _walk(cfg.nodes):
        if n.id in seen:
            raise ConfigError(f"duplicate node id '{n.id}'")
        seen.add(n.id)

    # registered types
    if not reg.has(cfg.source.name):
        raise ConfigError(f"source type '{cfg.source.name}' is not registered")
    src_type = reg.get(cfg.source.name)
    if not src_type.is_source:
        raise ConfigError(f"'{cfg.source.name}' is not a source type")
    for n in _walk(cfg.nodes):
        if not reg.has(n.name):
            raise ConfigError(f"node type '{n.name}' is not registered")
        if reg.get(n.name).is_source:
            raise ConfigError(f"source type '{n.name}' used as a node")

    # source → roots edge compatibility (config.go:127-137)
    for root in cfg.nodes:
        child = reg.get(root.name)
        if not schemas_compatible(src_type.produces, child.consumes):
            raise ConfigError(
                f"source '{cfg.source.name}' produces a schema incompatible "
                f"with root node '{root.id}'"
            )

    # parent → child compatibility (config.go:162-171) + handler rules
    def check(n: NodeConfig) -> None:
        nt = reg.get(n.name)
        for child in n.children:
            ct = reg.get(child.name)
            if not schemas_compatible(nt.produces, ct.consumes):
                raise ConfigError(
                    f"node '{n.id}' produces a schema incompatible with "
                    f"child '{child.id}'"
                )
            check(child)
        if n.error_handler is not None:
            eh = n.error_handler
            et = reg.get(eh.name)
            # error handlers consume exactly the EventError envelope
            # (config.go:205-207) and are structural leaves (config.go:192-203)
            if et.consumes is not None and not schemas_compatible(
                EVENT_ERROR_SCHEMA, et.consumes
            ):
                raise ConfigError(
                    f"error_handler '{eh.id}' must consume the EventError schema"
                )
            if eh.children:
                raise ConfigError(f"error_handler '{eh.id}' may not have children")
            if eh.error_handler is not None:
                raise ConfigError(
                    f"error_handler '{eh.id}' may not have its own error_handler"
                )

    for root in cfg.nodes:
        check(root)
