"""Config parsing + validation — mirrors the reference's config test
matrix (reference config/config_test.go:20-199: dup ids, unregistered
types, error-handler constraints, defaults, disabled pruning)."""

from __future__ import annotations

import pytest

from firebolt_spark import config as cfg
from firebolt_spark.config import ConfigError
from firebolt_spark.registry import get_registry

BASE = """
application: test
source:
  name: parquet
  params: {path: /tmp/in.parquet}
nodes:
  - name: filter
    id: keep
    params: {predicate: "1 = 1"}
    children:
      - name: project
        params: {exprs: ["1 AS one"]}
"""


def test_parse_defaults():
    c = cfg.parse(BASE)
    assert c.application == "test"
    assert c.shutdown_timeout == 10
    node = c.nodes[0]
    assert node.id == "keep"
    assert node.workers == 1 and node.buffersize == 1
    # id defaults to name (config.go:219-221)
    assert node.children[0].id == "project"


def test_validate_ok():
    cfg.validate(cfg.parse(BASE), get_registry())


def test_env_expansion(monkeypatch):
    monkeypatch.setenv("FB_PRED", "x > 5")
    c = cfg.parse(
        """
source: {name: parquet, params: {path: /tmp/x}}
nodes:
  - {name: filter, id: a, params: {predicate: "$FB_PRED"}}
"""
    )
    assert c.nodes[0].params["predicate"] == "x > 5"


def test_disabled_prunes_subtree():
    c = cfg.parse(
        BASE.replace("id: keep", "id: keep\n    disabled: true")
    )
    assert c.nodes == []


def test_typed_edge_incompatibility_rejected():
    """Declared consumes/produces schemas are statically checked on
    every edge (config.go:162-171 reflect.Type equality)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    from firebolt_spark.registry import Registry

    reg = Registry()
    str_schema = StructType([StructField("s", StringType())])
    long_schema = StructType([StructField("n", LongType())])

    class _Passthrough:
        def __init__(self, params):
            pass

        def transform(self, df):
            return df

    class _Src:
        def __init__(self, params):
            pass

        def load(self, spark):
            raise NotImplementedError

    reg.register_source_type("str_source", _Src, str_schema)
    reg.register_node_type("wants_str", _Passthrough, str_schema, str_schema)
    reg.register_node_type("wants_long", _Passthrough, long_schema, long_schema)

    ok = cfg.parse(
        """
source: {name: str_source}
nodes:
  - {name: wants_str, id: a}
"""
    )
    cfg.validate(ok, reg)

    with pytest.raises(ConfigError, match="incompatible"):
        cfg.validate(
            cfg.parse(
                """
source: {name: str_source}
nodes:
  - {name: wants_long, id: a}
"""
            ),
            reg,
        )
    with pytest.raises(ConfigError, match="incompatible"):
        cfg.validate(
            cfg.parse(
                """
source: {name: str_source}
nodes:
  - name: wants_str
    id: a
    children: [{name: wants_long, id: b}]
"""
            ),
            reg,
        )


@pytest.mark.parametrize(
    "mutation, message",
    [
        ("dup_ids", "duplicate node id"),
        ("unknown_node", "not registered"),
        ("unknown_source", "not registered"),
        ("handler_children", "may not have children"),
        ("handler_handler", "may not have its own error_handler"),
        ("source_as_node", "used as a node"),
    ],
)
def test_validation_failures(mutation, message):
    yamls = {
        "dup_ids": """
source: {name: parquet, params: {path: /tmp/x}}
nodes:
  - {name: filter, id: a, params: {predicate: "1=1"}}
  - {name: filter, id: a, params: {predicate: "1=1"}}
""",
        "unknown_node": """
source: {name: parquet, params: {path: /tmp/x}}
nodes:
  - {name: bogus, id: a}
""",
        "unknown_source": """
source: {name: bogus}
nodes: []
""",
        "handler_children": """
source: {name: parquet, params: {path: /tmp/x}}
nodes:
  - name: raise_when
    id: a
    params: {predicate: "1=1"}
    error_handler:
      name: error_kafka_producer
      id: eh
      children: [{name: filter, id: c, params: {predicate: "1=1"}}]
""",
        "handler_handler": """
source: {name: parquet, params: {path: /tmp/x}}
nodes:
  - name: raise_when
    id: a
    params: {predicate: "1=1"}
    error_handler:
      name: error_kafka_producer
      id: eh
      error_handler: {name: error_kafka_producer, id: eh2}
""",
        "source_as_node": """
source: {name: parquet, params: {path: /tmp/x}}
nodes:
  - {name: parquet, id: a, params: {path: /tmp/y}}
""",
    }
    with pytest.raises(ConfigError, match=message):
        cfg.validate(cfg.parse(yamls[mutation]), get_registry())


def test_round11_family_node_types_registered():
    """Every round-11 sampling/mixing/stats node type resolves through
    the built-in registry (a missing register_node_type line would
    otherwise only surface when a user's YAML fails)."""
    reg = get_registry()
    for name in (
        "stratified_sample",
        "token_budget_mix",
        "snapshot_diff",
        "interleave_strata",
        "weighted_sample",
        "gopher_quality",
    ):
        assert reg.get(name).factory is not None, name
