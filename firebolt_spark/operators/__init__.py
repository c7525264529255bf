"""Built-in operator (node) types.

The rebuild's analogue of the reference's built-in node registrations
(reference executor/noderegistrar.go:16-39): kafkaconsumer/syslogparser/
kafkaproducer/errorkafkaproducer/elasticsearch — plus the declarative
core operators (filter/project/fanout/json) that the reference models as
hand-written Go nodes, and the LLM-data-pipeline extensions.
"""

from __future__ import annotations

from firebolt_spark.registry import Registry


def register_builtin_node_types(registry: Registry) -> None:
    from firebolt_spark.operators import core, sync
    from firebolt_spark.sinks import register_sink_node_types

    from firebolt_spark.errors import EVENT_ERROR_SCHEMA

    registry.register_node_type("filter", core.FilterNode, None, None)
    registry.register_node_type("project", core.ProjectNode, None, None)
    registry.register_node_type("fanout", core.FanoutNode, None, None)
    registry.register_node_type("raise_when", core.RaiseWhenNode, None, None)
    registry.register_node_type("json_parse", core.JsonParseNode, None, None)
    registry.register_node_type("syslog_parser", core.SyslogParserNode, None, None)
    registry.register_node_type("json_builder", core.JsonBuilderNode, None, None)
    registry.register_node_type("doc_builder", core.DocBuilderNode, None, None)
    registry.register_node_type("sql", core.SqlNode, None, None)
    registry.register_node_type("python_map", sync.PythonMapNode, None, None)
    registry.register_node_type("grouped_map", sync.GroupedPandasNode, None, None)

    from firebolt_spark.operators import joins

    registry.register_node_type("asof_join", joins.AsofJoinNode, None, None)
    registry.register_node_type("range_join", joins.RangeJoinNode, None, None)
    register_sink_node_types(registry)

    from firebolt_spark.operators.llm_nodes import register_llm_node_types

    register_llm_node_types(registry)
