"""The UDF escape hatch — arbitrary per-event Python with error capture.

The reference's node interface is "arbitrary user Go code per event"
(reference node/node.go:24-33). The rebuild's equivalent is a
``mapInPandas``-backed operator that runs a user Python function per row
in Arrow batches (the fast Python path) while enforcing the engine's
per-row error protocol: an exception inside the function does NOT kill
the Spark task (unlike a naive UDF) — it becomes an ``_error`` struct on
that row, routed to the node's error_handler exactly like the
reference's ``(nil, err)`` return (node/node.go:178-196).

Return-value contract of the user function (mirrors SyncNode/FanoutNode):
- a dict            → one output row (pass/transform),
- None              → the row is filtered (the nil,nil protocol),
- a list of dicts   → fanout (0..N rows; empty list ≡ filter),
- raise             → error: the row is emitted with only ``_error`` set.

Async nodes (reference node/node.go:36-44) need no separate surface:
async-vs-sync is an execution detail invisible in results (SURVEY §2.3
F3); Arrow batching already amortizes I/O the way firebolt's async
callbacks do.
"""

from __future__ import annotations

from typing import Any, Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructField, StructType

from firebolt_spark.errors import ERROR_STRUCT_TYPE, normalize_error

ERROR_COL = "_error"
ERROR_COL_FIELD = StructField(ERROR_COL, ERROR_STRUCT_TYPE, True)


class PythonMapNode:
    """Per-row Python transform with captured errors.

    Params: fn — Callable[[dict], dict | list[dict] | None]; schema —
    output payload schema (StructType or DDL string). The output
    DataFrame has the declared payload columns plus ``_error``; rows that
    errored carry NULL payload + the normalized error struct.
    """

    def __init__(self, params: dict[str, Any]):
        self.fn: Callable[[dict], Any] = params["fn"]
        schema = params["schema"]
        if isinstance(schema, str):
            from pyspark.sql.types import _parse_datatype_string

            schema = _parse_datatype_string(schema)
        self.schema: StructType = schema

    def transform(self, df: DataFrame) -> DataFrame:
        fn = self.fn
        out_fields = [f.name for f in self.schema.fields]
        full_schema = StructType(
            self.schema.fields + [ERROR_COL_FIELD]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows: list[dict] = []
                for rec in pdf.to_dict(orient="records"):
                    try:
                        res = fn(rec)
                    except Exception as exc:  # captured, never task-fatal
                        code, msg, info = normalize_error(exc)
                        err_row = {f: None for f in out_fields}
                        err_row[ERROR_COL] = {
                            "code": code,
                            "message": msg,
                            "errorinfo": info,
                        }
                        rows.append(err_row)
                        continue
                    if res is None:
                        continue  # filter-by-None protocol
                    for item in res if isinstance(res, list) else [res]:
                        row = {f: item.get(f) for f in out_fields}
                        row[ERROR_COL] = None
                        rows.append(row)
                yield pd.DataFrame(rows, columns=out_fields + [ERROR_COL])

        return df.mapInPandas(run, schema=full_schema)


class GroupedPandasNode:
    """Grouped custom aggregation/transform — ``applyInPandas`` with the
    engine's error protocol at group granularity.

    Params: fn — Callable[[tuple, pd.DataFrame], pd.DataFrame] (the key
    and the group's rows → output rows); keys — group-by columns;
    schema — output payload schema (DDL or StructType). A raising group
    emits one ``_error`` row (key columns preserved when present in the
    output schema) instead of failing the task — the grouped analogue of
    the reference's per-event (nil, err).

    Use for genuinely order/state-dependent group logic (EMA, per-group
    model fits) that SQL windows can't express cleanly; everything else
    belongs in groupBy().agg.
    """

    def __init__(self, params: dict[str, Any]):
        self.fn: Callable[[tuple, pd.DataFrame], pd.DataFrame] = params["fn"]
        self.keys: list[str] = list(params["keys"])
        schema = params["schema"]
        if isinstance(schema, str):
            from pyspark.sql.types import _parse_datatype_string

            schema = _parse_datatype_string(schema)
        self.schema: StructType = schema

    def transform(self, df: DataFrame) -> DataFrame:
        fn = self.fn
        keys = self.keys
        out_fields = [f.name for f in self.schema.fields]
        full_schema = StructType(self.schema.fields + [ERROR_COL_FIELD])

        def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            try:
                out = fn(key, pdf)
            except Exception as exc:
                code, msg, info = normalize_error(exc)
                row = {f: None for f in out_fields}
                for k, v in zip(keys, key):
                    if k in row:
                        row[k] = v
                row[ERROR_COL] = {"code": code, "message": msg, "errorinfo": info}
                return pd.DataFrame([row], columns=out_fields + [ERROR_COL])
            out = out.reindex(columns=out_fields)
            out[ERROR_COL] = None
            return out

        return df.groupBy(*keys).applyInPandas(run, schema=full_schema)
