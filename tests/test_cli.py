"""CLI surface: validate/run/explain over the example configs."""

from __future__ import annotations

from firebolt_spark.__main__ import main


def test_validate_examples():
    for cfg in (
        "logging",
        "kafkatokafka",
        "corpus_dedup",
        "corpus_curation",
        "sql_lakehouse",
        "ann_search",
        "training_mix",
        "incremental_ingest",
        "data_selection",
    ):
        assert main(["validate", f"/root/repo/examples/{cfg}.yaml"]) == 0


def test_validate_missing_file_exits_2(capsys):
    assert main(["validate", "/nonexistent.yaml"]) == 2
    assert "error:" in capsys.readouterr().err


def test_validate_bad_config_exits_2(tmp_path, capsys):
    p = tmp_path / "bad.yaml"
    p.write_text("source: {name: bogus}\nnodes: []\n")
    assert main(["validate", str(p)]) == 2
    assert "not registered" in capsys.readouterr().err


def test_run_batch_example(spark, capsys):
    assert main(["run", "/root/repo/examples/kafkatokafka.yaml", "--show", "2"]) == 0
    out = capsys.readouterr().out
    assert "=== out (" in out and "rows)" in out


def test_run_sql_lakehouse_example_end_to_end(spark, capsys, tmp_path):
    """SqlNode + error handler + idempotent lakehouse sink through the
    CLI; run TWICE — the second run must replace, not append (the
    idempotence contract the example demonstrates)."""
    import shutil

    cfg = open("/root/repo/examples/sql_lakehouse.yaml").read().replace(
        "/tmp/firebolt_spark_demo/user_event_rollup", str(tmp_path / "tbl")
    )
    p = tmp_path / "pipeline.yaml"
    p.write_text(cfg)
    assert main(["run", str(p), "--show", "2"]) == 0
    out = capsys.readouterr().out
    assert "=== table (" in out and "=== error_topic (" in out
    first = spark.read.parquet(str(tmp_path / "tbl")).count()
    assert first > 0
    assert main(["run", str(p), "--show", "0"]) == 0
    assert spark.read.parquet(str(tmp_path / "tbl")).count() == first
    shutil.rmtree(tmp_path / "tbl", ignore_errors=True)


def test_explain_example(spark, capsys):
    assert main(["explain", "/root/repo/examples/logging.yaml", "--node", "docs"]) == 0
    out = capsys.readouterr().out
    assert "Physical Plan" in out
