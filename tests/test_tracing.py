"""Observability spans (the tracing.py analog of the reference's
OpenTelemetry wrapper): nesting, CPU/wall capture, exception recording,
Spark job harvesting, and the parquet metrics table."""

import json

import pytest

from dots_ocr_spark.tracing import Tracer


def test_span_nesting_and_attributes():
    tr = Tracer()
    with tr.span("outer", job="j1") as outer:
        with tr.span("inner") as inner:
            inner.set_attribute("rows", 5)
    assert [s.name for s in tr.spans] == ["inner", "outer"]
    by_name = {s.name: s for s in tr.spans}
    assert by_name["inner"].parent_id == by_name["outer"].span_id
    assert by_name["outer"].parent_id is None
    assert by_name["outer"].attributes == {"job": "j1"}
    assert by_name["inner"].attributes == {"rows": 5}
    assert all(s.wall_sec >= 0 and s.status == "ok" for s in tr.spans)


def test_span_records_exception_and_reraises():
    tr = Tracer()
    with pytest.raises(ValueError, match="boom"):
        with tr.span("failing"):
            raise ValueError("boom")
    (s,) = tr.spans
    assert s.status == "error"
    assert "boom" in s.error


def test_spark_span_harvests_job_stats(spark, tmp_path):
    tr = Tracer(spark)
    with tr.span("count-job", table="range") as s:
        spark.range(10_000).selectExpr("sum(id)").collect()
    assert s.n_jobs >= 1
    assert s.n_tasks >= 1

    out = str(tmp_path / "metrics")
    tr.write_metrics(out)
    got = spark.read.parquet(out).collect()
    assert len(got) == 1
    row = got[0]
    assert row["name"] == "count-job"
    assert row["status"] == "ok"
    assert json.loads(row["attributes"]) == {"table": "range"}
    assert row["n_jobs"] >= 1


def test_traced_decorator():
    tr = Tracer()

    @tr.traced("my-op")
    def work(x):
        return x * 2

    assert work(21) == 42
    assert tr.spans[0].name == "my-op"
