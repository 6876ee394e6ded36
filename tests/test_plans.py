"""Physical-plan quality gates: the scale story is enforced, not hoped
for. These tests parse `explain` output and fail on plan regressions —
an exchange sneaking into the zero-shuffle path, a lost broadcast, or a
scan that stops pruning columns."""

import re

from pyspark.sql import functions as F

from dots_ocr_spark import pipeline
from dots_ocr_spark import queries as Q

SF = "/root/testdata/sf0.001"


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_fused_extract_has_zero_exchanges(spark, tmp_path):
    path = str(tmp_path / "docs")
    pipeline.generate_input(spark, 50, partitions=2).write.parquet(path)
    plan = _plan(pipeline.extract_fused(spark.read.parquet(path)))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan
    # column pruning reaches the scan: only doc_id + pages are read
    m = re.search(r"ReadSchema: struct<([^>]*(?:<[^>]*>)?[^>]*)", plan)
    assert m and "spans" not in m.group(0), plan


def test_flagship_corpus_extract_is_zero_shuffle(spark):
    """The driver's extract_spans (multi-page generator → fused extract →
    explode) must stay scan → project → mapInPandas → explode with NO
    exchange, and the parquet scan must read only the columns the
    generator uses (doc_id, text)."""
    for df in (Q.q_extract_spans(spark, SF), Q.q_extract_wordgrain(spark, SF),
               Q.q_extract_toc(spark, SF), Q.q_extract_twocol(spark, SF),
               Q.q_extract_rich(spark, SF),
               Q.q_extract_cleaner_probe(spark, SF)):
        plan = _plan(df)
        assert "Exchange" not in plan, plan
        assert "MapInPandas" in plan
        m = re.search(r"ReadSchema: [^\n]*", plan)
        assert m and "doc_id" in m.group(0) and "text" in m.group(0), plan
        assert "lang" not in m.group(0) and "source" not in m.group(0), plan


def test_scan_prunes_and_pushes_down(spark):
    df = Q.q_token_stats(spark, SF)
    plan = _plan(df)
    assert "Exchange" not in plan  # pure projection
    assert "text" in plan and "lang" not in plan  # pruned to used columns
    # a filtered query pushes its predicate into the parquet scan
    d = spark.read.parquet(f"{SF}/documents.parquet").where(
        F.col("n_chars") > 300).select("doc_id")
    fplan = _plan(d)
    assert "PushedFilters" in fplan and "GreaterThan(n_chars,300)" in fplan, fplan


def test_dim_joins_broadcast(spark):
    plan = _plan(Q.q_revenue_by_nation(spark, SF))
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_topk_broadcasts_queries_not_corpus(spark):
    from dots_ocr_spark import similarity as S
    plan = _plan(S.embed_topk(spark, SF))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan


def test_bucketed_output_joins_without_exchange(spark, tmp_path):
    """Bucketed output tables must let downstream doc_id joins and
    aggregations run with ZERO exchanges (the co-located-join scale
    pattern; broadcast disabled to prove it's the bucketing)."""
    from dots_ocr_spark.sinks import write_bucketed

    out = pipeline.extract(pipeline.generate_input(spark, 120, partitions=4))
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        write_bucketed(out.select("doc_id", "n_spans", "status"),
                       "t_meta_b", n_buckets=8)
        write_bucketed(out.select("doc_id", "markdown"), "t_md_b", n_buckets=8)
        j = spark.table("t_meta_b").join(spark.table("t_md_b"), "doc_id")
        assert "Exchange" not in _plan(j), _plan(j)
        assert j.count() == 120
        g = spark.table("t_meta_b").groupBy("doc_id").agg(
            F.sum("n_spans").alias("s"))
        assert "Exchange" not in _plan(g), _plan(g)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_meta_b")
        spark.sql("DROP TABLE IF EXISTS t_md_b")


def test_training_corpus_composition_plan(spark):
    """The registered training_corpus is the materialize-per-leg shape:
    the source corpus is scanned ONCE (into the bucketed scratch
    projection) and the composition joins read only the co-bucketed
    verdict tables — zero exchanges, zero re-reads of documents.parquet,
    sort-merge (not broadcast: verdict tables are doc-grain at corpus
    scale, so the plan must not depend on them fitting in memory)."""
    df = Q.q_training_corpus(spark, "/root/testdata/sf0.001")
    plan = _plan(df)
    assert "Exchange" not in plan, plan
    assert "documents.parquet" not in plan, plan
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    # the one scan of the source table prunes to exactly the columns the
    # scratch projection carries
    base = Q._read(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text", "n_chars")
    bplan = _plan(base)
    assert "lang" not in bplan and "source" not in bplan, bplan


def test_aggregation_is_partial_before_shuffle(spark):
    """Map-side combine: the pricing rollup must partial-aggregate before
    its exchange (shuffle carries 6 group rows per partition, not 6k
    lineitems), and the date predicate must reach the parquet scan."""
    plan = _plan(Q.q_pricing_summary(spark, SF))
    assert "partial_sum" in plan, plan
    # the exchange's child in the plan tree is the partial HashAggregate
    assert re.search(r"Exchange \(\d+\)\s*\n\s*\+- HashAggregate", plan), plan
    assert "LessThanOrEqual(l_shipdate" in plan, plan


def test_winnow_registered_leg_is_zero_shuffle(spark):
    """The registered winnowing query must be the mapInPandas shape
    (document-local selection, no exchange anywhere); the exploded
    window demo is the one allowed to shuffle per-character rows."""
    plan = _plan(Q.QUERIES["winnow_fingerprints"](spark, SF))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan, plan
    m = re.search(r"ReadSchema: [^\n]*", plan)
    assert m and "lang" not in m.group(0) and "source" not in m.group(0), plan
