"""Resumable extraction runs: per-partition lineage + metrics + idempotent
restart (north-rule X6; reference analog: MD5-of-input + output-existence
skip at /root/reference/app/dotsocr_service.py:253-348 and the S3
page-index resume scan at /root/reference/app/utils/storage.py:199-228).

Design (Iceberg semantics approximated on plain parquet — the container
ships no Iceberg catalog; on a real deployment swap the two writers for
``MERGE INTO`` on an Iceberg table and this module's logic is unchanged):

  * Work unit = **bucket**: ``pmod(xxhash64(doc_id), n_buckets)``. Stable
    across runs, independent of input file layout.
  * Output table: parquet partitioned by ``bucket``, written with dynamic
    partition overwrite — re-processing a bucket atomically replaces its
    directory, so a crash mid-bucket can never duplicate rows.
  * Lineage table: one row per completed bucket ``(bucket, run_id,
    n_docs, n_spans, n_failed_pages, completed_at_unix)``, appended AFTER
    the bucket's output commit. Crash between the two writes ⇒ the bucket
    is simply re-done (idempotent), never skipped-but-missing.
  * Resume = left-anti join of the bucket domain against the lineage
    table: completed buckets are pruned BEFORE any Python work runs — at
    the scan, via partition-pruning-friendly ``bucket IN (...)`` when the
    remaining set is small, else the anti-join.
  * Metrics: per-bucket page/doc counters live in the lineage rows;
    ``metrics_summary`` aggregates them (A4/A5 analog).

Buckets are processed in groups of ``buckets_per_commit`` to bound commit
frequency (one Spark job + one lineage append per group) — the knob
trades restart granularity against job-scheduling overhead, exactly like
Iceberg snapshot batching.
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.errors import AnalysisException

from . import pipeline

LINEAGE_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("run_id", T.StringType()),
    T.StructField("n_docs", T.LongType()),
    T.StructField("n_spans", T.LongType()),
    T.StructField("n_failed_pages", T.LongType()),
    T.StructField("n_fallback_pages", T.LongType()),
    T.StructField("completed_at_unix", T.DoubleType()),
])


def _lineage_path(base: str) -> str:
    return os.path.join(base, "_lineage")


def _output_path(base: str) -> str:
    return os.path.join(base, "output")


def completed_buckets(spark: SparkSession, base: str) -> set[int]:
    """Buckets already committed by any previous run (the resume scan)."""
    path = _lineage_path(base)
    try:
        rows = spark.read.schema(LINEAGE_SCHEMA).parquet(path) \
            .select("bucket").distinct().collect()
    except Exception:
        return set()
    return {r["bucket"] for r in rows}


def run_extraction(
    spark: SparkSession,
    docs: DataFrame,
    base: str,
    n_buckets: int = 64,
    buckets_per_commit: int = 16,
    mode: str = "fused",
    run_id: str | None = None,
    bucket_col: str | None = None,
) -> dict:
    """Run (or resume) a checkpointed extraction over ``docs``.

    Returns ``{"run_id", "processed_buckets", "skipped_buckets"}``.
    Safe to call again after any failure: completed buckets are never
    recomputed; a half-written bucket is overwritten atomically.

    ``bucket_col``: name of a PARTITION column on the input that
    already holds ``pmod(xxhash64(doc_id), n_buckets)`` — i.e. the
    input was written with ``partitionBy`` on a column computed by
    exactly that rule, the layout this module's own output uses. (NOT
    ``sinks.write_bucketed``: Hive ``bucketBy`` uses Murmur3 file
    bucketing with no partition column, which neither matches the pmod
    rule nor supports partition pruning.)
    When given, each commit group's filter is a partition predicate and
    the scan PRUNES to the group's files — G commit groups read the
    corpus once in total. Without it the bucket is computed as an
    expression, which no scan can prune, so every commit group rescans
    the full source: fine for a handful of groups, the dominant cost at
    100 TB with fine-grained commits (measured: each extra group adds a
    source scan, BENCH/BASELINE.md). The column MUST follow the pmod
    rule above — the resume domain, output partitioning, and lineage
    are all keyed on it.
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    done = completed_buckets(spark, base)
    todo = [b for b in range(n_buckets) if b not in done]

    if bucket_col is None:
        bucketed = docs.withColumn(
            "bucket",
            F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))

    for lo in range(0, len(todo), buckets_per_commit):
        group = todo[lo:lo + buckets_per_commit]
        if bucket_col is not None:
            # partition predicate: the scan prunes to the group's files
            chunk = docs.where(F.col(bucket_col).isin(group))
            # Layout guard: the fast path trusts that bucket_col follows
            # pmod(xxhash64(doc_id), n_buckets). If the input was written
            # with a different n_buckets or hash, this group would parse
            # the wrong docs, commit lineage for buckets it never
            # produced, and later groups' dynamic overwrites would wipe
            # the stray output partitions — silent doc loss behind a
            # clean lineage table. Recompute the rule over the pruned
            # files only (one cheap JVM-only job, no Python work) and
            # refuse to commit on any mismatch.
            stray = chunk.where(
                ~F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets))
                .cast("int").isin(group)).limit(1).count()
            if stray:
                raise ValueError(
                    f"bucket_col={bucket_col!r} does not follow "
                    f"pmod(xxhash64(doc_id), {n_buckets}): commit group "
                    f"{group} selected docs whose recomputed bucket lies "
                    "outside the group. The input's partition layout "
                    "disagrees with this run's (n_buckets, hash) — "
                    "refusing to commit rather than silently lose docs.")
            chunk = chunk.drop(bucket_col)
        else:
            chunk = bucketed.where(F.col("bucket").isin(group)).drop("bucket")
        out = pipeline.extract(chunk, mode=mode).withColumn(
            "bucket", F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
        )
        # 1) output commit: dynamic overwrite replaces exactly these buckets
        out.write.mode("overwrite").partitionBy("bucket") \
            .parquet(_output_path(base))
        # 2) lineage commit (after the data is durable). EVERY bucket in
        # the commit group gets a lineage row — an empty bucket writes no
        # output partition, so deriving lineage from written partitions
        # alone would leave it permanently "incomplete" and reprocessed on
        # every resume (never a no-op on sparse inputs). Left-join the
        # group domain against the written counts, defaulting to zeros.
        try:
            counts = (
                spark.read.parquet(_output_path(base))
                .where(F.col("bucket").isin(group))
                .groupBy("bucket")
                .agg(
                    F.count("*").alias("n_docs"),
                    F.sum("n_spans").cast("long").alias("n_spans"),
                    F.sum("n_failed").cast("long").alias("n_failed_pages"),
                    F.sum("n_fallback").cast("long").alias("n_fallback_pages"),
                )
            )
        except AnalysisException:
            # an all-empty commit group writes no part files at all, so
            # parquet schema inference fails (UNABLE_TO_INFER_SCHEMA /
            # PATH_NOT_FOUND) — every bucket gets zeros. Only analysis
            # errors mean "no output"; IO errors must surface, otherwise
            # a transient read failure would silently commit zero-count
            # lineage and mark unprocessed buckets complete.
            counts = spark.createDataFrame(
                [], "bucket int, n_docs long, n_spans long, "
                    "n_failed_pages long, n_fallback_pages long")
        group_df = spark.createDataFrame(
            [(int(b),) for b in group], "bucket int")
        lineage = (
            group_df.join(counts, "bucket", "left")
            .select(
                "bucket",
                F.lit(run_id).alias("run_id"),
                F.coalesce("n_docs", F.lit(0)).cast("long").alias("n_docs"),
                F.coalesce("n_spans", F.lit(0)).cast("long").alias("n_spans"),
                F.coalesce("n_failed_pages", F.lit(0)).cast("long")
                .alias("n_failed_pages"),
                F.coalesce("n_fallback_pages", F.lit(0)).cast("long")
                .alias("n_fallback_pages"),
                F.lit(time.time()).alias("completed_at_unix"),
            )
        )
        lineage.write.mode("append").parquet(_lineage_path(base))

    return {
        "run_id": run_id,
        "processed_buckets": len(todo),
        "skipped_buckets": len(done),
    }


def read_output(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.parquet(_output_path(base))


# --------------------------------------------------------------------------
# page-granular checkpointing (giant-document / scatter-mode resume)
# --------------------------------------------------------------------------
#
# The bucket-grain runner above recomputes a WHOLE bucket after a
# mid-bucket crash — fine for uniform corpora, wasteful when one
# document holds 10k pages (the measured scatter-win regime,
# tools/bench_scatter.py). This runner checkpoints at (bucket,
# page-range) grain, the Spark analog of the reference's page-index
# resume scan (/root/reference/app/utils/storage.py:199-228): a crash
# mid-giant-doc resumes at the first uncommitted page range of that
# document instead of its first page.
#
#   * Work unit = (bucket, prange): bucket = pmod(xxhash64(doc_id), B),
#     prange = page_no // pages_per_range. Stable across runs.
#   * Output = PARSED PAGE grain (schemas.PARSED_PAGE + the unit
#     columns), parquet partitioned by (bucket, prange) with dynamic
#     overwrite — same atomic-replace guarantee as the bucket runner.
#   * The unit domain is data-derived (bucket b has ranges
#     0..max(ceil(n_pages/r))-1 over its docs) — a bounded
#     n_buckets-row collect, recomputed identically on every resume.
#   * Document assembly (``assemble_from_page_checkpoint``) is the
#     scatter pipeline's stage 2 (pure-JVM ``assemble_documents``) over
#     the completed page table.

PAGE_LINEAGE_SCHEMA = T.StructType([
    T.StructField("bucket", T.IntegerType()),
    T.StructField("prange", T.IntegerType()),
    T.StructField("run_id", T.StringType()),
    T.StructField("n_pages", T.LongType()),
    T.StructField("n_failed_pages", T.LongType()),
    T.StructField("n_fallback_pages", T.LongType()),
    T.StructField("completed_at_unix", T.DoubleType()),
])

#: encodes (bucket, prange) into one long for an IN-list filter; no
#: corpus has 2^40 pages per document, so the encoding never collides
_PR_ENC = 1 << 40


def _page_lineage_path(base: str) -> str:
    return os.path.join(base, "_page_lineage")


def _pages_path(base: str) -> str:
    return os.path.join(base, "pages")


def completed_page_units(spark: SparkSession, base: str) -> set[tuple[int, int]]:
    """(bucket, prange) units committed by any previous run."""
    try:
        rows = spark.read.schema(PAGE_LINEAGE_SCHEMA) \
            .parquet(_page_lineage_path(base)) \
            .select("bucket", "prange").distinct().collect()
    except Exception:
        return set()
    return {(r["bucket"], r["prange"]) for r in rows}


def _page_grain(docs: DataFrame, n_buckets: int, pages_per_range: int) -> DataFrame:
    """Explode the input to page grain with the (bucket, prange) unit key."""
    return (
        docs.withColumn(
            "bucket",
            F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"))
        .select("doc_id", "bucket", F.explode("pages").alias("page"))
        .select("doc_id", "bucket", "page.*")
        .withColumn(
            "prange",
            F.floor(F.col("page_no") / F.lit(pages_per_range)).cast("int"))
    )


def run_extraction_paged(
    spark: SparkSession,
    docs: DataFrame,
    base: str,
    n_buckets: int = 64,
    pages_per_range: int = 8,
    units_per_commit: int = 16,
    shuffle_pages: bool = True,
    run_id: str | None = None,
) -> dict:
    """Run (or resume) a page-granular checkpointed parse over ``docs``.

    Returns ``{"run_id", "processed_units", "skipped_units"}``. Safe to
    call again after any failure: committed page ranges are never
    re-parsed — including the completed ranges of a document whose later
    ranges crashed (the giant-doc case the bucket runner recomputes).
    """
    run_id = run_id or uuid.uuid4().hex[:12]
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

    # data-derived unit domain: one row per bucket → bounded collect.
    # Ranges are derived from the MAX page_no actually present (not from
    # size(pages)): the two agree on the canonical 0-based contiguous
    # numbering, but an externally-supplied table with 1-based or gapped
    # page_no would otherwise put its last page(s) in a prange outside
    # the domain — never selected, yet the unit lineage still commits,
    # i.e. pages silently dropped with no resumable trace.
    dom = (
        docs.select(
            F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int")
            .alias("bucket"),
            F.when(
                F.size("pages") > 0,
                F.floor(F.array_max("pages.page_no") / F.lit(pages_per_range))
                .cast("int") + 1,
            ).otherwise(F.lit(0)).alias("npr"),
            F.when(
                F.size("pages") > 0, F.array_min("pages.page_no")
            ).otherwise(F.lit(0)).alias("min_pno"),
        )
        .groupBy("bucket")
        .agg(F.max("npr").alias("npr"), F.min("min_pno").alias("min_pno"))
        .collect()
    )
    # array_max covers 1-based/gapped numbering UPWARD, but a negative
    # page_no would get a negative prange that is never in the domain:
    # the page is silently never parsed while its bucket's units all
    # commit lineage — the same silent-drop mode the array_max bound
    # exists to prevent, in the other direction. Fail fast instead; the
    # min comes free in the same bounded domain collect.
    neg = sorted(r["bucket"] for r in dom
                 if r["min_pno"] is not None and r["min_pno"] < 0)
    if neg:
        raise ValueError(
            f"negative page_no in bucket(s) {neg}: pages with page_no < 0 "
            "would fall outside the (bucket, prange) unit domain and be "
            "silently skipped. Renumber pages to be >= 0 before the "
            "paged runner.")
    all_units = {(r["bucket"], p) for r in dom for p in range(r["npr"])}
    done = completed_page_units(spark, base) & all_units
    todo = sorted(all_units - done)

    pages = _page_grain(docs, n_buckets, pages_per_range)
    unit_key = F.col("bucket").cast("long") * _PR_ENC + F.col("prange")

    for lo in range(0, len(todo), units_per_commit):
        group = todo[lo:lo + units_per_commit]
        sel = pages.where(
            unit_key.isin([b * _PR_ENC + p for b, p in group]))
        parsed = pipeline.parse_pages_exploded(
            sel.drop("bucket", "prange"), shuffle_pages=shuffle_pages)
        out = parsed.withColumn(
            "bucket",
            F.pmod(F.xxhash64("doc_id"), F.lit(n_buckets)).cast("int"),
        ).withColumn(
            "prange",
            F.floor(F.col("page_no") / F.lit(pages_per_range)).cast("int"))
        out.write.mode("overwrite").partitionBy("bucket", "prange") \
            .parquet(_pages_path(base))

        try:
            counts = (
                spark.read.parquet(_pages_path(base))
                .where(unit_key.isin([b * _PR_ENC + p for b, p in group]))
                .groupBy("bucket", "prange")
                .agg(
                    F.count("*").alias("n_pages"),
                    F.sum((F.col("status") == "failed").cast("long"))
                    .alias("n_failed_pages"),
                    F.sum((F.col("status") == "fallback").cast("long"))
                    .alias("n_fallback_pages"),
                )
            )
        except AnalysisException:
            counts = spark.createDataFrame(
                [], "bucket int, prange int, n_pages long, "
                    "n_failed_pages long, n_fallback_pages long")
        group_df = spark.createDataFrame(
            [(int(b), int(p)) for b, p in group], "bucket int, prange int")
        lineage = (
            group_df.join(counts, ["bucket", "prange"], "left")
            .select(
                "bucket", "prange",
                F.lit(run_id).alias("run_id"),
                F.coalesce("n_pages", F.lit(0)).cast("long").alias("n_pages"),
                F.coalesce("n_failed_pages", F.lit(0)).cast("long")
                .alias("n_failed_pages"),
                F.coalesce("n_fallback_pages", F.lit(0)).cast("long")
                .alias("n_fallback_pages"),
                F.lit(time.time()).alias("completed_at_unix"),
            )
        )
        lineage.write.mode("append").parquet(_page_lineage_path(base))

    return {
        "run_id": run_id,
        "processed_units": len(todo),
        "skipped_units": len(done),
    }


def read_page_output(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.parquet(_pages_path(base))


def read_page_lineage(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.schema(PAGE_LINEAGE_SCHEMA) \
        .parquet(_page_lineage_path(base))


def assemble_from_page_checkpoint(spark: SparkSession, base: str) -> DataFrame:
    """Stage 2 of the scatter pipeline over the completed page table:
    pure-JVM document reassembly (identical combiner to
    ``pipeline.extract_scatter``)."""
    return pipeline.assemble_documents(
        read_page_output(spark, base)
        .select("doc_id", "page_no", "status", "md", "md_nohf", "spans"))


def page_metrics_summary(spark: SparkSession, base: str) -> DataFrame:
    """Run-level metrics rollup from the PAGE lineage table — the
    page-granular runner's analog of :func:`metrics_summary`."""
    return (
        read_page_lineage(spark, base)
        .groupBy("run_id")
        .agg(
            F.count("*").alias("n_units"),
            F.sum("n_pages").alias("n_pages"),
            F.sum("n_failed_pages").alias("n_failed_pages"),
            F.sum("n_fallback_pages").alias("n_fallback_pages"),
        )
    )


def read_lineage(spark: SparkSession, base: str) -> DataFrame:
    return spark.read.schema(LINEAGE_SCHEMA).parquet(_lineage_path(base))


def metrics_summary(spark: SparkSession, base: str) -> DataFrame:
    """Run-level metrics rollup from the lineage table (A4/A5 analog:
    per-run counters the reference keeps in task stats,
    /root/reference/app/utils/executor/stats.py:22-41)."""
    return (
        read_lineage(spark, base)
        .groupBy("run_id")
        .agg(
            F.count("*").alias("n_buckets"),
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_spans").alias("n_spans"),
            F.sum("n_failed_pages").alias("n_failed_pages"),
            F.sum("n_fallback_pages").alias("n_fallback_pages"),
        )
    )
