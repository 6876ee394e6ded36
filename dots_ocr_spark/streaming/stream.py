"""Structured Streaming front-end for the extraction pipeline.

The reference's job queue (app/utils/executor/job_executor_pool.py:240-341)
is work management, not event-time streaming — there are no watermarks or
event-time windows anywhere in it. Its Spark-native equivalent is a file
stream: new parquet files of interleaved documents land in a directory,
each micro-batch runs the SAME zero-shuffle fused extraction
(`pipeline.extract_fused` works unchanged on a streaming DataFrame
because it is a stateless mapInPandas), and results append to the output
sink with exactly-once file-source checkpointing — the streaming analog
of the batch lineage table in checkpoint.py.

``trigger=availableNow`` drains the backlog and stops (the pattern for
incremental batch over a landing zone); omit it for a long-running
tailer.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.streaming import StreamingQuery

from .. import pipeline, schemas


def stream_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Tail ``input_dir`` for parquet files of interleaved documents and
    stream extraction results to ``output_dir`` (parquet, append)."""
    reader = (
        spark.readStream.schema(schemas.INPUT)
        .format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.load(input_dir)

    out = pipeline.extract_fused(docs)

    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _keep_min_doc_id(key, pdf_iter, state):
    """applyInPandasWithState body for streaming exact dedup: one state
    row per content hash. The FIRST micro-batch carrying the hash emits
    exactly one row — the min doc_id across the whole micro-batch, the
    batch A8 keep-first rule, so the winner is DETERMINISTIC across
    runs (a bare ``dropDuplicates`` keeps whichever partition's row
    wins, which flakes any stream-vs-batch parity compare). Later
    batches emit nothing for a seen hash."""
    best = None
    for pdf in pdf_iter:
        if state.exists or len(pdf) == 0:
            continue
        ids = pdf["doc_id"].tolist()
        j = min(range(len(ids)), key=ids.__getitem__)
        cand = pdf.iloc[[j]]
        if best is None or cand["doc_id"].iloc[0] < best["doc_id"].iloc[0]:
            best = cand
    if state.exists or best is None:
        return
    state.update((1,))
    yield best.drop(columns=["content_md5"])


def stream_dedup_extract(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Streaming exact-dedup in front of extraction: exactly one
    document per distinct page content survives, incrementally.
    A stateful per-hash group (``applyInPandasWithState``, backed by
    the state store and the exactly-once checkpoint) drops a document
    whose identical content already streamed through ANY earlier batch
    before the (expensive) parse runs — the streaming complement of
    the batch ``dedup_exact``/``dedup_survivors`` pipeline. Semantics
    vs batch A8: within a micro-batch the min doc_id wins
    (deterministic, equal to the batch keep-first rule); across batches
    the earlier arrival wins (the incremental contract — a later batch
    cannot retract an already-emitted row).

    State note for long-running tailers: the unwatermarked state keeps
    one row per distinct hash forever — that IS exact global dedup (the
    training-data contract: a dup is a dup no matter how old). Cap
    memory on an unbounded stream by compacting the corpus periodically
    or switching to a watermarked variant when the product only needs
    near-time dedup.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = (
        spark.readStream.schema(schemas.INPUT)
        .format("parquet")
    )
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.load(input_dir)

    deduped = (
        docs.withColumn("content_md5", F.md5(F.to_json("pages")))
        .groupBy("content_md5")
        .applyInPandasWithState(
            _keep_min_doc_id,
            outputStructType=schemas.INPUT,
            stateStructType="seen int",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    out = pipeline.extract_fused(deduped)

    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
