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
