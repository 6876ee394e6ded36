#!/usr/bin/env python
"""spark-submit entry point for the INCREMENTAL (Structured Streaming)
pipelines: new parquet files land in a directory; each invocation drains
the backlog with ``trigger=availableNow`` and exits (cron-style
incremental batch), or tails indefinitely with ``--follow``. File-source
checkpointing makes re-invocation exactly-once — the streaming analog of
the batch job's lineage resume (jobs/run_extract.py).

Three pipelines over the landing zone:

  extract        interleaved documents → fused extraction (zero-shuffle
                 stateless mapInPandas per micro-batch)
  dedup-extract  stateful exact-dedup (min doc_id wins) in front of the
                 parse — one survivor per distinct page content, ever
  corpus         (doc_id, text) documents → the training-corpus
                 composition: stateful LSH near-dedup + repetition +
                 quality gates; prints the surviving doc count

    python tools/build_pyfiles.py
    spark-submit --py-files dist/dots_ocr_spark.zip \
        jobs/run_stream.py extract --input /landing --output /run_base
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("pipeline", choices=["extract", "dedup-extract", "corpus"])
    ap.add_argument("--input", required=True,
                    help="landing-zone dir of parquet files")
    ap.add_argument("--output", required=True,
                    help="run base dir (sinks + stream checkpoints)")
    ap.add_argument("--follow", action="store_true",
                    help="tail indefinitely instead of drain-and-exit")
    ap.add_argument("--max-files-per-trigger", type=int, default=None)
    ap.add_argument("--timeout", type=int, default=3600,
                    help="drain-mode max seconds before surfacing a stall")
    args = ap.parse_args()
    if args.follow and args.pipeline == "corpus":
        ap.error("--follow is drain-mode only for corpus (two coordinated "
                 "queries); re-invoke per landing batch instead")
    if args.max_files_per_trigger is not None and args.pipeline == "corpus":
        ap.error("--max-files-per-trigger is not supported for corpus "
                 "(its two coordinated availableNow queries drain whatever "
                 "has landed)")

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.appName(f"dots-ocr-spark-stream-{args.pipeline}")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("WARN")

    t0 = time.perf_counter()
    res: dict = {"pipeline": args.pipeline, "input": args.input,
                 "output": args.output}

    from pyspark.errors import AnalysisException

    if args.pipeline == "corpus":
        from dots_ocr_spark.streaming.corpus import (
            stream_training_corpus,
            stream_training_corpus_survivors,
        )

        stream_training_corpus(spark, args.input, args.output,
                               timeout=args.timeout)
        try:
            res["surviving_docs"] = stream_training_corpus_survivors(
                spark, args.output).count()
        except AnalysisException:
            # nothing has landed yet: the drain wrote no sink files
            res["surviving_docs"] = 0
    else:
        from dots_ocr_spark.streaming import (
            stream_dedup_extract,
            stream_extract,
        )

        fn = (stream_dedup_extract if args.pipeline == "dedup-extract"
              else stream_extract)
        q = fn(
            spark, args.input,
            os.path.join(args.output, "output"),
            os.path.join(args.output, "ckpt"),
            available_now=not args.follow,
            max_files_per_trigger=args.max_files_per_trigger,
        )
        if args.follow:
            q.awaitTermination()          # runs until externally stopped
        elif not q.awaitTermination(args.timeout):
            q.stop()
            raise TimeoutError(
                f"stream did not drain within {args.timeout}s; sink is "
                "incomplete — re-invoke to resume from the checkpoint")
        try:
            res["output_rows"] = spark.read.parquet(
                os.path.join(args.output, "output")).count()
        except AnalysisException:
            # empty landing zone: the drain produced no output files yet
            res["output_rows"] = 0

    res["wall_sec"] = round(time.perf_counter() - t0, 2)
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
