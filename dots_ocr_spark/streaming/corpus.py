"""Streaming training-corpus capstone — the incremental mirror of the
batch ``queries.q_training_corpus`` composition: exact + LSH near-dedup
(the stateful :mod:`neardedup` operator) ∩ repetition gate ∩ quality
gate, over a landing zone of (doc_id, text) parquet files.

Two streaming queries over the same source:

  1. :func:`neardedup.stream_neardedup` — the stateful dedup verdicts
     (cross-micro-batch state, earlier arrival wins);
  2. :func:`stream_quality_gates` — a STATELESS projection computing
     the per-document repetition + quality gate booleans with the same
     decimal-routed algebra as the batch legs (no aggregation, so it
     needs no watermark and emits exactly one row per document).

``stream_training_corpus_survivors`` folds both sinks: a document is in
the incremental corpus iff no dedup band dropped it AND both gates
pass — pytest pins equality with the batch ``training_corpus`` doc set
on a corpus delivered in ≥3 micro-batches.

Gate parity notes (tests/test_streaming.py pins the set equality):

  * ``quality_pass`` is the batch rule verbatim: ≥ 20 whitespace
    tokens.
  * ``dup_bigram_frac`` uses the projection form of the zip-of-slices
    bigram construction — same integer counts through the same
    ``decimal(18,6)`` rounding as the batch explode + groupBy form.
  * ``top_word_count`` is a longest-run fold over the SORTED token
    array: ``array_sort`` is bound once as the HOF argument and the
    ``aggregate`` lambda references only its accumulator and element
    (the repo's interpreted-HOF rule), replacing the batch side's
    explode + double groupBy, which a watermark-free append-mode
    stream cannot run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..queries import REP_DUP_BIGRAM_MAX, REP_TOP_WORD_MAX


def gate_columns() -> dict[str, "F.Column"]:
    """The per-document gate expressions, keyed by output column name.

    Pure stateless projections (usable on a streaming frame). All
    counts are cast to LONG before the decimal-routed divisions so the
    result decimal type — and therefore the 4-digit rounding — is
    bit-identical to the batch legs.
    """
    words = F.split("text", " ")
    n_tokens = F.size(words).cast("long")

    # bigrams: zip-of-slices (cannot index out of bounds; empty for <2
    # tokens). The transform output is referenced by 3 consumers — a
    # bounded constant-factor re-evaluation, acceptable for the gate
    # projection (the batch/bench leg uses the explode form instead).
    t2 = F.slice(words, 2, F.greatest(F.size(words) - 1, F.lit(0)))
    z = F.arrays_zip(words.alias("a"), t2.alias("b"))
    big = F.transform(
        F.filter(z, lambda s: s["b"].isNotNull()),
        lambda s: F.concat_ws(" ", s["a"], s["b"]),
    )
    n_big = F.size(big).cast("long")
    n_big_distinct = F.size(F.array_distinct(big)).cast("long")
    dup_frac = F.when(
        n_big > 0,
        F.round((n_big - n_big_distinct).cast("decimal(18,6)") / n_big, 4)
        .cast("double"),
    ).otherwise(F.lit(0.0))

    # longest equal-run over the sorted tokens == max word frequency;
    # the fold lambda touches only (acc, w), so the interpreted HOF
    # evaluates its argument arrays exactly once per row
    top_count = F.aggregate(
        F.array_sort(words),
        F.struct(F.lit(None).cast("string").alias("prev"),
                 F.lit(0).cast("long").alias("run"),
                 F.lit(0).cast("long").alias("best")),
        lambda acc, w: F.struct(
            w.alias("prev"),
            F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            .cast("long").alias("run"),
            F.greatest(
                acc["best"],
                F.when(w == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
                .cast("long")).alias("best"),
        ),
        lambda acc: acc["best"],
    )
    top_frac = F.round(
        top_count.cast("decimal(18,6)") / n_tokens, 4).cast("double")

    return {
        "repetition_pass": ((top_frac <= REP_TOP_WORD_MAX)
                            & (dup_frac <= REP_DUP_BIGRAM_MAX)),
        "quality_pass": n_tokens >= 20,
    }


def stream_quality_gates(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
) -> StreamingQuery:
    """Stateless gate projection stream: (doc_id, repetition_pass,
    quality_pass), one row per document."""
    docs = spark.readStream.schema("doc_id long, text string") \
        .format("parquet").load(input_dir)
    gates = gate_columns()
    out = docs.select(
        "doc_id",
        *[expr.alias(name) for name, expr in gates.items()],
    )
    writer = (
        out.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_training_corpus(
    spark: SparkSession,
    input_dir: str,
    base_dir: str,
    available_now: bool = True,
    timeout: int = 600,
) -> None:
    """Drive one incremental pass of the full composition: run the
    stateful near-dedup and the stateless gate projection over whatever
    has landed in ``input_dir`` (both availableNow; blocks until both
    drain). Call again after more files land — state carries over via
    the checkpoints under ``base_dir``."""
    from .neardedup import stream_neardedup

    q1 = stream_neardedup(
        spark, input_dir, f"{base_dir}/dedup_out", f"{base_dir}/dedup_ckpt",
        available_now=available_now)
    q2 = stream_quality_gates(
        spark, input_dir, f"{base_dir}/gates_out", f"{base_dir}/gates_ckpt",
        available_now=available_now)
    # a timeout MUST surface: returning with a query still running would
    # hand the caller a partially-written sink (silently wrong
    # survivors) and collide on the checkpoint dirs next round
    for name, q in (("neardedup", q1), ("quality_gates", q2)):
        if not q.awaitTermination(timeout):
            q.stop()
            raise TimeoutError(
                f"stream_training_corpus: {name} stream did not drain "
                f"within {timeout}s; sinks are incomplete — re-run after "
                "investigating (checkpoints preserve progress)")


def stream_training_corpus_survivors(
        spark: SparkSession, base_dir: str) -> DataFrame:
    """Fold both sinks to the incremental corpus: docs no dedup band
    dropped, gated on repetition + quality."""
    from .neardedup import stream_survivors

    surv = stream_survivors(spark, f"{base_dir}/dedup_out")
    gates = spark.read.parquet(f"{base_dir}/gates_out")
    return (
        surv.join(gates, "doc_id")
        .where("repetition_pass AND quality_pass")
        .select("doc_id")
    )
