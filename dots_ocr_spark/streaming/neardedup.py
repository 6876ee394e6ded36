"""Streaming NEAR-duplicate dedup — the incremental complement of the
batch ``dedup.dedup_survivors`` flow (exact dedup → shingle-MinHash LSH
candidates → exact Jaccard verify → greedy drop).

Architecture (one streaming query, one stateful operator):

  1. a stateless ``mapInPandas`` computes, per document, the SAME
     md5-based artifacts as the batch flow (``dedup._minhash_bands`` /
     ``ORACLE_MINHASH_SHINGLE_BANDS``): distinct word-3-gram shingles,
     8 MinHash permutation minima, and the two 4-permutation band
     hashes — plus an EXACT row (band = -1, bucket = md5(text)) that
     carries the exact-dup rule for every document, including short
     (< 3 word) documents that have no shingles;
  2. ``applyInPandasWithState`` keyed by (band, bucket) holds the
     bucket's member shingle sets (JSON state, capped at
     ``MAX_BUCKET_MEMBERS``) and emits a (doc_id, band, dropped)
     verdict per incoming row: exact-band rows drop when the bucket was
     already claimed; LSH-band rows drop when the exact word-3-gram
     Jaccard against ANY earlier member reaches the threshold —
     within a micro-batch rows are folded in ascending doc_id order, so
     the verdicts equal the batch i<j pairing rule;
  3. a document SURVIVES iff no band dropped it —
     :func:`stream_survivors` folds the verdict sink per doc_id.

Parity with batch: on a corpus delivered in one micro-batch the
survivor set equals ``dedup_survivors`` exactly (pytest gate) — exact
dups collapse to the min doc_id (the rep), and a doc is near-dropped
iff a smaller-id doc is Jaccard-similar (comparing against dropped
members too, mirroring the batch candidate rule; identical-text members
have identical shingles, so verdicts are unchanged by exact-dup
collapse). Across micro-batches the earlier arrival wins — the
incremental contract. Degenerate buckets: state caps at
MAX_BUCKET_MEMBERS members (the batch flow star-pairs instead; on a
boilerplate-cluster corpus the stream still drops everything matching
the first 64 members, but very large clusters may diverge from the
batch star rule — acceptable for the incremental path, documented).
"""

from __future__ import annotations

import hashlib
import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from ..dedup import MAX_BUCKET_MEMBERS

#: sentinel band for the exact-dup rule (bucket = md5(text))
EXACT_BAND = -1
#: exact word-3-gram Jaccard threshold (== dedup.jaccard_pairs default)
JACCARD_THRESHOLD = 0.5

_BAND_SCHEMA = "doc_id long, band int, bucket string, sh array<string>"
_VERDICT_SCHEMA = "doc_id long, band int, dropped boolean"


def _shingles(text: str) -> list[str]:
    """Distinct word-3-gram shingles — python mirror of
    ``dedup._shingle_expr`` (split on single spaces, 3-token windows,
    distinct)."""
    toks = text.split(" ")
    if len(toks) < 3:
        return []
    return list(dict.fromkeys(
        " ".join(toks[i:i + 3]) for i in range(len(toks) - 2)))


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _band_rows(batches):
    """mapInPandas worker: (doc_id, text) → the 2 LSH band rows (docs
    with shingles) + 1 exact row per document. Same md5 algebra as the
    batch flow, so stream and batch candidates coincide."""
    import pandas as pd

    for pdf in batches:
        out = {"doc_id": [], "band": [], "bucket": [], "sh": []}
        for doc_id, text in zip(pdf["doc_id"].tolist(), pdf["text"].tolist()):
            out["doc_id"].append(doc_id)
            out["band"].append(EXACT_BAND)
            out["bucket"].append(_md5(text))
            out["sh"].append([])
            sh = _shingles(text)
            if not sh:
                continue
            mh = [min(_md5(f"p{i}:{w}") for w in sh) for i in range(8)]
            for band, bucket in (
                    (0, _md5(mh[0] + mh[1] + mh[2] + mh[3])),
                    (1, _md5(mh[4] + mh[5] + mh[6] + mh[7]))):
                out["doc_id"].append(doc_id)
                out["band"].append(band)
                out["bucket"].append(bucket)
                out["sh"].append(sh)
        if out["doc_id"]:
            yield pd.DataFrame(out)


def _neardup_group(key, pdf_iter, state):
    """Per-(band, bucket) stateful verdict fold (see module docstring)."""
    import pandas as pd

    band = int(key[0])
    members: list[list] = (
        json.loads(state.get[0]) if state.exists else [])
    rows: list[tuple[int, list[str]]] = []
    for pdf in pdf_iter:
        rows.extend(zip(pdf["doc_id"].tolist(),
                        (list(s) for s in pdf["sh"])))
    rows.sort(key=lambda r: r[0])

    out_ids, out_drop = [], []
    for doc_id, sh in rows:
        if band == EXACT_BAND:
            dropped = len(members) > 0
        else:
            s = set(sh)
            dropped = False
            for _, m_sh in members:
                inter = len(s.intersection(m_sh))
                union = len(s) + len(m_sh) - inter
                if union and inter / union >= JACCARD_THRESHOLD:
                    dropped = True
                    break
        out_ids.append(doc_id)
        out_drop.append(dropped)
        if len(members) < MAX_BUCKET_MEMBERS:
            members.append([doc_id, sh])
    state.update((json.dumps(members),))
    yield pd.DataFrame(
        {"doc_id": out_ids, "band": band, "dropped": out_drop})


def stream_neardedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Run the streaming near-dedup over a landing zone of (doc_id,
    text) parquet files; the sink holds per-(doc, band) verdict rows —
    fold with :func:`stream_survivors`."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    reader = spark.readStream.schema("doc_id long, text string") \
        .format("parquet")
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    docs = reader.load(input_dir)

    verdicts = (
        docs.mapInPandas(_band_rows, schema=_BAND_SCHEMA)
        .groupBy("band", "bucket")
        .applyInPandasWithState(
            _neardup_group,
            outputStructType=_VERDICT_SCHEMA,
            stateStructType="members string",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        verdicts.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_survivors(spark: SparkSession, output_dir: str) -> DataFrame:
    """Fold the verdict sink to the surviving document set: a doc
    survives iff NO band dropped it."""
    return (
        spark.read.parquet(output_dir)
        .groupBy("doc_id")
        .agg(F.max(F.col("dropped").cast("int")).alias("d"))
        .where(F.col("d") == 0)
        .select("doc_id")
    )
