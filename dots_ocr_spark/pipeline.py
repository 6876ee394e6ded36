"""The Spark extraction job: interleaved document table in, ordered span
table out.

Physical plan (designed for the 10^12-doc scale, tested on local[N]):

  1. ``explode(pages)`` to page grain — a document with 60 table-heavy
     pages becomes 60 independent work units, so per-document skew cannot
     stall an executor (X7; the reference's analog is its bounded page
     queue, configs.py:8-61).
  2. ``repartition(hash(doc_id, page_no))`` before the heavy stage —
     pages of hard documents scatter across the cluster instead of
     clustering in the input partition that carried the document. With AQE
     enabled, post-shuffle coalescing keeps small runs cheap.
  3. ``mapInPandas(parse)`` — the single Python boundary. Arrow batches
     in/out (the built-in replacement for the reference's hand-rolled
     micro-batch collector, task_executor_pool.py:84-142); all rule logic
     is the shared spec package.
  4. document assembly entirely in JVM expressions (no second Python
     stage): ``groupBy(doc_id)`` + ``array_sort(collect_list(...))`` +
     higher-order ``transform``/``filter``/``aggregate`` — one shuffle,
     whole-stage-codegen'd.

Spans' final ``offset`` is assigned with an index-aware ``transform`` over
the flattened per-page span arrays, so reading-order positions are global
per document without a window function or a second shuffle.
"""

from __future__ import annotations

import json
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from . import schemas
from .spec.page import process_page

TASK_FAIL_THRESHOLD = 0.1


# --------------------------------------------------------------------------
# stage 1 — page parse (the only Python stage)
# --------------------------------------------------------------------------

def _parse_pages_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: page rows in, parsed page rows out.

    Arrow delivers columnar batches; the per-page loop below is the
    page-granular compute the reference runs per task (ocr_task.py:518-634),
    here amortized over a whole Arrow batch per Python call.
    """
    for pdf in batches:
        doc_ids = pdf["doc_id"].tolist()
        page_nos = pdf["page_no"].tolist()
        widths = pdf["width"].tolist()
        heights = pdf["height"].tolist()
        scales = pdf["scale_factor"].tolist()
        payloads = pdf["payload"].tolist()
        tocs = pdf["toc_json"].tolist()

        out = {k: [] for k in
               ("doc_id", "page_no", "status", "md", "md_nohf", "spans", "n_cells")}
        for doc_id, page_no, w, h, sf, payload, toc_json in zip(
                doc_ids, page_nos, widths, heights, scales, payloads, tocs):
            toc = None if toc_json is None else json.loads(toc_json)
            r = process_page(
                payload, int(w), int(h), doc_id=doc_id, page_no=int(page_no),
                scale_factor=float(sf) if sf is not None else 1.0, toc=toc,
            )
            out["doc_id"].append(doc_id)
            out["page_no"].append(int(page_no))
            out["status"].append(r["status"])
            out["md"].append(r["md"])
            out["md_nohf"].append(r["md_nohf"])
            out["spans"].append(
                [(s["kind"], s["text"], s["media_ref"]) for s in r["spans"]]
            )
            out["n_cells"].append(len(r["cells"]))
        yield pd.DataFrame(out)


def parse_pages(docs: DataFrame, shuffle_pages: bool = True) -> DataFrame:
    """Stage 1: explode documents to page grain and run the parse UDF.

    ``shuffle_pages=True`` adds the skew-breaking repartition by
    ``hash(doc_id, page_no)``; leave it on for real runs, off for tiny
    unit-test inputs where the extra shuffle dominates.
    """
    pages = docs.select(
        "doc_id", F.explode("pages").alias("page")
    ).select("doc_id", "page.*")
    if shuffle_pages:
        pages = pages.repartition(F.xxhash64("doc_id", "page_no"))
    return pages.mapInPandas(_parse_pages_batches, schema=schemas.PARSED_PAGE)


# --------------------------------------------------------------------------
# stage 2 — document assembly (pure JVM)
# --------------------------------------------------------------------------

def assemble_documents(parsed: DataFrame) -> DataFrame:
    """Stage 2: per-document assembly with built-in expressions only.

    Mirrors the reference combiner (dotsocr_service.py:430-515): pages
    sorted by page_no; failed pages excluded; page markdown joined with a
    trailing ``\\n\\n`` per page; document failed when failed/total > 0.1.
    """
    grouped = parsed.groupBy("doc_id").agg(
        F.array_sort(
            F.collect_list(F.struct("page_no", "status", "md", "md_nohf", "spans"))
        ).alias("pr")
    )

    ok = F.filter("pr", lambda p: p["status"] != F.lit("failed"))
    out = grouped.select(
        "doc_id",
        ok.alias("ok_pages"),
        F.size("pr").alias("n_pages"),
        F.size(F.filter("pr", lambda p: p["status"] == F.lit("failed"))).alias("n_failed"),
        F.size(F.filter("pr", lambda p: p["status"] == F.lit("fallback"))).alias("n_fallback"),
    )

    flat_spans = F.flatten(F.transform("ok_pages", lambda p: p["spans"]))
    spans = F.transform(
        flat_spans,
        lambda s, i: F.struct(
            s["kind"].alias("kind"),
            s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    markdown = F.aggregate(
        "ok_pages", F.lit(""), lambda acc, p: F.concat(acc, p["md"], F.lit("\n\n"))
    )
    markdown_nohf = F.aggregate(
        "ok_pages", F.lit(""), lambda acc, p: F.concat(acc, p["md_nohf"], F.lit("\n\n"))
    )

    return out.select(
        "doc_id",
        spans.alias("spans"),
        markdown.alias("markdown"),
        markdown_nohf.alias("markdown_nohf"),
        "n_pages",
        "n_failed",
        "n_fallback",
        F.size(spans).alias("n_spans"),
        F.when(
            F.col("n_failed") / F.col("n_pages") > TASK_FAIL_THRESHOLD, F.lit("failed")
        ).otherwise(F.lit("ok")).alias("status"),
    )


def extract(docs: DataFrame, shuffle_pages: bool = True) -> DataFrame:
    """Full pipeline: input table → (doc_id, ordered spans, markdown, …)."""
    return assemble_documents(parse_pages(docs, shuffle_pages=shuffle_pages))


# --------------------------------------------------------------------------
# metrics (A4/A5 analog)
# --------------------------------------------------------------------------

def page_metrics(parsed: DataFrame) -> DataFrame:
    """Per-status page counters — the reference's task stats
    (app/utils/executor/stats.py:22-41) as a groupBy."""
    return parsed.groupBy("status").agg(
        F.count("*").alias("n_pages"),
        F.sum("n_cells").alias("n_cells"),
    )


# --------------------------------------------------------------------------
# distributed fixture generation
# --------------------------------------------------------------------------

def generate_input(spark: SparkSession, n_docs: int, seed: int = 42,
                   partitions: int | None = None, **knobs) -> DataFrame:
    """Build the synthetic interleaved input table distributedly: each
    executor generates its own documents from (seed, doc_index) — no driver
    materialization, so the same code scales from 500 docs to millions."""
    from .fixtures import generate_doc

    def _gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("doc_id", "spans", "pages", "n_pages", "size_class")}
            for i in pdf["id"].tolist():
                d = generate_doc(int(i), seed=seed, **knobs)
                rows["doc_id"].append(d["doc_id"])
                rows["spans"].append(
                    [(s["kind"], s["text"], s["media_ref"], s["offset"])
                     for s in d["spans"]]
                )
                rows["pages"].append(
                    [(p["page_no"], p["width"], p["height"], p["scale_factor"],
                      p["payload"], p["toc_json"]) for p in d["pages"]]
                )
                rows["n_pages"].append(d["n_pages"])
                rows["size_class"].append(d["size_class"])
            yield pd.DataFrame(rows)

    n_part = partitions or max(spark.sparkContext.defaultParallelism, 8)
    return spark.range(n_docs, numPartitions=n_part).mapInPandas(
        _gen, schema=schemas.INPUT
    )
