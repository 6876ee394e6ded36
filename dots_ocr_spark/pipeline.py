"""The Spark extraction job: interleaved document table in, ordered span
table out.

Three physical strategies, all span-sequence-equal to the oracle
(tests/test_golden_e2e.py parametrizes the mode):

  * ``extract_fused`` (default, mode='fused') — document grain, ZERO
    shuffles. The input table is doc-grain with the full ``pages`` array
    nested per row, so parse (the shared spec rules) + reading order +
    cleaning + assembly all complete inside the scan task:
    scan → mapInPandas → sink. Parallelism/balance come from input split
    sizing (``spark.sql.files.maxPartitionBytes``): documents are ~KBs,
    so every split holds thousands of docs and per-doc skew averages
    out. Measured 0.875 scaling efficiency N→4N (BENCH/BASELINE.md).
  * ``extract_paged`` (mode='paged') — page grain, ONE shuffle (hash by
    doc_id + sortWithinPartitions); the UDF reassembles documents with a
    group-carry across Arrow batches. For inputs that arrive at page
    grain.
  * ``extract_scatter`` (mode='scatter') — page-scatter repartition by
    ``hash(doc_id, page_no)`` + JVM reassembly
    (``array_sort(collect_list(...))`` + higher-order functions). TWO
    shuffles, but page-level parallelism: for corpora whose largest
    documents are big enough to straggle a whole task (X7 skew note).

The reference's analog of the Arrow batching here is its hand-rolled
micro-batch collector (task_executor_pool.py:84-142); its analog of the
skew handling is the bounded page queue (configs.py:8-61).
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
        words_col = (pdf["words_json"].tolist() if "words_json" in pdf.columns
                     else [None] * len(doc_ids))

        out = {k: [] for k in
               ("doc_id", "page_no", "status", "md", "md_nohf", "spans", "n_cells")}
        for doc_id, page_no, w, h, sf, payload, toc_json, words_json in zip(
                doc_ids, page_nos, widths, heights, scales, payloads, tocs,
                words_col):
            toc = None if toc_json is None else json.loads(toc_json)
            words = None if words_json is None else json.loads(words_json)
            r = process_page(
                payload, int(w), int(h), doc_id=doc_id, page_no=int(page_no),
                scale_factor=float(sf) if sf is not None else 1.0, toc=toc,
                words=words,
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
    return parse_pages_exploded(pages, shuffle_pages=shuffle_pages)


def parse_pages_exploded(pages: DataFrame, shuffle_pages: bool = True) -> DataFrame:
    """Parse an already page-grain frame (doc_id + the PAGE columns) —
    the seam shared by ``parse_pages`` and the page-granular checkpoint
    runner (``checkpoint.run_extraction_paged``)."""
    if shuffle_pages:
        # Explicit partition count: an expression-only repartition is an
        # AQE-coalescible exchange, and page batches are small enough
        # (~8 MB) that AQE's 64 MB advisory size would collapse the Python
        # stage to a handful of tasks — starving the executors where the
        # work actually is. The count pins parallelism; pages stay
        # scattered by hash so table/formula-heavy docs can't clump (X7).
        n_part = pages.sparkSession.sparkContext.defaultParallelism * 4
        pages = pages.repartition(n_part, F.xxhash64("doc_id", "page_no"))
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


# --------------------------------------------------------------------------
# fused parse+assemble, document grain (default path — ZERO shuffles)
# --------------------------------------------------------------------------

_OUT_COLS = ("doc_id", "spans", "markdown", "markdown_nohf",
             "n_pages", "n_failed", "n_fallback", "n_spans", "status")


def _out_row(d: dict) -> tuple:
    return (
        d["doc_id"],
        [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in d["spans"]],
        d["markdown"], d["markdown_nohf"],
        d["n_pages"], d["n_failed"], d["n_fallback"], d["n_spans"], d["status"],
    )


def _extract_doc_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker, document grain: each input row carries the whole
    document (nested ``pages`` array), so parse + assembly complete inside
    the task — no shuffle anywhere in the job."""
    from .spec.assemble import assemble_page_results

    for pdf in batches:
        out: list[tuple] = []
        for doc_id, pages in zip(pdf["doc_id"].tolist(), pdf["pages"].tolist()):
            page_results = []
            for p in sorted(pages if pages is not None else [],
                            key=lambda p: p["page_no"]):
                toc_json = p["toc_json"]
                toc = None if toc_json is None else json.loads(toc_json)
                words_json = p.get("words_json")
                words = None if words_json is None else json.loads(words_json)
                sf = p["scale_factor"]
                page_results.append(process_page(
                    p["payload"], int(p["width"]), int(p["height"]),
                    doc_id=doc_id, page_no=int(p["page_no"]),
                    scale_factor=float(sf) if sf is not None else 1.0, toc=toc,
                    words=words,
                ))
            out.append(_out_row(assemble_page_results(doc_id, page_results)))
        yield pd.DataFrame(out, columns=_OUT_COLS)


def extract_fused(docs: DataFrame) -> DataFrame:
    """Fused parse+assemble at document grain: ZERO shuffles.

    The input table is document-grain with the full ``pages`` array nested
    in the row, so every document is parsed and assembled inside its scan
    task — the job is scan → mapInPandas → sink, embarrassingly parallel.
    Parallelism and balance come from input split sizing
    (``spark.sql.files.maxPartitionBytes``; docs are ~KBs, so every split
    holds thousands of documents and skew averages out). Per-task skew is
    bounded by the largest single document; for corpora with pathological
    page counts per doc, use ``extract_paged``/``extract_scatter`` which
    redistribute at page grain.
    """
    return docs.select("doc_id", "pages").mapInPandas(
        _extract_doc_batches, schema=schemas.OUTPUT)


# --------------------------------------------------------------------------
# fused parse+assemble, page grain (one shuffle — for page-grain inputs)
# --------------------------------------------------------------------------

def _parse_assemble_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker for the page-grain fused path.

    Rows arrive hash-partitioned by ``doc_id`` and sorted by
    ``(doc_id, page_no)`` within the partition, so all pages of a document
    are contiguous. Arrow batch boundaries do NOT align with documents, so
    the open group is carried across batches and the final group flushed
    at iterator exhaustion.
    """
    from .spec.assemble import assemble_page_results

    cols, _row = _OUT_COLS, _out_row

    cur_id: str | None = None
    cur_results: list[dict] = []
    for pdf in batches:
        out: list[tuple] = []
        words_col = (pdf["words_json"].tolist() if "words_json" in pdf.columns
                     else [None] * len(pdf))
        for doc_id, page_no, w, h, sf, payload, toc_json, words_json in zip(
                pdf["doc_id"].tolist(), pdf["page_no"].tolist(),
                pdf["width"].tolist(), pdf["height"].tolist(),
                pdf["scale_factor"].tolist(), pdf["payload"].tolist(),
                pdf["toc_json"].tolist(), words_col):
            if doc_id != cur_id:
                if cur_id is not None:
                    out.append(_row(assemble_page_results(cur_id, cur_results)))
                cur_id, cur_results = doc_id, []
            if payload is None:  # explode_outer row: document with no pages
                continue
            toc = None if toc_json is None else json.loads(toc_json)
            words = None if words_json is None else json.loads(words_json)
            cur_results.append(process_page(
                payload, int(w), int(h), doc_id=doc_id, page_no=int(page_no),
                scale_factor=float(sf) if sf is not None else 1.0, toc=toc,
                words=words,
            ))
        if out:
            yield pd.DataFrame(out, columns=cols)
    if cur_id is not None:
        yield pd.DataFrame([_row(assemble_page_results(cur_id, cur_results))],
                           columns=cols)


def extract_paged(docs: DataFrame) -> DataFrame:
    """Fused parse+assemble over PAGE-grain distribution: exactly ONE
    shuffle (hash by ``doc_id``) and ONE Python stage.

    Use when the input arrives at page grain (e.g. a page-stream ingest)
    or when nested per-doc rows would be too large: pages are exploded,
    co-located by ``doc_id`` via ``repartition`` +
    ``sortWithinPartitions(doc_id, page_no)``, and the UDF reassembles
    documents with a group-carry across Arrow batches. For doc-grain
    inputs prefer ``extract_fused`` (zero shuffles)."""
    n_part = docs.sparkSession.sparkContext.defaultParallelism * 4
    pages = docs.select(
        "doc_id", F.explode_outer("pages").alias("page")
    ).select("doc_id", "page.*")
    pages = pages.repartition(n_part, "doc_id").sortWithinPartitions("doc_id", "page_no")
    return pages.mapInPandas(_parse_assemble_batches, schema=schemas.OUTPUT)


def extract_scatter(docs: DataFrame, shuffle_pages: bool = True) -> DataFrame:
    """Two-stage pipeline: page-scatter parse + JVM document reassembly.
    Use when single documents are so large that one document per task
    would straggle (page-grain parallelism is preserved here)."""
    return assemble_documents(parse_pages(docs, shuffle_pages=shuffle_pages))


def extract(docs: DataFrame, shuffle_pages: bool = True,
            mode: str = "fused") -> DataFrame:
    """Full pipeline: input table → (doc_id, ordered spans, markdown, …).

    mode: 'fused' (doc-grain, zero shuffles — default), 'paged' (page
    grain, one shuffle), 'scatter' (page scatter + JVM reassembly, two
    shuffles — giant-doc corpora)."""
    if mode == "fused":
        return extract_fused(docs)
    if mode == "paged":
        return extract_paged(docs)
    return extract_scatter(docs, shuffle_pages=shuffle_pages)


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
                      p["payload"], p["toc_json"], p.get("words_json"))
                     for p in d["pages"]]
                )
                rows["n_pages"].append(d["n_pages"])
                rows["size_class"].append(d["size_class"])
            yield pd.DataFrame(rows)

    n_part = partitions or max(spark.sparkContext.defaultParallelism, 8)
    return spark.range(n_docs, numPartitions=n_part).mapInPandas(
        _gen, schema=schemas.INPUT
    )
