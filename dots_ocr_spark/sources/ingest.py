"""Ingestion sources: build the interleaved input table from upstream
shapes (S2/S3 analogs — the reference's polymorphic input acceptance,
dotsocr_service.py:568-607, re-expressed as table-to-table operators).

``interleaved_from_text`` is deliberately 100% JVM expressions (no Python
UDF): paginating a flat text corpus into page payloads is string/array
algebra, which Catalyst codegens — the Python boundary stays reserved for
the parse stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

PAGE_W, PAGE_H = 1700, 2200
CHUNK_WORDS = 40
BLOCK_H, BLOCK_GAP, BODY_TOP = 100, 20, 150


def _cells_expr(words: Column) -> Column:
    """array<struct<bbox,category,text>> from a word array: one Text block
    per CHUNK_WORDS words, stacked vertically with clean XY-cut gaps."""
    n_chunks = F.ceil(F.size(words) / F.lit(CHUNK_WORDS)).cast("int")
    return F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.struct(
            F.array(
                F.lit(100),
                F.lit(BODY_TOP) + i * (BLOCK_H + BLOCK_GAP),
                F.lit(PAGE_W - 100),
                F.lit(BODY_TOP) + i * (BLOCK_H + BLOCK_GAP) + BLOCK_H,
            ).alias("bbox"),
            F.lit("Text").alias("category"),
            F.array_join(
                F.slice(words, i * CHUNK_WORDS + 1, CHUNK_WORDS), " "
            ).alias("text"),
        ),
    )


def interleaved_from_text(docs: DataFrame, doc_id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Flat (doc_id, text) corpus → the interleaved input table shape
    (doc_id, spans, pages, n_pages, size_class), single-page documents.

    The payload is the same VLM-style JSON the extraction stage parses, so
    a flat corpus rides the identical pipeline as native interleaved docs.
    """
    words = F.split(F.col(text_col), " ")
    cells = _cells_expr(words)
    n_chunks = F.size(cells)
    height = F.greatest(
        F.lit(PAGE_H),
        F.lit(BODY_TOP) + n_chunks * (BLOCK_H + BLOCK_GAP) + F.lit(60),
    ).cast("int")

    spans = F.transform(
        cells,
        lambda c, i: F.struct(
            F.lit("text").alias("kind"),
            c["text"].alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
            i.cast("int").alias("offset"),
        ),
    )
    pages = F.array(
        F.struct(
            F.lit(0).alias("page_no"),
            F.lit(PAGE_W).alias("width"),
            height.alias("height"),
            F.lit(1.0).alias("scale_factor"),
            F.to_json(cells).alias("payload"),
            F.lit(None).cast("string").alias("toc_json"),
        )
    )
    return docs.select(
        F.col(doc_id_col).cast("string").alias("doc_id"),
        spans.alias("spans"),
        pages.alias("pages"),
        F.lit(1).alias("n_pages"),
        F.lit("normal").alias("size_class"),
    )
