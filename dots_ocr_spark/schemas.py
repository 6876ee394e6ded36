"""Spark schemas for the extraction engine (the fixed StructType
discipline replacing the reference's convention-enforced dicts —
SURVEY.md §1.3)."""

from __future__ import annotations

from pyspark.sql import types as T

#: output/input span struct (BASELINE.json input_hint)
SPAN = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
    T.StructField("offset", T.IntegerType()),
])

#: per-page raw payload struct of the input table
PAGE = T.StructType([
    T.StructField("page_no", T.IntegerType()),
    T.StructField("width", T.IntegerType()),
    T.StructField("height", T.IntegerType()),
    T.StructField("scale_factor", T.DoubleType()),
    T.StructField("payload", T.StringType()),
    T.StructField("toc_json", T.StringType()),
    # optional PDF-space word-box layer (fitz get_text("words") shape,
    # JSON [[x0,y0,x1,y1,word,block_no,line_no,word_no], ...]) for the
    # J3 bbox-clip text fill; null when the payload carries cell text
    T.StructField("words_json", T.StringType()),
])

#: the interleaved input table
INPUT = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN)),
    T.StructField("pages", T.ArrayType(PAGE)),
    T.StructField("n_pages", T.IntegerType()),
    T.StructField("size_class", T.StringType()),
])

#: span without offset — page-local, before document assembly
PAGE_SPAN = T.StructType([
    T.StructField("kind", T.StringType()),
    T.StructField("text", T.StringType()),
    T.StructField("media_ref", T.StringType()),
])

#: stage-1 (parse) output, page grain
PARSED_PAGE = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("page_no", T.IntegerType()),
    T.StructField("status", T.StringType()),
    T.StructField("md", T.StringType()),
    T.StructField("md_nohf", T.StringType()),
    T.StructField("spans", T.ArrayType(PAGE_SPAN)),
    T.StructField("n_cells", T.IntegerType()),
])

#: final extraction output, document grain
OUTPUT = T.StructType([
    T.StructField("doc_id", T.StringType()),
    T.StructField("spans", T.ArrayType(SPAN)),
    T.StructField("markdown", T.StringType()),
    T.StructField("markdown_nohf", T.StringType()),
    T.StructField("n_pages", T.IntegerType()),
    T.StructField("n_failed", T.IntegerType()),
    T.StructField("n_fallback", T.IntegerType()),
    T.StructField("n_spans", T.IntegerType()),
    T.StructField("status", T.StringType()),
])
