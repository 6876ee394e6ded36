"""dots_ocr_spark — a PySpark-native document layout-parsing and
main-content-extraction engine.

Brand-new implementation with the query/data-processing capabilities of the
reference (AKCqhzdy/dots.ocr): page payloads in, ordered layout spans out,
over tables of interleaved text+media documents.

Layout:
  spec/       pure-Python/numpy deterministic rules shared by the Spark UDFs
              and unit tests (cleaner, geometry, xycut, textnorm, headers,
              toc, render, page).
  oracle.py   plain-Python end-to-end per-document reference pipeline
              (golden-test source of truth).
  fixtures.py seeded deterministic generator for the interleaved input table.
  pipeline.py the Spark extraction job (mapInPandas parse stage + JVM-side
              assembly).
  lineage.py  resumable bucketed runner with lineage + metrics tables.
  operators/  training-data-pipeline operators (dedup, similarity,
              text analysis, multimodal plumbing).
  queries.py  driver-facing query registry + DuckDB oracle SQL.
"""

__version__ = "0.1.0"
