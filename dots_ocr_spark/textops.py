"""Corpus analytics + multimodal column plumbing.

  * ``corpus_stats`` — per-(lang, source) rollup of the documents table
    (decimal-routed averages so both engines agree bit-for-bit).
  * ``media_decode`` — the multimodal pattern: an opaque ``binary``
    column flows through an Arrow-batched ``mapInPandas`` decode stage
    that emits typed metadata. The real decoder (PIL/libvips) is not in
    this container, so the decode body is a clearly-marked deterministic
    stub (metadata derived from the bytes themselves); the Spark-side
    plumbing — binary column, schema, batching, UDF signature — is real
    and value-checked against the oracle. Swap ``_decode_stub`` for a
    real decoder on a cluster with image libs installed.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # real decoder path — import-gated (not shipped in this container)
    import PIL.Image  # noqa: F401
    HAVE_PIL = True
except Exception:
    HAVE_PIL = False


def corpus_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.size(F.split("text", " ")).cast("long")
    return (
        d.groupBy("lang", "source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.col("n_chars").cast("long")).alias("total_chars"),
            F.round(
                F.avg(toks.cast("decimal(18,6)")), 4
            ).cast("double").alias("avg_tokens"),
            F.max(F.col("n_chars").cast("long")).alias("max_chars"),
        )
    )


ORACLE_CORPUS_STATS = """
SELECT lang, source,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       CAST(round(avg(CAST(len(string_split(text,' ')) AS DECIMAL(18,6))), 4) AS DOUBLE)
         AS avg_tokens,
       max(n_chars) AS max_chars
FROM documents
GROUP BY lang, source
"""


# ---------------------------------------------------------------------------
# multimodal: binary column -> decode stub -> typed metadata
# ---------------------------------------------------------------------------

MEDIA_META_SCHEMA = (
    "doc_id long, media_md5 string, n_bytes long, "
    "width int, height int, fmt string, decoder string"
)


def stub_dims(n: int) -> tuple[int, int]:
    """The stub decoder's (width, height) as a pure function of the byte
    count — THE single definition; the SQL templates below and any query
    deriving crop geometry from stub metadata must mirror exactly this."""
    return 64 + n % 960, 64 + (n * 7) % 960


#: SQL mirrors of :func:`stub_dims` for oracle strings ({n} = a length
#: expression; byte length == char length on this ASCII corpus)
STUB_W_SQL = "64 + {n} % 960"
STUB_H_SQL = "64 + ({n} * 7) % 960"


def _decode_stub(payload: bytes) -> dict:
    """Deterministic stand-in for image decoding (container has no image
    libs). Emits metadata derived purely from the bytes so the pipeline
    stays value-checkable; a real deployment replaces this body with
    PIL/pyvips decode + resize/feature-extract."""
    md5 = hashlib.md5(payload).hexdigest()
    n = len(payload)
    w, h = stub_dims(n)
    return {
        "media_md5": md5,
        "n_bytes": n,
        "width": w,
        "height": h,
        "fmt": "png" if (n % 2 == 0) else "jpeg",
        "decoder": "stub",
    }


def _decode_real(payload: bytes) -> dict:
    """Real image decode via PIL (runs wherever image libs exist — zero
    code change, pass ``decoder='pil'``). Mirrors the reference's image
    normalization: RGBA flattens onto a white background
    (/root/reference/dots_ocr/utils/image_utils.py:135-142, P6)."""
    import io

    import PIL.Image

    md5 = hashlib.md5(payload).hexdigest()
    with PIL.Image.open(io.BytesIO(payload)) as im:
        fmt = (im.format or "unknown").lower()
        im.load()
        if im.mode == "RGBA":
            bg = PIL.Image.new("RGB", im.size, (255, 255, 255))
            bg.paste(im, mask=im.split()[3])
            im = bg
        elif im.mode != "RGB":
            im = im.convert("RGB")
        return {
            "media_md5": md5,
            "n_bytes": len(payload),
            "width": im.width,
            "height": im.height,
            "fmt": fmt,
            "decoder": "pil",
        }


def _decode_batches_with(decode):
    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"].tolist(),
                                       pdf["media_bytes"].tolist()):
                m = decode(bytes(payload))
                rows.append((doc_id, m["media_md5"], m["n_bytes"], m["width"],
                             m["height"], m["fmt"], m["decoder"]))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "media_md5", "n_bytes", "width", "height", "fmt",
                "decoder"])
    return _run


def media_decode(spark: SparkSession, sf_dir: str,
                 decoder: str = "stub") -> DataFrame:
    """Binary-column decode pipeline: documents' text bytes stand in for
    image payloads (the corpus ships no real media); the decode stage is
    a deterministic Arrow-batched mapInPandas over the binary column.

    ``decoder='pil'`` swaps in the real import-gated PIL path for tables
    whose binary column holds actual image bytes — the plumbing (schema,
    batching, UDF signature) is identical; only the per-payload body
    changes. The stub default keeps this oracle-checkable on a corpus
    without real media."""
    decode = _decode_real if decoder == "pil" else _decode_stub
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = d.select("doc_id", F.encode("text", "UTF-8").alias("media_bytes"))
    return media.mapInPandas(_decode_batches_with(decode),
                             schema=MEDIA_META_SCHEMA)


# the corpus text is ASCII, so byte length == char length and DuckDB can
# mirror every stub-derived field in SQL
ORACLE_MEDIA_DECODE = f"""
SELECT doc_id,
       md5(text) AS media_md5,
       length(text) AS n_bytes,
       CAST({STUB_W_SQL.format(n='length(text)')} AS INT) AS width,
       CAST({STUB_H_SQL.format(n='length(text)')} AS INT) AS height,
       CASE WHEN length(text) % 2 = 0 THEN 'png' ELSE 'jpeg' END AS fmt,
       'stub' AS decoder
FROM documents
"""
