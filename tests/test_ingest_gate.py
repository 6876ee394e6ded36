"""F7 file-format gate + S5 TOC y-flip at the ingest boundary
(dotsocr_service.py:587-593, pdf_extractor.py:110)."""

import json

from dots_ocr_spark.sources import ingest
from dots_ocr_spark.spec.page import process_page


def test_file_format_gate(spark):
    rows = [
        (1, "a/b/doc.pdf"), (2, "a/scan.JPG"), (3, "x.jpeg"), (4, "y.png"),
        (5, "notes.txt"), (6, "archive.tar.gz"), (7, "noext"),
        (8, ".hidden"), (9, "dir.with.dots/plain"), (10, "v2.PDF"),
        (11, "trailing."), (12, "a..png"),
    ]
    df = spark.createDataFrame(rows, "doc_id int, path string")
    got = {r["doc_id"]: r["file_ext"]
           for r in ingest.file_format_gate(df).collect()}
    # suffix = last dot of the FINAL component, lowercased; leading-dot,
    # trailing-dot, and dotless names have no suffix (Path.suffix
    # semantics: Path('trailing.').suffix == ''; Path('a..png') == '.png')
    assert got == {1: ".pdf", 2: ".jpg", 3: ".jpeg", 4: ".png",
                   10: ".pdf", 12: ".png"}


def test_flip_toc_y(spark):
    df = spark.createDataFrame(
        [(0, 870.0, 1000.0), (1, 0.0, 2200.0)],
        "page_no int, to_y double, page_height double")
    got = {r["page_no"]: r["to_y"] for r in ingest.flip_toc_y(df).collect()}
    assert got == {0: 130.0, 1: 2200.0}


def test_toc_yflip_feeds_header_rebuild(spark):
    """End to end: a PDF-space TOC destination flows through the ingest
    flip and then the J1 header matching. With two same-text headers the
    entry must claim the TOP one (where the flipped point lands), not the
    bottom one (where the raw PDF-space y would land)."""
    cells = [
        {"bbox": [100, 100, 600, 160], "category": "Section-header",
         "text": "1. Results"},
        {"bbox": [100, 800, 600, 860], "category": "Section-header",
         "text": "2. Results"},
    ]
    toc_df = spark.createDataFrame(
        [(0, 1, "Results", 150.0, 870.0, 1000.0)],
        "page_no int, level int, text string, to_x double, to_y double, "
        "page_height double")
    row = ingest.flip_toc_y(toc_df).first()
    assert row["to_y"] == 130.0
    toc = [{"level": row["level"], "text": row["text"],
            "to": [row["to_x"], row["to_y"]]}]

    def spans_of(toc_entries):
        r = process_page(json.dumps(cells), 700, 1000,
                         doc_id="d", page_no=0, toc=toc_entries)
        assert r["status"] == "ok"
        return [s["text"] for s in r["spans"]]

    flipped_spans = spans_of(toc)
    # identical run with a manually top-origin point: must agree exactly
    manual = [{"level": 1, "text": "Results", "to": [150.0, 130.0]}]
    assert flipped_spans == spans_of(manual)
    # the unflipped PDF-space point claims the WRONG (bottom) header
    raw = [{"level": 1, "text": "Results", "to": [150.0, 870.0]}]
    assert flipped_spans != spans_of(raw)
