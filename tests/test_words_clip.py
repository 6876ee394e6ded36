"""J3 — word-grain bbox-clip text extraction unit tests
(reference semantics: pdf_extractor.py:45-62 + ocr_task.py:558-568)."""

from dots_ocr_spark.spec.page import process_page
from dots_ocr_spark.spec.words import clip_text, fill_cell_texts

# [x0, y0, x1, y1, word, block_no, line_no, word_no]
WORDS = [
    [10, 10, 40, 20, "alpha", 0, 0, 0],
    [45, 10, 80, 20, "beta", 0, 0, 1],
    [10, 25, 40, 35, "gamma", 0, 1, 0],
    [10, 60, 40, 70, "outside", 1, 0, 0],
]


def test_clip_containment_and_line_join():
    # words of block 0 are inside; line break collapses to a space (T10)
    assert clip_text(WORDS, [0, 0, 100, 40]) == "alpha beta gamma"


def test_clip_excludes_partially_contained():
    # beta's rect (45..80) crosses x=60: excluded by full containment
    assert clip_text(WORDS, [0, 0, 60, 40]) == "alpha gamma"


def test_clip_empty_region():
    assert clip_text(WORDS, [200, 200, 300, 300]) == ""


def test_clip_orders_by_block_line_word():
    shuffled = list(reversed(WORDS))
    assert clip_text(shuffled, [0, 0, 100, 100]) == "alpha beta gamma outside"


def test_fill_skips_table_picture_formula():
    cells = [
        {"bbox": [0, 0, 100, 40], "category": "Text"},
        {"bbox": [0, 0, 100, 40], "category": "Table", "text": "<table/>"},
        {"bbox": [0, 0, 100, 40], "category": "Formula", "text": "$x$"},
        {"bbox": [0, 50, 100, 80], "category": "Picture"},
    ]
    fill_cell_texts(cells, WORDS, 1.0)
    assert cells[0]["text"] == "alpha beta gamma"
    assert cells[1]["text"] == "<table/>"      # untouched
    assert cells[2]["text"] == "$x$"           # untouched
    assert "text" not in cells[3]              # untouched


def test_fill_divides_bbox_by_scale_factor():
    # image-space bbox [0,0,200,80] at scale 2.0 clips PDF rect [0,0,100,40]
    cells = [{"bbox": [0, 0, 200, 80], "category": "Text"}]
    fill_cell_texts(cells, WORDS, 2.0)
    assert cells[0]["text"] == "alpha beta gamma"


def test_process_page_word_grain_end_to_end():
    """A page whose payload cells carry no text + a words layer: the
    pipeline fills text before TOC/ordering/render and emits it in spans
    and markdown."""
    payload = [
        {"bbox": [0, 0, 100, 40], "category": "Text"},
        {"bbox": [0, 50, 100, 90], "category": "Text"},
    ]
    words = WORDS
    r = process_page(payload, 100, 100, doc_id="d", page_no=0, words=words)
    assert r["status"] == "ok"
    assert [s["text"] for s in r["spans"]] == ["alpha beta gamma", "outside"]
    assert r["md"] == "alpha beta gamma\n\noutside"


def test_process_page_words_ignored_on_fallback():
    """Unparseable payload degrades to the repaired-cell fallback; the
    words layer must NOT overwrite the degraded whole-page cell."""
    bad = '[{"bbox": [0, 0, 100, 40], "category": "Text", "text": "kept"'
    r = process_page(bad, 100, 100, doc_id="d", page_no=0, words=WORDS)
    assert r["status"] == "fallback"
    assert [s["text"] for s in r["spans"]] == ["kept"]


def test_wordgrain_scaled_output_is_scale_invariant(spark):
    """The scale-2 word-grain input (image-space bboxes, PDF-space word
    layer) must extract byte-identically to the scale-1 input — the P4
    division is the only thing standing between them."""
    from dots_ocr_spark import pipeline
    from dots_ocr_spark.sources.ingest import interleaved_wordgrain

    flat = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .limit(80)

    def fp(docs):
        return {
            r["doc_id"]: (r["n_spans"], tuple(s["text"] for s in r["spans"]))
            for r in pipeline.extract(docs).collect()
        }

    assert fp(interleaved_wordgrain(flat)) == \
        fp(interleaved_wordgrain(flat, scale=2))
