"""PDF rasterization (S1/S2): the shared page-iteration + dpi spec is
pinned on the stub backend (runs anywhere); the real fitz/pypdfium2
path shares exactly that spec and gets a conditional end-to-end test
where a PDF lib exists (this container: skipped, like the PIL decode
test)."""

import hashlib

import pytest

from dots_ocr_spark.sources import rasterize as R


# ---- pure-spec units (no Spark) ----

def test_page_indices_reference_semantics():
    # inclusive start..end, None/negative end = last, clamp, exclude
    assert R.page_indices(5) == [0, 1, 2, 3, 4]
    assert R.page_indices(5, 1, 3) == [1, 2, 3]
    assert R.page_indices(5, 0, -1) == [0, 1, 2, 3, 4]
    assert R.page_indices(5, 0, 99) == [0, 1, 2, 3, 4]
    assert R.page_indices(5, 0, None, {1, 3}) == [0, 2, 4]
    assert R.page_indices(0) == []
    assert R.page_indices(3, 5) == []


def test_render_dims_dpi_arithmetic_and_fallback():
    # 612x792 pt (US Letter) at dpi 200 -> 1700x2200, no fallback
    assert R.render_dims(612, 792) == (1700, 2200, 200 / 72, False)
    # giant page: rendered side would exceed 4500 -> native dims kept,
    # scale_factor STILL dpi/72 (the documented reference quirk)
    w, h, s, fb = R.render_dims(1700, 2000)
    assert (w, h, fb) == (1700, 2000, True)
    assert s == 200 / 72
    # dpi 72 never falls back below the cap
    assert R.render_dims(1700, 2000, dpi=72) == (1700, 2000, 1.0, False)


def test_stub_corpus_trips_the_fallback_sometimes():
    """The stub native dims are spread so ordinary corpora exercise
    BOTH branches of the giant-page guard."""
    fellback = {
        R.render_dims(*R._stub_native_dims(b"doc%d" % i, 0))[3]
        for i in range(64)
    }
    assert fellback == {True, False}


# ---- Spark plumbing (stub backend) ----

def test_rasterize_stub_matches_pure_python(spark):
    payloads = [(i, b"pdfbytes-%d" % i) for i in range(20)]
    df = spark.createDataFrame(payloads, "doc_id long, pdf_bytes binary")
    got = {(r["doc_id"], r["page_no"]):
           (r["width"], r["height"], r["scale_factor"], r["fell_back"],
            bytes(r["page_png"]), r["renderer"])
           for r in R.rasterize_pdfs(df).collect()}
    exp = {}
    for doc_id, payload in payloads:
        for p in R._rasterize_stub(payload, R.DEFAULT_DPI, 0, None,
                                   frozenset()):
            exp[(doc_id, p["page_no"])] = (
                p["width"], p["height"], p["scale_factor"],
                p["fell_back"], p["page_png"], "stub")
    assert got == exp
    assert len(got) >= 20      # at least one page per doc


def test_rasterize_page_selection_flows_through_spark(spark):
    payload = b"multi-page-doc"
    n = R._stub_page_count(payload)
    assert n >= 2
    df = spark.createDataFrame([(1, payload)], "doc_id long, pdf_bytes binary")
    got = sorted(r["page_no"] for r in R.rasterize_pdfs(
        df, start_page_id=1, exclude_pages={2}).collect())
    assert got == [i for i in range(1, n) if i != 2]


def test_rasterize_output_feeds_paged_grain(spark):
    """The output schema carries exactly the unit keys the page-granular
    checkpoint derives (doc_id, page_no) plus the geometry the parse
    stage divides by (scale_factor)."""
    df = spark.createDataFrame([(7, b"x")], "doc_id long, pdf_bytes binary")
    out = R.rasterize_pdfs(df)
    for col in ("doc_id", "page_no", "width", "height", "scale_factor",
                "page_png"):
        assert col in out.columns


def test_real_renderer_raises_cleanly_without_libs():
    if R.real_backend() is not None:
        pytest.skip("a real PDF backend exists in this environment")
    with pytest.raises(ImportError, match="fitz"):
        R.rasterize_pdfs(None, renderer="real")


@pytest.mark.skipif(R.real_backend() is None,
                    reason="no PDF rasterizer lib in this container")
def test_real_backend_renders_a_generated_pdf(spark):
    """Runs wherever fitz or pypdfium2 exists: build a tiny 2-page PDF
    by hand (plain PDF syntax, no lib needed to WRITE it), rasterize
    for real, check page count, dpi-200 dims, and scale factor."""
    def obj(n, body):
        return f"{n} 0 obj\n{body}\nendobj\n"

    pages = "".join(
        obj(3 + i, "<< /Type /Page /Parent 2 0 R "
                   "/MediaBox [0 0 612 792] >>")
        for i in range(2))
    pdf = ("%PDF-1.4\n"
           + obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
           + obj(2, "<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>")
           + pages
           + "trailer\n<< /Root 1 0 R /Size 5 >>\n%%EOF\n").encode()
    df = spark.createDataFrame([(1, pdf)], "doc_id long, pdf_bytes binary")
    rows = R.rasterize_pdfs(df, renderer="real").collect()
    assert sorted(r["page_no"] for r in rows) == [0, 1]
    for r in rows:
        assert (r["width"], r["height"]) == (1700, 2200)
        assert r["scale_factor"] == pytest.approx(200 / 72)
        assert not r["fell_back"]
        assert len(bytes(r["page_png"])) > 100
        assert hashlib.md5(bytes(r["page_png"])).hexdigest()  # decodable blob
