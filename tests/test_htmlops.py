"""HTML boilerplate strip: handcrafted-DOM unit cases for the block
classifier, the synthesizer round-trip against a plain-Python
derivation, and the zero-exchange plan gate."""

from pyspark.sql import functions as F

from dots_ocr_spark import htmlops as H


def _strip_rows(spark, html_rows):
    df = spark.createDataFrame(
        [(i, h) for i, h in enumerate(html_rows)], "doc_id long, html string")
    return {r["doc_id"]: r for r in H.strip_boilerplate(df).collect()}


def test_strip_drops_nav_footer_and_promo(spark):
    html = (
        '<nav><a href="/h">home</a> <a href="/c">contact</a></nav>'
        "<p>real content with five words</p>"
        '<div class="promo"><a href="/x">buy this thing now cheap</a></div>'
        '<footer><a href="/t">terms</a></footer>'
    )
    r = _strip_rows(spark, [html])[0]
    assert r["n_blocks"] == 4
    assert r["n_kept"] == 1
    assert r["content"] == "real content with five words"


def test_strip_min_words_gate(spark):
    html = "<p>too short</p><p>exactly three words</p>"
    r = _strip_rows(spark, [html])[0]
    assert (r["n_blocks"], r["n_kept"]) == (2, 1)
    assert r["content"] == "exactly three words"


def test_strip_link_density_boundary(spark):
    # integer-form gate: 2*len(linked) <= len(text) keeps density == 0.5
    half = "<p>aa bb <a>cccccc</a></p>"   # text "aa bb cccccc" (12), linked 6
    over = "<p>a bb <a>ccccccc</a></p>"   # text "a bb ccccccc" (12), linked 7
    rows = _strip_rows(spark, [half, over])
    assert rows[0]["n_kept"] == 1 and rows[0]["content"] == "aa bb cccccc"
    assert rows[1]["n_kept"] == 0


def test_strip_preserves_dom_order(spark):
    html = "<p>first good block here</p><p>second good block here</p>"
    r = _strip_rows(spark, [html])[0]
    assert r["content"] == "first good block here\n\nsecond good block here"


def test_synthesize_then_strip_matches_python_derivation(spark):
    """Round-trip over a small real slice: the Spark stripper's output
    must equal a plain-Python reimplementation of the oracle rule
    (good = non-promo-drawn chunks with >= HB_MIN_WORDS words)."""
    import hashlib

    docs = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").limit(50)
    got = {r["doc_id"]: (r["n_blocks"], r["n_kept"], r["content"])
           for r in H.strip_boilerplate(H.synthesize_html(docs)).collect()}
    for row in docs.collect():
        toks = row["text"].split(" ")
        chunks = [" ".join(toks[i:i + H.HB_CHUNK_WORDS])
                  for i in range(0, len(toks), H.HB_CHUNK_WORDS)]
        good = [
            ch for j, ch in enumerate(chunks)
            if int(hashlib.md5(
                f"{row['doc_id']}:hb:{j}".encode()).hexdigest()[0], 16)
            >= H.HB_BOILER_BELOW and len(ch.split(" ")) >= H.HB_MIN_WORDS
        ]
        assert got[str(row["doc_id"])] == (
            len(chunks) + 2, len(good), "\n\n".join(good))


def test_html_query_plan_is_zero_exchange(spark):
    plan = H.html_main_content(
        spark, "/root/testdata/sf0.001")._sc._jvm.PythonSQLUtils.explainString(
        H.html_main_content(
            spark, "/root/testdata/sf0.001")._jdf.queryExecution(),
        "formatted")
    assert "Exchange" not in plan, plan
    m = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert m and "doc_id" in m[0] and "text" in m[0] and "lang" not in m[0], plan


def test_strip_handles_multiline_blocks(spark):
    """Java regex '.' does not match line terminators — without (?s) a
    block whose text contains a newline is unmatchable and silently
    dropped while the oracle still counts it."""
    html = "<p>first line\nsecond line here</p><p>plain good block here</p>"
    r = _strip_rows(spark, [html])[0]
    assert (r["n_blocks"], r["n_kept"]) == (2, 2)
    assert r["content"] == (
        "first line\nsecond line here\n\nplain good block here")


def test_synthesize_escapes_markup_and_roundtrips(spark):
    """Raw text containing literal markup ('<p>', '&', '</div>') must
    survive synthesize -> strip unchanged: the synthesizer
    entity-escapes it so it can never open/close a block, and the
    stripper unescapes after tag removal, so extracted content equals
    the raw text — exactly what the raw-text oracle predicts."""
    import hashlib

    texts = [
        "alpha <p>not a block</p> beta gamma delta",
        "amp & lt < gt > mix <div>x</div> tail words here now",
        "line one\nline two three four five six seven",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
    got = {r["doc_id"]: (r["n_blocks"], r["n_kept"], r["content"])
           for r in H.strip_boilerplate(H.synthesize_html(docs)).collect()}
    for i, text in enumerate(texts):
        toks = text.split(" ")
        chunks = [" ".join(toks[j:j + H.HB_CHUNK_WORDS])
                  for j in range(0, len(toks), H.HB_CHUNK_WORDS)]
        good = [
            ch for j, ch in enumerate(chunks)
            if int(hashlib.md5(
                f"{i}:hb:{j}".encode()).hexdigest()[0], 16)
            >= H.HB_BOILER_BELOW and len(ch.split(" ")) >= H.HB_MIN_WORDS
        ]
        assert got[str(i)] == (len(chunks) + 2, len(good), "\n\n".join(good))


def test_extract_outlinks_order_and_count(spark):
    html = ('<nav><a href="/h">home</a> <a href="/c">contact</a></nav>'
            '<p>plain</p>'
            '<div class="promo"><a href="/x">buy</a></div>'
            '<div class="promo"><a href="/y">buy two</a></div>'
            '<footer><a href="/t">terms</a></footer>')
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    r = H.extract_outlinks(df).collect()[0]
    import hashlib
    assert r["n_links"] == 5
    assert r["hrefs_md5"] == hashlib.md5(
        b"/h,/c,/x,/y,/t").hexdigest()     # DOM order preserved


def test_outlinks_query_plan_is_zero_exchange(spark):
    df = H.html_outlinks(spark, "/root/testdata/sf0.001")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "Exchange" not in plan, plan
