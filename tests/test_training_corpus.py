"""The composed training-corpus filter: the registered (materialized,
scan-once) variant must be value-identical to the lazy reference
composition, and every leg must stay load-bearing."""

from dots_ocr_spark import queries as Q

SF = "/root/testdata/sf0.001"


def test_materialized_matches_lazy_composition(spark):
    mat = sorted(map(tuple, Q.q_training_corpus(spark, SF).collect()))
    lazy = sorted(map(tuple, Q.q_training_corpus_lazy(spark, SF).collect()))
    assert len(mat) > 0
    assert mat == lazy


def test_materialized_legs_are_load_bearing(spark, tmp_path):
    """Each verdict table must filter a doc the other two keep — a
    planted 4-doc corpus where doc 2 dies only to dedup (byte-identical
    to doc 1), doc 3 only to the repetition gate (top-word frac 0.4),
    doc 4 only to the quality gate (<20 tokens)."""
    base = " ".join(f"w{i}" for i in range(25))
    rep_heavy = " ".join(["rep"] * 10 + [f"u{i}" for i in range(15)])
    rows = [
        (1, base),
        (2, base),
        (3, rep_heavy),
        (4, "a b c d e f g h i j"),
    ]
    d = str(tmp_path / "planted")
    spark.createDataFrame(
        [(i, t, len(t)) for i, t in rows],
        "doc_id long, text string, n_chars int",
    ).write.parquet(f"{d}/documents.parquet")

    kept = {r[0] for r in Q.q_training_corpus(spark, d).select("doc_id").collect()}
    assert kept == {1}
    verdicts = {
        t: {r[0] for r in spark.table(t).select("doc_id").collect()}
        for t in ("tc_surv", "tc_rep", "tc_qual")
    }
    assert verdicts["tc_surv"] == {1, 3, 4}
    assert verdicts["tc_rep"] == {1, 2, 4}
    assert verdicts["tc_qual"] == {1, 2, 3}


def test_verdict_tables_are_doc_grain(spark):
    """Each materialized leg is one row per doc_id (verdict grain)."""
    Q.q_training_corpus(spark, SF)
    for t in ("tc_docs", "tc_surv", "tc_rep", "tc_qual"):
        df = spark.table(t)
        assert df.count() == df.select("doc_id").distinct().count()


def test_scratch_isolated_per_invocation(spark):
    """Two concurrent same-user processes must never corrupt each
    other's legs: every invocation writes into its own uuid run dir
    under the user-scoped parent, a foreign process's live run dir is
    never touched, and this process's PREVIOUS run dir is reclaimed so
    /tmp stays bounded."""
    import os

    # simulate another process's live scratch under the shared parent
    foreign = os.path.join(Q.TC_SCRATCH, "foreign_process_run")
    os.makedirs(foreign, exist_ok=True)
    sentinel = os.path.join(foreign, "leg.parquet")
    open(sentinel, "w").write("live")

    first = sorted(map(tuple, Q.q_training_corpus(spark, SF).collect()))
    dir_a = Q._tc_run_dir
    assert dir_a and os.path.isdir(dir_a)
    assert os.path.dirname(dir_a) == Q.TC_SCRATCH

    second = sorted(map(tuple, Q.q_training_corpus(spark, SF).collect()))
    dir_b = Q._tc_run_dir
    assert dir_b != dir_a                    # fresh dir per invocation
    assert not os.path.exists(dir_a)         # previous run reclaimed
    assert first == second

    # the foreign run dir survived both invocations AND this process's
    # exit-time cleanup path
    Q._cleanup_tc_scratch()
    assert os.path.exists(sentinel)
    os.remove(sentinel)
    os.rmdir(foreign)
