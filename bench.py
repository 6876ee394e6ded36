#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:

    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized with a cheap count-collect (the driver collects
separately; here we only need the plan to execute fully). Timing is
per-query wall clock; ``value`` is the total.

Extra fields (informational, not part of the driver contract):
``docs_per_sec`` — end-to-end extraction throughput of the flagship
pipeline, the authoritative BASELINE.json metric (see BENCH/BASELINE.md
for the two-parallelism scaling run produced by tools/bench_scaling.py).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time


def build_spark(cpus: int):
    from pyspark.sql import SparkSession

    return (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName("dots-ocr-spark-bench")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )


# NOTE (round-over-round comparability): this list is append-only within
# a round series and every query's INPUT construction is frozen — the
# bench JSON records per-query output row counts (``query_rows``) so a
# changed input is immediately visible as a row-count shift rather than
# a silent timing discontinuity (the r01→r02 ambiguity).
HEADLINE = [
    "extract_spans",
    "extract_docs",
    "extract_from_corpus",
    "token_stats",
    "quality_score",
    "fingerprint",
    "langid",
    "corpus_stats",
    "media_decode",
    "dedup_exact",
    "minhash_signature",
    "minhash_band_buckets",
    "simhash",
    "embed_topk",
    "embed_ann_buckets",
    "pricing_summary",
    "revenue_by_nation",
    "top_orders",
    "top_orders_per_cust",
    "customers_without_orders",
    "event_value_rollup",
    "asof_click_before_error",
    "sessionize",
    # round-3 additions (appended; earlier entries unchanged)
    "extract_wordgrain",
    "extract_toc",
    "extract_twocol",
    "winnow_fingerprints",
    "quality_repetition",
    "training_corpus",
    # round-4 additions (appended; earlier entries unchanged)
    "extract_cleaner_probe",
    "html_main_content",
    # round-5 additions (appended; earlier entries unchanged)
    "dedup_survivors_cc",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    spark = build_spark(cpus)
    spark.sparkContext.setLogLevel("ERROR")

    from __spark_entry__ import queries

    qs = queries()
    # Headline = the representative fast set. The pair-verification
    # queries (jaccard_pairs, embed_neardup_pairs, simhash_band_buckets)
    # are value-checked by the correctness gate at sf0.01 but excluded
    # here: their candidate volume is a property of the tiny synthetic
    # corpus's similarity structure, not of engine speed.
    names = [n for n in HEADLINE if n in qs]

    # Warmup: initialize Python workers / Arrow / codegen on every core so
    # timings measure steady-state throughput, not JVM+worker cold start.
    # The flagship path is additionally warmed at sf0.001 (500 docs) so
    # its first timed run is not dominated by whole-stage-codegen compile.
    from dots_ocr_spark import pipeline as _p

    _p.extract(_p.generate_input(spark, 64)).count()
    warm_sf = os.path.join(os.path.dirname(sf_dir.rstrip("/")), "sf0.001")
    if "extract_spans" in qs and os.path.isdir(warm_sf):
        qs["extract_spans"](spark, warm_sf).count()

    # Pre-suite health probe: flagship-extract throughput over a small
    # fresh input (workers already warm). The asymmetric co-tenant this
    # VM carries can depress individual legs 3-5x; recording the probe
    # makes a polluted record self-describing instead of looking like a
    # code regression (the r4 phantom-regression lesson).
    t0 = time.perf_counter()
    n_probe = _p.extract(_p.generate_input(spark, 2000, partitions=cpus)).count()
    probe_dps = round(n_probe / (time.perf_counter() - t0), 1)

    # Per-query reference bests (committed; merge-min across rounds).
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "BENCH", "bench_reference.json")
    try:
        ref = json.load(open(ref_path))["best_sec"]
    except Exception:
        ref = {}
    if abs(sf - 0.1) > 1e-9:
        ref = {}    # reference bests are sf0.1-specific

    # Best-of-2 per query, escalating to best-of-4 when the result still
    # exceeds 1.5x the committed reference best: a single co-tenant
    # burst then has to survive four separate windows to pollute the
    # record, and anything that does is labeled ``contended`` instead of
    # masquerading as a regression. (Round-4's recorded 2-3x
    # "regressions" on untouched shuffle queries did not survive ONE
    # re-run — this automates that adjudication.)
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    contended: list[str] = []
    for name in names:
        best = float("inf")
        runs = 0
        while runs < 4:
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            rows[name] = df.count()
            best = min(best, time.perf_counter() - t0)
            runs += 1
            if runs >= 2 and (name not in ref or best <= 1.5 * ref[name]):
                break
        if name in ref and best > 1.5 * ref[name]:
            contended.append(name)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # throughput from MEASURED counts (extract_docs is one row per doc),
    # never from a duplicated sizing constant
    flagship_t = timings.get("extract_docs", 0.0) or 1e-9
    out = {
        "metric": "headline query suite wall-clock (extraction + dedup + analytics)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": cpus,
        "timing": "best-of-2 per query, best-of-4 when >1.5x the "
                  "committed reference best (host co-tenant guard)",
        "probe_docs_per_sec": probe_dps,
        "contended_queries": contended,
        "extract_spans_rows": rows.get("extract_spans", 0),
        "extract_docs_per_sec": round(rows.get("extract_docs", 0) / flagship_t, 2),
        # per-query output row counts: freezes the input contract — a
        # row-count shift flags an input change that would make timings
        # non-comparable across rounds
        "query_rows": rows,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    sys.exit(main())
