"""Deduplication operators for the training-data pipeline.

Exact dedup and MinHash live in queries.py; this module adds:

  * **SimHash** — 60-bit signature from per-word 60-bit hashes
    (bit-majority vote), plus 4×15-bit band buckets for near-dup
    candidate generation. 60 bits (15 hex chars of md5) keeps the value
    inside a signed 64-bit int in BOTH engines, so Spark and DuckDB
    compute identical signatures.
  * **Shingle Jaccard verification** — the second LSH stage: MinHash band
    buckets propose candidate pairs (one shuffle, no O(n²)), then exact
    word-3-gram Jaccard is computed ONLY for those pairs.

Scale notes: SimHash is a single groupBy(doc) over exploded words —
map-side partial aggregation keeps the shuffle at one row per (doc, 60
votes). The Jaccard verify joins exploded shingles only for candidate
pairs; candidates are a tiny fraction of the corpus, so the join's build
side stays broadcastable at 100 TB corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

N_BITS = 60
N_BANDS = 4
BAND_BITS = N_BITS // N_BANDS

#: skew guard for LSH candidate generation: buckets holding more than
#: this many documents switch from all-pairs to STAR pair enumeration. A
#: bucket of size k contributes k(k-1)/2 candidate pairs, so one
#: degenerate bucket (a near-constant boilerplate cluster on a web
#: corpus) would go quadratic. Members of an oversized bucket are NOT
#: dropped — a large near-identical cluster collides in EVERY band, so
#: dropping it would let exactly the most-duplicated content escape
#: near-dup dedup; instead each member pairs with the bucket's min id
#: (O(k) pairs, the star keeps the cluster connected so downstream
#: greedy drop / connected components still collapse it).
MAX_BUCKET_MEMBERS = 64


def lsh_candidate_pairs(df: DataFrame, *keys: str, id_col: str = "doc_id",
                        payload: tuple[str, ...] = ()) -> DataFrame:
    """Candidate pair enumeration shared by every LSH family, with the
    degenerate-bucket skew guard.

    Buckets holding <= MAX_BUCKET_MEMBERS rows enumerate all k(k-1)/2
    pairs (self-join on the bucket keys). LARGER buckets emit O(k) STAR
    pairs instead — each member against the bucket's min id — bounding
    any bucket's contribution at max(CAP²/2, k-1) pairs while keeping
    the cluster connected: greedy drop-doc_j and min-label connected
    components both still collapse it to one representative.

    Output columns: ``id_i``/``id_j`` plus ``<c>_i``/``<c>_j`` for every
    payload column. Pairs can repeat across bands/buckets — callers
    apply their verify filter and then ``distinct`` (filtering first
    keeps the distinct's exchange small). Both window aggregates run
    over the SAME keys the self-join shuffles on — co-partitioned, no
    extra exchange; the star leg is a projection off the same windowed
    scan (the struct-min carries the min id's payload with it).
    """
    w = Window.partitionBy(*keys)
    carry = F.struct(F.col(id_col), *[F.col(c) for c in payload])
    ann = (
        df.withColumn("_bn", F.count("*").over(w))
        .withColumn("_bmin", F.min(carry).over(w))
    )
    small = ann.where(F.col("_bn") <= MAX_BUCKET_MEMBERS)
    a, b = small.alias("a"), small.alias("b")
    all_pairs = (
        a.join(b, list(keys))
        .where(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_i"),
            F.col(f"b.{id_col}").alias("id_j"),
            *[F.col(f"a.{c}").alias(f"{c}_i") for c in payload],
            *[F.col(f"b.{c}").alias(f"{c}_j") for c in payload],
        )
    )
    star = (
        ann.where((F.col("_bn") > MAX_BUCKET_MEMBERS)
                  & (F.col(id_col) > F.col("_bmin")[id_col]))
        .select(
            F.col("_bmin")[id_col].alias("id_i"),
            F.col(id_col).alias("id_j"),
            *[F.col("_bmin")[c].alias(f"{c}_i") for c in payload],
            *[F.col(c).alias(f"{c}_j") for c in payload],
        )
    )
    return all_pairs.unionByName(star)


def _oracle_pair_sql(bands_cte: str, *keys: str, id_col: str = "doc_id",
                     payload: tuple[str, ...] = ()) -> str:
    """DuckDB mirror of :func:`lsh_candidate_pairs`: all-pairs from
    small buckets UNION ALL star pairs from oversized ones, over a
    ``bands_cte`` relation carrying (id, payload..., keys...)."""
    on = " AND ".join(f"a.{k} = c.{k}" for k in keys)
    pay_sel_a = "".join(f", a.{c} AS {c}_i" for c in payload)
    pay_sel_c = "".join(f", c.{c} AS {c}_j" for c in payload)
    return f"""
  SELECT a.{id_col} AS id_i, c.{id_col} AS id_j{pay_sel_a}{pay_sel_c}
  FROM {bands_cte} a JOIN {bands_cte} c ON {on}
  WHERE a.bn <= {MAX_BUCKET_MEMBERS} AND c.bn <= {MAX_BUCKET_MEMBERS}
    AND a.{id_col} < c.{id_col}
  UNION ALL
  SELECT bmin AS id_i, {id_col} AS id_j{"".join(
      f", bmin_{c} AS {c}_i, {c} AS {c}_j" for c in payload)}
  FROM {bands_cte}
  WHERE bn > {MAX_BUCKET_MEMBERS} AND {id_col} > bmin"""


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, simhash) — 60-bit bit-majority signature over distinct
    words. Hash = first 15 hex chars of md5(word) as int."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    words = d.select(
        "doc_id",
        F.explode(F.array_distinct(F.split("text", " "))).alias("w"),
    ).select(
        "doc_id",
        F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long").alias("h"),
    )
    votes = words.groupBy("doc_id").agg(*[
        F.sum(
            F.when((F.expr(f"h div {1 << b}") % 2) == 1, 1).otherwise(-1)
        ).alias(f"v{b}")
        for b in range(N_BITS)
    ])
    sig = sum(
        (F.when(F.col(f"v{b}") > 0, F.lit(1 << b)).otherwise(F.lit(0))
         for b in range(N_BITS)),
        start=F.lit(0).cast("long"),
    )
    return votes.select("doc_id", sig.cast("long").alias("simhash"))


def _oracle_simhash_body() -> str:
    votes = ",\n         ".join(
        f"sum(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(N_BITS)
    )
    sig = " + ".join(
        f"CASE WHEN v{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(N_BITS)
    )
    return f"""
WITH words AS (
  SELECT doc_id,
         CAST(('0x' || substring(md5(w), 1, 15)) AS BIGINT) AS h
  FROM (SELECT doc_id, unnest(list_distinct(string_split(text, ' '))) AS w
        FROM documents)
), votes AS (
  SELECT doc_id,
         {votes}
  FROM words GROUP BY doc_id
)
SELECT doc_id, CAST({sig} AS BIGINT) AS simhash FROM votes
"""


ORACLE_SIMHASH = _oracle_simhash_body()


def simhash_band_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup candidate buckets: the 60-bit signature split into 4
    15-bit bands; docs sharing any band value are candidates."""
    sig = simhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                (F.expr(f"simhash div {1 << (i * BAND_BITS)}")
                 % (1 << BAND_BITS)).cast("long").alias("bucket"),
            )
            for i in range(N_BANDS)
        ])).alias("b"),
    ).select("doc_id", "b.band", "b.bucket")
    return (
        bands.groupBy("band", "bucket")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .where(F.col("n_docs") > 1)
    )


#: max simhash bit-distance for the near-dup verdict (60-bit signatures;
#: 6 bits ≈ 90% bit agreement)
SIMHASH_MAX_HAMMING = 6


def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs: candidates = docs sharing any 15-bit band
    bucket (one shuffle; degenerate buckets degrade to star pairing),
    verified by exact Hamming distance over the full 60-bit signatures
    (bit_count(xor) — codegen'd, only on candidate pairs)."""
    sig = simhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("band"),
                (F.expr(f"simhash div {1 << (i * BAND_BITS)}")
                 % (1 << BAND_BITS)).cast("long").alias("bucket"),
            )
            for i in range(N_BANDS)
        ])).alias("b"),
    ).select("doc_id", "simhash", "b.band", "b.bucket")
    pairs = lsh_candidate_pairs(
        bands, "band", "bucket", payload=("simhash",))
    return (
        pairs.select(
            F.col("id_i").alias("doc_i"),
            F.col("id_j").alias("doc_j"),
            F.bit_count(
                F.col("simhash_i").bitwiseXOR(F.col("simhash_j"))
            ).cast("long").alias("hamming"),
        )
        # filter BEFORE distinct: hamming is a function of the pair, so
        # the result is identical but the distinct's exchange only
        # carries the (few) passing pairs instead of every bucket
        # collision
        .where(F.col("hamming") <= SIMHASH_MAX_HAMMING)
        .distinct()
    )


ORACLE_SIMHASH_BANDS = f"""
WITH sig AS ({ORACLE_SIMHASH}),
bands AS (
  {" UNION ALL ".join(
    f"SELECT doc_id, {i} AS band, "
    f"CAST((simhash // {1 << (i * BAND_BITS)}) % {1 << BAND_BITS} AS BIGINT) AS bucket "
    f"FROM sig"
    for i in range(N_BANDS)
  )}
)
SELECT band, bucket, count(*) AS n_docs, min(first_doc) AS first_doc
FROM (SELECT band, bucket, doc_id, doc_id AS first_doc FROM bands)
GROUP BY band, bucket HAVING count(*) > 1
"""


ORACLE_SIMHASH_NEARDUP = f"""
WITH sig AS ({ORACLE_SIMHASH}),
bands_all AS (
  {" UNION ALL ".join(
    f"SELECT doc_id, simhash, {i} AS band, "
    f"CAST((simhash // {1 << (i * BAND_BITS)}) % {1 << BAND_BITS} AS BIGINT) AS bucket "
    f"FROM sig"
    for i in range(N_BANDS)
  )}
), bands AS (
  SELECT doc_id, simhash, band, bucket,
         count(*) OVER (PARTITION BY band, bucket) AS bn,
         min(doc_id) OVER (PARTITION BY band, bucket) AS bmin,
         arg_min(simhash, doc_id) OVER (PARTITION BY band, bucket)
           AS bmin_simhash
  FROM bands_all
), pairs AS (
  SELECT DISTINCT id_i AS doc_i, id_j AS doc_j,
         CAST(bit_count(xor(simhash_i, simhash_j)) AS BIGINT) AS hamming
  FROM ({_oracle_pair_sql("bands", "band", "bucket",
                          payload=("simhash",))}
  )
)
SELECT doc_i, doc_j, hamming FROM pairs WHERE hamming <= {SIMHASH_MAX_HAMMING}
"""


# ---------------------------------------------------------------------------
# Shingle Jaccard verification of MinHash-LSH candidates
# ---------------------------------------------------------------------------

def _shingle_expr():
    """Distinct word-3-gram shingles of the ``text`` column.

    Shape matters twice here:

    * Docs with fewer than 3 words yield an EMPTY array (no 3-shingles)
      — the zip-of-shifted-slices construction cannot index out of
      bounds, unlike a ``sequence(0, size-3)`` + ``element_at`` form
      whose descending sequence threw on short documents. The DuckDB
      oracles' ``WHERE len(toks) >= 3`` is the same gate.
    * Every lambda references ONLY its lambda variable. Higher-order
      functions are interpreted, and a lambda body that mentions an
      outer expression (``element_at(split(text), i+k)``) re-evaluates
      that whole subtree per element — the naive form re-split the text
      three times per shingle (measured ~8s for 5k docs at sf0.1). Here
      the token array and its two shifted slices are each evaluated once
      per row, zipped, and the lambdas just fold struct fields.
    """
    toks = F.split("text", " ")
    t2 = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    t3 = F.slice(toks, 3, F.greatest(F.size(toks) - 2, F.lit(0)))
    z = F.arrays_zip(toks.alias("a"), t2.alias("b"), t3.alias("c"))
    tri = F.filter(z, lambda s: s["c"].isNotNull())
    return F.array_distinct(
        F.transform(tri, lambda s: F.concat_ws(" ", s["a"], s["b"], s["c"]))
    )


def _minhash_bands_df(d: DataFrame) -> DataFrame:
    """(doc_id, band, bucket) — 2 bands × 4 MinHash permutations over
    word-3-gram SHINGLES.

    Shingles, not words: on a small-vocabulary corpus word-level
    min-hashes collide massively (measured: two buckets holding 3855 and
    2967 of 5000 docs → 9M candidate pairs); the shingle space is large
    enough that bucket sizes track true similarity. Band width r=4 puts
    the S-curve 50%-recall point at j ≈ (1/2)^(1/4) ≈ 0.84 — tuned for
    near-DUPLICATE detection (the word-level 2-permutation variant in
    queries.q_minhash_band_buckets demonstrates the loose end of the
    trade-off)."""
    # Explode shingles to rows and take groupBy-partial MINs instead of
    # array_min(transform(...)) projections: higher-order functions are
    # interpreted (no whole-stage codegen) AND CollapseProject inlines the
    # shingle-building subexpression into every consumer, so the
    # projection form recomputed the shingle array once for the filter
    # plus once per permutation (9x; measured 9.3s -> 1.4s at sf0.1).
    # Exploded md5+min are codegen'd and combine map-side, shuffling one
    # row per document — the shape that survives a 100x corpus.
    # (min over the multiset == min over the distinct set, so dropping
    # array_distinct preserves oracle parity.)
    ex = d.select("doc_id", F.explode(_shingle_expr()).alias("w"))
    sig = ex.groupBy("doc_id").agg(*[
        F.min(F.md5(F.concat(F.lit(f"p{i}:"), F.col("w")))).alias(f"mh{i}")
        for i in range(8)
    ])
    return sig.select(
        "doc_id",
        F.explode(F.array(
            F.struct(F.lit(0).alias("band"),
                     F.md5(F.concat("mh0", "mh1", "mh2", "mh3")).alias("bucket")),
            F.struct(F.lit(1).alias("band"),
                     F.md5(F.concat("mh4", "mh5", "mh6", "mh7")).alias("bucket")),
        )).alias("b"),
    ).select("doc_id", "b.band", "b.bucket")


def _minhash_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _minhash_bands_df(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))


def dedup_survivors_df(d0: DataFrame) -> DataFrame:
    """The composed production dedup flow in one query: exact dedup
    (keep-first per text hash) → shingle-MinHash LSH candidates → exact
    Jaccard verify → greedy near-dup drop (a doc is dropped when a
    SMALLER-id doc is near-identical; ``jaccard_pairs`` always emits
    doc_i < doc_j, so dropping every doc_j is the standard one-pass
    rule). Returns the surviving document set — the corpus a training
    run would actually keep. Takes the documents frame directly so the
    materialized ``training_corpus`` can point it at a bucketed scratch
    copy instead of re-scanning the source corpus."""
    reps = (
        d0.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    near_j = jaccard_pairs_df(d0).select(
        F.col("doc_j").alias("doc_id")).distinct()
    return (
        reps.join(near_j, "doc_id", "left_anti")
        .select("doc_id", "text_md5")
    )


def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_survivors_df(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))


ORACLE_DEDUP_SURVIVORS = f"""
WITH pairs AS ({{jaccard}}),
reps AS (
  SELECT md5(text) AS text_md5, min(doc_id) AS doc_id
  FROM documents GROUP BY md5(text)
)
SELECT doc_id, text_md5 FROM reps
WHERE doc_id NOT IN (SELECT doc_j FROM pairs)
"""


_MH_COLS = ",\n         ".join(
    f"list_min(list_transform(shset, w -> md5('p{i}:' || w))) AS mh{i}"
    for i in range(8)
)


def jaccard_pairs_df(d0: DataFrame, threshold: float = 0.5) -> DataFrame:
    """DataFrame-parameterized body of :func:`jaccard_pairs` (see its
    docstring); every internal leg derives from the ONE frame ``d0``."""
    reps = (
        d0.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    bands = _minhash_bands_df(d0).join(reps, "doc_id")
    cand = (
        lsh_candidate_pairs(bands, "band", "bucket")
        .select(F.col("id_i").alias("doc_i"),
                F.col("id_j").alias("doc_j"))
        .distinct()
    )

    d = d0.join(reps, "doc_id")
    shingles = d.where(F.size(F.split("text", " ")) >= 3).select(
        "doc_id", _shingle_expr().alias("sh"),
    )
    # verify by joining the (small, distinct) shingle ARRAYS onto each
    # candidate pair and intersecting per pair with the codegen'd
    # array_intersect — an exploded shingle equi-join materializes and
    # shuffles |candidates| × |shared shingles| rows (measured ~40×
    # slower at sf0.1). Two key-joins + a per-row set intersection.
    return (
        cand
        .join(shingles.select(F.col("doc_id").alias("doc_i"),
                              F.col("sh").alias("sh_i")), "doc_i")
        .join(shingles.select(F.col("doc_id").alias("doc_j"),
                              F.col("sh").alias("sh_j")), "doc_j")
        .withColumn("n_inter",
                    F.size(F.array_intersect("sh_i", "sh_j")).cast("long"))
        .select(
            "doc_i", "doc_j",
            (F.col("n_inter") /
             (F.size("sh_i").cast("long") + F.size("sh_j").cast("long")
              - F.col("n_inter"))).alias("jaccard"),
        )
        .where(F.col("jaccard") >= threshold)
    )


def minhash_band_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Production MinHash-LSH banding over word-3-gram SHINGLES (2 bands
    × 4 permutations, r=4 ⇒ 50%-recall at j ≈ 0.84): buckets holding >1
    doc are the near-dup candidate sets that ``jaccard_pairs`` verifies.
    One aggregation on the band hash — no pair enumeration. This is the
    variant registered with the driver; the loose word-level banding
    (queries.q_minhash_band_buckets_word) is kept as a documented demo of
    the S-curve trade-off."""
    bands = _minhash_bands(spark, sf_dir)
    return (
        bands.groupBy("band", "bucket")
        .agg(F.count("*").alias("n_docs"), F.min("doc_id").alias("first_doc"))
        .where(F.col("n_docs") > 1)
    )


ORACLE_MINHASH_SHINGLE_BANDS = f"""
WITH sh AS (
  SELECT doc_id, list_distinct([
           toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           FOR i IN range(1, len(toks) - 1)
         ]) AS shset
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
  WHERE len(toks) >= 3
), sig AS (
  SELECT doc_id,
         {_MH_COLS}
  FROM sh WHERE len(shset) >= 1
), bands AS (
  SELECT doc_id, 0 AS band, md5(mh0 || mh1 || mh2 || mh3) AS bucket FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(mh4 || mh5 || mh6 || mh7) AS bucket FROM sig
)
SELECT band, bucket, count(*) AS n_docs, min(doc_id) AS first_doc
FROM bands GROUP BY band, bucket HAVING count(*) > 1
"""


def jaccard_pairs(spark: SparkSession, sf_dir: str,
                  threshold: float = 0.5) -> DataFrame:
    """LSH-verified near-dup pairs: candidate pairs from MinHash band
    buckets, exact word-3-gram Jaccard computed only for those pairs,
    kept when >= threshold.

    Pairing runs over exact-dup cluster REPRESENTATIVES (min doc_id per
    text hash), not raw docs: a cluster of k byte-identical documents
    would otherwise contribute k²/2 candidate pairs with jaccard 1 — a
    quadratic blowup on dup-heavy web corpora. Exact dedup (q_dedup_exact)
    precedes near-dedup in the pipeline, exactly as at production scale.
    """
    return jaccard_pairs_df(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), threshold)


ORACLE_JACCARD_PAIRS = f"""
WITH reps AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), sh AS (
  SELECT doc_id, list_distinct([
           toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
           FOR i IN range(1, len(toks) - 1)
         ]) AS shset
  FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents
        WHERE doc_id IN (SELECT doc_id FROM reps))
  WHERE len(toks) >= 3
), sig AS (
  SELECT doc_id,
         {_MH_COLS}
  FROM sh WHERE len(shset) >= 1
), bands_all AS (
  SELECT doc_id, 0 AS band, md5(mh0 || mh1 || mh2 || mh3) AS bucket FROM sig
  UNION ALL
  SELECT doc_id, 1 AS band, md5(mh4 || mh5 || mh6 || mh7) AS bucket FROM sig
), bands AS (
  SELECT doc_id, band, bucket,
         count(*) OVER (PARTITION BY band, bucket) AS bn,
         min(doc_id) OVER (PARTITION BY band, bucket) AS bmin
  FROM bands_all
), cand AS (
  SELECT DISTINCT id_i AS doc_i, id_j AS doc_j
  FROM ({_oracle_pair_sql("bands", "band", "bucket")}
  )
)
SELECT c.doc_i, c.doc_j,
       CAST(len(list_intersect(si.shset, sj.shset)) AS BIGINT)
       / (CAST(len(si.shset) AS BIGINT) + CAST(len(sj.shset) AS BIGINT)
          - CAST(len(list_intersect(si.shset, sj.shset)) AS BIGINT)) AS jaccard
FROM cand c
JOIN sh si ON si.doc_id = c.doc_i
JOIN sh sj ON sj.doc_id = c.doc_j
WHERE CAST(len(list_intersect(si.shset, sj.shset)) AS BIGINT)
      / (CAST(len(si.shset) AS BIGINT) + CAST(len(sj.shset) AS BIGINT)
         - CAST(len(list_intersect(si.shset, sj.shset)) AS BIGINT)) >= 0.5
"""

# the survivors oracle composes the jaccard-pairs oracle (defined above)
ORACLE_DEDUP_SURVIVORS = ORACLE_DEDUP_SURVIVORS.format(
    jaccard=ORACLE_JACCARD_PAIRS)


# ---------------------------------------------------------------------------
# Near-dup clustering: connected components over the verified pair graph
# ---------------------------------------------------------------------------

#: fixed propagation rounds for the ORACLE-CHECKED variant: label(v)
#: becomes the min doc_id within COMPONENT_ROUNDS hops, which equals the
#: true component id whenever the component's min-label distance is
#: within the bound — after exact-dedup collapse, near-dup components
#: are overwhelmingly pairs/triangles (diameter 1-2); 8 is generous.
#: The unbounded production variant is :func:`connected_components`.
COMPONENT_ROUNDS = 8


def _label_round(edges: DataFrame, labels: DataFrame) -> DataFrame:
    """One min-label propagation round over an undirected edge list:
    label(v) <- min(label(v), min(label(u) for u ~ v)). The result is
    ``localCheckpoint``'ed — lineage discipline is load-bearing for ANY
    iterative Spark loop: without per-round truncation each round
    re-embeds the full upstream plan (the LSH pair computation) into the
    next and Catalyst analysis goes exponential (8 un-truncated rounds
    hung the analyzer for minutes on a 40-node graph)."""
    nbr = (
        edges.join(labels, edges["v"] == labels["doc_id"])
        .select(edges["u"].alias("doc_id"), "label")
    )
    return (
        labels.unionByName(nbr)
        .groupBy("doc_id")
        .agg(F.min("label").alias("label"))
    ).localCheckpoint()


def _propagate_min_labels(nodes: DataFrame, edges: DataFrame,
                          rounds: int) -> DataFrame:
    """Exactly ``rounds`` propagation rounds (no convergence check) —
    the oracle-mirrorable fixed-bound variant."""
    edges = edges.localCheckpoint()
    labels = nodes.select(
        "doc_id", F.col("doc_id").alias("label")).localCheckpoint()
    for _ in range(rounds):
        labels = _label_round(edges, labels)
    return labels


def neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, component) for every document touched by a verified
    near-dup pair: COMPONENT_ROUNDS rounds of min-label propagation over
    the jaccard_pairs graph (component id = min doc_id reachable within
    the bound — the exact component for any cluster whose min-label
    distance fits, i.e. all realistic near-dup clusters). Each round is
    one join + one partial-aggregating groupBy on the PAIR GRAPH only —
    a tiny fraction of the corpus — so the iteration cost is independent
    of corpus size."""
    pairs = jaccard_pairs(spark, sf_dir).select("doc_i", "doc_j")
    edges = pairs.select(F.col("doc_i").alias("u"), F.col("doc_j").alias("v")) \
        .unionByName(
            pairs.select(F.col("doc_j").alias("u"), F.col("doc_i").alias("v")))
    nodes = edges.select(F.col("u").alias("doc_id")).distinct()
    return (
        _propagate_min_labels(nodes, edges, COMPONENT_ROUNDS)
        .select("doc_id", F.col("label").alias("component"))
    )


def connected_components(pairs: DataFrame, id_a: str = "doc_i",
                         id_b: str = "doc_j",
                         max_rounds: int = 50) -> DataFrame:
    """Production variant: iterate min-label propagation to a FIXPOINT
    (unbounded diameter; shares the round body with the fixed-bound
    variant). Raises if the fixpoint is not reached within
    ``max_rounds`` — returning partially-propagated labels would
    silently split one true component into several and let near-dups
    survive downstream keep-one-per-cluster dedup.
    Returns (doc_id, component)."""
    edges = pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v")) \
        .unionByName(
            pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v"))) \
        .localCheckpoint()
    nodes = edges.select(F.col("u").alias("doc_id")).distinct()
    labels = nodes.select("doc_id", F.col("doc_id").alias("label")) \
        .localCheckpoint()
    for _ in range(max_rounds):
        new_labels = _label_round(edges, labels)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "doc_id")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            return labels.select(
                "doc_id", F.col("label").alias("component"))
    raise RuntimeError(
        f"connected_components did not converge within {max_rounds} rounds "
        "(a component's min-label distance exceeds the bound); raise "
        "max_rounds — each extra round is one join + groupBy on the pair "
        "graph only")


def _cc_round_sql(prev: str, cur: str) -> str:
    # MATERIALIZED is load-bearing: every round references the previous
    # label CTE twice, so un-materialized CTEs inline the whole upstream
    # jaccard computation 2^rounds times and the oracle never finishes
    return f"""{cur} AS MATERIALIZED (
  SELECT n.doc_id,
         least(n.label, coalesce(min(nl.label), n.label)) AS label
  FROM {prev} n
  LEFT JOIN (SELECT e.u, l.label
             FROM edges e JOIN {prev} l ON l.doc_id = e.v) nl
    ON nl.u = n.doc_id
  GROUP BY n.doc_id, n.label
)"""


ORACLE_NEARDUP_COMPONENTS = (
    "WITH pairs AS MATERIALIZED ({jaccard}),\n"
    "edges AS MATERIALIZED (\n"
    "  SELECT doc_i AS u, doc_j AS v FROM pairs\n"
    "  UNION ALL\n"
    "  SELECT doc_j AS u, doc_i AS v FROM pairs\n"
    "),\n"
    "l0 AS MATERIALIZED (SELECT DISTINCT u AS doc_id, u AS label FROM edges),\n"
    + ",\n".join(_cc_round_sql(f"l{i}", f"l{i+1}")
                 for i in range(COMPONENT_ROUNDS))
    + f"\nSELECT doc_id, label AS component FROM l{COMPONENT_ROUNDS}"
).format(jaccard=ORACLE_JACCARD_PAIRS)


def dedup_survivors_cc_df(d0: DataFrame) -> DataFrame:
    """Keep-ONE-per-cluster dedup: exact-dup representatives → verified
    near-dup pairs → FIXPOINT connected components
    (:func:`connected_components`) → keep each component's min doc_id.

    The greedy flow (:func:`dedup_survivors_df`) drops every doc_j of a
    verified pair — cheap (no iteration), but it keeps every doc that
    only ever appears as the SMALLER id of its pairs, so a cluster whose
    pair graph is star-shaped around its largest id (a ~ c, b ~ c,
    a !~ b) keeps BOTH a and b. The component flow collapses the whole
    cluster to exactly one survivor regardless of pair-graph shape:
    cc_survivors ⊆ greedy_survivors always (pytest-pinned on an
    adversarial cluster). At corpus scale the iteration runs on the
    PAIR GRAPH only — a tiny fraction of corpus cardinality — with
    per-round ``localCheckpoint`` lineage truncation, so the extra cost
    over greedy is bounded by near-dup density, not corpus size."""
    reps = (
        d0.groupBy(F.md5("text").alias("text_md5"))
        .agg(F.min("doc_id").alias("doc_id"))
    )
    comp = connected_components(
        jaccard_pairs_df(d0).select("doc_i", "doc_j"))
    non_min = comp.where(F.col("doc_id") != F.col("component")) \
        .select("doc_id")
    return (
        reps.join(non_min, "doc_id", "left_anti")
        .select("doc_id", "text_md5")
    )


def dedup_survivors_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    return dedup_survivors_cc_df(
        spark.read.parquet(f"{sf_dir}/documents.parquet"))


#: oracle: the fixed-round component oracle nests inside a CTE (DuckDB
#: allows WITH in subqueries); survivors = exact-dup reps minus every
#: non-min member of a component. The Spark side iterates to FIXPOINT
#: while the oracle uses COMPONENT_ROUNDS — they agree whenever every
#: component's min-label distance fits the bound, which holds for any
#: realistic near-dup cluster (and is exactly the bound the
#: neardup_components driver row already value-checks).
ORACLE_DEDUP_SURVIVORS_CC = f"""
WITH comp AS MATERIALIZED (
{ORACLE_NEARDUP_COMPONENTS}
),
reps AS (
  SELECT md5(text) AS text_md5, min(doc_id) AS doc_id
  FROM documents GROUP BY md5(text)
)
SELECT doc_id, text_md5 FROM reps
WHERE doc_id NOT IN (SELECT doc_id FROM comp WHERE doc_id != component)
"""
