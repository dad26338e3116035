"""Distinct-count sketches for corpus profiling at 100 TB.

Exact ``COUNT(DISTINCT token)`` over a web-scale corpus shuffles every
distinct value; a KMV (k-minimum-values) sketch answers the same
question from the k smallest hash values per group — a bounded-size
state that merges associatively, so the whole computation is one
map-side-combinable aggregation.

Determinism contract (same as the rest of the engine): the hash is
``h60`` (md5-prefix bigint), so the sketch — and therefore the
ESTIMATE itself — is bit-identical across engines and parallelism
levels, and the DuckDB oracle replays it exactly (unlike Spark's
``approx_count_distinct`` HLL, whose estimate is engine-private).

Estimator (Bar-Yossef et al. 2002): with U(v) = (h60(v)+1)/2^60 ∈ (0,1]
uniform, and u_k the k-th smallest distinct hash of a group:
  distinct ≈ (k-1)/u_k        when the group has ≥ k distinct values
  distinct  = n (exact)       when it has n < k (the sketch holds all)
Standard error ≈ 1/sqrt(k-2) — k=256 gives ~6%.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from graphrag_rs_spark.functions.hashing import h60

_TWO60 = float(2 ** 60)


def kmv_distinct_by(values: DataFrame, group_col: str, value_col: str,
                    k: int = 256) -> DataFrame:
    """Per-group distinct-count estimate from a KMV sketch.

    → (group_col, n_kept:int, est_distinct:double) — ``n_kept`` is the
    sketch fill (min(k, true distinct)); ``est_distinct`` is rounded to
    4 dp so ranking/compare happen on the exported value.

    Plan: distinct (map-side combinable agg) → per-group bottom-k window
    on the 60-bit hash → one agg.  Sketch state is ≤ k rows per group at
    every point after the distinct, so the only full-width shuffle is
    the distinct itself — at true 100 TB scale swap the exact distinct
    for a pre-agg on (group, h) which is the same exchange; duplicate
    hashes collapse identically either way.
    """
    if k < 3:
        raise ValueError("k must be ≥ 3 for the (k-1)/u_k estimator")
    hashed = (
        values.select(F.col(group_col).alias("g"),
                      h60(F.col(value_col).cast("string")).alias("h"))
        # null values hash to null, which sorts FIRST ascending and
        # would occupy a sketch slot — a null is not a value; drop it
        .filter(F.col("h").isNotNull())
        .groupBy("g", "h").agg(F.lit(1).alias("_one")).drop("_one"))
    w = Window.partitionBy("g").orderBy(F.col("h").asc())
    kept = hashed.withColumn("_rn", F.row_number().over(w)) \
        .filter(F.col("_rn") <= int(k))
    est = F.when(
        F.col("n_kept") < int(k),
        F.col("n_kept").cast("double"),
    ).otherwise((F.lit(float(k - 1)))
                / ((F.col("u_k") + 1.0) / F.lit(_TWO60)))
    return (
        kept.groupBy("g")
        .agg(F.count(F.lit(1)).alias("n_kept"),
             F.max("h").alias("u_k"))
        .select(F.col("g").alias(group_col), "n_kept",
                F.round(est, 4).alias("est_distinct"))
    )


def kmv_distinct(values: DataFrame, value_col: str, k: int = 256) -> DataFrame:
    """Global distinct-count estimate → 1 row (n_kept, est_distinct)."""
    one = values.select(F.lit(0).alias("_g"),
                        F.col(value_col).alias(value_col))
    return kmv_distinct_by(one, "_g", value_col, k).drop("_g")


def _cms_bucket(key: Column, row_i: int, width: int) -> Column:
    """Row-i CMS bucket of a key: h60 of a row-salted key, mod width.

    The salt goes IN FRONT of the key (``cms{i}:<key>``) so the depth
    rows are independent hash functions; both engines compute the same
    positive bigint % positive int.
    """
    return h60(F.concat(F.lit(f"cms{row_i}:"), key)) % F.lit(int(width))


def cms_build(df: DataFrame, key_col: str,
              depth: int = 4, width: int = 2048) -> DataFrame:
    """Count-min sketch counter table → (row_i:int, bucket:bigint, cnt:bigint).

    Cormode & Muthukrishnan 2005: depth independent hash rows × width
    counters; est(key) = min over rows of counter[row][h_row(key)], an
    OVERestimate with error ≤ εN (ε = e/width) w.p. 1−e^−depth.  The
    point at 100 TB: the sketch is ≤ depth·width rows of bounded state
    that merges by SUMMING counters (union two corpora = unionByName +
    re-agg), so frequency questions never need a per-key shuffle of the
    full stream — one map-side-combinable agg, exactly like the KMV
    sketch above.  Deterministic h60 hashing keeps every counter — and
    therefore every ESTIMATE — bit-identical across engines and
    parallelism levels.
    """
    k = F.col(key_col).cast("string")
    rows = F.array(*[
        F.struct(F.lit(i).alias("row_i"),
                 _cms_bucket(k, i, width).alias("bucket"))
        for i in range(int(depth))])
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.explode(rows).alias("rb"))
        .groupBy(F.col("rb.row_i").alias("row_i"),
                 F.col("rb.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_estimate(counters: DataFrame, keys: DataFrame, key_col: str,
                 depth: int = 4, width: int = 2048) -> DataFrame:
    """Point-query a CMS → (key_col, est_cnt:bigint), min over depth rows.

    `keys` is the CANDIDATE set (distinct, null-free after the filter
    here) — at scale it comes from a prior stage (a sample, a watchlist,
    a join key set), never from re-enumerating the sketched stream; the
    sketch's job is to answer for a bounded candidate set without
    re-scanning the corpus.  `counters` is ≤ depth·width rows, so the
    join below broadcasts.  Keys absent from the stream read 0 via the
    coalesce (their bucket may be missing entirely).
    """
    k = F.col(key_col).cast("string")
    probes = keys.select(F.col(key_col)).filter(
        F.col(key_col).isNotNull()).distinct().select(
        key_col,
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("row_i"),
                     _cms_bucket(k, i, width).alias("bucket"))
            for i in range(int(depth))])).alias("rb"),
    ).select(key_col, F.col("rb.row_i").alias("row_i"),
             F.col("rb.bucket").alias("bucket"))
    return (
        probes.join(F.broadcast(counters), ["row_i", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce("cnt", F.lit(0))).alias("est_cnt"))
    )


def _bloom_probe_cols(key: Column, n_hashes: int, n_bits: int) -> Column:
    """array<struct<word_idx,mask>> — the n_hashes (word, bit-mask) slots
    of a key.  32 bits per bigint word keeps every mask positive and
    engine-portable (no sign-bit shifts)."""
    slots = []
    for i in range(int(n_hashes)):
        pos = h60(F.concat(F.lit(f"bf{i}:"), key)) % F.lit(int(n_bits))
        slots.append(F.struct(
            (pos - pos % 32).cast("bigint").alias("_p32"),
            (pos % 32).cast("int").alias("_bit")))
    return F.array(*slots)


def bloom_build(df: DataFrame, key_col: str,
                n_bits: int = 1 << 20, n_hashes: int = 4) -> DataFrame:
    """Bloom filter over a key column → (word_idx:bigint, bits:bigint).

    Bounded mergeable state (≤ n_bits/32 rows; union two filters =
    unionByName + bit_or re-agg), built in ONE map-side-combinable agg.
    The 100 TB use: probe a new batch against the known-corpus filter
    (`bloom_might_contain`) WITHOUT joining the corpus — the filter
    broadcasts, the corpus never reshuffles.  False-positive rate
    ≈ (1 − e^{−kn/m})^k; size n_bits ≈ 10× expected keys for ~1% at
    k=4.  h60 hashing makes the filter — and every probe verdict —
    bit-identical across engines and parallelism levels.
    """
    if n_bits % 32 != 0:
        raise ValueError("n_bits must be a multiple of 32")
    k = F.col(key_col).cast("string")
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(F.explode(_bloom_probe_cols(k, n_hashes, n_bits))
                .alias("s"))
        .select((F.col("s._p32") / 32).cast("bigint").alias("word_idx"),
                F.expr("shiftleft(CAST(1 AS BIGINT), s._bit)")
                .alias("mask"))
        .groupBy("word_idx")
        .agg(F.bit_or("mask").alias("bits"))
    )


def bloom_might_contain(bloom: DataFrame, keys: DataFrame, key_col: str,
                        n_bits: int = 1 << 20,
                        n_hashes: int = 4) -> DataFrame:
    """Probe a Bloom filter → (key_col, maybe:boolean), one row per
    distinct non-null key.  `maybe=false` is DEFINITE absence (the
    pruning guarantee); `maybe=true` is membership up to the FP rate.
    The filter side broadcasts (≤ n_bits/32 rows); keys absent from
    every built word read 0 via the coalesce."""
    k = F.col(key_col).cast("string")
    probes = (
        keys.select(key_col).filter(F.col(key_col).isNotNull()).distinct()
        .select(key_col,
                F.explode(_bloom_probe_cols(k, n_hashes, n_bits))
                .alias("s"))
        .select(key_col,
                (F.col("s._p32") / 32).cast("bigint").alias("word_idx"),
                F.expr("shiftleft(CAST(1 AS BIGINT), s._bit)")
                .alias("mask"))
    )
    return (
        probes.join(F.broadcast(bloom), "word_idx", "left")
        .groupBy(key_col)
        .agg(F.bool_and(
            (F.coalesce("bits", F.lit(0)).bitwiseAND(F.col("mask")) != 0))
            .alias("maybe"))
    )


def cms_heavy_hitters(df: DataFrame, key_col: str, min_count: int,
                      depth: int = 4, width: int = 2048,
                      top_k: int = 100) -> DataFrame:
    """Heavy hitters by CMS estimate → (key, est_cnt), est ≥ min_count,
    top-k by (est_cnt desc, key asc).  All-integer outputs, so the
    ranking needs no rounding discipline.  The candidate set here is the
    stream's own distinct keys (fine when the key domain is bounded —
    users, domains, tools); for unbounded domains pair the sketch with a
    candidate sampler upstream."""
    counters = cms_build(df, key_col, depth, width)
    est = cms_estimate(counters, df.select(key_col), key_col, depth, width)
    return (
        est.filter(F.col("est_cnt") >= int(min_count))
        .select(F.col(key_col).alias("key"), "est_cnt")
        .orderBy(F.col("est_cnt").desc(), F.col("key").asc())
        .limit(int(top_k))
    )
