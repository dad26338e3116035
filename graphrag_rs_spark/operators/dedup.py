"""Deduplication family for training-data pipelines.

All four operators are pure Catalyst expressions (no Python UDFs):

  exact_duplicates   — hash-groupBy on normalized text
  ngram_jaccard_pairs— character-shingle Jaccard via shared-shingle
                       self-join (the inverted-index trick: only pairs
                       sharing ≥1 shingle are scored, never O(n²))
  minhash_lsh_pairs  — MinHash signatures (md5-seeded min over shingles)
                       banded into LSH buckets; candidate pairs = bucket
                       collisions.  Scale path for the jaccard join.
  simhash            — 32-bit SimHash from token hashes (bit-majority).

Scale notes (100 TB posture): every join here keys on a content-derived
value (shingle / band hash), so partitioning is uniform by construction
except for pathological shingles (e.g. "aaaaa"); `max_shingle_df` drops
shingles whose document frequency explodes the pair fan-out — the classic
stop-shingle treatment, counted not silent.  MinHash keeps the shuffle
volume at O(n · bands) regardless of document length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from graphrag_rs_spark.functions.hashing import (h60, norm_text,
                                                 shingle_array)


def exact_duplicates(docs: DataFrame, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """→ (doc_id, text_hash, group_size, is_canonical).

    Canonical member = min doc_id of the hash group (deterministic).
    """
    hashed = docs.select(
        F.col(id_col).alias("doc_id"),
        h60(norm_text(text_col)).alias("text_hash"),
    )
    groups = hashed.groupBy("text_hash").agg(
        F.count(F.lit(1)).alias("group_size"),
        F.min("doc_id").alias("canonical_doc"),
    )
    return (
        hashed.join(groups, "text_hash")
        .select(
            "doc_id", "text_hash", "group_size",
            (F.col("doc_id") == F.col("canonical_doc")).alias("is_canonical"),
        )
    )


def _shingle_table(docs: DataFrame, id_col: str, text_col: str,
                   k: int, max_shingle_df: int | None = None) -> DataFrame:
    # two-step select: normalization must be materialized before the
    # per-position transform (see hashing.shingle_array)
    sh = (
        docs.select(F.col(id_col).alias("doc_id"),
                    norm_text(text_col).alias("nt"))
        .select("doc_id", F.explode(shingle_array("nt", k)).alias("shingle"))
        .distinct()
    )
    if max_shingle_df is not None:
        dfreq = sh.groupBy("shingle").count()
        sh = sh.join(
            F.broadcast(dfreq.filter(F.col("count") > max_shingle_df)
                        .select("shingle")),
            "shingle", "left_anti")
    return sh


def ngram_jaccard_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard) for pairs with J ≥ threshold, doc_a < doc_b.

    jaccard = |A∩B| / (|A| + |B| - |A∩B|) over distinct k-char shingles.
    """
    sh = _shingle_table(docs, id_col, text_col, k, max_shingle_df)
    sizes = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_shingles"))

    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n_shingles").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n_shingles").alias("nb"))
    return (
        inter.join(sa, "doc_a").join(sb, "doc_b")
        .select(
            "doc_a", "doc_b",
            (F.col("inter")
             / (F.col("na") + F.col("nb") - F.col("inter"))).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= F.lit(float(threshold)))
    )


MINHASH_PRIME = 2147483647  # 2^31 - 1; (a%p)*(h%p) stays inside int64


def minhash_coeffs(num_hashes: int, seed: str = "mh") -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs < p from md5(seed:i) — no RNG state,
    identical constants in the Spark plan and the SQL oracle."""
    import hashlib

    out = []
    for i in range(num_hashes):
        d = hashlib.md5(f"{seed}:{i}".encode()).digest()
        a = (int.from_bytes(d[:8], "big") % (MINHASH_PRIME - 1)) + 1
        b = int.from_bytes(d[8:], "big") % MINHASH_PRIME
        out.append((a, b))
    return out


def minhash_signatures(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 16,
) -> DataFrame:
    """→ (doc_id, hash_idx, minhash): universal-hash-family min-hashes.

    hash_i(s) = (a_i·(h60(s) mod p) + b_i) mod p with p = 2³¹−1 — ONE
    md5 per shingle instead of num_hashes of them (the md5 dominated the
    old per-seed variant 16×); signature_i = min over the doc's shingles.
    """
    coeffs = minhash_coeffs(num_hashes)
    sh = _shingle_table(docs, id_col, text_col, k)
    hashed = sh.select(
        "doc_id", (h60("shingle") % MINHASH_PRIME).alias("hp"))
    # all num_hashes minima as parallel aggregate expressions over the
    # UNEXPLODED table (pure codegen arithmetic, one shuffle of n_docs
    # groups), then unpivot the tiny wide result to long form — ~16×
    # less shuffle volume than exploding per (shingle, hash_idx)
    wide = hashed.groupBy("doc_id").agg(*[
        F.min((F.lit(a) * F.col("hp") + F.lit(b)) % MINHASH_PRIME)
        .alias(f"mh_{i}")
        for i, (a, b) in enumerate(coeffs)
    ])
    return wide.select(
        "doc_id",
        F.posexplode(F.array(*[F.col(f"mh_{i}")
                               for i in range(num_hashes)]))
        .alias("hash_idx", "minhash"),
    )


def _band_table(docs: DataFrame, id_col: str, text_col: str,
                k: int, num_hashes: int, bands: int) -> DataFrame:
    """→ (doc_id, band, band_key): LSH band hashes of the minhash
    signature, shared by within-corpus pair generation
    (minhash_lsh_pairs) and cross-run incremental dedup."""
    if num_hashes % bands != 0:
        raise ValueError(
            f"num_hashes ({num_hashes}) must be divisible by bands "
            f"({bands}): a remainder would silently form an undersized "
            "extra band with different collision probability")
    rows_per_band = num_hashes // bands
    sig = minhash_signatures(docs, id_col, text_col, k, num_hashes)
    return (
        sig.withColumn("band",
                       F.floor(F.col("hash_idx") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(h60(F.concat_ws(
            ",", F.sort_array(F.collect_list(
                F.concat_ws(":", F.lpad(F.col("hash_idx").cast("string"),
                                        2, "0"),
                            F.col("minhash").cast("string")))))
        ).alias("band_key"))
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
) -> DataFrame:
    """→ candidate near-dup pairs (doc_a, doc_b, n_bands) from banded LSH.

    rows_per_band = num_hashes // bands; a pair collides if any band of
    its signatures is identical.  n_bands = how many bands matched.
    """
    band_hash = _band_table(docs, id_col, text_col, k, num_hashes, bands)
    a, b = band_hash.alias("a"), band_hash.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band"))
               & (F.col("a.band_key") == F.col("b.band_key"))
               & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"),
                 F.col("b.doc_id").alias("doc_b"))
        .agg(F.count(F.lit(1)).alias("n_bands"))
    )


def simhash(docs: DataFrame, id_col: str = "doc_id",
            text_col: str = "text", bits: int = 32) -> DataFrame:
    """→ (doc_id, simhash): bit-majority fingerprint over token hashes.

    For each bit b: sum over tokens of (+1 if bit set else -1); the
    fingerprint sets bit b iff the sum is positive.  Near-dup docs differ
    in few bits (hamming distance on the bigint).
    """
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(
            F.expr(f"filter(split(trim(regexp_replace(lower({text_col}),"
                   " '[^a-z0-9]+', ' ')), ' '), x -> x != '')")
        ).alias("tok"),
    )
    hashed = toks.select("doc_id", h60("tok").alias("h"))
    per_bit = hashed.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("bit"),
        "h",
    ).groupBy("doc_id", "bit").agg(
        F.sum(
            F.when(F.expr("shiftright(h, bit) % 2") == 1,
                   F.lit(1)).otherwise(F.lit(-1))
        ).alias("balance")
    )
    return per_bit.groupBy("doc_id").agg(
        F.sum(
            F.when(F.col("balance") > 0,
                   F.expr("cast(pow(2, bit) as bigint)"))
            .otherwise(F.lit(0).cast("bigint"))
        ).alias("simhash")
    )


def near_dup_clusters(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 4,
    min_bands: int = 1,
) -> DataFrame:
    """→ (doc_id, cluster_id, is_canonical): near-duplicate GROUPS.

    The standard "pick one survivor per duplicate group" training-data
    step: LSH collision pairs (banded, never all-pairs) become an edge
    set, connected components closes them into clusters (two docs sharing
    a chain of collisions dedup together even if they never collide
    directly), and the cluster's min doc_id is the deterministic
    canonical survivor — filter `is_canonical` to materialize the
    deduplicated corpus.  `min_bands` raises the collision bar (1 = any
    matching band, the classic LSH contract).

    Scale posture: candidate generation is the bucketed LSH join
    (collisions only); the closure is the same small-star/large-star CC
    as canonicalization — no stage is quadratic in the corpus.
    """
    from graphrag_rs_spark.algos.cc import connected_components

    pairs = minhash_lsh_pairs(docs, id_col, text_col, k, num_hashes, bands)
    if min_bands > 1:
        pairs = pairs.filter(F.col("n_bands") >= min_bands)
    edges = pairs.select(F.col("doc_a").alias("src"),
                         F.col("doc_b").alias("dst"))
    comps = connected_components(
        edges, nodes=docs.select(F.col(id_col).alias("node")))
    return comps.select(
        F.col("node").alias(id_col),
        F.col("component").alias("cluster_id"),
        (F.col("node") == F.col("component")).cast("int")
        .alias("is_canonical"),
    )


def segment_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 10,
    max_df: int = 1,
) -> DataFrame:
    """→ (doc_id, n_segments, n_dropped, clean_text): corpus-level
    repeated-segment removal (the CCNet/RefinedWeb line-dedup step,
    generalized to fixed `width`-word segments for corpora without
    line structure).

    Every non-overlapping run of `width` consecutive words is a
    segment; a segment whose exact text occurs in more than `max_df`
    documents' segments corpus-wide is dropped from every document,
    and the surviving segments are re-joined in original order.
    Removal is counted per document (`n_dropped`), never silent.

    Pure Catalyst: posexplode → two hash aggregations (segment rebuild,
    corpus frequency) → join on the content-derived segment text →
    ordered rebuild.  Scale posture: both shuffles key on
    (doc_id, seg_idx) or the segment text itself, so partitioning is
    uniform by construction; the frequency table is only as large as
    the distinct-segment set and joins back on its own key (AQE can
    broadcast it when small).  No stage is quadratic in the corpus.

    Reference scope note: graphrag-rs has no cross-corpus dedup
    (its dedup is per-graph entity dedup, graph/mod.rs:243-265); this
    operator is part of the training-data curation family the engine
    adds for 100 TB corpora.
    """
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"))
    segs = (
        words
        .withColumn("seg_idx", F.floor(F.col("pos") / width))
        .groupBy("doc_id", "seg_idx")
        .agg(F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("pos", "word"))),
                lambda s: s["word"]),
            " ").alias("seg")))
    dfreq = segs.groupBy("seg").agg(F.count(F.lit(1)).alias("seg_df"))
    flagged = segs.join(dfreq, "seg").withColumn(
        "dropped", F.col("seg_df") > max_df)
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_segments"),
        F.sum(F.col("dropped").cast("int")).cast("int").alias("n_dropped"),
        # when() without otherwise() yields null for dropped segments and
        # collect_list skips nulls — the filter rides inside the one agg
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(
                    F.when(~F.col("dropped"),
                           F.struct("seg_idx", "seg")))),
                lambda s: s["seg"]),
            " ").alias("clean_text"))


def substring_dedup(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 8,
    max_count: int = 1,
) -> DataFrame:
    """→ (doc_id, n_tokens, n_dropped, clean_text): ExactSubstr-style
    duplicated-span removal (Lee et al. 2021, "Deduplicating Training
    Data Makes Language Models Better", arXiv:2107.06499).

    A token is dropped iff it lies inside some `width`-token run whose
    exact text occurs more than `max_count` times corpus-wide (including
    a second occurrence in the SAME document — self-repeats count, as in
    the paper).  At word granularity this is EXACT, not approximate:
    every duplicated span of ≥ width tokens is fully tiled by duplicated
    width-shingles regardless of alignment — the case `segment_dedup`'s
    fixed non-overlapping segments miss.  The paper's suffix array is a
    single-machine structure; sliding-shingle cover is the shared-nothing
    equivalent at the fixed span threshold (their 50-token default ↦
    `width`).

    Pure Catalyst: per-doc sliding windows (rows-frame collect_list over
    pos, hashed to 60-bit keys so long spans never shuffle as strings) →
    one corpus-wide hash agg for occurrence counts → covered positions
    exploded from duplicated shingles (fan-out ≤ width, bounded) →
    ordered rebuild.  Scale posture: the window is partitioned by
    doc_id; the count agg and the dup join key on the shingle hash, so
    partitioning is content-uniform; nothing is quadratic and removal is
    counted per doc (`n_dropped`), never silent.
    """
    from pyspark.sql import Window

    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"))
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, width - 1)
    sh = (words
          .withColumn("win", F.collect_list("word").over(w))
          .filter(F.size("win") == width)
          .select("doc_id", F.col("pos").alias("p"),
                  h60(F.array_join("win", " ")).alias("shash")))
    dup = (sh.groupBy("shash").agg(F.count(F.lit(1)).alias("n"))
           .filter(F.col("n") > max_count).select("shash"))
    covered = (sh.join(dup, "shash")
               .select("doc_id",
                       F.explode(F.sequence(
                           F.col("p"), F.col("p") + F.lit(width - 1)))
                       .alias("pos"))
               .distinct()
               .withColumn("cov", F.lit(1)))
    flagged = words.join(covered, ["doc_id", "pos"], "left")
    return flagged.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("int").alias("n_tokens"),
        F.sum(F.col("cov").isNotNull().cast("int")).cast("int")
        .alias("n_dropped"),
        # when() without otherwise() nulls dropped tokens; collect_list
        # skips nulls, so the filter rides inside the one agg
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(
                    F.when(F.col("cov").isNull(),
                           F.struct("pos", "word")))),
                lambda s: s["word"]),
            " ").alias("clean_text"))


def dedup_store(
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 8,
) -> tuple[DataFrame, DataFrame]:
    """→ (seen_hashes, seen_bands): the persistent dedup state of an
    already-ingested corpus, for `incremental_dedup` of later batches.

      seen_hashes  (text_hash)        distinct exact-content hashes
      seen_bands   (band, band_key)   distinct LSH band buckets

    Both are content-keyed and duplicate-free, so the store grows with
    the corpus's DISTINCT content, not its row count.  At 100 TB the
    store should be written bucketed by its join key (text_hash /
    (band, band_key)) so each incremental run's probe joins are
    co-located, shuffle-free scans of only the matching buckets.
    """
    hashes = corpus.select(
        h60(norm_text(text_col)).alias("text_hash")).distinct()
    band_t = (_band_table(corpus, id_col, text_col, k, num_hashes, bands)
              .select("band", "band_key").distinct())
    return hashes, band_t


def incremental_dedup(
    new_docs: DataFrame,
    seen_hashes: DataFrame,
    seen_bands: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 5,
    num_hashes: int = 16,
    bands: int = 8,
) -> DataFrame:
    """→ (doc_id, is_exact_dup, n_band_hits, verdict) per NEW-batch doc:
    cross-run dedup of an incoming batch against the dedup_store of
    everything ingested before — the continuous-ingestion path, where
    re-scanning the full corpus per batch is not an option.

      verdict = 'exact'  content hash already in seen_hashes
                'near'   ≥1 LSH band collides with seen_bands
                'new'    neither

    n_band_hits counts the new doc's bands found in the store (≤ bands;
    the store is distinct, so multiple seen docs sharing a bucket count
    once).  Store-relative by design: duplicates WITHIN the new batch
    are the existing exact_duplicates / minhash_lsh_pairs operators'
    job.  Band parameters must match the store's or collisions are
    meaningless — same (k, num_hashes, bands) as dedup_store.

    Scale shape: two probe joins, each keyed on the content-derived
    store key (text_hash; band+band_key) — uniform partitioning by
    construction, batch side small relative to the store, so AQE
    broadcasts the batch or (with a bucketed store, see dedup_store)
    the probes are co-located scans.  No stage touches the seen corpus
    text itself.
    """
    hashed = new_docs.select(
        F.col(id_col).alias("doc_id"),
        h60(norm_text(text_col)).alias("text_hash"))
    exact = hashed.join(
        seen_hashes.select("text_hash").distinct()
        .withColumn("_seen", F.lit(1)),
        "text_hash", "left")
    new_bands = _band_table(new_docs, id_col, text_col,
                            k, num_hashes, bands)
    hits = (
        new_bands.join(seen_bands.select("band", "band_key").distinct(),
                       ["band", "band_key"])
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("int").alias("n_band_hits")))
    out = exact.join(hits, "doc_id", "left").select(
        "doc_id",
        F.col("_seen").isNotNull().alias("is_exact_dup"),
        F.coalesce("n_band_hits", F.lit(0)).cast("int")
        .alias("n_band_hits"))
    return out.select(
        "doc_id", "is_exact_dup", "n_band_hits",
        F.when(F.col("is_exact_dup"), F.lit("exact"))
        .when(F.col("n_band_hits") > 0, F.lit("near"))
        .otherwise(F.lit("new")).alias("verdict"))
