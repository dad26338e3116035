"""Vector similarity / ANN operators over `array<float>` columns.

  cosine_topk       — brute-force cosine top-k (the exact baseline):
                      broadcast the query side, JVM-side zip_with dot
                      product, per-query window top-k.
  knn_graph         — mutual/one-way k-NN edges over one vector set
                      (feeds CC for similarity clustering).
  lsh_buckets       — random-hyperplane LSH (sign-bit sketch) from
                      deterministic md5-derived pseudo-planes: the scale
                      path — candidates only within equal sketches.
  centroids         — per-label mean vector (posexplode + groupBy).
  near_dup_pairs    — embedding-cosine near-duplicate pairs (exact, or
                      LSH-bucket-blocked at scale).
  ivf_topk          — IVF approximate top-k: deterministic coarse
                      quantizer (hash-seeded, one Lloyd refinement),
                      probe n closest inverted lists per query.
  semdedup          — SemDeDup (Abbas et al. 2023): within-cluster
                      cosine groups closed by CC, keep the least
                      centroid-similar survivor per group.
  quantize_embeddings / quantized_topk
                    — int8 scalar quantization (max-abs/127 scale) and
                      cosine top-k over the quantized vectors: ~4× fewer
                      bytes moved on the corpus side of ANN.

Cosine is computed in double precision; callers round for cross-engine
comparison.  At 100 TB the broadcast side must be the small one (queries);
for self-join ANN use lsh_buckets to bound the pair fan-out.

HNSW (reference vector/mod.rs:132-196, feature-gated) is deliberately NOT
ported.  It is a pointer-chasing in-memory graph index — the wrong shape
for a shared-nothing engine: the graph walk is inherently sequential per
query, and keeping a mutable multi-layer index consistent across
executors re-creates a vector database inside Spark.  The distributed
substitutes and their recall/cost envelope, so users can pick:

  exact cosine_topk — recall 1.0, O(n) per query; right whenever the
    query side is small enough to broadcast (the reference's own query
    path scans too: vector/mod.rs brute-force fallback).
  ivf_topk — recall = the fraction of true neighbors inside the probed
    n_probe/n_lists cells, so it depends on how clustered the corpus is.
    Published IVF numbers on real (clustered) embedding corpora sit at
    0.8-0.95 with 5-10% probe fractions; on this repo's weakly-clustered
    synthetic testdata (sf0.1, 50 queries, k=10) MEASURED recall@10 is
    0.37-0.47 at probe frac 0.125, 0.54-0.62 at 0.25, and 0.76-0.85 at
    0.5 — treat that as the floor (uniform data is IVF's worst case),
    and n_probe = n_lists degenerates to the exact scan (recall 1.0,
    pytest-asserted).  Cost O(n · n_probe / n_lists) — the scan prunes
    to the probed inverted lists, which a parquet table bucketed by
    list id prunes for free.  HNSW at equal recall does fewer distance
    evaluations per query (log-ish), but only on one machine's RAM.
  lsh_buckets / banded_lsh_buckets — single-sketch recall for a true
    pair at cosine s is (1 - acos(s)/π)^n_planes; OR-amplification over
    n_bands independent sketches lifts it to 1-(1-p^r)^b (measured on
    the sf0.1 embeddings: 0.146 → 0.955 going from 1 to 16 bands at
    r=4, within 2pp of theory; see near_dup_pairs).  Cost bounded by
    bucket sizes, embarrassingly parallel, the right self-join ANN at
    10⁹+ rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from graphrag_rs_spark.functions.hashing import h60


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def _normalized(vectors: DataFrame, id_col: str,
                vec_col: str) -> DataFrame:
    """(id, vn): unit-normalized double vectors, zero vectors kept as
    zero (so any dot with them is 0 — cosine()'s convention).  Pair-wise
    scorers normalize ONCE per row here and pay ONE interpreted
    higher-order dot per pair instead of three (HOFs are the per-row
    cost that dominates O(n²/buckets) pair stages)."""
    return (vectors.select(F.col(id_col).alias("id"),
                           F.col(vec_col).cast("array<double>").alias("v"))
            .withColumn("nrm", _norm(F.col("v")))
            .withColumn("vn", F.when(F.col("nrm") == 0.0,
                                     F.expr("transform(v, x -> 0.0d)"))
                        .otherwise(F.expr("transform(v, x -> x / nrm)")))
            .select("id", "vn"))


def cosine(a: Column, b: Column) -> Column:
    # zero-norm guard: ANSI mode (Spark 4 default) throws DIVIDE_BY_ZERO,
    # so one all-zero embedding would abort every caller's whole job;
    # similarity to the zero vector is 0 by convention (the contract
    # quantize_embeddings already documents)
    d = _norm(a) * _norm(b)
    return F.when(d == 0.0, F.lit(0.0)).otherwise(_dot(a, b) / d)


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """→ (query_id, vec_id, sim, rank) — exact top-k per query.

    `queries` must be small (it is broadcast); ties break on vec_id asc.
    """
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).alias("qv")))
    v = vectors.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).alias("vv"))
    # rank on the 6-dp-rounded similarity: deterministic across engines
    # (raw doubles differ in the last ulp between summation orders)
    scored = q.crossJoin(v).select(
        "query_id", "vec_id",
        F.round(cosine(F.col("qv").cast("array<double>"),
                       F.col("vv").cast("array<double>")), 6).alias("sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def knn_graph(vectors: DataFrame, k: int = 2, id_col: str = "vec_id",
              vec_col: str = "embedding", mutual: bool = False) -> DataFrame:
    """→ undirected edges (src, dst) of the k-NN graph (src < dst).

    O(n²) scoring — exact small-scale path; swap in lsh_buckets blocking
    at scale.  `mutual=True` keeps only edges in both directions' top-k.
    """
    vn = _normalized(vectors, id_col, vec_col)
    a = vn.select(F.col("id").alias("ida"), F.col("vn").alias("va"))
    b = vn.select(F.col("id").alias("idb"), F.col("vn").alias("vb"))
    scored = (
        a.join(b, F.col("ida") != F.col("idb"))
        .select("ida", "idb",
                F.round(_dot(F.col("va"), F.col("vb")), 6).alias("sim"))
    )
    w = Window.partitionBy("ida").orderBy(
        F.col("sim").desc(), F.col("idb").asc())
    top = scored.withColumn("rn", F.row_number().over(w)) \
        .filter(F.col("rn") <= k).select("ida", "idb")
    if mutual:
        rev = top.select(F.col("idb").alias("ida"), F.col("ida").alias("idb"))
        top = top.intersect(rev)
    return top.select(
        F.least("ida", "idb").alias("src"),
        F.greatest("ida", "idb").alias("dst"),
    ).distinct()


def plane_signs(n_planes: int, dim: int, seed: str = "rhp") -> list[list[float]]:
    """Deterministic ±1 hyperplane matrix from md5(seed:p:d) parity —
    no RNG state, reproducible across engines and machines."""
    import hashlib

    return [
        [1.0 if hashlib.md5(f"{seed}:{p}:{d}".encode()).digest()[0] % 2 == 0
         else -1.0 for d in range(dim)]
        for p in range(n_planes)
    ]


def lsh_buckets(vectors: DataFrame, n_planes: int = 8,
                id_col: str = "vec_id", vec_col: str = "embedding",
                seed: str = "rhp", dim: int | None = None) -> DataFrame:
    """→ (vec_id, bucket): sign-bit sketch under deterministic hyperplanes.

    The ±1 planes are literal arrays baked into the plan (`plane_signs`)
    — effectively a broadcast model with zero storage.  Bucket = integer
    of the n_planes sign bits; self-join on bucket bounds ANN candidate
    generation to ~n²/2^n_planes pairs.
    """
    if dim is None:
        first = vectors.select(F.size(vec_col).alias("d")).head()
        dim = int(first["d"]) if first else 0
    planes = plane_signs(n_planes, dim, seed)

    v = vectors.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).cast("array<double>").alias("vv"))
    bucket = F.lit(0)
    for p, signs in enumerate(planes):
        plane = F.array(*[F.lit(s) for s in signs])
        proj = F.aggregate(F.zip_with(F.col("vv"), plane, lambda x, s: x * s),
                           F.lit(0.0), lambda acc, val: acc + val)
        # round before the sign threshold (repo invariant; same rationale
        # as banded_lsh_buckets — keeps buckets replayable cross-engine)
        bucket = bucket + F.when(F.round(proj, 6) >= 0,
                                 F.lit(1 << p)).otherwise(F.lit(0))
    return v.select("vec_id", bucket.cast("bigint").alias("bucket"))


def banded_lsh_buckets(vectors: DataFrame, n_planes: int = 8,
                       n_bands: int = 1, id_col: str = "vec_id",
                       vec_col: str = "embedding",
                       seed: str = "rhp") -> DataFrame:
    """→ (vec_id, band, bucket): `n_bands` independent sign sketches per
    vector (band b uses hyperplanes seeded "{seed}:b"), one scan.

    The OR-amplification table for LSH: candidates = pairs colliding in
    ANY band.  For true cosine s, a pair collides in one band w.p.
    p^r where p = 1 - acos(s)/π and r = n_planes, so recall =
    1 - (1 - p^r)^n_bands — tune (r, n_bands) for the sim regime:
    more planes sharpens precision, more bands recovers recall.
    """
    first = vectors.select(F.size(vec_col).alias("d")).head()
    dim = int(first["d"]) if first else 0
    v = vectors.select(F.col(id_col).alias("vec_id"),
                       F.col(vec_col).cast("array<double>").alias("vv"))
    per_band = []
    for band in range(n_bands):
        bucket = F.lit(0)
        for p, signs in enumerate(plane_signs(n_planes, dim,
                                              f"{seed}:{band}")):
            plane = F.array(*[F.lit(s) for s in signs])
            proj = F.aggregate(
                F.zip_with(F.col("vv"), plane, lambda x, s: x * s),
                F.lit(0.0), lambda acc, val: acc + val)
            # repo invariant: round BEFORE the sign threshold, so an
            # external engine summing the same doubles in a different
            # order can never flip a bit on an epsilon-of-zero projection
            # (the near_dup_banded contract oracle replays these buckets)
            bucket = bucket + F.when(F.round(proj, 6) >= 0,
                                     F.lit(1 << p)).otherwise(F.lit(0))
        per_band.append(F.struct(F.lit(band).alias("band"),
                                 bucket.cast("bigint").alias("bucket")))
    return v.select(
        "vec_id", F.explode(F.array(*per_band)).alias("bb")
    ).select("vec_id", F.col("bb.band").alias("band"),
             F.col("bb.bucket").alias("bucket"))


def near_dup_pairs(
    vectors: DataFrame,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 0,
    n_bands: int = 1,
) -> DataFrame:
    """→ (id_a, id_b, sim): pairs with cosine ≥ threshold, id_a < id_b.

    n_planes=0 (default) scores all pairs — the exact, oracle-checkable
    semantic.  n_planes>0 blocks the self-join through banded sign-LSH:
    only pairs colliding in ≥1 of the `n_bands` independent sketches are
    scored (candidates ≈ n_bands·n²/2^n_planes; the pair set is
    distinct-ed before scoring, so multi-band collisions score once).
    Precision is always 1.0 — scoring is the exact cosine — and recall
    is 1-(1-p^r)^b (see banded_lsh_buckets; measured on the sf0.1
    embeddings at threshold 0.4, 920 true pairs: 0.146 at r=4,b=1 →
    0.759 at r=4,b=8 → 0.955 at r=4,b=16, each within 2pp of theory).
    At 100 TB always use the blocked path.
    """
    vn = _normalized(vectors, id_col, vec_col)
    a = vn.select(F.col("id").alias("id_a"), F.col("vn").alias("va"))
    b = vn.select(F.col("id").alias("id_b"), F.col("vn").alias("vb"))
    if n_planes > 0:
        bk = banded_lsh_buckets(vectors, n_planes, n_bands,
                                id_col, vec_col)
        cand = (
            bk.select(F.col("vec_id").alias("id_a"), "band", "bucket")
            .join(bk.select(F.col("vec_id").alias("id_b"),
                            "band", "bucket"),
                  ["band", "bucket"])
            .filter(F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b").distinct()
        )
        scored = cand.join(a, "id_a").join(b, "id_b")
    else:
        scored = a.join(b, F.col("id_a") < F.col("id_b"))
    return (
        scored
        .select("id_a", "id_b",
                F.round(_dot(F.col("va"), F.col("vb")), 6).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def _nearest(points: DataFrame, cents: DataFrame) -> DataFrame:
    """Assign each (id, v) to its max-cosine (list, cent); ties → min list.

    `cents` is model-sized (n_lists rows) and broadcast.
    """
    scored = points.crossJoin(F.broadcast(cents)).select(
        "id", "v", "list",
        F.round(cosine(F.col("v"), F.col("cent")), 6).alias("sim"))
    w = Window.partitionBy("id").orderBy(
        F.col("sim").desc(), F.col("list").asc())
    return scored.withColumn("rn", F.row_number().over(w)) \
        .filter(F.col("rn") == 1).select("id", "v", "list")


def _mean_cents(assigned: DataFrame) -> DataFrame:
    """(id, v, list) → (list, cent): per-list mean, 6-dp rounded.

    Rounding pins the model across engines/partitionings; long-form
    avg then re-pack keeps it a plain groupBy (no vector UDAF).
    """
    agg = assigned.select(
        "list", F.posexplode("v").alias("dim", "val")) \
        .groupBy("list", "dim").agg(F.round(F.avg("val"), 6).alias("m"))
    return agg.groupBy("list").agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("dim", "m"))),
            lambda s: s["m"]).alias("cent"))


def coarse_quantizer(v: DataFrame, n_lists: int) -> tuple[DataFrame, DataFrame]:
    """(id, v) → (cents: (list, cent), member: (id, v, list)).

    The shared deterministic k-means step behind ivf_topk and semdedup:
    seeds are the n_lists vectors with the smallest md5-hash of their id
    (no RNG — the model is a pure function of the corpus), one Lloyd
    refinement with 6-dp-rounded per-list means, then nearest-centroid
    membership.  Seed selection lowers to TakeOrderedAndProject; the
    centroid table is model-sized (n_lists rows) and broadcast by
    _nearest.
    """
    seeds = (
        v.withColumn("hk", h60(F.col("id").cast("string")))
        .orderBy("hk", "id").limit(n_lists)  # TakeOrderedAndProject
        .select(F.row_number().over(Window.orderBy("hk", "id"))
                .alias("list"), F.col("v").alias("cent"))
    )
    cents = _mean_cents(_nearest(v, seeds))          # one Lloyd step
    member = _nearest(v, cents)                      # inverted lists
    return cents, member


def semdedup(
    vectors: DataFrame,
    threshold: float = 0.4,
    n_lists: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """→ (vec_id, list, group_id, cent_sim, is_kept): SemDeDup semantic
    deduplication (Abbas et al. 2023, arXiv:2303.09540).

    Near-duplicates in EMBEDDING space (paraphrases, templated text,
    re-encodings) that no lexical dedup catches: k-means-cluster the
    corpus, compare pairs only WITHIN a cluster, close the ≥threshold
    cosine pairs into duplicate groups, and keep one survivor per group.
    Following the paper, the survivor is the member with the LOWEST
    cosine to its cluster centroid (keep the least prototypical example
    ⇒ retain diversity); ties break on min id.  Filter `is_kept = 1`
    to materialize the semantically deduplicated corpus; singleton
    groups (no ≥threshold neighbor) are always kept.

    Deterministic end-to-end: the quantizer is hash-seeded
    (coarse_quantizer), every cosine is rounded to 6 dp BEFORE the
    threshold / keeper ranking (repo invariant), so the output is
    parallelism-invariant and SQL-replayable.

    Scale posture: the only quadratic work is the within-cluster pair
    join, bounded by the largest cluster (≈ n/n_lists on mixing data) —
    at 100 TB pick n_lists so clusters hold 10³-10⁴ docs (the paper
    uses 50k clusters for LAION-440M) and the join stays a bucketed
    self-join on `list`; group closure is the same small-star/large-star
    CC as canonicalization; the keeper window partitions by group_id.
    Reference scope note: graphrag-rs has no embedding-space corpus
    dedup (vector/mod.rs is query-time ANN only); this operator is part
    of the engine-added training-data curation family.
    """
    from graphrag_rs_spark.algos.cc import connected_components

    v = vectors.select(F.col(id_col).alias("id"),
                       F.col(vec_col).cast("array<double>").alias("v"))
    cents, member = coarse_quantizer(v, n_lists)
    # normalize ONCE per member (n rows), so each of the O(n²/lists)
    # pair rows costs ONE higher-order dot instead of three (dot + two
    # norms) — HOFs are interpreted per-row, so this is the pair
    # stage's dominant cost.  Zero-norm vectors map to the zero vector
    # (dot 0 < threshold), preserving cosine()'s sim-0 convention.
    member_n = (
        member.withColumn("nrm", _norm(F.col("v")))
        .withColumn("vn", F.when(F.col("nrm") == 0.0,
                                 F.expr("transform(v, x -> 0.0d)"))
                    .otherwise(F.expr("transform(v, x -> x / nrm)"))))
    a = member_n.select("list", F.col("id").alias("id_a"),
                        F.col("vn").alias("va"))
    b = member_n.select("list", F.col("id").alias("id_b"),
                        F.col("vn").alias("vb"))
    pairs = (
        a.join(b, "list")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b",
                F.round(_dot(F.col("va"), F.col("vb")), 6).alias("sim"))
        .filter(F.col("sim") >= threshold))
    comps = connected_components(
        pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst")),
        nodes=member.select(F.col("id").alias("node")))
    cent_sim = member.join(F.broadcast(cents), "list").select(
        "id", "list",
        F.round(cosine(F.col("v"), F.col("cent")), 6).alias("cent_sim"))
    joined = cent_sim.join(
        comps, cent_sim["id"] == comps["node"]).select(
        "id", "list", "cent_sim", F.col("component").alias("group_id"))
    w = Window.partitionBy("group_id").orderBy(
        F.col("cent_sim").asc(), F.col("id").asc())
    return (joined
            .withColumn("is_kept",
                        (F.row_number().over(w) == 1).cast("int"))
            .select(F.col("id").alias(id_col), "list", "group_id",
                    "cent_sim", "is_kept"))


def ivf_topk(
    vectors: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_lists: int = 4,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """→ (query_id, vec_id, sim, rank): IVF approximate nearest neighbors.

    The scale path for self-serve ANN (vs cosine_topk's exact scan):
      1. coarse quantizer: seeds = the n_lists vectors with the smallest
         md5-hash of their id (deterministic, no RNG), one Lloyd
         refinement → per-list mean centroids (6-dp rounded model);
      2. every vector is assigned to its nearest centroid (the inverted
         list) — at 100 TB this table is written bucketed by `list`;
      3. each query probes only the n_probe nearest lists and scores
         exactly within them (scan cost ≈ n_probe/n_lists of the data).
    Approximate: a true neighbor assigned to an unprobed list is missed
    (raise n_probe for recall).  All ranking on 6-dp-rounded cosine,
    ties on ids asc — deterministic across engines.
    """
    v = vectors.select(F.col(id_col).alias("id"),
                       F.col(vec_col).cast("array<double>").alias("v"))
    cents, member = coarse_quantizer(v, n_lists)

    q = queries.select(F.col(query_id_col).alias("query_id"),
                       F.col(vec_col).cast("array<double>").alias("qv"))
    qs = q.crossJoin(F.broadcast(cents)).select(
        "query_id", "qv", "list",
        F.round(cosine(F.col("qv"), F.col("cent")), 6).alias("csim"))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("list").asc())
    probed = qs.withColumn("rn", F.row_number().over(wq)) \
        .filter(F.col("rn") <= n_probe).select("query_id", "qv", "list")

    scored = probed.join(member, "list").select(
        "query_id", F.col("id").alias("vec_id"),
        F.round(cosine(F.col("qv"), F.col("v")), 6).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc())
    return scored.withColumn("rank", F.row_number().over(w)) \
        .filter(F.col("rank") <= k)


def centroids(vectors: DataFrame, label_col: str = "label",
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """→ (label, dim, value): per-label mean embedding, long-form.

    Long-form (one row per dimension) keeps the aggregation a plain
    groupBy — no UDAF — and is join-ready for scoring.
    """
    exploded = vectors.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col).cast("array<double>"))
        .alias("dim", "value"),
    )
    return exploded.groupBy("label", "dim").agg(
        F.avg("value").alias("value"))


def quantize_embeddings(vectors: DataFrame, id_col: str = "vec_id",
                        vec_col: str = "embedding") -> DataFrame:
    """Int8 scalar quantization: → (vec_id, scale, qvec: array<int> in
    [-127, 127], qnorm).

    scale = max|x| / 127 per vector; qvec = round(x / scale).  The 100 TB
    lever: a 384-dim float32 embedding column shrinks 4× (quantized ANN
    shuffles/broadcasts move a quarter of the bytes), while
    dequantized-cosine recall@10 stays ≈1 for unit-norm-ish embeddings.
    All arithmetic is deterministic double-precision fold/transform over
    the array in element order, so an ANSI engine replays it bit-for-bit;
    round() is half-away-from-zero in both Spark and DuckDB.

    All-zero vectors quantize to all-zero with scale 0 (qnorm 0); callers
    treat their similarity as 0.
    """
    v = F.col(vec_col).cast("array<double>")
    amax = F.aggregate(v, F.lit(0.0),
                       lambda acc, x: F.greatest(acc, F.abs(x)))
    base = vectors.select(F.col(id_col).alias("vec_id"),
                          v.alias("_v"), (amax / F.lit(127.0)).alias("scale"))
    qvec = F.when(F.col("scale") == 0.0,
                  F.transform(F.col("_v"), lambda x: F.lit(0))) \
        .otherwise(F.transform(
            F.col("_v"),
            lambda x: F.round(x / F.col("scale"), 0).cast("int")))
    out = base.select("vec_id", "scale", qvec.alias("qvec"))
    qnorm = F.sqrt(F.aggregate(
        F.col("qvec"), F.lit(0.0),
        lambda acc, q: acc + (q * q).cast("double")))
    return out.select("vec_id", "scale", "qvec", qnorm.alias("qnorm"))


def quantized_topk(vectors: DataFrame, queries: DataFrame, k: int = 10,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id_col: str = "query_id") -> DataFrame:
    """→ (query_id, vec_id, sim, rank): cosine top-k over int8-quantized
    vectors (sim = dequantized cosine, rounded 6dp before ranking;
    ties break vec_id asc).  Same contract as cosine_topk; the corpus
    side moves ~4× fewer bytes.
    """
    qv = quantize_embeddings(queries.select(
        F.col(query_id_col).alias("vec_id"), F.col(vec_col)),
        "vec_id", vec_col) \
        .select(F.col("vec_id").alias("query_id"),
                F.col("scale").alias("qs"), F.col("qvec").alias("qq"),
                F.col("qnorm").alias("qn"))
    vv = quantize_embeddings(vectors, id_col, vec_col) \
        .select("vec_id", F.col("scale").alias("vs"),
                F.col("qvec").alias("vq"), F.col("qnorm").alias("vn"))
    # integer dot product folded in bigint; cosine is scale-invariant so
    # the per-vector scales cancel — sim = idot / (qnorm_q · qnorm_v)
    idot = F.aggregate(
        F.zip_with("qq", "vq", lambda a, b: (a * b).cast("bigint")),
        F.lit(0).cast("bigint"), lambda acc, x: acc + x)
    denom = F.col("qn") * F.col("vn")
    scored = F.broadcast(qv).crossJoin(vv).select(
        "query_id", "vec_id",
        F.round(F.when(denom == 0.0, F.lit(0.0))
                .otherwise(idot.cast("double") / denom), 6).alias("sim"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("vec_id").asc())
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))
