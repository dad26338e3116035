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

Cosine is computed in double precision; callers round for cross-engine
comparison.  At 100 TB the broadcast side must be the small one (queries);
for self-join ANN use lsh_buckets to bound the pair fan-out.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

from graphrag_rs_spark.functions.hashing import h60


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, v: acc + v)


def _norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


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
    a = vectors.select(F.col(id_col).alias("ida"),
                       F.col(vec_col).cast("array<double>").alias("va"))
    b = vectors.select(F.col(id_col).alias("idb"),
                       F.col(vec_col).cast("array<double>").alias("vb"))
    scored = (
        a.join(b, F.col("ida") != F.col("idb"))
        .select("ida", "idb",
                F.round(cosine(F.col("va"), F.col("vb")), 6).alias("sim"))
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
        bucket = bucket + F.when(proj >= 0, F.lit(1 << p)).otherwise(F.lit(0))
    return v.select("vec_id", bucket.cast("bigint").alias("bucket"))


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
