"""G12 — graph embeddings: node2vec-style walks + GraphSAGE-mean layers.

Distributed re-expression of the reference's graph/embeddings.rs:

* Node2Vec (embeddings.rs:132-310): biased random walks + skip-gram.
  - Walks (`random_walks`) are generated as an ITERATIVE JOIN LOOP, one
    step per join, entirely JVM-side: the neighbor choice is a
    deterministic hash-seeded categorical draw implementing exactly the
    reference's transition weights (first step uniform over neighbors,
    embeddings.rs:193-196; later steps weight × (1/p if next==prev else
    1/q), :211-240 — note the reference's "BFS vs DFS" check reads
    `neighbor == prev` only, and we transliterate that, not the full
    node2vec 2nd-order rule).  The reference uses `thread_rng` (walks
    are not reproducible run-to-run); we substitute xxhash64-seeded
    inverse-CDF sampling so walks are deterministic per
    (node, walk, step, seed) — same distribution, reproducible output.
  - Skip-gram training maps to `pyspark.ml.feature.Word2Vec` (JVM,
    distributed, negative-sampling-free hierarchical softmax) instead of
    a hand-rolled SGD loop: the reference's train_skipgram
    (embeddings.rs:242-310) is the single-node equivalent.

* GraphSAGE (embeddings.rs:358-498): iterative mean aggregation.
  `sage_mean_embeddings` transliterates the Mean aggregator layer
  (:438-463 — neighbor mean, zeros when no neighbors) and combine rule
  (:485-498 — elementwise (self + nbr_mean)/2), over caller-provided
  input features (e.g. `functions/embeddings.hash_embeddings`) instead
  of the reference's `rng.gen()` random init ("random for now", :375-385)
  — deterministic, and equal to the reference when samples_per_layer ≥
  degree (sampling-without-replacement of ALL neighbors is the identity
  for a mean).

Scale posture: adjacency is a grouped array table shuffled once; each
walk step is one shuffle join against it (salting unnecessary — walker
rows are uniformly keyed by (node, walk_id)); plans are cut with
localCheckpoint every few steps, same discipline as algos/cc.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_M = 1_000_003  # modulus for the [0,1) hash draw (prime, > any degree²)


def _adjacency(edges: DataFrame) -> DataFrame:
    """(src, dst[, weight]) → (node, nbrs array<struct<dst,w>> sorted by dst)."""
    wcol = F.col("weight").cast("double") if "weight" in edges.columns \
        else F.lit(1.0)
    return (
        edges.select(F.col("src").alias("node"),
                     F.struct(F.col("dst").cast("string").alias("dst"),
                              wcol.alias("w")).alias("nb"))
        .repartition("node")
        .groupBy("node")
        .agg(F.array_sort(F.array_distinct(F.collect_list("nb")))
             .alias("nbrs"))
    )


def _pick_expr(alphas, u_frac):
    """Index of the first element where the cumulative sum of `alphas`
    crosses u_frac × total — inverse-CDF categorical sampling as a pure
    Catalyst fold (no UDF).

    The target (u × Σalphas) rides IN the fold accumulator: higher-order
    functions are interpreted, so an expression embedded in the step
    lambda re-evaluates per element — with the Σ aggregate inlined there
    the fold was O(degree²) per row (measured 226 s on the sf0.1
    customer/supplier graph, hot suppliers ~10³ neighbors; 14 s after).
    init evaluates once per row, so the Σ is computed once and each step
    reads it as a field."""
    total = F.aggregate(alphas, F.lit(0.0), lambda acc, x: acc + x)
    # fold carrying (cum, idx, found, target): idx freezes at the crossing
    init = F.struct(F.lit(0.0).alias("cum"), F.lit(0).alias("idx"),
                    F.lit(False).alias("found"),
                    (u_frac * total).alias("target"))
    step = lambda acc, x: F.struct(
        (acc["cum"] + x).alias("cum"),
        F.when(acc["found"] | ((acc["cum"] + x) >= acc["target"]),
               acc["idx"])
        .otherwise(acc["idx"] + 1).alias("idx"),
        (acc["found"] | ((acc["cum"] + x) >= acc["target"]))
        .alias("found"),
        acc["target"].alias("target"),
    )
    folded = F.aggregate(alphas, init, step)
    # numeric edge (u_frac ~1.0 and float rounding): clamp to last index
    return F.least(folded["idx"], F.size(alphas) - 1)


def random_walks(
    edges: DataFrame,
    walks_per_node: int = 10,
    walk_length: int = 80,
    p: float = 1.0,
    q: float = 1.0,
    seed: int = 42,
    checkpoint_every: int = 5,
    draw: str = "xxhash64",
) -> DataFrame:
    """→ (node, walk_id, walk array<string>) — one row per started walk.

    Walks stop early at sink nodes (no out-neighbors), like the
    reference's `break` (embeddings.rs:203-205).

    `draw` picks the per-step uniform hash: "xxhash64" (default, JVM
    codegen, fastest) or "h60" (md5-prefix bigint — the repo's
    engine-portable hash, so an external SQL engine can replay the walk
    corpus value-for-value; see the node2vec_walks contract oracle).
    """
    if walks_per_node < 1:
        # F.sequence(0, walks_per_node-1) would COUNT DOWN (sequence's
        # inferred step is -1), silently emitting walks with ids 0, -1…
        return edges.sparkSession.createDataFrame(
            [], "node string, walk_id int, walk array<string>")
    adj = _adjacency(edges).persist()
    # Uniform fast path: with no weight column every alpha is the exact
    # literal 1.0, and with p == q == 1 the bias multiplier is 1 on every
    # branch, so the inverse-CDF fold degenerates: cum_i = i+1 and
    # total = n are EXACT doubles (integral sums), making the first
    # index with cum >= u*total equal to max(0, ceil(u*n)-1) — the same
    # value the fold computes, bit-for-bit, at O(1) per row instead of
    # an O(degree) interpreted lambda fold (hot suppliers have ~10³
    # neighbors; the fold dominated the walk step there).
    uniform_draw = ("weight" not in edges.columns
                    and float(p) == 1.0 and float(q) == 1.0)

    walkers = adj.select(
        F.col("node").alias("start"),
        F.explode(F.sequence(F.lit(0), F.lit(walks_per_node - 1)))
        .alias("walk_id"),
    ).select(
        "start", "walk_id",
        F.lit(None).cast("string").alias("prev"),
        F.col("start").cast("string").alias("cur"),
        F.array(F.col("start").cast("string")).alias("path"),
        F.lit(False).alias("done"),
    )

    inv_p, inv_q = 1.0 / float(p), 1.0 / float(q)
    for step in range(1, walk_length):
        # Single reference to `walkers` per step: done rows carry a null
        # `cur`, and null join keys never match, so one left join moves
        # live walkers and passes parked ones through unchanged.  (The
        # previous live/parked filter + union referenced the frame twice
        # per step — plan and recompute grew ~2^checkpoint_every between
        # checkpoints.)
        joined = walkers.join(adj.withColumnRenamed("node", "cur"),
                              "cur", "left")
        first_step = F.lit(step == 1)
        alphas = F.when(
            first_step | F.col("prev").isNull(),
            F.transform(F.col("nbrs"), lambda s: F.lit(1.0)),
        ).otherwise(
            F.transform(
                F.col("nbrs"),
                lambda s: s["w"] * F.when(s["dst"] == F.col("prev"),
                                          F.lit(inv_p))
                .otherwise(F.lit(inv_q))))
        if draw == "h60":
            from graphrag_rs_spark.functions.hashing import h60
            key = F.concat_ws(
                "|", "start", F.col("walk_id").cast("string"),
                F.lit(str(step)), "cur", F.lit(str(seed)))
            u = (F.pmod(h60(key), F.lit(_M)).cast("double")
                 / F.lit(float(_M)))
        else:
            u = (F.pmod(F.xxhash64("start", "walk_id", F.lit(step), "cur",
                                   F.lit(seed)), F.lit(_M))
                 .cast("double") / F.lit(float(_M)))
        if uniform_draw:
            n = F.size("nbrs").cast("double")
            pick = F.greatest(F.lit(0),
                              (F.ceil(u * n) - 1).cast("int"))
        else:
            pick = _pick_expr(alphas, u)
        nxt = F.when(F.col("done") | F.col("nbrs").isNull()
                     | (F.size("nbrs") == 0),
                     F.lit(None).cast("string")) \
            .otherwise(F.col("nbrs")[pick]["dst"])
        # `nxt` must be evaluated EXACTLY ONCE per row: higher-order
        # functions (the _pick_expr fold) evaluate via interpreted
        # LambdaVariables, and duplicating the expression across several
        # projection columns in a deep chained plan produced
        # INCONSISTENT values per row (path's last hop ≠ cur — measured).
        # Materializing it as its own alias referenced ≥2 times downstream
        # blocks CollapseProject from re-inlining it (non-cheap multi-use
        # aliases are never collapsed), so every derived column sees the
        # same draw.
        stepped = joined.select("start", "walk_id", "cur", "path", "done",
                                nxt.alias("nxt"))
        walkers = stepped.select(
            "start", "walk_id",
            F.when(F.col("nxt").isNull(), F.lit(None).cast("string"))
            .otherwise(F.col("cur")).alias("prev"),
            F.col("nxt").alias("cur"),
            F.when(F.col("nxt").isNull(), F.col("path"))
            .otherwise(F.concat("path", F.array("nxt"))).alias("path"),
            F.col("nxt").isNull().alias("done"),
        )
        # the LAST step checkpoints too: `adj` is unpersisted below at
        # plan-BUILD time, so a lazily returned final segment would
        # re-derive the adjacency once per remaining step when the
        # caller evaluates (same fix as algos/pagerank.py)
        if step % checkpoint_every == 0 or step == walk_length - 1:
            walkers = walkers.localCheckpoint(eager=True)

    out = walkers.select(F.col("start").alias("node"), "walk_id",
                         F.col("path").alias("walk"))
    adj.unpersist()
    return out


def node2vec_embeddings(
    edges: DataFrame,
    dimension: int = 128,
    walks_per_node: int = 10,
    walk_length: int = 80,
    p: float = 1.0,
    q: float = 1.0,
    window: int = 10,
    seed: int = 42,
) -> DataFrame:
    """→ (node, embedding array<float>) — walks + distributed Word2Vec.

    Mirrors Node2Vec::fit (embeddings.rs:148-157): generate walks, train
    skip-gram; `window` = the reference's context_size.
    """
    from pyspark.ml.feature import Word2Vec

    walks = random_walks(edges, walks_per_node, walk_length, p, q, seed)
    w2v = Word2Vec(vectorSize=dimension, windowSize=window, minCount=0,
                   seed=seed, inputCol="walk", outputCol="_vec")
    model = w2v.fit(walks.select("walk"))
    vectors = model.getVectors()   # (word, vector) — one row per node
    from pyspark.ml.functions import vector_to_array
    return vectors.select(
        F.col("word").alias("node"),
        vector_to_array(F.col("vector"), "float32").alias("embedding"))


def sage_mean_embeddings(
    features: DataFrame,
    edges: DataFrame,
    num_layers: int = 2,
    checkpoint: bool = True,
) -> DataFrame:
    """GraphSAGE-mean layers over caller features (embeddings.rs:358-498).

    `features`: (node, features array<double>); `edges`: (src, dst),
    direction = "dst is a neighbor of src" (reference adjacency is
    directed the same way).  Each layer: new = (self + mean(nbr)) / 2,
    with a zero vector when a node has no out-neighbors.
    """
    dim_row = features.select(F.size("features").alias("d")).first()
    dim = int(dim_row["d"]) if dim_row else 0
    zeros = F.array(*[F.lit(0.0) for _ in range(dim)])

    feats = features.select("node", F.col("features").cast("array<double>")
                            .alias("features"))
    e = edges.select("src", "dst")
    for _ in range(num_layers):
        nbr_vals = (
            e.join(feats.withColumnRenamed("node", "dst"), "dst")
            .select("src", F.posexplode("features").alias("pos", "v"))
            # co-partition before the agg (partial-agg memory discipline)
            .repartition("src")
            .groupBy("src", "pos")
            .agg(F.avg("v").alias("m"))
        )
        nbr_mean = (
            nbr_vals
            .groupBy("src")
            .agg(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "m"))),
                lambda s: s["m"]).alias("nbr_mean"))
            .withColumnRenamed("src", "node")
        )
        feats = (
            feats.join(nbr_mean, "node", "left")
            .select(
                "node",
                F.zip_with(
                    "features",
                    F.coalesce("nbr_mean", zeros),
                    lambda a, b: (a + b) / F.lit(2.0)).alias("features"))
        )
        if checkpoint:
            # cut lineage between layers (CC-loop discipline); skipped by
            # the plan audit, which wants the visible layer plan
            feats = feats.localCheckpoint(eager=False)
    return feats
