"""Custom join operators Spark lacks natively: as-of join and range join.

Neither exists in the reference (graphrag-rs is a single-corpus KG
indexer) — they belong to the engine-added training-data family: a
transcript/event pipeline constantly needs "state as of this event"
(join each turn/event to the latest prior snapshot) and "point in
interval" (event ∈ session window, value ∈ band) joins.

Both are built so the 100 TB plan is the one Catalyst cannot produce on
its own:

* ``asof_join`` — the naive formulation is a non-equi join
  (``l.ts >= r.ts`` + argmax), which Spark plans as a broadcast/cartesian
  nested-loop and dies at scale.  Instead we use the union-merge trick:
  tag both sides, union, and run ``last(value, ignorenulls) OVER
  (PARTITION BY key ORDER BY ts)`` — ONE shuffle on the key, no join at
  all, linear in rows.  This is the standard distributed as-of shape
  (pandas' merge_asof semantics, Flink temporal join semantics).
* ``range_join_points`` — a pure interval predicate (no equi key) would
  also become a nested-loop.  We bucketize: explode each interval to the
  fixed-width bins it covers, put each point in its one bin, equi-join on
  the bin, then re-check the exact predicate.  Each qualifying
  (point, interval) pair survives exactly once because a point lies in
  exactly one bin and an interval covers that bin at most once — no
  dedup pass needed.  Cost: O(points + intervals·span/width) exploded
  rows through a hash join Catalyst can broadcast or shuffle as AQE
  sees fit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_MATCH_TS = "_asof_match_ts"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_vals: list[str] | None = None,
    direction: str = "backward",
    tolerance: int | None = None,
    strict: bool = False,
    match_ts_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the single right row with the same key
    whose timestamp is the closest at-or-before (``backward``), at-or-
    after (``forward``), or nearest (``nearest``) the left timestamp.

    Right value columns come back under their own names (they must not
    collide with left columns); unmatched left rows keep nulls — LEFT
    as-of semantics.  ``tolerance`` (seconds) nulls out matches farther
    than the bound; ``strict`` excludes equal timestamps.  If several
    right rows share (key, ts), pre-aggregate the right side first —
    ties are otherwise engine-nondeterministic (same caveat as DuckDB's
    ASOF JOIN / pandas merge_asof).

    Plan shape: union + one window over the key — a single hash
    shuffle, no non-equi join, so it survives any input size whose
    per-key row count fits a task (keys are the partition unit).
    """
    keys = [on] if isinstance(on, str) else list(on)
    if right_vals is None:
        right_vals = [c for c in right.columns
                      if c not in keys and c != right_ts]
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"direction must be backward/forward/nearest, "
                         f"got {direction!r}")

    mcol = match_ts_col or _MATCH_TS
    collide = set(right_vals) & set(left.columns)
    if collide:
        raise ValueError(f"right value columns collide with left: {collide}")

    # epoch-second longs order identically to timestamps and survive the
    # struct round-trip below without NTZ/zone surprises
    r_epoch = F.col(right_ts).cast("timestamp").cast("long")
    l_epoch = F.col(left_ts).cast("timestamp").cast("long")
    # a null right timestamp would sort FIRST under asc (Spark nulls
    # first) and back-fill every left row — null-ts right rows can never
    # legitimately match, so drop them before the union
    rr = right.filter(r_epoch.isNotNull()).select(
        *keys,
        r_epoch.alias("_ats"),
        F.lit(1).alias("_side"),
        F.struct(r_epoch.alias(mcol),
                 *[F.col(v) for v in right_vals]).alias("_rv"))
    ll = left.withColumn("_ats", l_epoch).withColumn("_side", F.lit(0))
    u = ll.unionByName(rr, allowMissingColumns=True)

    def _fill(df: DataFrame, into: str, backward: bool) -> DataFrame:
        # at equal ts the right row must sort BEFORE the left row to be
        # visible (inclusive); strict mode sorts it after, hiding it —
        # so no post-filter on equality is ever needed
        right_first = not strict
        order = [F.col("_ats").asc() if backward else F.col("_ats").desc(),
                 F.col("_side").desc() if right_first
                 else F.col("_side").asc()]
        w = (Window.partitionBy(*keys).orderBy(*order)
             .rowsBetween(Window.unboundedPreceding, Window.currentRow))
        return df.withColumn(into, F.last("_rv", ignorenulls=True).over(w))

    def _bounded(rv: Column, backward: bool) -> Column:
        if tolerance is None:
            return rv
        lts = F.col("_ats")
        dist = (lts - rv[mcol]) if backward else (rv[mcol] - lts)
        return F.when(rv.isNotNull() & (dist <= F.lit(int(tolerance))), rv)

    if direction == "nearest":
        # both fills share one hash shuffle on the key (same partitioning,
        # two sort orders); winner = smaller |Δts|, backward on ties
        filled = _fill(_fill(u, "_rvb", True), "_rvf", False) \
            .filter(F.col("_side") == 0)
        rvb = _bounded(F.col("_rvb"), True)
        rvf = _bounded(F.col("_rvf"), False)
        d_b = F.col("_ats") - rvb[mcol]
        d_f = rvf[mcol] - F.col("_ats")
        use_b = rvb.isNotNull() & (rvf.isNull() | (d_b <= d_f))
        filled = filled.withColumn(
            "_rv", F.when(use_b, rvb).otherwise(rvf))
    else:
        backward = direction == "backward"
        filled = _fill(u, "_rv", backward).filter(F.col("_side") == 0)
        filled = filled.withColumn("_rv", _bounded(F.col("_rv"), backward))

    # a null LEFT timestamp must never match either (under desc ordering
    # nulls sort last and would see every right row)
    rv_out = F.when(F.col("_ats").isNotNull(), F.col("_rv"))
    out = filled.select(
        *left.columns,
        *[rv_out[v].alias(v) for v in right_vals],
        rv_out[mcol].alias(mcol))
    return out if match_ts_col else out.drop(_MATCH_TS)


def range_join_points(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join each point row to every interval row with
    ``lo <= point <= hi`` (closed on both ends) — without a nested-loop
    plan.

    ``bin_width`` trades explosion for selectivity: intervals fan out to
    ``span/bin_width + 1`` rows.  Pick it near the typical interval
    span.  ``how="left"`` keeps unmatched points with null interval
    columns.
    """
    if bin_width <= 0:
        raise ValueError("bin_width must be positive")
    b = F.lit(float(bin_width))
    shared = set(points.columns) & set(intervals.columns)
    if shared:
        raise ValueError(f"point/interval column collision: {shared}")
    p = points.withColumn("_bin", F.floor(F.col(point_col) / b))
    iv = intervals.filter(F.col(lo_col) <= F.col(hi_col)).withColumn(
        "_bin",
        F.explode(F.sequence(F.floor(F.col(lo_col) / b).cast("long"),
                             F.floor(F.col(hi_col) / b).cast("long"))))
    hit = (F.col(point_col) >= F.col(lo_col)) \
        & (F.col(point_col) <= F.col(hi_col))
    if how == "inner":
        return p.join(iv, "_bin").filter(hit).drop("_bin")
    if how == "left":
        matched = p.join(iv, "_bin").filter(hit).drop("_bin")
        ivc = [c for c in intervals.columns]
        # null-SAFE anti-join: with plain column-name equality a matched
        # point carrying a NULL in any column fails its own equality test
        # and is emitted a second time as spurious-unmatched
        pl = p.drop("_bin").alias("_pl")
        m = matched.select(*points.columns).distinct().alias("_m")
        same = None
        for c in points.columns:
            eq = F.col(f"_pl.{c}").eqNullSafe(F.col(f"_m.{c}"))
            same = eq if same is None else (same & eq)
        lone = pl.join(m, same, "left_anti")
        for c in ivc:
            lone = lone.withColumn(
                c, F.lit(None).cast(intervals.schema[c].dataType))
        return matched.unionByName(lone)
    raise ValueError(f"how must be inner/left, got {how!r}")
