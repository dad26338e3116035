"""Per-stage checkpoint / lineage / resume (I1-I3).

Every pipeline stage writes its output to
``{workdir}/{stage}/`` (parquet, overwrite = idempotent retry) and then
appends one lineage record per partition plus a stage-summary record to
the checkpoint table at ``{workdir}/_checkpoints/``:

    (run_id, stage, partition_id, rows, checksum, status, ts)

partition_id = -1 marks the stage-summary row (status committed/failed);
-2 marks a pre-overwrite intent row (status writing), appended before a
stage dir is rewritten so that OTHER runs' stale committed markers for
the shared dir can never satisfy a resume (completed() requires the
latest negative-partition event to be this run's commit).
A killed run resumes by skipping stages whose summary row is committed
and whose output directory exists, re-reading the materialized output —
the driver-loop equivalent of the reference's phase validation
checkpoints (evaluation/pipeline_validation.rs:41-534) fused with its
incremental store versioning (graph/incremental/store.rs:57-130).

On a lakehouse deployment the same records target an Iceberg table and
`MERGE INTO` gives partition-level (not just stage-level) resume; plain
parquet keeps this sandbox dependency-free while preserving the contract.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

CHECKPOINT_SCHEMA = ("run_id string, stage string, partition_id int, "
                     "rows long, checksum long, status string, ts double, "
                     "seq long")


class CheckpointManager:
    """Single writer per workdir at a time (the resume contract): two
    drivers appending concurrently can mint the same seq, and parquet
    appends are not atomic across files. The seq + deterministic
    tiebreak below makes SEQUENTIAL runs (including killed ones) order
    reliably without trusting wall clocks; true concurrent writers need
    the Iceberg deployment's optimistic commit (see module docstring)."""

    def __init__(self, spark: SparkSession, workdir: str, run_id: str):
        self.spark = spark
        self.workdir = workdir
        self.run_id = run_id
        self.ckpt_dir = os.path.join(workdir, "_checkpoints")

    def _stage_dir(self, stage: str) -> str:
        return os.path.join(self.workdir, stage)

    def _read_ckpt(self) -> DataFrame:
        ck = self.spark.read.parquet(self.ckpt_dir)
        if "seq" not in ck.columns:  # pre-seq layout compatibility
            ck = ck.withColumn("seq", F.lit(0).cast("long"))
        return ck

    def _next_seq(self) -> int:
        """Monotonic event counter: max existing seq + 1, read at append
        time. Orders events without trusting wall-clock ts (ADVICE r4:
        time.time() ties broke nondeterministically and clock skew
        between drivers on a shared filesystem could mis-order)."""
        if not os.path.exists(self.ckpt_dir):
            return 1
        row = self._read_ckpt().agg(F.max("seq").alias("m")).collect()[0]
        return int(row["m"] or 0) + 1

    def _append(self, rows: list[tuple]) -> None:
        seq = self._next_seq()
        df = self.spark.createDataFrame(
            [r + (seq,) for r in rows], schema=CHECKPOINT_SCHEMA)
        df.coalesce(1).write.mode("append").parquet(self.ckpt_dir)

    def completed(self, stage: str) -> bool:
        if not os.path.exists(self.ckpt_dir):
            return False
        ck = self._read_ckpt()
        # run_id scopes the resume decision BOTH ways (ADVICE r3): a new
        # run must not adopt another run's outputs, AND an old run must
        # not resume onto a stage dir another run has since overwritten
        # — stage dirs are shared at the workdir root (layout contract),
        # so the LATEST summary event for the stage decides.  run_stage
        # appends a 'writing' event BEFORE its overwrite, so even a
        # crashed foreign overwrite invalidates stale committed markers.
        # partition_id -1 = commit summary, -2 = pre-overwrite intent.
        # Ordering: seq (monotonic, clock-free) first; (ts, run_id,
        # partition_id) as a fully deterministic tiebreak for legacy
        # rows and the documented same-seq concurrent-writer edge —
        # intent rows (-2 < -1) win ties, i.e. ambiguity re-runs the
        # stage rather than adopting a possibly-stale output.
        last = (ck.filter((F.col("stage") == stage)
                          & (F.col("partition_id") < 0))
                .orderBy(F.col("seq").desc(), F.col("ts").desc(),
                         F.col("run_id").desc(),
                         F.col("partition_id").asc())
                .limit(1).collect())
        return (bool(last)
                and last[0].run_id == self.run_id
                and last[0].status == "committed"
                and os.path.exists(self._stage_dir(stage)))

    def load(self, stage: str) -> DataFrame:
        return self.spark.read.parquet(self._stage_dir(stage))

    def run_stage(self, stage: str, df_fn, resume: bool = True) -> DataFrame:
        """Execute (or skip) a stage: materialize df_fn() to parquet with
        per-partition lineage, return the re-read DataFrame (so downstream
        plans read columnar files instead of recomputing the lineage)."""
        if resume and self.completed(stage):
            return self.load(stage)
        out_dir = self._stage_dir(stage)
        # intent marker (partition_id -2) BEFORE the overwrite: any
        # other run's committed marker for this stage is now stale,
        # even if this run dies mid-write (see completed())
        self._append([(self.run_id, stage, -2, 0, 0, "writing",
                       time.time())])
        df = df_fn()
        df.write.mode("overwrite").parquet(out_dir)
        written = self.spark.read.parquet(out_dir)
        lineage = (
            written.withColumn("partition_id", F.spark_partition_id())
            .groupBy("partition_id")
            .agg(
                F.count(F.lit(1)).alias("rows"),
                F.coalesce(
                    F.expr("bit_xor(xxhash64("
                           + ", ".join(f"`{c}`" for c in written.columns)
                           + "))"),
                    F.lit(0),
                ).alias("checksum"),
            )
            .collect()
        )
        now = time.time()
        records = [
            (self.run_id, stage, int(r["partition_id"]), int(r["rows"]),
             int(r["checksum"]), "ok", now)
            for r in lineage
        ]
        total_rows = sum(int(r["rows"]) for r in lineage)
        total_checksum = 0
        for r in lineage:
            total_checksum ^= int(r["checksum"])
        records.append((self.run_id, stage, -1, total_rows,
                        total_checksum, "committed", now))
        self._append(records)
        return written

    def stage_metrics(self) -> DataFrame:
        return self.spark.read.parquet(self.ckpt_dir)
