"""SparkSession factory with the engine's standard tuning.

Local mode here; on a real cluster the same confs apply, plus whatever
the submitter sets (executors, memory).  AQE owns runtime re-planning
(skew joins, partition coalescing); we only pin what AQE can't infer.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from graphrag_rs_spark.config import PipelineConfig, DEFAULT_CONFIG


def _adaptive_heap_gb(requested_gb: int) -> int:
    """Clamp the requested driver heap to what the host can actually give.

    A fixed -Xmx sized for an idle box is a time bomb: if another JVM
    (concurrent benchmark run, leftover session) already holds tens of
    GB, the ParallelGC heap grows into exhausted physical memory and the
    OOM killer shoots the process mid-job (observed: round-1 bench died
    with ConnectionRefused when two stale 48g JVMs were resident).  Use
    at most ~55% of MemAvailable, floor 8 GB, cap at the request.
    """
    try:
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("MemAvailable:"):
                    avail_gb = int(line.split()[1]) // (1024 * 1024)
                    break
            else:
                return requested_gb
    except OSError:
        return requested_gb
    return max(8, min(requested_gb, int(avail_gb * 0.55)))


def _driver_memory(env_value: str | None, default_gb: int = 40) -> str:
    """Resolve spark.driver.memory from SPARK_GRAFT_DRIVER_MEM.

    Unset → adaptive default (clamped to host headroom).  Any explicit
    Spark size string ('48g', '4096m', '512000k') → passed through
    verbatim — never crash on, or silently clamp, an explicit operator
    choice; whoever sets the env var owns the headroom call.
    """
    if env_value is None:
        return "%dg" % _adaptive_heap_gb(default_gb)
    return env_value.strip()


def get_spark(
    app_name: str = "graphrag_rs_spark",
    master: str | None = None,
    cfg: PipelineConfig = DEFAULT_CONFIG,
    extra_confs: dict[str, str] | None = None,
) -> SparkSession:
    master = master or os.environ.get("SPARK_GRAFT_MASTER") or \
        f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
    builder = SparkSession.builder.appName(app_name).master(master)
    confs = {
        **cfg.spark_confs(),
        # local-mode JVM hosts all executor threads — size the heap for
        # them (ignored when a cluster submitter sets its own memory).
        # The adaptive clamp applies to the DEFAULT only; an explicitly
        # user-set size string ('4096m', '48g', '512000k') passes through
        # unmodified so operators keep full control.
        "spark.driver.memory": _driver_memory(
            os.environ.get("SPARK_GRAFT_DRIVER_MEM")),
        # Arrow's JNI critical sections trigger GCLocker allocation storms
        # with many executor threads (retry instead of stalling the world);
        # ParallelGC beats G1 for this batch/throughput profile — the
        # object aggregates allocate in bursts that G1 promotes too eagerly
        "spark.driver.extraJavaOptions":
            "-XX:+UnlockDiagnosticVMOptions "
            "-XX:GCLockerRetryAllocationCount=100 "
            "-XX:+UseParallelGC",
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
        "spark.sql.session.timeZone": "UTC",
        # stable codegen-heavy plans; python workers reused across batches
        "spark.python.worker.reuse": "true",
        "spark.driver.maxResultSize": "2g",
    }
    if extra_confs:
        confs.update(extra_confs)
    for k, v in confs.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
