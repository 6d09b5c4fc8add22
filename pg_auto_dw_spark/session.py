"""SparkSession construction and runtime configuration.

The reference delegates all execution to Postgres via SPI
(reference: extension/src/lib.rs:32); we delegate to Catalyst. This
module centralizes the session tuning we rely on everywhere:

- UTC session timezone (reference stores all timestamps AT TIME ZONE
  'UTC', utility/sql/info_tables.sql:22).
- AQE on: runtime broadcast/skew handling is our answer to "Postgres
  picks the plan" (SURVEY.md section 4).
- ``spark.sql.legacy.parquet.nanosAsLong``: kept for older test-data
  vintages whose ``events.parquet`` carried TIMESTAMP(NANOS) (read as
  long nanos + ``timestamp_micros(ns div 1000)``). Current testdata
  ships TIMESTAMP(MICROS) NTZ; the batch reader (sources.load_table)
  branches on the surfaced dtype, and the streaming reader
  (streaming/jobs.read_events_stream) splits a directory into
  per-vintage views by footer inspection and unions the normalized
  streams -- both land every vintage on identical session-UTC
  TIMESTAMP values.

At 100 TB these settings matter more than at test scale: AQE coalesces
post-shuffle partitions, converts sort-merge joins to broadcast when a
side turns out small, and splits skewed partitions.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session handed to us (the
# verification driver owns its own builder, so prepare() must be
# idempotent and builder-independent).
_RUNTIME_CONFS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # legacy testdata vintage: TIMESTAMP(NANOS) read as long nanos.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Arrow for any pandas-UDF path (dedup/multimodal operators).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def prepare(spark: SparkSession) -> SparkSession:
    """Apply runtime confs to an externally-created session (idempotent)."""
    for key, value in _RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            # Static or unknown conf on this build -- every conf above is
            # documented runtime-settable on Spark 4.x, but stay resilient.
            pass
    return spark


def get_spark(app_name: str = "pg_auto_dw_spark", master: str | None = None) -> SparkSession:
    """Build (or fetch) a tuned local session.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (driver contract);
    shuffle partitions match cores in local mode -- on a real cluster
    AQE coalescing makes a higher initial number safe.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        # local[32] runs driver+executor in one JVM; checkpoint/shuffle
        # blocks from long sessions evict under 8g (measured: ~20% slower
        # steady-state + multi-second GC variance on the dedup family).
        # Sized to the HOST, not a constant: a 24g heap on a 16 GB
        # laptop fails to launch under strict overcommit.
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY") or _default_heap())
        # Dead localCheckpoint pins (per-call pins in the merge verbs /
        # dedup family) are freed by ContextCleaner only after a JVM
        # GC notices the RDD is unreachable; on a large mostly-idle
        # heap that can take arbitrarily long, so long sessions
        # accumulate dead blocks into storage-eviction churn. Spark's
        # own periodic-GC hook bounds that (default is 30min).
        .config("spark.cleaner.periodicGC.interval", "2min")
        # Propagate the numpy THP-madvise opt-out (see
        # pg_auto_dw_spark/__init__.py) to CLUSTER executors, whose
        # Python workers do not inherit the driver environment the way
        # local mode's do. Harmless no-op when already disabled.
        .config(
            "spark.executorEnv.NUMPY_MADVISE_HUGEPAGE",
            os.environ.get("NUMPY_MADVISE_HUGEPAGE", "0"),
        )
    )
    return prepare(builder.getOrCreate())


def _default_heap() -> str:
    """Driver heap default: 24g when the host comfortably has it,
    otherwise ~40% of MemAvailable clamped to [2g, 24g]."""
    try:
        with open("/proc/meminfo") as f:
            kb = {l.split(":")[0]: int(l.split()[1]) for l in f if ":" in l}
        avail_g = kb.get("MemAvailable", kb.get("MemTotal", 0)) / (1024 * 1024)
    except Exception:
        return "8g"
    if avail_g >= 60:
        return "24g"
    return f"{max(2, min(24, int(avail_g * 0.4)))}g"
