"""SparkSession factory tuned for the link-graph engine.

Local-mode defaults mirror what a 1000-executor cluster deployment would set
per-executor: AQE on (skew-join + partition coalescing), Arrow enabled for
every Python<->JVM exchange, shuffle partitions sized to cores (not the
200 default), UTC session time so DuckDB-oracle comparisons are stable.
"""

from __future__ import annotations

import os
from contextlib import contextmanager

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "linkgraph-engine",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    task_retries: int | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cpus`` controls ``local[N]`` parallelism — the sandbox stand-in for
    executor count; the two-cluster-size scaling benchmark runs the same job
    at ``local[8]`` and ``local[32]``.

    ``task_retries`` sets the per-task failure budget (``local[N,F]`` —
    the local-mode spelling of ``spark.task.maxFailures``; a cluster
    defaults to 4). Local mode defaults to 1 = fail fast; crash-fault
    experiments (``PageRankOptions.fault_crash_prob``) need >= 2.
    """
    n = cpus or DEFAULT_CPUS
    sp = shuffle_partitions or n
    master = (f"local[{n},{int(task_retries)}]" if task_retries
              else f"local[{n}]")
    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(sp))
        .config("spark.default.parallelism", str(n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.ui.enabled", "false")
        # Keep stdout clean for harnesses that parse the last JSON line.
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Iterative jobs: keep broadcast refs from piling up.
        .config("spark.cleaner.referenceTracking.blocking", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


@contextmanager
def adaptive_execution(spark: SparkSession, enabled: bool):
    """Temporarily set ``spark.sql.adaptive.enabled`` around an iterative loop.

    Superstep loops have a fixed, fully-known shape: the engine knows N and
    |E| exactly, broadcasts the small side explicitly, and salts hub keys
    itself — everything AQE would discover at runtime is already decided.
    AQE's per-action re-planning then only adds latency (measured 3-4x per
    superstep at bench scale), so the kernels run with it off and restore
    the session setting afterwards. Scan/extraction/build phases, whose
    input stats genuinely are unknown, keep the session default (on).
    """
    key = "spark.sql.adaptive.enabled"
    prev = spark.conf.get(key, "true")
    spark.conf.set(key, "true" if enabled else "false")
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def eager_state(df, storage_level=None):
    """Materialize an iterative loop's state frame eagerly, with REAL
    statistics and truncated lineage. Returns the pinned DataFrame.

    ``localCheckpoint(eager=True)`` alone truncates lineage but copies the
    origin plan's ESTIMATED sizeInBytes into the checkpointed relation.
    In a loop whose step joins the state with itself (pointer jumping,
    h-index gathers, hub/authority updates), that estimate is a product of
    the previous state's estimate with itself, so the BigInt digit count
    grows geometrically with the iteration number — by iteration ~20
    Catalyst spends minutes multiplying million-digit integers inside
    SizeInBytesOnlyStatsPlanVisitor (measured in this sandbox: digits went
    9 -> 26 -> 78 -> 232 -> 695 -> 2084 -> 6250 per iteration; one
    multiply at iteration ~18 of the HITS loop burned 20+ CPU-minutes).
    Semi/anti joins are immune (left-size-only estimate); inner and outer
    joins are not.

    Fix: cache + count FIRST — InMemoryRelation's statistics are the real
    materialized byte size — THEN localCheckpoint (its origin stats are now
    the real number), then drop the cache (the checkpointed RDD blocks are
    independent). Every downstream estimate stays sane at any iteration
    count, on any graph diameter — the difference between "works on the
    test fixture" and "works on a 100-iteration web-graph fixpoint".
    """
    from pyspark import StorageLevel

    cached = df.persist(storage_level or StorageLevel.MEMORY_AND_DISK)
    cached.count()
    out = cached.localCheckpoint(eager=True)
    cached.unpersist()
    return out
