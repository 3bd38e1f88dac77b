"""Bucketed table persistence: shuffle-free co-located joins ACROSS jobs.

The in-session kernels already co-partition the edge table once and reuse
that partitioning every superstep. Bucketing extends the same idea across
SESSIONS: write the edge table hash-bucketed by ``src`` into the catalog,
and every later job that joins or aggregates on ``src`` reads it already
hash-distributed — Catalyst sees the bucketing spec and plans
SortMergeJoin / HashAggregate with NO Exchange on the bucketed side
(asserted structurally in ``tests/test_plans.py``). At 100 TB that is the
difference between re-shuffling the edge table at the start of every
pipeline run and never shuffling it again after ingest.

Notes:
* Bucket metadata lives in the CATALOG (Spark's bucketing is
  catalog-backed, not parquet-file-backed). The sandbox uses the
  in-memory catalog, so tests create and read tables within one session;
  a real deployment points the same API at a Hive metastore — the write
  path is identical.
* Pick ``buckets`` once per corpus scale (rule of thumb: target
  ~128-512 MB per bucket file) and keep BOTH sides of recurring joins on
  the same (column, bucket-count) spec — mismatched counts fall back to a
  shuffle on one side.
* Iceberg replaces this with partition-spec + sort-order metadata on a
  real cluster (see ``checkpoint.py``); bucketed parquet tables are the
  jar-free equivalent the sandbox can execute and plan-assert.

Reference tie-in: the reference's analogue is the partitioned CSR it
rebuilds in memory per process (``/root/reference/src/csr.hxx``) — there
is no cross-run persistence at all; this is the Spark-native upgrade.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(df: DataFrame, table: str, bucket_col: str = "src",
                  buckets: int = 32, sort_col: str | None = None,
                  path: str | None = None) -> None:
    """Write ``df`` as a parquet table hash-bucketed (and sorted) by
    ``bucket_col``. ``path`` makes it an external table at that location;
    otherwise it lands in the session warehouse dir."""
    w = (
        df.write.mode("overwrite").format("parquet")
        .bucketBy(buckets, bucket_col)
        .sortBy(sort_col or bucket_col)
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back; the bucketing spec rides along in the
    catalog and downstream joins/aggs on the bucket column plan
    exchange-free."""
    return spark.table(table)
