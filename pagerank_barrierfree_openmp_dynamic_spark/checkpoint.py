"""Superstep checkpoint store: rank/frontier state + per-partition lineage
and iteration metrics, so runs resume mid-convergence (north rule).

Layout (one directory per run)::

    {root}/iter=K/ranks/      parquet (id, rank)
    {root}/iter=K/frontier/   parquet (id,)            [dynamic modes]
    {root}/iter=K/metrics/    parquet (see METRICS_SCHEMA)
    {root}/iter=K/_COMMIT     marker — iteration K is complete & loadable

Format is pluggable: parquet here (Iceberg jars are not in this sandbox);
on a real cluster pass ``fmt='iceberg'`` and a table identifier — the write
path is the same ``DataFrameWriter`` surface.

This subsumes the reference's crash tolerance (thread crash-stop,
``/root/reference/src/pagerankBarrierfree.hxx:228``): Spark task retry
covers intra-superstep failures; the checkpoint covers driver/job loss.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession, types as T

def _iceberg_available() -> bool:
    """True when the Iceberg runtime classes are on the live session's JVM
    classpath (the sandbox ships none — gated, not assumed)."""
    spark = SparkSession.getActiveSession()
    if spark is None:
        return False
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001
            "org.apache.iceberg.hadoop.HadoopTables")
        return True
    except Exception:
        return False


METRICS_SCHEMA = T.StructType(
    [
        T.StructField("run_id", T.StringType()),
        T.StructField("mode", T.StringType()),
        T.StructField("iteration", T.IntegerType()),
        T.StructField("partition_id", T.IntegerType()),  # -1 = whole iteration
        T.StructField("rows_processed", T.LongType()),
        T.StructField("edges_processed", T.LongType()),
        T.StructField("delta_linf", T.DoubleType()),
        T.StructField("elapsed_ms", T.DoubleType()),
    ]
)


class CheckpointStore:
    def __init__(self, root: str, fmt: str = "parquet"):
        if fmt not in ("parquet", "iceberg"):
            raise ValueError(f"unsupported checkpoint format {fmt!r}")
        if fmt == "iceberg" and not _iceberg_available():
            # fail LOUDLY at construction instead of silently writing
            # parquet: the sandbox ships no iceberg-spark-runtime jar. On a
            # cluster with the jar + a catalog configured, the same
            # path-based layout writes through format("iceberg").
            raise NotImplementedError(
                "CheckpointStore(fmt='iceberg') needs the "
                "iceberg-spark-runtime jar on the session classpath "
                "(spark-submit --packages org.apache.iceberg:"
                "iceberg-spark-runtime-...); not present in this build — "
                "use fmt='parquet' (same directory layout and resume "
                "contract)")
        self.root = root
        self.fmt = fmt
        os.makedirs(root, exist_ok=True)

    def _write(self, df: DataFrame, path: str) -> None:
        df.write.mode("overwrite").format(self.fmt).save(path)

    def _iter_dir(self, it: int) -> str:
        return os.path.join(self.root, f"iter={it}")

    def save(
        self,
        it: int,
        ranks: DataFrame,
        frontier: DataFrame | None = None,
        metrics: DataFrame | None = None,
        extra: dict | None = None,
    ) -> None:
        d = self._iter_dir(it)
        # write-data-THEN-commit: when overwriting an iteration dir from
        # an earlier run segment, the stale _COMMIT must come down first,
        # or a crash mid-overwrite leaves a committed marker over partial
        # parquet and the next resume loads truncated state
        try:
            os.remove(os.path.join(d, "_COMMIT"))
        except OSError:
            pass
        self._write(ranks, os.path.join(d, "ranks"))
        if frontier is not None:
            self._write(frontier, os.path.join(d, "frontier"))
        if metrics is not None:
            self._write(metrics, os.path.join(d, "metrics"))
        with open(os.path.join(d, "_COMMIT"), "w") as f:
            json.dump({"iteration": it, **(extra or {})}, f)

    def latest(self) -> int | None:
        if not os.path.isdir(self.root):
            return None
        its = []
        for name in os.listdir(self.root):
            m = re.fullmatch(r"iter=(\d+)", name)
            if m and os.path.exists(os.path.join(self.root, name, "_COMMIT")):
                its.append(int(m.group(1)))
        return max(its) if its else None

    def commit_info(self, it: int) -> dict:
        with open(os.path.join(self._iter_dir(it), "_COMMIT")) as f:
            return json.load(f)

    def save_personalization(self, p: DataFrame) -> None:
        """Run-level (iteration-independent) teleport vector, so personalized
        runs resume with the same recurrence.

        Eagerly materialized before the overwrite: a resumed run passes the
        DataFrame *loaded from this very directory* back in, and writing
        mode=overwrite to a path a lazy plan still reads from is a Spark
        error ('Cannot overwrite a path that is also being read from')."""
        self._write(p.localCheckpoint(eager=True),
                    os.path.join(self.root, "personalization"))

    def load_personalization(self, spark: SparkSession) -> DataFrame | None:
        d = os.path.join(self.root, "personalization")
        return (spark.read.format(self.fmt).load(d)
                if os.path.isdir(d) else None)

    def load_ranks(self, spark: SparkSession, it: int) -> DataFrame:
        return spark.read.format(self.fmt).load(
            os.path.join(self._iter_dir(it), "ranks"))

    def load_frontier(self, spark: SparkSession, it: int) -> DataFrame | None:
        p = os.path.join(self._iter_dir(it), "frontier")
        return spark.read.format(self.fmt).load(p) if os.path.isdir(p) else None

    def load_metrics(self, spark: SparkSession) -> DataFrame:
        paths = [
            os.path.join(self.root, n, "metrics")
            for n in sorted(os.listdir(self.root))
            if n.startswith("iter=")
            and os.path.isdir(os.path.join(self.root, n, "metrics"))
            # only COMMITTED iterations: a crash between the metrics write
            # and the _COMMIT write must not leak partial rows into history
            and os.path.exists(os.path.join(self.root, n, "_COMMIT"))
        ]
        if not paths:
            # metrics_level='none' runs save no metrics dirs; an empty
            # frame with the documented schema beats a reader schema error
            return spark.createDataFrame([], METRICS_SCHEMA)
        return spark.read.format(self.fmt).load(paths)
