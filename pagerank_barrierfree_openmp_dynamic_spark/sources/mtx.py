"""MatrixMarket coordinate I/O — compatibility with the reference's corpus
format (``/root/reference/src/mtx.hxx:33-157``), so results can be
cross-checked against the reference binary on the same ``.mtx`` inputs.

The read path is distributed and JVM-side: ``spark.read.text`` + split/cast
(no Python parsing — the chunked-parallel-parse design of ``readMtxOmpW``
maps to Spark's parallel text scan). Semantics mirrored:

- 1-based vertex ids; vertices ``1..n`` exist even when isolated
  (``mtx.hxx:61-63`` pre-adds them) — ``read_mtx`` returns the vertex
  DataFrame alongside the edges;
- ``symmetric`` / ``skew-symmetric`` headers add the reverse edge
  (``mtx.hxx:68-73``). For ``skew-symmetric`` weighted matrices the
  reverse weight is NEGATED per the MatrixMarket spec (A[j,i] = -A[i,j]);
  the reference folds skew into plain symmetric and copies the weight
  unchanged (``mtx.hxx:42, 70-71``) — pass ``negate_skew=False`` to mirror
  that bug-for-bug;
- optional third column parsed as a double weight when ``weighted``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def read_mtx_header(spark: SparkSession, path: str) -> dict:
    """Parse the banner + size line (``readMtxHeader``, ``mtx.hxx:33-49``)."""
    first = spark.read.text(path).limit(64).collect()
    banner = first[0]["value"].strip().lower()
    if not banner.startswith("%%matrixmarket"):
        raise ValueError(f"not a MatrixMarket file: {banner[:60]!r}")
    symmetric = "symmetric" in banner and "skew" not in banner
    skew = "skew-symmetric" in banner
    size_line = next(
        r["value"] for r in first[1:] if not r["value"].lstrip().startswith("%")
    )
    rows, cols, nnz = (int(x) for x in size_line.split())
    return dict(symmetric=symmetric, skew_symmetric=skew, rows=rows,
                cols=cols, nnz=nnz, n=max(rows, cols))


def read_mtx(
    spark: SparkSession, path: str, weighted: bool = False,
    negate_skew: bool = True,
) -> tuple[DataFrame, DataFrame, dict]:
    """Load an ``.mtx`` file -> (edges, vertices, header).

    edges: (src, dst[, weight]) longs (1-based ids as in the file);
    vertices: (id,) = 1..max(rows, cols), isolated vertices included.
    """
    hdr = read_mtx_header(spark, path)
    lines = spark.read.text(path)
    body = lines.filter(
        ~F.col("value").rlike(r"^\s*%") & (F.length(F.trim("value")) > 0)
    )
    parts = F.split(F.trim(F.col("value")), r"\s+")
    parsed = body.select(
        parts.getItem(0).cast("long").alias("src"),
        parts.getItem(1).cast("long").alias("dst"),
        *([parts.getItem(2).cast("double").alias("weight")] if weighted else []),
    ).filter(F.col("src").isNotNull() & F.col("dst").isNotNull())
    # drop the size line (it parses as a row but is the first data-ish line;
    # identified by matching the header's rows/cols values exactly once)
    n, nnz = hdr["n"], hdr["nnz"]
    size_src, size_dst = hdr["rows"], hdr["cols"]
    # robust: the size line is the only line whose (src,dst) == (rows,cols)
    # AND removing exactly one such occurrence leaves nnz rows. Use a
    # limit-1 anti approach: subtract one matching row via row_number.
    from pyspark.sql import Window

    w = Window.partitionBy("src", "dst").orderBy(F.monotonically_increasing_id())
    edges = (
        parsed.withColumn(
            "_rn",
            F.when(
                (F.col("src") == size_src) & (F.col("dst") == size_dst),
                F.row_number().over(w),
            ).otherwise(F.lit(0)),
        )
        .filter(F.col("_rn") != 1)
        .drop("_rn")
    )
    if hdr["symmetric"] or hdr["skew_symmetric"]:
        negate = weighted and hdr["skew_symmetric"] and negate_skew
        rev = edges.select(
            F.col("dst").alias("src"), F.col("src").alias("dst"),
            *([(-F.col("weight")).alias("weight") if negate
               else F.col("weight")] if weighted else []),
        )
        edges = edges.unionByName(rev)
    vertices = spark.range(1, hdr["n"] + 1).select(F.col("id"))
    return edges, vertices, hdr


def write_mtx(edges: DataFrame, path: str, n: int | None = None) -> None:
    """Serialize an edge DataFrame as MTX coordinate text
    (``writeMtx``, ``mtx.hxx:166-180``). Driver-side single file — intended
    for test-scale cross-checks against the reference binary."""
    pdf = edges.select("src", "dst").toPandas().sort_values(["src", "dst"])
    hi = int(max(pdf["src"].max(), pdf["dst"].max())) if len(pdf) else 0
    n = n or hi
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write(f"{n} {n} {len(pdf)}\n")
        for s, d in pdf.itertuples(index=False):
            f.write(f"{s} {d}\n")
