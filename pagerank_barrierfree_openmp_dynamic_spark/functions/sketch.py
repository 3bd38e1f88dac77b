"""Count-min sketch and exact-verified heavy hitters over integer keys.

The frequency-sketch member of the training-pipeline sketch shelf (next
to MinHash — ``functions/dedup.py`` — and HyperLogLog —
``plans/neighborhood.py``): at 100-TB scale the distinct-key space of an
event/url/user column dwarfs memory, but the sketch is a FIXED
``depth × width`` table and the heavy-hitter candidates are few.

Portable hashing: row i uses the LCG ``h_i(x) = ((a_i·x + b_i) mod p)
mod width`` with ``p = 2³¹−1`` and ``a_i, b_i`` derived from the seed by
the same constants as ``plans/mis.py`` — every product stays far below
2⁶³, so the identical integer arithmetic runs in Spark AND ANSI SQL
(the driver oracle recomputes the sketch bit-for-bit; xxhash64 would be
Spark-only). Keys may be negative: ``pmod`` keeps buckets in range.

Scale shape: ``cms_build`` is one d-fold explode + a (row, bucket)
count — map-side combinable, output ≤ depth·width rows regardless of
input size, and mergeable across partitions/streams by addition.
``heavy_hitters`` uses the sketch only to BOUND the candidate set
(count-min never underestimates, so no true heavy hitter is lost), then
verifies candidates exactly — the output is exact, the sketch caps the
verify cost. The same candidate-bound-then-verify pattern as the
MinHash/LSH dedup joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_P = 2147483647
_A, _B = 1103515245, 12345


def _hash_params(depth: int, seed: int) -> list[tuple[int, int]]:
    out = []
    for i in range(depth):
        a = ((seed + i) * _A + _B) % _P
        b = ((seed + 31 * i + 17) * _A + _B) % _P
        out.append((a if a else 1, b))
    return out


def cms_build(
    df: DataFrame,
    col: str,
    width: int = 1024,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Build the sketch: ``(row, bucket, count)`` with at most
    depth·width rows. Merge two sketches by unioning and re-summing."""
    if width < 1 or depth < 1:
        raise ValueError("width and depth must be >= 1")
    x = F.col(col).cast("long")
    rows = [
        df.select(
            F.lit(i).alias("row"),
            F.pmod((x * F.lit(a) + F.lit(b)) % F.lit(_P),
                   F.lit(width)).alias("bucket"),
        )
        for i, (a, b) in enumerate(_hash_params(depth, seed))
    ]
    allrows = rows[0]
    for r in rows[1:]:
        allrows = allrows.unionByName(r)
    return allrows.groupBy("row", "bucket").agg(F.count("*").alias("count"))


def cms_query(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str = "key",
    width: int = 1024,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """Point-query estimates for a key frame: ``(key, estimate)`` where
    ``estimate = min_i sketch[i, h_i(key)]`` (0 when a row's bucket is
    empty). Never underestimates the true count."""
    x = F.col(key_col).cast("long")
    probes = [
        keys.select(
            F.col(key_col).alias("key"),
            F.lit(i).alias("row"),
            F.pmod((x * F.lit(a) + F.lit(b)) % F.lit(_P),
                   F.lit(width)).alias("bucket"),
        )
        for i, (a, b) in enumerate(_hash_params(depth, seed))
    ]
    allp = probes[0]
    for p in probes[1:]:
        allp = allp.unionByName(p)
    return (
        allp.join(sketch, ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("count", F.lit(0))).alias("estimate"))
    )


def heavy_hitters(
    df: DataFrame,
    col: str,
    threshold: int,
    width: int = 1024,
    depth: int = 4,
    seed: int = 7,
) -> DataFrame:
    """EXACT keys with count ≥ threshold, found sketch-first:
    candidates = distinct keys whose count-min estimate clears the
    threshold (a superset of the truth — CMS never underestimates), then
    one exact count over the candidate semi-join. Returns
    ``(key, count)``."""
    if threshold < 1:
        raise ValueError("threshold must be >= 1")
    sketch = cms_build(df, col, width, depth, seed)
    cand = (
        cms_query(sketch, df.select(F.col(col).alias("key")).distinct(),
                  "key", width, depth, seed)
        .filter(F.col("estimate") >= threshold)
        .select("key")
    )
    return (
        df.select(F.col(col).alias("key"))
        .join(F.broadcast(cand), "key", "left_semi")
        .groupBy("key")
        .agg(F.count("*").alias("count"))
        .filter(F.col("count") >= threshold)
    )
