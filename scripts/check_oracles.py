#!/usr/bin/env python
"""Local mirror of the driver's queries()-vs-oracle_sql() comparison.

For every entry in __spark_entry__.queries(), runs the Spark query and (if
present) the DuckDB oracle SQL at sf0.01, then compares:
  - row count
  - column names (sorted)
  - order-insensitive value multiset (rows sorted; floats compared exactly —
    queries round on both sides, so surviving FP noise is a real bug)

Usage: python scripts/check_oracles.py [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from pagerank_barrierfree_openmp_dynamic_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return v
    return v


def compare(name, spark_df, con, sql):
    spdf = spark_df.toPandas()
    ddf = con.sql(sql).df()
    problems = []
    if sorted(spdf.columns) != sorted(ddf.columns):
        problems.append(f"columns: spark={sorted(spdf.columns)} duckdb={sorted(ddf.columns)}")
        return problems
    cols = sorted(spdf.columns)
    if len(spdf) != len(ddf):
        problems.append(f"rowcount: spark={len(spdf)} duckdb={len(ddf)}")
    a = sorted(map(tuple, spdf[cols].map(_norm).itertuples(index=False)))
    b = sorted(map(tuple, ddf[cols].map(_norm).itertuples(index=False)))
    if a != b:
        diff_a = [r for r in a if r not in set(b)][:3]
        diff_b = [r for r in b if r not in set(a)][:3]
        problems.append(f"values differ; spark-only={diff_a} duckdb-only={diff_b}")
    return problems


def main():
    only = set(sys.argv[1:])
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    spark = get_spark(app_name="check-oracles", cpus=8, shuffle_partitions=8,
                      extra_conf={"spark.sql.adaptive.enabled": "false"})
    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    bad = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            df = fn(spark, SF_DIR)
            if name in oracles:
                problems = compare(name, df, con, oracles[name])
            else:
                n = df.count()
                problems = [] if n >= 0 else ["negative count?"]
                problems += [] if df.columns else ["no columns"]
                print(f"  (no oracle; rows={n})", end="")
        except Exception as exc:  # noqa: BLE001
            problems = [f"EXCEPTION {type(exc).__name__}: {exc}"]
        dt = time.monotonic() - t0
        status = "OK " if not problems else "FAIL"
        print(f"{status} {name} ({dt:.1f}s)")
        for p in problems:
            print(f"     {p}")
            bad += 1
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
