"""As-of join vs hand expectations and a DuckDB ASOF JOIN parity check
(the same engine the driver oracle uses)."""

import datetime as dt

import duckdb
import pytest

from pagerank_barrierfree_openmp_dynamic_spark.operators.asof import asof_join


def _ts(m):
    return dt.datetime(2024, 1, 1, 0, m)


@pytest.fixture(scope="module")
def sides(spark):
    left = spark.createDataFrame(
        [
            (100, 1, _ts(5)),    # after right@3 -> matches 3
            (101, 1, _ts(10)),   # equal ts as right@10 -> inclusive match
            (102, 1, _ts(2)),    # before any right row -> NULL
            (103, 2, _ts(30)),   # key with no right rows at all -> NULL
        ],
        "event_id long, user_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, _ts(3), 3.0),
            (1, _ts(10), 10.0),
            (1, _ts(20), 20.0),
        ],
        "user_id long, ts timestamp, value double",
    )
    return left, right


def test_asof_backward_inclusive(sides):
    left, right = sides
    got = {r.event_id: r for r in
           asof_join(left, right, on=["user_id"]).collect()}
    assert got[100].asof_value == 3.0 and got[100].asof_ts == _ts(3)
    assert got[101].asof_value == 10.0        # equal ts included
    assert got[102].asof_value is None and got[102].asof_ts is None
    assert got[103].asof_value is None


def test_asof_tolerance(sides):
    left, right = sides
    got = {r.event_id: r for r in
           asof_join(left, right, on=["user_id"],
                     tolerance_seconds=60.0).collect()}
    assert got[101].asof_value == 10.0        # 0s lag: kept
    assert got[100].asof_value is None        # 120s lag: voided
    assert got[100].asof_ts is None


def test_asof_duckdb_parity(spark, sides):
    left, right = sides
    got = sorted(
        (r.event_id,
         r.asof_ts and r.asof_ts.isoformat(),
         r.asof_value)
        for r in asof_join(left, right, on=["user_id"]).collect()
    )
    con = duckdb.connect()
    lpd = left.toPandas()
    rpd = right.toPandas()
    con.register("l", lpd)
    con.register("r", rpd)
    want = sorted(
        (int(e), t.isoformat() if t is not None else None,
         float(v) if v is not None else None)
        for e, t, v in con.sql("""
            SELECT l.event_id, r.ts, r.value
            FROM l ASOF LEFT JOIN r
              ON l.user_id = r.user_id AND l.ts >= r.ts
        """).fetchall()
    )
    assert got == want
    con.close()


def test_asof_random_vs_pandas_merge_asof(spark):
    """Randomized parity vs pandas.merge_asof (backward, inclusive) —
    seeded, multiple keys, duplicate left timestamps, tolerance."""
    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    n_l, n_r = 300, 200
    lpd = pd.DataFrame({
        "event_id": np.arange(n_l),
        "user_id": rng.integers(0, 8, n_l),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 100_000, n_l), unit="s"),
    })
    rpd = pd.DataFrame({
        "user_id": rng.integers(0, 8, n_r),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 100_000, n_r), unit="s"),
        "value": rng.random(n_r).round(6),
    }).drop_duplicates(["user_id", "ts"])

    for tol in (None, 3600.0):
        got = asof_join(
            spark.createDataFrame(lpd), spark.createDataFrame(rpd),
            on=["user_id"], tolerance_seconds=tol,
        ).toPandas().sort_values("event_id").reset_index(drop=True)
        want = pd.merge_asof(
            lpd.sort_values("ts"), rpd.sort_values("ts"),
            on="ts", by="user_id", direction="backward",
            tolerance=None if tol is None else pd.Timedelta(seconds=tol),
        ).sort_values("event_id").reset_index(drop=True)
        assert len(got) == len(want) == n_l
        lhs = got["asof_value"].to_numpy()
        rhs = want["value"].to_numpy()
        both_nan = pd.isna(lhs) & pd.isna(rhs)
        assert (both_nan | (lhs == rhs)).all(), f"tol={tol}"
