"""Structured Streaming skin: a stream of edge-batch files drives
incremental re-ranking; final ranks equal golden static ranks on the final
edge set."""

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import PageRankOptions
from pagerank_barrierfree_openmp_dynamic_spark.streaming import (
    IncrementalPageRank,
    stream_batches,
)

from oracle import pagerank_oracle


def test_windowed_counts_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode windowed aggregation: a window is emitted once the
    watermark passes its end, and rows arriving later than the watermark
    for an already-finalized window are dropped."""
    from datetime import datetime

    from pagerank_barrierfree_openmp_dynamic_spark.streaming import (
        windowed_event_counts,
    )

    d = tmp_path / "events"
    d.mkdir()

    def write(name, rows):
        pd.DataFrame(rows, columns=["ts", "event_type", "value"]).to_parquet(
            d / name, coerce_timestamps="us", allow_truncated_timestamps=True)

    T = lambda h, m: datetime(2026, 1, 1, h, m)  # noqa: E731
    # micro-batch 1: two rows in the 10:00 window, one at 12:40 that pushes
    # the watermark (30 min) to 12:10 -> the 10:00-11:00 window finalizes
    write("b0.parquet", [(T(10, 5), "click", 1.0), (T(10, 20), "click", 2.0),
                         (T(12, 40), "view", 1.0)])

    stream = (
        spark.readStream.schema("ts timestamp, event_type string, value double")
        .parquet(str(d))
    )
    q = (
        windowed_event_counts(stream)
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_w"))
        .start()
    )
    q.processAllAvailable()  # batch 1: watermark advances to 12:10
    # micro-batch 2: a LATE row for the finalized 10:00 window (dropped) and
    # a 13:45 row that pushes the watermark past the 12:00 window's end
    write("b1.parquet", [(T(10, 30), "click", 100.0),
                         (T(13, 45), "view", 1.0)])
    q.processAllAvailable()  # batch 2: emits win10 (late row dropped), wm->13:15
    write("b2.parquet", [(T(14, 0), "view", 1.0)])
    q.processAllAvailable()  # batch 3: emits win12 under the 13:15 watermark
    q.stop()
    out = spark.sql("SELECT * FROM win_counts").toPandas()
    got = {
        (r.window_start.hour, r.event_type): (r.n, r.sum_value)
        for r in out.itertuples()
    }
    # late 10:30 row NOT counted; 13:00 window never finalized -> absent
    assert got[(10, "click")] == (2, 3.0)
    assert got[(12, "view")] == (1, 1.0)
    assert (13, "view") not in got


def test_streamed_batches_converge_to_golden(spark, tmp_path):
    n = 150
    edges_pdf = datagen.synth_edges(n, seed=17)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    engine = IncrementalPageRank(
        g, PageRankOptions(tolerance=1e-9, metrics_level="none"))

    # three sequential batches: delete some edges, insert some new ones
    rng = np.random.default_rng(8)
    es = set(map(tuple, edges_pdf[["src", "dst"]].itertuples(index=False)))
    batch_dir = tmp_path / "batches"
    batch_dir.mkdir()
    for b in range(3):
        cur = sorted(es)
        idx = rng.choice(len(cur), size=5, replace=False)
        dels = [cur[i] for i in idx]
        ins = []
        for _ in range(5):
            s = int(rng.integers(0, n))
            t = (s + 1 + int(rng.integers(0, n - 1))) % n
            ins.append((s, t))
        pdf = pd.DataFrame(
            [(s, t, "del") for s, t in dels] + [(s, t, "ins") for s, t in ins],
            columns=["src", "dst", "op"],
        )
        pdf.to_parquet(batch_dir / f"batch_{b}.parquet")
        es -= set(dels)
        es |= set(ins)

    q = stream_batches(
        spark, str(batch_dir), engine, str(tmp_path / "ckpt"),
        available_now=True)
    q.awaitTermination(300)

    golden, _ = pagerank_oracle(n, sorted(es), tol=1e-14)
    pdf = engine.ranks.toPandas().sort_values("id")
    assert np.allclose(pdf["rank"].to_numpy(), golden, atol=1e-6)
    # one incremental result per micro-batch + the initial static run.
    # availableNow may coalesce the three files into fewer micro-batches;
    # at least one incremental update must have happened.
    assert len(engine.history) >= 2
    try:
        g.unpersist()
    except Exception:
        pass


def test_session_windows_batch_semantics(spark):
    """Gap-based sessionization: touching windows MERGE (an event exactly
    at the previous session's end extends it — Spark session_window rule,
    mirrored by the driver oracle's strict > gap split), session_end = last
    event + gap, per-key isolation."""
    from datetime import datetime

    from pagerank_barrierfree_openmp_dynamic_spark.streaming import (
        sessionized_event_counts,
    )

    T = lambda h, m: datetime(2026, 1, 1, h, m)  # noqa: E731
    rows = [
        # user 1: 10:00, 10:05 (merge), 10:15 (exactly at 10:05+10min ->
        # touching, still MERGES), then 10:30 (gap > 10min -> new session)
        (1, T(10, 0), 1.0), (1, T(10, 5), 2.0),
        (1, T(10, 15), 4.0), (1, T(10, 30), 8.0),
        # user 2: single event -> one session
        (2, T(10, 3), 16.0),
    ]
    ev = spark.createDataFrame(
        pd.DataFrame(rows, columns=["user_id", "ts", "value"]))
    out = sessionized_event_counts(ev, gap="10 minutes").toPandas()
    got = {
        (r.user_id, r.session_start.strftime("%H:%M"),
         r.session_end.strftime("%H:%M")): (r.n, r.sum_value)
        for r in out.itertuples()
    }
    assert got == {
        (1, "10:00", "10:25"): (3, 7.0),
        (1, "10:30", "10:40"): (1, 8.0),
        (2, "10:03", "10:13"): (1, 16.0),
    }


def test_session_windows_streaming_matches_batch(spark, tmp_path):
    """The same session expression runs as a stream: sessions emit once the
    watermark passes their end and match the batch result."""
    from datetime import datetime

    from pagerank_barrierfree_openmp_dynamic_spark.streaming import (
        sessionized_event_counts,
    )

    d = tmp_path / "sess_events"
    d.mkdir()
    T = lambda h, m: datetime(2026, 1, 1, h, m)  # noqa: E731
    rows = [(1, T(10, 0), 1.0), (1, T(10, 5), 2.0), (2, T(10, 3), 4.0)]
    pd.DataFrame(rows, columns=["user_id", "ts", "value"]).to_parquet(
        d / "b0.parquet", coerce_timestamps="us",
        allow_truncated_timestamps=True)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, value double")
        .parquet(str(d))
    )
    q = (
        sessionized_event_counts(stream, gap="10 minutes",
                                 watermark="5 minutes")
        .writeStream.format("memory").queryName("sess_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_s"))
        .start()
    )
    q.processAllAvailable()
    # advance the watermark past both sessions' ends
    pd.DataFrame([(3, T(12, 0), 0.0)],
                 columns=["user_id", "ts", "value"]).to_parquet(
        d / "b1.parquet", coerce_timestamps="us",
        allow_truncated_timestamps=True)
    q.processAllAvailable()
    q.stop()
    out = spark.sql("SELECT * FROM sess_out").toPandas()
    got = {(r.user_id, r.session_start.strftime("%H:%M")): (r.n, r.sum_value)
           for r in out.itertuples()}
    assert got[(1, "10:00")] == (2, 3.0)
    assert got[(2, "10:03")] == (1, 4.0)


def test_streaming_degree_state_tracks_running_out_degree(spark, tmp_path):
    """applyInPandasWithState frontier tracker: per-src running out-degree
    accumulates across micro-batches, deletions subtract, net-zero batches
    emit nothing, and the final state equals a batch group-by over all
    events."""
    from pagerank_barrierfree_openmp_dynamic_spark.streaming import (
        streaming_degree_state,
    )

    d = tmp_path / "edge_events"
    d.mkdir()

    def write(name, rows):
        pd.DataFrame(rows, columns=["src", "op"]).astype("int64").to_parquet(
            d / name)

    # batch 0: src 1 gains 2 edges, src 2 gains 1
    write("b0.parquet", [(1, 1), (1, 1), (2, 1)])

    stream = spark.readStream.schema("src long, op long").parquet(str(d))
    q = (
        streaming_degree_state(stream)
        .writeStream.format("memory")
        .queryName("deg_state")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_deg"))
        .start()
    )
    q.processAllAvailable()
    # batch 1: src 1 loses 1 edge; src 2 has +1/-1 (net zero -> no emit);
    # src 3 appears
    write("b1.parquet", [(1, -1), (2, 1), (2, -1), (3, 1)])
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT * FROM deg_state").toPandas()
    # update-mode memory sink appends each micro-batch's emissions with no
    # guaranteed row order; `events` is strictly increasing per src, so the
    # max-events row is the current state.
    latest = out.sort_values("events").groupby("src").last()
    assert latest.loc[1, "out_degree"] == 1          # 2 - 1
    assert latest.loc[1, "events"] == 3
    assert latest.loc[2, "out_degree"] == 1          # batch 1 was net zero
    assert latest.loc[3, "out_degree"] == 1
    # src 2's net-zero micro-batch still emits (its edge SET changed — the
    # frontier must re-scatter it): two rows, the later with delta=0
    rows2 = out[out["src"] == 2].sort_values("events")
    assert len(rows2) == 2
    assert rows2["delta"].tolist() == [1, 0]
    assert rows2["out_degree"].tolist() == [1, 1]
    # cross-check against a batch group-by over the full event log
    full = pd.concat([pd.read_parquet(d / f) for f in ("b0.parquet", "b1.parquet")])
    want = full.groupby("src")["op"].sum()
    for s in (1, 2, 3):
        assert latest.loc[s, "out_degree"] == want.loc[s]


_deg_state_runs = [0]


def test_streaming_degree_state_property(spark, tmp_path):
    """Property (seeded cases, not hypothesis — each case spins a real
    streaming query): for ARBITRARY insert/delete event batchings, the
    max-`events` emission per src equals the batch group-by over the full
    event log — out_degree = sum(op), events = count(*). Holds because the
    tracker emits on every touched batch (including net-zero ones)."""
    from pagerank_barrierfree_openmp_dynamic_spark.streaming import (
        streaming_degree_state,
    )

    rng = np.random.default_rng(23)
    for case in range(3):
        _deg_state_runs[0] += 1
        tag = _deg_state_runs[0]
        d = tmp_path / f"ev{tag}"
        d.mkdir()
        n_batches = int(rng.integers(2, 5))
        frames = []
        for b in range(n_batches):
            k = int(rng.integers(1, 20))
            pdf = pd.DataFrame({
                "src": rng.integers(0, 6, size=k),
                "op": rng.choice([1, -1], size=k),
            }).astype("int64")
            frames.append(pdf)
            pdf.to_parquet(d / f"b{b}.parquet")
        stream = spark.readStream.schema("src long, op long").parquet(str(d))
        q = (
            streaming_degree_state(stream)
            .writeStream.format("memory").queryName(f"deg_prop_{tag}")
            .outputMode("update")
            .option("checkpointLocation", str(d / "ckpt"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        out = spark.sql(f"SELECT * FROM deg_prop_{tag}").toPandas()
        latest = out.sort_values("events").groupby("src").last()
        full = pd.concat(frames)
        want_deg = full.groupby("src")["op"].sum()
        want_ev = full.groupby("src")["op"].count()
        assert set(latest.index) == set(want_deg.index)
        for s in want_deg.index:
            assert latest.loc[s, "out_degree"] == want_deg.loc[s], (case, s)
            assert latest.loc[s, "events"] == want_ev.loc[s], (case, s)


def test_streaming_exact_dedup(spark, tmp_path):
    """First-arrival dedup within the watermark horizon: duplicates inside
    the horizon are dropped (across micro-batches too), distinct texts pass,
    and a late copy beyond the horizon survives (time-bounded exactness)."""
    from datetime import datetime

    from pagerank_barrierfree_openmp_dynamic_spark.streaming import (
        streaming_exact_dedup,
    )

    d = tmp_path / "docs"
    d.mkdir()
    T = lambda h, m: datetime(2026, 1, 1, h, m)  # noqa: E731

    def write(name, rows):
        pd.DataFrame(rows, columns=["doc_id", "ts", "text"]).to_parquet(
            d / name, coerce_timestamps="us", allow_truncated_timestamps=True)

    # batch 0: A twice (in-batch dup), B once
    write("b0.parquet", [(1, T(10, 0), "AAA"), (2, T(10, 1), "AAA"),
                         (3, T(10, 2), "BBB")])
    stream = spark.readStream.schema(
        "doc_id long, ts timestamp, text string").parquet(str(d))
    q = (
        streaming_exact_dedup(stream, watermark="30 minutes")
        .writeStream.format("memory").queryName("dedup_out")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_d"))
        .start()
    )
    q.processAllAvailable()
    # batch 1: another A within the horizon (dropped) + C (kept) + a row far
    # in the future that pushes the watermark past A's horizon
    write("b1.parquet", [(4, T(10, 10), "AAA"), (5, T(10, 11), "CCC"),
                         (6, T(14, 0), "ZZZ")])
    q.processAllAvailable()
    # batch 2: A again, beyond the evicted horizon -> survives
    write("b2.parquet", [(7, T(14, 5), "AAA")])
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT * FROM dedup_out").toPandas()
    kept = sorted(out["doc_id"].tolist())
    # first A (id 1 or 2 — first arrival within the file is deterministic
    # only per-batch; both copies are in one batch, exactly ONE survives)
    a_first = [i for i in kept if i in (1, 2)]
    assert len(a_first) == 1
    assert 3 in kept and 5 in kept and 6 in kept
    assert 4 not in kept          # in-horizon duplicate dropped
    assert 7 in kept              # beyond horizon: state evicted, re-emitted

    # batch mode: plain all-time dedup on the same expression
    full = pd.concat([pd.read_parquet(d / f)
                      for f in ("b0.parquet", "b1.parquet", "b2.parquet")])
    bdf = streaming_exact_dedup(spark.createDataFrame(full))
    assert bdf.count() == 4       # AAA, BBB, CCC, ZZZ


def test_degree_state_composes_with_batch_stream(spark, tmp_path):
    """Composition contract: over the SAME (src, dst, op) batch files that
    drive incremental re-ranking, the degree tracker's emitted sources are
    exactly the union of batch src endpoints (the scatter half of the
    frontier seed) and its final degrees equal the final edge set's
    out-degrees."""
    from pagerank_barrierfree_openmp_dynamic_spark.streaming import (
        streaming_degree_state,
    )
    from pyspark.sql import functions as F

    d = tmp_path / "batches"
    d.mkdir()
    # batch 0 inserts, batch 1 deletes a subset + inserts new
    b0 = pd.DataFrame({"src": [0, 0, 1, 2], "dst": [1, 2, 2, 0],
                       "op": ["ins"] * 4})
    b1 = pd.DataFrame({"src": [0, 3], "dst": [1, 0], "op": ["del", "ins"]})
    b0.to_parquet(d / "b0.parquet")
    b1.to_parquet(d / "b1.parquet")

    stream = (
        spark.readStream.schema("src long, dst long, op string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(d))
    )
    ev = stream.select(
        "src",
        F.when(F.col("op") == "ins", F.lit(1)).otherwise(F.lit(-1))
        .cast("long").alias("op"),
    )
    q = (
        streaming_degree_state(ev)
        .writeStream.format("memory").queryName("deg_compose")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ckpt_c"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    out = spark.sql("SELECT * FROM deg_compose").toPandas()
    # every batch src endpoint appeared in the emissions (frontier cover)
    assert set(out["src"]) == {0, 1, 2, 3}
    # final degrees match the net edge set {0->2, 1->2, 2->0, 3->0}
    latest = out.sort_values("events").groupby("src").last()
    assert latest["out_degree"].to_dict() == {0: 1, 1: 1, 2: 1, 3: 1}


def test_stream_rerank_full_pipeline_matches_golden(spark, tmp_path):
    """The COMPOSED pipeline (state.py's promised loop): edge-event stream
    -> stateful degree tracking (applyInPandasWithState, real state store)
    -> frontier seed from the state-emitted changed sources -> O(batch)
    delta overlay -> dynamic-frontier re-rank. Final streamed ranks must
    equal the NumPy golden on the final edge set at 1e-6, and the stateful
    operator's running degrees must match the final graph's out-degrees."""
    from pagerank_barrierfree_openmp_dynamic_spark.streaming import (
        StreamingReRank,
        stream_rerank,
    )

    n = 150
    edges_pdf = datagen.synth_edges(n, seed=23)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    engine = StreamingReRank(
        g, PageRankOptions(tolerance=1e-9, metrics_level="none"))

    rng = np.random.default_rng(11)
    es = set(map(tuple, edges_pdf[["src", "dst"]].itertuples(index=False)))
    event_dir = tmp_path / "events"
    event_dir.mkdir()
    for b in range(3):
        cur = sorted(es)
        idx = rng.choice(len(cur), size=5, replace=False)
        dels = [cur[i] for i in idx]
        ins = []
        for _ in range(5):
            s = int(rng.integers(0, n))
            t = (s + 1 + int(rng.integers(0, n - 1))) % n
            if (s, t) not in es and s != t:
                ins.append((s, t))
        pdf = pd.DataFrame(
            [(s, t, -1) for s, t in dels] + [(s, t, 1) for s, t in ins],
            columns=["src", "dst", "op"],
        )
        pdf.to_parquet(event_dir / f"batch_{b}.parquet")
        es -= set(dels)
        es |= set(ins)

    q = stream_rerank(
        spark, str(event_dir), engine, str(tmp_path / "ckpt_sr"),
        available_now=True)
    q.awaitTermination(300)

    golden, _ = pagerank_oracle(n, sorted(es), tol=1e-14)
    pdf = engine.ranks.toPandas().sort_values("id")
    assert np.allclose(pdf["rank"].to_numpy(), golden, atol=1e-6)
    assert len(engine.summaries) >= 2  # initial static + >=1 incremental

    # the engine's final edge set is the streamed-through edge set
    got = set(map(tuple, engine.graph.edges.filter("src != dst")
                  .toPandas()[["src", "dst"]].itertuples(index=False)))
    assert got == es

    # checkpoint_dir inside event_dir is refused loudly
    import pytest as _pytest
    with _pytest.raises(ValueError, match="sibling"):
        stream_rerank(spark, str(event_dir), engine,
                      str(event_dir / "ckpt"), available_now=True)
    try:
        g.unpersist()
    except Exception:
        pass


def test_interval_attribution_stream_matches_batch(spark, tmp_path):
    """Watermarked stream-stream interval join over a time-ordered 2-batch
    file stream equals the batch range join exactly — including pairs that
    span the batch boundary (click in batch 0, purchase in batch 1)."""
    from pagerank_barrierfree_openmp_dynamic_spark.streaming import (
        interval_attribution,
    )

    rng = np.random.default_rng(17)
    n = 400
    base = pd.Timestamp("2024-03-01")
    pdf = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "ts": base + pd.to_timedelta(
            np.sort(rng.integers(0, 72 * 3600, n)), unit="s"),
        "user_id": rng.integers(0, 12, n).astype(np.int64),
        "event_type": rng.choice(["click", "purchase"], n),
    })
    ev = spark.createDataFrame(pdf)

    batch = interval_attribution(
        ev.filter("event_type = 'click'"),
        ev.filter("event_type = 'purchase'"),
        horizon="2 hours",
    )
    expected = sorted(map(tuple, batch.toPandas()[
        ["purchase_id", "click_id", "user_id", "lag_us"]].itertuples(index=False)))
    assert expected, "fixture produced no matches — widen the horizon"
    # boundary coverage: the cut splits the 72h range in half
    cut = base + pd.Timedelta(hours=36)

    # drive the PRODUCTION harness (mtime-pinned file order, temp-dir
    # cleanup, memory sink) — not a hand-rolled copy of it
    from pagerank_barrierfree_openmp_dynamic_spark.streaming.joins import (
        run_attribution_stream,
    )

    streamed = run_attribution_stream(
        spark, ev, cut=str(cut), horizon="2 hours", watermark="5 minutes")
    got = sorted(map(tuple, streamed.toPandas()[
        ["purchase_id", "click_id", "user_id", "lag_us"]].itertuples(index=False)))
    assert got == expected
    # at least one pair must actually cross the file boundary, otherwise the
    # state-retention path wasn't exercised
    ts_of = dict(zip(pdf.event_id, pdf.ts))
    crossing = [r for r in expected
                if ts_of[r[1]] < cut <= ts_of[r[0]]]
    assert crossing, "no boundary-crossing pair — fixture too sparse"


def test_stream_rerank_survives_new_vertex_batch(spark, tmp_path):
    """A crawl stream discovering a NEW page (edge endpoint outside the
    dense id space) must not kill the streaming query: the engine falls
    back to the full rebuild, GROWS the vertex set (apply_batch unions
    insertion endpoints — pre-fix the new edge silently fell out of the
    id dictionary), and re-ranks naive-dynamic because the changed
    teleport term (1-d)/n invalidates frontier pruning."""
    import pandas as pd

    from pagerank_barrierfree_openmp_dynamic_spark import datagen
    from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import (
        build_graph,
    )
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
        PageRankOptions,
    )
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
        pagerank_arrow,
    )
    from pagerank_barrierfree_openmp_dynamic_spark.streaming.pipeline import (
        StreamingReRank,
        stream_rerank,
    )

    n = 30
    edges_pdf = datagen.synth_edges(n, seed=3)
    g = build_graph(
        spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
        vertices=spark.range(n).select("id"),
    )
    eng = StreamingReRank(
        g, PageRankOptions(tolerance=1e-10, metrics_level="none"))
    ev = pd.DataFrame({"src": [0, 5], "dst": [n, n + 1], "op": [1, 1]})
    ev_dir = str(tmp_path / "events")
    spark.createDataFrame(
        ev, schema="src long, dst long, op long"
    ).coalesce(1).write.parquet(ev_dir)
    q = stream_rerank(spark, ev_dir, eng, str(tmp_path / "cp"),
                      available_now=True)
    q.awaitTermination()
    assert eng.graph.num_vertices == n + 2
    stat = pagerank_arrow(
        eng.graph, PageRankOptions(tolerance=1e-10, metrics_level="none"),
        dense=eng.dense, resident=True)
    a = eng.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    b = stat.ranks.toPandas().sort_values("id")["rank"].to_numpy()
    assert len(a) == n + 2
    assert float(abs(a - b).max()) <= 1e-6
    assert abs(a.sum() - 1.0) < 1e-9
    g.unpersist()
