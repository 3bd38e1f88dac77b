"""Checkpoint/resume + metrics (north rule: every superstep checkpoints
rank/frontier state and per-partition lineage + iteration metrics so runs
resume mid-convergence)."""

import numpy as np
import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.checkpoint import CheckpointStore
from pagerank_barrierfree_openmp_dynamic_spark.operators.graph import build_graph
from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
    PageRankOptions,
    pagerank,
    resume,
)

from oracle import pagerank_oracle


@pytest.fixture(scope="module")
def tiny_graph(spark):
    g = build_graph(datagen.edges_df(spark, "tiny"),
                    vertices=spark.range(10).select("id"))
    yield g
    g.unpersist()


def _ranks_array(res, n):
    pdf = res.ranks.toPandas().sort_values("id")
    return pdf["rank"].to_numpy()


def test_resume_equals_uninterrupted(spark, tiny_graph, tmp_path):
    """Run 4 supersteps with checkpointing, then resume to convergence; the
    result must equal an uninterrupted run and the golden oracle."""
    ckpt = str(tmp_path / "ckpt")
    golden, _ = pagerank_oracle(10, datagen.tiny_edges(), tol=1e-14)

    partial = pagerank(
        tiny_graph,
        PageRankOptions(tolerance=1e-9, max_iterations=4, checkpoint_dir=ckpt),
    )
    assert partial.iterations == 4
    store = CheckpointStore(ckpt)
    assert store.latest() == 4

    resumed = resume(
        tiny_graph,
        PageRankOptions(tolerance=1e-9, max_iterations=500, checkpoint_dir=ckpt),
    )
    got = _ranks_array(resumed, 10)
    assert np.allclose(got, golden, atol=1e-6)

    full = pagerank(tiny_graph, PageRankOptions(tolerance=1e-9, metrics_level="none"))
    assert np.allclose(got, _ranks_array(full, 10), atol=1e-12)
    # resumed run did only the remaining supersteps
    assert 4 + resumed.iterations - full.iterations in (0, 1)


def test_metrics_written(spark, tiny_graph, tmp_path):
    ckpt = str(tmp_path / "ckpt_m")
    res = pagerank(
        tiny_graph,
        PageRankOptions(tolerance=1e-7, checkpoint_dir=ckpt,
                        metrics_level="partition"),
    )
    store = CheckpointStore(ckpt)
    mdf = store.load_metrics(spark).toPandas()
    # whole-iteration rows (partition_id = -1) for every superstep
    whole = mdf[mdf["partition_id"] == -1]
    assert set(whole["iteration"]) == set(range(1, res.iterations + 1))
    assert (whole["edges_processed"] == tiny_graph.num_edges).all()
    # per-partition lineage rows exist
    assert (mdf["partition_id"] >= 0).any()
    # iteration metrics carry the converging delta
    last = whole.sort_values("iteration")["delta_linf"].to_numpy()
    assert last[-1] < 1e-7 <= last[0]


def test_arrow_resume_equals_uninterrupted(spark, tiny_graph, tmp_path):
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
        pagerank_arrow,
        resume_arrow,
    )

    ckpt = str(tmp_path / "ckpt_arrow")
    golden, _ = pagerank_oracle(10, datagen.tiny_edges(), tol=1e-14)
    partial = pagerank_arrow(
        tiny_graph,
        PageRankOptions(tolerance=1e-9, max_iterations=4, checkpoint_dir=ckpt),
    )
    assert partial.iterations == 4
    assert CheckpointStore(ckpt).latest() == 4
    resumed = resume_arrow(
        tiny_graph,
        PageRankOptions(tolerance=1e-9, max_iterations=500, checkpoint_dir=ckpt),
    )
    got = _ranks_array(resumed, 10)
    assert np.allclose(got, golden, atol=1e-6)
    # metrics parquet contains per-slice lineage rows when requested
    # (slice lineage exists in resident mode)
    res2 = pagerank_arrow(
        tiny_graph,
        PageRankOptions(tolerance=1e-7, checkpoint_dir=str(tmp_path / "m"),
                        metrics_level="partition"),
        resident=True,
    )
    mdf = CheckpointStore(str(tmp_path / "m")).load_metrics(spark).toPandas()
    assert (mdf["partition_id"] >= 0).any()
    assert (mdf[mdf.partition_id >= 0]["edges_processed"] >= 0).all()


def test_personalized_resume_equals_uninterrupted(spark, tiny_graph, tmp_path):
    """The teleport vector is part of the run's recurrence — a resumed
    personalized run must reload it (not silently fall back to uniform)."""
    from pyspark.sql import functions as F

    ckpt = str(tmp_path / "ckpt_p")
    pers = spark.range(3).select("id", (F.lit(1.0) + F.col("id")).alias("p"))

    partial = pagerank(
        tiny_graph,
        PageRankOptions(tolerance=1e-9, max_iterations=4, checkpoint_dir=ckpt),
        personalization=pers,
    )
    assert partial.iterations == 4
    resumed = resume(
        tiny_graph,
        PageRankOptions(tolerance=1e-9, max_iterations=500, checkpoint_dir=ckpt),
    )
    full = pagerank(
        tiny_graph, PageRankOptions(tolerance=1e-9, metrics_level="none"),
        personalization=pers,
    )
    got = _ranks_array(resumed, 10)
    assert np.allclose(got, _ranks_array(full, 10), atol=1e-12)
    # sanity: differs from the uniform-teleport fixed point
    uni = pagerank(tiny_graph, PageRankOptions(tolerance=1e-9, metrics_level="none"))
    assert not np.allclose(got, _ranks_array(uni, 10), atol=1e-6)


def test_arrow_personalized_resume_equals_uninterrupted(spark, tiny_graph,
                                                        tmp_path):
    """resume_arrow of a personalized run re-saves the teleport vector it
    just loaded from the store — the overwrite must not collide with the
    lazy read path (checkpoint.save_personalization materializes first)."""
    from pyspark.sql import functions as F

    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
        pagerank_arrow,
        resume_arrow,
    )

    ckpt = str(tmp_path / "ckpt_ap")
    pers = spark.range(3).select("id", (F.lit(1.0) + F.col("id")).alias("p"))

    partial = pagerank_arrow(
        tiny_graph,
        PageRankOptions(tolerance=1e-9, max_iterations=4, checkpoint_dir=ckpt),
        personalization=pers,
    )
    assert partial.iterations == 4
    resumed = resume_arrow(
        tiny_graph,
        PageRankOptions(tolerance=1e-9, max_iterations=500,
                        checkpoint_dir=ckpt),
    )
    full = pagerank_arrow(
        tiny_graph, PageRankOptions(tolerance=1e-9, metrics_level="none"),
        personalization=pers,
    )
    got = _ranks_array(resumed, 10)
    assert np.allclose(got, _ranks_array(full, 10), atol=1e-12)
    # sanity: differs from the uniform-teleport fixed point
    uni = pagerank_arrow(tiny_graph,
                         PageRankOptions(tolerance=1e-9, metrics_level="none"))
    assert not np.allclose(got, _ranks_array(uni, 10), atol=1e-6)


def test_cc_arrow_resume_equals_uninterrupted(spark, tmp_path):
    """Label-kernel checkpointing: interrupt CC after 1 superstep, resume to
    the fixpoint; components equal an uninterrupted run and the union-find
    oracle, metrics rows carry the labels-changed counts, and resuming
    against a different graph fails loudly."""
    from oracle import cc_oracle

    from pagerank_barrierfree_openmp_dynamic_spark.plans.components import (
        connected_components_arrow,
        resume_connected_components_arrow,
    )

    n = 60
    edges_pdf = datagen.synth_edges(n, seed=5)
    g = build_graph(spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
                    vertices=spark.range(n).select("id"))
    ckpt = str(tmp_path / "cc_ckpt")

    # interrupted: exactly one committed superstep
    connected_components_arrow(g, max_iterations=1, checkpoint_dir=ckpt)
    store = CheckpointStore(ckpt)
    assert store.latest() == 1

    resumed = resume_connected_components_arrow(g, ckpt)
    full = connected_components_arrow(g)
    rp = resumed.toPandas().sort_values("id")["comp"].to_numpy()
    fp = full.toPandas().sort_values("id")["comp"].to_numpy()
    assert (rp == fp).all()
    want = cc_oracle(
        n, list(map(tuple, edges_pdf[["src", "dst"]].itertuples(index=False))))
    assert (rp == np.asarray(want)).all()

    # per-superstep lineage: metrics rows exist, changed counts decrease to 0
    m = store.load_metrics(spark).toPandas().sort_values("iteration")
    assert (m["mode"] == "cc-arrow").all()
    assert m["delta_linf"].iloc[-1] == 0.0 or store.latest() >= 2

    # a graph with a different vertex count must be rejected
    g2 = build_graph(spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
                     vertices=spark.range(n + 3).select("id"))
    with pytest.raises(ValueError, match="refusing to resume"):
        resume_connected_components_arrow(g2, ckpt)
    g.unpersist()
    g2.unpersist()


def test_lpa_arrow_resume_equals_uninterrupted(spark, tmp_path):
    """LPA rounds are deterministic, so 1 checkpointed round + resume to 3
    total rounds equals an uninterrupted 3-round run exactly."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.labelprop import (
        label_propagation_arrow,
        resume_label_propagation_arrow,
    )

    n = 60
    edges_pdf = datagen.synth_edges(n, seed=6)
    g = build_graph(spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
                    vertices=spark.range(n).select("id"))
    ckpt = str(tmp_path / "lpa_ckpt")

    label_propagation_arrow(g, iterations=1, checkpoint_dir=ckpt)
    assert CheckpointStore(ckpt).latest() == 1

    resumed = resume_label_propagation_arrow(g, ckpt, iterations=3)
    full = label_propagation_arrow(g, iterations=3)
    rp = resumed.toPandas().sort_values("id")["label"].to_numpy()
    fp = full.toPandas().sort_values("id")["label"].to_numpy()
    assert (rp == fp).all()
    g.unpersist()


def test_label_checkpoint_guards(spark, tmp_path):
    """Stale/mismatched label checkpoints fail loudly: wrong kernel mode,
    same vertices but changed edge set, and an LPA resume asking for fewer
    total rounds than already committed."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.components import (
        connected_components_arrow,
        resume_connected_components_arrow,
    )
    from pagerank_barrierfree_openmp_dynamic_spark.plans.labelprop import (
        label_propagation_arrow,
        resume_label_propagation_arrow,
    )

    n = 40
    edges_pdf = datagen.synth_edges(n, seed=7)
    g = build_graph(spark.createDataFrame(edges_pdf, schema=datagen.EDGES_SCHEMA),
                    vertices=spark.range(n).select("id"))
    cc_ckpt = str(tmp_path / "cc")
    connected_components_arrow(g, max_iterations=1, checkpoint_dir=cc_ckpt)

    # wrong kernel: LPA resume from a CC checkpoint
    with pytest.raises(ValueError, match="cc-arrow"):
        resume_label_propagation_arrow(g, cc_ckpt, iterations=3)

    # same vertex set, one edge dropped -> edge-count mismatch
    e2 = edges_pdf.iloc[1:]
    g2 = build_graph(spark.createDataFrame(e2, schema=datagen.EDGES_SCHEMA),
                     vertices=spark.range(n).select("id"))
    with pytest.raises(ValueError, match="changed edge set"):
        resume_connected_components_arrow(g2, cc_ckpt)

    # LPA: requesting fewer total rounds than committed is unrecoverable
    lpa_ckpt = str(tmp_path / "lpa")
    label_propagation_arrow(g, iterations=4, checkpoint_dir=lpa_ckpt)
    with pytest.raises(ValueError, match="not monotone"):
        resume_label_propagation_arrow(g, lpa_ckpt, iterations=2)
    g.unpersist()
    g2.unpersist()


def test_arrow_resume_continues_iteration_numbering(spark, tiny_graph,
                                                    tmp_path):
    """resume_arrow must CONTINUE the committed iteration numbering, not
    renumber from 1 into the same root: otherwise latest() points back at
    the stale pre-resume segment and a second resume replays old state."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank_arrow import (
        pagerank_arrow,
        resume_arrow,
    )

    ckpt = str(tmp_path / "ckpt_renum")
    pagerank_arrow(
        tiny_graph,
        PageRankOptions(tolerance=0.0, max_iterations=4,
                        checkpoint_dir=ckpt))
    store = CheckpointStore(ckpt)
    assert store.latest() == 4
    resumed = resume_arrow(
        tiny_graph,
        PageRankOptions(tolerance=0.0, max_iterations=6,
                        checkpoint_dir=ckpt))
    assert resumed.iterations == 2           # ran only the remaining budget
    assert store.latest() == 6               # numbering continued, not reset
    assert store.commit_info(6)["iteration"] == 6
    # and the state at latest() IS the resumed segment's newest state:
    # equal to an uninterrupted 6-iteration run, not run A's iter<=4
    golden, _ = pagerank_oracle(10, datagen.tiny_edges(), tol=0.0, max_iter=6)
    got = (store.load_ranks(spark, 6).toPandas()
           .sort_values("id")["rank"].to_numpy())
    assert np.allclose(got, golden, atol=1e-12)


def test_checkpoint_save_uncommits_before_overwrite(spark, tiny_graph,
                                                    tmp_path, monkeypatch):
    """The write-data-then-commit invariant: overwriting an iteration dir
    must take the stale _COMMIT down FIRST, so a crash mid-overwrite can
    never leave a committed marker over partial parquet."""
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
        pagerank,
    )

    ckpt = str(tmp_path / "ckpt_commit")
    res = pagerank(tiny_graph,
                   PageRankOptions(tolerance=0.0, max_iterations=1,
                                   metrics_level="none"))
    store = CheckpointStore(ckpt)
    store.save(1, res.ranks)
    assert store.latest() == 1

    def boom(df, path):
        raise RuntimeError("disk full")

    monkeypatch.setattr(store, "_write", boom)
    with pytest.raises(RuntimeError):
        store.save(1, res.ranks)
    # the stale marker came down before the failed write: iter=1 is no
    # longer advertised as loadable
    assert store.latest() is None


def test_load_metrics_empty_store_returns_schema(spark, tiny_graph, tmp_path):
    """A store whose run saved no metrics (metrics_level='none') must
    yield an empty frame with METRICS_SCHEMA, not a reader schema error;
    uncommitted iterations' metrics are excluded."""
    from pagerank_barrierfree_openmp_dynamic_spark.checkpoint import (
        METRICS_SCHEMA,
    )
    from pagerank_barrierfree_openmp_dynamic_spark.plans.pagerank import (
        pagerank,
    )

    ckpt = str(tmp_path / "ckpt_nometrics")
    res = pagerank(tiny_graph,
                   PageRankOptions(tolerance=0.0, max_iterations=1,
                                   metrics_level="none"))
    store = CheckpointStore(ckpt)
    store.save(1, res.ranks)  # no metrics dir anywhere
    mdf = store.load_metrics(spark)
    assert mdf.schema == METRICS_SCHEMA
    assert mdf.count() == 0
