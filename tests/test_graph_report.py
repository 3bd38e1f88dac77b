"""jobs/run_graph_report.py end-to-end: every report section lands as
parquet, the JSON summary is consistent with the sections, and the
numbers match the kernels' own oracles where cheap to check."""

import io
import json
import sys
from contextlib import redirect_stdout

import pytest

from pagerank_barrierfree_openmp_dynamic_spark import datagen


@pytest.fixture(scope="module")
def edges_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("report") / "edges_in")
    pdf = datagen.synth_edges(200, seed=11, avg_deg=4.0)
    spark.createDataFrame(pdf, schema=datagen.EDGES_SCHEMA) \
        .write.parquet(p)
    return p


def test_graph_report_job(spark, tmp_path, edges_path):
    sys.path.insert(0, "/root/repo/jobs")
    import run_graph_report

    out = str(tmp_path / "report")
    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = run_graph_report.main(
            ["--edges", edges_path, "--output", out,
             "--host-expr", "id % 9", "--hll-b", "8", "--topk", "10"])
    assert rc == 0
    summary = json.loads(buf.getvalue().strip().splitlines()[-1])
    assert "failures" not in summary

    sections = ["stats", "degree_hist_out", "degree_hist_in", "components",
                "scc_stats", "bowtie", "core_hist", "neighborhood",
                "pagerank_topk", "salsa_topk", "harmonic_topk",
                "closeness_topk",
                "communities", "louvain", "betweenness_topk", "host_graph",
                "host_ranks"]
    for s in sections:
        assert spark.read.parquet(f"{out}/{s}").count() > 0, s

    # summary consistent with the written sections (vertex set is derived
    # from edge endpoints — not every synthetic id is an endpoint)
    e = spark.read.parquet(edges_path)
    n = e.select("src").union(e.select("dst")).distinct().count()
    assert summary["n_vertices"] == n
    comp = spark.read.parquet(f"{out}/components")
    assert summary["n_components"] == comp.count()
    assert sum(r["n_vertices"] for r in comp.collect()) == n
    bt = spark.read.parquet(f"{out}/bowtie")
    assert sum(r["n_vertices"] for r in bt.collect()) == n
    topk = spark.read.parquet(f"{out}/pagerank_topk")
    assert topk.count() == 10
    stopk = spark.read.parquet(f"{out}/salsa_topk")
    assert stopk.filter("kind = 'hub'").count() == 10
    assert stopk.filter("kind = 'authority'").count() == 10
    hosts = spark.read.parquet(f"{out}/host_ranks")
    assert hosts.count() == summary["n_hosts"] <= 9
    # host ranks are a probability vector
    tot = sum(r["rank"] for r in hosts.collect())
    assert abs(tot - 1.0) < 1e-9
    assert 0.0 <= summary["effective_diameter"] <= summary["neighborhood_rounds"]
    assert -1.0 <= summary["degree_assortativity"] <= 1.0
    assert -1.0 <= summary["lpa_modularity"] <= 1.0
    comm = spark.read.parquet(f"{out}/communities")
    assert comm.count() == n
    louv = spark.read.parquet(f"{out}/louvain")
    assert louv.count() == n
    assert -1.0 <= summary["louvain_modularity"] <= 1.0
    assert summary["louvain_communities"] >= 1
    assert summary["lpa_communities"] == comm.select("label").distinct().count()
