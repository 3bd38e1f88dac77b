"""Corpus-hygiene operators: boilerplate segment stats/removal and
benchmark decontamination (functions/corpus.py), checked against
hand-computed expectations and a pure-Python mirror."""

import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark.functions.corpus import (
    boilerplate_stats,
    decontaminate,
    remove_boilerplate,
    segment_table,
    shingle_table,
)


@pytest.fixture(scope="module")
def docs(spark):
    # hand-built: 'a b c d' is a 4-token boilerplate segment shared by docs
    # 1 and 2 of src0; doc 3 is src1 (same segment, different source — must
    # NOT count); doc 4 is short (partial trailing segment); doc 5 empty.
    rows = [
        (1, "a b c d x y z w", "src0"),
        (2, "a b c d q r s t", "src0"),
        (3, "a b c d m n o p", "src1"),
        (4, "u v", "src0"),
        (5, "", "src0"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_segment_table_positions_and_partials(docs):
    seg = {(r.doc_id, r.pos): r.seg
           for r in segment_table(docs, seg_len=4,
                                  extra_cols=("source",)).collect()}
    assert seg[(1, 0)] == "a b c d" and seg[(1, 1)] == "x y z w"
    assert seg[(4, 0)] == "u v"          # trailing partial kept
    assert not any(d == 5 for d, _ in seg)  # empty doc -> no rows


def test_boilerplate_stats_per_source(docs):
    out = {r.doc_id: r for r in
           boilerplate_stats(docs, seg_len=4, min_docs=2).collect()}
    # 'a b c d' appears in docs 1 and 2 (both src0) -> boilerplate there
    assert out[1].n_boiler == 1 and out[1].n_segments == 2
    assert out[1].boiler_ratio == 0.5
    assert out[2].n_boiler == 1
    # doc 3 has the same segment but is the only src1 doc -> not boilerplate
    assert out[3].n_boiler == 0
    assert out[4].n_boiler == 0 and out[4].n_segments == 1
    assert 5 not in out


def test_remove_boilerplate_reassembles_in_order(docs):
    out = {r.doc_id: r for r in
           remove_boilerplate(docs, seg_len=4, min_docs=2).collect()}
    assert out[1].clean_text == "x y z w" and out[1].n_kept == 1
    assert out[2].clean_text == "q r s t"
    assert out[3].clean_text == "a b c d m n o p" and out[3].n_kept == 2
    assert out[4].clean_text == "u v"


def test_remove_boilerplate_all_boiler_yields_empty(spark):
    rows = [(1, "a b c d", "s"), (2, "a b c d", "s")]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {r.doc_id: r for r in
           remove_boilerplate(df, seg_len=4, min_docs=2).collect()}
    assert out[1].clean_text == "" and out[1].n_kept == 0
    assert out[2].clean_text == ""


def test_shingle_table_overlap_and_short_docs(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "a b")], "doc_id long, text string")
    sh = sorted(r.shingle for r in shingle_table(df, k=3).collect()
                if r.doc_id == 1)
    assert sh == ["a b c", "b c d", "c d e"]
    assert not [r for r in shingle_table(df, k=3).collect() if r.doc_id == 2]


def test_decontaminate_matches_python_mirror(spark):
    # seeded word-soup corpus; mirror computes the same flags in pure Python
    import random

    rng = random.Random(7)
    vocab = ["red", "blue", "green", "fast", "slow", "table", "scan"]
    texts = {i: " ".join(rng.choice(vocab) for _ in range(20))
             for i in range(40)}
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], "doc_id long, text string")
    ev = df.filter("doc_id % 7 = 0")
    corpus = df.filter("doc_id % 7 != 0")
    k = 4

    def sh(t):
        w = t.split()
        return {" ".join(w[i:i + k]) for i in range(len(w) - k + 1)}

    eval_sh = set().union(*(sh(texts[i]) for i in texts if i % 7 == 0))
    expect = {}
    for i, t in texts.items():
        if i % 7 == 0:
            continue
        s = sh(t)
        hits = len(s & eval_sh)
        if hits:
            expect[i] = (hits, len(s))

    got = {r.doc_id: (r.n_hit_shingles, r.n_shingles)
           for r in decontaminate(corpus, ev, k=k).collect()}
    assert got == expect
    for r in decontaminate(corpus, ev, k=k).collect():
        assert r.hit_ratio == round(r.n_hit_shingles / r.n_shingles, 6)


def test_decontaminate_plan_is_broadcast(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "a b c d x y"), (3, "p q r s t u")],
        "doc_id long, text string")
    plan = decontaminate(df.filter("doc_id > 1"), df.filter("doc_id = 1"),
                         k=4)._jdf.queryExecution().executedPlan().toString()
    # the eval shingle side must broadcast — the corpus is never shuffled
    # for the contamination probe
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_run_corpus_job_end_to_end(spark, tmp_path):
    """jobs/run_corpus.py: the full corpus-preparation funnel — lang +
    quality filters, boilerplate strip, dedup, decontamination, splits —
    runs end-to-end, the funnel counts are monotone non-increasing, and
    the written corpus partitions exactly by split."""
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "/root/repo/jobs")
    import run_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    src = str(tmp_path / "docs_in")
    docs.write.parquet(src)
    ev = str(tmp_path / "eval_in")
    docs.filter("doc_id % 97 = 0").write.parquet(ev)
    out = str(tmp_path / "corpus_out")

    buf = io.StringIO()
    with redirect_stdout(buf):
        run_corpus.main([
            "--docs", src, "--output", out,
            "--langs", "en,de,fr,es,und",
            "--min-quality", "0.05",
            "--boiler-seg-len", "6", "--boiler-min-docs", "2",
            "--dedup", "exact",
            "--eval-docs", ev, "--decon-k", "4",
            "--max-dup-frac", "0.9", "--dup-span-k", "4",
            "--redact-pii",
            "--splits", "train:0.8,val:0.1,test:0.1",
            "--pack-max-tokens", "64", "--pack-shards", "4",
        ])
    rep = json.loads(buf.getvalue().strip().splitlines()[-1])
    f = rep["funnel"]
    stages = ["input", "after_lang", "after_quality", "after_boilerplate",
              "after_dedup", "after_decontamination", "after_span_dedup",
              "output"]
    assert [s for s in f
            if s not in ("pii_spans_redacted", "packing")] == stages
    # the synthetic corpus is PII-free: redaction is a verified no-op
    assert f["pii_spans_redacted"] == 0
    counts = [f[s] for s in stages]
    assert counts == sorted(counts, reverse=True)   # monotone funnel
    assert f["input"] == 500 and f["output"] > 0
    # decontamination really dropped the eval-overlapping docs
    assert f["after_decontamination"] < f["after_dedup"]

    written = spark.read.parquet(out)
    assert written.count() == f["output"]
    assert set(r.split for r in written.select("split").distinct().collect()) \
        <= {"train", "val", "test"}
    # splits are deterministic: re-assigning reproduces the same column
    from pagerank_barrierfree_openmp_dynamic_spark.functions.sampling import (
        assign_split,
    )
    re = assign_split(written.drop("split"), "doc_id",
                      {"train": 0.8, "val": 0.1, "test": 0.1})
    joined = written.select("doc_id", "split").join(
        re.select("doc_id", re.split.alias("split2")), "doc_id")
    assert joined.filter("split != split2").count() == 0

    # packing stage: side table covers every surviving nonempty doc,
    # windows never cross splits, no multi-doc window overfills
    packed = spark.read.parquet(out + "_packing")
    assert set(packed.columns) == {"split", "shard", "doc_id", "n_tokens",
                                   "bin"}
    assert packed.count() <= f["output"]
    assert f["packing"] and all(v["windows"] > 0
                                for v in f["packing"].values())
    from pyspark.sql import functions as F
    per_win = (packed.groupBy("split", "shard", "bin")
               .agg(F.sum("n_tokens").alias("fill"),
                    F.count("*").alias("nd")).collect())
    for r in per_win:
        assert r["fill"] <= 64 or r["nd"] == 1
    # doc↔split assignment in the side table matches the corpus
    mism = (packed.select("doc_id", F.col("split").alias("ps"))
            .join(written.select("doc_id", "split"), "doc_id")
            .filter("ps != split").count())
    assert mism == 0


# --- cross-document duplicated spans (exact-substring dedup pass) ---

from pagerank_barrierfree_openmp_dynamic_spark.functions.corpus import (  # noqa: E402
    dup_span_report,
    duplicate_spans,
)


@pytest.fixture(scope="module")
def span_docs(spark):
    rows = [
        (1, "a b c d e"),        # spans: 'a b c','b c d','c d e'
        (2, "a b c x y"),        # spans: 'a b c','b c x','c x y'
        (3, "z z"),              # < k tokens -> no spans, no row
        (4, "c d e c d e"),      # distinct spans: 'c d e','d e c','e c d'
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_duplicate_spans_hand_oracle(span_docs):
    got = {r.doc_id: r for r in duplicate_spans(span_docs, k=3).collect()}
    assert set(got) == {1, 2, 4}  # doc 3 too short
    # duplicated spans: 'a b c' (docs 1,2) and 'c d e' (docs 1,4)
    assert (got[1].n_spans, got[1].n_dup_spans) == (3, 2)
    assert (got[2].n_spans, got[2].n_dup_spans) == (3, 1)
    assert (got[4].n_spans, got[4].n_dup_spans) == (3, 1)
    assert got[1].dup_frac == pytest.approx(0.666667)
    # within-doc repetition alone (doc 4's repeated 'c d e') is NOT
    # cross-document duplication: shingles are distinct per doc first
    assert got[4].dup_frac == pytest.approx(0.333333)


def test_dup_span_report_hand_oracle(span_docs):
    rows = [(r.span, r.n_docs) for r in dup_span_report(span_docs, k=3).collect()]
    assert rows == [("a b c", 2), ("c d e", 2)]


def test_latest_snapshot_argmax_per_key(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.corpus import (
        latest_snapshot,
    )

    pdf = pd.DataFrame({
        "url": ["a", "a", "a", "b", "b", "c"],
        "ts":  [3,   9,   9,   1,   2,   5],
        "cap": [10,  11,  12,  20,  21,  30],
        "body": ["x1", "x2", "x3", "y1", "y2", "z1"],
    })
    out = latest_snapshot(spark.createDataFrame(pdf), "url", "ts", "cap") \
        .toPandas().sort_values("url").reset_index(drop=True)
    # a: ts tie 9/9 -> larger cap (12) wins; b: ts 2; c: singleton
    assert list(out.url) == ["a", "b", "c"]
    assert list(out.cap) == [12, 21, 30]
    assert list(out.body) == ["x3", "y2", "z1"]
    assert list(out.ts) == [9, 2, 5]


def test_latest_snapshot_single_aggregate_plan(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.corpus import (
        latest_snapshot,
    )

    pdf = pd.DataFrame({"url": ["a"], "ts": [1], "cap": [1], "body": ["x"]})
    out = latest_snapshot(spark.createDataFrame(pdf), "url", "ts", "cap")
    plan = out._jdf.queryExecution().executedPlan().toString()
    # argmax via max(struct): one Exchange (the groupBy shuffle), no Window
    assert plan.count("Exchange") == 1, plan
    assert "Window" not in plan, plan


def test_token_drift_matches_mirror(spark):
    import math
    from collections import Counter

    from pagerank_barrierfree_openmp_dynamic_spark.functions.corpus import (
        token_drift,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    pdf = docs.toPandas()
    srcs = sorted(pdf.source.unique())
    a, b = srcs[0], srcs[-1]
    got = token_drift(docs, a, b).toPandas().iloc[0]

    def cnt(src):
        c = Counter()
        for t in pdf[pdf.source == src].text:
            c.update(x for x in t.split(" ") if x)
        return c

    ca, cb = cnt(a), cnt(b)
    vocab = set(ca) | set(cb)
    na, nb, v = sum(ca.values()), sum(cb.values()), len(vocab)
    kl_ab = kl_ba = jsd = 0.0
    for t in vocab:
        pa = (ca[t] + 1) / (na + v)
        pb = (cb[t] + 1) / (nb + v)
        m = (pa + pb) / 2
        kl_ab += pa * math.log(pa / pb)
        kl_ba += pb * math.log(pb / pa)
        jsd += pa * math.log(pa / m) / 2 + pb * math.log(pb / m) / 2
    assert got.vocab == v and got.n_a == na and got.n_b == nb
    assert got.kl_ab == pytest.approx(round(kl_ab, 6), abs=2e-6)
    assert got.kl_ba == pytest.approx(round(kl_ba, 6), abs=2e-6)
    assert got.jsd == pytest.approx(round(jsd, 6), abs=2e-6)
    # divergences are non-negative; JSD bounded by ln 2
    assert got.kl_ab >= 0 and got.kl_ba >= 0
    assert 0 <= got.jsd <= math.log(2)


def test_token_drift_identical_sources_is_zero(spark):
    import pandas as pd2

    from pagerank_barrierfree_openmp_dynamic_spark.functions.corpus import (
        token_drift,
    )

    df = spark.createDataFrame(pd2.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b c", "a b c"],
        "source": ["x", "y"],
    }))
    got = token_drift(df, "x", "y").toPandas().iloc[0]
    assert got.kl_ab == got.kl_ba == got.jsd == 0.0


# ---------------------------------------------------------------------------
# chunk_documents


from pagerank_barrierfree_openmp_dynamic_spark.functions.corpus import (  # noqa: E402
    chunk_documents,
)


def _chunk_mirror(text, size, stride):
    toks = [t for t in text.split(" ") if t]
    out = []
    start = 0
    idx = 0
    while start < len(toks):
        piece = toks[start:start + size]
        out.append((idx, start, len(piece), " ".join(piece)))
        start += stride
        idx += 1
    return out


def test_chunk_documents_matches_mirror(spark):
    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            " ".join(f"w{i}" for i in range(100)),   # many chunks
            " ".join(f"x{i}" for i in range(32)),    # exactly one window
            " ".join(f"y{i}" for i in range(33)),    # one full + tail
            "single",                                # shorter than size
            "",                                      # empty -> no rows
        ],
    })
    got = chunk_documents(spark.createDataFrame(docs), size=32, stride=24) \
        .orderBy("doc_id", "chunk_idx").toPandas()
    expect = []
    for _, r in docs.iterrows():
        for idx, start, ln, txt in _chunk_mirror(r.text, 32, 24):
            expect.append((r.doc_id, idx, start, ln, txt))
    assert [
        (r.doc_id, r.chunk_idx, r.chunk_start, r.chunk_len, r.chunk_text)
        for r in got.itertuples()
    ] == expect
    # overlap contract: consecutive chunks share size - stride tokens
    first = got[(got.doc_id == 1) & (got.chunk_idx == 0)].iloc[0]
    second = got[(got.doc_id == 1) & (got.chunk_idx == 1)].iloc[0]
    assert first.chunk_text.split()[24:] == second.chunk_text.split()[:8]


def test_chunk_documents_rejects_bad_params(spark):
    df = spark.createDataFrame(pd.DataFrame({"doc_id": [1], "text": ["a"]}))
    with pytest.raises(ValueError):
        chunk_documents(df, size=0)
    with pytest.raises(ValueError):
        chunk_documents(df, stride=0)


def test_mirror_report(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.corpus import (
        mirror_report,
    )

    docs = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "source": ["hostB", "hostA", "hostC", "hostA", "hostA"],
        "text": ["mirrored content", "mirrored content", "mirrored content",
                 "unique content", "same host twice"],
    }))
    got = mirror_report(spark.createDataFrame(
        docs.toPandas().assign(text=lambda d: d.text))) \
        .orderBy("doc_id").toPandas()
    # docs 4 (unique) and 5 (single host) never surface
    assert got.doc_id.tolist() == [1, 2, 3]
    assert got.n_mirror_hosts.tolist() == [3, 3, 3]
    assert got.canonical_source.tolist() == ["hostA"] * 3
    assert got.is_canonical.tolist() == [False, True, False]
    # same text twice on ONE host is not a mirror
    solo = mirror_report(spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2], "source": ["h", "h"], "text": ["x", "x"]})))
    assert solo.count() == 0
