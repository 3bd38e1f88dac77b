"""Training-data pipeline operators vs pure-Python/NumPy oracles, run on the
driver-provided documents/embeddings parquet (sf0.001)."""

import hashlib
import re

import numpy as np
import pandas as pd
import pytest

from pagerank_barrierfree_openmp_dynamic_spark.functions import (
    brute_force_topk,
    dedup_exact,
    exact_duplicates,
    extract_features,
    fingerprint,
    lang_id,
    lsh_topk,
    media_metadata_stats,
    minhash_signatures,
    lsh_candidate_pairs,
    jaccard_verify,
    ngram_jaccard_pairs,
    quality_score,
    resize_images,
    sample_frames,
    shingles,
    simhash,
    simhash_near_dup_pairs,
    token_count,
)
from pagerank_barrierfree_openmp_dynamic_spark.functions.text import (
    BPE_ISH_PATTERN,
    LANG_MARKERS,
    STOPWORDS_EN,
)
from pagerank_barrierfree_openmp_dynamic_spark.functions.multimodal import MEDIA_SCHEMA

SF_DIR = "/root/testdata/sf0.001"


def _toks(s):
    return [t for t in s.split(" ") if t]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def docs_pdf(docs):
    return docs.toPandas()


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet").cache()


def test_token_count(docs, docs_pdf):
    got = token_count(docs).toPandas().set_index("doc_id").sort_index()
    for _, r in docs_pdf.iterrows():
        assert got.loc[r.doc_id, "n_tokens"] == len(_toks(r.text))
        assert got.loc[r.doc_id, "n_subtokens"] == len(
            re.findall(BPE_ISH_PATTERN, r.text)
        )


def test_quality_score(docs, docs_pdf):
    got = quality_score(docs).toPandas().set_index("doc_id").sort_index()
    for _, r in docs_pdf.head(50).iterrows():
        toks = _toks(r.text)
        n_chars = len(r.text)
        n_punct = n_chars - len(re.sub(r"[^\w\s]", "", r.text))
        n_stop = sum(1 for t in toks if t.lower() in STOPWORDS_EN)
        assert got.loc[r.doc_id, "n_chars"] == n_chars
        assert got.loc[r.doc_id, "n_tokens"] == len(toks)
        assert got.loc[r.doc_id, "punct_ratio"] == round(n_punct / max(n_chars, 1), 6)
        assert got.loc[r.doc_id, "stopword_ratio"] == round(n_stop / max(len(toks), 1), 6)


def test_lang_id(docs, docs_pdf):
    got = lang_id(docs).toPandas().set_index("doc_id").sort_index()
    for _, r in docs_pdf.head(50).iterrows():
        toks = [t for t in _toks(r.text.lower())]
        scores = {lg: sum(1 for t in toks if t in m) for lg, m in LANG_MARKERS.items()}
        best = max(scores.values())
        want = "und" if best == 0 else min(lg for lg, s in scores.items() if s == best)
        assert got.loc[r.doc_id, "lang_pred"] == want


def test_fingerprint(docs, docs_pdf):
    got = fingerprint(docs).toPandas().set_index("doc_id").sort_index()
    for _, r in docs_pdf.head(30).iterrows():
        assert got.loc[r.doc_id, "md5"] == hashlib.md5(r.text.encode()).hexdigest()
        want_min = min(hashlib.md5(t.encode()).hexdigest() for t in _toks(r.text))
        assert got.loc[r.doc_id, "min_token_hash"] == want_min


def test_exact_dedup(spark, docs, docs_pdf):
    # plant exact duplicates
    dup = docs.limit(5).withColumn("doc_id", docs.doc_id + 100000)
    both = docs.unionByName(dup)
    groups = exact_duplicates(both).toPandas()
    assert (groups["n_docs"] >= 2).sum() == 5
    kept = dedup_exact(both).toPandas()
    assert len(kept) == len(docs_pdf)
    assert set(kept["doc_id"]) == set(docs_pdf["doc_id"])  # min-id reps kept


def _shingle_set(text, n=3):
    t = _toks(text)
    return {" ".join(t[i:i + n]) for i in range(len(t) - n + 1)}


def test_shingles_and_jaccard(spark, docs, docs_pdf):
    sub = docs.filter(docs.doc_id < 60)
    sh = shingles(sub)
    got = sh.toPandas().groupby("id")["shingle"].apply(set).to_dict()
    for _, r in docs_pdf[docs_pdf.doc_id < 60].iterrows():
        want = _shingle_set(r.text)
        if want:
            assert got[r.doc_id] == want
    # plant a near-duplicate: doc 0's text with one word changed
    t0 = docs_pdf.loc[docs_pdf.doc_id == 0, "text"].iloc[0]
    toks = _toks(t0)
    toks[len(toks) // 2] = "CHANGED"
    near = spark.createDataFrame(
        pd.DataFrame({"doc_id": [90000], "text": [" ".join(toks)]}))
    both = sub.select("doc_id", "text").unionByName(near)
    pairs = ngram_jaccard_pairs(both, threshold=0.3).toPandas()
    assert ((pairs["a"] == 0) & (pairs["b"] == 90000)).any()
    row = pairs[(pairs.a == 0) & (pairs.b == 90000)].iloc[0]
    a, b = _shingle_set(t0), _shingle_set(" ".join(toks))
    assert row["jaccard"] == round(len(a & b) / len(a | b), 6)


def test_minhash_lsh_finds_near_dup(spark, docs, docs_pdf):
    t0 = docs_pdf.loc[docs_pdf.doc_id == 1, "text"].iloc[0]
    toks = _toks(t0)
    toks[0] = "ALTERED"
    near = spark.createDataFrame(
        pd.DataFrame({"doc_id": [90001], "text": [" ".join(toks)]}))
    both = docs.filter(docs.doc_id < 60).select("doc_id", "text").unionByName(near)
    sh = shingles(both)
    sig = minhash_signatures(sh, bands=8)
    # signature oracle: min md5("band|shingle")
    sig_pdf = sig.toPandas()
    want = min(
        hashlib.md5(f"3|{s}".encode()).hexdigest() for s in _shingle_set(t0)
    )
    got = sig_pdf[(sig_pdf.id == 1) & (sig_pdf.band == 3)]["sig"].iloc[0]
    assert got == want
    cand = lsh_candidate_pairs(sig)
    verified = jaccard_verify(sh, cand, threshold=0.3).toPandas()
    assert ((verified["a"] == 1) & (verified["b"] == 90001)).any()


def test_simhash_and_near_dup(spark, docs, docs_pdf):
    sig = simhash(docs).toPandas().set_index("doc_id").sort_index()

    def oracle(text, bits=16):
        sums = [0] * bits
        for tok in set(_toks(text)):
            h = hashlib.md5(tok.encode()).hexdigest()
            for j in range(bits):
                sums[j] += 1 if ord(h[j]) % 2 == 1 else -1
        return sum((1 << j) for j in range(bits) if sums[j] > 0)

    for _, r in docs_pdf.head(30).iterrows():
        assert sig.loc[r.doc_id, "simhash"] == oracle(r.text)

    # identical docs -> hamming 0 pair found
    dup = docs.limit(3).withColumn("doc_id", docs.doc_id + 70000)
    both = docs.unionByName(dup)
    pairs = simhash_near_dup_pairs(simhash(both), max_hamming=0).toPandas()
    for i in range(3):
        assert ((pairs.a == i) & (pairs.b == i + 70000) & (pairs.hamming == 0)).any()


def test_brute_force_topk_matches_numpy(emb):
    pdf = emb.toPandas()
    V = np.array([np.asarray(v, dtype=np.float64) for v in pdf["embedding"]])
    ids = pdf["vec_id"].to_numpy()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    sims = Vn @ Vn.T
    queries = emb.filter(emb.vec_id < 3)
    got = brute_force_topk(emb, queries, k=5).toPandas()
    for q in range(3):
        qi = np.where(ids == q)[0][0]
        s = sims[qi].copy()
        s[qi] = -np.inf
        order = sorted(range(len(ids)), key=lambda j: (-round(s[j], 6), ids[j]))[:5]
        want = [ids[j] for j in order]
        g = got[got.q_id == q].sort_values("rank")
        assert list(g["n_id"]) == want
        assert np.allclose(g["sim"].to_numpy(),
                           [round(s[j], 6) for j in order], atol=2e-6)


def test_lsh_topk_recall(emb):
    queries = emb.filter(emb.vec_id < 10)
    exact = brute_force_topk(emb, queries, k=5).toPandas()
    approx = lsh_topk(emb, queries, dim=64, k=5, n_planes=4, multiprobe=2).toPandas()
    # sims of returned candidates must equal exact cosine (re-rank is exact)
    merged = approx.merge(exact, on=["q_id", "n_id"], suffixes=("_a", "_e"))
    assert np.allclose(merged["sim_a"], merged["sim_e"], atol=2e-6)
    # recall@5 over 10 queries; random gaussian corpus is the hard case for
    # cosine LSH (neighbors are near-orthogonal), so the bar is modest —
    # probing to hamming<=2 of 4 planes covers 11/16 buckets.
    recall = len(merged) / len(exact)
    assert recall > 0.5


def test_embedding_near_dup_lsh_subset_of_brute(emb):
    from pagerank_barrierfree_openmp_dynamic_spark.functions import (
        embedding_near_dup_brute,
        embedding_near_dup_pairs,
    )

    brute = embedding_near_dup_brute(emb, threshold=0.3).toPandas()
    lsh = embedding_near_dup_pairs(emb, dim=64, threshold=0.3,
                                   n_planes=4).toPandas()
    bset = {(r.a, r.b): r.sim for r in brute.itertuples()}
    assert len(lsh) > 0
    for r in lsh.itertuples():
        assert (r.a, r.b) in bset  # every LSH pair is a true near-dup...
        assert abs(bset[(r.a, r.b)] - r.sim) < 2e-6  # ...with the exact sim


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", b"img-bytes-0", "image/png", 640, 480, None),
        (1, "image", b"img-bytes-1", "image/png", 320, 200, None),
        (2, "video", b"vid-bytes-2", "video/mp4", 1280, 720, 3500),
        (3, "audio", b"aud-bytes-3", "audio/wav", None, None, 2000),
        (4, "image", None, "image/png", 1, 1, None),
    ]
    return spark.createDataFrame(rows, schema=MEDIA_SCHEMA).cache()


def test_multimodal_features(media):
    f = extract_features(media, dim=8).toPandas()
    assert set(f["media_id"]) == {0, 1, 2, 3}  # null payload skipped
    assert all(len(v) == 8 for v in f["feature"])
    # deterministic: same payload -> same feature
    f2 = extract_features(media, dim=8).toPandas()
    a = f.sort_values("media_id")["feature"].tolist()
    b = f2.sort_values("media_id")["feature"].tolist()
    assert all(np.allclose(x, y) for x, y in zip(a, b))


def test_multimodal_frames_and_resize(media):
    fr = sample_frames(media, every_ms=1000).toPandas()
    assert set(fr["media_id"]) == {2}
    assert len(fr) == 3  # 3500ms // 1000
    rz = resize_images(media, width=8, height=8).toPandas()
    imgs = rz[(rz.kind == "image") & rz.payload.notna()]
    assert all(len(p) == 64 for p in imgs["payload"])
    assert (imgs["width"] == 8).all()
    stats = media_metadata_stats(media).toPandas().set_index("kind")
    assert stats.loc["image", "n"] == 3
    assert stats.loc["video", "avg_duration_ms"] == 3500


def test_multimodal_real_decode_is_stubbed(media):
    with pytest.raises(Exception) as ei:
        extract_features(media, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or isinstance(
        ei.value, NotImplementedError
    )


def test_ivf_topk_recall_and_exact_at_full_probe(emb):
    from pagerank_barrierfree_openmp_dynamic_spark.functions import ivf_topk

    queries = emb.filter(emb.vec_id < 10)
    exact = brute_force_topk(emb, queries, k=5).toPandas()

    # Probing ALL cells makes the candidate set the whole corpus -> IVF must
    # reproduce brute force exactly (same re-rank, same tie-break).
    full = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=8).toPandas()
    cols = ["q_id", "rank", "n_id", "sim"]
    assert (full.sort_values(["q_id", "rank"])[cols].reset_index(drop=True)
            .equals(exact.sort_values(["q_id", "rank"])[cols]
                    .reset_index(drop=True)))

    # Partial probe: returned sims are exact cosines; recall bar modest on a
    # random gaussian corpus (little cluster structure for IVF to exploit).
    approx = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3).toPandas()
    merged = approx.merge(exact, on=["q_id", "n_id"], suffixes=("_a", "_e"))
    assert np.allclose(merged["sim_a"], merged["sim_e"], atol=2e-6)
    assert len(merged) / len(exact) > 0.4

    # determinism: seeded init + deterministic Lloyd -> identical output
    again = ivf_topk(emb, queries, k=5, n_centroids=8, n_probe=3).toPandas()
    assert (again.sort_values(["q_id", "rank"]).reset_index(drop=True)
            .equals(approx.sort_values(["q_id", "rank"]).reset_index(drop=True)))


def test_simhash_near_dup_pigeonhole_recall(spark):
    """Regression: a hamming-2 pair with one differing bit in EACH half was
    silently dropped by the old two-half blocking; the max_hamming+1-block
    pigeonhole must find every pair (checked vs brute force)."""
    sigs = [(0, 0), (1, (1 << 0) | (1 << 8)), (2, (1 << 15) | (1 << 7))]
    rng = np.random.default_rng(7)
    sigs += [(10 + i, int(v)) for i, v in enumerate(rng.integers(0, 1 << 16, 40))]
    sig = spark.createDataFrame(sigs, "doc_id long, simhash long")
    got = simhash_near_dup_pairs(sig, max_hamming=2).toPandas()
    got_pairs = {(r.a, r.b) for r in got.itertuples()}
    vals = dict(sigs)
    want = {
        (a, b)
        for a in vals for b in vals
        if a < b and bin(vals[a] ^ vals[b]).count("1") <= 2
    }
    assert (0, 1) in want  # the split-across-halves case is exercised
    assert got_pairs == want
    ham = got.set_index(["a", "b"])["hamming"]
    for (a, b) in want:
        assert ham.loc[(a, b)] == bin(vals[a] ^ vals[b]).count("1")


def test_lang_id_tie_smallest_code_wins(spark):
    """Argmax ties resolve to the smallest language code — in the Spark
    impl, the NumPy oracle above, AND the driver's DuckDB oracle SQL."""
    rows = [
        (0, "the der"),        # en/de tie -> de
        (1, "the the der"),    # en wins outright
        (2, "xyzzy qwerty"),   # no markers -> und
        (3, "el le the der"),  # 4-way tie -> de
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = lang_id(df).toPandas().set_index("doc_id")
    assert list(got.loc[[0, 1, 2, 3], "lang_pred"]) == ["de", "en", "und", "de"]

    import duckdb

    import __spark_entry__ as entrymod

    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    o = con.sql(entrymod.oracle_sql()["lang_id"]).df().set_index("doc_id")
    assert list(o.loc[[0, 1, 2, 3], "lang_pred"]) == ["de", "en", "und", "de"]


def test_near_dup_clusters_transitive_and_canonical(spark, docs, docs_pdf):
    """Clusters are the transitive closure of near-dup pairs; keep marks
    exactly one canonical (minimum) doc per cluster; singletons keep."""
    from pagerank_barrierfree_openmp_dynamic_spark.functions import (
        minhash_near_dup_pairs,
        near_dup_clusters,
    )

    # chain A~B and B~C (A and C differ in two places -> may not pair
    # directly, but must cluster together transitively)
    t0 = docs_pdf.loc[docs_pdf.doc_id == 1, "text"].iloc[0]
    toks = _toks(t0)
    tb = list(toks)
    tb[0] = "ALTERED"
    tc = list(tb)
    tc[-1] = "CHANGED"
    extra = spark.createDataFrame(
        pd.DataFrame({"doc_id": [90001, 90002],
                      "text": [" ".join(tb), " ".join(tc)]}))
    both = (docs.filter(docs.doc_id < 40).select("doc_id", "text")
            .unionByName(extra))
    cl = near_dup_clusters(both, threshold=0.3).toPandas()
    assert len(cl) == both.count()  # every doc labeled, incl. singletons
    lab = dict(zip(cl.doc_id, cl.cluster))
    assert lab[90001] == lab[1] == 1 and lab[90002] == lab[1]
    keep = dict(zip(cl.doc_id, cl.keep))
    assert keep[1] and not keep[90001] and not keep[90002]
    # keep is exactly the cluster minimum, one per cluster
    grp = cl.groupby("cluster").agg(mn=("doc_id", "min"),
                                    kept=("keep", "sum"))
    assert (grp["kept"] == 1).all()
    assert set(cl[cl.keep]["doc_id"]) == set(grp["mn"])
    # consistency: every directly-verified pair shares a cluster
    pairs = minhash_near_dup_pairs(both, threshold=0.3).toPandas()
    for r in pairs.itertuples():
        assert lab[r.a] == lab[r.b]


def test_lsh_max_bucket_cap(spark):
    """Hot-bucket capping: oversized (band, sig) buckets stop generating
    pairs; members still pair through their non-degenerate bands; cap=None
    is the exact candidate set."""
    rows = []
    # band 0: docs 1..4 share one hot bucket (size 4); band 1: only (1,2)
    # share a small bucket, everyone else unique
    for i in (1, 2, 3, 4):
        rows.append((i, 0, "HOT"))
    rows += [(1, 1, "S12"), (2, 1, "S12"), (3, 1, "s3"), (4, 1, "s4")]
    sig = spark.createDataFrame(
        pd.DataFrame(rows, columns=["id", "band", "sig"]))

    exact = {tuple(r) for r in
             lsh_candidate_pairs(sig).toPandas().itertuples(index=False)}
    assert exact == {(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4)}

    capped = {tuple(r) for r in
              lsh_candidate_pairs(sig, max_bucket=3)
              .toPandas().itertuples(index=False)}
    # the hot band-0 bucket is skipped; (1,2) survives via band 1
    assert capped == {(1, 2)}


def test_hot_block_caps_simhash_and_embedding(spark):
    """The k² caps on the SimHash and embedding-LSH bucket joins: capped
    results are a subset of the exact ones, and cap=None stays exact."""
    import pagerank_barrierfree_openmp_dynamic_spark.functions as fn

    # SimHash: 5 identical docs (all blocks hot) + one hamming-1 neighbor pair
    rows = [(i, 0b1010101010101010) for i in range(5)]
    rows += [(10, 0b1111000011110000), (11, 0b1111000011110001)]
    sig = spark.createDataFrame(
        pd.DataFrame(rows, columns=["doc_id", "simhash"]))
    exact = fn.simhash_near_dup_pairs(sig, max_hamming=2)
    capped = fn.simhash_near_dup_pairs(sig, max_hamming=2, max_block=4)
    e = {tuple(r) for r in exact.toPandas().itertuples(index=False)}
    c = {tuple(r) for r in capped.toPandas().itertuples(index=False)}
    assert c <= e
    assert (10, 11, 1) in c          # small blocks unaffected
    assert not any(a < 5 and b < 5 for a, b, _ in c)  # hot clique skipped

    # embedding LSH: identical vectors land in one bucket
    vecs = [(i, [1.0, 0.0, 0.0, 0.0]) for i in range(4)]
    vecs += [(20, [0.0, 1.0, 0.0, 0.0]), (21, [0.0, 1.0, 0.001, 0.0])]
    emb = spark.createDataFrame(
        pd.DataFrame(vecs, columns=["vec_id", "embedding"]))
    exact_e = fn.embedding_near_dup_pairs(emb, dim=4, threshold=0.9,
                                          n_planes=6)
    capped_e = fn.embedding_near_dup_pairs(emb, dim=4, threshold=0.9,
                                           n_planes=6, max_bucket=3)
    ee = {(r.a, r.b) for r in exact_e.toPandas().itertuples(index=False)}
    ce = {(r.a, r.b) for r in capped_e.toPandas().itertuples(index=False)}
    assert ce <= ee
    assert not any(a < 4 and b < 4 for a, b in ce)


def test_run_dedup_job_cli(spark, tmp_path, docs):
    """jobs/run_dedup.py end-to-end: the minhash method writes the
    canonical set (keep-only) and reports consistent counts."""
    import io
    import json
    import sys
    from contextlib import redirect_stdout

    sys.path.insert(0, "/root/repo/jobs")
    import run_dedup

    src = str(tmp_path / "docs_in")
    docs.write.parquet(src)
    out = str(tmp_path / "dedup_out")
    buf = io.StringIO()
    with redirect_stdout(buf):
        run_dedup.main(["--docs", src, "--output", out,
                        "--method", "minhash", "--keep-only",
                        "--threshold", "0.5"])
    stats = json.loads(buf.getvalue().strip().splitlines()[-1])
    kept = spark.read.parquet(out)
    assert stats["n_kept"] == kept.count()
    assert 0 < stats["n_kept"] <= stats["n_docs"]
    # canonical set is a subset of the input ids
    in_ids = {r.doc_id for r in docs.select("doc_id").collect()}
    assert {r.doc_id for r in kept.select("doc_id").collect()} <= in_ids


def test_tfidf_terms_matches_mirror(docs, docs_pdf):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.text import (
        tfidf_terms,
    )
    import math

    got = tfidf_terms(docs, top_k=3).toPandas()
    # brute-force mirror
    n = len(docs_pdf)
    tf = {}
    dfreq = {}
    for r in docs_pdf.itertuples(index=False):
        seen = {}
        for t in _toks(r.text):
            seen[t] = seen.get(t, 0) + 1
        for t, c in seen.items():
            tf[(r.doc_id, t)] = c
            dfreq[t] = dfreq.get(t, 0) + 1
    best = {}
    for (d, t), c in tf.items():
        s = c * (math.log((n + 1.0) / (dfreq[t] + 1.0)) + 1.0)
        best.setdefault(d, []).append((-s, t, c))
    want = set()
    for d, lst in best.items():
        for negs, t, c in sorted(lst)[:3]:
            want.add((d, t, c, dfreq[t], round(-negs, 6)))
    got_set = {(r.doc_id, r.term, r.tf, r.df, round(r.tfidf, 6))
               for r in got.itertuples(index=False)}
    assert got_set == want


def test_bm25_scores_matches_mirror(docs, docs_pdf):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.text import (
        bm25_scores,
    )
    import math

    q = "data scan join"
    got = bm25_scores(docs, q).toPandas()
    terms = sorted(set(q.split()))
    n = len(docs_pdf)
    lens = {r.doc_id: len(_toks(r.text))
            for r in docs_pdf.itertuples(index=False)}
    avglen = sum(lens.values()) / float(n)
    tf = {}
    dfreq = {t: 0 for t in terms}
    for r in docs_pdf.itertuples(index=False):
        cs = {}
        for t in _toks(r.text):
            if t in dfreq:
                cs[t] = cs.get(t, 0) + 1
        for t, c in cs.items():
            tf[(r.doc_id, t)] = c
            dfreq[t] += 1
    k1, b = 1.2, 0.75
    want = {}
    for (d, t), c in tf.items():
        idf = math.log(1.0 + (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5))
        s = idf * (c * (k1 + 1.0)) / (c + k1 * ((1.0 - b)
                                                + b * lens[d] / avglen))
        want[d] = want.get(d, 0.0) + s
    got_map = {r.doc_id: r.score for r in got.itertuples(index=False)}
    assert set(got_map) == set(want)
    for d in want:
        assert abs(got_map[d] - want[d]) < 1e-9
    with pytest.raises(ValueError, match="terms"):
        bm25_scores(docs, "   ")


def test_source_report_mirror(docs, docs_pdf):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.text import (
        source_report,
    )
    import hashlib as _hl

    got = source_report(docs).toPandas().set_index("source")
    # mirror: counts/tokens/dup exact; avg_quality checked loosely against
    # the per-doc quality ops (already mirror-tested elsewhere)
    by_src = {}
    for r in docs_pdf.itertuples(index=False):
        by_src.setdefault(r.source, []).append(r)
    assert set(got.index) == set(by_src)
    for s, rows in by_src.items():
        assert got.loc[s, "n_docs"] == len(rows)
        assert got.loc[s, "n_tokens"] == sum(len(_toks(r.text)) for r in rows)
        nd = len({_hl.md5(r.text.encode()).hexdigest() for r in rows})
        assert abs(got.loc[s, "dup_rate"] - (1.0 - nd / len(rows))) < 1e-9
        assert 0.0 <= got.loc[s, "avg_quality"] <= 1.0
        assert abs(got.loc[s, "avg_tokens"]
                   - got.loc[s, "n_tokens"] / got.loc[s, "n_docs"]) < 1e-6


def test_ngram_containment_catches_quoted_subset(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.dedup import (
        ngram_containment_pairs,
    )

    short = "alpha beta gamma delta epsilon zeta"
    long_doc = short + " " + " ".join(f"filler{i}" for i in range(60))
    other = "one two three four five six seven"
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": [1, 2, 3],
                      "text": [short, long_doc, other]}))
    cont = ngram_containment_pairs(df, threshold=0.9).toPandas()
    # every 3-shingle of the short doc appears in the long one
    assert set(map(tuple, cont[["a", "b"]].itertuples(index=False))) == {(1, 2)}
    assert cont.containment.iloc[0] == 1.0
    # Jaccard misses the same pair at any reasonable threshold
    jac = ngram_jaccard_pairs(df, threshold=0.3).toPandas()
    assert jac.empty


def test_containment_matches_python_mirror(spark, docs):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.dedup import (
        ngram_containment_pairs,
    )

    sub = docs.limit(40)
    got = ngram_containment_pairs(sub, threshold=0.1).toPandas()
    pdf = sub.toPandas()
    sets = {}
    for r in pdf.itertuples():
        t = _toks(r.text)
        sets[r.doc_id] = {" ".join(t[i:i + 3]) for i in range(len(t) - 2)}
    expect = {}
    ids = sorted(sets)
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            if not sets[a] or not sets[b]:
                continue
            c = len(sets[a] & sets[b]) / min(len(sets[a]), len(sets[b]))
            if round(c, 6) >= 0.1:
                expect[(a, b)] = round(c, 6)
    got_map = {(r.a, r.b): r.containment for r in got.itertuples()}
    assert got_map == pytest.approx(expect)


def test_near_dup_against_corpus_incremental(spark):
    """Incremental dedup: cross-side candidates only; the best corpus
    match is returned per duplicated incoming doc; unique docs pass."""
    import pandas as pd

    from pagerank_barrierfree_openmp_dynamic_spark.functions.dedup import (
        near_dup_against_corpus,
    )

    corpus = spark.createDataFrame(pd.DataFrame({
        "doc_id": [10, 11, 12],
        "text": ["the quick brown fox jumps over the lazy dog",
                 "an entirely different corpus document about spark",
                 "the quick brown fox jumps over the lazy cat"],
    }))
    new = spark.createDataFrame(pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["the quick brown fox jumps over the lazy dog",  # dup of 10
                 "completely novel content with no overlap at all"],
    }))
    got = near_dup_against_corpus(new, corpus, threshold=0.5).toPandas()
    assert len(got) == 1
    r = got.iloc[0]
    # doc 1 matches BOTH 10 (jaccard 1.0) and 12 (high); best = 10
    assert (r.doc_id, r.dup_of, r.jaccard) == (1, 10, 1.0)
    # two identical corpus matches -> tie-break to the smaller corpus id
    new2 = spark.createDataFrame(pd.DataFrame({
        "doc_id": [3], "text": ["the quick brown fox jumps over the lazy dog"],
    }))
    corpus2 = spark.createDataFrame(pd.DataFrame({
        "doc_id": [20, 21],
        "text": ["the quick brown fox jumps over the lazy dog"] * 2,
    }))
    r2 = near_dup_against_corpus(new2, corpus2, threshold=0.5) \
        .toPandas().iloc[0]
    assert (r2.doc_id, r2.dup_of, r2.jaccard) == (3, 20, 1.0)
