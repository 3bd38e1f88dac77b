"""Sequence-packing operators vs a NumPy mirror + structural invariants."""

import numpy as np
import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pagerank_barrierfree_openmp_dynamic_spark.functions.packing import (
    pack_concat, pack_greedy, packing_fill)

MAX_TOKENS = 32
N_SHARDS = 4


@pytest.fixture(scope="module")
def docs(spark):
    rng = np.random.default_rng(7)
    rows = []
    for i in range(200):
        n = int(rng.integers(0, 50))  # includes empty docs (n=0)
        rows.append((i, " ".join(f"w{j}" for j in range(n))))
    return spark.createDataFrame(pd.DataFrame(rows, columns=["doc_id", "text"]))


def _mirror_tokens(pdf):
    out = []
    for doc_id, text in pdf[["doc_id", "text"]].itertuples(index=False):
        n = len([t for t in text.split(" ") if t != ""])
        if n > 0:
            out.append((doc_id % N_SHARDS, doc_id, n))
    return sorted(out)


def test_pack_concat_matches_mirror(spark, docs):
    got = {r["doc_id"]: r for r in pack_concat(
        docs, MAX_TOKENS, N_SHARDS).collect()}
    toks = _mirror_tokens(docs.toPandas())
    cum = {}
    seen = 0
    for shard, doc_id, n in toks:  # sorted => doc_id order within shard
        start = cum.get(shard, 0)
        end = start + n
        cum[shard] = end
        r = got[doc_id]
        assert r["shard"] == shard and r["n_tokens"] == n
        assert r["first_seq"] == start // MAX_TOKENS
        assert r["start_offset"] == start % MAX_TOKENS
        assert r["n_seqs"] == (end - 1) // MAX_TOKENS - start // MAX_TOKENS + 1
        seen += 1
    assert len(got) == seen  # zero-token docs excluded


def test_pack_greedy_invariants(spark, docs):
    rows = pack_greedy(docs, MAX_TOKENS, N_SHARDS).collect()
    assert rows
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r["shard"], []).append(r)
    for shard, rs in by_shard.items():
        rs.sort(key=lambda r: r["doc_id"])
        # bins contiguous from 0 and monotone in doc order
        bins = [r["bin"] for r in rs]
        assert bins[0] == 0
        assert all(b2 - b1 in (0, 1) for b1, b2 in zip(bins, bins[1:]))
        # mirror the first-fit fold exactly
        fill, b = 0, -1
        for r in rs:
            if b < 0 or fill + r["n_tokens"] > MAX_TOKENS:
                b += 1
                fill = r["n_tokens"]
            else:
                fill += r["n_tokens"]
            assert r["bin"] == b
        # no window overfilled unless it is a single oversized doc
        per_bin = {}
        for r in rs:
            per_bin.setdefault(r["bin"], []).append(r["n_tokens"])
        for toks in per_bin.values():
            assert sum(toks) <= MAX_TOKENS or len(toks) == 1


def test_pack_greedy_oversized_doc_isolated(spark):
    pdf = pd.DataFrame({"doc_id": [0, 4, 8],
                        "text": ["a b", " ".join("x" * 1 for _ in range(99)),
                                 "c d e"]})
    rows = pack_greedy(spark.createDataFrame(pdf), max_tokens=10,
                       n_shards=1).collect()
    by_id = {r["doc_id"]: r["bin"] for r in rows}
    assert by_id[0] == 0 and by_id[4] == 1 and by_id[8] == 2


@settings(max_examples=5, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(toks=st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                     max_size=60),
       max_tokens=st.integers(min_value=1, max_value=30))
def test_pack_greedy_property(spark, toks, max_tokens):
    """Random token-count corpora: the distributed fold equals the
    sequential first-fit mirror for arbitrary sizes, oversized docs, and
    tiny windows."""
    pdf = pd.DataFrame({
        "doc_id": range(len(toks)),
        "text": [" ".join("x" for _ in range(n)) for n in toks],
    })
    got = {r["doc_id"]: r["bin"] for r in pack_greedy(
        spark.createDataFrame(pdf), max_tokens, n_shards=2).collect()}
    for shard in (0, 1):
        fill, b = 0, -1
        for i, n in enumerate(toks):
            if i % 2 != shard or n == 0:
                continue
            if b < 0 or fill + n > max_tokens:
                b += 1
                fill = n
            else:
                fill += n
            assert got[i] == b
    assert len(got) == sum(1 for n in toks if n > 0)


def test_packing_fill(spark, docs):
    packed = pack_greedy(docs, MAX_TOKENS, N_SHARDS)
    rep = packing_fill(packed, MAX_TOKENS).collect()
    total_docs = sum(r["n_docs"] for r in rep)
    assert total_docs == packed.count()
    multi = [r for r in rep if r["n_docs"] > 1]
    assert multi, "greedy packing should co-locate small docs"
    for r in multi:
        assert r["fill_tokens"] <= MAX_TOKENS
        assert r["fill_ppm"] == r["fill_tokens"] * 1_000_000 // MAX_TOKENS
