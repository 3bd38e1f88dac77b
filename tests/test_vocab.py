"""Vocabulary construction (functions/vocab.py): distributed prefix-sum
coverage vs a Python mirror, BPE pair counts vs a Python mirror, and the
no-single-partition-window plan shape."""

from collections import Counter

import pytest
from pyspark.sql import functions as F

from pagerank_barrierfree_openmp_dynamic_spark.functions.vocab import (
    bpe_pair_counts,
    vocab_coverage,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF_DIR}/documents.parquet").cache()


@pytest.fixture(scope="module")
def word_counts(docs):
    cnt = Counter()
    for t in docs.toPandas().text:
        cnt.update(x for x in t.split(" ") if x)
    return cnt


def test_vocab_coverage_matches_mirror(docs, word_counts):
    out = vocab_coverage(docs, top_v=40).toPandas().sort_values("rank")
    total = sum(word_counts.values())
    ranked = sorted(word_counts.items(), key=lambda kv: (-kv[1], kv[0]))
    cum, exp = 0, []
    for i, (tok, n) in enumerate(ranked[:40]):
        cum += n
        exp.append((tok, n, i + 1, round(cum / total, 6)))
    got = list(map(tuple,
                   out[["token", "n", "rank", "coverage"]]
                   .itertuples(index=False)))
    assert got == exp
    # coverage is monotone and ends < 1 on a diverse corpus
    assert all(a[3] <= b[3] for a, b in zip(exp, exp[1:]))


def test_vocab_coverage_no_global_window(docs):
    plan = vocab_coverage(docs, top_v=10) \
        ._jdf.queryExecution().executedPlan().toString()
    # the ANSI formulation would show Exchange SinglePartition feeding a
    # Window; the two-level scan must not
    assert "SinglePartition" not in plan, plan


def test_bpe_pair_counts_matches_mirror(docs, word_counts):
    got = list(map(tuple, bpe_pair_counts(docs, top_k=25).toPandas()
                   [["pair", "n"]].itertuples(index=False)))
    pc = Counter()
    for w, n in word_counts.items():
        if len(w) >= 2:
            for i in range(len(w) - 1):
                pc[w[i:i + 2]] += n
    exp = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert got == exp


def test_bpe_pair_counts_handles_short_words(spark):
    df = spark.createDataFrame([("a b c ab",)], "text string")
    got = {r.pair: r.n for r in bpe_pair_counts(df, top_k=10).collect()}
    # single-char words contribute nothing; 'ab' contributes one pair
    assert got == {"ab": 1}
