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


def _bpe_mirror(word_counts, n_merges):
    syms = {w: list(w) for w in word_counts if len(w) >= 2}
    merges = []
    for rank in range(1, n_merges + 1):
        pc = Counter()
        for w, s in syms.items():
            n = word_counts[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n
        if not pc:
            break
        (a, b), n = sorted(pc.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append((rank, a, b, n))
        for w, s in syms.items():
            i, res = 0, []
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    res.append(a + b)
                    i += 2
                else:
                    res.append(s[i])
                    i += 1
            syms[w] = res
    return merges


def test_bpe_learn_matches_mirror(docs, word_counts):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.vocab import bpe_learn

    got = [(r["rank"], r["left"], r["right"], r["n"])
           for r in bpe_learn(docs, n_merges=8).collect()]
    assert got == _bpe_mirror(word_counts, 8)
    # merges compose: later merges may join earlier multi-char symbols
    assert any(len(a) > 1 or len(b) > 1 for _, a, b, _ in got)


def test_bpe_learn_overlapping_pairs_left_to_right(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.functions.vocab import bpe_learn

    # 'aaa' must merge left-to-right: ('a','a') once -> ['aa','a']
    df = spark.createDataFrame([("aaa aaa aa",)], "text string")
    got = [(r["rank"], r["left"], r["right"], r["n"])
           for r in bpe_learn(df, n_merges=2).collect()]
    cnt = Counter({"aaa": 2, "aa": 1})
    assert got == _bpe_mirror(cnt, 2)
