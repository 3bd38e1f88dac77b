"""Gopher-style repetition filters and the corpus-trained bigram LM
fluency score vs hand-computed oracles (the SQL mirrors are additionally
driver-checked as ``repetition_stats`` / ``lm_fluency``)."""

import math

import pytest

from pagerank_barrierfree_openmp_dynamic_spark.functions import (
    lm_score,
    repetition_stats,
)


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_repetition_stats_hand_oracle(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),     # alternating pair
            (2, "x y z w"),         # all distinct
            (3, ""),                # empty
            (4, "r r r r r r"),     # degenerate repeat
        ],
        "doc_id long, text string",
    )
    got = _by_id(repetition_stats(docs))

    d1 = got[1]
    assert d1["n_tokens"] == 6
    assert d1["dup_token_frac"] == pytest.approx(round(1 - 2 / 6, 6))
    # "a b" occurs 3x, len 3, n_chars 11
    assert d1["top2gram_char_frac"] == pytest.approx(round(9 / 11, 6))
    # 3-gram tie ("a b a" x2, "b a b" x2) breaks to "a b a" (len 5)
    assert d1["top3gram_char_frac"] == pytest.approx(round(10 / 11, 6))
    assert d1["dup5gram_char_frac"] == 0.0
    assert d1["flagged"] is True

    d2 = got[2]
    assert d2["dup_token_frac"] == 0.0
    # every 2-gram unique -> tie broken by gram asc: "x y", len 3 / 7 chars
    assert d2["top2gram_char_frac"] == pytest.approx(round(3 / 7, 6))
    assert d2["dup5gram_char_frac"] == 0.0

    d3 = got[3]
    assert d3["n_tokens"] == 0
    assert d3["dup_token_frac"] == 0.0
    assert d3["top2gram_char_frac"] == 0.0
    assert d3["flagged"] is False

    d4 = got[4]
    assert d4["dup_token_frac"] == pytest.approx(round(1 - 1 / 6, 6))
    # 5*3/11 and 2*9/11 both exceed 1 -> capped
    assert d4["top2gram_char_frac"] == 1.0
    assert d4["dup5gram_char_frac"] == 1.0
    assert d4["flagged"] is True


def test_lm_score_hand_oracle(spark):
    docs = spark.createDataFrame(
        [
            (1, "A b"),   # lowercased before training
            (2, "a b"),
            (3, "a c"),
            (4, "z"),     # no bigram
        ],
        "doc_id long, text string",
    )
    got = _by_id(lm_score(docs))
    # corpus bigrams: "a b" x2, "a c" x1; c1("a") = 3
    assert got[1]["n_bigrams"] == 1
    assert got[1]["avg_logp"] == pytest.approx(round(math.log(2 / 3), 6))
    assert got[1]["avg_logp"] == got[2]["avg_logp"]
    assert got[1]["pseudo_ppl"] == pytest.approx(1.5)
    assert got[3]["avg_logp"] == pytest.approx(round(math.log(1 / 3), 6))
    assert got[3]["pseudo_ppl"] == pytest.approx(3.0)
    assert got[4]["n_bigrams"] == 0
    assert got[4]["avg_logp"] == 0.0
    assert got[4]["pseudo_ppl"] == 1.0


def test_lm_score_orders_formulaic_above_outlier(spark):
    # a doc of transitions the corpus has never paired scores below one
    # assembled from the corpus's dominant transitions
    rows = [(i, "the cat sat on the mat") for i in range(10)]
    rows.append((100, "mat the on sat cat the"))  # reversed transitions
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = _by_id(lm_score(docs))
    assert got[0]["avg_logp"] > got[100]["avg_logp"]
    assert got[100]["pseudo_ppl"] > got[0]["pseudo_ppl"]


def test_readability_hand_oracle(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.functions import readability

    docs = spark.createDataFrame(
        [
            (1, "The cat sat. The dog ran!"),
            (2, "no punctuation here at all"),
            (3, ""),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.asDict() for r in readability(docs).collect()}
    # doc 1: 6 words, 2 sentence runs; syllables = vowel-group runs:
    # "the"(1) "cat"(1) "sat"(1) "the"(1) "dog"(1) "ran"(1) = 6
    assert got[1]["n_words"] == 6 and got[1]["n_sentences"] == 2
    assert got[1]["n_syllables"] == 6
    expect = round(206.835 - 1.015 * 6 / 2 - 84.6 * 6 / 6, 6)
    assert got[1]["flesch"] == expect
    # doc 2: punctuation-free -> 1 run-on sentence
    assert got[2]["n_sentences"] == 1
    # formula consistency (syllable runs not hand-counted here):
    w, s, syl = got[2]["n_words"], got[2]["n_sentences"], got[2]["n_syllables"]
    assert got[2]["flesch"] == round(206.835 - 1.015 * w / s - 84.6 * syl / w, 6)
    # empty doc: NULL flesch, zero counts
    assert got[3]["n_words"] == 0 and got[3]["flesch"] is None


def test_filter_cascade_first_fail_attribution(spark):
    import pandas as pd

    from pagerank_barrierfree_openmp_dynamic_spark.functions.text import (
        filter_cascade,
    )

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4, 5],
        "text": [
            "the of and to in is was for on with good words here now then",
            "tiny",                                  # too_short
            " ".join(["the of and to in"] * 40),     # long + repetitive
            "zzz qqq xxx " * 8,                      # no stopwords -> low quality
            "the cat sat on a mat and the dog ran to its house in the sun",
        ],
    })
    got = filter_cascade(
        spark.createDataFrame(docs), min_tokens=5, max_tokens=60,
        min_quality=0.5, allowed_langs=("en",),
    ).orderBy("doc_id").toPandas()
    by = got.set_index("doc_id")
    assert bool(by.loc[1, "accept"]) and by.loc[1, "reject_reason"] is None
    assert by.loc[2, "reject_reason"] == "too_short"
    # doc 3 is BOTH over-length and repetitive: first gate wins
    assert by.loc[3, "reject_reason"] == "too_long"
    assert by.loc[4, "reject_reason"] == "low_quality"
    assert bool(by.loc[5, "accept"]) and by.loc[5, "reject_reason"] is None
    # a short-window repetitive doc fails ONLY the repetition gate
    rep = filter_cascade(
        spark.createDataFrame(pd.DataFrame({
            "doc_id": [9],
            "text": ["the of and to in is was for on with " * 2
                     + "more the of and"]})),
        min_tokens=5, max_tokens=60, min_quality=0.5,
        allowed_langs=("en",),
    ).toPandas().iloc[0]
    assert rep.reject_reason == "repetitive"
    # language gate: same docs, disallow everything -> survivors of the
    # earlier gates become wrong_lang
    strict = filter_cascade(
        spark.createDataFrame(docs), min_tokens=5, max_tokens=60,
        min_quality=0.5, allowed_langs=("xx",),
    ).orderBy("doc_id").toPandas().set_index("doc_id")
    assert strict.loc[1, "reject_reason"] == "wrong_lang"
    assert strict.loc[2, "reject_reason"] == "too_short"  # earlier gate
