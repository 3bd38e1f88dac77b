"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen) — no Python UDFs. Every operator is deterministic and
has an ANSI-SQL equivalent (DuckDB oracle in ``__spark_entry__.py``).

Token model: whitespace split (``F.split(text, ' +')`` with empties
removed) — matches ``string_split`` + filter in the SQL oracles exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Small multilingual stopword/marker table for the n-gram-heuristic language
# identifier. Public knowledge (most-frequent function words per language).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "it", "for", "was"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "ein", "mit", "von", "zu"),
    "fr": ("le", "la", "les", "et", "des", "est", "un", "une", "que", "pour"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "que", "por", "con"),
}

STOPWORDS_EN = LANG_MARKERS["en"] + ("a", "an", "on", "with", "as", "at", "by")

# BPE-ish subword pattern: words, numbers, or single non-space symbols —
# a public regex shape (GPT-2-style pretokenizer simplified to ASCII classes).
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokens, empties removed (JVM-side)."""
    return F.filter(F.split(text, " "), lambda t: t != F.lit(""))


def token_count(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish subword token count per document."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.size(tokens(t)).alias("n_tokens"),
        F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), 0)).alias("n_subtokens"),
    )


def readability(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Flesch reading-ease per document, with the standard fast-heuristic
    syllable counter (vowel-group runs — spaces break runs, so counting
    ``[aeiouy]+`` over the whole text equals summing per word).

    Returns (id, n_words, n_sentences, n_syllables, flesch). Sentence
    count is ``max(#[.!?] runs, 1)`` so punctuation-free text scores as a
    single run-on sentence instead of dividing by zero; empty documents
    report flesch = NULL. All pure JVM expressions (one narrow map stage,
    no shuffle — composes with the corpus funnel's single text pass);
    rounded to 6 places to match the DuckDB oracle exactly.
    """
    t = F.col(text_col)
    n_words = F.size(tokens(t))
    n_sent = F.greatest(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(1))
    n_syl = F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+"))
    flesch = F.when(
        n_words > 0,
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * n_words / n_sent
            - F.lit(84.6) * n_syl / n_words,
            6,
        ),
    )
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_sent.alias("n_sentences"),
        n_syl.alias("n_syllables"),
        flesch.alias("flesch"),
    )


def quality_score(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality features: length, token stats, punctuation ratio,
    English-stopword ratio, and a composite score in [0, 1].

    All ratios are computed in double and rounded to 6 places so the Spark
    and DuckDB oracles agree bit-for-bit after rounding.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = F.size(toks)
    n_chars = F.length(t)
    n_punct = F.length(t) - F.length(F.regexp_replace(t, r"[^\w\s]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS_EN])
    n_stop = F.size(F.filter(toks, lambda x: F.array_contains(stop_arr, F.lower(x))))
    avg_tok_len = (n_chars - (n_tok - F.lit(1))) / n_tok  # chars net of separators
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tok, F.lit(1))
    score = (
        F.least(n_tok / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - F.least(punct_ratio * 5.0, F.lit(1.0))) * 0.3
        + F.least(stop_ratio * 4.0, F.lit(1.0)) * 0.3
    )
    return df.select(
        F.col(id_col),
        n_chars.alias("n_chars"),
        n_tok.alias("n_tokens"),
        F.round(avg_tok_len, 6).alias("avg_token_len"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stopword_ratio"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """N-gram-heuristic language ID: count marker-word hits per language,
    pick the argmax (ties broken by language code order); 'und' when no
    marker matches. Pure JVM expressions; exactly mirrored in SQL."""
    toks = tokens(F.lower(F.col(text_col)))
    scores = [
        F.size(F.filter(toks, lambda x: F.array_contains(
            F.array(*[F.lit(m) for m in marks]), x))).alias(f"score_{lang}")
        for lang, marks in sorted(LANG_MARKERS.items())
    ]
    scored = df.select(F.col(id_col), *scores)
    langs = sorted(LANG_MARKERS)
    best = F.greatest(*[F.col(f"score_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier lang wins ties -> apply last
        pred = F.when((F.col(f"score_{lg}") == best) & (best > 0), F.lit(lg)).otherwise(pred)
    return scored.select(F.col(id_col), pred.alias("lang_pred"),
                         best.cast("int").alias("marker_hits"))


def fingerprint(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprint: full-text md5 plus a min-token-hash (the
    1-permutation MinHash — a rolling content fingerprint stable under
    token reordering). Both reproducible in ANSI SQL."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col),
        F.md5(t).alias("md5"),
        F.array_min(F.transform(tokens(t), lambda x: F.md5(x))).alias("min_token_hash"),
        F.length(t).alias("n_chars"),
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
            bits: int = 16) -> DataFrame:
    """SimHash over distinct whitespace tokens.

    Bit j of a token's hash is ``ascii(md5(token)[j]) % 2`` (parity of the
    j-th hex character) — a deterministic 16/32-bit hash family expressible
    identically in Spark and ANSI SQL. The signature bit j is the sign of
    ``sum_tokens (2*bit_j - 1)``; ties (sum == 0) resolve to 0.
    """
    toks = F.array_distinct(tokens(F.col(text_col)))
    h = lambda x: F.md5(x)  # noqa: E731
    terms = []
    for j in range(bits):
        bit = F.ascii(F.substring(h(F.col("_tok")), j + 1, 1)) % 2
        terms.append(F.sum(bit * 2 - 1).alias(f"s{j}"))
    exploded = df.select(F.col(id_col), F.explode(toks).alias("_tok"))
    sums = exploded.groupBy(id_col).agg(*terms)
    sig = sum(
        (F.when(F.col(f"s{j}") > 0, F.lit(1)).otherwise(F.lit(0)) * (1 << j))
        for j in range(bits)
    )
    return sums.select(F.col(id_col), sig.cast("long").alias("simhash"))


def simhash_blocks(bits: int, max_hamming: int) -> list[tuple[int, int]]:
    """(offset, width) bit segments for SimHash blocking.

    ``max_hamming + 1`` near-equal segments: a pair within Hamming distance
    ``max_hamming`` differs in at most ``max_hamming`` segments, so by
    pigeonhole it agrees EXACTLY on at least one — the guarantee the old
    two-half scheme only gave for distance <= 1. Shared by the Spark
    operator and the DuckDB oracle generator."""
    nb = max_hamming + 1
    if nb > bits:
        raise ValueError(f"need bits >= max_hamming + 1 ({bits} < {nb})")
    out, off = [], 0
    for i in range(nb):
        w = bits // nb + (1 if i < bits % nb else 0)
        out.append((off, w))
        off += w
    return out


def simhash_near_dup_pairs(sig: DataFrame, id_col: str = "doc_id",
                           max_hamming: int = 2, bits: int = 16,
                           max_block: int | None = None) -> DataFrame:
    """Near-duplicate pairs by SimHash Hamming distance <= ``max_hamming``.

    Block on ``max_hamming + 1`` disjoint bit segments (pigeonhole: every
    qualifying pair shares at least one segment — complete recall by
    construction), explode to (block_idx, block_val) and equi-join on that
    key — ONE shuffle, no cross join; ``bit_count(xor)`` verifies the exact
    distance on candidates only. At 100-TB scale candidate volume is bounded
    by per-(segment, value) bucket sizes, the LSH-banding shape.
    """
    segs = simhash_blocks(bits, max_hamming)
    blocks = [
        F.struct(
            F.lit(i).alias("blk"),
            F.shiftright(F.col("simhash"), off)
            .bitwiseAND(F.lit((1 << w) - 1)).cast("long").alias("val"),
        )
        for i, (off, w) in enumerate(segs)
    ]
    ex = sig.select(
        F.col(id_col).alias("id"), "simhash",
        F.explode(F.array(*blocks)).alias("b"),
    ).select("id", "simhash", F.col("b.blk").alias("blk"), F.col("b.val").alias("val"))
    if max_block is not None:
        # hot-(blk, val) cap: a segment value shared by k docs yields k²
        # candidate rows; skip degenerate blocks for pair generation —
        # members still pair through their other max_hamming segments
        # (same knob as lsh_candidate_pairs(max_bucket=...)).
        ok = (
            ex.groupBy("blk", "val").agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") <= max_block).select("blk", "val")
        )
        ex = ex.join(ok, ["blk", "val"], "left_semi")
    a = ex.select(F.col("id").alias("a"), F.col("simhash").alias("sig_a"), "blk", "val")
    b = ex.select(F.col("id").alias("b"), F.col("simhash").alias("sig_b"), "blk", "val")
    cand = (
        a.join(b, ["blk", "val"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b", "sig_a", "sig_b")
        .dropDuplicates(["a", "b"])
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return cand.select("a", "b", ham.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )


def tfidf_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int | None = None,
) -> DataFrame:
    """Per-document TF-IDF over the whitespace token model:
    ``tfidf = tf · (ln((N+1)/(df+1)) + 1)`` (the smoothed sklearn
    variant — never zero, no division hazards). Returns
    ``(doc_id, term, tf, df, tfidf)``; with ``top_k`` only each
    document's k highest-scoring terms survive (ties broken by term
    ascending — deterministic). Shape: one explode + two
    map-side-combinable aggregations + a term-keyed join; no Python."""
    from pyspark.sql import Window

    n = df.count()
    tf = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = (F.log((F.lit(float(n) + 1.0))
                 / (F.col("df").cast("double") + F.lit(1.0)))
           + F.lit(1.0))
    out = (
        tf.join(dfreq, "term")
        .select("doc_id", "term", "tf", "df",
                (F.col("tf").cast("double") * idf).alias("tfidf"))
    )
    if top_k is not None:
        w = Window.partitionBy("doc_id").orderBy(
            F.desc("tfidf"), F.asc("term"))
        out = (out.withColumn("_rn", F.row_number().over(w))
               .filter(F.col("_rn") <= top_k).drop("_rn"))
    return out


def bm25_scores(
    df: DataFrame,
    query: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Okapi BM25 document scores for a whitespace-tokenized query
    string (terms deduplicated): ``score(d) = Σ_t idf_t ·
    tf·(k1+1) / (tf + k1·(1 − b + b·len_d/avglen))`` with
    ``idf_t = ln(1 + (N − df_t + 0.5)/(df_t + 0.5))``. Returns
    ``(doc_id, score)`` for documents matching at least one query term.
    The query-term frame is tiny and broadcast; corpus statistics
    (document frequency, lengths, avg length) are single aggregations
    over the exploded token table."""
    spark = df.sparkSession
    terms = sorted(set(t for t in query.split() if t))
    if not terms:
        raise ValueError("query has no terms")
    n = df.count()
    toks = df.select(F.col(id_col).alias("doc_id"),
                     tokens(F.col(text_col)).alias("_toks"))
    dl = toks.select("doc_id", F.size("_toks").alias("len"))
    avglen = (dl.agg(F.sum("len")).collect()[0][0] or 0) / float(n)
    tf = (
        toks.select("doc_id", F.explode("_toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    idf = F.log(F.lit(1.0)
                + (F.lit(float(n)) - F.col("df").cast("double") + F.lit(0.5))
                / (F.col("df").cast("double") + F.lit(0.5)))
    per_term = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .select(
            "doc_id",
            (idf * (F.col("tf").cast("double") * F.lit(k1 + 1.0))
             / (F.col("tf").cast("double")
                + F.lit(k1) * (F.lit(1.0 - b)
                               + F.lit(b) * F.col("len").cast("double")
                               / F.lit(avglen)))).alias("_s"),
        )
    )
    return per_term.groupBy("doc_id").agg(F.sum("_s").alias("score"))


def source_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-source (domain-level) corpus quality report — the rollup a
    training-data pipeline filters sources on: ``(source, n_docs,
    n_tokens, avg_tokens, avg_quality, top_lang, dup_rate)``.
    ``top_lang`` is the modal :func:`lang_id` prediction (ties broken by
    language code ascending); ``dup_rate = 1 − distinct(md5)/docs`` is
    the within-source exact-duplicate share. Composes the existing
    token/quality/lang operators (all JVM expressions) and reduces with
    two map-side-combinable aggregations plus one tiny per-source mode
    window."""
    from pyspark.sql import Window

    base = df.select(F.col(id_col).alias("doc_id"),
                     F.col(source_col).alias("source"),
                     F.md5(F.col(text_col)).alias("_h"))
    tc = token_count(df, text_col, id_col).select("doc_id", "n_tokens")
    q = quality_score(df, text_col, id_col).select("doc_id", "quality")
    lp = lang_id(df, text_col, id_col).select("doc_id", "lang_pred")
    j = base.join(tc, "doc_id").join(q, "doc_id").join(lp, "doc_id")
    agg = j.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.round(F.avg("quality"), 6).alias("avg_quality"),
        F.countDistinct("_h").alias("_nd"),
    )
    lc = j.groupBy("source", "lang_pred").agg(F.count("*").alias("_c"))
    w = Window.partitionBy("source").orderBy(F.desc("_c"),
                                             F.asc("lang_pred"))
    top = (lc.withColumn("_rn", F.row_number().over(w))
           .filter(F.col("_rn") == 1)
           .select("source", F.col("lang_pred").alias("top_lang")))
    return (
        agg.join(top, "source")
        .select(
            "source", "n_docs", "n_tokens",
            F.round(F.col("n_tokens").cast("double")
                    / F.col("n_docs"), 6).alias("avg_tokens"),
            "avg_quality", "top_lang",
            F.round(F.lit(1.0) - F.col("_nd").cast("double")
                    / F.col("n_docs"), 6).alias("dup_rate"),
        )
    )


def _word_ngrams(toks: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array — empty array when the
    document has fewer than ``n`` tokens. Pure JVM (``sequence`` +
    ``transform`` + ``element_at``); exactly mirrored in DuckDB with
    ``generate_series`` + ``list_transform``."""
    idx = F.sequence(F.lit(1), F.size(toks) - F.lit(n - 1))
    gram = F.transform(
        idx,
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
    )
    return F.when(F.size(toks) >= n, gram).otherwise(
        F.array().cast("array<string>"))


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher/MassiveText-style repetition filters (Rae et al. 2021,
    Table A1) over the whitespace token model — the classic "is this
    document degenerate repetition?" pre-training gate:

    - ``dup_token_frac``      — fraction of token occurrences beyond the
      first of each distinct token (``1 − distinct/total``);
    - ``top2gram_char_frac``  — characters covered by all occurrences of
      the most frequent word 2-gram over total characters (occurrences
      overlap-counted as in Gopher, capped at 1.0);
    - ``top3gram_char_frac``  — same for 3-grams;
    - ``dup5gram_char_frac``  — characters covered by 5-grams occurring
      more than once, over total characters (capped at 1.0);
    - ``flagged``             — Gopher thresholds: top-2-gram > 0.20 OR
      top-3-gram > 0.18 OR duplicated-5-grams > 0.15.

    Ties for the most frequent n-gram break by gram ascending
    (deterministic). Scale shape: the token-level stats are per-row array
    expressions (zero shuffle); each n-gram stat is one explode + one
    map-side-combinable (doc_id, gram) count + a per-doc top-1/sum — all
    keyed by doc_id, so partition width is bounded by document length,
    never corpus size. No Python UDFs anywhere."""
    from pyspark.sql import Window

    t = F.col(text_col)
    toks = tokens(t)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        toks.alias("_toks"),
        F.length(t).alias("n_chars"),
    ).localCheckpoint(eager=True)

    def _top_frac(n: int, out: str) -> DataFrame:
        grams = base.select(
            "doc_id", "n_chars",
            F.explode(_word_ngrams(F.col("_toks"), n)).alias("gram"))
        cnt = grams.groupBy("doc_id", "n_chars", "gram").agg(
            F.count("*").alias("c"))
        w = Window.partitionBy("doc_id").orderBy(F.desc("c"), F.asc("gram"))
        return (
            cnt.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "doc_id",
                F.round(F.least(
                    F.col("c") * F.length("gram")
                    / F.greatest(F.col("n_chars"), F.lit(1)).cast("double"),
                    F.lit(1.0)), 6).alias(out),
            )
        )

    def _dup_frac(n: int, out: str) -> DataFrame:
        grams = base.select(
            "doc_id", "n_chars",
            F.explode(_word_ngrams(F.col("_toks"), n)).alias("gram"))
        cnt = grams.groupBy("doc_id", "n_chars", "gram").agg(
            F.count("*").alias("c"))
        return (
            cnt.filter(F.col("c") > 1)
            .groupBy("doc_id")
            .agg(F.round(F.least(
                F.sum(F.col("c") * F.length("gram"))
                / F.greatest(F.max("n_chars"), F.lit(1)).cast("double"),
                F.lit(1.0)), 6).alias(out))
        )

    tok_stats = base.select(
        "doc_id",
        F.size("_toks").alias("n_tokens"),
        F.round(
            F.when(F.size("_toks") > 0,
                   F.lit(1.0) - F.size(F.array_distinct("_toks"))
                   / F.size("_toks").cast("double"))
            .otherwise(F.lit(0.0)), 6).alias("dup_token_frac"),
    )
    out = (
        tok_stats
        .join(_top_frac(2, "top2gram_char_frac"), "doc_id", "left")
        .join(_top_frac(3, "top3gram_char_frac"), "doc_id", "left")
        .join(_dup_frac(5, "dup5gram_char_frac"), "doc_id", "left")
        .select(
            "doc_id", "n_tokens", "dup_token_frac",
            F.coalesce("top2gram_char_frac", F.lit(0.0)).alias("top2gram_char_frac"),
            F.coalesce("top3gram_char_frac", F.lit(0.0)).alias("top3gram_char_frac"),
            F.coalesce("dup5gram_char_frac", F.lit(0.0)).alias("dup5gram_char_frac"),
        )
    )
    return out.withColumn(
        "flagged",
        (F.col("top2gram_char_frac") > 0.20)
        | (F.col("top3gram_char_frac") > 0.18)
        | (F.col("dup5gram_char_frac") > 0.15),
    )


def lm_score(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Corpus-trained bigram language-model fluency score — the CCNet-style
    perplexity filter (Wenzek et al. 2020) without any external model: the
    LM *is* the corpus, so documents whose token transitions are rare
    across the corpus score low (outliers/garbage), formulaic text scores
    high.

    Model: MLE bigram probabilities over lowercased whitespace tokens,
    ``P(w2|w1) = c(w1,w2) / c(w1·)`` where ``c(w1·)`` is the count of
    bigrams starting with ``w1`` — every document bigram was seen in
    training by construction, so no smoothing hazard. Returns
    ``(doc_id, n_bigrams, avg_logp, pseudo_ppl)`` with ``avg_logp`` the
    mean natural-log probability over the document's bigram occurrences
    and ``pseudo_ppl = exp(−avg_logp)``; documents with fewer than two
    tokens get ``n_bigrams = 0, avg_logp = 0, pseudo_ppl = 1``.

    Scale shape: one explode into (doc_id, w1, w2, k) with multiplicity
    pre-aggregated, one global (w1, w2) count (map-side combinable), one
    (w1) rollup of that count, and one bigram-keyed equi-join back — both
    big sides hash-partitioned on the same key. No Python UDFs."""
    toks = tokens(F.lower(F.col(text_col)))
    grams = (
        df.select(F.col(id_col).alias("doc_id"),
                  F.explode(_word_ngrams(toks, 2)).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count("*").alias("k"))
        .localCheckpoint(eager=True)
    )
    c12 = grams.groupBy("gram").agg(F.sum("k").alias("c12"))
    c1 = (
        c12.select(F.split(F.col("gram"), " ").getItem(0).alias("w1"), "c12")
        .groupBy("w1").agg(F.sum("c12").alias("c1"))
    )
    probs = (
        c12.withColumn("w1", F.split(F.col("gram"), " ").getItem(0))
        .join(c1, "w1")
        .select("gram", F.log(F.col("c12") / F.col("c1").cast("double")).alias("_lp"))
    )
    scored = (
        grams.join(probs, "gram")
        .groupBy("doc_id")
        .agg(
            F.sum("k").alias("n_bigrams"),
            (F.sum(F.col("k") * F.col("_lp")) / F.sum("k")).alias("_avg"),
        )
    )
    return (
        df.select(F.col(id_col).alias("doc_id"))
        .join(scored, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
            F.round(F.coalesce("_avg", F.lit(0.0)), 6).alias("avg_logp"),
            F.round(F.exp(-F.coalesce("_avg", F.lit(0.0))), 6).alias("pseudo_ppl"),
        )
    )


def filter_cascade(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_tokens: int = 10, max_tokens: int = 50_000,
                   min_quality: float = 0.4,
                   allowed_langs: tuple[str, ...] = ("en",)) -> DataFrame:
    """C4/Gopher-style accept/reject cascade — the composed pre-training
    document gate, run as ONE DataFrame program over the quality shelf:
    length window, composite quality floor (:func:`quality_score`),
    language allowlist (:func:`lang_id`), and the Gopher repetition
    flags (:func:`repetition_stats`).

    Returns ``(doc_id, n_tokens, quality, lang_pred, flagged, accept,
    reject_reason)``; ``reject_reason`` is the FIRST failing gate in the
    fixed order ``too_short, too_long, low_quality, wrong_lang,
    repetitive`` (null when accepted) — first-fail attribution is what a
    pipeline dashboards, since later gates are not evaluated semantics
    in streaming C4 implementations.

    Scale shape: three component lineages over one scan, joined on the
    id — the length/quality/lang legs are pure per-row expressions
    (zero shuffle), the repetition leg is the bounded per-doc n-gram
    aggregation documented in :func:`repetition_stats`; the cascade adds
    two id-keyed joins and no Python.
    """
    q = quality_score(df, text_col, id_col)
    lg = lang_id(df, text_col, id_col)
    rep = repetition_stats(df, text_col, id_col) \
        .select(F.col("doc_id").alias(id_col), "flagged")
    j = (q.select(id_col, "n_tokens", "quality")
         .join(lg.select(id_col, "lang_pred"), id_col)
         .join(rep, id_col))
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(F.col("n_tokens") > max_tokens, F.lit("too_long"))
        .when(F.col("quality") < min_quality, F.lit("low_quality"))
        .when(~F.col("lang_pred").isin(*allowed_langs),
              F.lit("wrong_lang"))
        .when(F.col("flagged"), F.lit("repetitive"))
        .otherwise(F.lit(None).cast("string"))
    )
    return j.select(
        id_col, "n_tokens", "quality", "lang_pred", "flagged",
        reason.alias("reject_reason"),
    ).withColumn("accept", F.col("reject_reason").isNull())
