"""Corpus-hygiene operators for training-data pipelines: boilerplate
segment removal and benchmark decontamination.

Both are standard pre-training corpus steps (CCNet/RefinedWeb-style
repeated-content stripping; n-gram-overlap decontamination against held-out
evaluation sets). Like the rest of ``functions/``, every hot-path
expression is a built-in ``pyspark.sql.functions`` call (JVM-side,
whole-stage codegen) — no Python UDFs — and every operator has an
ANSI-SQL equivalent (DuckDB oracle in ``__spark_entry__.py``).

Scale shapes (the 100-TB story):

* ``segment_table``/``shingle_table`` are linear explodes (|tokens|/L and
  |tokens| rows respectively) — one stage, no shuffle.
* ``boilerplate_stats`` is one map-side-combinable hash agg on
  (source, segment) plus one equi-join back on the same key — the exact
  shape of per-host repeated-line counting on a crawl, where the group key
  cardinality is bounded by the distinct-segment count per host.
* ``decontaminate`` is a broadcast inner-join against the (small)
  evaluation shingle set — the benchmark side is always tiny relative to
  the corpus, so the corpus is never shuffled.

Reference tie-in: the reference engine has no text surface
(`/root/reference/src/` is graph kernels only); these operators extend the
LLM-data-pipeline shelf mandated alongside SURVEY.md §2.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens


def segment_table(df: DataFrame, seg_len: int = 8,
                  text_col: str = "text", id_col: str = "doc_id",
                  extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """Explode each document into consecutive NON-overlapping token
    segments of ``seg_len`` tokens (the trailing partial segment is kept).

    Returns (id, *extra_cols, pos, seg) with ``pos`` the 0-based segment
    position — enough to reassemble the document deterministically.
    """
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    # positions 0 .. ceil(n/L)-1; empty docs produce no rows
    pos_seq = F.when(
        n > 0, F.sequence(F.lit(0), F.floor((n - 1) / F.lit(seg_len)))
    ).otherwise(F.array())
    segs = F.transform(
        pos_seq,
        lambda i: F.struct(
            i.alias("pos"),
            F.array_join(
                F.slice(toks, i * F.lit(seg_len) + 1, F.lit(seg_len)), " "
            ).alias("seg"),
        ),
    )
    return df.select(
        F.col(id_col), *[F.col(c) for c in extra_cols], F.explode(segs).alias("s")
    ).select(F.col(id_col), *extra_cols,
             F.col("s.pos").alias("pos"), F.col("s.seg").alias("seg"))


def boilerplate_stats(df: DataFrame, seg_len: int = 8, min_docs: int = 3,
                      text_col: str = "text", id_col: str = "doc_id",
                      source_col: str = "source") -> DataFrame:
    """Per-document boilerplate report: a segment is *boilerplate* when the
    same ``seg_len``-token segment appears in ≥ ``min_docs`` distinct
    documents of the same ``source`` (per-host repeated-content counting —
    the distributed form of CCNet/RefinedWeb line-dedup).

    Returns (doc_id, source, n_segments, n_boiler, boiler_ratio) for every
    document with at least one segment.
    """
    seg = segment_table(df, seg_len, text_col, id_col, (source_col,))
    freq = (seg.groupBy(source_col, "seg")
               .agg(F.countDistinct(id_col).alias("nd")))
    joined = seg.join(freq, [source_col, "seg"])
    return (joined.groupBy(id_col, source_col)
            .agg(F.count("*").alias("n_segments"),
                 F.sum((F.col("nd") >= min_docs).cast("long")).alias("n_boiler"))
            .withColumn("boiler_ratio",
                        F.round(F.col("n_boiler") / F.col("n_segments"), 6)))


def remove_boilerplate(df: DataFrame, seg_len: int = 8, min_docs: int = 3,
                       text_col: str = "text", id_col: str = "doc_id",
                       source_col: str = "source") -> DataFrame:
    """Reassemble each document with boilerplate segments removed.

    Returns (doc_id, clean_text, n_kept) — ``clean_text`` is the
    position-ordered join of surviving segments ('' when everything was
    boilerplate). Documents with no segments (empty text) are dropped,
    matching :func:`boilerplate_stats`.
    """
    seg = segment_table(df, seg_len, text_col, id_col, (source_col,))
    freq = (seg.groupBy(source_col, "seg")
               .agg(F.countDistinct(id_col).alias("nd")))
    joined = seg.join(freq, [source_col, "seg"])
    kept = joined.filter(F.col("nd") < min_docs)
    # deterministic reassembly: sort the (pos, seg) structs, then join —
    # order-insensitive to partitioning (collect_list order is not
    # guaranteed, the array_sort makes the result exact)
    agg = (kept.groupBy(id_col)
           .agg(F.array_sort(F.collect_list(F.struct("pos", "seg"))).alias("ps")))
    all_docs = seg.select(id_col).distinct()
    return (all_docs.join(agg, id_col, "left")
            .select(
                F.col(id_col),
                F.coalesce(
                    F.array_join(F.transform(F.col("ps"), lambda s: s["seg"]), " "),
                    F.lit(""),
                ).alias("clean_text"),
                F.coalesce(F.size("ps"), F.lit(0)).cast("long").alias("n_kept"),
            ))


def shingle_table(df: DataFrame, k: int = 8,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Explode each document into OVERLAPPING ``k``-token shingles
    (positions 1..n-k+1). Documents shorter than ``k`` tokens produce no
    rows. Returns (id, shingle) distinct per document."""
    toks = tokens(F.col(text_col))
    n = F.size(toks)
    sh = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - F.lit(k - 1)),
            lambda i: F.array_join(F.slice(toks, i, F.lit(k)), " "),
        ),
    ).otherwise(F.array())
    return (df.select(F.col(id_col), F.explode(sh).alias("shingle"))
              .dropDuplicates([id_col, "shingle"]))


def duplicate_spans(df: DataFrame, k: int = 8, min_docs: int = 2,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Cross-document exact-span dedup report (the Lee et al.
    "Deduplicating Training Data" / ExactSubstr pass, at token-window
    granularity): a ``k``-token span is *duplicated* when it occurs in at
    least ``min_docs`` DISTINCT documents; every document is scored by the
    fraction of its spans that are duplicated.

    Returns (id, n_spans, n_dup_spans, dup_frac) — documents shorter than
    ``k`` tokens produce no row (they have no spans).

    Scale shape: spans are reduced to 64-bit hashes BEFORE the shuffle
    (``xxhash64`` — the shuffle moves 8-byte keys, never span text), the
    occurrence count is one map-side-combinable hash agg, and the
    span->count join lands co-partitioned on the same hash key the agg
    just produced, so AQE plans it without a second corpus shuffle. No
    broadcast of the duplicate set is needed (at 100 TB it wouldn't fit).
    Hash collisions: a corpus-wide false-dup needs two distinct spans in
    the same 64-bit cell — at 1e12 spans the expected collision count is
    ~0.03 per (birthday bound), and the DuckDB oracle (which groups by the
    raw span string) would flag any that mattered.
    """
    sh = shingle_table(df, k, text_col, id_col)  # distinct per document
    h = sh.select(F.col(id_col), F.xxhash64("shingle").alias("sh"))
    counts = h.groupBy("sh").agg(F.count("*").alias("nd"))
    return (
        h.join(counts, "sh")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_spans"),
            F.sum((F.col("nd") >= min_docs).cast("long")).alias("n_dup_spans"),
        )
        .select(
            F.col(id_col), "n_spans", "n_dup_spans",
            F.round(F.col("n_dup_spans") / F.col("n_spans"), 6).alias("dup_frac"),
        )
    )


def dup_span_report(df: DataFrame, k: int = 8, min_docs: int = 2,
                    top: int = 20,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The most-duplicated ``k``-token spans: (span, n_docs), top ``top``
    by (n_docs desc, span asc).

    This variant groups by the span TEXT because the report must display
    it; at corpus scale run :func:`duplicate_spans`'s hash agg first and
    join one exemplar doc back per surviving hash instead — the top-N
    report is tiny either way (a single final ``LIMIT`` after a
    map-side-combined count).
    """
    sh = shingle_table(df, k, text_col, id_col)
    return (
        sh.groupBy(F.col("shingle").alias("span"))
        .agg(F.count("*").alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), F.asc("span"))
        .limit(top)
    )


def decontaminate(df: DataFrame, eval_df: DataFrame, k: int = 8,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Benchmark decontamination: flag corpus documents sharing ≥1
    ``k``-token shingle with any document of ``eval_df`` (the held-out
    benchmark set). Returns one row per CONTAMINATED corpus document:
    (doc_id, n_hit_shingles, n_shingles, hit_ratio).

    The eval shingle set is broadcast — the corpus side is never shuffled,
    which is what makes this affordable as a final pass over a full
    pre-training corpus.
    """
    corpus_sh = shingle_table(df, k, text_col, id_col)
    eval_sh = shingle_table(eval_df, k, text_col, id_col) \
        .select("shingle").distinct()
    totals = corpus_sh.groupBy(id_col).agg(F.count("*").alias("n_shingles"))
    hits = (corpus_sh.join(F.broadcast(eval_sh), "shingle")
            .groupBy(id_col).agg(F.count("*").alias("n_hit_shingles")))
    return (hits.join(totals, id_col)
            .select(F.col(id_col), "n_hit_shingles", "n_shingles",
                    F.round(F.col("n_hit_shingles") / F.col("n_shingles"),
                            6).alias("hit_ratio")))


def latest_snapshot(df: DataFrame, key: str, ts_col: str,
                    tiebreak: str) -> DataFrame:
    """Keep the newest row per key — the crawl "latest snapshot per url"
    dedup (a url re-crawled across WARC segments keeps only its most
    recent capture before extraction/ranking).

    Execution shape: ONE hash aggregation with map-side partial combine —
    ``max(struct(ts, tiebreak, *rest))`` selects the argmax row inside
    the agg buffer, so the shuffle carries one candidate row per key per
    partition. The window formulation (``row_number() over (partition by
    key order by ts desc)``) Spark users reach for first materializes and
    sorts EVERY row of every key through one shuffle — strictly worse at
    crawl scale where hot urls have thousands of captures. Ties on the
    timestamp break on ``tiebreak`` (descending), making the survivor
    total-ordered and reproducible.

    Struct comparison is lexicographic by field order, which is exactly
    (ts, tiebreak, ...) — the payload fields after the tiebreak never
    influence the winner because (ts_col, tiebreak) is unique per key by
    contract (tiebreak is a row id).
    """
    rest = [c for c in df.columns if c not in (key, ts_col, tiebreak)]
    packed = F.struct(F.col(ts_col), F.col(tiebreak),
                      *[F.col(c) for c in rest])
    agg = df.groupBy(key).agg(F.max(packed).alias("_top"))
    return agg.select(
        F.col(key),
        F.col(f"_top.{ts_col}").alias(ts_col),
        F.col(f"_top.{tiebreak}").alias(tiebreak),
        *[F.col(f"_top.{c}").alias(c) for c in rest],
    )


def token_drift(df: DataFrame, source_a: str, source_b: str,
                text_col: str = "text",
                source_col: str = "source") -> DataFrame:
    """Distribution drift between two sources' token frequencies —
    the corpus-monitoring number a training pipeline tracks across
    crawl snapshots / source mixes (vocabulary shift, topic drift,
    contamination by a new scrape).

    Returns one row (kl_ab, kl_ba, jsd, vocab, n_a, n_b):
    KL(P_a‖P_b), KL(P_b‖P_a) and the Jensen-Shannon divergence, with
    add-one (Laplace) smoothing over the UNION vocabulary so unseen
    tokens have finite mass: P_x(t) = (c_x(t)+1) / (N_x+V).

    Execution shape: one explode+count aggregation per side collapsed
    to the O(vocab) token tables, a full outer join on token, then one
    scalar aggregation of the pointwise terms — corpus-size work is the
    two count scans (map-side combine); everything after runs on
    distinct tokens. All column math (ln/÷) — SQL-reproducible, rounded
    to 6 dp.
    """
    def counts(src):
        return (
            df.filter(F.col(source_col) == src)
            .select(F.explode(tokens(F.col(text_col))).alias("token"))
            .groupBy("token").agg(F.count("*").cast("long").alias("c"))
        )

    ca = counts(source_a).withColumnRenamed("c", "ca")
    cb = counts(source_b).withColumnRenamed("c", "cb")
    j = ca.join(cb, "token", "full").select(
        F.coalesce("ca", F.lit(0)).alias("ca"),
        F.coalesce("cb", F.lit(0)).alias("cb"),
    )
    tot = j.agg(F.sum("ca").alias("na"), F.sum("cb").alias("nb"),
                F.count("*").alias("v")).collect()[0]
    na, nb, v = int(tot["na"]), int(tot["nb"]), int(tot["v"])
    pa = (F.col("ca") + 1).cast("double") / F.lit(float(na + v))
    pb = (F.col("cb") + 1).cast("double") / F.lit(float(nb + v))
    m = (pa + pb) / 2

    # Each pointwise term is rounded to an integer at 1e15 scale BEFORE
    # the sum, so the aggregate is an exact integer addition — immune to
    # the partial-aggregation reassociation order (double sums are not
    # associative; a knife-edge value could otherwise flip the 6-dp
    # round vs the oracle under a different partition count).  The
    # per-term quantization error (≤5e-16 each, ≤V terms) is far below
    # the 6-dp output rounding.
    def iterm(expr):
        return F.round(expr * F.lit(1e15)).cast("long")

    agg = j.agg(
        F.sum(iterm(pa * F.log(pa / pb))).alias("kl_ab_i"),
        F.sum(iterm(pb * F.log(pb / pa))).alias("kl_ba_i"),
        F.sum(iterm(pa * F.log(pa / m))).alias("ja_i"),
        F.sum(iterm(pb * F.log(pb / m))).alias("jb_i"),
    )
    return agg.select(
        F.round(F.col("kl_ab_i") / F.lit(1e15), 6).alias("kl_ab"),
        F.round(F.col("kl_ba_i") / F.lit(1e15), 6).alias("kl_ba"),
        F.round((F.col("ja_i") / F.lit(1e15) / 2
                 + F.col("jb_i") / F.lit(1e15) / 2), 6).alias("jsd"),
        F.lit(v).cast("long").alias("vocab"),
        F.lit(na).cast("long").alias("n_a"),
        F.lit(nb).cast("long").alias("n_b"),
    )


def chunk_documents(df: DataFrame, size: int = 128, stride: int = 96,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Split documents into overlapping token windows — the standard
    long-document preparation for a fixed-context trainer or retriever
    (window ``size`` tokens, hop ``stride``; ``size > stride`` gives
    ``size - stride`` tokens of overlap so no boundary context is lost).

    Chunk starts are ``0, stride, 2·stride, …`` while ``start < n``;
    the last chunk is simply shorter (no padding — padding is the
    packer's job, ``functions/packing.py``). Empty documents produce no
    chunks. Returns ``(doc_id, chunk_idx, chunk_start, chunk_tokens,
    chunk_len, chunk_text)``.

    Execution shape: tokenize → ``sequence`` of starts → one
    ``explode`` → ``slice``/``array_join`` — a linear per-row explode
    producing ~n/stride rows per document, all inside whole-stage
    codegen, no shuffle and no Python. At 100 TB this rides the
    extraction scan: chunking is a projection, so Catalyst pipelines it
    with the parquet read and any pushed filters.
    """
    if size < 1 or stride < 1:
        raise ValueError("size and stride must be >= 1")
    toks = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("_toks")
    ).withColumn("_n", F.size("_toks")).filter(F.col("_n") > 0)
    return (
        toks.select(
            id_col, "_toks",
            F.posexplode(
                F.sequence(F.lit(0), F.col("_n") - 1, F.lit(stride))
            ).alias("chunk_idx", "chunk_start"),
        )
        .select(
            id_col,
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.col("chunk_start").cast("int").alias("chunk_start"),
            F.slice("_toks", F.col("chunk_start") + 1, size)
            .alias("chunk_tokens"),
        )
        .withColumn("chunk_len", F.size("chunk_tokens").cast("int"))
        .withColumn("chunk_text", F.array_join("chunk_tokens", " "))
    )


def mirror_report(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id",
                  source_col: str = "source") -> DataFrame:
    """Cross-host mirror detection: documents whose EXACT text is served
    by >= 2 distinct sources (mirror sites / scraped republishing — the
    crawl pathology that inflates both corpus size and the link graph's
    duplicate-host mass).

    Returns ``(doc_id, source, n_mirror_hosts, canonical_source,
    is_canonical)`` for mirrored documents only; ``canonical_source`` is
    the lexicographically smallest source serving the content (the
    deterministic keep-rule — swap in a crawl-priority table in
    production).

    Execution shape: text collapses to a 128-bit md5 BEFORE the
    shuffle (the shuffle moves 32-byte keys, never document text), one
    map-side-combinable aggregation on the fingerprint, one equi-join
    back on the same key — co-partitioned, AQE plans it without a
    second corpus shuffle. Near-dup mirrors (template drift) are the
    MinHash pipeline's job; this is the exact-content tier.
    """
    h = df.select(F.col(id_col), F.col(source_col).alias("source"),
                  F.md5(F.col(text_col)).alias("_fp"))
    g = (h.groupBy("_fp")
         .agg(F.countDistinct("source").alias("n_mirror_hosts"),
              F.min("source").alias("canonical_source"))
         .filter(F.col("n_mirror_hosts") >= 2))
    return (h.join(g, "_fp")
            .select(id_col, "source",
                    F.col("n_mirror_hosts").cast("long")
                    .alias("n_mirror_hosts"),
                    "canonical_source",
                    (F.col("source") == F.col("canonical_source"))
                    .alias("is_canonical")))
