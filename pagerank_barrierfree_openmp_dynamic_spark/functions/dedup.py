"""Deduplication operators: exact, MinHash+LSH, n-gram Jaccard,
embedding-cosine near-dup.

Scale shapes (100 TB design notes):

- exact: one hash-shuffle on ``md5(text)`` — map-side partial agg makes the
  shuffle carry one row per distinct hash per partition.
- MinHash/LSH: shingle -> per-(doc, band) min-hash -> equi-join on
  (band, signature) buckets. No cross join anywhere; candidate volume is
  bounded by bucket sizes, and verification (exact Jaccard) touches only
  candidates. Hash family is md5-based so an ANSI-SQL oracle reproduces it.
- embedding near-dup: see functions/similarity.py (bucketed LSH variant).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .text import tokens


def exact_duplicates(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Exact dedup groups: (md5, representative id = min, n_dups).
    Only groups with >1 member are duplicates; all groups are returned so
    the representative set is the dedup output."""
    return (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("md5"))
        .groupBy("md5")
        .agg(F.min(id_col).alias("keep_id"), F.count("*").alias("n_docs"))
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The deduplicated document set (keep the min-id representative)."""
    keep = exact_duplicates(df, text_col, id_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(keep, id_col, "left_semi")


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
             n: int = 3) -> DataFrame:
    """Distinct n-gram (word-shingle) sets per document: (id, shingle).
    Shingle = n consecutive whitespace tokens joined by a single space —
    reproducible in SQL with window functions."""
    toks = tokens(F.col(text_col))
    k = F.size(toks) - (n - 1)
    sh = F.transform(
        F.sequence(F.lit(0), F.greatest(k - 1, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return (
        df.select(F.col(id_col).alias("id"), F.explode(F.array_distinct(sh)).alias("shingle"))
    )


def minhash_signatures(sh: DataFrame, bands: int = 8) -> DataFrame:
    """Per-(doc, band) MinHash: ``min(md5(band || '|' || shingle))``.

    One row per (id, band); the md5-keyed hash family is order-independent
    and ANSI-SQL reproducible. ``bands`` independent 1-row signatures give
    LSH bands of width 1 (candidate iff any band collides) — the standard
    banding trade-off with r=1, b=bands.
    """
    b = F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    return (
        sh.select("id", "shingle", b)
        .groupBy("id", "band")
        .agg(F.min(F.md5(F.concat_ws("|", F.col("band"), F.col("shingle")))).alias("sig"))
    )


def lsh_candidate_pairs(sig: DataFrame,
                        max_bucket: int | None = None) -> DataFrame:
    """Docs sharing any (band, sig) bucket: (a, b) with a < b, distinct.
    Equi-join on the bucket key — shuffle by (band, sig), no cross join.

    ``max_bucket`` caps the bucket-join blowup at scale: a degenerate
    bucket of k members (boilerplate pages, empty docs) still yields k²
    candidate rows from the self-join. Buckets larger than ``max_bucket``
    are skipped for pair GENERATION (their members still pair through any
    non-degenerate band, so near-dup recall degrades only for documents
    whose EVERY band is hot — which at sane band counts means the corpus
    slice is itself degenerate and wants exact dedup, not MinHash).
    Default None = exact candidate set (the SQL-oracle-checked path)."""
    if max_bucket is not None:
        ok = (
            sig.groupBy("band", "sig")
            .agg(F.count("*").alias("_bn"))
            .filter(F.col("_bn") <= max_bucket)
            .select("band", "sig")
        )
        sig = sig.join(ok, ["band", "sig"], "left_semi")
    left = sig.select(F.col("id").alias("a"), "band", "sig")
    right = sig.select(F.col("id").alias("b"), "band", "sig")
    return (
        left.join(right, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )


def jaccard_verify(sh: DataFrame, pairs: DataFrame, threshold: float = 0.5) -> DataFrame:
    """Exact shingle-Jaccard for candidate pairs; keep >= threshold.

    |A ∩ B| is computed CANDIDATE-BOUNDED: join the pairs to side a's
    shingles, then equi-join side b on (b, shingle). Cost is
    Σ_pairs |shingles(a)| — never the global shingle co-occurrence square
    (a shingle→shingle self-join pruned by a later semi-join still
    materializes k² rows for a shingle shared by k documents; one
    stop-word shingle at web scale makes that a job-killer, and Catalyst
    cannot push the semi-join below the self-join because the (a, b) keys
    only exist above it). |A ∪ B| = |A| + |B| − |∩|. Returns
    (a, b, jaccard) rounded to 6 places; zero-intersection candidates drop
    (they cannot reach any threshold > 0).
    """
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    inter = (
        pairs.join(sh.select(F.col("id").alias("a"), "shingle"), "a")
        .join(sh.select(F.col("id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    j = (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a", "b",
            F.round(
                F.col("n_inter") / (F.col("na") + F.col("nb") - F.col("n_inter")), 6
            ).alias("jaccard"),
        )
    )
    return j.filter(F.col("jaccard") >= threshold)


def minhash_near_dup_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", n: int = 3, bands: int = 8,
                           threshold: float = 0.5,
                           max_bucket: int | None = None) -> DataFrame:
    """Full MinHash-LSH near-dup pipeline: shingle -> band-minhash ->
    bucket join -> exact-Jaccard verify. Returns (a, b, jaccard).
    ``max_bucket`` forwards the degenerate-bucket k² cap to the LSH join."""
    sh = shingles(df, text_col, id_col, n).persist()
    try:
        sig = minhash_signatures(sh, bands)
        cand = lsh_candidate_pairs(sig, max_bucket=max_bucket)
        # Materialize the (small) verified-pairs output eagerly so the
        # shingle cache can be released before returning — a lazy return
        # would pin `sh` in the cache for the session's lifetime.
        return jaccard_verify(sh, cand, threshold).localCheckpoint(eager=True)
    finally:
        sh.unpersist()


def near_dup_clusters(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", n: int = 3, bands: int = 8,
                      threshold: float = 0.5,
                      max_bucket: int | None = None) -> DataFrame:
    """Complete the dedup pipeline: near-dup PAIRS -> duplicate CLUSTERS ->
    canonical-document selection.

    MinHash-LSH pairs become an undirected graph over the documents; the
    engine's connected-components kernel (min-label + pointer jumping)
    assigns every document the smallest doc id in its duplicate cluster.
    Returns (doc_id, cluster, keep): ``keep`` marks the canonical document
    (the cluster minimum) — ``filter(keep)`` is the deduplicated corpus.

    Scale shape: the pair graph is tiny relative to the corpus (candidates
    only), the CC loop is O(log diameter) shuffles over it, and singleton
    documents never enter a join — they are cluster roots by construction.
    """
    from ..operators.graph import build_graph
    from ..plans.components import connected_components

    pairs = minhash_near_dup_pairs(df, text_col, id_col, n, bands, threshold,
                                   max_bucket=max_bucket)
    vertices = df.select(F.col(id_col).alias("id")).distinct()
    g = build_graph(pairs.select(F.col("a").alias("src"),
                                 F.col("b").alias("dst")),
                    vertices=vertices, symmetric=True, add_self_loops=False)
    try:
        cc = connected_components(g)
        return cc.select(
            F.col("id").alias(id_col),
            F.col("comp").alias("cluster"),
            (F.col("id") == F.col("comp")).alias("keep"),
        )
    finally:
        g.unpersist()


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """All-pairs n-gram Jaccard >= threshold WITHOUT LSH pruning (the exact
    baseline; quadratic in colliding shingles — small scales / validation).
    """
    sh = shingles(df, text_col, id_col, n)
    pairs = (
        sh.select(F.col("id").alias("a"), "shingle")
        .join(sh.select(F.col("id").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return jaccard_verify(sh, pairs, threshold)


def containment_verify(sh: DataFrame, pairs: DataFrame,
                       threshold: float = 0.8) -> DataFrame:
    """Exact shingle CONTAINMENT for candidate pairs; keep >= threshold.

    containment(a, b) = |A ∩ B| / min(|A|, |B|) — the near-dup measure
    Jaccard structurally misses: a short document wholly quoted inside a
    long one has tiny Jaccard (union is dominated by the long side) but
    containment 1.0. Standard in crawl dedup (Broder's resemblance vs
    containment split) for catching wrapper pages, quote farms, and
    boilerplate-expanded copies.

    Same candidate-bounded execution shape as :func:`jaccard_verify`
    (cost Σ_pairs |shingles(a)|, never the shingle co-occurrence
    square); returns (a, b, containment) rounded to 6 places.
    """
    sizes = sh.groupBy("id").agg(F.count("*").alias("n"))
    inter = (
        pairs.join(sh.select(F.col("id").alias("a"), "shingle"), "a")
        .join(sh.select(F.col("id").alias("b"), "shingle"), ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count("*").alias("n_inter"))
    )
    c = (
        inter.join(sizes.select(F.col("id").alias("a"), F.col("n").alias("na")), "a")
        .join(sizes.select(F.col("id").alias("b"), F.col("n").alias("nb")), "b")
        .select(
            "a", "b",
            F.round(F.col("n_inter") / F.least("na", "nb"), 6)
            .alias("containment"),
        )
    )
    return c.filter(F.col("containment") >= threshold)


def ngram_containment_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", n: int = 3,
                            threshold: float = 0.8) -> DataFrame:
    """All-pairs n-gram containment >= threshold (exact baseline; the
    LSH-pruned scale path is `lsh_candidate_pairs` -> `containment_verify`,
    exactly as for Jaccard)."""
    sh = shingles(df, text_col, id_col, n)
    pairs = (
        sh.select(F.col("id").alias("a"), "shingle")
        .join(sh.select(F.col("id").alias("b"), "shingle"), "shingle")
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    return containment_verify(sh, pairs, threshold)


def near_dup_against_corpus(new_df: DataFrame, corpus_df: DataFrame,
                            text_col: str = "text", id_col: str = "doc_id",
                            n: int = 3, bands: int = 8,
                            threshold: float = 0.5,
                            max_bucket: int | None = None) -> DataFrame:
    """INCREMENTAL near-dup: flag each NEW document that near-duplicates
    any CORPUS document — the dedup step an ingesting pipeline runs on
    every incoming crawl batch without re-clustering the corpus.

    Returns ``(doc_id, dup_of, jaccard)``: the best corpus match per
    duplicated new document (max Jaccard, ties to the smallest corpus
    id); new documents with no match above ``threshold`` produce no row
    (anti-joining the output against the batch yields the accepted
    docs). Document ids must be disjoint across the two inputs.

    Scale shape: candidates are CROSS-side only — new signatures
    equi-join corpus signatures on (band, sig); neither side ever
    self-joins, so candidate volume is driven by the (small) incoming
    batch, not the corpus. The corpus shingle/signature tables are
    exactly the artifacts a production pipeline persists as its dedup
    index (rebuilt only when the corpus version changes), and
    ``max_bucket`` drops degenerate corpus buckets (boilerplate) before
    the join, same as :func:`lsh_candidate_pairs`. The verify is
    candidate-bounded (:func:`jaccard_verify`).
    """
    sh_new = shingles(new_df, text_col, id_col, n).persist()
    sh_cor = shingles(corpus_df, text_col, id_col, n).persist()
    try:
        sig_new = minhash_signatures(sh_new, bands)
        sig_cor = minhash_signatures(sh_cor, bands)
        if max_bucket is not None:
            ok = (sig_cor.groupBy("band", "sig")
                  .agg(F.count("*").alias("_bn"))
                  .filter(F.col("_bn") <= max_bucket)
                  .select("band", "sig"))
            sig_cor = sig_cor.join(ok, ["band", "sig"], "left_semi")
        cand = (
            sig_new.select(F.col("id").alias("a"), "band", "sig")
            .join(sig_cor.select(F.col("id").alias("b"), "band", "sig"),
                  ["band", "sig"])
            .select("a", "b").distinct()
        )
        verified = jaccard_verify(sh_new.unionByName(sh_cor), cand,
                                  threshold)
        best = verified.groupBy("a").agg(
            F.max(F.struct(F.col("jaccard"),
                           (-F.col("b")).alias("_negb"))).alias("m"))
        return best.select(
            F.col("a").alias("doc_id"),
            (-F.col("m._negb")).alias("dup_of"),
            F.col("m.jaccard").alias("jaccard"),
        ).localCheckpoint(eager=True)
    finally:
        sh_new.unpersist()
        sh_cor.unpersist()
