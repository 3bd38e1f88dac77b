"""Link extraction: Common-Crawl-style page table -> deduplicated edge table.

This is the engine's scan front-end, the analogue of the reference's MTX
reader (``/root/reference/src/mtx.hxx:92-157`` — chunked read + parallel
parse + partitioned insert). Here the "file format" is an Iceberg/Parquet
table of pages ``(url, warc_ts, html, text, lang)``; parsing is an
Arrow-batched ``mapInPandas`` href extractor (never per-row Python UDFs),
and the partitioned insert is Spark's hash shuffle.

Invariant (BASELINE.json input_hint): the ``text`` column passes through
byte-identical per url — extraction never rewrites page text.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

# href in single or double quotes; tolerant of other attributes before href.
_HREF_RE = re.compile(rb"""<a\s[^>]*?href\s*=\s*["']([^"'#\s>]+)""", re.IGNORECASE)

# nofollow support (the rel microformat real link graphs honor: a
# nofollow link carries no endorsement, so PageRank pipelines drop it
# before edge building). The drop path matches whole <a ...> open tags
# so the rel attribute is inspected wherever it sits relative to href.
_ATAG_RE = re.compile(rb"<a\s[^>]*>", re.IGNORECASE)
_HREF_IN_TAG_RE = re.compile(rb"""href\s*=\s*["']([^"'#\s>]+)""",
                             re.IGNORECASE)
_NOFOLLOW_RE = re.compile(rb"""rel\s*=\s*["'][^"']*\bnofollow\b""",
                          re.IGNORECASE)


def _page_hrefs(buf, drop_nofollow: bool):
    """href targets in one page's bytes. ``drop_nofollow=False`` is the
    original single-regex hot path (byte-identical, fastest);
    ``drop_nofollow=True`` walks complete ``<a ...>`` open tags and
    skips those whose ``rel`` contains ``nofollow`` (a tag left
    unclosed at the buffer end is skipped on this path — it cannot be
    inspected for rel)."""
    if not drop_nofollow:
        return _HREF_RE.findall(buf)
    out = []
    for t in _ATAG_RE.finditer(buf):
        tag = t.group(0)
        m = _HREF_IN_TAG_RE.search(tag)
        if m and not _NOFOLLOW_RE.search(tag):
            out.append(m.group(1))
    return out


_LINKS_SCHEMA = "src_url string, dst_url string"


def extract_links(pages: DataFrame, drop_nofollow: bool = False) -> DataFrame:
    """``(url, html, ...)`` -> ``(src_url, dst_url)``, one row per anchor.

    Vectorized per Arrow batch: regex runs on raw bytes (no decode needed),
    duplicates within a page are kept (deduped later at the edge level).
    Column pruning: only url+html are read from the scan.
    ``drop_nofollow=True`` skips links whose ``rel`` contains
    ``nofollow`` (see :func:`_page_hrefs`).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            dsts: list[str] = []
            for u, h in zip(pdf["url"].to_numpy(), pdf["html"].to_numpy()):
                if h is None:
                    continue
                for m in _page_hrefs(bytes(h), drop_nofollow):
                    urls.append(u)
                    dsts.append(m.decode("utf-8", "replace"))
            yield pd.DataFrame({"src_url": urls, "dst_url": dsts})

    return pages.select("url", "html").mapInPandas(_extract, schema=_LINKS_SCHEMA)


def extract_links_arrow(pages: DataFrame,
                        drop_nofollow: bool = False) -> DataFrame:
    """:func:`extract_links` on the ``mapInArrow`` fast path — byte-identical
    output, less copying.

    The pandas path materializes every html payload as a Python ``bytes``
    (one boxing + one copy per page). Here the regex runs on ZERO-COPY
    ``memoryview`` slices of the Arrow binary data buffer (``re`` accepts
    any buffer-protocol object), so per batch the only per-page Python cost
    is an offset slice; page bytes are never copied out of the Arrow
    buffer. Same regex, same match semantics, same output schema.
    """
    import numpy as np
    import pyarrow as pa

    def _extract(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for rb in batches:
            urls = rb.column(0)
            html = rb.column(1)
            n = len(html)
            out_u: list[str] = []
            out_d: list[str] = []
            if n:
                u_list = urls.to_pylist()
                valid = (html.is_valid().to_numpy(zero_copy_only=False)
                         if html.null_count else None)
                bufs = html.buffers()  # [validity, offsets, data]
                odt = (np.int64 if pa.types.is_large_binary(html.type)
                       else np.int32)
                offs = np.frombuffer(
                    bufs[1], dtype=odt, count=n + 1,
                    offset=html.offset * np.dtype(odt).itemsize)
                data = memoryview(bufs[2])
                for i in range(n):
                    if valid is not None and not valid[i]:
                        continue
                    lo, hi = offs[i], offs[i + 1]
                    if hi <= lo:
                        continue
                    for m in _page_hrefs(data[lo:hi], drop_nofollow):
                        out_u.append(u_list[i])
                        out_d.append(m.decode("utf-8", "replace"))
            yield pa.record_batch(
                [pa.array(out_u, pa.string()), pa.array(out_d, pa.string())],
                names=["src_url", "dst_url"])

    return pages.select("url", "html").mapInArrow(_extract, schema=_LINKS_SCHEMA)


_ANCHOR_RE = re.compile(
    rb"""<a\s[^>]*?href\s*=\s*["']([^"'#\s>]+)["'][^>]*>(.*?)</a>""",
    re.IGNORECASE | re.DOTALL)
_TAG_RE = re.compile(rb"<[^>]+>")

_ANCHORS_SCHEMA = "src_url string, dst_url string, anchor string"


def extract_anchors(pages: DataFrame) -> DataFrame:
    """``(url, html, ...)`` -> ``(src_url, dst_url, anchor)`` — the link
    table WITH each link's anchor text (nested markup stripped,
    whitespace collapsed). Anchor text is the classic web ranking /
    training-data signal: "what the rest of the web calls this page".

    Same Arrow-batched shape as :func:`extract_links` (vectorized
    ``mapInPandas``, regex on raw bytes, no per-row Python UDF). The
    href-capture group is IDENTICAL to ``_HREF_RE``, so the (src, dst)
    pairs agree with :func:`extract_links` on every well-formed
    ``<a ...>...</a>``; links whose ``<a>`` never closes are dropped here
    (there is no anchor to report).
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            srcs: list[str] = []
            dsts: list[str] = []
            txts: list[str] = []
            for u, h in zip(pdf["url"].to_numpy(), pdf["html"].to_numpy()):
                if h is None:
                    continue
                for href, inner in _ANCHOR_RE.findall(bytes(h)):
                    srcs.append(u)
                    dsts.append(href.decode("utf-8", "replace"))
                    txt = _TAG_RE.sub(b"", inner).decode("utf-8", "replace")
                    txts.append(" ".join(txt.split()))
            yield pd.DataFrame(
                {"src_url": srcs, "dst_url": dsts, "anchor": txts})

    return pages.select("url", "html").mapInPandas(
        _extract, schema=_ANCHORS_SCHEMA)


def anchor_terms(anchors: DataFrame, top_k: int | None = None) -> DataFrame:
    """Aggregate the anchor-text signal per TARGET page:
    ``(dst_url, term, cnt)`` — how many inbound links describe the page
    with each term. With ``top_k``, keep the k most frequent terms per
    target (count desc, term asc — deterministic).

    Scale shape: explode + one map-side-combinable hash agg keyed by
    (dst_url, term); the optional top-k is a window over the SAME
    partitioning key, so no extra shuffle. All JVM expressions.
    """
    from pyspark.sql import Window

    terms = anchors.select(
        "dst_url",
        F.explode(
            F.filter(F.split(F.lower("anchor"), r"\s+"),
                     lambda t: t != F.lit(""))
        ).alias("term"),
    )
    counts = terms.groupBy("dst_url", "term").agg(F.count("*").alias("cnt"))
    if top_k is None:
        return counts
    w = Window.partitionBy("dst_url").orderBy(
        F.desc("cnt"), F.asc("term"))
    return (counts.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= top_k).drop("rk"))


def url_dictionary(pages: DataFrame) -> DataFrame:
    """Assign dense long ids ``[0, N)`` to urls, deterministically (ordered by
    url). Dense ids let kernels use array-backed per-partition layouts, the
    analogue of the reference's ``span``-indexed vectors
    (``/root/reference/src/Graph.hxx:472``).

    Distributed: range-partitioned sort + per-partition window + offset
    cascade (``operators.graph.dense_ids``) — no single-partition window, no
    Python row serialization. One pass, once per corpus version; all
    iterative work downstream uses the long ids only.
    """
    from ..operators.graph import dense_ids

    spark = pages.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return dense_ids(pages.select("url").distinct(), "url", p, out_col="id")


def pages_to_edges(
    pages: DataFrame, dictionary: DataFrame | None = None,
    canonicalize: bool = False, drop_nofollow: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """Full front-end: pages -> (edges(src,dst), dictionary(url,id)).

    Links pointing outside the corpus (dst url not a page) are dropped —
    the graph is closed over the crawl, matching the reference's
    pre-added-vertex model (``/root/reference/src/mtx.hxx:61-63``).
    Dedup mirrors ``LazyBitset.update()`` set-union semantics
    (``/root/reference/src/_bitset.hxx:179-201``).

    ``canonicalize=True`` runs ``functions.urls.canonicalize_url`` over
    page urls AND extracted link endpoints before the dictionary join,
    so syntactic URL variants (www., default ports, tracking params,
    fragments, case) collapse to ONE vertex instead of splitting rank
    mass. Off by default: the byte-identical-text-per-url contract is
    stated on raw urls, and canonicalization is a pure scan-stage
    projection, so opting in adds no shuffle.

    ``drop_nofollow=True`` excludes links whose ``rel`` contains
    ``nofollow`` from edge building — the endorsement semantic real
    PageRank pipelines honor.
    """
    if canonicalize:
        from ..functions.urls import canonicalize_url

        pages = pages.withColumn("url", canonicalize_url(F.col("url")))
    d = dictionary if dictionary is not None else url_dictionary(pages)
    # mapInArrow extractor: byte-identical to extract_links, measured
    # equal-or-faster (zero-copy page slices; the gap widens with page size)
    links = extract_links_arrow(pages, drop_nofollow=drop_nofollow)
    if canonicalize:
        from ..functions.urls import canonicalize_url

        links = links.select(
            canonicalize_url(F.col("src_url")).alias("src_url"),
            canonicalize_url(F.col("dst_url")).alias("dst_url"))
    src_d = d.select(F.col("url").alias("src_url"), F.col("id").alias("src"))
    dst_d = d.select(F.col("url").alias("dst_url"), F.col("id").alias("dst"))
    edges = (
        links.join(src_d, "src_url")
        .join(dst_d, "dst_url")
        .select("src", "dst")
        .dropDuplicates(["src", "dst"])
    )
    return edges, d


def extracted_text(pages: DataFrame) -> DataFrame:
    """Byte-identical text passthrough per url (projection only — Catalyst
    prunes the scan to two columns; nothing touches the bytes)."""
    return pages.select("url", "text")
