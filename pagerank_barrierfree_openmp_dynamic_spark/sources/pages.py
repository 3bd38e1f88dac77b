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

_LINKS_SCHEMA = "src_url string, dst_url string"


def extract_links(pages: DataFrame) -> DataFrame:
    """``(url, html, ...)`` -> ``(src_url, dst_url)``, one row per anchor.

    Vectorized per Arrow batch: regex runs on raw bytes (no decode needed),
    duplicates within a page are kept (deduped later at the edge level).
    Column pruning: only url+html are read from the scan.
    """

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls: list[str] = []
            dsts: list[str] = []
            for u, h in zip(pdf["url"].to_numpy(), pdf["html"].to_numpy()):
                if h is None:
                    continue
                for m in _HREF_RE.findall(bytes(h)):
                    urls.append(u)
                    dsts.append(m.decode("utf-8", "replace"))
            yield pd.DataFrame({"src_url": urls, "dst_url": dsts})

    return pages.select("url", "html").mapInPandas(_extract, schema=_LINKS_SCHEMA)


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
    pages: DataFrame, dictionary: DataFrame | None = None
) -> tuple[DataFrame, DataFrame]:
    """Full front-end: pages -> (edges(src,dst), dictionary(url,id)).

    Links pointing outside the corpus (dst url not a page) are dropped —
    the graph is closed over the crawl, matching the reference's
    pre-added-vertex model (``/root/reference/src/mtx.hxx:61-63``).
    Dedup mirrors ``LazyBitset.update()`` set-union semantics
    (``/root/reference/src/_bitset.hxx:179-201``).
    """
    d = dictionary if dictionary is not None else url_dictionary(pages)
    links = extract_links(pages)
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
