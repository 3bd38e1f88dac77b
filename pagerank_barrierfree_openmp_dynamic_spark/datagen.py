"""Deterministic synthetic Common-Crawl-style fixtures.

Mirrors the reference's experimental corpus shape (web crawls with power-law
degree skew, ``/root/reference/main.sh:75-87``) at small scale, per
FIXTURES.md: the link structure is generated **first** as an edge list, then
rendered into HTML, so extraction output is exactly checkable and the
``text`` column can be asserted byte-identical per url through the pipeline.

Everything is seeded — no external data, no wall-clock dependence.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

# Everything but the key is nullable: real crawls have pages with missing
# html/text/lang, and the extractor must tolerate them.
PAGES_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

EDGES_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType(), False),
        T.StructField("dst", T.LongType(), False),
    ]
)

_LANGS = ["en", "de", "fr", "es", "hi"]
_WORDS = (
    "graph rank vertex edge crawl page link web damping frontier barrier "
    "batch update spark arrow shuffle partition iterate converge teleport"
).split()


def url_of(vid: int, n_sites: int = 16) -> str:
    """Vertex id -> deterministic url (site chosen by id modulo)."""
    return f"https://site{vid % n_sites}.example/p{vid}"


def text_of(vid: int) -> str:
    """Deterministic pseudo-text for a page; byte-identity checked end-to-end."""
    rng = np.random.default_rng(vid * 2654435761 % (2**32))
    k = 8 + int(rng.integers(0, 24))
    words = [_WORDS[int(i)] for i in rng.integers(0, len(_WORDS), k)]
    return f"page {vid}: " + " ".join(words)


def lang_of(vid: int) -> str:
    return _LANGS[(vid * 11) % len(_LANGS)]


def tiny_edges() -> list[tuple[int, int]]:
    """Hand-computable 10-vertex graph: a hub (0), a cycle, a dead end (7),
    an isolated vertex (9, appears only as a page), two triangles."""
    return [
        (0, 1), (0, 2), (0, 3), (0, 4),
        (1, 2), (2, 0), (3, 0), (4, 5),
        (5, 6), (6, 4),          # cycle 4-5-6
        (1, 7),                  # 7 is a dead end (self-loop added by engine)
        (8, 0), (8, 1),
        (1, 0),                  # triangle 0-1-2 both ways-ish
        (2, 1), (3, 4), (4, 3),
    ]


def synth_edges(n: int, seed: int = 42, avg_deg: float = 8.0) -> pd.DataFrame:
    """Seeded power-law digraph with planted structures.

    - out-degrees ~ Zipf (capped) — hub sources, like web crawls;
    - dsts ~ Zipf over ids — hub destinations (high in-degree skew);
    - last 10% of ids form a second, disconnected block (for CC tests);
    - a few planted directed 3-cliques (for triangle counting);
    - dead ends and never-linked ids occur naturally.
    """
    rng = np.random.default_rng(seed)
    n_iso = max(1, n // 10)          # isolated block
    n_main = n - n_iso
    m = int(n * avg_deg)

    def zipf_ids(size: int, lo: int, hi: int) -> np.ndarray:
        z = rng.zipf(1.5, size=size)
        return lo + ((z - 1) % (hi - lo))

    src_main = zipf_ids(m, 0, n_main)
    dst_main = zipf_ids(m, 0, n_main)
    m2 = int(n_iso * avg_deg / 2) + 1
    src_iso = rng.integers(n_main, n, m2)
    dst_iso = rng.integers(n_main, n, m2)

    src = np.concatenate([src_main, src_iso])
    dst = np.concatenate([dst_main, dst_iso])
    keep = src != dst
    src, dst = src[keep], dst[keep]

    # Planted directed 3-cliques (both directions) for triangle counting.
    tri_src, tri_dst = [], []
    for base in range(0, min(5, n_main // 4)):
        a, b, c = 4 * base, 4 * base + 1, 4 * base + 2
        for u, v in [(a, b), (b, c), (a, c)]:
            tri_src += [u, v]
            tri_dst += [v, u]
    src = np.concatenate([src, np.array(tri_src, dtype=np.int64)])
    dst = np.concatenate([dst, np.array(tri_dst, dtype=np.int64)])

    df = pd.DataFrame({"src": src.astype(np.int64), "dst": dst.astype(np.int64)})
    return df.drop_duplicates().reset_index(drop=True)


def render_pages_pdf(n: int, edges: pd.DataFrame, n_sites: int = 16, seed: int = 42) -> pd.DataFrame:
    """Render the pages table (pandas) from an edge list: page i's HTML embeds
    one ``<a href>`` per out-edge. Deterministic timestamps/text/lang."""
    out: dict[int, list[int]] = {}
    for s, d in zip(edges["src"].to_numpy(), edges["dst"].to_numpy()):
        out.setdefault(int(s), []).append(int(d))
    base = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)
    rows = []
    for vid in range(n):
        links = "".join(
            f'<a href="{url_of(d, n_sites)}">l{d}</a>' for d in sorted(out.get(vid, []))
        )
        txt = text_of(vid)
        html = f"<html><head><title>p{vid}</title></head><body><p>{txt}</p>{links}</body></html>"
        rows.append(
            (
                url_of(vid, n_sites),
                base + _dt.timedelta(seconds=vid * 37 % 86400, days=vid % 30),
                html.encode("utf-8"),
                txt,
                lang_of(vid),
            )
        )
    return pd.DataFrame(rows, columns=["url", "warc_ts", "html", "text", "lang"])


def pages_df(spark: SparkSession, scale: str = "tiny", seed: int = 42) -> DataFrame:
    """Synthetic pages table at a named scale: tiny (10), small (~1k), bench (~100k)."""
    if scale == "tiny":
        n, edges = 10, pd.DataFrame(tiny_edges(), columns=["src", "dst"])
    elif scale == "small":
        n = 1000
        edges = synth_edges(n, seed)
    elif scale == "bench":
        n = 100_000
        edges = synth_edges(n, seed)
    else:
        raise ValueError(f"unknown scale {scale!r}")
    pdf = render_pages_pdf(n, edges, seed=seed)
    return spark.createDataFrame(pdf, schema=PAGES_SCHEMA)


def edges_df(spark: SparkSession, scale: str = "tiny", seed: int = 42) -> DataFrame:
    """The ground-truth edge list behind :func:`pages_df` (same seed/scale)."""
    if scale == "tiny":
        pdf = pd.DataFrame(tiny_edges(), columns=["src", "dst"])
    else:
        pdf = synth_edges({"small": 1000, "bench": 100_000}[scale], seed)
    return spark.createDataFrame(pdf, schema=EDGES_SCHEMA)


def links_of(vid: int, n: int, avg_deg: int = 8) -> list[int]:
    """Deterministic out-links of page ``vid`` in the distributed corpus —
    a pure function, so pages AND ground-truth edges generate
    partition-locally with no driver materialization. Skewed: every page
    also links into a small hub set (ids < n/100), giving the hub
    in-degree skew of real crawls."""
    h = (vid * 2654435761 + 97) & 0xFFFFFFFF
    deg = 1 + h % (2 * avg_deg)
    out = {(vid * 31 + (k + 1) * 1000003 + (h >> (k % 13))) % n for k in range(deg)}
    out.add(h % max(1, n // 100))  # hub link (skew)
    out.discard(vid)
    return sorted(out)


def pages_df_dist(spark: SparkSession, n: int, n_sites: int = 64,
                  partitions: int | None = None) -> DataFrame:
    """Distributed synthetic pages table: html/text rendered inside
    mapInPandas from :func:`links_of` — scales to millions of pages."""
    base = _dt.datetime(2024, 1, 1, tzinfo=_dt.timezone.utc)

    def gen(batches):
        import pandas as _pd

        for pdf in batches:
            rows = []
            for vid in pdf["id"].to_numpy():
                vid = int(vid)
                links = "".join(
                    f'<a href="{url_of(d, n_sites)}">l{d}</a>'
                    for d in links_of(vid, n)
                )
                txt = text_of(vid)
                html = (f"<html><head><title>p{vid}</title></head>"
                        f"<body><p>{txt}</p>{links}</body></html>")
                rows.append(
                    (url_of(vid, n_sites),
                     base + _dt.timedelta(seconds=vid * 37 % 86400, days=vid % 30),
                     html.encode("utf-8"), txt, lang_of(vid))
                )
            yield _pd.DataFrame(
                rows, columns=["url", "warc_ts", "html", "text", "lang"])

    p = partitions or spark.sparkContext.defaultParallelism
    return spark.range(0, n, 1, p).mapInPandas(gen, PAGES_SCHEMA)


def edges_df_dist(spark: SparkSession, n: int,
                  partitions: int | None = None) -> DataFrame:
    """Ground-truth edge list matching :func:`pages_df_dist` (same
    :func:`links_of`), generated distributively."""

    def gen(batches):
        import pandas as _pd

        for pdf in batches:
            srcs, dsts = [], []
            for vid in pdf["id"].to_numpy():
                for d in links_of(int(vid), n):
                    srcs.append(int(vid))
                    dsts.append(d)
            yield _pd.DataFrame({"src": srcs, "dst": dsts})

    p = partitions or spark.sparkContext.defaultParallelism
    return spark.range(0, n, 1, p).mapInPandas(gen, EDGES_SCHEMA)


def random_batch(
    edges: pd.DataFrame, frac: float, seed: int = 7
) -> pd.DataFrame:
    """Seeded delete-then-reinsert batch, mirroring the reference protocol
    (``/root/reference/main.cxx:38-66``, README.md:49-51): pick ``frac·|E|``
    existing edges to delete, then re-insert the same edges.

    Returns columns (src, dst, op) with op in {'del','ins'}.
    """
    rng = np.random.default_rng(seed)
    k = max(1, int(len(edges) * frac))
    idx = rng.choice(len(edges), size=k, replace=False)
    dels = edges.iloc[idx][["src", "dst"]].copy()
    dels["op"] = "del"
    ins = dels.copy()
    ins["op"] = "ins"
    return pd.concat([dels, ins], ignore_index=True)
