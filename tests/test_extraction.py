"""Link extraction: pages -> edges, byte-identical text passthrough."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from pagerank_barrierfree_openmp_dynamic_spark import datagen
from pagerank_barrierfree_openmp_dynamic_spark.sources.pages import (
    extracted_text,
    pages_to_edges,
    url_dictionary,
)


@pytest.fixture(scope="module")
def tiny_pages(spark):
    return datagen.pages_df(spark, "tiny").cache()


def test_dictionary_dense_ids(spark, tiny_pages):
    d = url_dictionary(tiny_pages).toPandas()
    assert sorted(d["id"]) == list(range(10))
    assert d["url"].is_unique


def test_extracted_edges_match_ground_truth(spark, tiny_pages):
    edges, d = pages_to_edges(tiny_pages)
    dmap = dict(url_dictionary(tiny_pages).toPandas()[["url", "id"]].values)
    truth = {
        (dmap[datagen.url_of(s)], dmap[datagen.url_of(t)])
        for s, t in datagen.tiny_edges()
    }
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == truth


def test_text_byte_identical_per_url(spark, tiny_pages):
    out = extracted_text(tiny_pages).toPandas().set_index("url")["text"]
    src = tiny_pages.select("url", "text").toPandas().set_index("url")["text"]
    for url, t in src.items():
        assert out[url].encode("utf-8") == t.encode("utf-8")


def test_small_scale_extraction_roundtrip(spark):
    pages = datagen.pages_df(spark, "small")
    edges, d = pages_to_edges(pages)
    truth_pdf = datagen.synth_edges(1000, seed=42)
    dmap = dict(d.toPandas()[["url", "id"]].values)
    truth = {
        (dmap[datagen.url_of(int(s))], dmap[datagen.url_of(int(t))])
        for s, t in truth_pdf.itertuples(index=False)
    }
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == truth


def test_extract_links_arrow_byte_identical(spark):
    """mapInArrow fast path emits exactly the pandas path's rows (same
    multiset — order within a page preserved per partition)."""
    from pagerank_barrierfree_openmp_dynamic_spark.sources.pages import (
        extract_links,
        extract_links_arrow,
    )
    from pagerank_barrierfree_openmp_dynamic_spark import datagen

    pages = datagen.pages_df(spark, "small")
    # add a null-html and an empty-html page to exercise the mask/slice paths
    import pandas as pd

    extra = spark.createDataFrame(pd.DataFrame({
        "url": ["x://null", "x://empty"],
        "warc_ts": pd.to_datetime(["2026-01-01", "2026-01-01"]),
        "html": [None, b""],
        "text": ["", ""],
        "lang": ["en", "en"],
    }), schema=pages.schema)
    pages = pages.unionByName(extra)
    a = extract_links(pages).toPandas()
    b = extract_links_arrow(pages).toPandas()
    key = lambda d: sorted(map(tuple, d.to_numpy()))  # noqa: E731
    assert key(a) == key(b)
    assert len(a) > 0


# --- anchor-text extraction (sources/pages.py:extract_anchors) ---

def test_extract_anchors_matches_links_and_ground_truth(spark):
    from pagerank_barrierfree_openmp_dynamic_spark import datagen
    from pagerank_barrierfree_openmp_dynamic_spark.sources.pages import (
        anchor_terms,
        extract_anchors,
        extract_links,
    )

    pages = datagen.pages_df(spark, "tiny")
    anchors = extract_anchors(pages).collect()
    links = {(r.src_url, r.dst_url)
             for r in extract_links(pages).collect()}
    # every datagen anchor is well-formed, so the pair sets agree exactly
    assert {(r.src_url, r.dst_url) for r in anchors} == links
    # datagen renders anchor text 'l{dst_vertex}' per out-edge
    for r in anchors:
        assert r.anchor.startswith("l")
    terms = anchor_terms(
        extract_anchors(pages)).collect()
    # term counts == inbound multiplicity of each dst in the raw link table
    from collections import Counter
    want = Counter()
    for s, d in [(r.src_url, r.dst_url)
                 for r in extract_links(pages).collect()]:
        want[d] += 1
    got = Counter()
    for r in terms:
        got[r.dst_url] += r.cnt
    assert got == want


def test_anchor_nested_markup_and_topk(spark):
    from pagerank_barrierfree_openmp_dynamic_spark.sources.pages import (
        anchor_terms,
        extract_anchors,
    )

    pages = spark.createDataFrame(
        [
            ("u0", b'<a href="t"><b>Big  News</b> today</a>'
                   b'<a href="t">news</a><a href="t">news</a>'),
            ("u1", b'<a href="t">other</a><a href="x">unclosed'),
        ],
        "url string, html binary",
    )
    rows = extract_anchors(pages).collect()
    # nested tags stripped, whitespace collapsed
    assert "Big News today" in [r.anchor for r in rows]
    # unclosed <a> dropped (no anchor text exists)
    assert ("u1", "x") not in {(r.src_url, r.dst_url) for r in rows}
    top = anchor_terms(extract_anchors(pages), top_k=1).collect()
    t_rows = [r for r in top if r.dst_url == "t"]
    # 'news' appears 3x (1 from nested-markup anchor lowercased + 2 plain)
    assert len(t_rows) == 1
    assert t_rows[0].term == "news" and t_rows[0].cnt == 3


def test_pages_to_edges_canonicalize_collapses_variants(spark):
    """canonicalize=True collapses syntactic URL variants (www., default
    ports, tracking params, fragments, case) into ONE vertex before the
    dictionary join."""
    pages = spark.createDataFrame(
        [
            # two raw pages that are the SAME canonical page
            ("https://WWW.A.com:443/p?utm_source=x",
             b'<a href="http://b.com/q#frag">to b</a>'),
            ("https://a.com/p",
             b'<a href="HTTP://B.com:80/q?gclid=1">to b again</a>'),
            ("http://b.com/q", b'<a href="https://a.com/p?utm_medium=m">back</a>'),
        ],
        "url string, html binary",
    ).withColumn("text", F.lit("t")).withColumn(
        "warc_ts", F.current_timestamp()).withColumn(
        "lang", F.lit("en"))
    edges, d = pages_to_edges(pages, canonicalize=True)
    dm = d.toPandas().set_index("url")["id"].to_dict()
    # 3 raw urls -> 2 canonical vertices
    assert set(dm) == {"https://a.com/p", "http://b.com/q"}
    got = {(r.src, r.dst) for r in edges.collect()}
    assert got == {(dm["https://a.com/p"], dm["http://b.com/q"]),
                   (dm["http://b.com/q"], dm["https://a.com/p"])}
    # default stays raw: 3 vertices, and variant-addressed links
    # don't resolve
    edges_raw, d_raw = pages_to_edges(pages)
    assert d_raw.count() == 3
    assert edges_raw.count() < len(got) + 1  # the variant links dangle



def test_drop_nofollow_links(spark):
    """rel=nofollow links are excluded only when requested, identically
    on the pandas and arrow paths; rel placement relative to href does
    not matter."""
    from pagerank_barrierfree_openmp_dynamic_spark.sources.pages import (
        extract_links, extract_links_arrow,
    )

    pages = spark.createDataFrame(
        [
            ("p1", b'<a href="kept1">k</a>'
                   b'<a rel="nofollow" href="dropped1">d</a>'
                   b'<a href="dropped2" rel="ugc nofollow">d</a>'
                   b'<a href="kept2" rel="author">k</a>'
                   b'<a href="kept3" rel="nofollowish">k</a>'),
            ("p2", b'<A HREF="kept4" REL="NOFOLLOW">case</A>'),
        ],
        "url string, html binary",
    )
    for fn in (extract_links, extract_links_arrow):
        default = {(r.src_url, r.dst_url) for r in fn(pages).collect()}
        assert default == {("p1", "kept1"), ("p1", "dropped1"),
                           ("p1", "dropped2"), ("p1", "kept2"),
                           ("p1", "kept3"), ("p2", "kept4")}
        dropped = {(r.src_url, r.dst_url)
                   for r in fn(pages, drop_nofollow=True).collect()}
        # rel="nofollowish" is NOT nofollow (word boundary); upper-case
        # REL=NOFOLLOW is
        assert dropped == {("p1", "kept1"), ("p1", "kept2"),
                           ("p1", "kept3")}
