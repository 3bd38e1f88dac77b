"""URL parsing & canonicalization — the crawl-side normalization every
link graph needs BEFORE vertex-id assignment.

Not a reference operator (the reference consumes pre-built .mtx graphs,
``/root/reference/src/main.cxx``); in the pages→edges pipeline this
engine runs (``sources/pages.py``), the same document is reachable
under syntactic URL variants (case-folded scheme/host, default ports,
``www.`` prefixes, fragments, tracking query parameters, shuffled query
order), and every variant that survives becomes a spurious vertex that
splits PageRank mass. Canonicalization collapses them — the
string-level complement to the redirect-chain collapse in
``plans/chains.py``.

Rules applied (the conservative, semantics-preserving subset of RFC
3986 §6 plus the universal tracking-param strip):

- scheme and host are case-folded; path/query case is preserved
- a leading ``www.`` host label is dropped (optional)
- default ports are dropped (``:80`` for http, ``:443`` for https)
- the fragment is dropped (never sent to the server)
- tracking parameters are removed: any ``utm_*`` plus the common
  click-id set (gclid/fbclid/msclkid/igshid/mc_cid/mc_eid/ref)
- surviving query parameters are sorted (order is almost never
  semantic; sorting makes equal parameter SETS compare equal); the
  query is taken strictly from the pre-fragment prefix — a ``?``
  inside the fragment (SPA hash routes) is never promoted to a query
- an empty path becomes ``/``
- URLs with userinfo in the authority (``user[:pass]@host``) pass
  through UNCHANGED: credentials affect the fetch, so rewriting them
  is not semantics-preserving (``url_parts`` still reports the true
  host/port for them)

Execution shape: pure column expressions — ``regexp_extract`` for the
RFC 3986 component split, ``split``/``filter``/``array_sort``/
``array_join`` for the query rewrite. Everything stays inside
whole-stage codegen; no UDF, no shuffle (a scan-stage projection), so
it composes with the extraction scan at 100 TB for free.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# any utm_* plus the common click-/mail-tracking ids; kept as one regex
# so both the Spark filter lambda and the DuckDB oracle share it
TRACKING_PARAM_RE = r"^(utm_[^=]*|gclid|fbclid|msclkid|igshid|mc_cid|mc_eid|ref)="

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
# the query lives strictly BEFORE the fragment: anchor the scan to the
# pre-'#' prefix, or a '?' inside a fragment (SPA hash routes like
# https://h/#/route?tab=1) would be mis-parsed as a real query and
# canonicalization would fabricate a URL the server never saw
_QUERY_RE = r"^[^#]*?\?([^#]*)"


def url_parts(url: Column) -> dict[str, Column]:
    """RFC 3986 component split as pure column expressions: scheme,
    userinfo (no '@', '' if absent), host (lowercased, userinfo/port
    stripped), port (string, '' if absent), path, query (no '?'),
    fragment (no '#')."""
    auth = F.regexp_extract(url, _AUTH_RE, 1)
    # authority = [userinfo@]host[:port] — strip userinfo before the
    # host/port split or user:pass@example.com parses host='user'
    hostport = F.regexp_replace(auth, r"^[^@]*@", "")
    return {
        "scheme": F.lower(F.regexp_extract(url, _SCHEME_RE, 1)),
        "userinfo": F.regexp_extract(auth, r"^([^@]*)@", 1),
        "host": F.lower(F.regexp_extract(hostport, r"^([^:]*)", 1)),
        "port": F.regexp_extract(hostport, r":([0-9]+)$", 1),
        "path": F.regexp_extract(url, _PATH_RE, 1),
        "query": F.regexp_extract(url, _QUERY_RE, 1),
        "fragment": F.regexp_extract(url, r"#(.*)$", 1),
    }


# common country-code second-level suffixes (co.uk-style): hosts ending
# in one of these need THREE labels for the registrable domain. A full
# public-suffix list would be loaded from disk on a real deployment;
# this literal subset covers the high-traffic ccSLDs and keeps the
# expression dependency-free and JVM-side.
_CCSLD_RE = (r"\.(?:co|com|org|net|ac|gov|edu|ne|or)"
             r"\.(?:uk|au|jp|nz|za|br|in|mx|kr|id|th|il|sg|tr)$")


def registered_domain(host: Column) -> Column:
    """Heuristic registrable domain: the last two dot-labels
    (``a.b.example.com`` → ``example.com``), except under a known
    ccSLD public suffix (``co.uk`` etc.) where three labels are taken
    (``www.example.co.uk`` → ``example.co.uk``). Dependency-free
    approximation of the public-suffix list."""
    return F.when(
        host.rlike(_CCSLD_RE),
        F.regexp_extract(host, r"([^.]+\.[^.]+\.[^.]+)$", 1),
    ).otherwise(F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1))


def canonicalize_url(url: Column, strip_www: bool = True) -> Column:
    """Canonical form of ``url`` per the module rules — a single column
    expression (JVM-side, codegen-friendly)."""
    p = url_parts(url)
    host = p["host"]
    if strip_www:
        host = F.regexp_replace(host, r"^www\.", "")
    default_port = (
        ((p["scheme"] == "http") & (p["port"] == "80"))
        | ((p["scheme"] == "https") & (p["port"] == "443"))
        | (p["port"] == "")
    )
    port = F.when(default_port, F.lit("")).otherwise(
        F.concat(F.lit(":"), p["port"]))
    kept = F.array_join(
        F.array_sort(F.filter(
            F.split(p["query"], "&"),
            lambda kv: (kv != "") & ~kv.rlike(TRACKING_PARAM_RE))),
        "&")
    query = F.when(kept == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), kept))
    path = F.when(p["path"] == "", F.lit("/")).otherwise(p["path"])
    # strings that are not scheme://... URLs pass through untouched —
    # lets the column run over raw crawl data without corrupting
    # relative links or garbage rows (and keeps the rewrite idempotent).
    # URLs with userinfo in the authority ('@') also pass through:
    # credentials affect the fetch, so rewriting them is not
    # semantics-preserving — the conservative contract of this module.
    has_userinfo = F.regexp_extract(url, _AUTH_RE, 1).contains("@")
    return F.when((p["scheme"] == "") | has_userinfo, url).otherwise(
        F.concat(p["scheme"], F.lit("://"), host, port, path, query))


def canonicalize_urls(df: DataFrame, url_col: str = "url",
                      out_col: str = "canonical_url",
                      strip_www: bool = True) -> DataFrame:
    """Add ``out_col`` (canonical URL), ``host`` and
    ``registered_domain`` columns. A scan-stage projection — no
    shuffle; dedup on the canonical column is the caller's one
    hash-shuffle, exactly like ``sources/pages.pages_to_edges``."""
    p = url_parts(F.col(url_col))
    host = F.regexp_replace(p["host"], r"^www\.", "") if strip_www \
        else p["host"]
    return df.withColumn(out_col, canonicalize_url(F.col(url_col),
                                                   strip_www=strip_www)) \
        .withColumn("host", host) \
        .withColumn("registered_domain", registered_domain(host))
