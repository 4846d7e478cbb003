"""URL canonicalization for web-corpus hygiene.

Pretraining crawls key documents by URL; the same page arrives under
scheme-case variants, default ports, userinfo, fragments, tracking
parameters (utm_*, gclid, ...) and shuffled query order. Canonical-URL
dedup is the cheapest, highest-yield dedup pass in a web pipeline — it
runs before any content hashing and removes the bulk of crawl dups with
a plain groupBy on the canonical string.

Everything here is a zero-shuffle native-Column mapper (regexp_extract /
filter / array_sort — no Python, no UDF), so at 100 TB it fuses into the
scan's whole-stage codegen. Patterns are dialect-portable (no lookahead/
lookbehind), letting the DuckDB oracle replay the pipeline verbatim —
the same contract as functions/text.with_pii_scrubbed.

Canonical form (RFC 3986 normalizations + crawl conventions):
  - scheme and host lowercased; userinfo and fragment dropped
  - default ports removed (http:80, https:443); other ports kept
  - empty path -> "/"; a single trailing "/" stripped from non-root paths
  - tracking params dropped (utm_*, fbclid, gclid, msclkid, mc_eid,
    igshid by default), remaining params sorted lexicographically

The fragment is stripped BEFORE query/path extraction: a '?' that only
appears inside the fragment (http://h/p#frag?x=1) is fragment text, not
a query string (RFC 3986 §3: query ends at the first '#'). Bare `ref`
is NOT in the default strip list — unlike utm_*/gclid it routes to
distinct pages on some sites (git refs, store referrers), so stripping
it would wrongly collapse them; pass `tracking_params` to opt in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# default strip list: unambiguous click/campaign trackers only
DEFAULT_TRACKING_PARAMS = (
    "utm_[A-Za-z0-9_]*",
    "fbclid",
    "gclid",
    "msclkid",
    "mc_eid",
    "igshid",
)


def tracking_param_re(params: tuple[str, ...] = DEFAULT_TRACKING_PARAMS) -> str:
    """One alternation, applied per query parameter (key=value or bare
    key). Entries are regex fragments (no anchors, no groups needed)."""
    return "^(" + "|".join(params) + ")(=.*)?$"


# one alternation, applied per query parameter (key=value or bare key)
TRACKING_PARAM_RE = tracking_param_re()

_SCHEME_RE = "^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = "^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_PATH_RE = "^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
_QUERY_RE = r"\?([^#]*)"
_PORT_RE = ":([0-9]+)$"


def with_canonical_url(
    df: DataFrame,
    url: str = "url",
    out: str = "canonical_url",
    tracking_params: tuple[str, ...] = DEFAULT_TRACKING_PARAMS,
) -> DataFrame:
    """Adds `scheme`, `host`, `port` (string, '' when defaulted/absent),
    `path_norm`, `n_params_kept`, `n_tracking_stripped`, and `out` (the
    canonical URL). Rows whose value does not look like an absolute
    http(s)-style URL (no scheme://) get NULL canonical_url and host ''.
    `tracking_params` overrides the strip list (regex fragments matched
    against whole param keys — e.g. add "ref" for crawls where it is a
    known tracker).
    """
    strip_re = tracking_param_re(tracking_params)
    # fragment first: everything after the first '#' is never query/path
    u = F.regexp_replace(F.col(url), "#.*$", "")
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    authority = F.regexp_extract(u, _AUTHORITY_RE, 1)
    hostport = F.regexp_replace(authority, "^[^@]*@", "")
    rawport = F.regexp_extract(hostport, _PORT_RE, 1)
    host = F.lower(F.regexp_replace(hostport, _PORT_RE, ""))
    is_default = (
        ((scheme == "http") & (rawport == "80"))
        | ((scheme == "https") & (rawport == "443"))
    )
    port = F.when(is_default, F.lit("")).otherwise(rawport)
    path0 = F.regexp_extract(u, _PATH_RE, 1)
    path1 = F.when(path0 == "", F.lit("/")).otherwise(
        F.regexp_replace(path0, "/$", "")
    )
    path_norm = F.when(path1 == "", F.lit("/")).otherwise(path1)
    query = F.regexp_extract(u, _QUERY_RE, 1)
    params = F.filter(F.split(query, "&"), lambda x: x != "")
    kept = F.array_sort(F.filter(params, lambda x: ~x.rlike(strip_re)))
    n_kept = F.size(kept)
    n_stripped = F.size(params) - n_kept
    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(port == "", F.lit("")).otherwise(F.concat(F.lit(":"), port)),
        path_norm,
        F.when(n_kept > 0, F.concat(F.lit("?"), F.array_join(kept, "&"))).otherwise(
            F.lit("")
        ),
    )
    ok = scheme != ""
    return (
        df.withColumn("scheme", scheme)
        .withColumn("host", F.when(ok, host).otherwise(F.lit("")))
        .withColumn("port", port)
        .withColumn("path_norm", path_norm)
        .withColumn("n_params_kept", F.when(ok, n_kept).otherwise(F.lit(0)))
        .withColumn(
            "n_tracking_stripped", F.when(ok, n_stripped).otherwise(F.lit(0))
        )
        .withColumn(out, F.when(ok, canon))
    )


def domain_stats(
    df: DataFrame, url: str = "url", doc_id: str = "doc_id"
) -> DataFrame:
    """Per-host crawl-hygiene profile: row count, distinct canonical
    URLs (the post-dedup size), dup factor, tracking-param pressure.
    One hash-agg exchange on `host` — the map-side partial keeps the
    shuffle at |hosts| rows, and host cardinality is ~1e7 web-wide, far
    below the doc count, so the agg never anti-scales."""
    c = with_canonical_url(df, url=url)
    return c.groupBy("host").agg(
        F.count("*").alias("n_docs"),
        F.countDistinct("canonical_url").alias("n_canonical"),
        F.sum("n_tracking_stripped").alias("n_tracking_stripped"),
        F.min("canonical_url").alias("sample_canonical"),
    )
