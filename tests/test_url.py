"""URL canonicalization vs hand-derived goldens (functions/url.py)."""

import pytest
from pyspark.sql import functions as F

from tile_grid_spark.functions.url import domain_stats, with_canonical_url

CASES = [
    # (url, canonical, host, n_kept, n_stripped)
    (
        "HTTPS://WWW.Example.COM:443/Path/?utm_source=x&b=2&a=1#frag",
        "https://www.example.com/Path?a=1&b=2",
        "www.example.com",
        2,
        1,
    ),
    (
        "http://user:pw@Site.ORG:8080/a/b/",
        "http://site.org:8080/a/b",
        "site.org",
        0,
        0,
    ),
    ("http://h.com:80", "http://h.com/", "h.com", 0, 0),
    ("https://h.com/?gclid=g1&fbclid=f&utm_campaign=c", "https://h.com/", "h.com", 0, 3),
    # bare `ref` is NOT stripped by default (meaningful routing param
    # on some sites — git refs, store referrers); see custom-list test
    ("https://h.com/p?ref&z", "https://h.com/p?ref&z", "h.com", 2, 0),
    # '?' inside the fragment is fragment text, never a query string
    ("http://h.com/p#frag?x=1", "http://h.com/p", "h.com", 0, 0),
    ("http://h.com#frag?utm_source=x", "http://h.com/", "h.com", 0, 0),
    # root path stays '/', lone trailing slash not doubled-stripped
    ("https://h.com/", "https://h.com/", "h.com", 0, 0),
    # utm_ prefix family
    ("https://h.com/p?utm_x_y=1&id=2", "https://h.com/p?id=2", "h.com", 1, 1),
    # not an absolute URL -> null canonical
    ("not a url", None, "", 0, 0),
    ("/relative/path?utm_source=x", None, "", 0, 0),
]


class TestCanonicalUrl:
    @pytest.fixture(scope="class")
    def got(self, spark):
        df = spark.createDataFrame([(i, u) for i, (u, *_) in enumerate(CASES)], "i INT, url STRING")
        return {r.i: r for r in with_canonical_url(df).collect()}

    def test_goldens(self, got):
        for i, (u, canon, host, n_kept, n_stripped) in enumerate(CASES):
            r = got[i]
            assert r.canonical_url == canon, u
            assert r.host == host, u
            assert r.n_params_kept == n_kept, u
            assert r.n_tracking_stripped == n_stripped, u

    def test_case_and_order_variants_collide(self, spark):
        # the point of the op: crawl variants of one page share a key
        variants = [
            "https://EXAMPLE.com/page?b=2&a=1",
            "HTTPS://example.COM:443/page/?a=1&b=2#x",
            "https://bot@example.com/page?a=1&utm_medium=email&b=2",
        ]
        df = spark.createDataFrame([(u,) for u in variants], "url STRING")
        canon = with_canonical_url(df).select("canonical_url").distinct().collect()
        assert len(canon) == 1
        assert canon[0].canonical_url == "https://example.com/page?a=1&b=2"

    def test_custom_tracking_list_strips_ref(self, spark):
        # crawls where `ref` IS a tracker can opt in via tracking_params
        from tile_grid_spark.functions.url import DEFAULT_TRACKING_PARAMS

        df = spark.createDataFrame([("https://h.com/p?ref=promo&z=1",)], "url STRING")
        r = with_canonical_url(
            df, tracking_params=DEFAULT_TRACKING_PARAMS + ("ref", "ref_src")
        ).collect()[0]
        assert r.canonical_url == "https://h.com/p?z=1"
        assert r.n_tracking_stripped == 1

    def test_zero_shuffle_mapper(self, spark):
        df = spark.createDataFrame([("https://a.com/x",)], "url STRING")
        plan = with_canonical_url(df)._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan

    def test_domain_stats_single_exchange(self, spark):
        df = spark.createDataFrame(
            [(i, f"https://d{i % 2}.com/p?utm_source=s&k={i}") for i in range(8)],
            "doc_id BIGINT, url STRING",
        )
        out = domain_stats(df)
        rows = {r.host: r for r in out.collect()}
        assert rows["d0.com"].n_docs == 4
        assert rows["d0.com"].n_canonical == 4  # k differs -> no dups
        assert rows["d0.com"].n_tracking_stripped == 4
        # AQE toString repeats the plan ("Final Plan" + "Initial Plan");
        # count exchanges in the final section only. countDistinct is the
        # standard two-phase rewrite: one exchange on (host, canonical)
        # for the distinct, one on host for the final agg — both short
        # string keys, no third shuffle.
        plan = out._jdf.queryExecution().executedPlan().toString()
        final = plan.split("== Initial Plan ==")[0]
        assert final.count("Exchange hashpartitioning") <= 2, final
