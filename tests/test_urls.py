"""URL canonicalization + per-domain cap sampling (functions/urls.py) —
the CommonCrawl curation shape (VERDICT r06 #6)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from proxima_platform_spark.functions.urls import (
    domain_cap_sample,
    registered_domain,
    url_canonicalize,
    url_host,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], ["url"])
    out = df.select("url", url_canonicalize(F.col("url")).alias("c")).collect()
    return {r.url: r.c for r in out}


class TestUrlCanonicalize:
    def test_case_port_fragment_www(self, spark):
        got = _canon(spark, [
            "HTTP://WWW.Example.COM:80/Path/X#frag",
            "https://example.com:443/a",
            "https://example.com:8443/a",     # non-default port survives
            "http://news.example.com/a",      # non-www label survives
        ])
        assert got["HTTP://WWW.Example.COM:80/Path/X#frag"] == \
            "http://example.com/Path/X"       # path case preserved
        assert got["https://example.com:443/a"] == "https://example.com/a"
        assert got["https://example.com:8443/a"] == \
            "https://example.com:8443/a"
        assert got["http://news.example.com/a"] == \
            "http://news.example.com/a"

    def test_tracking_params_stripped_order_kept(self, spark):
        got = _canon(spark, [
            "http://e.com/p?utm_source=x&b=2&a=1&gclid=z",
            "http://e.com/p?utm_campaign=only",
            "http://e.com/p?keep=1",
            "http://e.com/p?",
        ])
        assert got["http://e.com/p?utm_source=x&b=2&a=1&gclid=z"] == \
            "http://e.com/p?b=2&a=1"          # order kept, not sorted
        assert got["http://e.com/p?utm_campaign=only"] == "http://e.com/p"
        assert got["http://e.com/p?keep=1"] == "http://e.com/p?keep=1"
        assert got["http://e.com/p?"] == "http://e.com/p"

    def test_empty_path_normalized(self, spark):
        got = _canon(spark, [
            "http://e.com",
            "http://e.com?x=1",
        ])
        assert got["http://e.com"] == "http://e.com/"
        assert got["http://e.com?x=1"] == "http://e.com/?x=1"

    def test_idempotent(self, spark):
        urls = [
            "HTTP://WWW.Example.COM:80/Path?utm_source=x&a=1#f",
            "https://news.site.co.uk/p?id=3",
        ]
        once = _canon(spark, urls)
        twice = _canon(spark, list(once.values()))
        assert all(twice[c] == c for c in once.values())


class TestRegisteredDomain:
    def test_suffix_rules(self, spark):
        hosts = [
            "news.site.co.uk", "site.co.uk", "a.b.site.com",
            "example.com", "localhost",
        ]
        df = spark.createDataFrame([(h,) for h in hosts], ["h"])
        got = {
            r.h: r.d
            for r in df.select(
                "h", registered_domain(F.col("h")).alias("d")
            ).collect()
        }
        assert got["news.site.co.uk"] == "site.co.uk"
        assert got["site.co.uk"] == "site.co.uk"
        assert got["a.b.site.com"] == "site.com"
        assert got["example.com"] == "example.com"
        assert got["localhost"] == "localhost"


class TestDomainCapSample:
    def test_cap_bites_and_is_deterministic(self, spark):
        rows = [
            (i, f"http://www.site{i % 3}.com/p/{i}?utm_source=x")
            for i in range(90)
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = domain_cap_sample(
            df, url_col="url", key=F.col("doc_id"), cap=10, salt="t"
        )
        got = out.groupBy("domain").count().collect()
        assert {r.domain for r in got} == {"site0.com", "site1.com",
                                           "site2.com"}
        assert all(r["count"] == 10 for r in got)
        again = sorted(r.doc_id for r in out.collect())
        assert again == sorted(r.doc_id for r in out.collect())

    def test_url_aliases_share_a_domain(self, spark):
        """www/case/port variants of one site all count against the same
        domain quota."""
        rows = [
            (1, "HTTP://WWW.Site.COM:80/a"),
            (2, "http://site.com/b"),
            (3, "https://news.site.com/c"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, url string")
        out = domain_cap_sample(df, url_col="url", key=F.col("doc_id"),
                                cap=2, salt="t")
        assert out.count() == 2
        assert {r.domain for r in out.collect()} == {"site.com"}

    def test_no_shuffle_in_canonicalization(self, spark):
        """Canonicalize + domain extraction alone must be a pure
        projection (no exchange, no UDF)."""
        df = spark.createDataFrame([(1, "http://e.com/a")],
                                   "doc_id long, url string")
        proj = df.select(
            url_canonicalize(F.col("url")).alias("c")
        ).withColumn("d", registered_domain(url_host(F.col("c"))))
        plan = proj._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        for bad in ("BatchEvalPython", "ArrowEvalPython"):
            assert bad not in plan
