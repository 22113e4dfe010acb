"""URL canonicalization and per-domain cap sampling — the CommonCrawl
curation shape (extension beyond the reference surface, north-star
operator family like `sampling`/`dedup`): crawl corpora arrive with the
same page under many URL spellings (case-mixed hosts, default ports,
tracking params, fragments, ``www.`` aliases) and with a handful of
domains contributing an outsized share of documents. Canonicalize first,
then cap documents per REGISTERED domain with the deterministic
``quota_sample`` machinery.

Scale design (100 TB): canonicalization is a pure codegen expression
stack (regexp extract/replace + one array filter over query params — no
UDF, no shuffle, composes with scan pruning); domain extraction is two
more expressions; the cap is ``quota_sample``'s one hash exchange on the
domain plus a per-stratum rank. Domains are the stratum cardinality
(~10⁶-10⁷ registered domains in a full crawl — each stratum fits a task;
the pathological mega-domain is exactly what the cap cuts). Every step is
md5/regexp-deterministic, so the DuckDB oracle replays the sample
row-for-row.

Reference parity note: the reference platform has no URL tooling; cited
conventions are public crawl-pipeline practice (CCNet/RefinedWeb-style
dedup keys: lowercase scheme+host, strip default port and fragment, drop
tracking parameters, fold the ``www.`` alias).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: query parameters dropped by canonicalization: the tracking families
#: public curation pipelines strip (utm_*, click ids, mail-campaign ids)
TRACKING_PARAM_RE = r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|msclkid|ref|mc_cid|mc_eid)="

#: second-level public suffixes recognized by registered_domain — the
#: high-traffic subset; a production deployment swaps in the full public
#: suffix list (publicsuffix.org) as a broadcast map
SECOND_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "co.in", "co.nz", "com.br", "com.cn", "com.mx",
)

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_AUTHORITY_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]*)"
_REST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^#]*)"


def url_canonicalize(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL, as one expression stack:

    * scheme and authority lowercased (path/query case is significant and
      kept);
    * default ports stripped (``:80`` for http, ``:443`` for https;
      non-default ports survive);
    * a leading ``www.`` host label folded away;
    * the fragment dropped;
    * tracking query parameters removed (:data:`TRACKING_PARAM_RE`),
      remaining parameters kept IN ORDER (sorting would merge URLs whose
      servers treat order as significant — out of scope on purpose);
    * an empty path normalized to ``/``.

    Everything is regexp/array expressions both engines evaluate
    identically — no UDF, no shuffle."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    auth = F.lower(F.regexp_extract(url, _AUTHORITY_RE, 1))
    host = (
        F.when(scheme == "http", F.regexp_replace(auth, ":80$", ""))
        .when(scheme == "https", F.regexp_replace(auth, ":443$", ""))
        .otherwise(auth)
    )
    host = F.regexp_replace(host, r"^www\.", "")
    rest = F.regexp_extract(url, _REST_RE, 1)  # path + query, no fragment
    path = F.regexp_extract(rest, r"^([^?]*)", 1)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(rest, r"\?(.*)$", 1)
    kept = F.filter(
        F.split(query, "&", -1),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE),
    )
    canon_q = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(canon_q != "", F.concat(F.lit("?"), canon_q)).otherwise(
            F.lit("")
        ),
    )


def url_host(canon_url: Column) -> Column:
    """Host of an already-canonical URL (no port, no ``www.``)."""
    return F.regexp_extract(canon_url, _AUTHORITY_RE, 1)


def registered_domain(host: Column) -> Column:
    """Registered (pay-level) domain of a host: the last two labels, or
    three when the two-label tail is a known second-level public suffix
    (``news.site.co.uk`` → ``site.co.uk``). Pure array expressions; hosts
    with < 2 labels (``localhost``) pass through unchanged."""
    parts = F.split(host, r"\.", -1)
    n = F.size(parts)
    last2 = F.concat_ws(".", F.element_at(parts, -2), F.element_at(parts, -1))
    last3 = F.concat_ws(
        ".", F.element_at(parts, -3), F.element_at(parts, -2),
        F.element_at(parts, -1),
    )
    is_sls = last2.isin(*SECOND_LEVEL_SUFFIXES)
    return (
        F.when(n <= 2, host)
        .when(is_sls & (n >= 3), last3)
        .otherwise(last2)
    )


def domain_cap_sample(
    df: DataFrame,
    *,
    url_col: str = "url",
    key: Column | None = None,
    cap: int = 1000,
    salt: str = "",
) -> DataFrame:
    """Cap documents per registered domain — canonicalize ``url_col``,
    extract the registered domain, and keep at most ``cap`` rows per
    domain (smallest md5 sampling keys win; deterministic, versionable by
    ``salt``). Adds ``url_canon`` and ``domain`` columns to the output.

    The mixture-control primitive crawl curation runs before dedup: a
    mega-domain (blogspot, wordpress) cannot dominate the corpus. One
    hash exchange on the domain + per-stratum rank (``quota_sample``);
    canonicalization and domain extraction ride the scan projection."""
    from proxima_platform_spark.functions.sampling import quota_sample

    if key is None:
        key = F.col(url_col)
    staged = df.withColumn("url_canon", url_canonicalize(F.col(url_col)))
    staged = staged.withColumn(
        "domain", registered_domain(url_host(F.col("url_canon")))
    )
    return quota_sample(
        staged, key=key, strata=F.col("domain"), quota=cap, salt=salt
    )
