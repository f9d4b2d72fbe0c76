"""URL canonicalization — the web-crawl dedup key normalizer.

Crawl pipelines (CCNet / RefinedWeb style) dedup by URL before any
content hashing; that only works if syntactic variants of the same
resource map to one key. Canonicalization implemented here, all as
codegen'd column expressions (regexp + array HOFs, zero UDF):

- lowercase scheme and host;
- strip default ports (``:80`` for http, ``:443`` for https);
- drop the fragment;
- drop tracking parameters (``utm_*``, ``fbclid``, ``gclid``, ``ref``);
- sort the surviving query parameters (order-insensitive key).

Map-only — the canonicalizer adds zero shuffles to whatever plan uses
it; the registered query's only exchange is the per-doc variant
collapse aggregate.

Reference parity: the reference's URL handling
(label/dataextractor/URLandSearchwordExtractor.scala:94-126) extracts
host/search words through java.net.URI inside a UDF; it never
canonicalizes. This is the beyond-reference normalization a crawl
dedup actually needs.

The testdata has no URL column, so the registered query synthesizes
two deterministic dirty variants per document (mixed-case host,
default port, tracking params, fragment, shuffled param order) and
proves they collapse: ``n_canonical`` must be 1 where ``n_raw`` is 2.

Oracle: DuckDB mirrors the identical regexp/list chain.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

# case-insensitive, and `(=|$)` (not a bare `=`) so valueless forms
# like `?fbclid` are stripped too while keys that merely share a
# prefix (`refresh`, `refine=1`) survive
TRACKING_RE = r"(?i)^(utm_[^=]*|fbclid|gclid|ref)(=|$)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of a URL column (see module docstring)."""
    u = F.regexp_replace(url, r"#.*$", "")
    scheme = F.lower(
        F.regexp_extract(u, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1)
    )
    rest = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.-]*://", "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?]+)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(host, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    path = F.regexp_extract(rest, r"^[^/?]*([^?]*)", 1)
    query = F.when(
        u.contains("?"), F.regexp_extract(u, r"\?(.*)$", 1)
    ).otherwise(F.lit(""))
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )
    qs = F.array_join(params, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
    )


def sql_canonicalize_url(expr: str) -> str:
    """DuckDB twin of :func:`canonicalize_url`."""
    u = f"regexp_replace({expr}, '#.*$', '')"
    scheme = f"lower(regexp_extract({u}, '^([A-Za-z][A-Za-z0-9+.-]*)://', 1))"
    rest = f"regexp_replace({u}, '^[A-Za-z][A-Za-z0-9+.-]*://', '')"
    host = f"lower(regexp_extract({rest}, '^([^/?]+)', 1))"
    host = (
        f"CASE WHEN {scheme} = 'http' THEN regexp_replace({host}, ':80$', '') "
        f"WHEN {scheme} = 'https' THEN regexp_replace({host}, ':443$', '') "
        f"ELSE {host} END"
    )
    path = f"regexp_extract({rest}, '^[^/?]*([^?]*)', 1)"
    query = (
        f"CASE WHEN contains({u}, '?') "
        f"THEN regexp_extract({u}, '\\?(.*)$', 1) ELSE '' END"
    )
    params = (
        f"list_sort(list_filter(string_split({query}, '&'), "
        f"p_ -> p_ <> '' AND NOT regexp_matches(p_, '{TRACKING_RE}')))"
    )
    qs = f"array_to_string({params}, '&')"
    return (
        f"{scheme} || '://' || {host} || {path} || "
        f"CASE WHEN {qs} <> '' THEN '?' || {qs} ELSE '' END"
    )


def _dirty_variants(docs: DataFrame) -> DataFrame:
    """Two syntactic variants of each doc's URL that must canonicalize
    identically."""
    v1 = F.concat(
        F.lit("HTTP://WWW."),
        F.upper("source"),
        F.lit(".Example.COM:80/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?utm_source=feed&b=2&a=1#top"),
    )
    v2 = F.concat(
        F.lit("http://www."),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
        F.lit("?a=1&b=2&utm_campaign=x"),
    )
    return docs.select(
        "doc_id", F.explode(F.array(v1, v2)).alias("url")
    )


_SQL_VARIANTS = """
    SELECT doc_id,
           'HTTP://WWW.' || upper(source) || '.Example.COM:80/docs/'
               || CAST(doc_id AS VARCHAR) || '?utm_source=feed&b=2&a=1#top'
               AS url
    FROM documents
    UNION ALL
    SELECT doc_id,
           'http://www.' || source || '.example.com/docs/'
               || CAST(doc_id AS VARCHAR) || '?a=1&b=2&utm_campaign=x'
               AS url
    FROM documents
"""


@register(
    "url_canonicalize_collapse",
    oracle=f"""
    WITH u AS ({_SQL_VARIANTS}),
    c AS (SELECT doc_id, {sql_canonicalize_url('url')} AS canon FROM u)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_raw,
           CAST(COUNT(DISTINCT canon) AS BIGINT) AS n_canonical,
           MIN(canon) AS canon_url
    FROM c GROUP BY doc_id
    """,
    doc="URL canonicalization (lowercase scheme/host, default-port "
    "strip, fragment drop, tracking-param drop, param sort) collapses "
    "two dirty per-doc variants to one canonical key — map-only "
    "normalizer, one collapse aggregate",
)
def url_canonicalize_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    u = _dirty_variants(docs)
    return u.select("doc_id", canonicalize_url(F.col("url")).alias("canon")).groupBy(
        "doc_id"
    ).agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.countDistinct("canon").alias("n_canonical"),
        F.min("canon").alias("canon_url"),
    )
