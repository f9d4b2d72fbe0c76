"""URL canonicalizer edge cases (queries/urls.py) — each case checks
the exact canonical string."""

from __future__ import annotations

from pyspark.sql import functions as F

from algorithmproject_spark_spark.queries.urls import canonicalize_url

CASES = [
    # (raw, canonical)
    ("HTTP://Host.COM/Path", "http://host.com/Path"),          # case: host only
    ("http://host.com:80/x", "http://host.com/x"),             # default port
    ("https://host.com:443/x", "https://host.com/x"),
    ("https://host.com:8443/x", "https://host.com:8443/x"),    # non-default kept
    ("http://host.com/x#frag", "http://host.com/x"),           # fragment
    ("http://host.com/x?b=2&a=1", "http://host.com/x?a=1&b=2"),  # param sort
    ("http://host.com/x?utm_source=s&a=1", "http://host.com/x?a=1"),
    ("http://host.com/x?fbclid=z&gclid=y&ref=r", "http://host.com/x"),
    ("http://host.com/x?utm_campaign=c", "http://host.com/x"),  # all dropped
    ("http://host.com", "http://host.com"),                     # no path
    ("http://host.com/refresh?refine=1", "http://host.com/refresh?refine=1"),
    # "ref" must match the whole key, not a prefix
    ("http://host.com/x?fbclid", "http://host.com/x"),          # bare param
    ("http://host.com/x?UTM_SOURCE=s&a=1", "http://host.com/x?a=1"),
    ("http://host.com/x?REF=r&b=1", "http://host.com/x?b=1"),   # case-insens
]


def test_canonicalization_cases(spark):
    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _) in enumerate(CASES)], ["i", "url"]
    )
    got = {
        r.i: r.canon
        for r in df.select("i", canonicalize_url(F.col("url")).alias("canon")).collect()
    }
    for i, (raw, want) in enumerate(CASES):
        assert got[i] == want, f"{raw!r}: {got[i]!r} != {want!r}"


def test_spark_and_duckdb_agree_on_cases(spark):
    import duckdb

    from algorithmproject_spark_spark.queries.urls import sql_canonicalize_url

    con = duckdb.connect()
    for raw, want in CASES:
        lit = "'" + raw.replace("'", "''") + "'"
        (got,) = con.execute(
            f"SELECT {sql_canonicalize_url(lit)}"
        ).fetchone()
        assert got == want, f"duckdb {raw!r}: {got!r} != {want!r}"
