"""Data-quality constraint suite + SQL-standard interpolated quantiles.

Two data-engineering primitives on top of the engine's profiling
family (orders_quality_report, orders_key_skew_report):

- **Constraint validation suite** (``lineitem_constraint_suite``):
  the Deequ/Great-Expectations pattern — a declared set of table
  constraints evaluated in one job, one result row per constraint:
  ``(check, n_checked, n_violations)``. Six constraint classes over
  lineitem: composite-key uniqueness, column completeness, referential
  integrity into orders, functional dependency, domain range, and
  non-negativity. Row-level checks share ONE scan/aggregate (sums of
  CASE flags); the uniqueness and FD checks are keyed groupBys over
  their key columns; referential integrity is a LEFT ANTI join
  (orders' key side aggregated before the join). Nothing quadratic,
  nothing driver-side — the union is 6 one-row relations.

- **percentile_cont semantics, exactly** (``events_percentile_cont``):
  the SQL-standard interpolated quantile (pos = (n−1)·q; linear
  interpolation between the two bracketing order statistics), computed
  EXACTLY: q = p/100 rational, so num = (n−1)·p splits into
  idx = num div 100 and rem = num mod 100, the bracketing values are
  conditional MINs over the cumulative compacted distribution (the
  events_exact_global_quantiles shape — the window rides distinct
  values, never data rows), and the result is the exact integer
  ``v_lo·(100−rem) + v_hi·rem`` in cents·10⁻² units. No floats, so
  the interpolation hash-matches cross-engine — which DuckDB's own
  float ``quantile_cont`` would not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

from algorithmproject_spark_spark.functions.numeric import ss_scaled_long
from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

QTY_MIN, QTY_MAX = 1, 50  # domain contract for l_quantity
PCTS = (25, 50, 75, 90, 99)


@register(
    "lineitem_constraint_suite",
    oracle=f"""
    WITH rowlevel AS (
        SELECT CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) AS null_ship,
               CAST(sum(CASE WHEN l_quantity < {QTY_MIN}
                              OR l_quantity > {QTY_MAX}
                             THEN 1 ELSE 0 END) AS BIGINT) AS bad_qty,
               CAST(sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)
                    AS BIGINT) AS neg_price
        FROM lineitem
    ),
    uniq AS (
        SELECT CAST(count(*) AS BIGINT) AS n_keys,
               CAST(sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS dup_keys
        FROM (SELECT count(*) AS c FROM lineitem
              GROUP BY l_orderkey, l_linenumber)
    ),
    fd AS (
        SELECT CAST(count(*) AS BIGINT) AS n_parts,
               CAST(sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS fd_viol
        FROM (SELECT count(DISTINCT l_suppkey) AS ns FROM lineitem
              GROUP BY l_partkey)
    ),
    ri AS (
        SELECT CAST(count(*) AS BIGINT) AS orphans
        FROM lineitem WHERE l_orderkey NOT IN
            (SELECT o_orderkey FROM orders)
    )
    SELECT 'unique_orderkey_linenumber' AS check_name,
           n_keys AS n_checked, dup_keys AS n_violations FROM uniq
    UNION ALL
    SELECT 'complete_shipdate', n, null_ship FROM rowlevel
    UNION ALL
    SELECT 'ref_orderkey_in_orders', (SELECT n FROM rowlevel), orphans
    FROM ri
    UNION ALL
    SELECT 'fd_partkey_determines_suppkey', n_parts, fd_viol FROM fd
    UNION ALL
    SELECT 'domain_quantity_{QTY_MIN}_{QTY_MAX}', n, bad_qty FROM rowlevel
    UNION ALL
    SELECT 'nonnegative_extendedprice', n, neg_price FROM rowlevel
    """,
    doc=(
        "Deequ-style declared-constraint validation: uniqueness, "
        "completeness, referential integrity, FD, domain, sign — one "
        "row per check with exact violation counts"
    ),
    plan=("scalar_cross",),  # RI row: broadcast 1-row total ⨯ 1-row orphans
)
def lineitem_constraint_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey")

    # three row-level checks ride ONE scan/aggregate (one-parse, r13)
    rowlevel = li.agg(
        F.expr("count(1) AS n"),
        F.expr(
            "sum(CASE WHEN l_shipdate IS NULL THEN 1 ELSE 0 END)"
            " AS null_ship"
        ),
        F.expr(
            f"sum(CASE WHEN l_quantity < {QTY_MIN}"
            f" OR l_quantity > {QTY_MAX} THEN 1 ELSE 0 END) AS bad_qty"
        ),
        F.expr(
            "sum(CASE WHEN l_extendedprice < 0 THEN 1 ELSE 0 END)"
            " AS neg_price"
        ),
    )
    uniq = (
        li.groupBy("l_orderkey", "l_linenumber")
        .agg(F.expr("count(1) AS c"))
        .agg(
            F.expr("count(1) AS n_keys"),
            F.expr("sum(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS dup_keys"),
        )
    )
    fd = (
        li.groupBy("l_partkey")
        .agg(F.expr("count(DISTINCT l_suppkey) AS ns"))
        .agg(
            F.expr("count(1) AS n_parts"),
            F.expr("sum(CASE WHEN ns > 1 THEN 1 ELSE 0 END) AS fd_viol"),
        )
    )
    orphans = (
        li.select("l_orderkey")
        .join(o, li["l_orderkey"] == o["o_orderkey"], "left_anti")
        .agg(F.expr("count(1) AS orphans"))
    )

    def row(name: str, src: DataFrame, checked: str, viol: str) -> DataFrame:
        return src.selectExpr(
            f"'{name}' AS check_name",
            f"CAST({checked} AS BIGINT) AS n_checked",
            f"CAST({viol} AS BIGINT) AS n_violations",
        )

    # the RI row reports violations out of total rows — carry n in
    # via the same broadcast-1-row pattern as every scalar elsewhere
    ri_row = orphans.crossJoin(F.broadcast(rowlevel.select("n"))).selectExpr(
        "'ref_orderkey_in_orders' AS check_name",
        "CAST(n AS BIGINT) AS n_checked",
        "CAST(orphans AS BIGINT) AS n_violations",
    )
    return (
        row("unique_orderkey_linenumber", uniq, "n_keys", "dup_keys")
        .unionByName(row("complete_shipdate", rowlevel, "n", "null_ship"))
        .unionByName(ri_row)
        .unionByName(
            row("fd_partkey_determines_suppkey", fd, "n_parts", "fd_viol")
        )
        .unionByName(
            row(
                f"domain_quantity_{QTY_MIN}_{QTY_MAX}",
                rowlevel,
                "n",
                "bad_qty",
            )
        )
        .unionByName(
            row("nonnegative_extendedprice", rowlevel, "n", "neg_price")
        )
    )


def _sql_bracket(p: int) -> str:
    """Conditional-MIN brackets for percentile p over the cum CTE."""
    idx = f"((n - 1) * {p}) // 100"
    return (
        f"MIN(CASE WHEN cum >= {idx} + 1 THEN v_e2 END) AS lo{p},\n"
        f"       MIN(CASE WHEN cum >= {idx} + 2 THEN v_e2 END) AS hi{p}"
    )


def _sql_interp(p: int) -> str:
    # rem MUST be parenthesized as a unit: `x * a % 100` parses as
    # `(x * a) % 100` (* and % share precedence, left-assoc)
    rem = f"(((n - 1) * {p}) % 100)"
    return (
        f"lo{p} * (100 - {rem}) + COALESCE(hi{p}, lo{p}) * {rem}"
        f" AS p{p}_e4"
    )


@register(
    "events_percentile_cont",
    oracle=f"""
    WITH v AS (
        SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_e2
        FROM events
    ),
    dist AS (
        SELECT v_e2, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY v_e2
    ),
    cum AS (
        SELECT v_e2,
               CAST(SUM(c) OVER (ORDER BY v_e2) AS BIGINT) AS cum,
               CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM dist
    ),
    br AS (
        SELECT CAST(max(n) AS BIGINT) AS n,
       {','.join(_sql_bracket(p) for p in PCTS)}
        FROM cum
    )
    SELECT n, {', '.join(_sql_interp(p) for p in PCTS)}
    FROM br
    """,
    doc=(
        "SQL-standard percentile_cont (interpolated quantiles) "
        "computed EXACTLY: rational position split + integer "
        "interpolation over the compacted value distribution"
    ),
)
def events_percentile_cont(spark: SparkSession, sf_dir: str) -> DataFrame:
    # one-parse text glue throughout (r13): same expressions, ~800
    # fewer py4j round-trips per build
    ev = load_table(spark, sf_dir, "events").selectExpr(
        f"{ss_scaled_long('value')} AS v_e2"
    )
    dist = ev.groupBy("v_e2").agg(F.expr("count(1) AS c"))
    # windows ride the compacted distinct-value relation (the
    # events_exact_global_quantiles shape), never data rows
    cum = dist.selectExpr(
        "v_e2",
        "sum(c) OVER (ORDER BY v_e2 ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) AS cum",
        "sum(c) OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED"
        " FOLLOWING) AS n",
    )

    aggs = ["max(n) AS n"]
    for p in PCTS:
        idx = f"(((n - 1) * {p}) div 100)"
        aggs.append(f"min(CASE WHEN cum >= {idx} + 1 THEN v_e2 END) AS lo{p}")
        aggs.append(f"min(CASE WHEN cum >= {idx} + 2 THEN v_e2 END) AS hi{p}")
    br = cum.agg(*[F.expr(a) for a in aggs])

    def interp(p: int) -> str:
        rem = f"(((n - 1) * {p}) % 100)"
        return (
            f"lo{p} * (100 - {rem})"
            f" + coalesce(hi{p}, lo{p}) * {rem} AS p{p}_e4"
        )

    return br.selectExpr("n", *[interp(p) for p in PCTS])


N_BINS = 10


@register(
    "events_equidepth_bins",
    oracle=f"""
    WITH v AS (
        SELECT CAST(floor(value * 100.0 + 0.5) AS BIGINT) AS v_e2
        FROM events
    ),
    dist AS (
        SELECT v_e2, CAST(count(*) AS BIGINT) AS c FROM v GROUP BY v_e2
    ),
    cum AS (
        SELECT v_e2, c,
               CAST(SUM(c) OVER (ORDER BY v_e2) AS BIGINT) AS cum,
               CAST(SUM(c) OVER () AS BIGINT) AS n
        FROM dist
    ),
    bounds AS (
        SELECT
        {','.join(f'''
           MIN(CASE WHEN cum * {N_BINS} >= n * {k} THEN v_e2 END)
               AS b{k}''' for k in range(1, N_BINS))}
        FROM cum
    )
    SELECT 1 + {' + '.join(f'(CASE WHEN v_e2 > b{k} THEN 1 ELSE 0 END)' for k in range(1, N_BINS))}
               AS bin,
           CAST(min(v_e2) AS BIGINT) AS lo_e2,
           CAST(max(v_e2) AS BIGINT) AS hi_e2,
           CAST(sum(c) AS BIGINT) AS n_rows
    FROM dist CROSS JOIN bounds
    GROUP BY bin
    """,
    doc=(
        "equi-depth binning (decile feature bucketing): exact "
        "percentile_disc boundaries over the compacted distribution, "
        "boundary values assigned to the lower bin — the ML "
        "bucketizer-fit primitive"
    ),
    plan=("scalar_cross",),  # 1-row boundary vector ⨯ compacted dist
)
def events_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").selectExpr(
        f"{ss_scaled_long('value')} AS v_e2"
    )
    dist = ev.groupBy("v_e2").agg(F.expr("count(1) AS c"))
    cum = dist.selectExpr(
        "v_e2",
        "c",
        "sum(c) OVER (ORDER BY v_e2 ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) AS cum",
        "sum(c) OVER (ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED"
        " FOLLOWING) AS n",
    )
    bounds = cum.agg(
        *[
            F.expr(
                f"min(CASE WHEN cum * {N_BINS} >= n * {k} THEN v_e2 END)"
                f" AS b{k}"
            )
            for k in range(1, N_BINS)
        ]
    )
    bin_txt = "1 + " + " + ".join(
        f"(CASE WHEN v_e2 > b{k} THEN 1 ELSE 0 END)"
        for k in range(1, N_BINS)
    )
    return (
        dist.crossJoin(F.broadcast(bounds))
        .groupBy(F.expr(bin_txt).alias("bin"))
        .agg(
            F.expr("min(v_e2) AS lo_e2"),
            F.expr("max(v_e2) AS hi_e2"),
            F.expr("sum(c) AS n_rows"),
        )
    )
