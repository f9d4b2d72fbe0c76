"""Survival analysis over the activation funnel — Kaplan-Meier
product-limit curves per experiment arm, the log-rank test, and
restricted mean survival time (RMST), all integer-exact.

``events_signup_to_purchase_survival`` (queries/product.py) summarizes
the UNCENSORED delay quartiles; the estimator a product team actually
reads is the Kaplan-Meier curve, because it uses the censored
population (signups that have not purchased YET) instead of dropping
it. This module builds the classic trio on the same cohort:

- ``events_kaplan_meier`` — the per-arm life table: at each distinct
  duration (hours from first signup to first subsequent purchase,
  censored at the corpus's max timestamp), the at-risk count, events,
  censorings, and the product-limit survival S(t) in ppm. The
  survival product has no window-function closed form as an EXACT
  per-step-floor recurrence, so it uses the EWMA machinery
  (queries/spc.py:520): Arrow applyInPandas walks the COMPACTED
  per-arm life table (bounded by the calendar span in hours, never by
  users), and the DuckDB twin is a recursive CTE computing the
  IDENTICAL integer recurrence s' = s*(n-d) div n.
- ``events_logrank_test`` — the standard two-arm comparison: per
  death time, observed vs hypergeometric-expected deaths in arm 0,
  variance term, and the z statistic. PURE relational (no recurrence:
  log-rank is a sum over time points); expectation/variance are
  floor-composed in ppm, and the single z normalization is one
  deterministic IEEE sqrt+division (micros contract). Overflow
  contract: per-time-point d·(n-n1)·1e6 must fit BIGINT — coarsen the
  time grid if a single grid cell ever sees ~1e6+ simultaneous deaths
  with ~1e7+ at risk.
- ``events_rmst_per_arm`` — restricted mean survival time: the exact
  area under each arm's step curve up to the shared horizon (the
  global max duration), in ppm·hours. The scale-friendly "how many
  hours of non-conversion does arm B save" number.

Scale shape: cohort = two keyed aggs over events + a broadcast 1-row
max-timestamp frame (scalar_cross); everything downstream rides the
(arm, duration) compacted relation — |arms| × |hours in the corpus
span| rows — so the Arrow walk, the grid alignment, and the windows
are bounded by CALENDAR TIME, not data volume, at any corpus size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from algorithmproject_spark_spark.functions.numeric import (
    sql_hash_mod,
    sql_ppm,
    ss_hash_mod,
    ss_micros,
    ss_ppm,
)
from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table

SIGNUP, PURCHASE = "signup", "purchase"
HOUR_US = 3_600 * 1_000_000
N_ARMS = 2
E6 = 1_000_000


# --------------------------------------------------------------------------
# Shared cohort + life table (Spark and SQL twins)
# --------------------------------------------------------------------------
def _life_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(arm, dur_h, d, c): per experiment arm and duration hour, the
    event (first-purchase) and right-censoring counts. Compacted —
    bounded by |arms| x |hours of corpus span|."""
    # one-parse text glue (r13): same expressions, fewer py4j trips
    ev = load_table(spark, sf_dir, "events").selectExpr(
        "user_id", "event_type", "unix_micros(ts) AS us"
    )
    su = (
        ev.filter(f"event_type = '{SIGNUP}'")
        .groupBy("user_id")
        .agg(F.expr("min(us) AS s_us"))
    )
    pu = (
        ev.filter(f"event_type = '{PURCHASE}'")
        .join(su, "user_id")
        .filter("us >= s_us")
        .groupBy("user_id")
        .agg(F.expr("min(us) AS p_us"))
    )
    mx = ev.agg(F.expr("max(us) AS mx_us"))
    coh = (
        su.join(pu, "user_id", "left")
        .crossJoin(F.broadcast(mx))
        .selectExpr(
            f"{ss_hash_mod('user_id', N_ARMS)} AS arm",
            f"(coalesce(p_us, mx_us) - s_us) div {HOUR_US} AS dur_h",
            "CAST(CASE WHEN p_us IS NOT NULL THEN 1 ELSE 0 END"
            " AS BIGINT) AS ev",
        )
    )
    return coh.groupBy("arm", "dur_h").agg(
        F.expr("CAST(sum(ev) AS BIGINT) AS d"),
        F.expr("CAST(count(1) - sum(ev) AS BIGINT) AS c"),
    )


_SQL_LT = f"""km_su AS (
        SELECT user_id, CAST(min(epoch_us(ts)) AS BIGINT) AS s_us
        FROM events WHERE event_type = '{SIGNUP}' GROUP BY user_id
    ),
    km_pu AS (
        SELECT e.user_id, CAST(min(epoch_us(e.ts)) AS BIGINT) AS p_us
        FROM events e JOIN km_su s ON e.user_id = s.user_id
        WHERE e.event_type = '{PURCHASE}' AND epoch_us(e.ts) >= s.s_us
        GROUP BY e.user_id
    ),
    km_mx AS (SELECT CAST(max(epoch_us(ts)) AS BIGINT) AS mx_us FROM events),
    km_coh AS (
        SELECT {sql_hash_mod('s.user_id', N_ARMS)} AS arm,
               (COALESCE(p.p_us, m.mx_us) - s.s_us) // {HOUR_US} AS dur_h,
               CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END AS ev
        FROM km_su s LEFT JOIN km_pu p USING (user_id) CROSS JOIN km_mx m
    ),
    km_lt AS (
        SELECT arm, dur_h,
               CAST(SUM(ev) AS BIGINT) AS d,
               CAST(COUNT(*) - SUM(ev) AS BIGINT) AS c
        FROM km_coh GROUP BY 1, 2
    )"""

#: at-risk counts: reverse cumulative (everyone with duration >= t)
_SQL_RT = """km_rt AS (
        SELECT arm, dur_h, d, c,
               CAST(SUM(d + c) OVER (PARTITION BY arm ORDER BY dur_h
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS n_risk
        FROM km_lt
    )"""

#: recursive product-limit recurrence over km_rt — all operands
#: non-negative, so DuckDB // == Spark div == the walker's Python //
_SQL_KM_REC = """base AS MATERIALIZED (
        SELECT arm, dur_h, d, c, n_risk,
               row_number() OVER (PARTITION BY arm ORDER BY dur_h) AS rn
        FROM km_rt
    ),
    rec AS (
        SELECT arm, dur_h, d, c, n_risk, rn,
               CASE WHEN d > 0
                    THEN (1000000 * (n_risk - d)) // n_risk
                    ELSE CAST(1000000 AS BIGINT) END AS s_e6
        FROM base WHERE rn = 1
        UNION ALL
        SELECT b.arm, b.dur_h, b.d, b.c, b.n_risk, b.rn,
               CASE WHEN b.d > 0
                    THEN (r.s_e6 * (b.n_risk - b.d)) // b.n_risk
                    ELSE r.s_e6 END
        FROM rec r JOIN base b ON b.arm = r.arm AND b.rn = r.rn + 1
    )"""

_KM_SCHEMA = (
    "arm long, dur_h long, n_risk long, n_events long, "
    "n_censored long, s_e6 long"
)


def _km_walk(pdf):
    import pandas as pd

    pdf = pdf.sort_values("dur_h")
    remaining = int((pdf["d"] + pdf["c"]).sum())
    s = E6
    out = []
    for dur, d, c in zip(pdf["dur_h"], pdf["d"], pdf["c"]):
        d, c = int(d), int(c)
        n_risk = remaining
        if d > 0:
            # all operands >= 0: Python // == Spark div == DuckDB //
            s = (s * (n_risk - d)) // n_risk
        out.append((int(pdf["arm"].iloc[0]), int(dur), n_risk, d, c, s))
        remaining -= d + c
    return pd.DataFrame(
        out,
        columns=[
            "arm",
            "dur_h",
            "n_risk",
            "n_events",
            "n_censored",
            "s_e6",
        ],
    )


def _km_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-arm KM life table with S(t) — the Arrow walk over the
    compacted (arm, dur_h) relation; one task per arm, which is
    exactly the recurrence's dependency structure."""
    return (
        _life_table(spark, sf_dir)
        .groupBy("arm")
        .applyInPandas(_km_walk, schema=_KM_SCHEMA)
    )


@register(
    "events_kaplan_meier",
    plan=("arrow", "scalar_cross"),
    oracle=f"""
    WITH RECURSIVE {_SQL_LT},
    {_SQL_RT},
    {_SQL_KM_REC}
    SELECT CAST(arm AS BIGINT) AS arm,
           CAST(dur_h AS BIGINT) AS dur_h,
           n_risk, d AS n_events, c AS n_censored, s_e6
    FROM rec
    """,
    doc=(
        "Kaplan-Meier product-limit survival curves per deterministic "
        "A/B arm: signup -> first-purchase duration in hours, right-"
        "censored at the corpus max timestamp; per duration the at-risk "
        "count, events, censorings, and S(t) ppm via the exact per-step "
        "floor recurrence s' = s*(n-d) div n (Arrow walk over the "
        "calendar-bounded compacted life table, recursive-CTE oracle)"
    ),
)
def events_kaplan_meier(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _km_curve(spark, sf_dir)


# --------------------------------------------------------------------------
# Log-rank test — pure relational (sums over death times). The grid
# aligns BOTH arms on every distinct duration so at-risk counts exist
# even where an arm has no row of its own.
# --------------------------------------------------------------------------
@register(
    "events_logrank_test",
    plan=("scalar_cross",),
    oracle=f"""
    WITH {_SQL_LT},
    durs AS (SELECT DISTINCT dur_h FROM km_lt),
    grid AS (
        SELECT g.dur_h, a.arm,
               COALESCE(l.d, 0) AS d, COALESCE(l.c, 0) AS c
        FROM durs g
        CROSS JOIN (SELECT unnest(range({N_ARMS})) AS arm) a
        LEFT JOIN km_lt l ON l.dur_h = g.dur_h AND l.arm = a.arm
    ),
    rt AS (
        SELECT dur_h, arm, d,
               CAST(SUM(d + c) OVER (PARTITION BY arm ORDER BY dur_h
                   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                   AS BIGINT) AS n_risk
        FROM grid
    ),
    pv AS (
        SELECT dur_h,
               CAST(SUM(CASE WHEN arm = 0 THEN d ELSE 0 END) AS BIGINT)
                   AS d1,
               CAST(SUM(d) AS BIGINT) AS d,
               CAST(SUM(CASE WHEN arm = 0 THEN n_risk ELSE 0 END) AS BIGINT)
                   AS n1,
               CAST(SUM(n_risk) AS BIGINT) AS n
        FROM rt GROUP BY dur_h
    ),
    terms AS (
        SELECT d1, d, n1, n,
               {sql_ppm('d * n1', 'n')} AS e1_e6,
               CASE WHEN n > 1 THEN
                   (({sql_ppm('d * n1', 'n')} * (n - n1)) // n * (n - d))
                       // (n - 1)
               ELSE 0 END AS v_e6
        FROM pv WHERE d > 0 AND n > 0
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_timepoints,
           CAST(SUM(d1) AS BIGINT) AS o1,
           CAST(SUM(e1_e6) AS BIGINT) AS e1_e6,
           CAST(SUM(v_e6) AS BIGINT) AS v_e6,
           CASE WHEN SUM(v_e6) > 0 THEN
               CAST(floor(
                   (CAST(SUM(d1) * 1000000 - SUM(e1_e6) AS DOUBLE)
                       / (1000.0 * sqrt(CAST(SUM(v_e6) AS DOUBLE))))
                   * 1000000.0 + 0.5) AS BIGINT)
           ELSE NULL END AS z_micros
    FROM terms
    """,
    doc=(
        "two-arm log-rank test on the KM cohort: per death time the "
        "observed vs hypergeometric-expected arm-0 deaths (ppm floor "
        "composition) and variance term; z = (O-E)/sqrt(V) via ONE "
        "deterministic IEEE sqrt+division in micros — the experiment "
        "readout 'does arm B convert faster', pure relational over the "
        "calendar-bounded grid"
    ),
)
def events_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    lt = _life_table(spark, sf_dir)
    durs = lt.select("dur_h").distinct()
    arm_arr = "array(" + ", ".join(str(a) for a in range(N_ARMS)) + ")"
    grid = (
        durs.selectExpr("dur_h", f"explode({arm_arr}) AS arm")
        .join(lt, ["dur_h", "arm"], "left")
        .selectExpr(
            "dur_h",
            "arm",
            "coalesce(d, 0) AS d",
            "coalesce(c, 0) AS c",
        )
    )
    rt = grid.selectExpr(
        "dur_h",
        "arm",
        "d",
        "sum(d + c) OVER (PARTITION BY arm ORDER BY dur_h ROWS BETWEEN"
        " CURRENT ROW AND UNBOUNDED FOLLOWING) AS n_risk",
    )
    pv = rt.groupBy("dur_h").agg(
        F.expr(
            "CAST(sum(CASE WHEN arm = 0 THEN d ELSE 0 END) AS BIGINT)"
            " AS d1"
        ),
        F.expr("CAST(sum(d) AS BIGINT) AS d"),
        F.expr(
            "CAST(sum(CASE WHEN arm = 0 THEN n_risk ELSE 0 END)"
            " AS BIGINT) AS n1"
        ),
        F.expr("CAST(sum(n_risk) AS BIGINT) AS n"),
    )
    e1 = ss_ppm("d * n1", "n")
    v = (
        f"CASE WHEN n > 1 THEN ((({e1} * (n - n1)) div n) * (n - d))"
        f" div (n - 1) ELSE CAST(0 AS BIGINT) END"
    )
    terms = pv.filter("d > 0 AND n > 0").selectExpr(
        "d1", f"{e1} AS e1_e6", f"{v} AS v_e6"
    )
    z_num = "CAST(sum(d1) * 1000000 - sum(e1_e6) AS DOUBLE)"
    z_den = "(1000.0D * sqrt(CAST(sum(v_e6) AS DOUBLE)))"
    return terms.agg(
        F.expr("CAST(count(1) AS BIGINT) AS n_timepoints"),
        F.expr("CAST(sum(d1) AS BIGINT) AS o1"),
        F.expr("CAST(sum(e1_e6) AS BIGINT) AS e1_e6"),
        F.expr("CAST(sum(v_e6) AS BIGINT) AS v_e6"),
        F.expr(
            f"CASE WHEN sum(v_e6) > 0 THEN"
            f" {ss_micros(f'{z_num} / {z_den}')}"
            f" ELSE CAST(NULL AS BIGINT) END AS z_micros"
        ),
    )


# --------------------------------------------------------------------------
# Restricted mean survival time — exact area under each arm's step
# curve up to the shared horizon (global max duration).
# --------------------------------------------------------------------------
@register(
    "events_rmst_per_arm",
    plan=("arrow", "scalar_cross"),
    oracle=f"""
    WITH RECURSIVE {_SQL_LT},
    {_SQL_RT},
    {_SQL_KM_REC},
    tau AS (SELECT CAST(max(dur_h) AS BIGINT) AS tau_h FROM km_rt),
    seg AS (
        SELECT arm, dur_h, s_e6,
               lead(dur_h) OVER (PARTITION BY arm ORDER BY dur_h) AS nxt
        FROM rec
    )
    SELECT CAST(s.arm AS BIGINT) AS arm,
           t.tau_h,
           CAST(min(s.dur_h) * 1000000
                + SUM(s.s_e6 * (COALESCE(s.nxt, t.tau_h) - s.dur_h))
                AS BIGINT) AS rmst_e6h
    FROM seg s CROSS JOIN tau t
    GROUP BY s.arm, t.tau_h
    """,
    doc=(
        "restricted mean survival time per arm: exact integer area "
        "under the KM step curve up to the shared horizon (global max "
        "duration) in ppm-hours — S=1 before the first observed "
        "duration, each step weighted by its hour span; the single "
        "comparable 'expected hours without conversion' number"
    ),
)
def events_rmst_per_arm(spark: SparkSession, sf_dir: str) -> DataFrame:
    km = _km_curve(spark, sf_dir)
    tau = km.agg(F.expr("max(dur_h) AS tau_h"))
    seg = km.selectExpr(
        "arm",
        "dur_h",
        "s_e6",
        "lead(dur_h) OVER (PARTITION BY arm ORDER BY dur_h) AS nxt",
    ).crossJoin(F.broadcast(tau))
    return seg.groupBy("arm", "tau_h").agg(
        F.expr(
            f"CAST(min(dur_h) * {E6}"
            " + sum(s_e6 * (coalesce(nxt, tau_h) - dur_h))"
            " AS BIGINT) AS rmst_e6h"
        )
    )
