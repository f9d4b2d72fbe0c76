"""Microsecond-exact RANGE frame boundary (window_trailing_2h_range_frame).

Scale-only bug caught by the sf1 sweep (r7): Spark's unix_timestamp
FLOORS the fractional second while DuckDB's epoch() keeps it, so a
whole-second RANGE key puts a neighbor that is 7200.4 s back INSIDE
Spark's 2h frame but OUTSIDE DuckDB's. At sf0.1 no pair of events for
the sampled users straddled a fractional boundary; at 10x density one
did. The fix keys the frame on unix_micros / epoch_us in both engines.
"""

from __future__ import annotations

import datetime as dt

import duckdb
import pytest


def _mk_events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, value double"
    )


def test_fractional_second_boundary_excluded(spark):
    """An event 7200.4 s before the current row is OUTSIDE the trailing
    2h frame; 7199.6 s before is inside. Whole-second flooring would
    include both (both floor to a 7200 s gap)."""
    from pyspark.sql import Window as W, functions as F

    base = dt.datetime(2024, 1, 1, 12, 0, 0, 500000)  # x.5 fractional
    rows = [
        (1, 0, base - dt.timedelta(seconds=7200, milliseconds=400), 1.0),
        (2, 0, base - dt.timedelta(seconds=7199, milliseconds=600), 2.0),
        (3, 0, base, 4.0),
    ]
    ev = _mk_events(spark, rows)
    w = (
        W.partitionBy("user_id")
        .orderBy(F.unix_micros("ts"))
        .rangeBetween(-7_200_000_000, W.currentRow)
    )
    out = {
        r["event_id"]: r["n"]
        for r in ev.select(
            "event_id", F.count(F.lit(1)).over(w).alias("n")
        ).collect()
    }
    # event 3's frame: itself + event 2 (7199.6s back); event 1 is
    # 7200.4s back — excluded. Floored-seconds keying yields n=3 here.
    assert out[3] == 2
    assert out[1] == 1
    assert out[2] == 2


def test_registered_query_matches_duckdb_on_boundary_fixture(spark, tmp_path):
    """Run the REGISTERED query and its oracle on a fixture built to
    straddle the fractional boundary; they must agree row-for-row."""
    from algorithmproject_spark_spark.queries import REGISTRY

    base = dt.datetime(2024, 1, 1, 12, 0, 0, 300308)
    rows = []
    for k, (off_s, off_ms) in enumerate(
        [(14400, 0), (7200, 400), (7199, 600), (3600, 100), (0, 0)]
    ):
        rows.append(
            (
                k,
                0,  # user_id 0 passes the % 97 == 0 sample
                base - dt.timedelta(seconds=off_s, milliseconds=off_ms),
                float(k + 1),
            )
        )
    from pyspark.sql import functions as F

    ev = (
        _mk_events(spark, rows)
        .withColumn("event_type", F.lit("x"))
        .withColumn("props", F.lit("{}"))
    )
    sf_dir = str(tmp_path)
    ev.select("event_id", "ts", "user_id", "event_type", "value", "props").coalesce(
        1
    ).write.mode("overwrite").parquet(f"{sf_dir}/events.parquet")

    spec = REGISTRY["window_trailing_2h_range_frame"]
    srows = sorted(
        (r["event_id"], r["trailing_2h_e6"], r["trailing_2h_n"])
        for r in spec.fn(spark, sf_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet/*.parquet'"
    )
    drows = sorted(
        (r[0], r[3], r[4]) for r in con.execute(spec.oracle).fetchall()
    )
    assert srows == drows
    # and the boundary row really exercises the fix: the current row's
    # frame holds events 2,3,4 (7199.6s, 3600.1s, 0s back) but NOT
    # event 1 at 7200.4s back
    by_id = {r[0]: r[2] for r in srows}
    assert by_id[4] == 3
