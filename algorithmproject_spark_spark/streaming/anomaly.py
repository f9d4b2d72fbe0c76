"""Streaming z-score anomaly detection — exact integer variance test.

Flag events whose value deviates from the user's PRIOR history by more
than K standard deviations. The float z-score test ``|v - μ| > K·σ``
is equivalent to the all-integer test

    (v·n − S)² > K² · (n·Q − S²)        [n ≥ MIN_PRIOR]

over the prior-event prefix aggregates n (count), S (Σv), Q (Σv²):
multiply through by n² and substitute μ = S/n, σ² = Q/n − (S/n)². No
sqrt, no floats — bit-identical in Spark, DuckDB, and the Python
state fold, which is what makes a STREAMING operator batch-twin
checkable at all.

Overflow contract: values enter as floor(v+0.5) integers (anomaly
thresholds don't need sub-unit precision); with |v| ≤ 10^3 every
intermediate is ≤ n²·10^6, so BIGINT holds to ~3e6 events per key —
document-scale per-user history. Larger regimes re-scale v or move
to DECIMAL.

Two forms of the SAME semantics:

- batch (``anomaly_flags``/``user_anomaly_summary``): prefix sums via
  a (ts, event_id)-ordered window frame ending at 1 PRECEDING —
  per-user state only, one keyed shuffle;
- streaming (``anomaly_stateful``): ``applyInPandasWithState`` holding
  (n, S, Q) per user — O(1) state per key regardless of event volume,
  Arrow-batched, idle keys expirable by timeout. Structured
  Streaming's batch-equivalence guarantee ties the two.

Reference parity: none — the reference has no streaming and no
anomaly ops; this extends the stateful family
(streaming/stateful.py) with the monitoring primitive every event
pipeline runs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql.types import LongType, StructField, StructType

K_SIGMA = 3
MIN_PRIOR = 5


def anomaly_flags(events: DataFrame) -> DataFrame:
    """Per-event anomaly flags over ``events(user_id, event_id, ts,
    value)``: adds ``v`` (integer value), ``n_prior`` and ``anomaly``
    (1/0; 0 whenever n_prior < MIN_PRIOR)."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    v = F.floor(F.col("value") + F.lit(0.5)).cast("long")
    base = events.select(
        "user_id",
        "event_id",
        "ts",
        v.alias("v"),
    ).select(
        "*",
        F.count(F.lit(1)).over(w).alias("n_prior"),
        F.coalesce(F.sum("v").over(w), F.lit(0)).alias("s"),
        F.coalesce(F.sum(F.col("v") * F.col("v")).over(w), F.lit(0)).alias("q"),
    )
    d = F.col("v") * F.col("n_prior") - F.col("s")
    var_n2 = F.col("n_prior") * F.col("q") - F.col("s") * F.col("s")
    flag = (
        (F.col("n_prior") >= MIN_PRIOR)
        & (d * d > F.lit(K_SIGMA * K_SIGMA) * var_n2)
    ).cast("long")
    return base.select("user_id", "event_id", "ts", "v", "n_prior", flag.alias("anomaly"))


def user_anomaly_summary(events: DataFrame) -> DataFrame:
    """Per-user rollup of the flags: ``(user_id, n_events, n_checked,
    n_anomalies, max_anomaly_v)``."""
    f = anomaly_flags(events)
    return f.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("n_prior") >= MIN_PRIOR).cast("long")).alias("n_checked"),
        F.sum("anomaly").alias("n_anomalies"),
        F.max(F.when(F.col("anomaly") == 1, F.col("v"))).alias("max_anomaly_v"),
    )


ANOMALY_STATE_SCHEMA = StructType(
    [
        StructField("n", LongType()),
        StructField("s", LongType()),
        StructField("q", LongType()),
    ]
)

ANOMALY_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType()),
        StructField("n_events", LongType()),
        StructField("n_anomalies", LongType()),
    ]
)


def _update(
    key: tuple, pdfs: Iterator[pd.DataFrame], state
) -> Iterator[pd.DataFrame]:
    """Fold one user's micro-batch through the (n, S, Q) state with the
    IDENTICAL integer test as the batch window form."""
    if state.exists:
        n, s, q = state.get
    else:
        n, s, q = 0, 0, 0
    n_new = anomalies = 0
    import numpy as np

    # concatenate BEFORE sorting: one key's micro-batch can arrive as
    # several Arrow chunks, and per-chunk sorts would not give the
    # global (ts, event_id) order the prior-history semantics need;
    # volume is one user's events in one micro-batch — bounded
    pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    # np.floor, not astype (which truncates toward zero): must
    # match the batch form's F.floor(v + 0.5) on negative values
    for v in np.floor(pdf["value"].values + 0.5).astype("int64"):
        v = int(v)
        if n >= MIN_PRIOR:
            d = v * n - s
            if d * d > K_SIGMA * K_SIGMA * (n * q - s * s):
                anomalies += 1
        n, s, q = n + 1, s + v, q + v * v
        n_new += 1
    state.update((n, s, q))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n_events": [n_new], "n_anomalies": [anomalies]}
    )


def anomaly_stateful(events: DataFrame) -> DataFrame:
    """Streaming form: per-user (n, S, Q) state, one output row per
    user per micro-batch with that batch's event/anomaly counts."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("user_id").applyInPandasWithState(
        _update,
        outputStructType=ANOMALY_OUTPUT_SCHEMA,
        stateStructType=ANOMALY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
