"""Streaming Holt forecaster — the trend-aware sibling of the EWMA
stream (14th stateful twin).

Same contract as streaming/ewmastream.py: per-type state carries the
still-open day's partials plus the recurrence state

    (pending_day, pending_sum, pending_cnt, lvl, tr, n_closed)

and a day folds into the coupled level+trend recurrence only when a
LATER day's first event arrives. Output mode is append: one row per
CLOSED day — exactly ``stream_holt_batch_twin``'s relation (the batch
forecast minus each type's maximum day). State is O(1) per key; the
fold assumes per-key event-time order across micro-batches (the
file-replay contract shared by every stateful twin here).

The step is the IDENTICAL integer recurrence as
queries/holt.py::_holt_walk (alpha=1/4, beta=1/8, truncating
division) — pinned against it by the cross-batch seam test.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from algorithmproject_spark_spark.queries.spc import _tdiv

HOLT_STATE_SCHEMA = StructType(
    [
        StructField("pending_day", LongType()),
        StructField("pending_sum", LongType()),
        StructField("pending_cnt", LongType()),
        StructField("lvl", LongType()),
        StructField("tr", LongType()),
        StructField("n_closed", LongType()),
    ]
)

HOLT_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("day", LongType()),
        StructField("mean_micros", LongType()),
        StructField("forecast_micros", LongType()),
        StructField("abs_err_micros", LongType()),
        StructField("level_micros", LongType()),
        StructField("trend_micros", LongType()),
    ]
)


def _close_day(lvl, tr, n_closed, day, mean):
    """Fold one completed day; the IDENTICAL step as holt._holt_walk."""
    if n_closed == 0:
        return (day, mean, None, None, mean, 0), mean, 0
    fc = lvl + tr
    err = abs(mean - fc)
    new_lvl = _tdiv(mean + 3 * fc, 4)  # alpha = 1/4
    new_tr = _tdiv((new_lvl - lvl) + 7 * tr, 8)  # beta = 1/8
    return (day, mean, fc, err, new_lvl, new_tr), new_lvl, new_tr


def _update(key: tuple, pdfs: Iterator[pd.DataFrame], state):
    import numpy as np

    if state.exists:
        pday, psum, pcnt, lvl, tr, k = state.get
    else:
        pday, psum, pcnt, lvl, tr, k = 0, 0, 0, 0, 0, 0
    pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    days = pdf["ts"].values.astype("datetime64[D]").astype("int64")
    vals = np.floor(pdf["value"].values * 1000000.0 + 0.5).astype("int64")
    rows = []
    for day, v in zip(days, vals):
        day, v = int(day), int(v)
        if pcnt == 0:
            pday, psum, pcnt = day, v, 1
        elif day == pday:
            psum, pcnt = psum + v, pcnt + 1
        else:
            # trunc-toward-zero mean, like the batch twin and oracle
            row, lvl, tr = _close_day(lvl, tr, k, pday, _tdiv(psum, pcnt))
            rows.append(row)
            k += 1
            pday, psum, pcnt = day, v, 1
    state.update((pday, psum, pcnt, lvl, tr, k))
    yield pd.DataFrame(
        rows,
        columns=[
            "day",
            "mean_micros",
            "forecast_micros",
            "abs_err_micros",
            "level_micros",
            "trend_micros",
        ],
    ).assign(event_type=key[0])[
        [
            "event_type",
            "day",
            "mean_micros",
            "forecast_micros",
            "abs_err_micros",
            "level_micros",
            "trend_micros",
        ]
    ]


def holt_stateful(events: DataFrame) -> DataFrame:
    """Streaming form over ``events(event_type, event_id, ts, value)``:
    append-mode closed-day forecast rows."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=HOLT_OUTPUT_SCHEMA,
        stateStructType=HOLT_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
