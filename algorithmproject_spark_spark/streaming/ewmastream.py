"""Streaming EWMA control chart — the sequential-recurrence family's
stateful streaming form (11th streaming twin).

The batch chart (queries/spc.py::events_ewma_control_chart) walks the
per-type daily-mean series with an exact integer recurrence; a stream
cannot score a day until the day is COMPLETE, so the streaming form
holds per-type state

    (pending_day, pending_sum, pending_cnt, s, m, n_closed)

and folds a day into the recurrence only when a LATER day's first
event arrives — the pending (still-open) day is carried, its mean is
never guessed. Output mode is append: one row per CLOSED day, exactly
the rows of ``stream_ewma_batch_twin`` (the batch chart minus each
type's maximum day), which is what ties the two in
tests/test_streaming.py.

State is O(1) per key regardless of event volume — the recurrence
needs only the previous EWMA/MAD and the open day's partial sum, never
history. The fold assumes per-key event-time order across micro-
batches (file-stream sources replaying history in order — the same
contract as the other stateful twins); late cross-batch events belong
to the watermarked window family, not a recurrence.

Division parity: means are nonnegative-sum floor divisions and the
recurrence goes through the truncate-toward-zero ``_tdiv8`` — both
bit-identical to the batch walk and the DuckDB recursive CTE.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import LongType, StringType, StructField, StructType

from algorithmproject_spark_spark.queries.spc import _tdiv, _tdiv8

EWMA_STATE_SCHEMA = StructType(
    [
        StructField("pending_day", LongType()),
        StructField("pending_sum", LongType()),
        StructField("pending_cnt", LongType()),
        StructField("s", LongType()),
        StructField("m", LongType()),
        StructField("n_closed", LongType()),
    ]
)

EWMA_OUTPUT_SCHEMA = StructType(
    [
        StructField("event_type", StringType()),
        StructField("day", LongType()),
        StructField("mean_micros", LongType()),
        StructField("ewma_micros", LongType()),
        StructField("mad_micros", LongType()),
        StructField("flag", LongType()),
    ]
)


def _close_day(s, m, n_closed, day, mean):
    """Fold one completed day; returns (row, s, m) after the step —
    the IDENTICAL recurrence as queries/spc.py::_ewma_walk."""
    if n_closed == 0:
        s, m, flag = mean, 0, 0
    else:
        dev = abs(mean - s)
        flag = 1 if n_closed >= 3 and m > 0 and dev > 3 * m else 0
        s, m = _tdiv8(7 * s + mean), _tdiv8(7 * m + dev)
    return (day, mean, s, m, flag), s, m


def _update(key: tuple, pdfs: Iterator[pd.DataFrame], state):
    import numpy as np

    if state.exists:
        pday, psum, pcnt, s, m, k = state.get
    else:
        pday, psum, pcnt, s, m, k = 0, 0, 0, 0, 0, 0
    # concatenate BEFORE sorting (chunked Arrow delivery), then fold in
    # (ts, event_id) order — one key's micro-batch, bounded volume
    pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
    days = (
        pdf["ts"].values.astype("datetime64[D]").astype("int64")
    )
    vals = np.floor(pdf["value"].values * 1000000.0 + 0.5).astype("int64")
    rows = []
    for day, v in zip(days, vals):
        day, v = int(day), int(v)
        if pcnt == 0:
            pday, psum, pcnt = day, v, 1
        elif day == pday:
            psum, pcnt = psum + v, pcnt + 1
        else:
            # trunc-toward-zero, NOT Python floor — the batch twin and
            # the DuckDB oracle both truncate, and a negative-sum day
            # (refunds) would otherwise diverge by 1 (ADVICE r8)
            row, s, m = _close_day(s, m, k, pday, _tdiv(psum, pcnt))
            rows.append(row)
            k += 1
            pday, psum, pcnt = day, v, 1
    state.update((pday, psum, pcnt, s, m, k))
    yield pd.DataFrame(
        rows,
        columns=["day", "mean_micros", "ewma_micros", "mad_micros", "flag"],
    ).assign(event_type=key[0])[
        ["event_type", "day", "mean_micros", "ewma_micros", "mad_micros", "flag"]
    ]


def ewma_stateful(events: DataFrame) -> DataFrame:
    """Streaming form over ``events(event_type, event_id, ts, value)``:
    append-mode closed-day chart rows."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    return events.groupBy("event_type").applyInPandasWithState(
        _update,
        outputStructType=EWMA_OUTPUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
