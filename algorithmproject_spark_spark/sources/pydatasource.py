"""Custom connectors via Spark 4's Python Data Source API.

The reference's external connectors (MongoDB read/write —
``mongodb/ReadMongodb.scala:27-32``, ``label/DataLoader.scala:118-131``)
cannot run in this sandbox; what CAN be shown end-to-end is the exact
machinery a production Python connector uses: ``pyspark.sql.datasource``
with planned input partitions (executor-side parallel reads, nothing
driver-materialized), a writer with the commit/abort protocol, and a
micro-batch stream reader with offset tracking.

``synthetic_events`` is that connector over a deterministic generator:
row *i* is a pure integer-arithmetic function of *i* (splitmix-style
multiplicative hashes, no RNG state), so a DuckDB oracle reproduces the
full relation from ``range(n)`` and the driver's correctness gate can
hash-compare a query through the connector — a *green* connector row,
not a "blocked" one.

Scale posture: ``partitions()`` splits [0, n) into ``n_partitions``
contiguous ranges; each executor generates only its slice (same shape
as Spark's built-in ``range`` source). A Mongo/JDBC reader swaps the
range arithmetic for server-side cursors per split; the Spark side is
unchanged.
"""

from __future__ import annotations

import datetime
import glob
import json
import os
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# Knuth multiplicative hashes — the same constants the DuckDB oracle
# uses; every derived column stays in BIGINT (< 2^63) for n ≤ 2^31.
MUL_USER = 2654435761
MUL_VAL = 2246822519
USER_MOD = 997
VAL_MOD = 1_000_003
EVENT_TYPES = ("view", "click", "purchase", "share", "install")
BASE_EPOCH_S = 1_704_067_200  # 2024-01-01T00:00:00Z

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _row(i: int):
    return (
        i,
        datetime.datetime.fromtimestamp(BASE_EPOCH_S + i, datetime.timezone.utc).replace(
            tzinfo=None
        ),
        (i * MUL_USER) % USER_MOD,
        EVENT_TYPES[(i * MUL_VAL) % len(EVENT_TYPES)],
        ((i * MUL_VAL) % VAL_MOD) / 1000.0,
    )


def oracle_relation_sql(n_rows: int) -> str:
    """DuckDB SQL producing the identical relation from range(n)."""
    types_list = ", ".join(f"'{t}'" for t in EVENT_TYPES)
    return f"""
        SELECT i AS event_id,
               TIMESTAMP '2024-01-01 00:00:00' + i * INTERVAL 1 SECOND AS ts,
               (i * {MUL_USER}) % {USER_MOD} AS user_id,
               ([{types_list}])[1 + (i * {MUL_VAL}) % {len(EVENT_TYPES)}] AS event_type,
               ((i * {MUL_VAL}) % {VAL_MOD}) / 1000.0 AS value
        FROM range({n_rows}) t(i)
    """


@dataclass
class _RangePartition(InputPartition):
    start: int
    end: int


class SyntheticEventsReader(DataSourceReader):
    """Range reader with connector-side filter pushdown: event_id
    comparisons narrow the generated [lo, hi) BEFORE partition
    planning, so filtered reads plan fewer/smaller partitions — the
    same contract a Mongo/JDBC reader honors by turning pushed filters
    into server-side query predicates."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.n_partitions = int(options.get("n_partitions", 8))
        self.lo = 0
        self.hi = self.n_rows

    def pushFilters(self, filters):
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        # Eager accumulation, NOT a generator: the narrowing side
        # effects must run before Spark calls partitions(), and a
        # returned list guarantees that regardless of when (or whether)
        # the engine consumes the unsupported-filter iterator.
        unsupported = []
        for f in filters:
            col = f.attribute[0] if getattr(f, "attribute", None) else None
            # filters without an int literal (IsNotNull, ...) fall
            # through; type() is int excludes bool (a bool IS an int to
            # isinstance, but True/False are not row-range bounds)
            if col == "event_id" and type(getattr(f, "value", None)) is int:
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
            unsupported.append(f)  # Spark re-applies these post-scan
        return unsupported

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        step = max(1, -(-(hi - lo) // self.n_partitions)) if hi > lo else 1
        return [
            _RangePartition(a, min(a + step, hi)) for a in range(lo, hi, step)
        ] or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition):
        # Arrow-batch yield, not per-row tuples: the Python Data Source
        # contract accepts pyarrow.RecordBatch, which skips the
        # tuple→pickle→JVM row path entirely — the whole slice is
        # generated vectorized (numpy) and shipped as one Arrow buffer.
        # The stream reader below keeps tuple yields: its micro-batches
        # are rate-limited small, and the tuple path exercises the
        # other half of the API surface in tests.
        yield _arrow_batch(partition.start, partition.end)


def _arrow_batch(start: int, end: int):
    import numpy as np
    import pyarrow as pa

    i = np.arange(start, end, dtype=np.int64)
    return pa.RecordBatch.from_arrays(
        [
            pa.array(i),
            pa.array((BASE_EPOCH_S + i) * 1_000_000).cast(
                pa.timestamp("us")
            ),
            pa.array((i * MUL_USER) % USER_MOD),
            pa.array(np.asarray(EVENT_TYPES)[(i * MUL_VAL) % len(EVENT_TYPES)]),
            pa.array(((i * MUL_VAL) % VAL_MOD) / 1000.0),
        ],
        names=["event_id", "ts", "user_id", "event_type", "value"],
    )


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Micro-batch source: offsets are plain row indices; each batch
    advances by ``rows_per_batch``. Same executor-side range reads as
    the batch path — the planner calls ``partitions(start, end)`` per
    batch and ships only the slice bounds."""

    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 10_000))
        self.rows_per_batch = int(options.get("rows_per_batch", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))
        self._pos = 0

    def initialOffset(self):
        return {"index": 0}

    def latestOffset(self):
        # Rate limit HERE, not in partitions(): the engine commits the
        # whole [start, latestOffset) range per micro-batch, so any rows
        # clamped away inside partitions() would be skipped forever.
        self._pos = min(self.n_rows, self._pos + self.rows_per_batch)
        return {"index": self._pos}

    def partitions(self, start, end):
        lo, hi = int(start["index"]), int(end["index"])
        step = max(1, -(-(hi - lo) // self.n_partitions)) if hi > lo else 1
        return [
            _RangePartition(a, min(a + step, hi)) for a in range(lo, hi, step)
        ] or [_RangePartition(lo, lo)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield _row(i)

    def commit(self, end):
        pass


@dataclass
class _JsonCommit(WriterCommitMessage):
    path: str
    part: int
    rows: int


class JsonLinesWriter(DataSourceWriter):
    """Per-partition JSON-lines files with the two-phase commit the API
    prescribes: tasks write attempt files and return commit messages;
    the driver's ``commit`` renames winners into place, ``abort``
    removes strays — the same contract a Mongo/JDBC bulk writer keeps
    with transactions."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonlines writer requires a 'path' option")
        self.overwrite = overwrite

    def write(self, iterator):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        part = ctx.partitionId() if ctx is not None else 0
        # Attempt files are keyed by (partition, taskAttemptId): a
        # retried or speculative attempt writes its OWN file, so
        # concurrent attempts never interleave into one path. Only the
        # winning attempt's message reaches commit(); losers' files are
        # swept by the glob in commit()/abort().
        attempt_id = ctx.taskAttemptId() if ctx is not None else 0
        attempt = os.path.join(
            self.path, f"_attempt-part-{part:05d}-{attempt_id}.jsonl"
        )
        os.makedirs(self.path, exist_ok=True)
        n = 0
        with open(attempt, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict(), default=str) + "\n")
                n += 1
        return _JsonCommit(path=attempt, part=part, rows=n)

    def _sweep_strays(self):
        # Failed/zombie attempts return no commit message, so their
        # files are invisible to the messages list — remove by glob.
        for stray in glob.glob(os.path.join(self.path, "_attempt-*")):
            try:
                os.remove(stray)
            except OSError:
                pass

    def commit(self, messages):
        for m in messages:
            final = os.path.join(self.path, f"part-{m.part:05d}.jsonl")
            os.replace(m.path, final)
        self._sweep_strays()

    def abort(self, messages):
        self._sweep_strays()


class SyntheticEventsDataSource(DataSource):
    @classmethod
    def name(cls):
        return "synthetic_events"

    def schema(self):
        return SCHEMA

    def reader(self, schema):
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema):
        return SyntheticEventsStreamReader(self.options)

    def writer(self, schema, overwrite):
        return JsonLinesWriter(self.options, overwrite)


def register_datasource(spark) -> None:
    # The reader implements pushFilters(); Spark refuses to initialize
    # such a reader unless python filter pushdown is enabled, so the
    # registration helper turns it on (runtime SQL conf) — REQUIRED for
    # vanilla sessions (the external driver's) that lack session.py
    # defaults.
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(SyntheticEventsDataSource)


# ---------------------------------------------------------------------------
# Driver-facing query: aggregate THROUGH the connector. The oracle
# rebuilds the identical relation from range(n) — so a green row here
# certifies the whole connector read path (partition planning, executor
# generation, type mapping) end-to-end.
# ---------------------------------------------------------------------------

from pyspark.sql import DataFrame, SparkSession, functions as F  # noqa: E402

from algorithmproject_spark_spark.registry import register  # noqa: E402

_QUERY_N_ROWS = 20_000


@register(
    "pyds_synthetic_events_agg",
    plan=("arrow",),
    oracle=f"""
    WITH ev AS ({oracle_relation_sql(_QUERY_N_ROWS)})
    SELECT event_type,
           count(*) AS n,
           CAST(sum((event_id * {MUL_VAL}) % {VAL_MOD}) AS BIGINT) AS sum_val_e3,
           min(event_id) AS min_id,
           max(event_id) AS max_id,
           count(DISTINCT user_id) AS n_users,
           count(*) FILTER (WHERE value > 500.0) AS n_high,
           min(ts) AS first_ts,
           max(ts) AS last_ts
    FROM ev
    GROUP BY event_type
    """,
    doc="per-type rollup read through the synthetic_events Python Data "
    "Source (planned range partitions, executor-side generation); "
    "oracle reconstructs the relation from range(n)",
)
def pyds_synthetic_events_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_datasource(spark)
    ev = (
        spark.read.format("synthetic_events")
        .option("n_rows", _QUERY_N_ROWS)
        .option("n_partitions", 8)
        .load()
    )
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_id") * F.lit(MUL_VAL)) % F.lit(VAL_MOD)).alias("sum_val_e3"),
        F.min("event_id").alias("min_id"),
        F.max("event_id").alias("max_id"),
        F.countDistinct("user_id").alias("n_users"),
        F.count(F.when(F.col("value") > 500.0, 1)).alias("n_high"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
    )
