"""Build sf1 fixtures (10x sf0.1) for the full-registry oracle sweep.

The sf0.1 sweep caught a real scale-only bug (range-sampling gapped
global index) that sf0.01 could not; this tool makes the next decade of
scale available as a bug-finder. /root/testdata is read-only, so the
tables land in /tmp/spark_graft_sf1 — regenerate any time with
``python tools/make_sf1.py``; the sweep artifact committed per round is
``ORACLE_FULL_SF1_r{N}.json``.

Growth model (same rationale as tools/scale_sweep.py): tile sf0.1 ten
times with per-copy key offsets using the tables' dense 0-based key
strides, so the result looks like a natural 10x generation —
referential integrity holds, per-key group sizes stay constant where
the entity count grows (customers, users, docs, vectors) and grow 10x
where the dimension is fixed (per-part/per-supplier line counts — the
TPC-H growth mode). Content uniqueness:

- documents: copies k>0 suffix every token with ``_k`` so copies share
  no shingles — near-dup cluster STRUCTURE repeats per copy (cluster
  count linear, size fixed). Naive duplication would grow cluster
  sizes and push every LSH pair join quadratic by construction.
- embeddings: copy k rotates the 16-dim vector by k positions —
  norm-preserving, deterministic, no exact-duplicate vectors across
  copies (which would inflate semantic-dedup cells superlinearly).
- events: user_id offset per copy keeps per-user session/funnel state
  constant while volume grows; timestamps untouched (density in the
  same time range grows 10x, the streaming-backfill growth mode).

Correctness at sf1 is still Spark-vs-DuckDB over the SAME parquet, so
the exact content is free to differ from a hypothetical driver sf1 —
what matters is deterministic, FK-consistent, linearly-grown data.

Everything is plain deterministic SQL; rows are ORDER BY'd so repeated
generation is byte-stable.
"""

from __future__ import annotations

import os
import sys

import duckdb

BASE = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/spark_graft_sf1")
COPIES = 10

# dense 0-based key domains at sf0.1 (verified against the parquet)
STRIDE = {
    "c_custkey": 15_000,
    "o_orderkey": 150_000,
    "l_orderkey": 150_000,
    "event_id": 100_000,
    "user_id": 1_500,
    "doc_id": 5_000,
    "vec_id": 2_000,
}

# Tables copied through unchanged: fixed-size dimensions are the 100 TB
# reality (per-part / per-supplier fact counts grow instead).
VERBATIM = ("region", "nation", "part", "supplier")


def _src(table: str) -> str:
    return f"read_parquet('{BASE}/{table}.parquet')"


def _tiled(table: str, select_k: str, order: str) -> str:
    """SELECT tiling `table` x COPIES with per-copy expressions that
    may reference `k` (the copy index)."""
    return f"""
    SELECT {select_k}
    FROM {_src(table)} CROSS JOIN (SELECT unnest(range({COPIES})) AS k) copies
    ORDER BY {order}
    """


def build(out_dir: str = OUT, copies: int = COPIES) -> str:
    os.makedirs(out_dir, exist_ok=True)
    con = duckdb.connect()
    con.execute("SET threads TO 8")

    def write(table: str, sql: str) -> None:
        dest = f"{out_dir}/{table}.parquet"
        con.execute(f"COPY ({sql}) TO '{dest}' (FORMAT PARQUET)")
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{dest}')"
        ).fetchone()[0]
        print(f"{table}: {n} rows")

    for t in VERBATIM:
        cols = [
            r[0]
            for r in con.execute(
                f"DESCRIBE SELECT * FROM {_src(t)}"
            ).fetchall()
        ]
        write(t, f"SELECT * FROM {_src(t)} ORDER BY {cols[0]}")

    write(
        "customer",
        _tiled(
            "customer",
            f"c_custkey + k * {STRIDE['c_custkey']} AS c_custkey, "
            "c_name, c_nationkey, c_acctbal, c_mktsegment",
            "c_custkey",
        ),
    )
    write(
        "orders",
        _tiled(
            "orders",
            f"o_orderkey + k * {STRIDE['o_orderkey']} AS o_orderkey, "
            f"o_custkey + k * {STRIDE['c_custkey']} AS o_custkey, "
            "o_orderstatus, o_totalprice, o_orderdate, o_orderpriority",
            "o_orderkey",
        ),
    )
    # l_partkey / l_suppkey unchanged: fixed part/supplier dims, their
    # per-key line counts grow 10x (the TPC-H fact-growth mode)
    write(
        "lineitem",
        _tiled(
            "lineitem",
            f"l_orderkey + k * {STRIDE['l_orderkey']} AS l_orderkey, "
            "l_partkey, l_suppkey, l_linenumber, l_quantity, "
            "l_extendedprice, l_discount, l_tax, l_returnflag, "
            "l_linestatus, l_shipdate",
            "l_orderkey, l_linenumber",
        ),
    )
    write(
        "events",
        _tiled(
            "events",
            f"event_id + k * {STRIDE['event_id']} AS event_id, ts, "
            f"user_id + k * {STRIDE['user_id']} AS user_id, "
            "event_type, value, props",
            "event_id",
        ),
    )
    write(
        "documents",
        _tiled(
            "documents",
            f"doc_id + k * {STRIDE['doc_id']} AS doc_id, "
            "CASE WHEN k = 0 THEN text "
            r"     ELSE regexp_replace(text, '([^ ]+)', '\1_' || k, 'g') "
            "END AS text, lang, source, n_chars",
            "doc_id",
        ),
    )
    # rotate by k positions (k < dim): norm-preserving, no cross-copy
    # exact duplicates; len()-based slicing keeps the full dimension
    write(
        "embeddings",
        _tiled(
            "embeddings",
            f"vec_id + k * {STRIDE['vec_id']} AS vec_id, "
            "CAST(CASE WHEN k = 0 THEN embedding "
            "          ELSE list_concat(embedding[k+1:len(embedding)], "
            "                           embedding[1:k]) "
            "END AS FLOAT[]) AS embedding, label",
            "vec_id",
        ),
    )
    con.close()
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else OUT
    build(out)
    print(f"sf1 fixtures at {out}")
