"""Build a SKEWED twin of sf0.1 for the full-registry oracle sweep.

The committed sweeps (sf0.01 / sf0.1 / sf1, plus empty/mini edge
fixtures) all run on the driver's UNIFORM synthetic data; 100 TB
reality is Zipf-distributed keys. The engine carries explicit skew
machinery — salted joins (operators/skew.py), AQE skew-join, the
SemDeDup oversized-cell subcell split, WindowGroupLimit-pruned top-k —
and this fixture exists to prove all of it against the DuckDB oracle
once per round: same schemas, same row counts, FK-consistent, but with
deterministic hot keys.

Skew model (all remaps deterministic expressions of existing keys, so
both engines read identical parquet and repeated generation is
byte-stable):

- events.user_id: Zipf-ish head — user 0 gets ~3% of all events,
  user 1 ~1.5%, user 2 ~1% (a 45x/22x/15x multiple of the uniform
  per-user mean), tail untouched. Stresses per-user windows, session
  cuts, funnel/CEP state sizes, groupBy skew.
- orders.o_custkey: same head shape onto customers 0/1/2 — stresses
  customer join fan-out and per-customer top-N windows.
- lineitem.l_partkey / l_suppkey: ~3% of lines onto part 0 (600x the
  uniform mean) and ~3% onto supplier 0 — stresses the part/supplier
  join+agg family and the join_blowup_estimate Σc² arithmetic.
- documents.source: ~40% of docs collapse onto 'src0' — group-by and
  stratified-sampling skew.
- embeddings: vec_id % 10 < 3 (30% of vectors) become NEAR-COPIES of
  vector 0's embedding, each perturbed per (row, dim) by a multiple of
  ~1.1e-3 (several 1/1024 quantization steps, so the residual-parity
  subcell code still varies inside the hot cluster — the exact regime
  tests/test_semdedup_skew.py pins). One IVF cell swallows ~30% of the
  corpus and the subcell split MUST engage for semantic dedup and
  knn_label_noise to stay bounded.

Usage:
    python tools/make_skew.py                      # -> /tmp/spark_graft_skew
    ORACLE_CHECK_JSON=ORACLE_FULL_SKEW_r08.json \
        python tools/oracle_check.py /tmp/spark_graft_skew
"""

from __future__ import annotations

import os
import sys

import duckdb

BASE = os.environ.get("SPARK_GRAFT_SKEW_BASE", "/root/testdata/sf0.1")
OUT = os.environ.get("SPARK_GRAFT_SKEW_DIR", "/tmp/spark_graft_skew")

# untouched tables: dimensions stay uniform (hot FACT keys are the
# production skew mode; dimensions are small and broadcast anyway)
VERBATIM = ("region", "nation", "customer", "part", "supplier")


def _src(table: str) -> str:
    return f"read_parquet('{BASE}/{table}.parquet')"


def _zipf_head(key_expr: str, orig: str) -> str:
    """Route ~3% / 1.5% / 1% of rows (by a deterministic row hash) to
    keys 0 / 1 / 2, keep the original key for the rest."""
    h = f"(({key_expr}) * 2654435761 % 1000 + 1000) % 1000"
    return (
        f"CASE WHEN {h} < 30 THEN 0 "
        f"WHEN {h} < 45 THEN 1 "
        f"WHEN {h} < 55 THEN 2 "
        f"ELSE {orig} END"
    )


def build(out_dir: str = OUT) -> str:
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
            for r in con.execute(f"DESCRIBE SELECT * FROM {_src(t)}").fetchall()
        ]
        write(t, f"SELECT * FROM {_src(t)} ORDER BY {cols[0]}")

    write(
        "events",
        f"""
        SELECT event_id, ts,
               CAST({_zipf_head('event_id', 'user_id')} AS BIGINT) AS user_id,
               event_type, value, props
        FROM {_src('events')} ORDER BY event_id
        """,
    )
    write(
        "orders",
        f"""
        SELECT o_orderkey,
               CAST({_zipf_head('o_orderkey', 'o_custkey')} AS BIGINT)
                   AS o_custkey,
               o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
        FROM {_src('orders')} ORDER BY o_orderkey
        """,
    )
    write(
        "lineitem",
        f"""
        SELECT l_orderkey,
               CAST(CASE WHEN (l_orderkey * 2654435761 + l_linenumber)
                              % 1000 < 30
                         THEN 0 ELSE l_partkey END AS BIGINT) AS l_partkey,
               CAST(CASE WHEN (l_orderkey * 2654435761 + l_linenumber * 7)
                              % 1000 < 30
                         THEN 0 ELSE l_suppkey END AS BIGINT) AS l_suppkey,
               l_linenumber, l_quantity, l_extendedprice, l_discount,
               l_tax, l_returnflag, l_linestatus, l_shipdate
        FROM {_src('lineitem')} ORDER BY l_orderkey, l_linenumber
        """,
    )
    write(
        "documents",
        f"""
        SELECT doc_id, text, lang,
               CASE WHEN doc_id % 10 < 4 THEN 'src0' ELSE source END
                   AS source,
               n_chars
        FROM {_src('documents')} ORDER BY doc_id
        """,
    )
    # 30% of vectors collapse into a near-duplicate cluster around
    # vector 0: per-(row, dim) perturbation of ~1.1e-3 spreads the
    # residual-parity code while cosine stays ~1 inside the cluster
    write(
        "embeddings",
        f"""
        WITH v0 AS (
            SELECT embedding AS e0 FROM {_src('embeddings')} WHERE vec_id = 0
        )
        SELECT vec_id,
               CAST(CASE WHEN vec_id % 10 < 3 THEN
                        list_transform(e0, (x_, i_) ->
                            x_ + ((vec_id * 31 + i_ * 7) % 13 - 6) * 0.0011)
                    ELSE embedding END AS FLOAT[]) AS embedding,
               label
        FROM {_src('embeddings')} CROSS JOIN v0
        ORDER BY vec_id
        """,
    )
    con.close()
    return out_dir


if __name__ == "__main__":
    out = sys.argv[1] if len(sys.argv) > 1 else OUT
    build(out)
    print(f"skew fixtures at {out}")
