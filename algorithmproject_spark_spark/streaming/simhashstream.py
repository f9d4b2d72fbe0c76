"""Streaming SimHash near-duplicate filtering — the incremental form
of the batch banded-Hamming family (queries/dedup.py's
``simhash_hamming_pairs``), the 15th stateful batch-twin and the
flavor-symmetric sibling of streaming/neardup.py's MinHash filter.
Reference context as for the batch family: the Scala repo outsources
near-dup entirely (``ArticleInfoProcess.scala:184-191``).

Contract, identical to the MinHash filter: keep a persistent store of
the SURVIVORS' band rows (31-bit vote blocks of the 124-bit
fingerprint), and admit a new document only if no band collision — with
the store or with an earlier-id document of the same batch — survives
the exact Hamming ≤ SIMHASH_K verify. Dropped documents never enter
the store, so the store is exactly the kept corpus and a within-batch
near-dup cluster keeps exactly its minimum id.

Scale shape per micro-batch: the fingerprint pass is the shared
map-only Arrow kernel (``_fp124_batches``), candidate generation is an
equi-join on (band_idx, band_key) with 31-bit key entropy — linear in
batch size, never corpus-sized — and verification is two integer
``bit_count(xor)`` ops per candidate. State is append-only parquet
(4 band rows × 24 B per survivor), date-partitionable for retention.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from algorithmproject_spark_spark.functions.hashing import (
    ss_token_hash_array,
)
from algorithmproject_spark_spark.queries.dedup import (
    SIMHASH_K,
    _fp124_batches,
    fp124_bands,
)

_HAM = "bit_count(lo_a ^ lo_b) + bit_count(hi_a ^ hi_b)"


def simhash_band_state(docs: DataFrame) -> DataFrame:
    """(doc_id, fp_lo, fp_hi, band_idx, band_key) for a document set —
    the join-ready store representation; fingerprints from the SAME
    Arrow kernel as the batch pair query, so batch and stream agree
    bit-for-bit."""
    # one-parse text twin of the token-hash fold (r12)
    th = F.expr(ss_token_hash_array("split(text, ' ')"))
    fps = docs.select("doc_id", th.alias("th")).mapInPandas(
        _fp124_batches, schema="doc_id long, fp_lo long, fp_hi long"
    )
    return fp124_bands(fps)


def _hamming_hits(pairs: DataFrame) -> DataFrame:
    """doc_ids of the left side whose fingerprint is within
    SIMHASH_K of the matched right side."""
    ham = F.expr(_HAM).cast("long")
    return pairs.where(ham <= F.lit(SIMHASH_K)).select("doc_id").distinct()


def _verified_hits(probe: DataFrame, store: DataFrame) -> DataFrame:
    """doc_ids of ``probe`` with a band collision against ``store``
    within Hamming SIMHASH_K."""
    # verify BEFORE deduplicating: the Hamming check is two integer
    # bit_counts per candidate, far cheaper than exchanging the wide
    # (doc_id, 4×fp) rows through a distinct — dropping the pre-verify
    # distinct removes one full wide-row Exchange; multi-band
    # collisions of the same pair just re-verify map-side and collapse
    # in _hamming_hits' narrow doc_id distinct (r12, guide §2.3/2.4)
    cand = probe.select(
        "doc_id",
        F.col("fp_lo").alias("lo_a"),
        F.col("fp_hi").alias("hi_a"),
        "band_idx",
        "band_key",
    ).join(
        store.select(
            "band_idx",
            "band_key",
            F.col("fp_lo").alias("lo_b"),
            F.col("fp_hi").alias("hi_b"),
        ),
        ["band_idx", "band_key"],
    )
    return _hamming_hits(cand)


def within_batch_drop_ids(bands: DataFrame) -> DataFrame:
    """Local-minima survivor rule over one document set: drop any doc
    within Hamming SIMHASH_K of a SMALLER doc_id — a within-batch
    near-dup cluster keeps exactly its min id, matching the batch
    cluster resolution. Band equi-join + bit_count verify, no O(n²)."""
    earlier = bands.select(
        "band_idx",
        "band_key",
        F.col("doc_id").alias("e_id"),
        F.col("fp_lo").alias("lo_b"),
        F.col("fp_hi").alias("hi_b"),
    )
    # no pre-verify distinct: see _verified_hits — the bit_count verify
    # is cheaper than a wide-row Exchange, and the final doc_id distinct
    # already collapses multi-band duplicates (r12)
    within = (
        bands.select(
            "doc_id",
            F.col("fp_lo").alias("lo_a"),
            F.col("fp_hi").alias("hi_a"),
            "band_idx",
            "band_key",
        )
        .join(earlier, ["band_idx", "band_key"])
        .filter(F.col("e_id") < F.col("doc_id"))
        .select("doc_id", "lo_a", "hi_a", "lo_b", "hi_b")
    )
    return _hamming_hits(within)


def process_simhash_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    out_dir: str,
    batch_id=None,
) -> None:
    """One micro-batch of the incremental filter (also the batch twin:
    calling this over ordered slices replays the stream exactly).
    With a ``batch_id`` both writes land in that batch's partition
    directory idempotently — a foreachBatch retry after a crash between
    the two writes rewrites rather than double-appends (ADVICE r10)."""
    from algorithmproject_spark_spark.cacheutil import scoped_local_checkpoint
    from algorithmproject_spark_spark.streaming.neardup import (
        _has_parquet,
        _store_without_batch,
        _write_batch_partition,
    )

    bands, release_bands = scoped_local_checkpoint(simhash_band_state(batch_df))
    dropped = None
    if _has_parquet(state_dir):
        store = _store_without_batch(spark.read.parquet(state_dir), batch_id)
        dropped = _verified_hits(bands, store)
    within_drop = within_batch_drop_ids(bands)
    drop_ids = (
        within_drop
        if dropped is None
        else dropped.unionAll(within_drop).distinct()
    )
    survivors = batch_df.join(drop_ids, "doc_id", "left_anti")
    _write_batch_partition(survivors, out_dir, batch_id)
    _write_batch_partition(
        bands.join(drop_ids, "doc_id", "left_anti"), state_dir, batch_id
    )
    # checkpoint blocks are fully consumed by the two writes — free
    # them now or a long-running stream accumulates one block set per
    # micro-batch (ADVICE r8 class, same as neardup.py)
    release_bands()


def simhash_filter_stream(
    docs_stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint: str,
) -> StreamingQuery:
    """Start the incremental SimHash near-dup filter over a streaming
    frame with (doc_id, text, ...) columns."""
    spark = docs_stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_simhash_batch(
            spark, batch_df, state_dir, out_dir, batch_id=batch_id
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
