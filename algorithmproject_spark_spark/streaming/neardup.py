"""Streaming NEAR-duplicate filtering — the incremental form of the
batch MinHash-LSH family (queries/dedup.py), which itself natively
covers what the reference outsources to an external dedup service
(``ArticleInfoProcess.scala:184-191``).

A corpus ingest pipeline can't re-run batch LSH over 100 TB per
micro-batch; the incremental contract is: keep a persistent store of
the SURVIVORS' band keys + signatures, and admit a new document only if
no band collision with the store (or with an earlier-id document of the
same batch) survives signature verification. Dropped documents never
enter the store, so the store is exactly the kept corpus — the same
"cluster collapses to its minimum id" outcome the batch
``dedup_cluster_reps`` computes, arrived at greedily.

Mechanics per micro-batch (``foreachBatch``):

1. shingle → MinHash signature → banded keys for the batch (the same
   fixed affine permutations as the batch family, so batch and stream
   agree bit-for-bit on signatures);
2. equi-join batch bands against the store's bands on
   (band_idx, band_key) — incremental candidate generation is linear
   in batch size × collision rate, never corpus-sized;
3. verify candidates by estimated Jaccard: the fraction of agreeing
   MinHash positions (``min_agree`` of N_HASHES); drop verified hits;
4. within the batch, drop any document with a verified match of
   smaller doc_id (local-minima survivor rule — for a within-batch
   near-dup cluster this keeps exactly the min id, matching the batch
   cluster resolution);
5. append survivors to the output and their band rows to the store.

State is append-only parquet: no driver-side state, no per-key JVM
state store growth — the store scales like the deduplicated corpus and
can be date-partitioned for retention. Exactly-once appends come from
the foreachBatch checkpoint (batch id) as usual; replays of a batch
re-derive the same survivors because the rule is deterministic.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from algorithmproject_spark_spark.functions.hashing import (
    MINHASH_PARAMS,
    ss_bind,
    ss_gram_hash_array,
    ss_minhash_value,
    ss_token_hash_array,
)

# Mirrors queries/dedup.py (N_HASHES/BAND_ROWS/SHINGLE_N) so stream and
# batch signatures are interchangeable.
N_HASHES = 8
BAND_ROWS = 2
SHINGLE_N = 3
MIN_AGREE = 4  # ≥ 4/8 agreeing minhashes ≈ estimated Jaccard ≥ 0.5
_BAND_P = 2147483659


def doc_band_state(docs: DataFrame) -> DataFrame:
    """(doc_id, sig, band_idx, band_key) — one row per band, the
    join-ready store representation of a document set.

    Signature AND band keys are produced inside one bound lambda
    (struct of both), so the shingle fold and the 8 minhash folds run
    once per row — a naive two-select form lets CollapseProject inline
    the signature expression into every band-key reference. Built as
    one-parse SQL text (r12): the nested Column tower cost hundreds of
    py4j round-trips per build; the parsed tree has the same binds,
    folds and field names, so results are bit-identical."""
    sig_arr = (
        "array("
        + ", ".join(
            ss_minhash_value("sh_", a, b)
            for (a, b) in MINHASH_PARAMS[:N_HASHES]
        )
        + ")"
    )
    bands_arr = (
        "array("
        + ", ".join(
            f"element_at(sig_, {b * BAND_ROWS + 1}) * {_BAND_P} "
            f"+ element_at(sig_, {b * BAND_ROWS + 2})"
            for b in range(N_HASHES // BAND_ROWS)
        )
        + ")"
    )
    packed = F.expr(
        ss_bind(
            ss_token_hash_array("split(text, ' ')"),
            "th_",
            ss_bind(
                f"array_distinct({ss_gram_hash_array('th_', SHINGLE_N)})",
                "sh_",
                ss_bind(
                    sig_arr,
                    "sig_",
                    f"named_struct('sig', sig_, 'bands', {bands_arr})",
                ),
            ),
        )
    )
    return docs.select("doc_id", packed.alias("p")).select(
        "doc_id",
        F.col("p.sig").alias("sig"),
        F.posexplode("p.bands").alias("band_idx", "band_key"),
    )


def _verified_hits(
    probe: DataFrame, store: DataFrame, min_agree: int
) -> DataFrame:
    """doc_ids of ``probe`` with a band collision against ``store``
    whose signatures agree in ≥ min_agree positions."""
    # verify BEFORE deduplicating: the agree fold is a per-row array op,
    # far cheaper than exchanging (doc_id, 2×signature) rows through a
    # distinct — the final narrow doc_id distinct collapses multi-band
    # duplicates of the same pair (r12, guide §2.3/2.4)
    cand = probe.join(
        store.select(
            "band_idx",
            "band_key",
            F.col("doc_id").alias("hit_id"),
            F.col("sig").alias("hit_sig"),
        ),
        ["band_idx", "band_key"],
    ).select("doc_id", "sig", "hit_id", "hit_sig")
    agree = F.aggregate(
        F.zip_with(
            F.col("sig"),
            F.col("hit_sig"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return (
        cand.filter(agree >= min_agree).select("doc_id").distinct()
    )


def within_batch_drop_ids(bands: DataFrame, min_agree: int = MIN_AGREE) -> DataFrame:
    """Local-minima survivor rule over one document set: drop any doc
    with a verified match of smaller doc_id (a within-batch near-dup
    cluster keeps exactly its min id, matching the batch cluster
    resolution). Band equi-join + signature verify — linear, no O(n²)."""
    earlier = bands.select(
        "band_idx",
        "band_key",
        F.col("doc_id").alias("e_id"),
        F.col("sig").alias("e_sig"),
    )
    # no pre-verify distinct: see _verified_hits — multi-band duplicate
    # pairs re-verify map-side instead of paying a wide-row Exchange;
    # the final doc_id distinct collapses them (r12)
    within = (
        bands.join(earlier, ["band_idx", "band_key"])
        .filter(F.col("e_id") < F.col("doc_id"))
        .select(
            "doc_id",
            "sig",
            F.col("e_id").alias("hit_id"),
            F.col("e_sig").alias("hit_sig"),
        )
    )
    agree = F.aggregate(
        F.zip_with(
            F.col("sig"),
            F.col("hit_sig"),
            lambda x, y: F.when(x == y, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
        lambda acc, v: acc + v,
    )
    return within.filter(agree >= min_agree).select("doc_id").distinct()


def _has_parquet(d: str) -> bool:
    """True if the directory holds at least one COMMITTED parquet data
    file — ``os.path.exists`` alone is wrong once writes are
    partitioned: a retried EMPTY micro-batch leaves a ``batch_id=N``
    dir with only ``_SUCCESS`` and schema inference on it would fail.
    Hidden directories (``_temporary`` from a crashed write, ``.``
    staging dirs) are pruned during the walk (ADVICE r11):
    ``spark.read.parquet`` ignores ``_``/``.``-prefixed paths, so a
    file found only there must not route us into the read branch."""
    for root, dirs, files in os.walk(d):
        dirs[:] = [x for x in dirs if not x.startswith(("_", "."))]
        if any(
            f.endswith(".parquet") and not f.startswith(("_", "."))
            for f in files
        ):
            return True
    return False


def _write_batch_partition(df: DataFrame, base_dir: str, batch_id) -> None:
    """Idempotent micro-batch write: with a ``batch_id``, (over)write the
    ``batch_id=N`` partition directory — a RETRIED batch truncates and
    rewrites exactly its own partition (even to empty), so a crash
    between the survivor and state writes can never double-append
    (ADVICE r10). Without one (ad-hoc batch-twin replays), plain
    append, as before.

    The two modes produce INCOMPATIBLE directory layouts (ADVICE r11):
    partitioned dirs expose a ``batch_id`` column to readers, root-level
    appends do not, and mixing them under one ``base_dir`` breaks
    parquet partition discovery. A directory is therefore owned by
    whichever mode touched it first, asserted here; consumers of a
    streamed ``out_dir`` should expect the extra ``batch_id`` column."""
    partitioned = any(
        e.startswith("batch_id=")
        for e in (os.listdir(base_dir) if os.path.isdir(base_dir) else ())
    )
    if batch_id is None:
        assert not partitioned, (
            f"{base_dir} holds batch_id= partitions; appending "
            "root-level files to it would break partition discovery"
        )
        df.write.mode("append").parquet(base_dir)
    else:
        assert not (os.path.isdir(base_dir) and not partitioned and _has_parquet(base_dir)), (
            f"{base_dir} holds root-level appended files; writing "
            "batch_id= partitions into it would break partition discovery"
        )
        df.write.mode("overwrite").parquet(
            os.path.join(base_dir, f"batch_id={int(batch_id)}")
        )


def _store_without_batch(store: DataFrame, batch_id) -> DataFrame:
    """Drop the current batch's OWN partition from the store view: on a
    retry the partial previous attempt's band rows are already on disk
    and every document would otherwise collide with itself."""
    if batch_id is not None and "batch_id" in store.columns:
        store = store.filter(F.col("batch_id") != int(batch_id))
    return store


def process_near_dup_batch(
    spark: SparkSession,
    batch_df: DataFrame,
    state_dir: str,
    out_dir: str,
    min_agree: int = MIN_AGREE,
    batch_id=None,
) -> None:
    """One micro-batch of the incremental filter (also the batch twin:
    calling this over ordered slices replays the stream exactly)."""
    from algorithmproject_spark_spark.cacheutil import scoped_local_checkpoint

    bands, release_bands = scoped_local_checkpoint(doc_band_state(batch_df))
    dropped = None
    if _has_parquet(state_dir):
        store = _store_without_batch(spark.read.parquet(state_dir), batch_id)
        dropped = _verified_hits(bands, store, min_agree)
    within_drop = within_batch_drop_ids(bands, min_agree)
    drop_ids = (
        within_drop if dropped is None else dropped.unionAll(within_drop).distinct()
    )
    survivors = batch_df.join(drop_ids, "doc_id", "left_anti")
    _write_batch_partition(survivors, out_dir, batch_id)
    _write_batch_partition(
        bands.join(drop_ids, "doc_id", "left_anti"), state_dir, batch_id
    )
    # The checkpoint is fully consumed by the two writes above — free
    # its blocks NOW, or a long-running stream accumulates one block
    # set per micro-batch until the context dies (ADVICE r8 class).
    release_bands()


def near_dup_filter_stream(
    docs_stream: DataFrame,
    state_dir: str,
    out_dir: str,
    checkpoint: str,
    min_agree: int = MIN_AGREE,
) -> StreamingQuery:
    """Start the incremental near-dup filter over a streaming frame with
    (doc_id, text, ...) columns."""
    spark = docs_stream.sparkSession

    def _process(batch_df: DataFrame, batch_id: int) -> None:
        process_near_dup_batch(
            spark, batch_df, state_dir, out_dir, min_agree, batch_id=batch_id
        )

    return (
        docs_stream.writeStream.foreachBatch(_process)
        .option("checkpointLocation", checkpoint)
        .start()
    )
