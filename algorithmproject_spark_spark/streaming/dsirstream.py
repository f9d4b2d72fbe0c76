"""Streaming DSIR bucket histograms — importance weights as a live
aggregation snapshot.

The batch scorer (queries/dsir.py) builds target/raw hashed-unigram
histograms in one conditional-count aggregation; an ingest pipeline
wants those histograms to TRACK the corpus as documents arrive, so new
batches can be scored against up-to-date weights without a re-scan.
Because ``bucket_weights`` is a single groupBy over the token-bucket
stream, Structured Streaming keeps the two counters per bucket as
native aggregation state — bounded at N_BUCKETS rows total, the
cheapest state shape there is — and every micro-batch emits the
refreshed (b, raw_b, tgt_b, w_ppm) snapshot in complete mode.

Convergence contract: counts are monotone, and after ANY arrival order
of the same documents the final snapshot equals the batch relation
exactly (counting is order-insensitive; the ppm weight is a pure
function of the counts). The cross-batch-seam test pins this against
the batch twin. One definition — queries/dsir.py — feeds the batch
query, the DuckDB oracle, and this stream: zero drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from algorithmproject_spark_spark.queries.dsir import (
    bucket_weights,
    token_buckets,
)


def dsir_weights_batch(docs: DataFrame) -> DataFrame:
    """Batch form of the streaming histogram: (b, raw_b, tgt_b, w_ppm)."""
    return bucket_weights(token_buckets(docs))


def dsir_weights_stream(doc_stream: DataFrame) -> DataFrame:
    """The same plan over a streaming frame — run with
    ``outputMode('complete')``; the aggregation state is the two
    bucket counters, ≤ N_BUCKETS rows."""
    return bucket_weights(token_buckets(doc_stream))
