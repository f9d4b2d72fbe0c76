"""Streaming quality-score band histogram — live monitoring of the
model-based quality filter (12th streaming twin).

An ingest pipeline scoring documents with the frozen quality head
(queries/qualitymodel.py) wants the SCORE DISTRIBUTION tracked as
documents arrive — a collapsing band histogram is how a curation run
notices a bad crawl batch (mass shifting into low bands) before the
keep-rate moves. The per-(lang, band) counts are a single streaming
groupBy whose aggregation state is bounded at |langs| x 11 rows, and
counting is order-insensitive: after any arrival order of the same
documents the complete-mode snapshot equals the batch twin exactly.

One definition — :func:`quality_bands` — feeds the batch query, the
DuckDB oracle, and this stream: zero drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from algorithmproject_spark_spark.queries.qualitymodel import quality_bands


def quality_bands_batch(docs: DataFrame) -> DataFrame:
    """Batch form of the streaming histogram:
    (lang, band, n_docs, n_keep)."""
    return quality_bands(docs)


def quality_bands_stream(doc_stream: DataFrame) -> DataFrame:
    """The same plan over a streaming frame — run with
    ``outputMode('complete')``; state is the per-(lang, band)
    counters, ≤ |langs| x 11 rows."""
    return quality_bands(doc_stream)
