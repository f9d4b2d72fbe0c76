"""algorithmproject_spark_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capability surface of
ZouJoshua/AlgorithmProject-spark (a Scala/Spark-2.2 batch ETL + NLP job
suite): relational operators, I/O connectors, text-analytics kernels
(TF-IDF / TextRank / RAKE / n-grams / dedup), and streaming facades —
built as a composable DataFrame operator library instead of 79
copy-pasted spark-submit mains.

Design rules (SURVEY.md §4, §7):
- declare logical plans with the DataFrame/SQL API; let Catalyst + AQE
  pick physical strategy (no hand-scheduling, no driver-side loops);
- built-in ``pyspark.sql.functions`` first; Arrow-vectorized pandas
  UDFs only for genuinely non-relational kernels; row-python never in
  hot paths;
- every operator is shuffle-partition-count agnostic and designed for
  a multi-executor cluster even though tests run on local[N].
"""

__version__ = "0.1.0"

from algorithmproject_spark_spark.session import get_spark  # noqa: F401
