"""Nested-data & scalar-surface queries — SURVEY.md §2.8 F4/F11/F12/F13
and §2.2 P8/P9.

- ``nested_struct_ops``: ``from_json`` with a declared schema
  (``nlp/NewsSchemaParser.scala:66-93`` — the reference's better path vs
  the rejected get_json_object variant), then Spark 3.1+ native
  ``withField``/``dropFields`` replacing the reference's 53-line
  recursive struct rebuild (``utils/DataFrameUtils.scala:22-74``), and
  ``F.struct`` reassembly (``mongodb/CMS2MarkTestDataV1.scala:180-186``).
- ``url_domain_extract``: host + second-level-domain extraction
  (``label/dataextractor/URLandSearchwordExtractor.scala:94-126`` uses
  java.net.URI + Guava; here pure regexp/split column expressions).
- ``map_column_funcs``: map-typed column construction and key/value
  access (``short_video/ReadAppPortrait.scala:30-34`` parses maps in a
  UDF; native create_map/map_keys here).
- ``regexp_extract_tokens``: regexp_extract_all battery
  (``nlp/NewsNgrams.scala:244-289`` runs Scala Regex.findAllIn in RDD
  maps; native since Spark 3.1).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from algorithmproject_spark_spark.registry import register
from algorithmproject_spark_spark.sources.catalog import load_table


@register(
    "nested_struct_ops",
    oracle="""
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) * 2 AS k2,
           event_type AS reassembled_type,
           CAST(json_extract(props, '$.k') AS BIGINT) AS payload_k
    FROM events WHERE event_id < 100
    """,
    doc="F4/P6/P8/P9: from_json declared schema → withField → dropFields "
    "→ struct reassembly → flatten",
)
def nested_struct_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    parsed = ev.select(
        "event_id",
        "event_type",
        F.from_json(F.col("props"), "k bigint").alias("p"),
    )
    # withField adds a derived field; dropFields removes the original —
    # the 53-line recursive rebuild in DataFrameUtils.scala is 2 calls.
    reshaped = parsed.select(
        "event_id",
        "event_type",
        F.col("p").withField("k2", F.col("p.k") * 2).dropFields("k").alias("p2"),
        F.struct(
            F.col("event_type").alias("t"), F.col("p.k").alias("k")
        ).alias("re"),
    )
    return reshaped.select(
        "event_id",
        F.col("p2.k2").alias("k2"),
        F.col("re.t").alias("reassembled_type"),
        F.col("re.k").alias("payload_k"),
    )


@register(
    "url_domain_extract",
    oracle="""
    WITH u AS (
        SELECT doc_id,
               'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR) AS url
        FROM documents
    ),
    h AS (SELECT doc_id, url, regexp_extract(url, 'https?://([^/]+)', 1) AS host FROM u)
    SELECT doc_id, host,
           string_split(host, '.')[-2] || '.' || string_split(host, '.')[-1] AS sld
    FROM h
    """,
    doc="F13: host + second-level domain via regexp/split (no UDF, no Guava)",
)
def url_domain_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://"),
        F.col("source"),
        F.lit(".example.com/docs/"),
        F.col("doc_id").cast("string"),
    )
    host = F.regexp_extract(url, r"https?://([^/]+)", 1)
    parts = F.split(host, r"\.")
    sld = F.concat(
        F.element_at(parts, -2), F.lit("."), F.element_at(parts, -1)
    )
    return docs.select("doc_id", host.alias("host"), sld.alias("sld"))


@register(
    "map_column_funcs",
    oracle="""
    SELECT event_id,
           2 AS n_keys,
           'type,user' AS keys_csv,
           event_type AS type_val,
           CAST(user_id AS VARCHAR) AS user_val
    FROM events WHERE event_id < 100
    """,
    doc="F11: create_map / map_keys / element_at on a map-typed column "
    "(oracle checks the extracted values, not the representation)",
)
def map_column_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    m = F.create_map(
        F.lit("type"), F.col("event_type"),
        F.lit("user"), F.col("user_id").cast("string"),
    )
    with_map = ev.select("event_id", m.alias("m"))
    return with_map.select(
        "event_id",
        F.size("m").alias("n_keys"),
        F.array_join(F.array_sort(F.map_keys("m")), ",").alias("keys_csv"),
        F.element_at(F.col("m"), F.lit("type")).alias("type_val"),
        F.element_at(F.col("m"), F.lit("user")).alias("user_val"),
    )


@register(
    "regexp_extract_tokens",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '\b[a-z]*e\b')) AS n_e_tokens,
           len(list_distinct(regexp_extract_all(text, '\b[a-z]*e\b'))) AS n_distinct,
           COALESCE(regexp_extract_all(text, '\b[a-z]*e\b')[1], '') AS first_hit
    FROM documents
    """,
    doc="F12: regexp_extract_all battery (tokens ending in 'e') — native "
    "column expr replacing RDD-map Regex.findAllIn",
)
def regexp_extract_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    hits = F.regexp_extract_all(F.col("text"), F.lit(r"\b[a-z]*e\b"), 0)
    return docs.select(
        "doc_id",
        F.size(hits).alias("n_e_tokens"),
        F.size(F.array_distinct(hits)).alias("n_distinct"),
        F.coalesce(F.try_element_at(hits, F.lit(1)), F.lit("")).alias("first_hit"),
    )
