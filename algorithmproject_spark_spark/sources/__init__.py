from algorithmproject_spark_spark.sources.catalog import TABLES, load_table, register_views  # noqa: F401
