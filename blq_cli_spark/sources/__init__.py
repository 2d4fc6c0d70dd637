from blq_cli_spark.sources.tables import TABLES, table  # noqa: F401
