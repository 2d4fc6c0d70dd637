from blq_cli_spark.plans.dsl import parse_filter_expression  # noqa: F401
from blq_cli_spark.plans.query import LogQuery  # noqa: F401
