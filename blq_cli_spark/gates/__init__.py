"""Import every gate module so the registry is fully populated."""

from blq_cli_spark.gates import (  # noqa: F401
    aggs,
    analytics_ext,
    context_ops,
    events_ts,
    llmdata,
    multimodal_gates,
    parsing,
    relational,
    scalar_fns,
    suites,  # must import after the member-gate modules it composes
    tpch,
    windows,
)
from blq_cli_spark.gates.registry import oracles, queries  # noqa: F401
