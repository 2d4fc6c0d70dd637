from blq_cli_spark.functions.scalar import (  # noqa: F401
    age_seconds,
    completed_at,
    elapsed_ms,
    location,
    ref_string,
    short_fingerprint,
    status_badge,
    status_of,
)
