"""Scalar helpers from the reference's macro library, as pure Column
expressions (no UDF serialization cost — §2.11 of SURVEY.md).

Each function cites the reference macro it re-expresses.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column


def location(ref_file: Column, ref_line: Column, ref_column: Column) -> Column:
    """`blq_location(file,line,col)` -> "f:15:5" with null guards
    (reference bird_schema.sql:723-726, schema.sql:300-303)."""
    return F.when(ref_file.isNull(), F.lit(None).cast("string")).otherwise(
        F.concat_ws(
            ":",
            ref_file,
            F.when(ref_line.isNotNull(), ref_line.cast("string")),
            F.when(ref_line.isNotNull() & ref_column.isNotNull(), ref_column.cast("string")),
        )
    )


def short_fingerprint(fp: Column, n: int = 8) -> Column:
    """`blq_short_fp` — compact fingerprint display: first segment
    truncated (reference schema.sql:306-309)."""
    return F.when(fp.isNull(), F.lit(None).cast("string")).otherwise(
        F.substring(F.split_part(fp, F.lit("_"), F.lit(1)), 1, n)
    )


def ref_string(tag: Column, run_serial: Column, event_index: Column | None = None) -> Column:
    """Display ref `tag:serial[:event]`, falling back to `~serial` when the
    run is untagged (reference ref-building CASE, bird_schema.sql:304-312;
    ref grammar src/blq/services/refs.py:24-139)."""
    base = F.when(tag.isNotNull(), F.concat_ws(":", tag, run_serial.cast("string"))).otherwise(
        F.concat(F.lit("~"), run_serial.cast("string"))
    )
    if event_index is None:
        return base
    return F.when(
        event_index.isNotNull(), F.concat_ws(":", base, event_index.cast("string"))
    ).otherwise(base)


def status_badge(exit_code: Column) -> Column:
    """`blq_status_badge`: exit code -> ok/fail/error badge
    (reference bird_schema.sql:423-430)."""
    return (
        F.when(exit_code.isNull(), F.lit("?"))
        .when(exit_code == 0, F.lit("ok"))
        .when(exit_code < 0, F.lit("killed"))
        .otherwise(F.lit("fail"))
    )


def status_of(outcome_attempt_id: Column, exit_code: Column) -> Column:
    """Three-way attempt status from the attempts⟕outcomes join: no outcome
    row -> pending; outcome with NULL exit -> orphaned; else completed
    (reference status CASE, bird_schema.sql:399-404)."""
    return (
        F.when(outcome_attempt_id.isNull(), F.lit("pending"))
        .when(exit_code.isNull(), F.lit("orphaned"))
        .otherwise(F.lit("completed"))
    )


def completed_at(timestamp: Column, duration_ms: Column) -> Column:
    """Reconstruct completion time: ts + duration interval (reference
    `timestamp + INTERVAL (duration_ms/1000) SECOND`, bird_schema.sql:319,441)."""
    return F.when(
        duration_ms.isNotNull(),
        F.timestamp_micros(F.unix_micros(timestamp) + duration_ms * 1000),
    )


def elapsed_ms(now: Column, started_at: Column) -> Column:
    """Elapsed milliseconds for running commands (reference
    `EXTRACT(EPOCH FROM (now()-started_at))*1000`, bird_schema.sql:509-513)."""
    return ((F.unix_micros(now) - F.unix_micros(started_at)) / 1000).cast("long")


def age_seconds(now: Column, ts: Column) -> Column:
    """Age in seconds for display (reference `age(a,b)` usage,
    bird_schema.sql:587,634)."""
    return ((F.unix_micros(now) - F.unix_micros(ts)) / 1_000_000).cast("long")
