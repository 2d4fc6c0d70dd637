"""StructTypes for the blq data model (SURVEY.md §1).

Mirrors the reference DDL: events (src/blq/bird_schema.sql:202-241), runs /
invocations (:130-175), attempts (:66-107), outcomes (:112-127), outputs
(:177-199), sessions (:40-58). Types per the mapping in SURVEY.md §1.2:
VARCHAR->String, UUID->String, JSON->String (open-ended) or
Map<String,String> (env/ci), TIMESTAMP->Timestamp, DATE->Date (partition
column on every table).
"""

from __future__ import annotations

from pyspark.sql.types import (
    BooleanType,
    DateType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


STR = StringType()
I32 = IntegerType()
I64 = LongType()
TS = TimestampType()
DT = DateType()
MAP_SS = MapType(StringType(), StringType())

# events: one parsed diagnostic (reference bird_schema.sql:202-241)
EVENTS_SCHEMA = StructType(
    [
        _f("id", STR, False),
        _f("invocation_id", STR, False),
        _f("event_index", I32),
        _f("client_id", STR),
        _f("hostname", STR),
        _f("event_type", STR),
        _f("severity", STR),
        _f("ref_file", STR),
        _f("ref_line", I32),
        _f("ref_column", I32),
        _f("message", STR),
        _f("code", STR),
        _f("rule", STR),
        _f("tool_name", STR),
        _f("category", STR),
        _f("test_name", STR),
        _f("fingerprint", STR),
        _f("log_line_start", I32),
        _f("log_line_end", I32),
        _f("context", STR),
        _f("metadata", STR),  # open-ended JSON -> string + get_json_object
        _f("format_used", STR),
        _f("date", DT, False),
    ]
)

# runs / invocations (reference bird_schema.sql:130-175, storage.py:30-71)
RUNS_SCHEMA = StructType(
    [
        _f("id", STR, False),
        _f("run_serial", I64, False),  # assigned at ingest (SURVEY.md §4.1)
        _f("session_id", STR),
        _f("timestamp", TS, False),
        _f("duration_ms", I64),
        _f("cwd", STR),
        _f("cmd", STR),
        _f("executable", STR),
        _f("pid", I32),
        _f("exit_code", I32),
        _f("format_hint", STR),
        _f("client_id", STR),
        _f("hostname", STR),
        _f("username", STR),
        _f("tag", STR),
        _f("source_name", STR),
        _f("source_type", STR),  # run | exec | import | capture
        _f("environment", MAP_SS),
        _f("platform", STR),
        _f("arch", STR),
        _f("git_commit", STR),
        _f("git_branch", STR),
        _f("git_dirty", BooleanType()),
        _f("ci", MAP_SS),
        _f("extension_data", STR),  # JSON (e.g. {"sandbox": {...}})
        _f("date", DT, False),
    ]
)

# attempts: start-records for in-flight queryability (bird_schema.sql:66-107)
ATTEMPTS_SCHEMA = StructType(
    [
        _f("id", STR, False),
        _f("session_id", STR),
        _f("started_at", TS, False),
        _f("cmd", STR),
        _f("cwd", STR),
        _f("pid", I32),
        _f("source_name", STR),
        _f("source_type", STR),
        _f("hostname", STR),
        _f("date", DT, False),
    ]
)

# outcomes: completion-records keyed by attempt (bird_schema.sql:112-127)
OUTCOMES_SCHEMA = StructType(
    [
        _f("attempt_id", STR, False),
        _f("completed_at", TS),
        _f("duration_ms", I64),
        _f("exit_code", I32),  # NULL -> orphaned
        _f("signal", I32),
        _f("timeout", BooleanType()),
        _f("date", DT, False),
    ]
)

# outputs: raw captured streams, content-addressed (bird_schema.sql:177-199)
OUTPUTS_SCHEMA = StructType(
    [
        _f("id", STR, False),
        _f("invocation_id", STR, False),
        _f("stream", STR),  # stdout | stderr | combined
        _f("content_hash", STR),
        _f("byte_length", I64),
        _f("storage_type", STR),  # inline | blob
        _f("storage_ref", STR),  # data: URI or blob path
        _f("content_type", STR),
        _f("date", DT, False),
    ]
)

# sessions: invoker context grouping runs (bird_schema.sql:40-58)
SESSIONS_SCHEMA = StructType(
    [
        _f("id", STR, False),
        _f("client_id", STR),
        _f("hostname", STR),
        _f("username", STR),
        _f("started_at", TS),
        _f("date", DT, False),
    ]
)

# annotations: typed enrichment attached to events by ext annotators
# (reference Annotation dataclass, src/blq/ext/annotator.py:25-52 — the
# reference UPDATEs each event's metadata JSON in place; at scale an
# APPEND-ONLY side table keyed by event_id is the correct shape, merged
# into the flat view at read time)
ANNOTATIONS_SCHEMA = StructType(
    [
        _f("event_id", STR, False),
        _f("invocation_id", STR),
        _f("annotator", STR, False),
        _f("ann_type", STR),
        _f("display", STR),  # inline | detail | hidden
        _f("data", STR),  # JSON payload
        _f("date", DT, False),
    ]
)


# Semantic schema version (reference docs/schema-stability.md: major =
# breaking table changes, minor = additive columns/tables, patch =
# view/macro-only changes). v1 was the flat export layout
# (execution.migrate_from_export reads it); v2 is this partitioned
# parquet + blob model.
SCHEMA_VERSION = "2.1.0"
