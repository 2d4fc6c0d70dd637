"""Service layer: the parameterized read paths behind the reference's MCP
tools and CLI commands (src/blq/services/query.py:233-326 `query_events`,
:165-187 history counts; suppression lists core.py:1459-1500; ref
resolution services/refs.py).

Each service composes store views + filters and returns (total, rows) or a
DataFrame — the agent/CLI boundary stays driver-side, the plan stays
distributed.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from blq_cli_spark.operators import views
from blq_cli_spark.plans.query import LogQuery
from blq_cli_spark.sources.store import LogStore


def query_events(
    store: LogStore,
    severities: list[str] | None = None,
    run_serial: int | None = None,
    source: str | None = None,
    file_pattern: str | None = None,
    suppressed_fingerprints: list[str] | None = None,
    default_latest: bool = True,
    limit: int = 50,
) -> tuple[int, list]:
    """The `events` tool read path (reference services/query.py:233-326):
    severity IN (P6), run/source scoping, file LIKE (P7), suppression
    anti-filter (P8), default-to-latest-run (P9), count-before-limit (O6)."""
    flat = store.events_flat()
    q = LogQuery(flat)
    if severities:
        q = q.filter(F.col("severity").isin(severities))
    if run_serial is not None:
        q = q.filter(F.col("run_serial") == run_serial)
    elif source is not None:
        q = q.filter(F.col("source_name") == source)
    elif default_latest:
        latest = flat.agg(F.max("run_serial").alias("m"))
        q = LogQuery(
            flat.join(F.broadcast(latest), flat.run_serial == F.col("m")).drop("m")
        )
        if severities:
            q = q.filter(F.col("severity").isin(severities))
    if file_pattern:
        q = q.filter(F.col("ref_file").like(file_pattern))
    if suppressed_fingerprints:
        q = q.filter(
            F.col("fingerprint").isNull()
            | ~F.col("fingerprint").isin(suppressed_fingerprints)
        )
    q = q.order_by(F.desc("run_serial"), F.desc("event_index")).limit(limit)
    return q.count_then_fetch()


def history_with_counts(store: LogStore, n: int = 10) -> DataFrame:
    """The `history` tool (reference services/query.py:165-187)."""
    return views.history(store.runs_loaded(), n=n)


def ci_check(
    store: LogStore, baseline_serial: int, candidate_serial: int
) -> dict:
    """CI regression check (reference ci_cmd.py:136-178): fail if the
    candidate run introduces fingerprints absent from the baseline."""
    d = views.diff_fingerprints(store.events_flat(), baseline_serial, candidate_serial)
    counts = {r["change"]: r["n"] for r in d.groupBy("change").agg(F.count(F.lit(1)).alias("n")).collect()}
    new = counts.get("new", 0)
    return {
        "baseline": baseline_serial,
        "candidate": candidate_serial,
        "new": new,
        "fixed": counts.get("fixed", 0),
        "unchanged": counts.get("unchanged", 0),
        "passed": new == 0,
    }


def resolve_baseline(
    store: LogStore,
    run_serial: int | None = None,
    branch: str | None = None,
    commit: str | None = None,
) -> int | None:
    """Baseline resolution by serial / branch / commit (reference
    ci_cmd.py:46-133): latest run matching the selector."""
    runs = store.runs()
    if run_serial is not None:
        return run_serial
    if commit:
        runs = runs.filter(F.col("git_commit") == commit)
    elif branch:
        runs = runs.filter(F.col("git_branch") == branch)
    row = runs.agg(F.max("run_serial").alias("m")).collect()[0]
    return int(row["m"]) if row["m"] is not None else None


# --- ref grammar (reference services/refs.py:24-139) -------------------------

_REF_RE = re.compile(
    r"^(?:(?P<tag>[A-Za-z][\w-]*):)?(?P<serial>\d+)(?::(?P<event>\d+))?$"
)
_REL_RE = re.compile(r"^~(?P<back>\d+)$")


@dataclass
class EventRef:
    tag: str | None
    serial: int | None
    event_index: int | None
    relative: int | None  # ~N -> N runs back

    def is_event(self) -> bool:
        return self.event_index is not None


def parse_ref(ref: str) -> EventRef:
    """Parse `tag:serial[:event]`, bare `serial[:event]`, or relative `~N`
    (reference refs.py:24-139)."""
    m = _REL_RE.match(ref)
    if m:
        return EventRef(None, None, None, int(m["back"]))
    m = _REF_RE.match(ref)
    if not m:
        raise ValueError(f"invalid ref: {ref!r}")
    return EventRef(
        m["tag"], int(m["serial"]), int(m["event"]) if m["event"] else None, None
    )


def resolve_ref(store: LogStore, ref: str) -> DataFrame:
    """Compile a ref to the matching rows: run refs -> runs_loaded row,
    event refs -> events_flat row; `~N` -> Nth most recent run (O3
    offset semantics, refs.py:174-195)."""
    parsed = parse_ref(ref)
    if parsed.relative is not None:
        return (
            store.runs_loaded()
            .orderBy(F.desc("run_serial"))
            .offset(parsed.relative - 1)
            .limit(1)
        )
    if parsed.is_event():
        flat = store.events_flat().filter(
            (F.col("run_serial") == parsed.serial)
            & (F.col("event_index") == parsed.event_index)
        )
        return flat if parsed.tag is None else flat.filter(F.col("tag") == parsed.tag)
    runs = store.runs_loaded().filter(F.col("run_serial") == parsed.serial)
    return runs if parsed.tag is None else runs.filter(F.col("tag") == parsed.tag)


def get_output(
    store: LogStore,
    run_serial: int,
    stream: str = "combined",
    grep: str | None = None,
    ctx: int = 2,
    head: int | None = None,
    tail: int | None = None,
    lines: str | None = None,
) -> DataFrame:
    """The MCP `output` tool read path (reference serve.py:1305-1444):
    fetch a stored run's raw output and apply grep-with-context / head /
    tail / line-spec selection, all as distributed line operators
    (operators/context.py)."""
    from blq_cli_spark.operators import context

    run = store.runs().filter(F.col("run_serial") == run_serial).select("id").collect()
    if not run:
        raise ValueError(f"no run with serial {run_serial}")
    out_rows = (
        store.outputs()
        .filter(
            (F.col("invocation_id") == run[0]["id"]) & (F.col("stream") == stream)
        )
        .collect()
    )
    if not out_rows:
        raise ValueError(f"no {stream} output for run {run_serial}")
    content = store.read_output(out_rows[0]["storage_ref"]).decode(
        "utf-8", errors="replace"
    )
    df = store.spark.createDataFrame([(str(run_serial), content)], "id string, content string")
    line_df = context.text_to_lines(df)
    if lines:
        line_df = context.select_lines(line_df, lines)
    if grep:
        line_df = context.grep_with_context(line_df, grep, ctx=ctx)
    if head is not None or tail is not None:
        line_df = context.head_tail(line_df, head=head, tail=tail)
    return line_df
