"""Annotator/extension pipeline: pluggable event enrichment.

Reference surface: src/blq/ext/annotator.py (Annotation dataclass :25-52,
Annotator protocol + dispatch, RunContext lazy run accessor :55-160) and
pipeline.py's prepare/execute/collect ordering. The reference mutates
each event's metadata JSON in place; the Spark-first re-expression keeps
the events fact table immutable and writes annotations to an
APPEND-ONLY side table (store table `annotations`), merged into the
flat view at read time — the only shape that scales and stays
conflict-free under concurrent annotators.

Two kinds of annotators register here:
- DataFrame annotators (the scale path): fn(events_df) -> DataFrame of
  (event_id, ann_type, display, data) — pure distributed plans; the two
  builtins annotate fingerprint history (occurrence counts, first-seen
  serial) with one aggregation each.
- Row annotators (reference-style convenience): fn(event_dict) ->
  Annotation | None, run via mapInPandas over Arrow batches.

Discovery mirrors the reference's entry-point scan (annotator.py uses
importlib.metadata.entry_points): `discover()` loads the
`blq_spark.annotators` group when present, and in-process registration
is always available.
"""

from __future__ import annotations

import datetime as _dt
import json
from collections.abc import Callable
from dataclasses import dataclass, field

from typing import Any, Protocol, runtime_checkable

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

VALID_DISPLAYS = ("inline", "detail", "hidden")


# --- execution pipeline protocol ---------------------------------------------
# Reference surface: src/blq/ext/__init__.py:16-85 (CommandSpec /
# ExecutionResult dataclasses + Collector / Extension / Executor
# Protocols) and local_executor.py:22 (the default pluggable
# LocalExecutor). The pipeline ordering is the reference's:
# CommandSpec flows Extension.prepare() -> Executor.execute() ->
# Collector.collect() (collectors registered during prepare run
# post-execution in REVERSE order). Divergences from the reference,
# both deliberate: paths are str (the repo convention, not pathlib),
# and the spec carries `argv` + `preexec` because this engine never
# routes a command through a shell — sandbox enforcement rewrites the
# argv and installs rlimits via preexec_fn (sandbox_enforce.wrap_command)
# instead of rewriting a shell string.


@dataclass
class CommandSpec:
    """Structured execution request flowing through the pipeline
    (reference ext/__init__.py:16-42)."""

    # what to run (argv is the execution form; command the display form)
    argv: list[str]
    command: str
    original_command: str

    # identity
    command_name: str
    attempt_id: str

    # context
    workspace: str
    cwd: str
    live_dir: str

    # environment (None -> inherit the parent's, the repo default)
    env: dict[str, str] | None = None

    # resource requirements
    timeout: float | None = None

    # extension data — namespaced by config_key
    extension_data: dict[str, Any] = field(default_factory=dict)

    # collectors — registered during prepare(), run post-execution in reverse
    collectors: list[Collector] = field(default_factory=list)

    # rlimit/sandbox installer for the child (not in the reference spec;
    # see the divergence note above)
    preexec: Callable[[], None] | None = field(default=None, repr=False)


@dataclass
class ExecutionResult:
    """Result from an executor (reference ext/__init__.py:45-61)."""

    exit_code: int | None
    output: str
    started_at: _dt.datetime
    completed_at: _dt.datetime
    duration_ms: int
    signal: int | None = None
    timeout: bool = False
    pid: int | None = None

    # collector contributions
    metrics: dict[str, Any] = field(default_factory=dict)
    artifacts: dict[str, str] = field(default_factory=dict)


@runtime_checkable
class Collector(Protocol):
    """Gathers artifacts post-execution (reference ext/__init__.py:64-67)."""

    def collect(self, spec: CommandSpec, result: ExecutionResult) -> None: ...


@runtime_checkable
class Extension(Protocol):
    """Modifies execution context; composable (ext/__init__.py:70-78)."""

    name: str
    config_key: str

    def prepare(self, spec: CommandSpec) -> CommandSpec: ...
    def validate(self, config: dict[str, Any]) -> list[str]: ...
    def store(self, spec: CommandSpec, result: ExecutionResult, store: Any) -> None: ...


@runtime_checkable
class Executor(Protocol):
    """Runs the command. Terminal — only one active (ext/__init__.py:81-85)."""

    name: str

    def execute(self, spec: CommandSpec) -> ExecutionResult: ...


_EXECUTORS: dict[str, Executor] = {}
_EXTENSIONS: dict[str, Extension] = {}


def register_executor(executor: Executor) -> None:
    _EXECUTORS[executor.name] = executor


def register_extension(extension: Extension) -> None:
    _EXTENSIONS[extension.name] = extension


def executors() -> list[str]:
    """Registered executor names; the default 'local' is always listed
    (it registers on first use — sources.execution imports lazily here
    to keep ext.py free of subprocess machinery)."""
    return sorted(set(_EXECUTORS) | {"local"})


def extensions() -> list[str]:
    return sorted(_EXTENSIONS)


def get_executor(name: str = "local") -> Executor:
    if name not in _EXECUTORS and name == "local":
        from blq_cli_spark.sources import execution  # noqa: F401 — registers LocalExecutor

    if name not in _EXECUTORS:
        raise KeyError(
            f"no executor named {name!r} (registered: {executors()})"
        )
    return _EXECUTORS[name]


def get_extension(name: str) -> Extension:
    if name not in _EXTENSIONS:
        raise KeyError(f"no extension named {name!r} (registered: {extensions()})")
    return _EXTENSIONS[name]


@dataclass
class Annotation:
    """Typed annotation attached to an event (reference annotator.py:25-52)."""

    annotator: str
    type: str
    display: str
    data: dict = field(default_factory=dict)

    def __post_init__(self) -> None:
        if self.display not in VALID_DISPLAYS:
            raise ValueError(
                f"display must be one of {VALID_DISPLAYS}, got {self.display!r}"
            )

    def to_dict(self) -> dict:
        return {
            "annotator": self.annotator,
            "type": self.type,
            "display": self.display,
            "data": self.data,
        }


_DF_ANNOTATORS: dict[str, Callable[[DataFrame], DataFrame]] = {}
_ROW_ANNOTATORS: dict[str, Callable[[dict], Annotation | None]] = {}


def register_annotator(name: str, fn: Callable[[DataFrame], DataFrame]) -> None:
    """Register a DataFrame annotator: events_df -> (event_id, ann_type,
    display, data) rows."""
    _DF_ANNOTATORS[name] = fn


def register_row_annotator(name: str, fn: Callable[[dict], Annotation | None]) -> None:
    """Register a per-event annotator (reference protocol); executed
    distributed via mapInPandas."""
    _ROW_ANNOTATORS[name] = fn


def annotators() -> list[str]:
    return sorted(set(_DF_ANNOTATORS) | set(_ROW_ANNOTATORS))


def discover() -> list[str]:
    """Entry-point discovery (reference annotator.py's entry_points scan
    plus the pipeline plugin groups). Groups: `blq_spark.annotators`
    (callables), `blq_spark.executors` / `blq_spark.extensions`
    (classes or instances implementing the Protocols; classes are
    instantiated with no args). Returns names loaded; silently empty
    when no distribution declares a group."""
    loaded = []
    try:
        from importlib.metadata import entry_points

        for ep in entry_points(group="blq_spark.annotators"):
            fn = ep.load()
            register_annotator(ep.name, fn)
            loaded.append(ep.name)
        for group, register in (
            ("blq_spark.executors", register_executor),
            ("blq_spark.extensions", register_extension),
        ):
            for ep in entry_points(group=group):
                obj = ep.load()
                if isinstance(obj, type):
                    obj = obj()
                register(obj)
                loaded.append(ep.name)
    except Exception:  # noqa: BLE001 — discovery is best-effort by contract
        pass
    return loaded


# --- builtin DataFrame annotators (the scale path) ---------------------------


def _fingerprint_count(events: DataFrame) -> DataFrame:
    """How often each event's fingerprint occurs across the whole store —
    one groupBy on fingerprint broadcast back; flags chronic diagnostics."""
    counts = (
        events.filter(F.col("fingerprint").isNotNull())
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return (
        events.join(F.broadcast(counts), "fingerprint")
        .filter(F.col("n") > 1)
        .select(
            F.col("id").alias("event_id"),
            F.lit("recurrence").alias("ann_type"),
            F.lit("inline").alias("display"),
            F.to_json(F.struct(F.col("n").alias("n_occurrences"))).alias("data"),
        )
    )


def _first_seen(events_flat: DataFrame) -> DataFrame:
    """First run_serial each fingerprint appeared in (min over the store);
    new-this-run events are the interesting ones for review."""
    first = (
        events_flat.filter(F.col("fingerprint").isNotNull())
        .groupBy("fingerprint")
        .agg(F.min("run_serial").alias("first_serial"))
    )
    return (
        events_flat.join(F.broadcast(first), "fingerprint")
        .select(
            F.col("id").alias("event_id"),
            F.lit("first_seen").alias("ann_type"),
            F.lit("detail").alias("display"),
            F.to_json(
                F.struct(
                    F.col("first_serial"),
                    (F.col("run_serial") == F.col("first_serial")).alias("is_new"),
                )
            ).alias("data"),
        )
    )


register_annotator("fingerprint_count", _fingerprint_count)
register_annotator("first_seen", _first_seen)


# --- pipeline ----------------------------------------------------------------


def _row_annotator_df(events: DataFrame, name: str) -> DataFrame:
    import pandas as pd

    fn = _ROW_ANNOTATORS[name]

    def _batches(it):
        for pdf in it:
            rows = []
            for rec in pdf.to_dict("records"):
                ann = fn(rec)
                if ann is not None:
                    rows.append(
                        {
                            "event_id": rec["id"],
                            "ann_type": ann.type,
                            "display": ann.display,
                            "data": json.dumps(ann.data, sort_keys=True),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["event_id", "ann_type", "display", "data"]
            )

    return events.mapInPandas(
        _batches, schema="event_id string, ann_type string, display string, data string"
    )


def run_annotators(store, names: list[str] | None = None) -> int:
    """Run annotators over the store's flat events and append results to
    the `annotations` side table. Forward registration order, like the
    reference pipeline's prepare phase (pipeline.py:24-27); each
    annotator is one distributed job, failures skip that annotator
    (collect-phase tolerance, pipeline.py:33-36). Returns rows written."""
    flat = store.events_flat()
    written = 0
    today = _dt.date.today()
    for name in names or annotators():
        try:
            if name in _DF_ANNOTATORS:
                out = _DF_ANNOTATORS[name](flat)
            else:
                out = _row_annotator_df(flat, name)
            out = (
                out.withColumn("annotator", F.lit(name))
                .withColumn("date", F.lit(today))
                .join(
                    flat.select(F.col("id").alias("event_id"), "invocation_id"),
                    "event_id",
                )
                .select(
                    "event_id", "invocation_id", "annotator", "ann_type",
                    "display", "data", "date",
                )
            )
            n = out.count()
            if n:
                out.write.mode("append").partitionBy("date").parquet(
                    store._path("annotations")
                )
            written += n
        except Exception as e:  # noqa: BLE001 — one bad annotator must not kill the run
            import sys as _sys

            print(f"ext: annotator {name!r} failed: {e}", file=_sys.stderr)
            continue
    return written


def events_annotated(store) -> DataFrame:
    """Flat events with an `annotations` JSON-array column merged from
    the side table at read time — the reference's metadata-JSON merge
    (annotator.py add_annotation), expressed as a read-side aggregation
    instead of a fact-table update."""
    anns = (
        store.table("annotations")
        .groupBy(F.col("event_id").alias("id"))
        .agg(
            F.to_json(
                F.collect_list(
                    F.struct("annotator", "ann_type", "display", "data")
                )
            ).alias("annotations")
        )
    )
    return store.events_flat().join(anns, "id", "left")
