"""blq_* SQL macro expansion for the raw-SQL surface.

The reference registers its macro/view library as DuckDB table macros, so
SQL users write `SELECT * FROM blq_errors(5)` (docs/query-guide.md:69-80,
bird_schema.sql macro definitions). Spark SQL has no table-valued macro
DDL, so we expand the calls BEFORE execution: each `blq_name(args)` in the
query is computed as its DataFrame (operators/views), registered as a
temp view, and the call text is replaced with that view name. The
expansion is purely textual on the call sites — the macro BODIES stay
declarative DataFrame plans, so Catalyst fuses them with the enclosing
query exactly like DuckDB inlines its macros.

Only integer-literal arguments are supported (matching the reference
macros' signatures: row limits and run serials).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame

from blq_cli_spark.operators import views

_CALL_RE = re.compile(r"\bblq_([a-z_]+)\s*\(([^)]*)\)", re.IGNORECASE)


def _macros(store) -> dict:
    """name -> (fn(*int_args) -> DataFrame, arity_range)."""
    flat = store.events_flat
    return {
        "load_events": (lambda: flat(), (0, 0)),
        "load_runs": (lambda: store.runs_loaded(), (0, 0)),
        "status": (lambda: store.source_status(), (0, 0)),
        "errors": (lambda n=10: views.errors(flat(), n=n), (0, 1)),
        "warnings": (lambda n=10: views.warnings(flat(), n=n), (0, 1)),
        "errors_json": (lambda n=10: views.errors_json(flat(), n=n), (0, 1)),
        "history": (lambda n=20: views.history(store.runs_loaded(), n=n), (0, 1)),
        "running": (
            lambda: views.running(store.attempts(), store.outcomes()),
            (0, 0),
        ),
        "summary": (lambda: views.summary(flat()), (0, 0)),
        "diff": (lambda a, b: views.diff_by_group(flat(), a, b), (2, 2)),
    }


def expand_macros(sql: str, store) -> str:
    """Replace every blq_*() call with a temp view of its result; raise
    ValueError on unknown macros / bad arity / non-integer args (an
    agent/user-facing error, not a crash)."""
    macros = _macros(store)
    counter = [0]

    def _sub(m: re.Match) -> str:
        name = m.group(1).lower()
        if name not in macros:
            raise ValueError(f"unknown SQL macro: blq_{name}()")
        fn, (lo, hi) = macros[name]
        raw = [a.strip() for a in m.group(2).split(",") if a.strip()]
        if not (lo <= len(raw) <= hi):
            raise ValueError(
                f"blq_{name}() takes {lo}-{hi} argument(s), got {len(raw)}"
            )
        try:
            nums = [int(a) for a in raw]
        except ValueError:
            raise ValueError(
                f"blq_{name}() arguments must be integer literals: {m.group(0)}"
            ) from None
        df: DataFrame = fn(*nums)
        counter[0] += 1
        view = f"_blq_macro_{counter[0]}"
        df.createOrReplaceTempView(view)
        return view

    return _CALL_RE.sub(_sub, sql)
