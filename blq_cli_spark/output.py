"""Output formatters: table / json / csv / markdown renderings of query
results (reference src/blq/output.py:168-343 table renderer,
format_query_output src/blq/commands/query_cmd.py:26-60, JSON null-scrub
src/blq/output.py:365-375).

Formatters are driver-side presentation over collected rows — they never
touch the distributed plan. Callers bound the result first (limit).
"""

from __future__ import annotations

import csv as _csv
import io
import json
from collections.abc import Sequence
from typing import Any

from pyspark.sql import DataFrame, Row


def _rows_and_cols(data: DataFrame | Sequence[Row], max_rows: int | None) -> tuple[list[dict], list[str]]:
    if isinstance(data, DataFrame):
        if max_rows is not None:
            data = data.limit(max_rows)
        rows = [r.asDict(recursive=True) for r in data.collect()]
        cols = data.columns if isinstance(data, DataFrame) else []
        return rows, list(cols)
    rows = [r.asDict(recursive=True) if isinstance(r, Row) else dict(r) for r in data]
    if max_rows is not None:
        rows = rows[:max_rows]
    cols = list(rows[0].keys()) if rows else []
    return rows, cols


def _cell(v: Any, max_width: int) -> str:
    if v is None:
        return ""
    s = str(v)
    return s if len(s) <= max_width else s[: max_width - 1] + "…"


def format_table(
    data: DataFrame | Sequence[Row],
    max_rows: int | None = 50,
    max_col_width: int = 60,
) -> str:
    """Aligned plain-text table (reference output.py:168-343)."""
    rows, cols = _rows_and_cols(data, max_rows)
    if not cols:
        return "(no results)"
    rendered = [[_cell(r.get(c), max_col_width) for c in cols] for r in rows]
    widths = [
        max(len(c), *(len(row[i]) for row in rendered)) if rendered else len(c)
        for i, c in enumerate(cols)
    ]
    lines = [
        "  ".join(c.ljust(w) for c, w in zip(cols, widths)),
        "  ".join("-" * w for w in widths),
    ]
    lines.extend("  ".join(cell.ljust(w) for cell, w in zip(row, widths)) for row in rendered)
    return "\n".join(lines)


def scrub_nulls(obj: dict) -> dict:
    """Drop None/"" values before JSON emit (reference output.py:365-375)."""
    return {k: v for k, v in obj.items() if v is not None and v != ""}


def format_json(
    data: DataFrame | Sequence[Row], max_rows: int | None = None, scrub: bool = True
) -> str:
    rows, _ = _rows_and_cols(data, max_rows)
    if scrub:
        rows = [scrub_nulls(r) for r in rows]
    return json.dumps(rows, default=str, indent=2)


def format_csv(data: DataFrame | Sequence[Row], max_rows: int | None = None) -> str:
    rows, cols = _rows_and_cols(data, max_rows)
    buf = io.StringIO()
    w = _csv.DictWriter(buf, fieldnames=cols)
    w.writeheader()
    for r in rows:
        w.writerow({k: ("" if v is None else v) for k, v in r.items()})
    return buf.getvalue()


def format_markdown(
    data: DataFrame | Sequence[Row], max_rows: int | None = 50, max_col_width: int = 60
) -> str:
    rows, cols = _rows_and_cols(data, max_rows)
    if not cols:
        return "(no results)"
    head = "| " + " | ".join(cols) + " |"
    sep = "| " + " | ".join("---" for _ in cols) + " |"
    body = [
        "| " + " | ".join(_cell(r.get(c), max_col_width).replace("|", "\\|") for c in cols) + " |"
        for r in rows
    ]
    return "\n".join([head, sep, *body])


FORMATTERS = {
    "table": format_table,
    "json": format_json,
    "csv": format_csv,
    "markdown": format_markdown,
}


def format_output(data: DataFrame | Sequence[Row], fmt: str = "table", **kwargs) -> str:
    if fmt not in FORMATTERS:
        raise ValueError(f"unknown format {fmt!r}; expected one of {sorted(FORMATTERS)}")
    return FORMATTERS[fmt](data, **kwargs)
