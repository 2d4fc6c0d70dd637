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


def render_report_markdown(data: dict, include_warnings: bool = False) -> str:
    """Markdown build report (reference report_cmd.py:160-320): summary
    with status badge + metadata table, by-file breakdowns, top
    diagnostics, and new/fixed sections when a baseline was compared."""
    if data.get("run_serial") is None:
        return "# Build Report\n\nNo runs recorded.\n"
    lines: list[str] = []
    title = data.get("source_name") or ""
    lines.append(f"# Build Report{': ' + title if title else ''}")
    lines.append("")
    lines.append("## Summary")
    lines.append("")
    n_err = data["total_errors"]
    status = "**PASSED**" if n_err == 0 else f"**FAILED** ({n_err} errors)"
    lines.append(f"**Status:** {status}")
    lines.append("")
    lines.append("| Field | Value |")
    lines.append("|-------|-------|")
    lines.append(f"| Run | #{data['run_serial']} |")
    for key, label in (
        ("timestamp", "Started"),
        ("exit_code", "Exit code"),
        ("git_branch", "Branch"),
        ("git_commit", "Commit"),
    ):
        if data.get(key) not in (None, ""):
            lines.append(f"| {label} | {data[key]} |")
    lines.append(f"| Errors | {n_err} |")
    lines.append(f"| Warnings | {data['total_warnings']} |")
    lines.append("")

    def loc(e: dict) -> str:
        f = e.get("ref_file")
        if not f:
            return "?"
        return f"{f}:{e['ref_line']}" if e.get("ref_line") else str(f)

    def file_section(title: str, rows: list[dict]) -> None:
        if not rows:
            return
        lines.append(f"## {title}")
        lines.append("")
        lines.append("| File | Count |")
        lines.append("|------|-------|")
        for r in rows:
            lines.append(f"| {r['ref_file']} | {r['count']} |")
        lines.append("")

    def detail_section(title: str, rows: list[dict]) -> None:
        if not rows:
            return
        lines.append(f"## {title}")
        lines.append("")
        for e in rows:
            code = f" `{e['code']}`" if e.get("code") else ""
            lines.append(f"- **{loc(e)}**{code} — {e.get('message', '')}")
        lines.append("")

    file_section("Errors by file", data.get("errors_by_file", []))
    detail_section("Top errors", data.get("top_errors", []))
    if include_warnings:
        file_section("Warnings by file", data.get("warnings_by_file", []))
        detail_section("Top warnings", data.get("top_warnings", []))
    if data.get("baseline_serial") is not None:
        lines.append("## Baseline comparison")
        lines.append("")
        lines.append(
            f"Compared to run #{data['baseline_serial']} "
            f"({data['baseline_errors']} errors)."
        )
        lines.append("")
        detail_section("New errors", data.get("new_errors", []))
        detail_section("Fixed errors", data.get("fixed_errors", []))
    return "\n".join(lines)
