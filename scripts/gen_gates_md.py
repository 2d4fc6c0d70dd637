#!/usr/bin/env python
"""Regenerate GATES.md from the live gate registry.

Run from the repo root: python scripts/gen_gates_md.py > GATES.md
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")

from blq_cli_spark import gates  # noqa: E402
from blq_cli_spark.gates.registry import DRIVER_ORDER  # noqa: E402

SECTIONS = [
    ("TPC-H-shaped analytics", ("q",)),
    ("Merged driver suites", ("o_sort_suite", "w_serial_latest_suite",
                              "w_analytics_suite", "p_filter_suite",
                              "u_setops_suite", "a_stats_suite",
                              "a_counts_suite", "a_json_scalars_suite")),
    ("Projections / filters", ("p",)),
    ("Joins", ("j",)),
    ("Aggregations", ("a",)),
    ("Windows", ("w",)),
    ("Sorts / limits", ("o",)),
    ("Set operations", ("u",)),
    ("Scalar functions", ("f",)),
    ("Time series / streaming-shaped", ("ts",)),
    ("LLM-data-pipeline extensions", ("x",)),
]


def section_of(name: str) -> str:
    for title, keys in SECTIONS:
        if name in keys:
            return title
    for title, keys in SECTIONS:
        if len(keys) >= 1 and all("_suite" not in k or k == name for k in keys):
            prefix = name.split("_")[0]
            for k in keys:
                if "_suite" in k:
                    continue
                if prefix == k or (k in ("ts",) and name.startswith("ts_")):
                    return title
    # fallback by first letter/prefix
    prefix = "ts" if name.startswith("ts_") else name[0]
    for title, keys in SECTIONS:
        if prefix in keys:
            return title
    return "Other"


def main() -> None:
    qs = gates.queries()
    os_ = gates.oracles()
    n = len(qs)
    in_window = set(DRIVER_ORDER)
    by_section: dict[str, list[str]] = {}
    for name, fn in qs.items():
        doc = (fn.__doc__ or "").strip().replace("\n", " ")
        doc = " ".join(doc.split())
        mark = "" if name in in_window else " *(local-only: past the driver's 50-gate window)*"
        tag = "" if name in os_ else " **[rows-only]**"
        by_section.setdefault(section_of(name), []).append(
            f"- **{name}**{tag} — {doc}{mark}"
        )

    print("# GATES — the driver-facing query/oracle catalog")
    print()
    print(
        f"Auto-generated from `blq_cli_spark/gates/` ({n} Spark/DuckDB oracle\n"
        "pairs). Each entry is a key in `__spark_entry__.queries()` with\n"
        "matching `oracle_sql()`; the driver hash-compares both sides at\n"
        "sf0.01 for the FIRST 50 entries (`registry.DRIVER_ORDER` curates\n"
        "that window to cover every SURVEY §2 family; merged `*_suite`\n"
        "gates carry the small-shape families and their members remain\n"
        "individually verified by tests/test_gate_parity.py).\n"
        "Regenerate: `python scripts/gen_gates_md.py > GATES.md`."
    )
    for title, _ in SECTIONS:
        entries = by_section.pop(title, [])
        if not entries:
            continue
        print(f"\n## {title}\n")
        for e in sorted(entries):
            print(e)
    for title, entries in by_section.items():
        print(f"\n## {title}\n")
        for e in sorted(entries):
            print(e)


if __name__ == "__main__":
    main()
