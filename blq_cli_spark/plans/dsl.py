"""The filter-expression mini-DSL compiler.

Grammar (reference src/blq/commands/query_cmd.py:124-169):
    key=value        equality (value list v1,v2 -> IN)
    key~pat          contains, case-insensitive (ILIKE %pat%)
    key!=value       inequality
options: case_insensitive (-i) lowers both sides of equality;
         invert (-v) negates the final conjunction (:253-254).

Compiles to pyspark Column predicates instead of SQL strings — Catalyst
sees real expressions, so pushdown/pruning still apply.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column


class FilterExpressionError(ValueError):
    pass


_EXPR_RE = re.compile(r"^\s*([A-Za-z_][A-Za-z0-9_]*)\s*(!=|~|=)\s*(.*)$")


def _coerce(raw: str):
    raw = raw.strip()
    if re.fullmatch(r"-?\d+", raw):
        return int(raw)
    if re.fullmatch(r"-?\d+\.\d*", raw):
        return float(raw)
    if raw.lower() in ("true", "false"):
        return raw.lower() == "true"
    return raw


def parse_filter_expression(expr: str, case_insensitive: bool = False) -> Column:
    """Compile one `key OP value` expression to a Column predicate."""
    m = _EXPR_RE.match(expr)
    if not m:
        raise FilterExpressionError(f"invalid filter expression: {expr!r}")
    key, op, raw = m.groups()
    col = F.col(key)
    if op == "~":
        return col.ilike(f"%{raw.strip()}%")
    if op == "!=":
        val = _coerce(raw)
        if case_insensitive and isinstance(val, str):
            return F.lower(col) != val.lower()
        return col != F.lit(val)
    # op == "="
    if "," in raw:
        vals = [_coerce(v) for v in raw.split(",")]
        if case_insensitive:
            vals = [v.lower() if isinstance(v, str) else v for v in vals]
            return F.lower(col).isin(vals)
        return col.isin(vals)
    val = _coerce(raw)
    if case_insensitive and isinstance(val, str):
        return F.lower(col) == val.lower()
    return col == F.lit(val)


def compile_filters(
    exprs: list[str], case_insensitive: bool = False, invert: bool = False
) -> Column | None:
    """AND together expressions; `invert` negates the conjunction
    (reference cmd_filter, query_cmd.py:221-259)."""
    if not exprs:
        return None
    cond = parse_filter_expression(exprs[0], case_insensitive)
    for e in exprs[1:]:
        cond = cond & parse_filter_expression(e, case_insensitive)
    return ~cond if invert else cond
