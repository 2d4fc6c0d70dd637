"""Gate-query registry.

Every operator from SURVEY.md §2 that we claim as done registers here with
BOTH a Spark callable and (where SQL-expressible) a DuckDB oracle SQL
string. `__spark_entry__.py` exposes the registry to the driver, which runs
each pair side-by-side at sf=0.01 and hash-compares results.

Rules enforced by construction:
- one decorator registers both halves, so queries()/oracle_sql() can't drift
- column names must match (the driver sorts columns by name before hashing)
- aggregate doubles are rounded in both engines (summation order differs)
- timestamps in output are formatted to strings (tz-independence)
- every LIMIT query orders by a unique key suffix (deterministic top-k sets)
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def gate(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a driver-facing gate query; `oracle` is DuckDB SQL over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings). None → rows-only check."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate gate query name: {name}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def queries() -> dict[str, QueryFn]:
    return dict(_QUERIES)


def oracles() -> dict[str, str]:
    return dict(_ORACLES)
