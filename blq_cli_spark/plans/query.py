"""LogQuery: the fluent deferred query builder over a lazy DataFrame.

Reference semantics (src/blq/query.py:53-534): builder methods accumulate
state; `_build()` applies, in fixed order, filter -> order -> select ->
limit (query.py:382-403) — ordering by non-projected columns works because
order is applied before select. Terminals execute.

The Spark mapping is 1:1 — a DataFrame *is* the deferred relational IR —
so this wrapper only preserves the reference's API shape + kwargs-filter
semantics (query.py:235-296):
    col=value      ->  =            col=[a,b]  ->  IN
    col="%pat%"    ->  ILIKE        col="!v"   ->  !=
    col=None       ->  IS NULL      col=[]     ->  FALSE
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from blq_cli_spark.plans.dsl import compile_filters


def _kwarg_condition(key: str, value) -> Column:
    col = F.col(key)
    if value is None:
        return col.isNull()
    if isinstance(value, (list, tuple, set)):
        vals = list(value)
        if not vals:
            return F.lit(False)
        return col.isin(vals)
    if isinstance(value, str):
        # reference order (src/blq/query.py:278-281): the ILIKE rule
        # fires first and only on a LEADING or TRAILING '%' — so
        # "!x%" is ILIKE '!x%' (not !=) and an interior-% literal like
        # "100%done" is plain equality
        if value.startswith("%") or value.endswith("%"):
            return col.ilike(value)
        if value.startswith("!"):
            return col != F.lit(value[1:])
        return col == F.lit(value)
    return col == F.lit(value)


class LogQuery:
    """Deferred fluent query (reference LogQuery, src/blq/query.py:33-534)."""

    def __init__(self, df: DataFrame):
        self._df = df
        self._filters: list[Column] = []
        self._order_cols: list[Column] = []
        self._select_cols: list[str] | None = None
        self._limit_n: int | None = None
        self._offset_n: int | None = None

    # -- constructors (reference query.py:68-233) -----------------------------

    @classmethod
    def from_sql(cls, spark, sql: str) -> "LogQuery":
        """Arbitrary SQL as the base relation (reference query.py:77-98)."""
        return cls(spark.sql(sql))

    @classmethod
    def from_table(cls, spark, name: str) -> "LogQuery":
        """Registered table/view by name (reference query.py:100-114)."""
        return cls(spark.table(name))

    @classmethod
    def from_parquet(cls, spark, path: str) -> "LogQuery":
        """Parquet file/dir/glob (reference query.py:116-138). Hive
        partition discovery, pushdown, and pruning are native."""
        return cls(spark.read.parquet(path))

    @classmethod
    def from_file(cls, spark, path: str, fmt: str = "auto") -> "LogQuery":
        """Parse one log file into the events schema (reference
        query.py:140-177). Driver-side parse — this is the interactive
        single-file path; for corpora use logparse.parse_df
        (distributed)."""
        with open(path) as fh:
            content = fh.read()
        return cls.from_content(spark, content, fmt)

    @classmethod
    def from_content(cls, spark, content: str, fmt: str = "auto") -> "LogQuery":
        """Parse in-memory log text (reference query.py:179-233)."""
        from blq_cli_spark.sources import logparse

        return cls(logparse.events_df(spark, logparse.parse_content(content, fmt)))

    def _clone(self) -> "LogQuery":
        q = LogQuery(self._df)
        q._filters = list(self._filters)
        q._order_cols = list(self._order_cols)
        q._select_cols = list(self._select_cols) if self._select_cols else None
        q._limit_n = self._limit_n
        q._offset_n = self._offset_n
        return q

    # -- builders (all return new LogQuery; nothing executes) ----------------

    def filter(self, *conds: Column, **kwargs) -> "LogQuery":
        q = self._clone()
        q._filters.extend(conds)
        q._filters.extend(_kwarg_condition(k, v) for k, v in kwargs.items())
        return q

    def exclude(self, *conds: Column, **kwargs) -> "LogQuery":
        """Negated filter: NOT(c1 AND c2 ...) (reference query.py:298-313)."""
        parts = list(conds) + [_kwarg_condition(k, v) for k, v in kwargs.items()]
        if not parts:
            return self._clone()
        cond = parts[0]
        for p in parts[1:]:
            cond = cond & p
        q = self._clone()
        q._filters.append(~cond)
        return q

    def where(self, sql: str) -> "LogQuery":
        """Raw SQL predicate passthrough (reference query.py:315-325)."""
        q = self._clone()
        q._filters.append(F.expr(sql))
        return q

    def filter_dsl(
        self, exprs: Sequence[str], case_insensitive: bool = False, invert: bool = False
    ) -> "LogQuery":
        """Apply filter-mini-DSL expressions (reference query_cmd.py:221-259)."""
        cond = compile_filters(list(exprs), case_insensitive, invert)
        if cond is None:
            return self._clone()
        q = self._clone()
        q._filters.append(cond)
        return q

    def select(self, *cols: str) -> "LogQuery":
        q = self._clone()
        q._select_cols = list(cols)
        return q

    def order_by(self, *cols, desc: bool = False) -> "LogQuery":
        q = self._clone()
        for c in cols:
            col = F.col(c) if isinstance(c, str) else c
            rep = str(col)
            if " DESC" in rep or " ASC" in rep:
                # already a SortOrder (F.desc(...)/col.asc()): wrapping it
                # again builds a nested, unevaluable SortOrder
                q._order_cols.append(col)
            else:
                q._order_cols.append(col.desc() if desc else col.asc())
        return q

    def limit(self, n: int) -> "LogQuery":
        q = self._clone()
        q._limit_n = n
        return q

    def offset(self, n: int) -> "LogQuery":
        q = self._clone()
        q._offset_n = n
        return q

    # -- build + terminals ----------------------------------------------------

    def to_spark(self) -> DataFrame:
        """Apply deferred state in the reference's fixed order:
        filter -> order -> select -> limit (query.py:382-403)."""
        df = self._df
        for cond in self._filters:
            df = df.filter(cond)
        if self._order_cols:
            df = df.orderBy(*self._order_cols)
        if self._select_cols:
            df = df.select(*self._select_cols)
        if self._offset_n:
            df = df.offset(self._offset_n)
        if self._limit_n is not None:
            df = df.limit(self._limit_n)
        return df

    def df(self):
        """Materialize to pandas (reference `.df()`, query.py:405-409)."""
        return self.to_spark().toPandas()

    def fetchall(self):
        return self.to_spark().collect()

    def fetchone(self):
        """First row or None (reference query.py:413-415)."""
        rows = self.to_spark().limit(1).collect()
        return rows[0] if rows else None

    def exists(self) -> bool:
        """Any row matches? LIMIT-1 probe, not a full count (reference
        query.py:426-433 — and the scale-correct form: Spark stops the
        scan at the first surviving row)."""
        return self.fetchone() is not None

    def columns(self) -> list[str]:
        """Method (not property) to mirror the reference call shape
        (query.py:435-438)."""
        return self.to_spark().columns

    def dtypes(self) -> list[tuple[str, str]]:
        return self.to_spark().dtypes

    def describe(self):
        """Summary statistics of the built relation (reference
        query.py:444-446)."""
        return self.to_spark().describe()

    def show(self, n: int = 10) -> None:
        self.to_spark().show(n, truncate=40)

    def count(self) -> int:
        """Short-circuit: filters only, no order/select/limit
        (reference query.py:417-424)."""
        df = self._df
        for cond in self._filters:
            df = df.filter(cond)
        return df.count()

    def count_then_fetch(self) -> tuple[int, list]:
        """Count-before-limit pattern (reference services/query.py:306-316):
        total count with the same WHERE + the limited page, computing the
        filtered relation once."""
        filtered = self._df
        for cond in self._filters:
            filtered = filtered.filter(cond)
        filtered = filtered.cache()
        try:
            total = filtered.count()
            q = self._clone()
            q._df = filtered
            q._filters = []
            rows = q.to_spark().collect()
        finally:
            filtered.unpersist()
        return total, rows

    def explain(self, mode: str = "formatted") -> None:
        self.to_spark().explain(mode)

    # -- aggregation API (reference query.py:460-534) -------------------------

    def group_by(self, *cols: str) -> "GroupedLogQuery":
        return GroupedLogQuery(self, list(cols))

    def value_counts(self, col: str) -> DataFrame:
        """`aggregate(col, COUNT(*))` ordered desc (query.py:471-484)."""
        df = self._df
        for cond in self._filters:
            df = df.filter(cond)
        return df.groupBy(col).agg(F.count(F.lit(1)).alias("count")).orderBy(
            F.desc("count"), col
        )


class GroupedLogQuery:
    def __init__(self, base: LogQuery, group_cols: list[str]):
        self._base = base
        self._group_cols = group_cols

    def _grouped(self):
        df = self._base._df
        for cond in self._base._filters:
            df = df.filter(cond)
        return df.groupBy(*self._group_cols)

    def count(self) -> DataFrame:
        return self._grouped().agg(F.count(F.lit(1)).alias("count"))

    def agg(self, **named_exprs: str) -> DataFrame:
        """name="SQL aggregate expr" pairs (reference query.py:514-534)."""
        aggs = [F.expr(e).alias(name) for name, e in named_exprs.items()]
        return self._grouped().agg(*aggs)

    def min(self, col: str) -> DataFrame:
        return self._grouped().agg(F.min(col).alias(f"min_{col}"))

    def max(self, col: str) -> DataFrame:
        return self._grouped().agg(F.max(col).alias(f"max_{col}"))

    def sum(self, col: str) -> DataFrame:
        return self._grouped().agg(F.sum(col).alias(f"sum_{col}"))

    def avg(self, col: str) -> DataFrame:
        return self._grouped().agg(F.avg(col).alias(f"avg_{col}"))
