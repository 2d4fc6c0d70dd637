"""As-of join: for each left row, the most recent right row at or before
it (per key) — an operator Spark's DataFrame API lacks natively.

Implementation is the union-and-window form, which is the shuffle-minimal
distributed shape:

1. tag both sides and union them on (key, ts);
2. one window per key ordered by (ts, side-tag) carries the right side's
   values forward with last(ignorenulls) over an unbounded-preceding
   frame;
3. keep only left rows — each now holds the latest right values with
   right.ts <= left.ts.

Cost is ONE shuffle on the key (the union's window partitioning); there
is no join node at all, so no row-pair blow-up and no skew-amplifying
range join. pandas.merge_asof semantics, but distributed. Right rows
tagged 0 sort before left rows at equal ts, so "at or before" includes
exact-tie matches (ASOF >= semantics).

Caveat: each right value column is carried independently; rows mixing
nulls and values across right columns would fill from different rows.
Dedupe the right side to one row per (key, ts) for deterministic results
(the gate does this; DuckDB's native ASOF JOIN — the oracle — is
otherwise ambiguous on ties too).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    ts_col: str,
    right_value_cols: list[str],
    how: str = "left",
) -> DataFrame:
    """Backward as-of join (latest right.ts <= left.ts per key).

    `right_value_cols` are the right-side columns to carry onto left
    rows (must not collide with left column names; alias beforehand).
    how='left' keeps unmatched left rows with nulls; how='inner' drops
    them."""
    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        key_col, ts_col, *right_value_cols
    ).withColumn("_side", F.lit(0))
    unioned = l_tag.unionByName(r_tag, allowMissingColumns=True)

    w = (
        Window.partitionBy(key_col)
        .orderBy(ts_col, "_side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        *[
            F.last(c, ignorenulls=True).over(w).alias(f"_asof_{c}")
            for c in right_value_cols
        ],
    )
    out = (
        carried.filter(F.col("_side") == 1)
        .drop("_side", *right_value_cols)
    )
    for c in right_value_cols:
        out = out.withColumnRenamed(f"_asof_{c}", c)
    if how == "inner":
        cond = F.lit(False)
        for c in right_value_cols:
            cond = cond | F.col(c).isNotNull()
        out = out.filter(cond)
    return out
