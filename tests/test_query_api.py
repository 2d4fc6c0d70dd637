"""Fluent LogQuery API + filter mini-DSL semantics (modeled on the
reference's test strategy, tests/test_query_api.py + test_query_filter.py
— own implementation and assertions)."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from blq_cli_spark.plans.dsl import FilterExpressionError, parse_filter_expression
from blq_cli_spark.plans.query import LogQuery


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, "error", "gcc", "src/a.c", 10, "undefined reference to foo"),
        (2, "error", "gcc", "src/b.c", 20, "expected ';' before token"),
        (3, "warning", "gcc", "src/a.c", 30, "unused variable x"),
        (4, "error", "pytest", None, None, "AssertionError: 1 != 2"),
        (5, "info", "mypy", "src/c.py", 5, "note about types"),
        (6, "warning", "eslint", "app.js", 7, "no-unused-vars"),
    ]
    return spark.createDataFrame(
        rows, "id int, severity string, tool string, file string, line int, message string"
    )


def q(df):
    return LogQuery(df)


def test_filter_eq_and_chain(df):
    assert q(df).filter(severity="error").count() == 3
    assert q(df).filter(severity="error", tool="gcc").count() == 2


def test_filter_in_list(df):
    assert q(df).filter(severity=["error", "warning"]).count() == 5
    assert q(df).filter(severity=[]).count() == 0  # empty list -> FALSE


def test_filter_like_neg_null(df):
    assert q(df).filter(message="%unused%").count() == 2
    assert q(df).filter(severity="!error").count() == 3
    assert q(df).filter(file=None).count() == 1


def test_filter_ilike_trigger_matches_reference(df):
    """Reference (src/blq/query.py:278-281): ILIKE only on a leading or
    trailing '%', and that rule is checked before '!' negation."""
    # interior % is a literal equality, not a pattern
    assert q(df).filter(message="no%unused%vars").count() == 0
    assert q(df).filter(message="no-unused-vars").count() == 1
    # "!...%" triggers ILIKE (trailing %), not negation
    assert q(df).filter(message="!nonexistent%").count() == 0
    # leading-% negation-looking string is still a pattern
    assert q(df).filter(message="%1 != 2").count() == 1


def test_exclude(df):
    assert q(df).exclude(severity="error").count() == 3
    # NOT (a AND b): rows failing the conjunction remain
    assert q(df).exclude(severity="error", tool="gcc").count() == 4


def test_where_raw_sql(df):
    assert q(df).where("line > 5 AND tool = 'gcc'").count() == 3


def test_order_select_limit_fixed_order(df):
    # ordering by a non-projected column must work (order applied pre-select)
    rows = q(df).order_by("line", desc=True).select("id").limit(2).fetchall()
    assert [r["id"] for r in rows] == [3, 2]


def test_offset(df):
    rows = q(df).order_by("id").select("id").offset(2).limit(2).fetchall()
    assert [r["id"] for r in rows] == [3, 4]


def test_count_short_circuit_ignores_limit(df):
    assert q(df).order_by("id").limit(2).count() == 6


def test_count_then_fetch(df):
    total, rows = q(df).filter(severity="error").order_by("id").limit(2).count_then_fetch()
    assert total == 3 and len(rows) == 2


def test_value_counts(df):
    vc = q(df).value_counts("severity").collect()
    assert (vc[0]["severity"], vc[0]["count"]) == ("error", 3)


def test_group_agg(df):
    out = {
        r["tool"]: r["n"]
        for r in q(df).filter(severity="error").group_by("tool").agg(n="count(*)").collect()
    }
    assert out == {"gcc": 2, "pytest": 1}
    mx = q(df).group_by("tool").max("line").collect()
    assert {r["tool"]: r["max_line"] for r in mx}["gcc"] == 30


def test_builder_immutable(df):
    base = q(df).filter(severity="error")
    narrowed = base.filter(tool="gcc")
    assert base.count() == 3 and narrowed.count() == 2


# --- filter mini-DSL ---------------------------------------------------------


def test_dsl_forms(df):
    assert q(df).filter_dsl(["severity=error"]).count() == 3
    assert q(df).filter_dsl(["severity=error,warning"]).count() == 5
    assert q(df).filter_dsl(["message~UNUSED"]).count() == 2  # ~ is case-insensitive
    assert q(df).filter_dsl(["severity!=error"]).count() == 3
    assert q(df).filter_dsl(["line=10"]).count() == 1  # numeric coercion


def test_dsl_case_insensitive_and_invert(df):
    assert q(df).filter_dsl(["severity=ERROR"], case_insensitive=True).count() == 3
    assert q(df).filter_dsl(["severity=error", "tool=gcc"], invert=True).count() == 4


def test_dsl_invalid():
    with pytest.raises(FilterExpressionError):
        parse_filter_expression("no-operator-here")


# --- terminals + introspection (reference query.py:405-458) ------------------


def test_fetchone_and_exists(df):
    row = q(df).filter(severity="error").order_by("id").fetchone()
    assert row["id"] == 1
    assert q(df).filter(severity="error").exists()
    assert not q(df).filter(severity="fatal").exists()
    assert q(df).filter(severity="fatal").fetchone() is None


def test_columns_dtypes_describe_show(df, capsys):
    sub = q(df).select("id", "severity")
    assert sub.columns() == ["id", "severity"]
    assert dict(sub.dtypes())["id"] == "int"
    desc = q(df).describe().collect()
    assert {r["summary"] for r in desc} >= {"count", "min", "max"}
    q(df).limit(2).show()
    assert "severity" in capsys.readouterr().out


# --- constructors (reference query.py:68-233) --------------------------------


GCC_SNIPPET = (
    "src/a.c:10:5: error: undefined reference to 'foo'\n"
    "src/a.c:20:1: warning: unused variable 'x'\n"
)


def test_from_content_and_file(spark, tmp_path):
    lq = LogQuery.from_content(spark, GCC_SNIPPET, fmt="gcc")
    assert lq.filter(severity="error").count() == 1
    assert "fingerprint" in lq.columns()
    p = tmp_path / "build.log"
    p.write_text(GCC_SNIPPET)
    lq2 = LogQuery.from_file(spark, str(p))  # auto-detect
    assert lq2.count() == 2
    assert lq2.filter(ref_file="src/a.c").count() == 2


def test_from_sql_table_parquet(spark, df, tmp_path):
    df.createOrReplaceTempView("lq_src")
    assert LogQuery.from_table(spark, "lq_src").count() == 6
    assert (
        LogQuery.from_sql(spark, "SELECT * FROM lq_src WHERE severity = 'error'").count()
        == 3
    )
    path = str(tmp_path / "lq.parquet")
    df.write.parquet(path)
    assert LogQuery.from_parquet(spark, path).filter(tool="gcc").count() == 3
