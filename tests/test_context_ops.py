"""Context/line operators not covered by gate oracles: head/tail, mark
ranges, line-spec parser edge cases."""

from __future__ import annotations

import pytest

from blq_cli_spark.operators import context as ctx


@pytest.fixture(scope="module")
def lines(spark):
    text = "\n".join(f"line {i}" for i in range(1, 21)) + "\n"
    df = spark.createDataFrame([("doc1", text)], "id string, content string")
    return ctx.text_to_lines(df)


def test_text_to_lines_numbers(lines):
    rows = sorted(lines.collect(), key=lambda r: r["line_number"])
    assert len(rows) == 20  # trailing newline doesn't create an empty line
    assert rows[0]["line_number"] == 1 and rows[0]["line"] == "line 1"


def test_parse_linespec_forms():
    assert ctx.parse_linespec("42 +/-5") == [(37, 47)]
    assert ctx.parse_linespec("2 ±3") == [(1, 5)]  # clamped to 1
    assert ctx.parse_linespec("10-20, 5") == [(10, 20), (5, 5)]
    with pytest.raises(ValueError):
        ctx.parse_linespec("abc")


def test_select_lines(lines):
    got = sorted(r["line_number"] for r in ctx.select_lines(lines, "3 +/-1, 18-19").collect())
    assert got == [2, 3, 4, 18, 19]


def test_grep_context_window(lines):
    out = ctx.grep_with_context(lines, "line 10$", ctx=2).collect()
    nums = sorted(r["line_number"] for r in out)
    assert nums == [8, 9, 10, 11, 12]
    assert {r["line_number"]: r["is_match"] for r in out}[10] is True


def test_apply_marks(lines):
    out = ctx.apply_marks(lines, [(3, 5, "hot"), (10, 10, "pin")])
    marks = {r["line_number"]: r["mark"] for r in out.collect()}
    assert marks[3] == "hot" and marks[5] == "hot" and marks[10] == "pin"
    assert marks[1] is None and len(marks) == 20  # left join keeps all lines


def test_head_tail(lines):
    head = sorted(r["line_number"] for r in ctx.head_tail(lines, head=3).collect())
    assert head == [1, 2, 3]
    tail = sorted(r["line_number"] for r in ctx.head_tail(lines, tail=2).collect())
    assert tail == [19, 20]
    both = sorted(r["line_number"] for r in ctx.head_tail(lines, head=2, tail=2).collect())
    assert both == [1, 2, 19, 20]


def test_resolve_under_root(tmp_path):
    from blq_cli_spark.operators.context import resolve_under_root

    (tmp_path / "src").mkdir()
    f = tmp_path / "src" / "a.c"
    f.write_text("x")
    assert resolve_under_root(str(tmp_path), "src/a.c") == str(f.resolve())
    import pytest as _pytest

    for bad in ("../etc/passwd", "/etc/passwd", "src/../../etc/passwd"):
        with _pytest.raises(ValueError):
            resolve_under_root(str(tmp_path), bad)


def test_asof_join_semantics_and_plan(spark):
    import datetime as dt

    import pyspark.sql.functions as F

    from blq_cli_spark.operators.asof import asof_join

    t = lambda s: dt.datetime(2026, 1, 1, 0, 0, s)
    left = spark.createDataFrame(
        [(1, t(10), "p1"), (1, t(20), "p2"), (2, t(5), "p3")],
        "k int, ts timestamp, pid string",
    )
    right = spark.createDataFrame(
        [(1, t(10), "c_tie"), (1, t(15), "c15"), (2, t(9), "c_late")],
        "k int, ts timestamp, cid string",
    )
    out = {
        r["pid"]: r["cid"]
        for r in asof_join(left, right, "k", "ts", ["cid"]).collect()
    }
    # exact tie matches (>= semantics); latest-at-or-before wins;
    # right rows after every left row -> null
    assert out == {"p1": "c_tie", "p2": "c15", "p3": None}

    inner = asof_join(left, right, "k", "ts", ["cid"], how="inner")
    assert {r["pid"] for r in inner.collect()} == {"p1", "p2"}

    # one shuffle, no join node: the whole point vs a range join
    import contextlib, io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        asof_join(left, right, "k", "ts", ["cid"]).explain("formatted")
    assert "Join" not in buf.getvalue()
