"""Line-selection and grep-with-context operators over raw output text
(SURVEY.md §2: F23 parse_lines line-specs, J6 context semi-join, W4 window
formulation, J7 mark ranges; reference bird_schema.sql:797-850 and the MCP
`output` tool head/tail/grep semantics, serve.py:1305-1444).

Scale note: the reference's context expansion is a non-equi self-join
(J6); we use the window formulation (W4) — one shuffle on the document
key, no nested-loop join — which is the shape that survives 100 TB.
"""

from __future__ import annotations

import re

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame, Window


def text_to_lines(
    df: DataFrame, id_col: str = "id", text_col: str = "content", sep: str = "\n"
) -> DataFrame:
    """Explode a text column into (id, line_number, line) rows; 1-based
    line numbers (reference parse_lines TVF input shape)."""
    # strip trailing newlines only (reference rtrim(content, chr(10)||chr(13)),
    # bird_schema.sql:803,829) — Spark's rtrim only strips spaces
    stripped = F.regexp_replace(F.col(text_col), "[\r\n]+$", "")
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(F.split(stripped, sep)).alias("pos", "line"),
    ).select("id", (F.col("pos") + 1).alias("line_number"), "line")


_SPEC_PART = re.compile(
    r"^\s*(?:(?P<start>\d+)\s*-\s*(?P<end>\d+)|(?P<center>\d+)\s*(?:\+/-|±)\s*(?P<ctx>\d+)|(?P<single>\d+))\s*$"
)


def parse_linespec(spec: str) -> list[tuple[int, int]]:
    """Parse a line-spec like "42 +/-5, 10-20, 7" into inclusive ranges
    (reference `parse_lines(content, lines := '42 +/-5')`,
    bird_schema.sql:805, serve.py:1385-1400)."""
    ranges: list[tuple[int, int]] = []
    for part in spec.split(","):
        m = _SPEC_PART.match(part)
        if not m:
            raise ValueError(f"invalid line spec part: {part!r}")
        if m["start"]:
            ranges.append((int(m["start"]), int(m["end"])))
        elif m["center"]:
            c, k = int(m["center"]), int(m["ctx"])
            ranges.append((max(1, c - k), c + k))
        else:
            s = int(m["single"])
            ranges.append((s, s))
    return ranges


def linespec_predicate(spec: str, line_col: Column | None = None) -> Column:
    """Compile a line-spec to a Column predicate (OR of BETWEENs)."""
    line_col = line_col if line_col is not None else F.col("line_number")
    ranges = parse_linespec(spec)
    cond = line_col.between(*ranges[0])
    for lo, hi in ranges[1:]:
        cond = cond | line_col.between(lo, hi)
    return cond


def select_lines(lines: DataFrame, spec: str) -> DataFrame:
    """`blq_read_lines` line-spec selection (F23)."""
    return lines.filter(linespec_predicate(spec))


def grep_with_context(
    lines: DataFrame, pattern: str, ctx: int = 2, ignore_case: bool = True
) -> DataFrame:
    """Keep lines within ±ctx of any regex match — the reference's
    blq_search_lines (J6 range semi-join, bird_schema.sql:840-850)
    re-expressed as a window over ordered lines (W4): max(is_match) over
    rowsBetween(-ctx, ctx), partitioned by document."""
    pat = f"(?i){pattern}" if ignore_case else pattern
    w = Window.partitionBy("id").orderBy("line_number").rowsBetween(-ctx, ctx)
    flagged = lines.withColumn("is_match", F.col("line").rlike(pat).cast("int"))
    return (
        flagged.withColumn("in_context", F.max("is_match").over(w) == 1)
        .filter(F.col("in_context"))
        .select("id", "line_number", "line", (F.col("is_match") == 1).alias("is_match"))
    )


def apply_marks(lines: DataFrame, marks: list[tuple[int, int, str]]) -> DataFrame:
    """`blq_read_lines` mark-range annotation (J7): non-equi LEFT JOIN
    against a tiny broadcast ranges table (reference bird_schema.sql:
    797-808). marks: (start, end, mark)."""
    spark = lines.sparkSession
    mr = F.broadcast(
        spark.createDataFrame(marks, "start int, end int, mark string")
    )
    j = lines.join(
        mr,
        (lines.line_number >= mr.start) & (lines.line_number <= mr.end),
        "left",
    )
    return j.groupBy("id", "line_number", "line").agg(
        F.first("mark", ignorenulls=True).alias("mark")
    )


def head_tail(lines: DataFrame, head: int | None = None, tail: int | None = None) -> DataFrame:
    """MCP `output` tool head/tail selection (reference serve.py:1305-1444):
    first N and/or last N lines per document — windows, not collects."""
    out = lines
    if head is not None:
        out = out.filter(F.col("line_number") <= head)
    if tail is not None:
        w = Window.partitionBy("id")
        lines_max = lines.withColumn("_max", F.max("line_number").over(w))
        tail_part = lines_max.filter(F.col("line_number") > F.col("_max") - tail).drop("_max")
        out = tail_part if head is None else out.unionByName(tail_part).distinct()
    return out


def resolve_under_root(root: str, ref_file: str) -> str:
    """Path-safety resolve (P12, reference output.py:844-868): resolve a
    file reference against the project root and refuse anything escaping
    it (absolute paths outside, `..` traversal, symlink escapes). Used
    before reading source-context lines for an event's ref_file."""
    import os

    root_real = os.path.realpath(root)
    candidate = os.path.realpath(os.path.join(root_real, ref_file))
    if candidate != root_real and not candidate.startswith(root_real + os.sep):
        raise ValueError(f"path escapes project root: {ref_file!r}")
    return candidate
