"""Fuzz parity for the ingest-prep text rewrites: 200 seeded adversarial
strings (tags, half-closed tags, entities, double-encoded entities,
controls, combining marks, ligatures, whitespace runs) through BOTH
engines — Spark's strip_html/normalize_text vs the DuckDB pipelines the
gates embed. Catches regex-semantics divergence the synthetic corpus
can't reach."""

from __future__ import annotations

import random

import duckdb
import pyspark.sql.functions as F

from blq_cli_spark.operators import text as text_ops

_PIECES = [
    "<p>", "</p>", "<script>", "</script>", "<style a=b>", "</style>",
    "<!--", "-->", "<br/>", "< notatag", "dangling >", "&amp;", "&lt;",
    "&amp;lt;", "&gt;", "&quot;", "&#39;", "&nbsp;", "&bogus;", "plain",
    "words here", "  ", "\t", "\n", "\r", "\x07", "\x1f", "\x7f",
    "café", "é", "ﬁ", "naïve", "a<b>c", "x=1<2;", "...", "'",
    '"', "{", "}", "end.",
]


def _corpus(n=200, seed=99):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        k = rng.randint(1, 14)
        out.append((i, "".join(rng.choice(_PIECES) for _ in range(k))))
    return out


_HTML_SQL = """
SELECT i,
  trim(regexp_replace(
    replace(replace(replace(replace(replace(replace(
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(t,
        '(?s)<script[^>]*>.*?</script>', ' ', 'g'),
        '(?s)<style[^>]*>.*?</style>', ' ', 'g'),
        '(?s)<!--.*?-->', ' ', 'g'),
        '<[^>]*>', ' ', 'g'),
      '&lt;', '<'), '&gt;', '>'), '&quot;', '"'), '&#39;', ''''),
      '&nbsp;', ' '), '&amp;', '&'),
    '[ \t\n\r\f]+', ' ', 'g')) AS v
FROM corpus ORDER BY i
"""

_NORM_SQL = """
SELECT i,
  trim(regexp_replace(regexp_replace(nfc_normalize(t),
    '[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f\\x7f]', '', 'g'),
    '[ \t\n\r\f]+', ' ', 'g')) AS v
FROM corpus ORDER BY i
"""


def test_strip_html_fuzz_matches_duckdb(spark):
    rows = _corpus()
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["i"]: r["v"]
        for r in df.select("i", text_ops.strip_html(F.col("t")).alias("v")).collect()
    }
    con = duckdb.connect()
    con.register("corpus", con.from_df(__import__("pandas").DataFrame(
        rows, columns=["i", "t"])))
    want = dict(con.execute(_HTML_SQL).fetchall())
    assert got == want


def test_normalize_fuzz_matches_duckdb(spark):
    rows = _corpus(seed=7)
    df = spark.createDataFrame(rows, "i long, t string")
    got = {
        r["doc_id"]: r["norm_text"]
        for r in text_ops.normalize_text(
            df, text_col="t", id_col="i"
        ).withColumnRenamed("i", "doc_id").collect()
    }
    con = duckdb.connect()
    con.register("corpus", con.from_df(__import__("pandas").DataFrame(
        rows, columns=["i", "t"])))
    want = dict(con.execute(_NORM_SQL).fetchall())
    assert got == want
