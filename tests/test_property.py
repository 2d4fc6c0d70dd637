"""Property-based tests (hypothesis) for the pure compile/parse layers —
coverage the reference's hand-written suites don't have (SURVEY.md §5
"Not present: property-based/randomized testing")."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from blq_cli_spark.operators.context import parse_linespec
from blq_cli_spark.plans.dsl import FilterExpressionError, parse_filter_expression
from blq_cli_spark.sources import logparse

# --- line-spec round trip ----------------------------------------------------

range_part = st.tuples(
    st.integers(min_value=1, max_value=10**6), st.integers(min_value=0, max_value=1000)
)


@given(st.lists(range_part, min_size=1, max_size=8))
@settings(max_examples=200, deadline=None)
def test_linespec_roundtrip_ranges(parts):
    spec = ", ".join(f"{lo}-{lo + width}" for lo, width in parts)
    assert parse_linespec(spec) == [(lo, lo + width) for lo, width in parts]


@given(
    st.integers(min_value=1, max_value=10**6),
    st.integers(min_value=0, max_value=10**4),
)
@settings(max_examples=200, deadline=None)
def test_linespec_context_form_clamps_at_one(center, ctx):
    [(lo, hi)] = parse_linespec(f"{center} +/-{ctx}")
    assert lo == max(1, center - ctx) and hi == center + ctx


@given(st.text(max_size=20).filter(lambda s: not s.strip().isdigit()))
@settings(max_examples=200, deadline=None)
def test_linespec_garbage_raises_or_parses(s):
    """Arbitrary text either parses to well-formed ranges or raises
    ValueError — never returns malformed output or crashes differently."""
    try:
        ranges = parse_linespec(s)
    except ValueError:
        return
    assert all(
        isinstance(lo, int) and isinstance(hi, int) and lo >= 1 for lo, hi in ranges
    )


# --- filter DSL compiler -----------------------------------------------------

ident = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)
# one-line values only: the DSL (like the reference's, non-DOTALL regex)
# parses single CLI arguments; embedded newlines are invalid input
value = st.text(
    alphabet=st.characters(
        blacklist_characters=",=~!\n\r", blacklist_categories=("Cs",)
    ),
    min_size=1,
    max_size=15,
).filter(lambda s: s.strip())


@given(ident, st.sampled_from(["=", "!=", "~"]), value)
@settings(max_examples=100, deadline=None)
def test_dsl_any_key_op_value_compiles(spark, key, op, val):
    col = parse_filter_expression(f"{key}{op}{val}")
    assert col is not None  # compiles to a Column, never crashes


@given(st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_dsl_arbitrary_text_compiles_or_raises_cleanly(spark, s):
    try:
        parse_filter_expression(s)
    except FilterExpressionError:
        pass  # the only acceptable failure mode


# --- log parser totality -----------------------------------------------------

@given(st.text(max_size=400))
@settings(max_examples=150, deadline=None)
def test_parser_total_on_arbitrary_text(content):
    """parse_content never raises on arbitrary input, always yields
    well-formed event dicts with a severity and 1-based line spans."""
    for fmt in ("auto", "gcc", "generic"):
        events = logparse.parse_content(content, fmt)
        for ev in events:
            assert ev["severity"] in {"error", "warning", "info", "note"}
            if ev.get("log_line_start") is not None:
                assert ev["log_line_start"] >= 1
            assert ev["fingerprint"]


@given(st.text(max_size=300))
@settings(max_examples=100, deadline=None)
def test_parser_fingerprints_deterministic(content):
    a = logparse.parse_content(content, "generic")
    b = logparse.parse_content(content, "generic")
    assert [e["fingerprint"] for e in a] == [e["fingerprint"] for e in b]


# --- parser fuzz: every format must be total over arbitrary text -------------

_printable_line = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\r"),
    max_size=120,
)


@given(st.lists(_printable_line, max_size=12), st.sampled_from(sorted(logparse.FORMATS)))
@settings(max_examples=300, deadline=None)
def test_every_parser_total_over_arbitrary_text(lines, fmt):
    """No format parser may throw or emit malformed events on arbitrary
    input — log files are untrusted bytes at 100 TB, and one bad line
    must not kill a mapInPandas task."""
    content = "\n".join(lines)
    events = logparse.parse_content(content, fmt)
    n_lines = content.count("\n") + 1
    for ev in events:
        assert ev["severity"] in ("error", "warning", "note", "info")
        assert 1 <= ev["log_line_start"] <= ev["log_line_end"] <= n_lines + 1
        assert ev["fingerprint"] and ev["tool_name"]
        assert ev["format_used"] in logparse.FORMATS


@given(st.lists(_printable_line, max_size=10))
@settings(max_examples=150, deadline=None)
def test_auto_detection_total(lines):
    """Auto-detect + fallback chain never throws; picked format is real."""
    content = "\n".join(lines)
    events = logparse.parse_content(content, "auto")
    assert all(e["format_used"] in logparse.FORMATS for e in events)


# --- config value parser -----------------------------------------------------


@given(st.one_of(st.integers(), st.booleans(), st.floats(allow_nan=False, allow_infinity=False), st.text(max_size=30)))
@settings(max_examples=200, deadline=None)
def test_config_value_round_trip(v):
    """JSON-representable scalars survive str -> parse; plain words come
    back as strings."""
    import json

    from blq_cli_spark.sources.store import _parse_config_value

    parsed = _parse_config_value(json.dumps(v))
    assert parsed == v or (isinstance(v, str) and isinstance(parsed, str))


@given(st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_config_value_never_raises(s):
    from blq_cli_spark.sources.store import _parse_config_value

    _parse_config_value(s)  # any input -> some value, never an exception


# --- sandbox spec resolution -------------------------------------------------


@given(
    st.fixed_dictionaries(
        {},
        optional={
            "network": st.sampled_from(["none", "localhost", "unrestricted"]),
            "filesystem": st.sampled_from(
                ["readonly", "workspace_only", "scoped_write", "unrestricted"]
            ),
            "timeout": st.integers(min_value=1, max_value=10**6),
            "memory": st.integers(min_value=1, max_value=2**40),
            "cpu": st.integers(min_value=1, max_value=10**6),
            "processes": st.sampled_from(["isolated", "visible"]),
        },
    )
)
@settings(max_examples=200, deadline=None)
def test_sandbox_spec_dict_round_trip(d):
    from blq_cli_spark import sandbox as sbx

    spec = sbx.resolve(d)
    again = sbx.resolve(spec.to_dict())
    assert again == spec
    assert spec.grade in ("sealed", "pinhole", "scoped", "broad", "open")


# --- GIF frame walker robustness --------------------------------------------


@given(st.binary(max_size=400))
@settings(max_examples=300, deadline=None)
def test_gif_frames_never_crashes(data):
    """Arbitrary bytes (including truncated/corrupt GIF headers) must
    yield a well-formed frame list, never an exception."""
    from blq_cli_spark.multimodal.binary import gif_frames

    frames = gif_frames(b"GIF89a" + data)
    assert isinstance(frames, list)
    for fr in frames:
        assert fr["offset"] >= 0 and fr["length"] >= 0 and fr["ts_ms"] >= 0


@given(st.binary(max_size=200))
@settings(max_examples=200, deadline=None)
def test_sniff_format_total(data):
    from blq_cli_spark.multimodal.binary import sniff_format

    assert sniff_format(data) in (None, "png", "gif", "jpeg", "wav", "riff", "mp4", "webm")


# --- PII patterns (operators/quality.py) -------------------------------------

import re as _re

from blq_cli_spark.operators.quality import PII_ORDER, PII_PATTERNS


def _py_redact(s: str) -> str:
    for kind in PII_ORDER:
        s = _re.sub(PII_PATTERNS[kind], f"<{kind.upper()}>", s)
    return s


pii_fragment = st.one_of(
    st.from_regex(r"[a-z]{1,8}@[a-z]{1,8}\.[a-z]{2,4}", fullmatch=True),
    st.from_regex(r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}", fullmatch=True),
    st.from_regex(r"\+?\d[\d\- ]{6,14}\d", fullmatch=True),
    st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=12),
)


@given(st.lists(pii_fragment, max_size=6))
@settings(max_examples=200, deadline=None)
def test_pii_redaction_idempotent_and_clean(frags):
    """Redaction is idempotent, and the redacted text contains no
    residual match of ANY pattern — i.e. the placeholders themselves can
    never be re-matched (a digit-bearing placeholder would break this)."""
    s = " ".join(frags)
    once = _py_redact(s)
    assert _py_redact(once) == once
    for pat in PII_PATTERNS.values():
        assert not _re.search(pat, once)


# --- mix_sources threshold quantization --------------------------------------


def _thresh(rate: float) -> str:
    q = int(rate * 256)
    return "g" if q >= 256 else format(max(q, 0), "02x")


@given(st.floats(min_value=0.0, max_value=1.0, allow_nan=False))
@settings(max_examples=300, deadline=None)
def test_mix_threshold_keeps_exact_quantized_fraction(rate):
    """The md5-prefix rule keeps exactly floor(rate*256)/256 of the
    2-hex-char key space, and the threshold is monotone in rate."""
    t = _thresh(rate)
    kept = sum(1 for i in range(256) if format(i, "02x") < t)
    assert kept == min(int(rate * 256), 256)


@given(
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
    st.floats(min_value=0.0, max_value=1.0, allow_nan=False),
)
@settings(max_examples=200, deadline=None)
def test_mix_threshold_monotone(r1, r2):
    lo, hi = sorted((r1, r2))
    assert _thresh(lo) <= _thresh(hi)


# --- corpus-cleaning identities ---------------------------------------------

_word = st.text(alphabet="abcdefghij", min_size=1, max_size=6)


@given(st.lists(st.lists(_word, min_size=1, max_size=25), min_size=1,
                max_size=6, unique_by=lambda ws: tuple(ws)))
@settings(max_examples=15, deadline=None)
def test_remove_repeated_spans_identity_on_unique_docs(spark, docs):
    """If no span text repeats across documents, cleaning is the
    whitespace-normalizing identity: every span survives."""
    from blq_cli_spark.operators import quality

    # make docs pairwise span-disjoint by prefixing each word with the
    # doc index (uniqueness of the word lists alone doesn't prevent a
    # shared 3-token run)
    rows = [
        (i, " ".join(f"d{i}_{w}" for w in ws)) for i, ws in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["id"]: r for r in
           quality.remove_repeated_spans(df, span_tokens=3).collect()}
    for i, ws in enumerate(rows):
        assert out[i]["n_kept"] == out[i]["n_spans"]
        assert out[i]["clean_text"] == rows[i][1]


@given(st.lists(st.lists(_word, min_size=8, max_size=20), min_size=1,
                max_size=5))
@settings(max_examples=15, deadline=None)
def test_duplicate_passages_empty_on_disjoint_docs(spark, docs):
    """Prefix-disjoint docs share no 8-token window -> no passages."""
    from blq_cli_spark.operators import dedup as dedup_ops

    rows = [
        (i, " ".join(f"d{i}_{w}" for w in ws)) for i, ws in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert dedup_ops.duplicate_passages(df, k=8, min_docs=2).count() == 0


@given(st.lists(st.lists(_word, min_size=1, max_size=20), min_size=2,
                max_size=5))
@settings(max_examples=10, deadline=None)
def test_semantic_dedup_partition_property(spark, docs):
    """semantic_dedup output is always a partition of the input ids:
    every id appears once, every cluster_id is a member of its own
    cluster, and each cluster keeps exactly one representative."""
    from blq_cli_spark.operators import similarity, text as text_ops
    import pyspark.sql.functions as F

    rows = [(i, " ".join(ws)) for i, ws in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    emb = text_ops.text_embeddings(df).withColumn(
        "vec_id", F.col("doc_id")
    )
    out = similarity.semantic_dedup(emb, threshold=0.8).collect()
    assert sorted(r["id"] for r in out) == list(range(len(rows)))
    by_cluster: dict = {}
    for r in out:
        by_cluster.setdefault(r["cluster_id"], []).append(r)
    for cid, members in by_cluster.items():
        assert cid in {m["id"] for m in members}
        assert sum(m["kept"] for m in members) == 1
        assert min(m["id"] for m in members) == cid


@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdef", min_size=1, max_size=8),
            st.integers(min_value=1, max_value=50),
        ),
        min_size=0,
        max_size=12,
    ),
    st.integers(min_value=0, max_value=30),
)
@settings(max_examples=60, deadline=None)
def test_bpe_roundtrip_any_dictionary(word_counts, n_merges):
    """For ANY word dictionary and merge budget: training terminates,
    merges are unique, and greedy encoding of any word (trained or not)
    concatenates back to the word + end marker — BPE never loses or
    invents characters."""
    from blq_cli_spark.operators import tokenizer as tok

    merges = tok.bpe_train(word_counts, n_merges=n_merges)
    assert len(merges) == len(set(merges))
    assert len(merges) <= n_merges
    ranks = {p: i for i, p in enumerate(merges)}
    for w, _ in word_counts + [("fedcba", 1), ("zzz", 1)]:
        pieces = tok.encode_word(w, ranks)
        assert "".join(pieces) == w + tok.END
