"""Corpus-quality and data-safety operators for training-data pipelines:
Gopher-style repetition signals, PII detection/redaction, and benchmark
decontamination.

These extend the reference's text surface (its quality signals stop at
event fingerprinting, src/blq/events.py:96-153) with the standard
large-corpus curation steps a 100 TB pretraining pipeline runs between
ingest and tokenization.

Scale design:
- repetition_profile is explode -> two keyed aggregations; the n-gram
  fan-out is bounded (3x tokens) and both shuffles key on (doc, n, gram)
  / (doc, n) — well-distributed, map-side combinable.
- PII ops are pure column expressions (regexp_extract_all /
  regexp_replace) — whole-stage codegen, zero Python.
- decontaminate broadcasts the *benchmark* shingle set (benchmarks are
  MBs, corpora are TBs — always broadcast the small, fixed side) so the
  corpus scan never shuffles; the per-doc overlap agg shuffles only the
  matched rows.

All outputs are engine-portable (no hash/RNG beyond md5) so each op is
DuckDB-oracle-checkable bit-for-bit.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from blq_cli_spark.operators.text import tokens

# --- repetition (Gopher-style quality signals) ------------------------------


def _raw_ngrams(t: Column, n: int) -> Column:
    """Word n-grams WITH multiplicity (repetition needs duplicate counts;
    contrast ngrams_from_tokens, which dedups for shingle-set semantics)."""
    if n == 1:
        return t
    make = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
    )
    return F.when(F.size(t) >= n, make).otherwise(F.array().cast("array<string>"))


def repetition_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition signals (the Gopher/MassiveText quality
    rules, re-expressed relationally):

    - ``top_token_ratio``: occurrences of the most frequent token / total
      tokens (catches "buy buy buy ..." spam),
    - ``dup_2gram_ratio`` / ``dup_3gram_ratio``: fraction of n-gram
      occurrences that belong to a duplicated n-gram (catches boilerplate
      and template loops).

    One explode over the union of 1/2/3-gram streams, then two keyed
    aggregations — both map-side combinable, no joins, no windows. The
    fan-out is ~3x the token count, so the shuffle volume stays linear in
    corpus size at 100 TB.
    """
    toks = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t"))
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    toks = toks.repartition(parallelism, "id")

    def tagged(n: int) -> Column:
        return F.transform(
            _raw_ngrams(F.col("t"), n),
            lambda g: F.struct(F.lit(n).alias("n"), g.alias("g")),
        )

    grams = toks.select(
        "id", F.explode(F.concat(tagged(1), tagged(2), tagged(3))).alias("gr")
    ).select("id", F.col("gr.n").alias("n"), F.col("gr.g").alias("g"))
    counts = grams.groupBy("id", "n", "g").agg(F.count(F.lit(1)).alias("c"))
    stats = counts.groupBy("id", "n").agg(
        F.sum("c").alias("total"),
        F.max("c").alias("maxc"),
        F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0))).alias("dup"),
    )
    pick = lambda n, expr: F.max(F.when(F.col("n") == n, expr))  # noqa: E731
    return stats.groupBy("id").agg(
        pick(1, F.col("total")).alias("n_tokens"),
        F.round(pick(1, F.col("maxc") / F.col("total")), 6).alias("top_token_ratio"),
        F.round(pick(2, F.col("dup") / F.col("total")), 6).alias("dup_2gram_ratio"),
        F.round(pick(3, F.col("dup") / F.col("total")), 6).alias("dup_3gram_ratio"),
    )


# --- PII detection / redaction ----------------------------------------------

# Patterns are deliberately restricted to syntax valid in BOTH Java regex
# (Spark) and RE2 (DuckDB), with identical match semantics: character
# classes, bounded repetition, \b word boundaries. No lookaround (RE2 has
# none), no possessive quantifiers.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b",
    "phone": r"\+?\d[\d\- ]{6,}\d",
}
# Redaction order matters: emails first (their local parts contain digits
# a later phone pass could half-match), then IPs, then phones.
PII_ORDER = ("email", "ipv4", "phone")


def pii_count(text: Column, kind: str) -> Column:
    """Occurrences of one PII kind (see PII_PATTERNS) as a long column."""
    return F.size(F.regexp_extract_all(text, F.lit(PII_PATTERNS[kind]), F.lit(0))).cast(
        "long"
    )


def redact_pii(text: Column) -> Column:
    """Replace every PII match with a typed placeholder (<EMAIL>, <IPV4>,
    <PHONE>). Pure regexp_replace chain — codegen'd, zero Python."""
    out = text
    for kind in PII_ORDER:
        out = F.regexp_replace(out, PII_PATTERNS[kind], f"<{kind.upper()}>")
    return out


def pii_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts + the redacted text. One projection over
    the scan: no shuffle at all — this op is scan-bound at any scale."""
    t = F.col(text_col)
    return df.select(
        F.col(id_col).alias("id"),
        pii_count(t, "email").alias("n_emails"),
        pii_count(t, "ipv4").alias("n_ipv4"),
        pii_count(t, "phone").alias("n_phones"),
        redact_pii(t).alias("redacted"),
    )


# --- benchmark decontamination ----------------------------------------------


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_overlap: int = 1,
) -> DataFrame:
    """Flag corpus documents sharing word n-gram shingles with an
    evaluation benchmark (the GPT-3/Llama-style train-test overlap check).

    Returns (id, n_gram_hits, n_bench_docs): distinct contaminated
    shingles and distinct benchmark documents hit.

    Scale shape: the benchmark side is exploded to its distinct
    (bench_id, shingle) pairs and BROADCAST — benchmarks are fixed and
    tiny next to a 100 TB corpus, so the corpus scan joins map-side with
    no shuffle; only matched rows (a vanishing fraction) reach the
    per-doc aggregation."""

    def shingles(df: DataFrame, out_id: str) -> DataFrame:
        toks = df.select(F.col(id_col).alias(out_id), tokens(F.col(text_col)).alias("t"))
        return toks.select(
            out_id,
            F.explode(F.array_distinct(_raw_ngrams(F.col("t"), n))).alias("g"),
        )

    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    corp_g = shingles(corpus.repartition(parallelism, id_col), "id")
    bench_g = shingles(benchmark, "bench_id")
    return (
        corp_g.join(F.broadcast(bench_g), "g")
        .groupBy("id")
        .agg(
            F.countDistinct("g").alias("n_gram_hits"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_gram_hits") >= min_overlap)
    )


# --- distribution-based quality signals --------------------------------------


def unigram_logprob(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Mean ln(corpus unigram probability) per document — the cheap
    perplexity proxy for gibberish filtering.

    Scale shape: the token-frequency table is CORPUS-DERIVED and
    unbounded (a raw web corpus has billions of distinct tokens from
    typos/hashes/URLs), so it must NOT be broadcast unconditionally —
    the token join is a plain equi-join on `w` and AQE is free to
    broadcast it only when it actually fits. Both corpus-sized shuffles
    (frequency count, per-doc mean) are map-side combinable; the only
    forced broadcast is the single-row grand total."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t"))
        .repartition(parallelism, "id")
        .select("id", F.explode("t").alias("w"))
    )
    # the frequency table materializes once (localCheckpoint): its two
    # consumers (grand total + the token join) would otherwise each
    # re-derive it with another full corpus scan
    freq = (
        toks.groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    total = freq.agg(F.sum("c").alias("n"))
    return (
        toks.join(freq, "w")
        .join(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.round(F.avg(F.log(F.col("c") / F.col("n"))), 6).alias("avg_logprob"),
        )
    )


def perplexity_buckets(
    df: DataFrame,
    n_buckets: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al., arXiv:1911.00359
    §4): split each language's documents into `n_buckets` quantile
    buckets of the LM score — CCNet's head/middle/tail thirds, where
    "head" (the highest bucket index here) is the best-scoring slice a
    pipeline keeps or upweights. The score is the unigram_logprob
    perplexity proxy; higher avg_logprob = less perplexing = better.

    Returns (id, lang, n_tokens, avg_logprob, ppl_bucket) with
    ppl_bucket in [0, n_buckets) = how many within-language quantile
    thresholds the doc's score exceeds (n_buckets-1 = head). Every
    input doc gets a row: token-less docs score NULL and land in the
    tail (bucket 0 — empty text IS maximal gibberish), and a NULL
    language is its own stratum (the stratified_sample precedent), so
    a downstream keep-filter never silently loses rows.

    Scale shape: scores are checkpointed once (two consumers: the
    threshold aggregate and the final join — without the cut the whole
    LM-score pipeline runs twice); the per-language threshold table is
    DIMENSION-sized (one row per language, exact interpolated
    percentiles) so its broadcast is legitimate, unlike the corpus
    vocabulary. Bucket assignment is a pure column expression."""
    if n_buckets < 2:
        raise ValueError("n_buckets must be >= 2")
    scores = unigram_logprob(df, text_col=text_col, id_col=id_col)
    langs = df.select(
        F.col(id_col).alias("id"),
        F.coalesce(F.col(lang_col).cast("string"), F.lit("\x00null")).alias(
            "_lang"
        ),
    )
    scored = (
        langs.join(scores, "id", "left")
        .withColumn("n_tokens", F.coalesce(F.col("n_tokens"), F.lit(0)))
        .localCheckpoint(eager=False)
    )
    ps = ", ".join(str(i / n_buckets) for i in range(1, n_buckets))
    # percentile() ignores NULL scores; an all-null language yields a
    # NULL threshold array and the coalesce below sends those docs to 0
    ths = scored.groupBy("_lang").agg(
        F.expr(f"percentile(avg_logprob, array({ps}))").alias("_ths")
    )
    bucket = F.coalesce(
        F.aggregate(
            F.col("_ths"),
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.col("avg_logprob") > t, F.lit(1)).otherwise(F.lit(0)),
        ),
        F.lit(0),
    )
    lang_out = F.when(F.col("_lang") == "\x00null", F.lit(None)).otherwise(
        F.col("_lang")
    )
    return scored.join(F.broadcast(ths), "_lang").select(
        "id",
        lang_out.alias("lang"),
        "n_tokens",
        "avg_logprob",
        bucket.cast("int").alias("ppl_bucket"),
    )


def source_kl(
    df: DataFrame, text_col: str = "text", source_col: str = "source"
) -> DataFrame:
    """Per-source KL divergence of the token distribution against the
    whole corpus — the domain-shift audit behind source-mix decisions.
    Exact finite sum: a source's token support is a subset of the
    corpus's, so no smoothing term is needed.

    Scale shape: per-source totals and the grand total ARE
    dimension-sized (one row per source / one row overall) and broadcast;
    the per-token corpus distribution is CORPUS-DERIVED and unbounded,
    so that join stays a plain equi-join on `w` (AQE broadcasts it only
    when it genuinely fits)."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.select(F.col(source_col).alias("source"), tokens(F.col(text_col)).alias("t"))
        .repartition(parallelism, "source")
        .select("source", F.explode("t").alias("w"))
    )
    # ONE corpus scan: the (source, token) counts materialize once and
    # every other table is a rollup of them — per-source totals, the
    # corpus token distribution, and the grand total (the naive form
    # re-scanned the corpus for each: four reads)
    src = (
        toks.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)
    )
    src_tot = src.groupBy("source").agg(F.sum("c").alias("n"))
    corpus = src.groupBy("w").agg(F.sum("c").alias("cc"))
    corpus_tot = src.agg(F.sum("c").alias("nn"))
    p = F.col("c") / F.col("n")
    q = F.col("cc") / F.col("nn")
    return (
        src.join(F.broadcast(src_tot), "source")
        .join(corpus, "w")
        .join(F.broadcast(corpus_tot))
        .groupBy("source")
        .agg(F.round(F.sum(p * F.log(p / q)), 6).alias("kl_vs_corpus"))
    )


def remove_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_tokens: int = 10,
    min_docs: int = 2,
) -> DataFrame:
    """Cross-document boilerplate removal (C4 / RefinedWeb repeated-line
    rule, adapted to token spans): split each document into consecutive
    `span_tokens`-token spans, drop every span whose text occurs in
    `min_docs`-or-more DISTINCT documents, and reassemble the survivors
    in order. Whitespace is normalized to single spaces (the only
    rewrite this operator performs besides span removal).

    Returns (id, n_spans, n_kept, clean_text); documents whose every
    span was boilerplate come back with n_kept=0 and clean_text=''.

    Scale shape (100 TB): spans explode ~1x the corpus token volume;
    the distinct-doc count per span text is a two-stage map-side-
    combinable aggregate on the md5 span key, and the count table is
    CORPUS-DERIVED and unbounded (hot boilerplate spans are exactly the
    point), so it joins back as a plain equi-join — no broadcast hint,
    AQE may broadcast only when it fits. Reassembly is one keyed
    aggregate with an array_sort on bounded per-doc state (a doc's own
    spans). Nothing is quadratic; nothing collects to the driver.

    Reference parity: the reference's closest surface is suppression
    filtering (src/blq/services/query.py:299-302) — this is the
    corpus-cleaning generalization the north star asks for.
    """
    # normalize EVERY whitespace kind first, then trim: real web text is
    # full of tabs/newlines, and 'subscribe to\nour newsletter' must
    # match 'subscribe to our newsletter' for the cross-doc count
    norm = F.trim(F.regexp_replace(F.col(text_col), r"\s+", " "))
    toks = F.split(norm, " ")
    k = span_tokens
    # split() always yields >=1 element, so n_spans >= 1 and the
    # sequence below never runs descending.
    n_spans = F.ceil(F.size(toks) / F.lit(float(k))).cast("int")
    spans_arr = F.transform(
        F.sequence(F.lit(0), n_spans - 1),
        lambda i: F.array_join(F.slice(toks, i * k + 1, k), " "),
    )
    spans = df.select(
        F.col(id_col).alias("id"), F.posexplode(spans_arr).alias("pos", "span_text")
    ).withColumn("span_fp", F.md5(F.col("span_text")))
    counts = spans.groupBy("span_fp").agg(F.count_distinct(F.col("id")).alias("_nd"))
    tagged = spans.join(counts, "span_fp")  # plain equi-join: corpus-derived side
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("_nd") < min_docs,
                        F.struct(F.col("pos"), F.col("span_text")),
                    )
                )
            ),
            lambda s: s.span_text,
        ),
        " ",
    )
    return tagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum((F.col("_nd") < min_docs).cast("int")).alias("n_kept"),
        kept_text.alias("clean_text"),
    )


def dedup_paragraphs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-global paragraph dedup, first-occurrence-wins (the Dolma
    paragraph rule, arXiv:2402.00159 §2.2, also RedPajama-v2): split
    each document on newline runs, keep a paragraph only at its first
    occurrence (the (id, position) lexicographic minimum over the whole
    corpus), drop every later copy, and reassemble survivors in order.
    Complements remove_repeated_spans: that rule deletes boilerplate
    from EVERY document; this one preserves global content exactly once.
    Matching is on the whitespace-normalized paragraph, so trailing-
    space copies collapse.

    Returns (id, n_paragraphs, n_kept, clean_text); every input doc
    gets a row (empty/all-duplicate docs come back 0, 0, '').

    Scale shape (100 TB): paragraphs explode ~1x corpus volume; the
    first-occurrence table is ONE map-side-combinable min(struct(id,
    pos)) aggregate on the md5 key — a million-copy boilerplate
    paragraph partially combines on every map task instead of piling
    into one window partition — and it joins back as a plain equi-join
    (corpus-derived, never broadcast-hinted; AQE may). Reassembly is
    the keyed array_sort aggregate on bounded per-doc state. Nothing
    collects to the driver."""
    paras = (
        df.select(
            F.col(id_col).alias("id"),
            F.posexplode(F.split(F.col(text_col), r"\n+")).alias("pos", "para"),
        )
        .filter(F.trim(F.col("para")) != "")
        .withColumn(
            # explicit whitespace class: Java \s and RE2 \s disagree on
            # \x0B, and the DuckDB oracle runs the identical pattern
            "fp", F.md5(F.trim(F.regexp_replace(F.col("para"),
                                                "[ \t\n\r\f]+", " ")))
        )
    )
    first = paras.groupBy("fp").agg(F.min(F.struct("id", "pos")).alias("first"))
    tagged = paras.join(first, "fp").withColumn(
        "_keep",
        (F.col("id") == F.col("first.id")) & (F.col("pos") == F.col("first.pos")),
    )
    kept_text = F.array_join(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("_keep"), F.struct(F.col("pos"), F.col("para")))
                )
            ),
            lambda s: s.para,
        ),
        "\n",
    )
    agg = tagged.groupBy("id").agg(
        F.count(F.lit(1)).alias("n_paragraphs"),
        F.sum(F.col("_keep").cast("long")).alias("n_kept"),
        kept_text.alias("clean_text"),
    )
    return (
        df.select(F.col(id_col).alias("id"))
        .join(agg, "id", "left")
        .select(
            "id",
            F.coalesce(F.col("n_paragraphs"), F.lit(0)).alias("n_paragraphs"),
            F.coalesce(F.col("n_kept"), F.lit(0)).alias("n_kept"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )


def gopher_flags(
    text_col: str = "text",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> dict[str, Column]:
    """The Gopher rule booleans as reusable column expressions (keys:
    the five rule names + 'passes'). Shared by gopher_rules and the
    corpus report so the definitions cannot drift."""
    from blq_cli_spark.operators.text import EN_STOPWORDS

    t = tokens(F.col(text_col))
    n = F.size(t)
    safe_n = F.greatest(n, F.lit(1))
    mean_len = F.aggregate(
        t, F.lit(0).cast("double"), lambda acc, w: acc + F.length(w)
    ) / safe_n
    n_symbols = (
        F.size(F.split(F.col(text_col), "#", -1)) - 1
        + F.size(F.split(F.col(text_col), r"\.\.\.", -1)) - 1
    )
    n_alpha_words = F.size(F.filter(t, lambda w: w.rlike("[a-zA-Z]")))
    stop_arr = F.array(*[F.lit(s) for s in EN_STOPWORDS])
    n_stop = F.size(F.filter(t, lambda w: F.array_contains(stop_arr, F.lower(w))))
    rules = {
        "token_count_ok": (n >= min_tokens) & (n <= max_tokens),
        "mean_word_len_ok": (mean_len >= min_mean_word_len)
        & (mean_len <= max_mean_word_len),
        "symbol_ratio_ok": (n_symbols / safe_n) <= max_symbol_ratio,
        "alpha_word_ratio_ok": (n_alpha_words / safe_n) >= min_alpha_word_ratio,
        "stopwords_ok": n_stop >= min_stopwords,
    }
    passes = None
    for expr in rules.values():
        passes = expr if passes is None else (passes & expr)
    rules["passes"] = passes
    return rules


def gopher_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_tokens: int = 10,
    max_tokens: int = 100_000,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_ratio: float = 0.1,
    min_alpha_word_ratio: float = 0.8,
    min_stopwords: int = 2,
) -> DataFrame:
    """The Gopher/MassiveText document-level rule filters (Rae et al.
    2021, arXiv:2112.11446 §A1.1) as pure column expressions: token-count
    bounds, mean-word-length bounds, symbol-to-word ratio (# and ...),
    alphabetic-word ratio, and a minimum stopword count. Returns one row
    per document with each rule's boolean plus the conjunction
    ``passes``.

    Scale shape: zero shuffles and zero Python — every rule is a
    codegen'd projection over the token array, so the filter runs at
    scan speed and composes with partition pruning. (The repetition
    rules from the same paper live in repetition_profile — they need
    aggregation; these do not.)"""
    rules = gopher_flags(
        text_col,
        min_tokens=min_tokens,
        max_tokens=max_tokens,
        min_mean_word_len=min_mean_word_len,
        max_mean_word_len=max_mean_word_len,
        max_symbol_ratio=max_symbol_ratio,
        min_alpha_word_ratio=min_alpha_word_ratio,
        min_stopwords=min_stopwords,
    )
    return df.select(
        F.col(id_col).alias("id"),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
        *[rules[name].alias(name) for name in rules],
    )


def bigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    lam: float = 0.7,
) -> DataFrame:
    """Interpolated bigram LM score per document: the mean over token
    positions 2..n of ln(lam * P(w|v) + (1-lam) * P(w)), with P(w|v) =
    corpus bigram count / context count and P(w) the corpus unigram —
    the conditional upgrade of unigram_logprob (a gibberish filter that
    also catches shuffled-but-common-token text). Fixed-lambda linear
    interpolation keeps every term exactly computable cross-engine (no
    discounting state).

    Scale shape: identical to unigram_logprob — the bigram, context,
    and unigram tables are all CORPUS-DERIVED and unbounded, so each
    joins back as a plain equi-join (no broadcast hint; AQE decides);
    every count aggregate is map-side combinable; the only forced
    broadcast is the single-row grand total."""
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    toks = (
        df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t"))
        .repartition(parallelism, "id")
        .filter(F.size("t") >= 2)
    )
    big = toks.select(
        "id",
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("v"),
                    F.element_at(F.col("t"), i + 1).alias("w"),
                ),
            )
        ).alias("bg"),
    ).select("id", F.col("bg.v").alias("v"), F.col("bg.w").alias("w"))
    # the count tables materialize ONCE (localCheckpoint) so their
    # multiple consumers don't each re-scan the corpus — the naive form
    # read the input five times (per join role + per rollup); now the
    # corpus is scanned three times (per-doc bigrams, unigram counts,
    # bigram counts) and every derived table (context rollup, grand
    # total) reads the checkpointed counts instead
    uni = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .localCheckpoint(eager=False)
    )
    total = uni.agg(F.sum("cw").alias("n"))
    bcounts = (
        big.groupBy("v", "w")
        .agg(F.count(F.lit(1)).alias("cvw"))
        .localCheckpoint(eager=False)
    )
    ccounts = bcounts.groupBy("v").agg(F.sum("cvw").alias("cv"))
    p = F.lit(lam) * (F.col("cvw") / F.col("cv")) + F.lit(1.0 - lam) * (
        F.col("cw") / F.col("n")
    )
    return (
        big.join(bcounts, ["v", "w"])  # plain equi-joins: corpus-derived
        .join(ccounts, "v")
        .join(uni, "w")
        .join(F.broadcast(total))
        .groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg(F.log(p)), 6).alias("avg_logprob"),
        )
    )


def c4_line_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
) -> DataFrame:
    """C4 line-level cleaning (Raffel et al. arXiv:1910.10683 §2.2):
    keep only lines that (a) end in a terminal punctuation mark
    (period / ! / ? / closing quote), (b) carry at least
    `min_words_per_line` words, and (c) contain none of the fixed
    drop markers ('javascript', 'lorem ipsum', '{' — the boilerplate
    tells from the paper); survivors reassemble in order.

    Returns (id, n_lines, n_kept, clean_text).

    Scale shape: ONE projection — the line array splits once and every
    rule is a higher-order filter over it (whole-stage codegen, zero
    Python, zero explode, zero shuffle). The line never leaves its row,
    so this composes with gopher/classifier filters at scan speed (the
    pipeline stage rewrites in place via c4_clean_text — no join)."""
    lines = F.split(F.col(text_col), "\n")
    kept = _c4_kept_lines(lines, min_words_per_line)
    return df.select(
        F.col(id_col).alias("id"),
        F.size(lines).alias("n_lines"),
        F.size(kept).alias("n_kept"),
        F.array_join(kept, "\n").alias("clean_text"),
    )


def _c4_kept_lines(lines: Column, min_words_per_line: int) -> Column:
    def _keep(line):
        t = F.trim(line)
        low = F.lower(line)
        return (
            t.rlike('[.!?"\']$')
            & (F.size(F.split(t, "[ \t]+")) >= min_words_per_line)
            & ~low.contains("javascript")
            & ~low.contains("lorem ipsum")
            & ~low.contains("{")
        )

    return F.filter(lines, _keep)


def c4_clean_text(text: Column, min_words_per_line: int = 5) -> Column:
    """The C4 line rules as a pure text->text column rewrite (the
    pipeline-stage form: no id, no join, the row never moves)."""
    return F.array_join(
        _c4_kept_lines(F.split(text, "\n"), min_words_per_line), "\n"
    )


def gopher_line_rules(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bullet_ratio: float = 0.9,
    max_ellipsis_ratio: float = 0.3,
) -> DataFrame:
    """The two LINE-level Gopher rules (Rae et al. arXiv:2112.11446
    §A1.1) that complete gopher_rules' token-level set: drop documents
    where more than 90% of lines start with a bullet character or more
    than 30% end with an ellipsis — the list-page and truncated-preview
    tells. Returns (id, n_lines, bullet_ratio, ellipsis_ratio,
    bullet_ok, ellipsis_ok, passes); ratios round to 6.

    Scale shape: ONE zero-shuffle projection — the line array splits
    once, each rule is a codegen'd higher-order filter (the
    c4_line_rules shape)."""
    lines = F.split(F.col(text_col), "\n")
    n = F.size(lines)
    bullets = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike("^[-*•]"))
    )
    ellipses = F.size(
        F.filter(
            lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$")
        )
    )
    bullet_ratio = F.round(bullets / F.greatest(n, F.lit(1)), 6)
    ellipsis_ratio = F.round(ellipses / F.greatest(n, F.lit(1)), 6)
    bullet_ok = bullet_ratio <= max_bullet_ratio
    ellipsis_ok = ellipsis_ratio <= max_ellipsis_ratio
    return df.select(
        F.col(id_col).alias("id"),
        n.alias("n_lines"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
        bullet_ok.alias("bullet_ok"),
        ellipsis_ok.alias("ellipsis_ok"),
        (bullet_ok & ellipsis_ok).alias("passes"),
    )


def decontaminate_multi(
    corpus: DataFrame,
    benchmarks: dict[str, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    min_overlap: int = 1,
) -> DataFrame:
    """Benchmark-suite decontamination: one pass flags overlap against
    EVERY benchmark at once and reports which — real pipelines screen
    dozens of eval sets, and per-benchmark attribution decides whether
    to drop a document or an entire source. Returns (id, benchmark,
    n_gram_hits, n_bench_docs), one row per contaminated (doc,
    benchmark) pair with >= min_overlap distinct shared n-gram shingles.

    Scale shape — identical to decontaminate: the union of all
    benchmark shingle sets (still MBs next to a TB corpus) broadcasts
    with a benchmark-name tag, the corpus scan joins map-side with NO
    shuffle, and only matched rows reach the (id, benchmark)
    aggregation. One corpus read regardless of benchmark count."""

    def shingles(df: DataFrame, out_id: str) -> DataFrame:
        toks = df.select(
            F.col(id_col).alias(out_id), tokens(F.col(text_col)).alias("t")
        )
        return toks.select(
            out_id,
            F.explode(F.array_distinct(_raw_ngrams(F.col("t"), n))).alias("g"),
        )

    tagged = None
    for name, bench in benchmarks.items():
        part = shingles(bench, "bench_id").withColumn(
            "benchmark", F.lit(name)
        )
        tagged = part if tagged is None else tagged.unionByName(part)
    if tagged is None:
        raise ValueError("decontaminate_multi: no benchmarks given")
    parallelism = corpus.sparkSession.sparkContext.defaultParallelism
    corp_g = shingles(corpus.repartition(parallelism, id_col), "id")
    return (
        corp_g.join(F.broadcast(tagged), "g")
        .groupBy("id", "benchmark")
        .agg(
            F.countDistinct("g").alias("n_gram_hits"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .filter(F.col("n_gram_hits") >= min_overlap)
    )
