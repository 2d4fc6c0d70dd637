"""Text-analysis operators for large-scale training-data pipelines.

All operators are pure Column expressions (JVM-side, whole-stage codegen)
— no Python UDFs in the hot path. Token arrays are built once and shared
by downstream expressions; at 100 TB the scan is the only cost.

Capabilities: tokenization + token counting, shingling (word n-grams),
stopword/quality scoring, n-gram-heuristic language ID, document
fingerprinting (normalized-content hash, the Spark-side analog of the
reference's content addressing, src/blq/bird.py:1304-1360, and event
fingerprints, F21 in SURVEY.md §2.8).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# A small english stopword list for ratio features; deliberately tiny and
# fixed so the DuckDB oracle can embed the same list.
EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")


def tokens(text: Column) -> Column:
    """Whitespace tokenization. Empty string -> empty array (not [''])."""
    t = F.trim(text)
    return F.when(t == "", F.array().cast("array<string>")).otherwise(F.split(t, r"\s+"))


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def ngrams_from_tokens(t: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a token-array column.

    IMPORTANT perf note: pass a *materialized* column (a projected
    attribute), not a nested expression — higher-order functions
    re-evaluate the array argument per element, so an inline split()
    here turns O(tokens) into O(tokens^2) work (measured 10x slowdown)."""
    make = F.transform(
        F.sequence(F.lit(1), F.size(t) - (n - 1)),
        lambda i: F.concat_ws(" ", *[F.element_at(t, i + j) for j in range(n)]),
    )
    return F.array_distinct(F.when(F.size(t) >= n, make).otherwise(F.array().cast("array<string>")))


def word_ngrams(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a raw text column. Prefer
    tokenizing into a real column first and calling ngrams_from_tokens
    (see its perf note)."""
    return ngrams_from_tokens(tokens(text), n)


def stopword_ratio(text: Column, stopwords: tuple[str, ...] = EN_STOPWORDS) -> Column:
    t = tokens(text)
    hits = F.size(F.filter(t, lambda w: F.lower(w).isin(*stopwords)))
    return hits / F.greatest(F.size(t), F.lit(1))


def alpha_ratio(text: Column) -> Column:
    """Fraction of characters that are ascii letters or spaces."""
    kept = F.length(F.regexp_replace(text, "[^a-zA-Z ]", ""))
    return kept / F.greatest(F.length(text), F.lit(1))


def mean_token_len(text: Column) -> Column:
    t = tokens(text)
    total = F.aggregate(F.transform(t, F.length), F.lit(0), lambda acc, x: acc + x)
    return total / F.greatest(F.size(t), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: length band + alpha ratio +
    stopword presence. Deliberately simple and SQL-portable."""
    n = token_count(text)
    length_ok = F.when((n >= 10) & (n <= 10000), F.lit(1.0)).otherwise(F.lit(0.0))
    return F.round((length_ok + alpha_ratio(text) + stopword_ratio(text)) / 3.0, 6)


def language_id(text: Column) -> Column:
    """Stopword-heuristic language ID: 'en' if english stopword ratio clears
    a threshold, else 'unknown'. (Real n-gram models plug in here as a
    broadcast lookup table; the heuristic keeps the gate SQL-portable.)"""
    return F.when(stopword_ratio(text) >= 0.03, F.lit("en")).otherwise(F.lit("unknown"))


def fingerprint(text: Column) -> Column:
    """Normalized-content fingerprint: md5 over lowercased
    whitespace-collapsed text. Used as the exact-dedup key."""
    return F.md5(F.lower(F.regexp_replace(F.trim(text), r"\s+", " ")))


def profile(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-document text-analysis profile — one pass, all JVM expressions."""
    t = F.col(text_col)
    return df.select(
        id_col,
        token_count(t).alias("n_tokens"),
        F.length(t).alias("n_chars"),
        F.round(stopword_ratio(t), 6).alias("stop_ratio"),
        F.round(alpha_ratio(t), 6).alias("alpha_ratio"),
        F.round(mean_token_len(t), 6).alias("mean_token_len"),
        quality_score(t).alias("quality"),
        language_id(t).alias("lang_pred"),
        fingerprint(t).alias("fp"),
    )


def text_embeddings(
    df, dim: int = 64, n: int = 2, id_col: str = "doc_id", text_col: str = "text"
):
    """Deterministic text embeddings by n-gram feature hashing: each word
    n-gram md5-hashes to a signed slot (index = digest % dim, sign = one
    digest bit), vectors are L2-normalized. The classic scalable
    vectorizer (hashing trick): no vocabulary, no fit pass, identical
    vectors on any executor — so the output composes directly with the
    similarity operators (neardup_pairs / cosine_topk / lsh_bucket_topk)
    and a learned-model swap-in only changes this one mapInPandas kernel.

    Returns (id_col, embedding array<float>). Arrow-batched numpy kernel;
    one pass over tokens per document."""
    import hashlib as _hashlib
    from collections.abc import Iterator as _Iterator

    import numpy as _np
    import pandas as _pd

    def _embed(text: str) -> list[float]:
        toks = text.split()
        grams = (
            [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]
            if len(toks) >= n
            else toks
        )
        v = _np.zeros(dim, dtype=_np.float64)
        for g in grams:
            d = _hashlib.md5(g.lower().encode()).digest()
            idx = int.from_bytes(d[:4], "big") % dim
            sign = 1.0 if d[4] & 1 else -1.0
            v[idx] += sign
        norm = _np.linalg.norm(v)
        if norm > 0:
            v /= norm
        return [float(x) for x in v]

    def _batches(it: _Iterator["_pd.DataFrame"]) -> _Iterator["_pd.DataFrame"]:
        for pdf in it:
            yield _pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "embedding": [_embed(t or "") for t in pdf[text_col]],
                }
            )

    # carry the id column's real type through (a bigint doc_id must not be
    # forced to string — Arrow would reject the batch at execution)
    id_type = df.schema[id_col].dataType.simpleString()
    return df.mapInPandas(
        _batches, schema=f"{id_col} {id_type}, embedding array<float>"
    )


def search_all_terms(
    df: DataFrame,
    terms: Sequence[str],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Conjunctive (AND) term search with an occurrence-count relevance
    score — the inverted-index query shape executed as a posting-list
    aggregation: explode tokens, keep only query terms (the filter prunes
    the shuffle to |postings of query terms|, not |corpus tokens|), one
    groupBy(doc) counting total hits (score) and distinct terms (the AND
    gate). At scale the exploded (term, doc) relation IS the inverted
    index; materialize it partitioned by term to skip the explode per
    query."""
    t = tokens(F.col(text_col))
    hits = (
        df.select(F.col(id_col), F.explode(t).alias("term"))
        .filter(F.col("term").isin(*terms))
    )
    return (
        hits.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("score"),
            F.count_distinct("term").alias("_nt"),
        )
        .filter(F.col("_nt") == len(terms))
        .drop("_nt")
    )


def build_inverted_index(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Materializable inverted index: (term, doc id, term frequency).
    Write it partitioned/bucketed BY TERM and every later search touches
    only its query terms' partitions — the explode+filter in
    search_all_terms amortizes to zero across queries. One explode +
    one groupBy; tf carried for relevance scoring."""
    return (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def search_index(index: DataFrame, terms: Sequence[str], id_col: str = "doc_id") -> DataFrame:
    """Conjunctive search over a prebuilt inverted index — same results
    as search_all_terms(docs, terms) but reading only the query terms'
    posting lists (term-partition pruning when the index is stored
    partitioned by term)."""
    return (
        index.filter(F.col("term").isin(*terms))
        .groupBy(id_col)
        .agg(
            F.sum("tf").alias("score"),
            F.count(F.lit(1)).alias("_nt"),
        )
        .filter(F.col("_nt") == len(terms))
        .drop("_nt")
    )


def subword_token_count(text: Column) -> Column:
    """BPE-ish subword token count: runs of letters, runs of digits, and
    single non-alphanumeric marks each count as one token (the
    pre-tokenization split BPE vocabularies apply before merges). A
    cheap, deterministic proxy for tokenizer-cost estimation over a
    corpus — pure regexp, codegen'd, and portable to RE2 engines."""
    return F.size(
        F.regexp_extract_all(text, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"), F.lit(0))
    ).cast("long")


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    w: int = 4,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer et al., SIGMOD'03 —
    the rolling-hash local-fingerprint scheme): hash every word k-gram,
    then keep each window-of-w minimum. Guarantees any shared run of
    >= k+w-1 tokens between two documents shares a fingerprint, at ~1/w
    the storage of the full shingle set.

    Relational form: posexplode k-grams -> per-doc sliding min over a
    ROWS window -> distinct. One shuffle on the doc id (reused by the
    window), linear in corpus size; the hash is an md5 prefix so DuckDB
    selects bit-identical fingerprints."""
    from pyspark.sql import Window as W

    toks = df.select(F.col(id_col).alias("id"), tokens(F.col(text_col)).alias("t"))
    parallelism = df.sparkSession.sparkContext.defaultParallelism
    grams = (
        toks.repartition(parallelism, "id")
        .select(
            "id",
            F.posexplode(
                # guard: sequence(1, 0) would generate a DESCENDING ramp
                F.when(
                    F.size("t") >= k,
                    F.transform(
                        F.sequence(F.lit(1), F.size("t") - (k - 1)),
                        lambda i: F.concat_ws(
                            " ", *[F.element_at(F.col("t"), i + j) for j in range(k)]
                        ),
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("pos", "g"),
        )
        .select("id", "pos", F.substring(F.md5("g"), 1, 16).alias("h"))
    )
    win = W.partitionBy("id").orderBy("pos").rowsBetween(0, w - 1)
    return (
        grams.select("id", F.min("h").over(win).alias("fp"))
        .distinct()
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 128,
    overlap: int = 0,
) -> DataFrame:
    """Split documents into overlapping token-window chunks — the
    context-window prep step for embedding/retrieval pipelines and for
    training corpora whose documents exceed the model's sequence length:
    (id_col, chunk_idx, n_chunk_tokens, chunk_text).

    Windows are `size` tokens with stride `size − overlap`; the last
    chunk may be shorter, empty documents produce no chunks, and a
    document of ≤ `size` tokens produces exactly one chunk, so
    n_chunks = 1 + ceil(max(0, n − size) / stride) (integer arithmetic —
    identical in any engine).

    Scale: a pure projection + generator — tokenize once (materialized
    column, see the ngrams_from_tokens perf note), compute the chunk
    count arithmetically, explode the chunk-index range, slice the token
    array per index. Zero shuffles, zero Python; the ≤(1/stride) row
    fan-out is the output's own size. Chunk ids (id, chunk_idx) are
    deterministic and partition-independent, so downstream dedup/
    embedding joins are reproducible across runs. (Reference
    line-slicing surface this generalizes: read_lines/line-spec
    selection, src/blq/services/context.py:16-78.)"""
    if not 0 <= overlap < size:
        raise ValueError(f"need 0 <= overlap < size, got {overlap=} {size=}")
    stride = size - overlap
    t = tokens(F.col(text_col))
    base = df.select(F.col(id_col), t.alias("_t")).withColumn(
        "_nc",
        F.when(F.size("_t") <= 0, F.lit(0)).otherwise(
            1
            + F.floor(
                (F.greatest(F.size("_t") - size, F.lit(0)) + stride - 1) / stride
            ).cast("int")
        ),
    )
    idx = F.when(
        F.col("_nc") >= 1, F.sequence(F.lit(0), F.col("_nc") - 1, F.lit(1))
    ).otherwise(F.array().cast("array<int>"))
    chunk = F.slice(F.col("_t"), F.col("chunk_idx") * stride + 1, size)
    return (
        base.select(id_col, "_t", F.explode(idx).alias("chunk_idx"))
        .select(
            id_col,
            "chunk_idx",
            F.size(chunk).alias("n_chunk_tokens"),
            F.concat_ws(" ", chunk).alias("chunk_text"),
        )
    )


def tokenizer_fertility(
    df: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
) -> DataFrame:
    """Per-language tokenizer fertility: subword tokens per whitespace
    word — the standard tokenizer-health metric for multilingual
    corpora (a language whose fertility is 2-3x English's pays that
    multiple in sequence length and training cost; the usual signal to
    rebalance the tokenizer's training mix).

    Returns (lang, n_docs, n_words, n_subwords, fertility), fertility
    rounded to 6 decimals.

    Scale shape: both counts are pure regexp/split column expressions
    (codegen, zero Python), so the whole metric is one projection and
    one groupBy on the dimension-sized language key."""
    words = token_count(F.col(text_col))
    subwords = subword_token_count(F.col(text_col))
    return (
        df.select(F.col(lang_col).alias("lang"), words.alias("_w"), subwords.alias("_s"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_w").alias("n_words"),
            F.sum("_s").alias("n_subwords"),
        )
        .withColumn(
            "fertility",
            F.round(
                F.col("n_subwords") / F.greatest(F.col("n_words"), F.lit(1)), 6
            ),
        )
    )


# --- raw-text extraction / normalization (web-crawl ingest prep) -------------

# explicit whitespace class: Java \s and RE2 \s disagree on \x0B, so the
# collapse pattern spells its members out — identical in Spark, DuckDB,
# and the Python normalize kernel
_WS_CLASS = "[ \t\n\r\f]+"
# C0 controls except \t \n \r (kept for the whitespace collapse) + DEL
_CTRL_CLASS = "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f]"


def strip_html(text: Column) -> Column:
    """Markup-to-text extraction for HTML-ish crawl input: drop
    script/style payloads and comments, strip every remaining tag,
    decode the six ubiquitous entities, collapse whitespace. The
    CommonCrawl WET-style ingest step before any quality/dedup operator
    sees the text.

    Pure regexp/replace column expressions (whole-stage codegen, zero
    Python, zero shuffle). Every pattern is RE2-compatible — no
    backreferences (script and style get separate passes), so the DuckDB
    oracle runs the character-identical pipeline. `&amp;` decodes LAST:
    `&amp;lt;` must yield the literal text `&lt;`, not `<`."""
    t = F.regexp_replace(text, r"(?s)<script[^>]*>.*?</script>", " ")
    t = F.regexp_replace(t, r"(?s)<style[^>]*>.*?</style>", " ")
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"<[^>]*>", " ")
    for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                     ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
        t = F.replace(t, F.lit(ent), F.lit(rep))
    return F.trim(F.regexp_replace(t, _WS_CLASS, " "))


def normalize_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    form: str = "NFC",
    out_col: str = "norm_text",
    inplace: bool = False,
) -> DataFrame:
    """Unicode normalization for crawl text: NFC-compose (é as one
    codepoint, not e + combining acute — exact-dedup hashes and n-gram
    shingles otherwise treat the two spellings as different documents),
    strip C0/DEL control characters, collapse whitespace runs.

    Spark's JVM function set has no Unicode-normalization builtin, so
    the compose step is the documented legitimate Python path: an
    Arrow-batched mapInPandas kernel (vectorized str ops around
    unicodedata.normalize), zero shuffle, no driver traffic. The DuckDB
    oracle is nfc_normalize() + the identical regexp pipeline
    (gate x_normalize_text).

    With inplace=True the kernel rewrites `text_col` and passes every
    other column through unchanged — the corpus-pipeline form (no
    join-back shuffle; the row never leaves its partition)."""
    import re
    import unicodedata
    from collections.abc import Iterator

    import pandas as pd

    ctrl = re.compile(_CTRL_CLASS)
    ws = re.compile(_WS_CLASS)

    def _norm(s):
        if s is None:
            return None
        return ws.sub(" ", ctrl.sub("", unicodedata.normalize(form, s))).strip(" ")

    if inplace:
        schema = df.schema

        def rewrite(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                pdf = pdf.copy()
                pdf[text_col] = pdf[text_col].map(_norm)
                yield pdf

        return df.mapInPandas(rewrite, schema)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            yield pd.DataFrame(
                {"id": pdf[id_col], "v": pdf[text_col].map(_norm)}
            )

    id_type = df.schema[id_col].dataType.simpleString()
    return df.select(id_col, text_col).mapInPandas(
        kernel, f"id {id_type}, v string"
    ).select(F.col("id").alias(id_col), F.col("v").alias(out_col))


def pmi_pairs(
    df: DataFrame,
    top_k: int = 100,
    min_count: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-K bigram collocations by pointwise mutual information:
    PMI(v, w) = ln(P(v,w) / (P(v) P(w))) over adjacent token pairs —
    the standard collocation/multi-word-expression extractor (Church &
    Hanks 1990), the corpus-analysis view behind tokenizer-vocabulary
    and stopword decisions. Pairs rarer than `min_count` are dropped
    first (rare-pair PMI explodes toward ln N and is pure noise).

    Returns (w1, w2, n_pair, pmi) ordered by rounded PMI desc then
    (w1, w2) — a deterministic LIMIT boundary.

    Scale shape — exactly THREE corpus scans, none repeated (the naive
    form re-scans five times: the unigram table twice for its two join
    roles plus once per grand total; measured via executedPlan):
    one projection computes BOTH grand totals (Σ tokens, Σ bigrams) as
    a single broadcast row; the unigram count table (vocabulary-sized,
    far smaller than the corpus) materializes once via localCheckpoint
    and serves both join roles; the bigram count table is built once
    and consumed once. All count aggregates are map-side combinable;
    the min_count filter prunes the heavy bigram tail BEFORE any join;
    the unigram joins stay plain equi-joins (corpus-derived — AQE may
    broadcast, we don't hint); the final top-K is
    TakeOrderedAndProject."""
    toks = df.select(tokens(F.col(text_col)).alias("t")).filter(
        F.size("t") >= 2
    )
    big = toks.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.size("t") - 1),
                lambda i: F.struct(
                    F.element_at(F.col("t"), i).alias("v"),
                    F.element_at(F.col("t"), i + 1).alias("w"),
                ),
            )
        ).alias("bg")
    ).select(F.col("bg.v").alias("v"), F.col("bg.w").alias("w"))
    # scan 1: both grand totals in one singleton aggregate
    t_all = df.select(tokens(F.col(text_col)).alias("t"))
    totals = t_all.agg(
        F.sum(F.size("t")).cast("double").alias("n"),
        F.sum(F.greatest(F.size("t") - 1, F.lit(0)))
        .cast("double")
        .alias("nb"),
    )
    # scan 2: the vocabulary table, materialized ONCE for its two join
    # roles (without the cut it re-scans the corpus per role)
    uni = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cw"))
        .localCheckpoint(eager=False)
    )
    # scan 3: the bigram count table, consumed once
    bc = big.groupBy("v", "w").agg(F.count(F.lit(1)).alias("cvw"))
    j = (
        bc.filter(F.col("cvw") >= min_count)
        .join(uni.select(F.col("w").alias("v"), F.col("cw").alias("cv")), "v")
        .join(uni.select("w", F.col("cw").alias("cw2")), "w")
        .join(F.broadcast(totals))
    )
    pmi = F.round(
        F.log(
            (F.col("cvw") * F.col("n") * F.col("n"))
            / (F.col("nb") * F.col("cv") * F.col("cw2"))
        ),
        6,
    )
    return (
        j.select(
            F.col("v").alias("w1"),
            F.col("w").alias("w2"),
            F.col("cvw").alias("n_pair"),
            pmi.alias("pmi"),
        )
        .orderBy(F.desc("pmi"), "w1", "w2")
        .limit(top_k)
    )


def zipf_fit(
    df: DataFrame,
    top_k: int = 1000,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Zipf-law fit over the top-K vocabulary: OLS of ln(frequency) on
    ln(rank). Natural text lands near slope -1; a corpus drifting toward
    boilerplate/template mass shows a flatter head (slope > -0.8) and
    machine-generated spam a steeper tail — the one-row vocabulary
    health check next to tokenizer_fertility.

    Returns one row (n_types, slope, intercept, r2), rounded to 6.

    Scale shape: ONE map-side-combinable corpus shuffle for word counts
    + TakeOrderedAndProject top-K (the word_frequencies shape); the
    rank window and the OLS sums run on the top_k-BOUNDED table (the
    documented q11/q15 bounded-window pattern). The OLS is spelled as
    explicit sums — slope = (kΣxy - ΣxΣy) / (kΣxx - (Σx)²) — so the
    DuckDB oracle computes the character-identical arithmetic."""
    from pyspark.sql import Window

    from blq_cli_spark.operators.tokenizer import word_frequencies

    top = word_frequencies(df, top_k=top_k, text_col=text_col)
    w = Window.orderBy(F.desc("n"), "word")  # bounded: <= top_k rows
    pts = top.select(
        F.log(F.row_number().over(w).cast("double")).alias("x"),
        F.log(F.col("n").cast("double")).alias("y"),
    )
    s = pts.agg(
        F.count(F.lit(1)).cast("double").alias("k"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    k, sx, sy = F.col("k"), F.col("sx"), F.col("sy")
    sxx, syy, sxy = F.col("sxx"), F.col("syy"), F.col("sxy")
    cov = k * sxy - sx * sy
    varx = k * sxx - sx * sx
    vary = k * syy - sy * sy
    return s.select(
        k.cast("bigint").alias("n_types"),
        F.round(cov / varx, 6).alias("slope"),
        F.round((sy - (cov / varx) * sx) / k, 6).alias("intercept"),
        F.round((cov * cov) / (varx * vary), 6).alias("r2"),
    )
