"""Data selection via importance resampling (DSIR).

Implements the hashed n-gram importance-resampling recipe of Xie et al.,
"Data Selection for Language Models via Importance Resampling"
(NeurIPS 2023, arXiv:2302.03169): fit bag-of-hashed-token models of the
TARGET distribution (the domain you want more of — wiki-like, code-like)
and the RAW distribution (the corpus you are selecting from), weight
every raw document by log p_target(doc) − log q_raw(doc), then resample
with Gumbel-top-k so selection is a weighted sample rather than a hard
top slice.

Scale design (100 TB):
- The feature space is HASHED to a fixed bucket count chosen up front
  (the paper uses 10k). Unlike a token vocabulary, the bucket table is
  bounded BY CONSTRUCTION — ≤ `buckets` rows no matter how large the
  corpus — so broadcasting the per-bucket log-ratio table is legitimate
  (contrast operators/quality.py unigram_logprob, where the corpus-
  derived vocab must NOT be hinted broadcast).
- One corpus scan: the per-(doc, bucket) count aggregate feeds BOTH the
  raw-distribution rollup and the per-document weight sum through the
  same exchange (ReusedExchange, the q15 single-scan pattern —
  asserted in tests/test_plan_quality.py).
- Gumbel noise is derived from md5 of the document id (no RNG state,
  no driver round-trip): reproducible across engines, partitionings,
  and retries, and expressible in the DuckDB oracle.
- Selection is orderBy+limit → TakeOrderedAndProject (distributed
  top-k), never a global sort.

Hashing is md5-based for engine portability (same convention as
operators/dedup.py minhash): bucket(w) = int(md5(w)[:4 hex]) mod
`buckets`; the oracle reproduces it digit-by-digit.

Reference surfaces this extends (query semantics, not implementation):
corpus filtering/scoring macros in the reference's quality family —
src/blq/services/query.py:299-302 (suppression denylists) and the
SURVEY §2.8 scalar-function family; DSIR itself is beyond the
reference's operator set (training-data-pipeline extension).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from blq_cli_spark.operators.text import tokens

#: Hex digits of md5 used for the bucket hash (4 → 65536 raw values).
_BUCKET_HEX = 4
#: Hex digits of md5 used for the Gumbel uniform (8 → 32-bit grid).
_GUMBEL_HEX = 8


def _md5_int(col: Column, hex_digits: int, salt: str = "") -> Column:
    """First `hex_digits` hex chars of md5(salt || col) as a long.

    Portable: the DuckDB oracle reproduces it with per-digit strpos
    arithmetic (md5_int_sql below)."""
    payload = F.concat(F.lit(salt), col.cast("string")) if salt else col.cast("string")
    return F.conv(F.substring(F.md5(payload), 1, hex_digits), 16, 10).cast("long")


def md5_int_sql(expr: str, hex_digits: int, salt: str = "") -> str:
    """DuckDB SQL for _md5_int (per-hex-digit positional arithmetic)."""
    payload = f"'{salt}' || CAST({expr} AS VARCHAR)" if salt else f"CAST({expr} AS VARCHAR)"
    terms = []
    for i in range(hex_digits):
        scale = 16 ** (hex_digits - 1 - i)
        digit = f"(strpos('0123456789abcdef', substr(md5({payload}), {i + 1}, 1)) - 1)"
        terms.append(f"{digit} * {scale}" if scale > 1 else digit)
    return "(" + " + ".join(terms) + ")"


def token_bucket(w: Column, buckets: int) -> Column:
    """Hashed-feature bucket of a token (the DSIR hashing trick)."""
    return _md5_int(w, _BUCKET_HEX) % buckets


def doc_bucket_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", buckets: int = 256
) -> DataFrame:
    """Per-(document, bucket) hashed-token counts: (id_col, bucket, cnt).

    One explode + one shuffle on (id, bucket). This is the shared
    subtree both the raw distribution and the per-doc weights consume."""
    t = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("w"))
    return (
        t.withColumn("bucket", token_bucket(F.col("w"), buckets))
        # vacuously true (md5 of a non-null token), but it makes this
        # subtree canonically IDENTICAL to the copy under the weights
        # join (which gets isnotnull pushed below the aggregate from the
        # join key) — without it AQE cannot stage-reuse the exchange and
        # the corpus is scanned twice at runtime.
        .filter(F.col("bucket").isNotNull())
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def bucket_log_ratio(
    raw_counts: DataFrame,
    target_counts: DataFrame,
    buckets: int,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-bucket importance log-ratio ln p_target[b] − ln q_raw[b].

    Inputs are (bucket, cnt) tables; Laplace smoothing `a` gives every
    bucket (seen or not) p[b] = (c_b + a) / (N + a·K). The FULL outer
    join keeps buckets seen on only one side; buckets seen on neither
    side get the default ratio — callers coalesce with
    `default_log_ratio` when scoring docs outside the fitted corpus.
    Output ≤ `buckets` rows: bounded by construction, broadcastable."""
    from pyspark.sql import Window

    a = float(smoothing)
    k = int(buckets)
    r = raw_counts.groupBy("bucket").agg(F.sum("cnt").alias("cr"))
    t = target_counts.groupBy("bucket").agg(F.sum("cnt").alias("ct"))
    # totals ride a window over the ALREADY-AGGREGATED ≤k-row join (the
    # q11/q15 single-scan pattern) — a separate .agg() subtree would
    # re-derive each distribution from its corpus scan. sum() skips the
    # nulls full_outer introduces, so each total covers its own side.
    everything = Window.partitionBy()
    return r.join(t, "bucket", "full_outer").select(
        "bucket",
        (
            F.log(
                (F.coalesce(F.col("ct"), F.lit(0)) + a)
                / (F.sum("ct").over(everything) + a * k)
            )
            - F.log(
                (F.coalesce(F.col("cr"), F.lit(0)) + a)
                / (F.sum("cr").over(everything) + a * k)
            )
        ).alias("log_ratio"),
    )


def dsir_logweights(
    corpus: DataFrame,
    target: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    smoothing: float = 1.0,
) -> DataFrame:
    """Per-document DSIR importance log-weight over `corpus`, with the
    raw distribution fitted on `corpus` itself and the target
    distribution on `target`: (id_col, n_tokens, log_weight).

    log_weight(doc) = Σ_b c_doc[b] · (ln p_target[b] − ln q_raw[b]) —
    the log importance ratio of the hashed bag-of-words model.

    Plan shape: corpus is scanned ONCE — the (doc, bucket) aggregate's
    exchange is consumed by both the raw rollup and the weight sum
    (ReusedExchange); the ≤`buckets`-row log-ratio table broadcasts;
    the target side is a separate (usually much smaller) scan."""
    db = doc_bucket_counts(corpus, text_col, id_col, buckets)
    raw = db.select("bucket", "cnt")
    tgt = doc_bucket_counts(target, text_col, id_col, buckets).select("bucket", "cnt")
    ratio = bucket_log_ratio(raw, tgt, buckets, smoothing)
    return (
        db.join(F.broadcast(ratio), "bucket")
        .groupBy(id_col)
        .agg(
            F.sum("cnt").alias("n_tokens"),
            F.round(F.sum(F.col("cnt") * F.col("log_ratio")), 6).alias("log_weight"),
        )
    )


def gumbel_key(id_col: Column, log_weight: Column, seed: int = 0) -> Column:
    """Gumbel-top-k resampling key: log_weight + Gumbel(0,1) noise.

    Taking the top-n by this key draws n documents WITHOUT replacement
    with probability ∝ exp(log_weight) — the resampling step of DSIR
    (Gumbel-max trick). The uniform comes from md5 of the id on a
    2^32 grid (offset by 0.5 so u ∈ (0,1) strictly): deterministic,
    partition-independent, reproducible across engines."""
    u = (_md5_int(id_col, _GUMBEL_HEX, salt=f"g{seed}|") + F.lit(0.5)) / F.lit(
        float(16**_GUMBEL_HEX)
    )
    return log_weight - F.log(-F.log(u))


def dsir_select(
    corpus: DataFrame,
    target: DataFrame,
    n: int,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 256,
    smoothing: float = 1.0,
    seed: int = 0,
) -> DataFrame:
    """Select `n` documents from `corpus` by DSIR Gumbel-top-k
    resampling toward `target`: (id_col, n_tokens, log_weight, key).

    orderBy+limit compiles to TakeOrderedAndProject — per-partition
    local top-n then a single merge, never a global sort."""
    w = dsir_logweights(corpus, target, text_col, id_col, buckets, smoothing)
    key = F.round(gumbel_key(F.col(id_col), F.col("log_weight"), seed), 6)
    return (
        w.withColumn("key", key)
        .orderBy(F.desc("key"), id_col)
        .limit(int(n))
    )
