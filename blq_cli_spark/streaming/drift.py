"""Streaming data-drift monitoring for a continuous-ingest corpus.

The ingest-time twin of quality.source_kl: score each (event-time
window, source) batch of documents against a FIXED baseline token
distribution, so a crawler that starts emitting boilerplate, a new spam
source, or a language shift shows up as a KL spike within one window of
landing — instead of at the next full-corpus audit.

Design for unbounded streams:

- The baseline is a BOUNDED top-K vocabulary with a tail mass
  (build_baseline): unlike the batch source_kl — where the corpus-
  derived distribution must join plain — a drift monitor's reference
  distribution is a deliberately small model (top-K covers the head;
  everything else aggregates into one OOV bucket), so the stream-static
  join is broadcast-sized BY CONSTRUCTION, state per window is K+1
  floats, and the smoothed KL is exactly computable with no
  per-token-state growth.
- Token counts aggregate per (window, source, token) under a watermark
  -> bounded state, late data folded until the watermark passes.
- KL(window-source || baseline) = sum p * ln(p/q) over the K+1 buckets
  with add-one smoothing on the window side (a window missing a
  baseline token contributes through the smoothed floor, and OOV mass
  is a first-class bucket, so the sum is always finite).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from blq_cli_spark.operators.text import tokens


def build_baseline(
    corpus: DataFrame,
    text_col: str = "text",
    top_k: int = 1000,
) -> DataFrame:
    """Bounded reference distribution from a trusted corpus snapshot:
    the top_k head tokens with probability mass, plus one '<OOV>' row
    carrying ALL remaining mass. Output is (w, q) with sum(q) == 1 —
    broadcast-sized regardless of corpus size."""
    counts = (
        corpus.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    total = counts.agg(F.sum("c").alias("n"))
    head = (
        counts.orderBy(F.desc("c"), "w")
        .limit(top_k)
        .join(F.broadcast(total))
        .select("w", (F.col("c") / F.col("n")).alias("q"))
    )
    head_mass = head.agg(F.sum("q").alias("hm"), F.count(F.lit(1)).alias("k"))
    # floor the tail mass: when top_k covers the whole vocabulary the
    # OOV bucket would carry q=0 and any unseen stream token would blow
    # the KL to infinity — a drift monitor must stay finite instead
    oov = head_mass.select(
        F.lit("<OOV>").alias("w"),
        F.greatest(1.0 - F.col("hm"), F.lit(1e-9)).alias("q"),
    )
    return head.unionByName(oov)


def windowed_source_kl(
    stream: DataFrame,
    baseline: DataFrame,
    window: str = "1 minute",
    watermark: str = "2 minutes",
    ts_col: str = "ts",
    text_col: str = "text",
    source_col: str = "source",
    smooth: float = 1.0,
) -> DataFrame:
    """Per-(event-time window, source) KL divergence against `baseline`
    (build_baseline output; collected to a literal map — K+1 entries).

    Plan: watermark -> explode tokens -> map unknown tokens to <OOV> ->
    windowed grouped counts (bounded state: sources x (K+1) tokens per
    open window) -> per-window normalization + smoothed KL in one more
    aggregation. Emits (window_start, window_end, source, n_tokens,
    kl). Append-mode compatible: results finalize when the watermark
    passes the window end."""
    import math

    base_rows = baseline.collect()  # K+1 rows — bounded by construction
    vocab = F.array(*[F.lit(r["w"]) for r in base_rows if r["w"] != "<OOV>"])
    q_map = F.create_map(
        *[x for r in base_rows for x in (F.lit(r["w"]), F.lit(float(r["q"])))]
    )
    k1 = float(len(base_rows))
    # sum of ln(q) over the whole fixed support — a Python constant, used
    # to add the smoothed contribution of buckets ABSENT from a window
    # (without it the sum runs over observed buckets only and the KL is
    # biased low / can go negative)
    sum_logq_all = float(sum(math.log(float(r["q"])) for r in base_rows))

    toks = (
        stream.withWatermark(ts_col, watermark)
        .select(
            ts_col,
            F.col(source_col).alias("source"),
            F.explode(tokens(F.col(text_col))).alias("w0"),
        )
        .withColumn(
            "w",
            F.when(F.array_contains(vocab, F.col("w0")), F.col("w0")).otherwise(
                F.lit("<OOV>")
            ),
        )
    )
    counts = (
        toks.groupBy(F.window(ts_col, window).alias("win"), "source", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .withColumn("q", F.element_at(q_map, F.col("w")))
    )
    agg = counts.groupBy("win", "source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("_nb"),
        F.sum(F.log("q")).alias("_slogq_obs"),
        F.collect_list(F.struct("c", "q")).alias("_cq"),  # <= K+1 entries
    )
    denom = F.col("n_tokens") + F.lit(smooth) * F.lit(k1)
    p0 = F.lit(smooth) / denom

    def p_of(c):
        return (c + F.lit(smooth)) / denom

    observed = F.aggregate(
        F.col("_cq"),
        F.lit(0.0),
        lambda acc, s: acc + p_of(s["c"]) * F.log(p_of(s["c"]) / s["q"]),
    )
    missing = p0 * (
        (F.lit(k1) - F.col("_nb")) * F.log(p0)
        - (F.lit(sum_logq_all) - F.col("_slogq_obs"))
    )
    return agg.select(
        F.col("win.start").alias("window_start"),
        F.col("win.end").alias("window_end"),
        "source",
        "n_tokens",
        F.round(observed + missing, 6).alias("kl"),
    )
