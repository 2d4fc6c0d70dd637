"""Continuous curation ingest: a document stream flows through the
STATELESS corpus-pipeline stages (extract / normalize / gopher /
classify / clean-spans / in-batch exact-dedup / mix) and lands in a
curated parquet table, with per-batch audit rows — the streaming twin
of `corpus pipeline`, the way a crawl feed becomes training data
without nightly batch jobs.

Delivery contract (the stream_neardup_ingest discipline,
streaming/dedup.py): foreachBatch is AT-LEAST-ONCE — a crash replays
the last micro-batch with the SAME batch_id. Both outputs carry
batch_id and the sink skips any write whose batch_id is already
present; the audit row commits LAST, so `_already(stats)` proves the
whole batch landed and a replay that crashed between the two appends
re-checks each output individually. Net effect: effectively-once rows.

Why stateless stages only: a stage that folds persistent state
(exact-dedup --history, dedup --signatures) is NOT replay-safe inside
an at-least-once sink that already advanced the state — the replayed
batch would dedup against itself and drop everything. Cross-batch
dedup belongs to stream_neardup_ingest (whose sink orders its state
commit last precisely to stay replay-safe) or a periodic batch job
over the curated table. The sink validates the stage list up front.

Scale shape: nothing here adds state to the stream — each micro-batch
runs the same scale-shaped operators the batch pipeline runs, and the
outputs are plain parquet appends (distributed writes). The per-batch
audit count is two scalar aggregates, not a collect of rows.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

# replay-safe (no persistent state folded) pipeline ops
STATELESS_OPS = {
    "extract", "normalize", "gopher", "gopher-lines", "classify",
    "clean-spans", "c4-lines", "exact-dedup", "mix", "buckets",
}


def curation_sink(
    output_path: str,
    stats_path: str,
    stages: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """The foreachBatch sink behind stream_curation_ingest, exposed so
    the idempotency contract is directly testable: calling the sink
    twice with the same batch_id must be a no-op the second time."""
    from blq_cli_spark.operators import corpus as corpus_ops

    for i, spec in enumerate(stages):
        op = spec.get("op")
        if op not in STATELESS_OPS:
            raise ValueError(
                f"stage {i}: op {op!r} is not replay-safe in a streaming "
                f"sink (allowed: {sorted(STATELESS_OPS)}); run stateful "
                "dedup via stream_neardup_ingest or a batch job"
            )
        if op == "dedup" or "signatures" in spec or "history" in spec:
            raise ValueError(f"stage {i}: persistent-state knobs are "
                             "not allowed in the streaming sink")

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        if not batch_df.take(1):
            return
        spark = batch_df.sparkSession

        def _already(path: str) -> bool:
            try:
                prior = spark.read.parquet(path)
            except Exception:
                return False
            if "batch_id" not in prior.columns:
                return False
            return bool(prior.filter(F.col("batch_id") == batch_id).take(1))

        if _already(stats_path):
            return  # stats commit last: batch fully applied
        n_in = batch_df.count()
        kept = corpus_ops.pipeline(
            batch_df, stages, text_col=text_col, id_col=id_col
        )
        if not _already(output_path):
            # persist, not localCheckpoint: the blocks are reused by the
            # count + the write (one pipeline execution, not two), then
            # released BEFORE the batch commits — a localCheckpoint here
            # leaked its blocks once per micro-batch for the life of the
            # query (no release tied to Python scope), which on a
            # days-long ingest is unbounded executor-memory growth.
            # persist also keeps the lineage, so an executor loss during
            # the write recomputes from the replayable source instead of
            # failing on missing checkpoint blocks.
            kept = kept.persist()
            try:
                n_kept = kept.count()
                kept.withColumn("batch_id", F.lit(batch_id)).write.mode(
                    "append"
                ).parquet(output_path)
            finally:
                kept.unpersist()
        else:
            # output committed before the crash; recount it for the stats
            n_kept = (
                spark.read.parquet(output_path)
                .filter(F.col("batch_id") == batch_id)
                .count()
            )
        spark.createDataFrame(
            [(int(batch_id), n_in, n_kept)],
            "batch_id long, n_in long, n_kept long",
        ).write.mode("append").parquet(stats_path)

    return _sink


def stream_curation_ingest(
    docs_stream: DataFrame,
    output_path: str,
    stats_path: str,
    checkpoint: str,
    stages: list[dict] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """Start the continuous curation query: every micro-batch runs the
    stage list and appends survivors (+ batch_id) to `output_path` and
    one (batch_id, n_in, n_kept) audit row to `stats_path`. Defaults to
    the raw-crawl prep stages: extract -> normalize -> gopher."""
    sink = curation_sink(
        output_path, stats_path,
        stages if stages is not None
        else [{"op": "extract"}, {"op": "normalize"}, {"op": "gopher"}],
        text_col, id_col,
    )
    return (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )
