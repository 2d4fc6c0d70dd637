"""Streaming deduplication: the ingest-time dedup shapes a training-data
pipeline needs when documents arrive as a stream rather than a batch.

Three escalating shapes, all Structured Streaming built-ins (no custom
state code until the last):

1. `stream_exact_dedup` — `dropDuplicates` on the content fingerprint
   with an event-time watermark: Spark keeps one state row per distinct
   fingerprint inside the watermark horizon and drops late duplicates.
   State is bounded by (distinct docs within watermark), the canonical
   streaming-dedup contract.

2. `stream_dedup_within_watermark` — `dropDuplicatesWithinWatermark`
   (Spark 3.5+): same output keys, but state rows expire as soon as the
   watermark passes their FIRST sighting — the right choice when
   duplicates cluster in time (retries, crawler re-fetches), because
   state no longer grows with total distinct keys.

3. `stream_first_seen` — flatMapGroupsWithState-style first-seen marking
   via `applyInPandasWithState`: emits every document tagged is_first,
   instead of silently dropping duplicates — pipelines that must COUNT
   duplicates (dedup-rate telemetry) need the tagged stream, not the
   filtered one.

At 100 TB/day the fingerprint is computed in the stream (same
`text.fingerprint` column expression as batch), state is hash-partitioned
across executors by fingerprint, and the watermark bounds memory — no
global shuffle-and-sort ever materializes.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from blq_cli_spark.operators.text import fingerprint


def with_fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the batch-identical content fingerprint column."""
    return docs.withColumn("fp", fingerprint(F.col(text_col)))


def stream_exact_dedup(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Keep the first arrival of each distinct content fingerprint;
    duplicates inside the watermark horizon are dropped by built-in
    keyed state."""
    return (
        with_fingerprint(docs, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicates(["fp"])
    )


def stream_dedup_within_watermark(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """dropDuplicatesWithinWatermark: state expires with the watermark —
    bounded even when total distinct keys grow without bound."""
    return (
        with_fingerprint(docs, text_col)
        .withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["fp"])
    )


def _duration_ms(spec: str) -> int:
    """Parse a Spark-style interval string ('10 minutes', '30 seconds',
    '2 hours', '1 day') to milliseconds."""
    qty, unit = spec.split()
    per = {
        "millisecond": 1,
        "second": 1000,
        "minute": 60_000,
        "hour": 3_600_000,
        "day": 86_400_000,
    }[unit.rstrip("s")]
    return int(float(qty) * per)


def stream_first_seen(
    docs: DataFrame,
    ts_col: str = "ts",
    text_col: str = "text",
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tag every document with is_first instead of dropping duplicates:
    (doc_id, fp, is_first). One state row per fingerprint (a single
    boolean), partitioned by fingerprint. State is BOUNDED: each group
    arms an EventTimeTimeout one watermark-horizon past the current
    watermark, refreshed on every sighting, so a fingerprint's state row
    is dropped once no duplicate has arrived within the horizon — a
    duplicate arriving later than that is re-tagged is_first (same
    contract as dropDuplicatesWithinWatermark)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    tagged_schema = "doc_id string, fp string, is_first boolean"
    state_schema = "seen boolean"
    ttl_ms = _duration_ms(watermark)

    def mark(key, pdfs, state: GroupState):
        if state.hasTimedOut:
            state.remove()
            return
        seen = state.get[0] if state.exists else False
        for pdf in pdfs:
            flags = []
            for _ in range(len(pdf)):
                flags.append(not seen)
                seen = True
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype(str),
                    "fp": key[0],
                    "is_first": flags,
                }
            )
        state.update((seen,))
        state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + ttl_ms)

    return (
        with_fingerprint(docs, text_col)
        .withWatermark(ts_col, watermark)
        .groupBy("fp")
        .applyInPandasWithState(
            mark,
            outputStructType=tagged_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_neardup_ingest(
    docs_stream: DataFrame,
    signatures_path: str,
    flagged_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
):
    """Continuous-ingest FUZZY dedup (shape 4): each micro-batch is
    LSH-matched against the PERSISTED corpus signatures, flagged pairs
    are appended to `flagged_path`, and the batch's own banded
    signatures are appended to `signatures_path` — so the next batch
    (and the next job restart) dedups against everything ever seen,
    while hashing only its own documents.

    foreachBatch is the right harness here: the old-side state lives in
    a parquet table, not stream state — it outlives the query, is
    shared with the batch path (dedup.banded_signatures produces the
    identical layout), and its size never touches executor memory
    (bucket-join only).

    Delivery contract: foreachBatch is AT-LEAST-ONCE — after a crash the
    last micro-batch replays with the SAME batch_id. The sink makes the
    replay a no-op by stamping batch_id on BOTH outputs and skipping any
    write whose batch_id is already present: a replayed batch recomputes
    the identical pairs (the stored-signature side only advances once
    this batch's own signatures commit, which happens last), so
    re-checking per output also heals a crash that landed between the
    two appends. Net effect: effectively-once rows in both tables, and
    batch_id survives downstream as an audit/filter column."""
    sink = neardup_sink(
        signatures_path, flagged_path, text_col, id_col, n, num_hashes, bands
    )
    return (
        docs_stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
        .start()
    )


def neardup_sink(
    signatures_path: str,
    flagged_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
):
    """The foreachBatch sink behind stream_neardup_ingest, exposed so the
    idempotency contract is directly testable: calling the sink twice
    with the same batch_id must be a no-op the second time."""
    from blq_cli_spark.operators import dedup as dedup_ops

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

        if _already(signatures_path):
            return  # signatures commit last: batch fully applied
        try:
            stored = spark.read.parquet(signatures_path).drop("batch_id")
        except Exception:
            stored = None
        if not _already(flagged_path):
            if stored is not None:
                pairs = dedup_ops.lsh_candidates_against(
                    batch_df, stored, text_col, id_col, n, num_hashes, bands
                )
            else:
                pairs = dedup_ops.minhash_lsh_candidates(
                    batch_df, text_col, id_col, n, num_hashes, bands
                )
            pairs.withColumn("batch_id", F.lit(batch_id)).write.mode(
                "append"
            ).parquet(flagged_path)
        dedup_ops.banded_signatures(
            batch_df, text_col, id_col, n, num_hashes, bands
        ).withColumn("batch_id", F.lit(batch_id)).write.mode("append").parquet(
            signatures_path
        )

    return _sink
