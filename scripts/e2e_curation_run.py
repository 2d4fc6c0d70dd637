#!/usr/bin/env python
"""End-to-end curation -> training-handoff run (the flagship composed
workload): declarative pipeline (gopher -> exact dedup -> MinHash-LSH
fuzzy dedup -> CCNet perplexity keep -> 50% web mix) over the sf
documents table, then sequence packing, the ordered-shard shuffle
write + manifest, and BPE vocabulary induction + encode over the
survivors — i.e. raw crawl in, loader-ready tokenized shards out.

Run from the repo root: python scripts/e2e_curation_run.py
Uses $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1); writes only to
a temp dir; prints per-phase wall and survivor counts."""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, ".")


def main() -> None:
    from blq_cli_spark.operators import corpus as corpus_ops
    from blq_cli_spark.session import get_spark
    from blq_cli_spark.sources.tables import table

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="blq-e2e-curation")
    spark.range(1).count()  # JVM warm
    docs = table(spark, sf_dir, "documents")
    n_raw = docs.count()

    stages = [
        # ingest prep (markup strip + NFC normalize — near-identity on
        # the synthetic text, but the cost is measured in the audit)
        {"op": "extract"},
        {"op": "normalize"},
        {"op": "gopher"},
        {"op": "exact-dedup"},
        {"op": "dedup", "method": "minhash"},
        {"op": "buckets", "min_bucket": 1},  # drop the CCNet tail
        # downweight the first ten sources to 50% (the sf tables use
        # src0..src19), keep the rest whole
        {"op": "mix", "rates": {f"src{i}": 0.5 for i in range(10)},
         "default_rate": 1.0},
    ]
    t0 = time.time()
    survivors, audit = corpus_ops.pipeline(docs, stages, audit=True)
    n_out = survivors.count()
    t_pipeline = time.time() - t0
    trail = " -> ".join(str(a["rows"]) for a in audit)
    print(f"pipeline: {n_raw} -> {trail}  ({t_pipeline:.1f}s, audit mode)")

    t0 = time.time()
    packed = corpus_ops.pack_sequences(survivors, capacity_tokens=2048)
    max_bin = packed.agg({"bin": "max"}).collect()[0][0]
    n_bins = 0 if max_bin is None else max_bin + 1
    t_pack = time.time() - t0
    print(f"pack: {n_out} docs -> {n_bins} bins of 2048 tokens ({t_pack:.1f}s)")

    with tempfile.TemporaryDirectory() as td:
        t0 = time.time()
        corpus_ops.write_training_shards(
            survivors, os.path.join(td, "shards"), shards=8, seed=7
        )
        n_written = spark.read.parquet(os.path.join(td, "shards")).count()
        t_shards = time.time() - t0
        man = corpus_ops.shard_manifest(spark, os.path.join(td, "shards"))
        n_shards = man.count()
    print(f"shards: {n_written} docs -> {n_shards} ordered files + manifest "
          f"({t_shards:.1f}s)")

    from blq_cli_spark.operators import tokenizer as tok_ops

    t0 = time.time()
    merges = tok_ops.train_tokenizer(survivors, n_merges=500, top_k_words=20_000)
    t_train = time.time() - t0
    t0 = time.time()
    enc = tok_ops.bpe_encode(survivors, merges).agg(
        {"n_bpe_tokens": "sum"}
    ).collect()[0][0]
    t_enc = time.time() - t0
    print(f"tokenizer: {len(merges)} merges learned ({t_train:.1f}s), "
          f"{enc} BPE tokens encoded ({t_enc:.1f}s)")
    print(f"total: {t_pipeline + t_pack + t_shards + t_train + t_enc:.1f}s")


if __name__ == "__main__":
    main()
