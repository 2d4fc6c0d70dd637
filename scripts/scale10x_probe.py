#!/usr/bin/env python
"""10x scale probe for the round-4 operator families (VERDICT r4 ask #6).

The driver's largest scale factor (sf0.1) is small enough that Spark's
per-stage floor dominates, so sf0.01->sf0.1 ratios under-report the true
data exponent. This probe generates SYNTHETIC corpora from one
distribution at 1x (matching sf0.1's 5k docs / 2k embeddings) and 10x
(50k docs / 20k embeddings), times each family at both sizes, and
reports the measured scaling exponent  log10(t_10x / t_1x)  — 1.0 is
perfectly linear, <1 is overhead-bound, >1.3 flags a super-linear term.

Run from the repo root:  python scripts/scale10x_probe.py
Writes nothing outside a temp dir; prints one table.
"""

from __future__ import annotations

import math
import os
import random
import sys
import tempfile
import time

sys.path.insert(0, ".")

DOCS_1X, EMB_1X, DIM = 5_000, 2_000, 64
VOCAB = [f"w{i:04d}" for i in range(2_000)]
SOURCES = ["web", "books", "code", "wiki"]
LANGS = ["en", "de", "fr"]


def make_docs(spark, n: int, path: str) -> None:
    rng = random.Random(42)
    rows = []
    for i in range(n):
        nw = rng.randint(8, 80)
        words = [VOCAB[int(rng.paretovariate(1.1)) % len(VOCAB)] for _ in range(nw)]
        if i % 37 == 0:  # planted near-dup mass for the dedup-ish ops
            words = VOCAB[:20] + words[:5]
        text = " ".join(words)
        rows.append((i, text, LANGS[i % 3], SOURCES[i % 4], len(text)))
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(32).write.mode("overwrite").parquet(path)


def make_media(spark, n: int, path: str) -> None:
    """n//2 PNGs + n//2 WAVs with planted near-dup groups (20 each) —
    the perceptual-hash probe corpus."""
    import hashlib
    import struct as _s

    import numpy as np

    from blq_cli_spark.multimodal import binary as mmb

    rows = []
    half = n // 2
    for i in range(half):
        g = i % 20
        px = bytearray(
            b"".join(hashlib.md5(b"ig-%d-%d" % (g, k)).digest() for k in range(16))
        )
        px[(i * 13) % 256] ^= 0x40
        rows.append((f"img{i:07d}", bytearray(mmb.png_encode(16, 16, bytes(px)))))
    rate = 2000
    for i in range(half):
        g = i % 20
        rng = np.random.default_rng(g)
        k = 2 + g % 7
        x = np.convolve(rng.normal(0, 1, rate), np.ones(k) / k, "same")
        env = 1 + 0.8 * np.sin(2 * np.pi * np.arange(rate) / rate * (3 + 2 * g))
        sig = x * env * 9000 + np.random.default_rng(10_000 + i).normal(0, 300, rate)
        pcm = np.clip(sig, -32768, 32767).astype("<i2").tobytes()
        hdr = (
            b"RIFF" + _s.pack("<I", 36 + len(pcm)) + b"WAVE"
            + b"fmt " + _s.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
            + b"data" + _s.pack("<I", len(pcm))
        )
        rows.append((f"aud{i:07d}", bytearray(hdr + pcm)))
    spark.createDataFrame(rows, "id string, content binary").repartition(
        32
    ).write.mode("overwrite").parquet(path)


def make_emb(spark, n: int, path: str) -> None:
    rng = random.Random(7)
    rows = [
        (i, [rng.gauss(0, 1) for _ in range(DIM)], i % 10) for i in range(n)
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).repartition(32).write.mode("overwrite").parquet(path)


def main() -> None:
    from pyspark.sql import functions as F

    from blq_cli_spark.operators import corpus as corpus_ops
    from blq_cli_spark.operators import quality, similarity
    from blq_cli_spark.operators import text as text_ops
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="scale10x-probe")
    tmp = tempfile.mkdtemp(prefix="scale10x_")
    sizes = {"1x": (DOCS_1X, EMB_1X), "10x": (DOCS_1X * 10, EMB_1X * 10)}
    for tag, (nd, ne) in sizes.items():
        make_docs(spark, nd, f"{tmp}/docs_{tag}")
        make_emb(spark, ne, f"{tmp}/emb_{tag}")
        make_media(spark, nd, f"{tmp}/media_{tag}")
    bench = spark.read.parquet(f"{tmp}/docs_1x").limit(100)
    queries = spark.read.parquet(f"{tmp}/emb_1x").limit(20)
    from blq_cli_spark.operators import clustering

    # train once on 1x: the probed op is the per-row assignment pass
    km_centroids = clustering.kmeans_fit(
        spark.read.parquet(f"{tmp}/emb_1x"), k=8, iters=3
    )
    # fixed weights: scoring is the scale path, training is bounded-state
    clf_weights = [0.01 * ((i % 7) - 3) for i in range(64)] + [0.0]
    # train merges once on 1x: encode is the per-row scale path, the
    # merge loop is bounded-dictionary driver work
    from blq_cli_spark.operators import tokenizer as tok_ops

    bpe_merges = tok_ops.train_tokenizer(
        spark.read.parquet(f"{tmp}/docs_1x"), n_merges=200, top_k_words=5_000
    )
    # fit once on 1x: projection is the per-row scale path, the fit is
    # one bounded-partials pass (probed separately as pca_fit)
    pca_model = similarity.pca_fit(
        spark.read.parquet(f"{tmp}/emb_1x"), n_components=16
    )
    # build the persisted IVF index per size once (timed as _build);
    # search then probes the stored, cell-pruned form
    from blq_cli_spark.operators import ann_index as ann_ops

    for tag in ("1x", "10x"):
        ann_ops.ivf_build_index(
            spark.read.parquet(f"{tmp}/emb_{tag}"), f"{tmp}/ivfidx_{tag}",
            k_cells=16, iters=3,
        )

    # train the language-ID model once on 1x: scoring is the scale path
    from blq_cli_spark.operators import classifier as clf_ops

    lid_model = clf_ops.langid_train(
        spark.read.parquet(f"{tmp}/docs_1x")
    ).localCheckpoint(eager=True)

    def probes(tag: str):
        import pyspark.sql.functions as FF

        from blq_cli_spark.multimodal import binary as mmb
        from blq_cli_spark.sources import logparse as lp_mod

        docs = spark.read.parquet(f"{tmp}/docs_{tag}")
        emb = spark.read.parquet(f"{tmp}/emb_{tag}")
        media = spark.read.parquet(f"{tmp}/media_{tag}")
        # synthetic gcc logs derived from docs (distributed, no driver work)
        logs = docs.select(
            FF.col("doc_id").cast("string").alias("source_id"),
            FF.concat_ws(
                "\n",
                FF.expr(
                    "transform(sequence(1, 40), i -> concat("
                    "'src/m_', cast(doc_id % 97 as string), '.c:', cast(i as string),"
                    "':1: error: op ', cast(i % 9 as string), ' failed at 0xbeef'))"
                ),
            ).alias("content"),
        )
        # realistic diagnostic density (round 7, VERDICT r6 ask #4): 1 in
        # 50 lines is a diagnostic, the rest are ordinary build output —
        # the distribution the contains-prefilter targets (the 100%-dense
        # variant above stays for honesty: it measures the regex floor)
        logs_realistic = docs.select(
            FF.col("doc_id").cast("string").alias("source_id"),
            FF.concat_ws(
                "\n",
                FF.expr(
                    "transform(sequence(1, 40), i -> IF(i % 50 = 3,"
                    " concat('src/m_', cast(doc_id % 97 as string), '.c:',"
                    " cast(i as string), ':1: error: op ', cast(i % 9 as string),"
                    " ' failed at 0xbeef'),"
                    " concat('  CC   obj/m_', cast(doc_id % 97 as string), '_',"
                    " cast(i as string), '.o  [', cast(i as string), '/40]')))"
                ),
            ).alias("content"),
        )
        qd = similarity.quantize_embeddings(emb)
        return {
            "quality_repetition": lambda: quality.repetition_profile(docs),
            "quality_pii": lambda: quality.pii_profile(docs),
            "quality_decontaminate": lambda: quality.decontaminate(docs, bench),
            "quality_unigram_logprob": lambda: quality.unigram_logprob(docs),
            "quality_source_kl": lambda: quality.source_kl(docs),
            "mix_sources": lambda: corpus_ops.mix_sources(
                docs, {"web": 0.25, "books": 1.0, "code": 0.5}
            ),
            "winnow_fingerprints": lambda: text_ops.winnow_fingerprints(docs),
            "quantize_embeddings": lambda: similarity.quantize_embeddings(emb),
            "quantized_topk": lambda: similarity.cosine_topk_quantized(
                qd, queries, k=5
            ),
            "simhash_candidates": lambda: __import__(
                "blq_cli_spark.operators.dedup", fromlist=["x"]
            ).simhash_candidates(docs),
            "boilerplate_removal": lambda: quality.remove_repeated_spans(docs),
            "semantic_dedup_bucketed": lambda: similarity.semantic_dedup(
                emb, threshold=0.9, method="bucketed"
            ),
            # round 7 (VERDICT r6 ask #1a): the kmeans blocking probed
            # with k scaling as n/1000 — cells stay ~1000 vectors, so
            # the per-cell quadratic kernel is bounded and the family
            # must probe ~linear (the docstring's scale contract)
            "semantic_dedup_kmeans": lambda: similarity.semantic_dedup(
                emb, threshold=0.9, method="kmeans",
                k=max(2, (EMB_1X * (10 if tag == "10x" else 1)) // 1000),
            ),
            "kmeans_assign": lambda: clustering.kmeans_assign(emb, km_centroids),
            "duplicate_passages": lambda: __import__(
                "blq_cli_spark.operators.dedup", fromlist=["x"]
            ).duplicate_passages(docs),
            "classifier_score": lambda: __import__(
                "blq_cli_spark.operators.classifier", fromlist=["x"]
            ).classifier_score(docs, clf_weights),
            "gopher_rules": lambda: quality.gopher_rules(docs),
            "sequence_packing": lambda: corpus_ops.pack_sequences(docs),
            "semantic_decontaminate": lambda: similarity.semantic_decontaminate(
                emb, queries, threshold=0.9
            ),
            "chunk_documents": lambda: text_ops.chunk_documents(
                docs, size=32, overlap=8
            ),
            "dsir_logweights": lambda: __import__(
                "blq_cli_spark.operators.selection", fromlist=["x"]
            ).dsir_logweights(docs, docs.filter(F.col("source") == "wiki")),
            "training_shuffle": lambda: corpus_ops.training_shuffle(docs),
            "tokenizer_fertility": lambda: text_ops.tokenizer_fertility(docs),
            "perplexity_buckets": lambda: quality.perplexity_buckets(docs),
            "stratified_sample": lambda: corpus_ops.stratified_sample(docs, 500),
            "upsample_sources": lambda: corpus_ops.upsample_sources(
                docs, {"wiki": 2.5, "books": 1.5}, default_rate=0.5
            ),
            "token_budget_sample": lambda: corpus_ops.token_budget_sample(
                docs, 20_000
            ),
            "leakage_safe_split": lambda: corpus_ops.leakage_safe_split(docs),
            "packing_report": lambda: corpus_ops.packing_report(docs),
            "bpe_encode": lambda: tok_ops.bpe_encode(docs, bpe_merges),
            "strip_html": lambda: docs.select(
                "doc_id", text_ops.strip_html(F.col("text")).alias("t")
            ),
            "normalize_text": lambda: text_ops.normalize_text(
                docs, inplace=True
            ),
            "pca_fit": lambda: similarity.pca_project(
                emb, similarity.pca_fit(emb, n_components=16)
            ).limit(1),
            "pca_project": lambda: similarity.pca_project(emb, pca_model),
            "ivf_index_search": lambda: ann_ops.ivf_search_index(
                spark, f"{tmp}/ivfidx_{tag}", queries, k=5, nprobe=2
            ),
            "dedup_paragraphs": lambda: quality.dedup_paragraphs(docs),
            "c4_line_rules": lambda: quality.c4_line_rules(docs),
            "pmi_pairs": lambda: text_ops.pmi_pairs(docs, top_k=100,
                                                    min_count=3),
            "zipf_fit": lambda: text_ops.zipf_fit(docs, top_k=1000),
            "l2_normalize": lambda: similarity.l2_normalize(emb),
            # round-6 families
            "langid_score": lambda: clf_ops.langid_score(docs, lid_model),
            "image_dedup_pairs": lambda: mmb.image_dedup_pairs(media),
            "audio_dedup_pairs": lambda: mmb.audio_dedup_pairs(media),
            "parse_fast_gcc": lambda: lp_mod.parse_df(logs, fmt="gcc"),
            "parse_fast_gcc_realistic": lambda: lp_mod.parse_df(
                logs_realistic, fmt="gcc"
            ),
        }

    # SCALE10X_ONLY=fam1,fam2 probes a subset (iterating on one family
    # without paying for the whole table)
    import os as _os

    only = {f for f in _os.environ.get("SCALE10X_ONLY", "").split(",") if f}

    def _select(d):
        return {k: v for k, v in d.items() if not only or k in only}

    # warm codegen/python workers on 1x (not timed)
    for fn in _select(probes("1x")).values():
        fn().count()

    names = list(_select(probes("1x")))
    times: dict[str, dict[str, float]] = {n: {} for n in names}
    for tag in sizes:
        p = _select(probes(tag))
        for name in names:
            best = min(_time_once(p[name]) for _ in range(2))
            times[name][tag] = best
    print(f"{'family':26s} {'1x':>9s} {'10x':>9s} {'exponent':>9s}")
    for name in names:
        t1, t10 = times[name]["1x"], times[name]["10x"]
        exp = math.log10(max(t10, 1e-9) / max(t1, 1e-9))
        print(f"{name:26s} {t1:8.3f}s {t10:8.3f}s {exp:9.2f}")
    if not only or "recall" in only:
        recall_section(spark)
    spark.stop()


def recall_section(spark) -> bool:
    """Recall-at-scale for the approximate SemDeDup paths (round 8,
    VERDICT r7 ask #6): the 0.75 recall floor in tests/test_similarity.py
    runs at smoke scale only — this measures bucketed (DEFAULT
    self-sizing grid) and kmeans (default k) pair recall against the
    EXACT triangle-blocked oracle on the ORGANIC driver embeddings
    (testdata sf0.1, 2,000 x 64) at 1x, and at 10x on ten
    jitter-perturbed copies (sigma = 5% of the per-dimension std, so
    the organic cluster geometry — what blocking quality depends on —
    is preserved while the corpus actually grows). Threshold 0.4, the
    x_embedding_neardup gate's organic operating point."""
    import numpy as np
    import pandas as pd

    from blq_cli_spark.operators import similarity

    FLOOR, THRESHOLD = 0.75, 0.4
    base = pd.read_parquet("/root/testdata/sf0.1/embeddings.parquet")[
        ["vec_id", "embedding"]
    ]
    mat = np.stack(base["embedding"].to_numpy()).astype(np.float64)
    rng = np.random.default_rng(8)
    sigma = 0.05 * mat.std(axis=0)
    copies = []
    for c in range(10):
        jittered = mat if c == 0 else mat + rng.normal(0, 1, mat.shape) * sigma
        copies.append(
            pd.DataFrame(
                {
                    "vec_id": base["vec_id"].to_numpy() + c * 1_000_000,
                    "embedding": list(jittered),
                }
            )
        )
    corpora = {
        "1x": spark.createDataFrame(copies[0], "vec_id long, embedding array<double>"),
        "10x": spark.createDataFrame(
            pd.concat(copies), "vec_id long, embedding array<double>"
        ).repartition(32),
    }
    print()
    print(
        f"semdedup recall vs exact (organic driver embeddings, "
        f"threshold {THRESHOLD}, floor {FLOOR})"
    )
    print(f"{'scale':6s} {'n':>7s} {'exact_pairs':>12s} {'bucketed':>9s} {'kmeans':>8s}")
    ok = True
    for tag, emb in corpora.items():
        emb = emb.localCheckpoint(eager=True)
        n = emb.count()
        exact = similarity.neardup_pairs(emb, THRESHOLD).select(
            "id_a", "id_b"
        ).localCheckpoint(eager=True)
        n_exact = exact.count()
        recalls = {}
        for meth, fn in (
            ("bucketed", lambda: similarity.neardup_pairs_bucketed(emb, THRESHOLD)),
            ("kmeans", lambda: similarity.neardup_pairs_kmeans(emb, THRESHOLD)),
        ):
            hit = exact.join(fn().select("id_a", "id_b"), ["id_a", "id_b"], "left_semi").count()
            recalls[meth] = hit / max(n_exact, 1)
            ok = ok and recalls[meth] >= FLOOR
        print(
            f"{tag:6s} {n:7d} {n_exact:12d} "
            f"{recalls['bucketed']:8.3f}{'*' if recalls['bucketed'] < FLOOR else ' '} "
            f"{recalls['kmeans']:7.3f}{'*' if recalls['kmeans'] < FLOOR else ' '}"
        )
    print(f"recall floor {'PASS' if ok else 'FAIL (*)'}")
    return ok


def _time_once(fn) -> float:
    t0 = time.perf_counter()
    fn().count()
    return time.perf_counter() - t0


def tier100x() -> None:
    """100x probe tier (round 9, VERDICT r8 ask #4): at 10x the
    per-stage floors still mute the data term for the parse and
    semantic families (r8 exponents 0.09/-0.03 were floor artifacts).
    This tier rescales JUST those families across 10x -> 100x (500k
    docs / 200k embeddings, synthetic, distributed generation) where
    the data term dominates, reporting the per-decade exponent
    log10(t_100x / t_10x), and measures SemDeDup recall at the next
    scale decade with a SUBSET-RESTRICTED exact oracle: exact pairs on
    the 20k-row organic subset (the 10x recall corpus, embedded inside
    the 200k corpus), approximate pairs from the FULL 200k corpus
    filtered to subset endpoints — an unbiased estimate of pair recall
    that keeps the oracle tractable while the bucket/cell sizing runs
    at true 100x scale.

    Run: python scripts/scale10x_probe.py --tier100x"""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from blq_cli_spark.operators import similarity
    from blq_cli_spark.session import get_spark
    from blq_cli_spark.sources import logparse as lp_mod

    # 100x/1000x data through the test default of 32 shuffle
    # partitions means ~0.5 GB per partition sort at the 2M decade
    # (measured OOM on the 8g probe heap, round 10) — a real cluster
    # scales partition count with data, so the probe does too; the
    # exponents compare within one run, not across configs.
    spark = get_spark(
        app_name="scale100x-probe",
        shuffle_partitions=128,
        extra_conf={
            "spark.driver.memory": os.environ.get("SPARK_DRIVER_MEMORY", "16g")
        },
    )
    FLOOR, THRESHOLD = 0.75, 0.4

    def synth_logs(n_docs: int):
        # the probes() realistic gcc distribution: 1 diagnostic per 50
        # lines, the rest ordinary build output
        gcc = (
            "transform(sequence(1, 40), i -> IF(i % 50 = 3,"
            " concat('src/m_', cast(id % 97 as string), '.c:',"
            " cast(i as string), ':1: error: op ', cast(i % 9 as string),"
            " ' failed at 0xbeef'),"
            " concat('  CC   obj/m_', cast(id % 97 as string), '_',"
            " cast(i as string), '.o  [', cast(i as string), '/40]')))"
        )
        # an eslint-shaped family for the auto tier: file header + issues
        esl = (
            "concat(array(concat('app_u', cast(id as string), '.js')),"
            " transform(sequence(1, 39), i -> IF(i % 25 = 4,"
            " concat('  ', cast(i as string), ':7  error  unexpected token in h',"
            " cast(i % 9 as string), '  no-unused-vars'),"
            " concat('webpack compiled module ', cast(i as string)))))"
        )
        return spark.range(n_docs).select(
            F.col("id").cast("string").alias("source_id"),
            F.when(
                F.col("id") % 2 == 0, F.concat_ws("\n", F.expr(gcc))
            ).otherwise(F.concat_ws("\n", F.expr(esl))).alias("content"),
        ).repartition(32)

    def synth_emb(n_copies: int):
        base = pd.read_parquet("/root/testdata/sf0.1/embeddings.parquet")[
            ["vec_id", "embedding"]
        ]
        mat = np.stack(base["embedding"].to_numpy()).astype(np.float64)
        rng = np.random.default_rng(8)
        sigma = 0.05 * mat.std(axis=0)
        copies = []
        for c in range(n_copies):
            jittered = mat if c == 0 else mat + rng.normal(0, 1, mat.shape) * sigma
            copies.append(
                pd.DataFrame(
                    {
                        "vec_id": base["vec_id"].to_numpy() + c * 1_000_000,
                        "embedding": list(jittered),
                    }
                )
            )
        return spark.createDataFrame(
            pd.concat(copies), "vec_id long, embedding array<double>"
        ).repartition(32)

    sizes = {"10x": (50_000, 10), "100x": (500_000, 100)}
    data = {}
    for tag, (nd, nc) in sizes.items():
        logs = synth_logs(nd).localCheckpoint(eager=True)
        emb = synth_emb(nc).localCheckpoint(eager=True)
        data[tag] = (logs, emb)

    # The probe CORPORA above stay pinned; everything else persisted
    # during a measured call (the bucketed kernel's skinny assignment,
    # parse staging checkpoints) is released BETWEEN measurements so
    # the 100x decade isn't timed under the accumulated block/GC
    # pressure of every earlier call — accumulation inflates exactly
    # the later, larger measurements, i.e. the exponent itself.
    keep = {
        r.id()
        for r in spark.sparkContext._jsc.getPersistentRDDs().values()
    }

    def release_operator_blocks() -> None:
        # blocking=True: the drop completes BEFORE the next timer
        # starts — an async drop of multi-GB block sets overlaps (and
        # pollutes) the next measurement
        for r in list(
            spark.sparkContext._jsc.getPersistentRDDs().values()
        ):
            if r.id() not in keep:
                r.unpersist(True)

    def fams(tag: str):
        from blq_cli_spark.operators import dedup as dd

        logs, emb = data[tag]
        gcc_logs = logs.filter(F.col("source_id").cast("long") % 2 == 0)

        def minhash_counts():
            # the x_minhash_lsh_candidates gate shape (distinct pairs ->
            # sides explode -> per-doc count; the round-11 distinct fold
            # was measured and rejected — see the gate docstring)
            cands = dd.minhash_lsh_candidates(
                logs, text_col="content", id_col="source_id",
                n=3, num_hashes=8, bands=4,
            )
            sides = cands.select(
                F.explode(F.array("id_a", "id_b")).alias("d")
            )
            return sides.groupBy("d").agg(F.count(F.lit(1)).alias("n"))

        return {
            "parse_explicit_gcc": lambda: lp_mod.parse_df(gcc_logs, fmt="gcc"),
            "parse_auto": lambda: lp_mod.parse_df(logs, fmt="auto"),
            "semdedup_bucketed": lambda: similarity.neardup_pairs_bucketed(
                emb, THRESHOLD
            ),
            "semdedup_kmeans": lambda: similarity.neardup_pairs_kmeans(
                emb, THRESHOLD
            ),
            # round 11: the minhash gate shape gets a 100x exponent too
            # (VERDICT r10 asks #4/#7 — its sf0.1 wall-clock is noise-
            # bound, so the scale exponent is the honest readout)
            "minhash_lsh_counts": minhash_counts,
        }

    for fn in fams("10x").values():  # warm codegen/workers (not timed)
        fn().count()
        release_operator_blocks()
    names = list(fams("10x"))
    times: dict[str, dict[str, float]] = {n: {} for n in names}
    for tag in sizes:
        f = fams(tag)
        for name in names:
            best = None
            for _ in range(2):
                el = _time_once(f[name])
                release_operator_blocks()  # outside the timed window
                best = el if best is None else min(best, el)
            times[name][tag] = best
    print(f"{'family':22s} {'10x':>9s} {'100x':>10s} {'exponent':>9s}")
    for name in names:
        t10, t100 = times[name]["10x"], times[name]["100x"]
        exp = math.log10(max(t100, 1e-9) / max(t10, 1e-9))
        print(f"{name:22s} {t10:8.3f}s {t100:9.3f}s {exp:9.2f}")

    # Optional extra decade for the bucketed family ONLY (env
    # BLQ_PROBE_1000X=1): between 20k and 200k the self-sizing grid is
    # still in its floor-to-target transition (expected bucket grows
    # 1250 -> 6250 toward the ~10k design target, so work/row grows
    # ~5x and the measured 10x exponent reads ~1.2 even though
    # per-task work is bounded). From 200k -> 2M the bucket size
    # plateaus at the target (6250 -> ~7800), which is the self-similar
    # regime a 100 TB corpus lives in — the exponent there is the
    # honest asymptotic read. Corpus construction for THIS decade
    # scales the number of BASE vectors (2k -> 20k Gaussian bases, a
    # fixed 100 jittered copies each) so the TRUE pair count grows
    # linearly with n — scaling the copy count instead makes the
    # answer itself quadratic (C(copies,2) per base) and the probe
    # would measure output explosion, not the algorithm.
    if os.environ.get("BLQ_PROBE_1000X"):
        import numpy as _np
        import pandas as _pd

        def _bases_corpus(n_bases: int):
            rng = _np.random.default_rng(11)
            bases = rng.normal(0, 1, (n_bases, 64))
            sigma = 0.05 * bases.std(axis=0)
            frames = []
            for c in range(100):
                j = bases if c == 0 else bases + rng.normal(0, 1, bases.shape) * sigma
                frames.append(
                    _pd.DataFrame(
                        {
                            "vec_id": _np.arange(n_bases) + c * 10_000_000,
                            "embedding": list(j),
                        }
                    )
                )
            return spark.createDataFrame(
                _pd.concat(frames), "vec_id long, embedding array<double>"
            ).repartition(64)

        # threshold 0.8 here, NOT the tier's 0.4: random 64-dim
        # Gaussian cross-pairs at cos>=0.4 add a quadratic TRUE-pair
        # mass (measured: 15.6M -> 280M pairs for 10x data), while at
        # 0.8 only the planted cliques pair (9.9M -> 99M, exactly 10x)
        # — the probe must scale the work, not the answer. Measured
        # round 9: 20.1 s -> 320 s, exponent 1.20 = 1.10 grid ripple
        # (expected bucket 6250 -> 7812 under power-of-2 bucketing)
        # + ~0.1 shuffle pressure at the 8-band x 99M-pair dedup.
        PLATEAU_T = 0.8
        emb_200k = _bases_corpus(2_000).localCheckpoint(eager=True)
        emb_2m = _bases_corpus(20_000).localCheckpoint(eager=True)
        # pin the decade corpora alongside the tier's
        keep.update(
            r.id()
            for r in spark.sparkContext._jsc.getPersistentRDDs().values()
        )
        # Round 10 (VERDICT r9 asks #4/#5): two reads per decade —
        # bands=8 FIXED isolates the fractional grid (mean bucket
        # pinned at the 10k target both ends -> expected exponent
        # ~1.0, the round-9 1.10 power-of-2 ripple gone), and the
        # DEFAULT self-sizing additionally grows bands one per plane
        # step (9 -> 12 across this decade) to hold recall — its
        # exponent carries the documented log10(12/9) ~ +0.12
        # recall-holding surcharge on top of the grid's ~1.0.
        for label, kw in (("bands=8 fixed", {"bands": 8}), ("default", {})):
            f10 = lambda: similarity.neardup_pairs_bucketed(  # noqa: E731
                emb_200k, PLATEAU_T, **kw
            )
            f100 = lambda: similarity.neardup_pairs_bucketed(  # noqa: E731
                emb_2m, PLATEAU_T, **kw
            )
            _time_once(f10)  # warm
            release_operator_blocks()
            t200k_samples = []
            for _ in range(2):
                t200k_samples.append(_time_once(f10))
                release_operator_blocks()
            t200k = min(t200k_samples)
            t2m = _time_once(f100)
            release_operator_blocks()
            exp = math.log10(max(t2m, 1e-9) / max(t200k, 1e-9))
            print(
                f"\nsemdedup_bucketed plateau decade (200k -> 2M, "
                f"{label}, pair count linear in n): "
                f"{t200k:.2f}s -> {t2m:.2f}s exponent {exp:.2f}"
            )
        # recall at the 2M end (VERDICT r9 ask #4: the 100x tier's
        # recall read stops at 200k): exact oracle restricted to the
        # first 200 bases' 20k rows, approx pairs filtered to subset
        # endpoints — unbiased pair recall at the full 2M operating
        # point. Measured 1.000 (round 10): jittered copies sit at
        # cosine ~0.99 where per-band collision is near-certain; the
        # default grid's band growth is what keeps the THEORETICAL
        # floor at exactly c=0.8 above 0.78 (12 bands: 0.894 vs 8
        # bands: 0.776 with the same 9x8+3x7 plane mixture).
        base_lt = F.col("id_a") % 10_000_000 < 200
        base_lt_b = F.col("id_b") % 10_000_000 < 200
        sub = emb_2m.filter(F.col("vec_id") % 10_000_000 < 200)
        exact_sub = (
            similarity.neardup_pairs(sub, PLATEAU_T)
            .select("id_a", "id_b")
            .localCheckpoint(eager=True)
        )
        n_ex = exact_sub.count()
        approx_sub = (
            similarity.neardup_pairs_bucketed(emb_2m, PLATEAU_T)
            .filter(base_lt & base_lt_b)
            .select("id_a", "id_b")
        )
        hit = exact_sub.join(approx_sub, ["id_a", "id_b"], "left_semi").count()
        r = hit / max(n_ex, 1)
        print(
            f"semdedup_bucketed recall at 2M (subset oracle, threshold "
            f"{PLATEAU_T}): {r:.3f} ({hit}/{n_ex}) "
            f"{'PASS' if r >= 0.78 else '*BELOW 0.78*'}"
        )

    # recall at 100x: exact oracle on the embedded 20k organic subset
    _logs10, emb_sub = data["10x"]
    _logs100, emb_full = data["100x"]
    sub_max = 10 * 1_000_000
    exact = (
        similarity.neardup_pairs(emb_sub, THRESHOLD)
        .select("id_a", "id_b")
        .localCheckpoint(eager=True)
    )
    n_exact = exact.count()
    print()
    print(
        f"semdedup recall at 100x (200k corpus; exact oracle on the "
        f"embedded 20k subset; threshold {THRESHOLD}, floor {FLOOR})"
    )
    ok = True
    for meth, fn in (
        ("bucketed", lambda: similarity.neardup_pairs_bucketed(emb_full, THRESHOLD)),
        ("kmeans", lambda: similarity.neardup_pairs_kmeans(emb_full, THRESHOLD)),
    ):
        approx_sub = fn().filter(
            (F.col("id_a") < sub_max) & (F.col("id_b") < sub_max)
        ).select("id_a", "id_b")
        hit = exact.join(approx_sub, ["id_a", "id_b"], "left_semi").count()
        r = hit / max(n_exact, 1)
        ok = ok and r >= FLOOR
        print(f"  {meth:9s} recall {r:.3f}{'' if r >= FLOOR else ' *BELOW FLOOR*'}"
              f"  ({hit}/{n_exact})")
    print(f"recall floor {'PASS' if ok else 'FAIL'}")
    spark.stop()


if __name__ == "__main__":
    if "--tier100x" in sys.argv:
        tier100x()
    else:
        main()
