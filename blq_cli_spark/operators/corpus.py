"""Corpus preparation funnel: the end-to-end training-data filter chain
(length -> quality -> language -> exact dedup -> deterministic sample)
with per-stage survivor accounting — the recipe a 100 TB text pipeline
runs before tokenization, and the numbers its operators report.

Scale design: the whole funnel is TWO shuffles regardless of stage
count — one groupBy on the content fingerprint (well-distributed md5)
carrying per-stage conditional counts, then a singleton global
aggregation. No stage re-scans the input (a naive per-stage count would
re-read the corpus once per stage), and the survivors DataFrame shares
the same single-pass profile projection.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from blq_cli_spark.operators import text as text_ops

STAGES = (
    "raw",
    "min_tokens",
    "quality",
    "language",
    "exact_dedup",
    "sample",
)


def _flags(min_tokens: int, quality_floor: float, langs: tuple[str, ...]):
    len_ok = F.col("n_tokens") >= min_tokens
    q_ok = len_ok & (F.col("quality") >= quality_floor)
    lang_ok = q_ok & F.col("lang_pred").isin(*langs)
    return len_ok, q_ok, lang_ok


def _sample_member(col):
    """Deterministic ~1/8 membership: first md5 hex nibble in {0,1}
    (same partitioning-independent rule as the x_stratified_sample
    gate — splits are reproducible and joinable anywhere)."""
    return F.substring(F.md5(col.cast("string")), 1, 1).isin("0", "1")


def funnel_stats(
    docs: DataFrame,
    min_tokens: int = 5,
    quality_floor: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(stage_idx, stage, n_docs) survivor counts down the funnel.

    Stages are CUMULATIVE filters; exact_dedup counts distinct content
    fingerprints among survivors (group -> one representative), and
    sample applies the deterministic membership rule to each group's
    representative id (min doc id among surviving members), so the
    sampled set is exactly what materialize() returns."""
    p = text_ops.profile(docs, text_col=text_col, id_col=id_col)
    len_ok, q_ok, lang_ok = _flags(min_tokens, quality_floor, langs)
    per_fp = p.groupBy("fp").agg(
        F.count(F.lit(1)).alias("n_raw"),
        F.count_if(len_ok).alias("n_len"),
        F.count_if(q_ok).alias("n_q"),
        F.count_if(lang_ok).alias("n_lang"),
        F.min(F.when(lang_ok, F.col(id_col))).alias("rep_id"),
    )
    g = per_fp.agg(
        F.sum("n_raw").alias("raw"),
        F.sum("n_len").alias("min_tokens"),
        F.sum("n_q").alias("quality"),
        F.sum("n_lang").alias("language"),
        F.count(F.col("rep_id")).alias("exact_dedup"),
        F.count_if(
            F.col("rep_id").isNotNull() & _sample_member(F.col("rep_id"))
        ).alias("sample"),
    )
    stack = ", ".join(f"{i}, '{s}', cast(`{s}` as bigint)" for i, s in enumerate(STAGES))
    return g.selectExpr(
        f"stack({len(STAGES)}, {stack}) as (stage_idx, stage, n_docs)"
    )


def materialize(
    docs: DataFrame,
    min_tokens: int = 5,
    quality_floor: float = 0.5,
    langs: tuple[str, ...] = ("en",),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """The surviving documents themselves: one representative (min id)
    per distinct content among rows passing every filter, restricted to
    the deterministic sample. Join back by id to recover full rows —
    the id set is what the funnel's `sample` stage counted."""
    p = text_ops.profile(docs, text_col=text_col, id_col=id_col)
    _, _, lang_ok = _flags(min_tokens, quality_floor, langs)
    reps = (
        p.filter(lang_ok)
        .groupBy("fp")
        .agg(F.min(id_col).alias(id_col))
        .filter(_sample_member(F.col(id_col)))
        .select(id_col)
    )
    return docs.join(reps, id_col, "left_semi")


def neardup_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    hot_bucket_cap: int = 256,
    score: Column | None = None,
    method: str = "minhash",
) -> DataFrame:
    """End-to-end fuzzy deduplication in one call — the composed
    pipeline a training-data run actually executes:

        MinHash+LSH candidate pairs  (dedup.minhash_lsh_candidates)
          -> connected components    (dedup.dedup_clusters,
                                      large-star/small-star)
          -> one kept doc/cluster    (dedup.dedup_representatives,
                                      best quality_score, ties -> min id)

    Returns the surviving documents with their original schema. Every
    stage is distributed (bucketed candidate join, O(log n) iterative
    components, one keyed window); nothing is collected to the driver.
    For batch-over-batch ingestion use dedup.banded_signatures +
    lsh_candidates_against to skip re-hashing the existing corpus."""
    from blq_cli_spark.operators import dedup as dedup_ops

    if method == "simhash":
        # banded hamming search: same near-linear self-join shape, one
        # integer fingerprint per doc instead of k minhashes
        pairs = dedup_ops.simhash_candidates(
            docs,
            text_col,
            id_col,
            bits=32,
            bands=2,
            max_hamming=1,
            hot_bucket_cap=hot_bucket_cap,
        ).select("id_a", "id_b")
    elif method == "minhash":
        pairs = dedup_ops.minhash_lsh_candidates(
            docs, text_col, id_col, n, num_hashes, bands, hot_bucket_cap
        )
    else:
        raise ValueError(f"unknown dedup method: {method}")
    clusters = dedup_ops.dedup_clusters(pairs)
    return dedup_ops.dedup_representatives(
        docs, clusters, id_col=id_col, score=score
    )


def incremental_neardup_dedup(
    docs: DataFrame,
    stored_banded: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 8,
    bands: int = 4,
    hot_bucket_cap: int = 256,
    score: Column | None = None,
) -> DataFrame:
    """Batch-over-batch fuzzy dedup against a PERSISTED signature table —
    the production continuous-ingest shape (VERDICT r4 ask #7).

    A batch doc that LSH-matches any stored doc is a duplicate of an
    already-kept document and is dropped; the remainder goes through the
    normal in-batch neardup pipeline. Only the NEW batch is hashed —
    the stored corpus contributes its banded signatures via the bucket
    equi-join in dedup.lsh_candidates_against, so per-batch cost is
    O(|batch|) regardless of corpus size. Caller appends the survivors'
    dedup.banded_signatures to the store afterwards (run_action does
    this when given a signatures path)."""
    from blq_cli_spark.operators import dedup as dedup_ops

    pairs = dedup_ops.lsh_candidates_against(
        docs, stored_banded, text_col, id_col, n, num_hashes, bands, hot_bucket_cap
    )
    stored_ids = stored_banded.select(F.col("id").alias("_sid")).distinct()
    # every cross pair is one batch doc + one stored doc; the batch side
    # is the duplicate (the stored side was already kept)
    cross_a = pairs.join(
        stored_ids, pairs.id_b == stored_ids._sid, "left_semi"
    ).select(F.col("id_a").alias("_dup"))
    cross_b = pairs.join(
        stored_ids, pairs.id_a == stored_ids._sid, "left_semi"
    ).select(F.col("id_b").alias("_dup"))
    dup_ids = cross_a.unionByName(cross_b).distinct()
    fresh = docs.join(
        dup_ids, F.col(id_col) == F.col("_dup"), "left_anti"
    )
    return neardup_dedup(
        fresh, text_col, id_col, n, num_hashes, bands, hot_bucket_cap, score=score
    )


def mix_sources(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Source-weighted corpus mixing: keep each document with its
    source's acceptance rate — the sampling step that turns raw corpus
    proportions into a training-data mixture (web down-weighted, books
    up-weighted, etc.).

    Membership is DETERMINISTIC and engine-portable: a doc is kept iff
    the first two hex chars of md5(id) compare below the source's
    threshold (rate quantized to 1/256ths; lowercase-hex lexicographic
    order == numeric order). Unlike `df.sample`, the decision depends
    only on the id — reproducible across runs, engines, partitionings,
    and cluster sizes, and the same predicate re-materializes the exact
    split anywhere.

    Scale shape: the rate table is a handful of rows — broadcast join,
    then a pure column-expression filter. No shuffle of the corpus."""
    def thresh(rate: float) -> str:
        # rate >= 1.0 keeps everything: 'g' sorts above every hex char
        q = int(rate * 256)
        return "g" if q >= 256 else format(max(q, 0), "02x")

    spark = docs.sparkSession
    dim = spark.createDataFrame(
        [(s, thresh(r)) for s, r in rates.items()],
        f"{source_col} string, _thresh string",
    )
    default_thresh = thresh(default_rate)
    return (
        docs.join(F.broadcast(dim), source_col, "left")
        .filter(
            F.substring(F.md5(F.col(id_col).cast("string")), 1, 2)
            < F.coalesce(F.col("_thresh"), F.lit(default_thresh))
        )
        .drop("_thresh")
    )


def upsample_sources(
    docs: DataFrame,
    rates: dict[str, float],
    source_col: str = "source",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Fractional-epoch source mixing with rates ABOVE 1.0: a source at
    rate 2.6 contributes every document twice plus a deterministic
    0.6-probability third copy — the "epochs per source" mixture
    training recipes publish (e.g. Wikipedia at 2.45 epochs while web
    stays below 1). Rates under 1.0 degrade to mix_sources' thresholded
    downsample, so one table of rates drives the whole mixture, and
    default_rate matches mix_sources' 0.0 (unlisted sources drop unless
    raised).

    Output rows carry `epoch` (0-based copy index); a training-order
    shuffle downstream (training_shuffle on (id, epoch)) interleaves the
    copies. The fractional copy keeps the SAME md5(id) 2-hex key as
    mix_sources, so rate r < 1 here selects exactly the rows
    mix_sources(r) selects.

    Scale shape: broadcast the dimension-sized rate table, explode a
    sequence of floor(rate)+1 epoch indices (bounded fan-out, known at
    plan time per source), filter with a pure column predicate. The
    corpus never shuffles; output size = sum(rate_s * |source_s|) by
    construction."""
    def split(rate: float) -> tuple[int, str]:
        n_full = max(int(rate), 0)
        q = int((rate - n_full) * 256)
        return n_full, ("g" if q >= 256 else format(max(q, 0), "02x"))

    spark = docs.sparkSession
    rows = [(s, *split(r)) for s, r in rates.items()]
    dim = spark.createDataFrame(
        rows, f"{source_col} string, _nfull int, _fthresh string"
    )
    d_nfull, d_fthresh = split(default_rate)
    nfull = F.coalesce(F.col("_nfull"), F.lit(d_nfull))
    fthresh = F.coalesce(F.col("_fthresh"), F.lit(d_fthresh))
    keep_frac = (
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 2) < fthresh
    )
    return (
        docs.join(F.broadcast(dim), source_col, "left")
        .withColumn("epoch", F.explode(F.sequence(F.lit(0), nfull)))
        .filter((F.col("epoch") < nfull) | keep_frac)
        .select(*docs.columns, "epoch")
    )


def dedup_against_signatures(
    docs: DataFrame,
    signatures: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Incremental fuzzy dedup against a persisted banded-signature
    parquet: dedup this batch against the stored state (or in-batch on
    first use), then append the survivors' signatures so the next batch
    sees everything kept so far. Shared by run_action's dedup path, the
    pipeline dedup stage, and (indirectly) the streaming sink contract.

    The survivors materialize BEFORE the append: the kept plan reads the
    signatures path lazily, and appending this batch's own signatures
    first would make every survivor self-match on re-evaluation."""
    from blq_cli_spark.operators import dedup as dedup_ops

    spark = docs.sparkSession
    try:
        stored = spark.read.parquet(signatures)
    except Exception:
        stored = None
    if stored is not None:
        if "batch_id" in stored.columns:  # streaming-sink layout
            stored = stored.drop("batch_id")
        kept = incremental_neardup_dedup(
            docs, stored, text_col=text_col, id_col=id_col
        )
    else:
        kept = neardup_dedup(docs, text_col=text_col, id_col=id_col)
    kept = kept.localCheckpoint(eager=True)
    dedup_ops.banded_signatures(
        kept, text_col=text_col, id_col=id_col
    ).write.mode("append").parquet(signatures)
    return kept


def exact_dedup_against_history(
    docs: DataFrame,
    history: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    m_bits: int = 1 << 20,
    k_hashes: int = 4,
) -> DataFrame:
    """Incremental EXACT dedup against persisted content-hash state —
    the Bloom-fast-path twin of dedup_against_signatures (fuzzy): keep
    this batch's first copy of every content fingerprint never seen in
    any prior batch, then fold the survivors into the state.

    State layout under `history`: `hashes.parquet` (one fp per row,
    appended per batch) and `bloom.json` (the mergeable Bloom filter of
    every stored fp, sketch.bloom_build layout).

    Scale shape (100 TB continuous ingest): WITHOUT the filter every
    batch row — full text columns riding along — shuffles into an
    anti-join against the ever-growing history. With it, rows whose
    fingerprint the Bloom filter definitely hasn't seen skip the join
    entirely (pure broadcast probe, no shuffle); only the maybe-seen
    slice (true dups + the filter's ~1% false positives) anti-joins the
    stored fp column (hash-only, column-pruned scan). The filter is
    fixed-size, OR-merged per batch, and rebuilt from hashes.parquet if
    lost. In-batch dups collapse first (min-id representative, the
    exact_duplicates contract)."""
    import json as _json
    import os as _os

    from pyspark.sql import Window

    from blq_cli_spark.operators import sketch
    from blq_cli_spark.operators.text import fingerprint

    spark = docs.sparkSession
    root = history.rstrip("/")
    hashes_path = f"{root}/hashes.parquet"
    bloom_path = f"{root}/bloom.json"

    batch = docs.withColumn("_fp", fingerprint(F.col(text_col)))
    first_copy = F.col(id_col) == F.min(id_col).over(Window.partitionBy("_fp"))
    batch = batch.withColumn("_first", first_copy).filter("_first").drop("_first")

    stored_bloom = None
    if _os.path.exists(bloom_path):
        with open(bloom_path) as fh:
            stored_bloom = _json.load(fh)
    if stored_bloom is not None:
        probed = sketch.bloom_might_contain(batch, "_fp", stored_bloom, "_maybe")
        definite_new = probed.filter(~F.col("_maybe")).drop("_maybe")
        maybe = probed.filter(F.col("_maybe")).drop("_maybe")
        stored = spark.read.parquet(hashes_path).select(F.col("fp").alias("_fp"))
        confirmed_new = maybe.join(stored, "_fp", "left_anti")
        kept = definite_new.unionByName(confirmed_new)
        m_bits, k_hashes = stored_bloom["m"], stored_bloom["k"]
    else:
        kept = batch
    # materialize BEFORE appending state (same re-evaluation hazard as
    # the fuzzy path: survivors read the history lazily)
    kept = kept.localCheckpoint(eager=True)
    kept.select(F.col("_fp").alias("fp")).write.mode("append").parquet(hashes_path)
    new_bloom = sketch.bloom_build(
        kept.select("_fp"), "_fp", m_bits=m_bits, k_hashes=k_hashes
    )
    if stored_bloom is not None:
        new_bloom = sketch.bloom_merge(stored_bloom, new_bloom)
    tmp = bloom_path + ".tmp"
    with open(tmp, "w") as fh:
        _json.dump(new_bloom, fh)
    _os.replace(tmp, bloom_path)
    return kept.drop("_fp")


def run_action(
    docs: DataFrame,
    action: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    rates: dict[str, float] | None = None,
    default_rate: float = 0.0,
    benchmark: DataFrame | None = None,
    ngram: int = 4,
    method: str = "minhash",
    signatures: str | None = None,
    span_tokens: int = 10,
    min_docs: int = 2,
    weights: list[float] | None = None,
    capacity_tokens: int = 512,
    target: DataFrame | None = None,
    n_select: int = 100,
    seed: int = 0,
    chunk_size: int = 128,
    chunk_overlap: int = 0,
    history: str | None = None,
    n_per_source: int = 100,
    n_buckets: int = 3,
    lang_col: str = "lang",
    tokens_per_source: int = 100_000,
    merges: str | None = None,
    n_merges: int = 1000,
    top_k_words: int = 100_000,
    with_tokens: bool = False,
    score_col: str = "score",
    label_col: str = "label",
    thresholds: list[float] | None = None,
    norm_form: str = "NFC",
    model: str | None = None,
) -> DataFrame:
    """Uniform dispatch for the curation-operator surface — shared by the
    `corpus` CLI verb and the serve `corpus` tool so both fronts expose
    the identical op set with identical semantics.

    `signatures` (dedup only): parquet path of persisted
    dedup.banded_signatures state. If present, the batch dedups
    incrementally against it (incremental_neardup_dedup) instead of
    recomputing the whole corpus; either way the survivors' signatures
    are appended so the next batch sees everything kept so far.

    `merges` (tokenizer family): json path of the learned BPE merge
    list — written by `train-tokenizer`, read by `encode` and
    `bpe-fertility`."""
    from blq_cli_spark.operators import dedup as dedup_ops
    from blq_cli_spark.operators import quality

    # fail with the actual column inventory instead of a deep
    # AnalysisException. Exemptions: actions that never read the text
    # column (id/source-keyed membership + the scored-table sweep)
    _NO_TEXT = ("sweep", "mix", "upsample", "shuffle", "sample")
    if action not in _NO_TEXT and text_col not in docs.columns:
        raise ValueError(
            f"corpus {action}: column {text_col!r} not in input "
            f"(columns: {', '.join(docs.columns)}; use --text-col)"
        )
    if action == "profile":
        return text_ops.profile(docs, text_col=text_col, id_col=id_col)
    if action == "quality":
        return quality.repetition_profile(docs, text_col=text_col, id_col=id_col)
    if action == "redact":
        return quality.pii_profile(docs, text_col=text_col, id_col=id_col)
    if action == "funnel":
        return funnel_stats(docs, text_col=text_col, id_col=id_col)
    if action == "dedup":
        if signatures:
            if method != "minhash":
                raise ValueError("incremental dedup (--signatures) is minhash-only")
            return dedup_against_signatures(
                docs, signatures, text_col=text_col, id_col=id_col
            )
        return neardup_dedup(docs, text_col=text_col, id_col=id_col, method=method)
    if action == "exact-dedup":
        if history:
            # incremental form: returns the SURVIVING DOC ROWS (not the
            # per-fingerprint summary) and folds them into the state
            return exact_dedup_against_history(
                docs, history, text_col=text_col, id_col=id_col
            )
        return dedup_ops.exact_duplicates(docs, text_col=text_col, id_col=id_col)
    if action == "mix":
        return mix_sources(
            docs, rates or {}, source_col=source_col, id_col=id_col,
            default_rate=default_rate,
        )
    if action == "decontaminate":
        if benchmark is None:
            raise ValueError("decontaminate requires a benchmark DataFrame")
        return quality.decontaminate(
            docs, benchmark, text_col=text_col, id_col=id_col, n=ngram
        )
    if action == "winnow":
        return text_ops.winnow_fingerprints(docs, text_col=text_col, id_col=id_col)
    if action == "materialize":
        return materialize(docs, text_col=text_col, id_col=id_col)
    if action == "score":
        return quality.unigram_logprob(docs, text_col=text_col, id_col=id_col)
    if action == "score-bigram":
        return quality.bigram_logprob(docs, text_col=text_col, id_col=id_col)
    if action == "source-kl":
        return quality.source_kl(docs, text_col=text_col, source_col=source_col)
    if action == "clean-spans":
        return quality.remove_repeated_spans(
            docs, text_col=text_col, id_col=id_col, span_tokens=span_tokens,
            min_docs=min_docs,
        )
    if action == "dedup-paragraphs":
        return quality.dedup_paragraphs(docs, text_col=text_col, id_col=id_col)
    if action == "c4-lines":
        return quality.c4_line_rules(docs, text_col=text_col, id_col=id_col)
    if action == "pmi":
        return text_ops.pmi_pairs(
            docs, top_k=top_k_words, text_col=text_col, id_col=id_col
        )
    if action == "zipf":
        return text_ops.zipf_fit(
            docs, top_k=top_k_words, text_col=text_col, id_col=id_col
        )
    if action == "report":
        return report_stats(docs, text_col=text_col, id_col=id_col)
    if action == "pack":
        return pack_sequences(
            docs, capacity_tokens=capacity_tokens, text_col=text_col, id_col=id_col
        )
    if action == "passages":
        return dedup_ops.duplicate_passages(docs, text_col=text_col, id_col=id_col)
    if action == "gopher":
        return quality.gopher_rules(docs, text_col=text_col, id_col=id_col)
    if action == "gopher-lines":
        return quality.gopher_line_rules(docs, text_col=text_col, id_col=id_col)
    if action == "classify":
        if not weights:
            raise ValueError("classify requires trained classifier weights")
        from blq_cli_spark.operators import classifier as classifier_ops

        return classifier_ops.classifier_score(
            docs, weights, id_col=id_col, text_col=text_col
        )
    if action == "chunk":
        return text_ops.chunk_documents(
            docs, text_col=text_col, id_col=id_col,
            size=chunk_size, overlap=chunk_overlap,
        )
    if action == "select":
        if target is None:
            raise ValueError("select requires a target DataFrame")
        from blq_cli_spark.operators import selection

        return selection.dsir_select(
            docs, target, n=n_select, text_col=text_col, id_col=id_col, seed=seed
        )
    if action == "shuffle":
        return training_shuffle(docs, id_col=id_col, seed=seed)
    if action == "sample":
        return stratified_sample(
            docs, n_per_source, source_col=source_col, id_col=id_col, seed=seed
        )
    if action == "upsample":
        # default_rate semantics match mix: unlisted sources drop unless
        # --default-rate raises them
        return upsample_sources(
            docs, rates or {}, source_col=source_col, id_col=id_col,
            default_rate=default_rate,
        )
    if action == "split":
        return leakage_safe_split(docs, text_col=text_col, id_col=id_col)
    if action == "token-sample":
        return token_budget_sample(
            docs, tokens_per_source, source_col=source_col, id_col=id_col,
            text_col=text_col, seed=seed,
        )
    if action == "pack-report":
        return packing_report(
            docs, capacity_tokens=capacity_tokens, text_col=text_col,
            id_col=id_col,
        )
    if action == "fertility":
        return text_ops.tokenizer_fertility(
            docs, text_col=text_col, lang_col=lang_col
        )
    if action == "buckets":
        return quality.perplexity_buckets(
            docs, n_buckets=n_buckets, text_col=text_col, id_col=id_col,
            lang_col=lang_col,
        )
    if action == "tokens":
        return docs.select(
            F.col(id_col).alias("id"),
            text_ops.token_count(F.col(text_col)).alias("n_tokens"),
            text_ops.subword_token_count(F.col(text_col)).alias("n_subword_tokens"),
        )
    if action == "extract":
        # markup-to-text ingest prep: every non-text column rides along
        return docs.withColumn(
            text_col, text_ops.strip_html(F.col(text_col))
        )
    if action == "normalize":
        # inplace: the kernel rewrites text and passes every other
        # column through — no join-back shuffle
        return text_ops.normalize_text(
            docs, text_col=text_col, id_col=id_col, inplace=True,
            form=norm_form,
        )
    if action == "sweep":
        from blq_cli_spark.operators import classifier as classifier_ops

        return classifier_ops.threshold_sweep(
            docs, thresholds=thresholds, score_col=score_col,
            label_col=label_col,
        )
    if action == "langid-train":
        from blq_cli_spark.operators import classifier as classifier_ops

        out = classifier_ops.langid_train(docs, text_col=text_col, lang_col=lang_col)
        if model:
            out.write.mode("overwrite").parquet(model)
        return out
    if action == "langid":
        from blq_cli_spark.operators import classifier as classifier_ops

        m = (
            docs.sparkSession.read.parquet(model)
            if model
            else classifier_ops.langid_train(docs, text_col=text_col, lang_col=lang_col)
        )
        return classifier_ops.langid_predict(docs, m, text_col=text_col, id_col=id_col)
    if action == "train-tokenizer":
        from blq_cli_spark.operators import tokenizer as tok

        learned = tok.train_tokenizer(
            docs, n_merges=n_merges, top_k_words=top_k_words, text_col=text_col
        )
        if merges:
            tok.save_merges(learned, merges)
        return docs.sparkSession.createDataFrame(
            [(i, p[0], p[1]) for i, p in enumerate(learned)],
            "rank int, left string, right string",
        )
    if action == "encode":
        from blq_cli_spark.operators import tokenizer as tok

        if not merges:
            raise ValueError("encode requires --merges (from train-tokenizer)")
        return tok.bpe_encode(
            docs, tok.load_merges(merges), text_col=text_col, id_col=id_col,
            with_tokens=with_tokens,
        )
    if action == "bpe-fertility":
        from blq_cli_spark.operators import tokenizer as tok

        if not merges:
            raise ValueError(
                "bpe-fertility requires --merges (from train-tokenizer)"
            )
        return tok.bpe_fertility(
            docs, tok.load_merges(merges), text_col=text_col, id_col=id_col,
            lang_col=lang_col,
        )
    raise ValueError(f"unknown corpus action: {action}")


def pipeline(
    docs: DataFrame,
    stages: list[dict],
    text_col: str = "text",
    id_col: str = "doc_id",
    audit: bool = False,
) -> DataFrame | tuple[DataFrame, list[dict]]:
    """Configurable curation pipeline: apply an ordered list of stages,
    each stage consuming and producing a docs-shaped DataFrame, so one
    declarative spec runs the whole corpus-prep flow the individual
    `corpus` actions expose one at a time. Stage spec (dicts, JSON-able
    for the CLI/serve fronts):

      {"op": "gopher", ...gopher_rules kwargs}       keep rows passing
      {"op": "classify", "weights": [...],
       "threshold": 0.5}                             model quality filter
      {"op": "clean-spans", "span_tokens": 10,
       "min_docs": 2, "drop_empty": true}            rewrite text column
      {"op": "dedup", "method": "minhash"|"simhash"} fuzzy dedup survivors
      {"op": "exact-dedup"}                          one doc per content
      {"op": "decontaminate", "benchmark": DF,
       "ngram": 4}                                   drop benchmark overlap
      {"op": "mix", "rates": {...},
       "default_rate": 0.0, "source_col": "source"}  source-weighted sample
      {"op": "sample", "n": 100, "seed": 0,
       "source_col": "source"}                       exact per-source budget
                                                     (materializes the prefix
                                                     once: rank needs counts)
      {"op": "buckets", "min_bucket": 1,
       "n_buckets": 3, "lang_col": "lang"}           CCNet keep: drop buckets
                                                     below min_bucket (also
                                                     materializes the prefix)
      {"op": "select", "target": DF, "n": 100,
       "buckets": 256, "seed": 0}                    DSIR importance resample
      {"op": "extract"}                              strip HTML markup in place
      {"op": "normalize", "form": "NFC"}             Unicode-normalize in place
      {"op": "c4-lines", "min_words_per_line": 5,
       "drop_empty": true}                           C4 line rules in place
      {"op": "dedup-paragraphs", "drop_empty": true} first-occurrence paragraph
                                                     dedup (rewrites text)

    Every stage keeps the input schema (clean-spans rewrites `text_col`
    in place), so stages compose in any order. With audit=True also
    returns [{"stage", "op", "rows"}] counts — each count is an extra
    action, so leave it off in production and read the final count only.

    Scale: the composition adds NOTHING beyond its stages — each is the
    already-scale-shaped operator; filters are left-semi joins on id
    (docs never fan out, all columns ride through untouched)."""
    from blq_cli_spark.operators import classifier as classifier_ops
    from blq_cli_spark.operators import dedup as dedup_ops
    from blq_cli_spark.operators import quality

    tc = text_col
    out = docs
    counts: list[dict] = []
    for i, spec in enumerate(stages):
        spec = dict(spec)
        op = spec.pop("op", None)
        if op == "gopher":
            flags = quality.gopher_rules(out, text_col=tc, id_col=id_col, **spec)
            keep = flags.filter(F.col("passes")).select(F.col("id").alias(id_col))
            out = out.join(keep, id_col, "left_semi")
        elif op == "gopher-lines":
            flags = quality.gopher_line_rules(
                out, text_col=tc, id_col=id_col, **spec
            )
            keep = flags.filter(F.col("passes")).select(F.col("id").alias(id_col))
            out = out.join(keep, id_col, "left_semi")
        elif op == "classify":
            out = classifier_ops.quality_filter(
                out, spec["weights"], threshold=spec.get("threshold", 0.5),
                id_col=id_col, text_col=tc,
            )
        elif op == "clean-spans":
            drop_empty = spec.pop("drop_empty", True)
            cleaned = quality.remove_repeated_spans(
                out, text_col=tc, id_col=id_col, **spec
            ).select(F.col("id").alias(id_col), "clean_text")
            out = (
                out.drop(tc)
                .join(cleaned, id_col)
                .withColumnRenamed("clean_text", tc)
            )
            if drop_empty:
                out = out.filter(F.col(tc) != "")
        elif op == "c4-lines":
            # line-level rewrite in place — a pure column expression,
            # no join: the rule depends only on the row itself
            drop_empty = spec.pop("drop_empty", True)
            out = out.withColumn(
                tc, quality.c4_clean_text(F.col(tc), **spec)
            )
            if drop_empty:
                out = out.filter(F.col(tc) != "")
        elif op == "dedup-paragraphs":
            # first-occurrence paragraph dedup (Dolma rule): rewrite the
            # text column in place, same join-back shape as clean-spans
            drop_empty = spec.pop("drop_empty", True)
            cleaned = quality.dedup_paragraphs(
                out, text_col=tc, id_col=id_col, **spec
            ).select(F.col("id").alias(id_col), "clean_text")
            out = (
                out.drop(tc)
                .join(cleaned, id_col)
                .withColumnRenamed("clean_text", tc)
            )
            if drop_empty:
                out = out.filter(F.col(tc) != "")
        elif op == "dedup":
            sig = spec.pop("signatures", None)
            if sig:
                # same contract as run_action: the incremental path is
                # minhash-only and takes no other knobs — surface any
                # leftover keys instead of silently ignoring them
                if spec.get("method", "minhash") != "minhash":
                    raise ValueError(
                        "incremental dedup (signatures) is minhash-only"
                    )
                spec.pop("method", None)
                if spec:
                    raise ValueError(
                        f"dedup+signatures stage: unsupported keys {sorted(spec)}"
                    )
                out = dedup_against_signatures(
                    out, sig, text_col=tc, id_col=id_col
                )
            else:
                out = neardup_dedup(out, text_col=tc, id_col=id_col, **spec)
        elif op == "exact-dedup":
            reps = (
                dedup_ops.exact_duplicates(out, text_col=tc, id_col=id_col)
                .select(F.col("keep_id").alias(id_col))
            )
            out = out.join(reps, id_col, "left_semi")
        elif op == "decontaminate":
            bench = spec.pop("benchmark")
            flagged = quality.decontaminate(
                out, bench, text_col=tc, id_col=id_col, **spec
            )
            dirty = flagged.filter(F.col("n_gram_hits") > 0).select(
                F.col("id").alias(id_col)
            )
            out = out.join(dirty, id_col, "left_anti")
        elif op == "mix":
            out = mix_sources(
                out, spec.pop("rates", {}), id_col=id_col, **spec
            )
        elif op == "buckets":
            # CCNet-style keep: drop documents below min_bucket (0=tail;
            # n_buckets-1=head). Like 'sample', the quantile thresholds
            # need the score distribution, so materialize the prefix once.
            from blq_cli_spark.operators import quality as quality_ops

            min_bucket = spec.pop("min_bucket", 1)
            out = out.localCheckpoint(eager=True)
            kept = (
                quality_ops.perplexity_buckets(
                    out, text_col=tc, id_col=id_col, **spec
                )
                .filter(F.col("ppl_bucket") >= min_bucket)
                .select(F.col("id").alias(id_col))
            )
            out = out.join(kept, id_col, "left_semi")
        elif op == "sample":
            # stratified_sample's bounded counts collect() executes the
            # pipeline prefix at construction time, and the semi-join's
            # two subtrees would re-run it twice more; materialize the
            # prefix ONCE (the audit branch's discipline) so every
            # consumer reads it instead of recomputing gopher/dedup/...
            out = out.localCheckpoint(eager=True)
            picked = stratified_sample(
                out, spec.pop("n", 100), id_col=id_col, **spec
            ).select(id_col)
            out = out.join(picked, id_col, "left_semi")
        elif op == "select":
            from blq_cli_spark.operators import selection

            picked = selection.dsir_select(
                out, spec.pop("target"), n=spec.pop("n", 100),
                text_col=tc, id_col=id_col, **spec
            ).select(id_col)
            out = out.join(picked, id_col, "left_semi")
        elif op == "extract":
            # markup-to-text rewrite, pure column expressions in place
            out = out.withColumn(tc, text_ops.strip_html(F.col(tc)))
        elif op == "normalize":
            out = text_ops.normalize_text(
                out, text_col=tc, id_col=id_col, inplace=True, **spec
            )
        else:
            raise ValueError(f"pipeline stage {i}: unknown op {op!r}")
        if audit:
            # materialize the stage ONCE (executor-local checkpoint) so
            # each audit count reads the previous stage's result instead
            # of re-evaluating the whole prefix — linear, not quadratic,
            # in stage count (measured 28.2s -> ~stage-sum at sf0.1). On
            # a cluster, audit implies materialization cost by nature;
            # leave audit off to keep the pipeline one lazy plan.
            out = out.localCheckpoint(eager=True)
            counts.append({"stage": i, "op": op, "rows": out.count()})
    return (out, counts) if audit else out


def pack_sequences(
    docs: DataFrame,
    capacity_tokens: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    id_buckets: int = 64,
    tokens_col: str | None = None,
) -> DataFrame:
    """Greedy training-sequence packing: assign documents (in id order)
    to fixed-capacity token bins — the batch-construction step between
    curation and tokenization. A document lands in the bin its running
    token offset falls into: bin = floor(exclusive_prefix / capacity).

    Returns (id, n_tokens, offset, bin); deterministic for a given
    corpus regardless of partitioning.

    Scale shape — DISTRIBUTED PREFIX SUM: a naive global cumulative
    window (ORDER BY id over everything) collapses to one partition at
    100 TB. Instead ids split into `id_buckets` contiguous ORDERED
    ranges; per-range token totals (<= id_buckets longs) come to the
    driver for the tiny prefix scan and broadcast back as map literals,
    and each row's global offset = its range's base + a within-range
    cumulative window (parallel across ranges). Only two scalars and
    id_buckets totals ever leave the executors.

    The (id, n_tokens) projection is evaluated once per pass (range
    totals + final select). At real scale pre-compute token counts once
    and pass `tokens_col` so the passes read a narrow materialized
    column instead of re-tokenizing text."""
    from pyspark.sql import Window

    nt = _n_tokens_expr(text_col, tokens_col)
    base = docs.select(F.col(id_col).alias("id"), nt.alias("n_tokens"))
    lo, hi = base.agg(F.min("id"), F.max("id")).collect()[0]
    if lo is None:
        return base.withColumn("offset", F.lit(0).cast("long")).withColumn(
            "bin", F.lit(0).cast("long")
        )
    width = max(1, -(-(int(hi) - int(lo) + 1) // id_buckets))
    rng = ((F.col("id") - F.lit(int(lo))) / F.lit(width)).cast("long")
    ranged = base.withColumn("_rng", rng)
    totals = {
        r["_rng"]: r["_t"]
        for r in ranged.groupBy("_rng").agg(F.sum("n_tokens").alias("_t")).collect()
    }  # <= id_buckets rows
    bases, acc = {}, 0
    for k in sorted(totals):
        bases[k] = acc
        acc += totals[k]
    base_map = F.create_map(
        *[x for k, v in bases.items() for x in (F.lit(int(k)), F.lit(int(v)))]
    )
    w = (
        Window.partitionBy("_rng")
        .orderBy("id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    within = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    offset = (F.element_at(base_map, F.col("_rng")) + within).cast("long")
    return ranged.select(
        "id",
        "n_tokens",
        offset.alias("offset"),
        F.floor(offset / F.lit(float(capacity_tokens))).cast("long").alias("bin"),
    )


def _n_tokens_expr(text_col: str, tokens_col: str | None) -> Column:
    """Per-doc token count for the budget/packing operators, null-safe:
    a null text (or a null precomputed count) costs 0 tokens rather than
    propagating null into the per-bucket SUMs — a null group total would
    TypeError the driver-side prefix scan."""
    nt = (
        F.col(tokens_col).cast("long")
        if tokens_col
        else text_ops.token_count(F.col(text_col)).cast("long")
    )
    return F.coalesce(nt, F.lit(0).cast("long"))


def _rank_key(id_col: str, seed: int) -> Column:
    """Deterministic engine-portable shuffle key: md5 over (id, seed)
    joined by the 0x1f unit separator. Hex ordering == 128-bit numeric
    ordering, so sorting/bucketing by this string is a uniform random
    permutation reproducible in any md5-capable engine."""
    return F.md5(
        F.concat_ws("\x1f", F.col(id_col).cast("string"), F.lit(str(int(seed))))
    )


def _hex_prefix_bucket(key_col: str, buckets: int) -> Column:
    """Ordered uniform bucket id from the key's first 4 hex chars:
    monotone in the full key (prefix order == key order for equal-length
    hex) and balanced by md5 uniformity — the split that lets a global
    or per-group rank run as parallel within-bucket windows."""
    return F.floor(
        F.conv(F.substring(key_col, 1, 4), 16, 10).cast("long")
        * buckets
        / F.lit(65536)
    ).cast("int")


def training_shuffle(
    docs: DataFrame,
    id_col: str = "doc_id",
    seed: int = 0,
    rank_buckets: int = 64,
) -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    a dense rank 0..n-1 in md5(id, seed) order — the corpus-wide random
    permutation a training run reads documents in. Changing `seed`
    yields an independent permutation; the same (corpus, seed) yields
    the same order on any engine and any partitioning (no RNG state).

    Returns (id, shuffle_key, shuffle_rank).

    Scale shape — DISTRIBUTED RANK (the pack_sequences prefix-sum
    pattern applied to counts): a naive ROW_NUMBER() OVER (ORDER BY key)
    collapses to one partition at 100 TB. Here the md5 key's first 4 hex
    chars split rows into `rank_buckets` ORDERED buckets (hex-prefix
    order == full-key order, and md5 is uniform so buckets are balanced
    by construction — no skew sampling needed); per-bucket counts
    (<= rank_buckets longs) come to the driver for the tiny prefix scan,
    and each row's global rank = its bucket's base + a within-bucket
    row_number (parallel across buckets). Ties (128-bit md5 collisions)
    break on id, so the order is total and reproducible."""
    from pyspark.sql import Window

    buckets = max(1, min(int(rank_buckets), 65536))
    base = docs.select(
        F.col(id_col).alias("id"), _rank_key(id_col, seed).alias("shuffle_key")
    )
    bucketed = base.withColumn("_bkt", _hex_prefix_bucket("shuffle_key", buckets))
    counts = {
        r["_bkt"]: r["_c"]
        for r in bucketed.groupBy("_bkt").agg(F.count("*").alias("_c")).collect()
    }  # <= rank_buckets rows
    if not counts:
        return base.withColumn("shuffle_rank", F.lit(0).cast("long"))
    bases, acc = {}, 0
    for k in sorted(counts):
        bases[k] = acc
        acc += counts[k]
    base_map = F.create_map(
        *[x for k, v in bases.items() for x in (F.lit(int(k)), F.lit(int(v)))]
    )
    w = Window.partitionBy("_bkt").orderBy("shuffle_key", "id")
    rank = (F.element_at(base_map, F.col("_bkt")) + F.row_number().over(w) - 1).cast(
        "long"
    )
    return bucketed.select("id", "shuffle_key", rank.alias("shuffle_rank"))


def write_training_shards(
    docs: DataFrame,
    path: str,
    shards: int = 8,
    id_col: str = "doc_id",
    seed: int = 0,
) -> None:
    """Materialize the corpus as `shards` parquet files in GLOBAL
    training-shuffle order — the layout a sequential data loader
    consumes: file k holds ranks [k*n/shards, (k+1)*n/shards), each file
    internally rank-ordered, so reading shard 0..N-1 in filename order
    replays the whole permutation.

    Scale shape: training_shuffle's distributed rank (no global window)
    joins back to the full rows on id — a plain equi-join Catalyst
    shuffles on the id key (or broadcasts at small sizes) — then
    repartitionByRange on the rank splits into contiguous ordered ranges
    (one range shuffle; Spark samples rank boundaries, which are dense
    0..n-1 so sampling is exact enough) and sortWithinPartitions orders
    within each shard without any single-task sort."""
    if "shuffle_rank" in docs.columns:
        raise ValueError(
            "input already has a shuffle_rank column (a prior shuffle "
            "output?) — drop or rename it before resharding"
        )
    # materialize the input once: training_shuffle's construction-time
    # counts collect() plus BOTH join sides would otherwise run the
    # upstream plan (often a whole curation pipeline) three times
    docs = docs.localCheckpoint(eager=True)
    ranks = training_shuffle(docs, id_col=id_col, seed=seed).select(
        F.col("id").alias(id_col), "shuffle_rank"
    )
    (
        docs.join(ranks, id_col)
        .repartitionByRange(max(1, int(shards)), "shuffle_rank")
        .sortWithinPartitions("shuffle_rank")
        .write.mode("overwrite")
        .parquet(path)
    )


def shard_manifest(
    spark,
    path: str,
    id_col: str = "doc_id",
    text_col: str | None = "text",
) -> DataFrame:
    """Per-shard manifest of a write_training_shards directory: one row
    per parquet file with (shard, n_rows, rank_lo, rank_hi, n_tokens,
    content_checksum) — the sidecar a data loader checks before (and a
    re-run after) a transfer. Shard-contiguity is auditable directly:
    rank ranges must tile 0..n-1 in filename order.

    The checksum is the sum of a 60-bit md5 prefix of each row's id,
    accumulated in DECIMAL(38,0) so it cannot overflow at any row count
    — order-insensitive and engine-portable, so ANY engine can
    recompute it from the data without replaying the shuffle (unlike a
    file-level sha, which ties the check to one parquet encoding).

    Scale shape: everything aggregates DISTRIBUTED per input file
    (input_file_name groupBy — one map-side-combined shuffle on the
    shards-sized key); the driver never reads data, only the
    shards-bounded result."""
    df = spark.read.parquet(path)
    if "shuffle_rank" not in df.columns:
        raise ValueError(f"{path} has no shuffle_rank column — not a "
                         "write_training_shards output")
    row_sum = F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("decimal(38,0)")
    aggs = [
        F.count(F.lit(1)).alias("n_rows"),
        F.min("shuffle_rank").alias("rank_lo"),
        F.max("shuffle_rank").alias("rank_hi"),
        F.sum(row_sum).alias("content_checksum"),
    ]
    if text_col and text_col in df.columns:
        aggs.insert(3, F.sum(
            F.coalesce(text_ops.token_count(F.col(text_col)), F.lit(0))
        ).alias("n_tokens"))
    return (
        df.withColumn(
            "shard", F.element_at(F.split(F.input_file_name(), "/"), -1)
        )
        .groupBy("shard")
        .agg(*aggs)
        .orderBy("shard")
    )


def stratified_sample(
    docs: DataFrame,
    n_per_source: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    rank_buckets: int = 64,
) -> DataFrame:
    """Exact fixed-budget sampling per source: keep the `n_per_source`
    documents with the smallest md5(id, seed) key within each source —
    a deterministic engine-independent random sample with an EXACT count
    per domain (rate-based mix_sources can't guarantee counts).

    Returns the input rows that survive, plus `sample_rank` (0-based
    within-source rank in key order).

    Scale shape: a naive ROW_NUMBER() OVER (PARTITION BY source ...)
    puts each source's entire corpus in ONE task — a web-dominated crawl
    makes that task 90 TB. Instead the rank distributes exactly like
    training_shuffle's, per source: the key's hex prefix splits each
    source into `rank_buckets` ordered uniform buckets, per-(source,
    bucket) counts (bounded: sources are dimension-sized × rank_buckets)
    turn into exclusive base offsets on the driver and broadcast-join
    back, and a within-(source, bucket) row_number finishes the rank.
    The widest window task is ~1/rank_buckets of the largest source."""
    from pyspark.sql import Window

    buckets = max(1, min(int(rank_buckets), 65536))
    # null sources form their own stratum: coalesce to a sentinel for
    # grouping/joining (a plain equi-join would silently drop null keys)
    src_key = F.coalesce(F.col(source_col).cast("string"), F.lit("\x00null"))
    bucketed = (
        docs.withColumn("_k", _rank_key(id_col, seed))
        .withColumn("_bkt", _hex_prefix_bucket("_k", buckets))
        .withColumn("_src", src_key)
    )
    counts = (
        bucketed.groupBy("_src", "_bkt").agg(F.count("*").alias("_c")).collect()
    )  # bounded: n_sources x rank_buckets rows
    bases, acc = [], {}
    for r in sorted(counts, key=lambda r: (r["_src"], r["_bkt"])):
        src = r["_src"]
        bases.append((src, r["_bkt"], acc.get(src, 0)))
        acc[src] = acc.get(src, 0) + r["_c"]
    if not bases:
        return docs.withColumn("sample_rank", F.lit(0).cast("long")).limit(0)
    spark = docs.sparkSession
    base_df = spark.createDataFrame(bases, "_src string, _bkt int, _base long")
    w = Window.partitionBy("_src", "_bkt").orderBy("_k", id_col)
    ranked = bucketed.join(F.broadcast(base_df), ["_src", "_bkt"]).withColumn(
        "sample_rank",
        (F.col("_base") + F.row_number().over(w) - 1).cast("long"),
    )
    return ranked.filter(F.col("sample_rank") < int(n_per_source)).select(
        *docs.columns, "sample_rank"
    )


def leakage_safe_split(
    docs: DataFrame,
    valid_nibbles: tuple[str, ...] = ("0", "1"),
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Train/validation split with a test-set-leakage guard (the Lee et
    al. arXiv:2107.06499 finding: near-duplicates of eval data inside
    the training set corrupt evaluation): documents whose first md5(id)
    hex nibble is in `valid_nibbles` form the validation split
    (deterministic, engine/partitioning-independent, ~len/16 of the
    corpus); any TRAIN document sharing a winnowing fingerprint with
    ANY validation document — i.e. sharing a run of >= k+w-1 tokens,
    the SIGMOD'03 guarantee — is marked 'quarantined' rather than
    silently dropped, so the caller decides whether to exclude or
    inspect. Docs too short to fingerprint can never quarantine.

    Returns the input rows plus `split` in ('valid', 'train',
    'quarantined').

    Scale shape: fingerprints compute once (checkpointed — two
    consumers); the fingerprint equi-join shuffles on the md5-prefix fp
    key (well distributed), with the validation side a small fraction
    by construction. No broadcasts of corpus-derived sets."""
    is_valid = F.substring(
        F.md5(F.col(id_col).cast("string")), 1, 1
    ).isin(*valid_nibbles)
    fps = text_ops.winnow_fingerprints(
        docs, text_col=text_col, id_col=id_col
    ).localCheckpoint(eager=False)
    flags = docs.select(F.col(id_col).alias("id"), is_valid.alias("_iv"))
    tagged = fps.join(flags, "id")
    valid_fp = tagged.filter(F.col("_iv")).select("fp").distinct()
    leaky = (
        tagged.filter(~F.col("_iv"))
        .join(valid_fp, "fp", "left_semi")
        .select("id")
        .distinct()
        .withColumn("_leaky", F.lit(True))
    )
    joined = docs.withColumn("_iv", is_valid).join(
        leaky.withColumnRenamed("id", "_leak_id"),
        F.col(id_col) == F.col("_leak_id"),
        "left",
    )
    split = (
        F.when(F.col("_iv"), F.lit("valid"))
        .when(F.col("_leaky"), F.lit("quarantined"))
        .otherwise(F.lit("train"))
    )
    return joined.select(*docs.columns, split.alias("split"))


def token_budget_sample(
    docs: DataFrame,
    tokens_per_source: int,
    source_col: str = "source",
    id_col: str = "doc_id",
    text_col: str = "text",
    seed: int = 0,
    rank_buckets: int = 64,
    tokens_col: str | None = None,
) -> DataFrame:
    """Token-budget sampling: keep documents in deterministic md5(id,
    seed) order until each source's cumulative token count reaches
    `tokens_per_source` — the unit mixtures are actually specified in
    (a 100 B-token mix cares about tokens, not document counts; doc
    budgets over-weight short-doc sources). A document is kept iff its
    EXCLUSIVE prefix of tokens (in key order, within its source) is
    below the budget, so the budget overshoots by at most one document
    and every earlier-keyed document of a kept document is also kept.

    Returns the surviving input rows plus (n_tokens, tokens_before).

    Scale shape: the stratified_sample rank machinery carrying SUMS
    instead of counts — per-(source, hex-prefix bucket) token totals
    (bounded: sources x rank_buckets rows) become exclusive base
    offsets on the driver and broadcast-join back; a within-(source,
    bucket) cumulative window (ordered by the same key the bucket is a
    prefix of) finishes each doc's exact global token prefix. No
    per-source single-task window; pass `tokens_col` to reuse a
    precomputed count instead of re-tokenizing."""
    from pyspark.sql import Window

    buckets = max(1, min(int(rank_buckets), 65536))
    nt = _n_tokens_expr(text_col, tokens_col)
    src_key = F.coalesce(F.col(source_col).cast("string"), F.lit("\x00null"))
    bucketed = (
        docs.withColumn("_k", _rank_key(id_col, seed))
        .withColumn("_bkt", _hex_prefix_bucket("_k", buckets))
        .withColumn("_src", src_key)
        .withColumn("n_tokens", nt)
    )
    totals = (
        bucketed.groupBy("_src", "_bkt").agg(F.sum("n_tokens").alias("_t")).collect()
    )  # bounded: n_sources x rank_buckets rows
    bases, acc = [], {}
    for r in sorted(totals, key=lambda r: (r["_src"], r["_bkt"])):
        src = r["_src"]
        bases.append((src, r["_bkt"], acc.get(src, 0)))
        acc[src] = acc.get(src, 0) + r["_t"]
    if not bases:
        return (
            docs.withColumn("n_tokens", F.lit(0).cast("long"))
            .withColumn("tokens_before", F.lit(0).cast("long"))
            .limit(0)
        )
    spark = docs.sparkSession
    base_df = spark.createDataFrame(bases, "_src string, _bkt int, _base long")
    w = (
        Window.partitionBy("_src", "_bkt")
        .orderBy("_k", id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    before = (
        F.col("_base") + F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    ).cast("long")
    return (
        bucketed.join(F.broadcast(base_df), ["_src", "_bkt"])
        .withColumn("tokens_before", before)
        .filter(F.col("tokens_before") < int(tokens_per_source))
        .select(*docs.columns, "n_tokens", "tokens_before")
    )


def packing_report(
    docs: DataFrame,
    capacity_tokens: int = 512,
    text_col: str = "text",
    id_col: str = "doc_id",
    tokens_col: str | None = None,
) -> DataFrame:
    """Bin-utilization report for a pack_sequences run: how full the
    training sequences actually are. One row: n_bins, n_docs,
    total_tokens, mean/min fill ratio, and the share of bins filled to
    >= 95% of capacity — the numbers that decide whether the capacity
    (or the greedy id-order policy) wastes compute at tokenization.

    Scale shape: pack_sequences' distributed prefix sum, then one
    groupBy on bin and one singleton aggregate."""
    packed = pack_sequences(
        docs, capacity_tokens=capacity_tokens, text_col=text_col,
        id_col=id_col, tokens_col=tokens_col,
    )
    cap = float(capacity_tokens)
    bins = packed.groupBy("bin").agg(
        F.sum("n_tokens").alias("_fill"), F.count(F.lit(1)).alias("_docs")
    )
    return bins.agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("_docs").alias("n_docs"),
        F.sum("_fill").alias("total_tokens"),
        F.round(F.avg(F.col("_fill") / cap), 6).alias("mean_fill_ratio"),
        F.round(F.min(F.col("_fill") / cap), 6).alias("min_fill_ratio"),
        F.round(
            F.avg(F.when(F.col("_fill") >= 0.95 * cap, 1.0).otherwise(0.0)), 6
        ).alias("full_bin_share"),
    )


def report_stats(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus health report as (metric, value) rows: document and
    distinct-content counts, duplicate rate, token totals/means, mean
    quality score, English rate, and the Gopher-rule pass rate — the
    numbers a curation run reports before/after each stage.

    Scale shape (the funnel_stats pattern): ONE projection computes
    every per-document signal (fingerprint, token count, quality, lang,
    gopher conjunction — all codegen column expressions), one groupBy on
    the md5 fingerprint carries the duplicate accounting, and one global
    aggregate folds the rest. Two shuffles total regardless of metric
    count; nothing re-scans the corpus."""
    from blq_cli_spark.operators import quality

    txt = F.col(text_col)
    flags = quality.gopher_flags(text_col)
    proj = docs.select(
        text_ops.fingerprint(txt).alias("fp"),
        text_ops.token_count(txt).alias("nt"),
        text_ops.quality_score(txt).alias("q"),
        (text_ops.language_id(txt) == "en").cast("int").alias("is_en"),
        flags["passes"].cast("int").alias("ok"),
    )
    per_fp = proj.groupBy("fp").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum("nt").alias("snt"),
        F.sum("q").alias("sq"),
        F.sum("is_en").alias("sen"),
        F.sum("ok").alias("sok"),
    )
    g = per_fp.agg(
        F.sum("c").alias("n_docs"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.sum("snt").alias("total_tokens"),
        F.sum("sq").alias("_sq"),
        F.sum("sen").alias("_sen"),
        F.sum("sok").alias("_sok"),
    )
    n = F.col("n_docs").cast("double")
    metrics = [
        ("n_docs", F.col("n_docs").cast("double")),
        ("n_distinct", F.col("n_distinct").cast("double")),
        ("dup_rate", F.round(1.0 - F.col("n_distinct") / n, 6)),
        ("total_tokens", F.col("total_tokens").cast("double")),
        ("avg_tokens", F.round(F.col("total_tokens") / n, 6)),
        ("avg_quality", F.round(F.col("_sq") / n, 6)),
        ("english_rate", F.round(F.col("_sen") / n, 6)),
        ("gopher_pass_rate", F.round(F.col("_sok") / n, 6)),
    ]
    stacked = ", ".join(f"'{name}', `_m{i}`" for i, (name, _) in enumerate(metrics))
    g2 = g.select(*[expr.alias(f"_m{i}") for i, (_, expr) in enumerate(metrics)])
    return g2.selectExpr(
        f"stack({len(metrics)}, {stacked}) as (metric, value)"
    )


def temperature_rates(
    docs: DataFrame,
    alpha: float = 0.7,
    source_col: str = "source",
) -> dict[str, float]:
    """Temperature-based source sampling rates (the multilingual-corpus
    rebalancing rule, XLM / mBERT style): sample source s with
    probability proportional to p_s^alpha where p_s is its share of the
    corpus, then rescale so the most up-weighted source keeps 100% of
    its documents. alpha=1 reproduces natural proportions; alpha<1
    flattens the distribution (up-weights small sources relative to
    their size — the low-resource-language trick).

    Returns {source: keep_rate} for mix_sources — per-source keep rate
    r_s = (target share / natural share), normalized to max 1. The
    computation aggregates one dimension-sized table (one row per
    source) and runs on the driver; feed the result straight to
    mix_sources / corpus mix."""
    counts = {
        r["source"]: r["n"]
        for r in docs.groupBy(F.col(source_col).alias("source"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()  # dimension-sized: one row per source
    }
    total = sum(counts.values())
    if not total:
        return {}
    shares = {s: n / total for s, n in counts.items()}
    target = {s: p**alpha for s, p in shares.items()}
    z = sum(target.values())
    # keep rate proportional to target share / natural share
    raw = {s: (target[s] / z) / shares[s] for s in counts}
    mx = max(raw.values())
    return {s: r / mx for s, r in raw.items()}


def write_clustered(
    docs: DataFrame,
    path: str,
    by: str,
    n_files: int | None = None,
    mode: str = "overwrite",
) -> None:
    """Range-clustered parquet layout: repartitionByRange on `by` +
    sortWithinPartitions, so every output file covers a narrow,
    mostly-disjoint range of the cluster column. Later scans filtering
    on `by` (range or equality) skip whole files and row groups via
    parquet min/max statistics — the single-column clustering index a
    100 TB corpus needs for id-lookup/range workloads without a
    metastore. (The ordered-shard writer is this same move specialized
    to the shuffle rank; text.build_inverted_index partitions by term
    for the categorical analog.)

    Scale shape: ONE range-partitioning shuffle (sampled range bounds,
    the repartitionByRange contract) + a per-partition sort that feeds
    the parquet writer's stats; no driver materialization. `n_files`
    defaults to the session's shuffle parallelism."""
    n = int(n_files) if n_files else docs.sparkSession.sparkContext.defaultParallelism
    (
        docs.repartitionByRange(n, F.col(by))
        .sortWithinPartitions(by)
        .write.mode(mode)
        .parquet(path)
    )
