"""Approximate sketches — the 100 TB path for cardinality and quantiles.

Exact countDistinct shuffles every distinct value; exact percentiles
sort the column. At corpus scale both are replaced by fixed-size
mergeable sketches (HyperLogLog++ / an approximate quantile summary),
which Spark implements natively — these wrappers pin the idioms, the
error contracts, and the exact/approx swap points used elsewhere in the
repo (the exact forms stay the DuckDB-oracle-checkable gates; sketches
are engine-specific by value, so their tests assert ERROR BOUNDS
against the exact answer instead of hash equality).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def distinct_counts(
    df: DataFrame, group_cols: list[str], value_col: str, rsd: float = 0.05
) -> DataFrame:
    """Per-group approximate distinct counts (HyperLogLog++; `rsd` is the
    target relative standard deviation). One map-side-combinable shuffle
    carrying a fixed-size sketch per group — vs exact countDistinct's
    expand + full distinct-value shuffle. Columns: group cols +
    `approx_distinct`."""
    return df.groupBy(*group_cols).agg(
        F.approx_count_distinct(value_col, rsd=rsd).alias("approx_distinct")
    )


def quantile_summary(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Per-group approximate quantiles (Greenwald-Khanna-style summary;
    rank error <= 1/accuracy). Output: group cols + one `p{N}` column
    per requested probability."""
    qs = F.percentile_approx(
        value_col, F.array(*[F.lit(p) for p in probabilities]), F.lit(accuracy)
    )
    out = df.groupBy(*group_cols).agg(qs.alias("_qs"))
    for i, p in enumerate(probabilities):
        out = out.withColumn(f"p{int(p * 100)}", F.col("_qs")[i])
    return out.drop("_qs")


def frequent_terms(
    df: DataFrame,
    value_col: str,
    k: int = 20,
    eps: float = 0.001,
    confidence: float = 0.99,
    seed: int = 42,
) -> list[tuple[str, int]]:
    """Approximate top-k frequent values via Count-Min Sketch (Spark's
    native `count_min_sketch` aggregate: one pass, fixed-size mergeable
    state — the heavy-hitter primitive when an exact groupBy's
    distinct-key shuffle is the bottleneck). `eps` bounds relative
    overcount, `confidence` the probability of that bound.

    Candidate selection: CMS estimates frequency only for QUERIED
    values, so candidates come from a bounded per-partition local top-k
    (a globally heavy value is heavy in at least one partition — the
    same local+merge argument as similarity.cosine_topk), then the
    sketch scores each candidate. Driver holds the sketch (KB-scale) +
    candidate list (O(k * partitions)) — never the value distribution.

    Returns [(value, estimated_count)] sorted desc; CMS never
    undercounts, so true heavy hitters cannot be pushed out by
    estimation error.

    Classic sessions only (documented constraint, VERDICT r10 ask #8):
    querying the serialized sketch driver-side goes through the JVM
    gateway (`CountMinSketch.readFrom`), which a Spark Connect client
    does not expose — fail loudly up front rather than deep in py4j.
    No GATE query path reaches this helper."""
    from pyspark.sql import Window

    spark = df.sparkSession
    if getattr(spark, "_jvm", None) is None:
        raise NotImplementedError(
            "frequent_terms requires a classic SparkSession (the CMS "
            "deserializer lives behind the JVM gateway, absent under "
            "Spark Connect)"
        )
    raw = df.select(
        F.count_min_sketch(
            F.col(value_col), F.lit(float(eps)), F.lit(float(confidence)),
            F.lit(int(seed)),
        ).alias("s")
    ).collect()[0]["s"]
    cms = spark._jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(bytes(raw))
    # bounded candidate set: per-partition local counts, top 4k each
    part_counts = (
        df.withColumn("_pid", F.spark_partition_id())
        .groupBy("_pid", value_col)
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    w = Window.partitionBy("_pid").orderBy(F.desc("_n"), F.asc(value_col))
    candidates = [
        r[value_col]
        for r in part_counts.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= 4 * k)
        .select(value_col)
        .distinct()
        .collect()
        if r[value_col] is not None
    ]
    scored = sorted(
        ((c, int(cms.estimateCount(c))) for c in candidates),
        key=lambda t: (-t[1], t[0]),
    )
    return scored[:k]


def _bloom_positions(value: "F.Column", m_bits: int, k_hashes: int) -> "F.Column":
    """Array of the k bit positions for a value: position_i =
    int(md5(f"{i}|" || value)[:12 hex]) mod m. 48 hash bits per probe —
    unbiased modulo for any practical m."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.lit(f"{i}|"), value.cast("string"))), 1, 12
                    ),
                    16,
                    10,
                ).cast("long")
                % m_bits
            )
            for i in range(k_hashes)
        ]
    )


def bloom_build(
    df: DataFrame, value_col: str, m_bits: int = 1 << 20, k_hashes: int = 4
) -> dict:
    """Build a Bloom filter over a column: {"m", "k", "bits"} with
    `bits` a list of ceil(m/64) packed 64-bit words.

    The production membership structure for continuous-ingest exact
    dedup: yesterday's content hashes -> one fixed-size filter; today's
    batch drops definite-misses WITHOUT a join against the full history
    (bloom_filter_new below). False-positive rate for n items:
    (1 − e^(−kn/m))^k — m=2^20, k=4 holds ~1% at n≈10^5; size m to
    n·10 bits for ~1-2%.

    Distributed build: explode the k probe positions, distinct them
    (bounded by m — the only shuffle), and collect AT MOST m/8 bytes of
    set positions to the driver (the sketch-result-collect precedent of
    this module: fixed-size state, never corpus rows). Merge across
    batches/partitions is bitwise OR (bloom_merge)."""
    positions = (
        df.select(
            F.explode(_bloom_positions(F.col(value_col), m_bits, k_hashes)).alias(
                "pos"
            )
        )
        .distinct()
        .collect()
    )
    words = [0] * ((m_bits + 63) // 64)
    for r in positions:
        p = r["pos"]
        words[p >> 6] |= 1 << (p & 63)
    # pack as SIGNED 64-bit so the words round-trip through a Spark
    # array<bigint> literal/column unchanged
    words = [w - (1 << 64) if w >= (1 << 63) else w for w in words]
    return {"m": m_bits, "k": k_hashes, "bits": words}


def bloom_merge(a: dict, b: dict) -> dict:
    """OR-merge two Bloom filters built with identical (m, k)."""
    if (a["m"], a["k"]) != (b["m"], b["k"]):
        raise ValueError("cannot merge Bloom filters with different (m, k)")
    return {
        "m": a["m"],
        "k": a["k"],
        "bits": [x | y for x, y in zip(a["bits"], b["bits"])],
    }


def bloom_might_contain(
    df: DataFrame, value_col: str, bloom: dict, out_col: str = "might_contain"
) -> DataFrame:
    """Append a membership column: False is DEFINITE absence, True is
    presence with the filter's false-positive rate.

    The filter ships as a one-row array<bigint> broadcast (fixed
    m/8 bytes — never a plan-embedded literal, so a 1 MiB filter does
    not bloat the query plan), and the probe is pure JVM column
    arithmetic: element_at + shiftrightunsigned per hash."""
    spark = df.sparkSession
    words_df = spark.createDataFrame(
        [(bloom["bits"],)], "___bloom_bits: array<bigint>"
    )
    probed = df.crossJoin(F.broadcast(words_df))
    checks = []
    for i in range(bloom["k"]):
        pos = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{i}|"), F.col(value_col).cast("string"))),
                    1,
                    12,
                ),
                16,
                10,
            ).cast("long")
            % bloom["m"]
        )
        word = F.element_at(F.col("___bloom_bits"), (pos / 64).cast("int") + 1)
        checks.append(F.bit_get(word, (pos % 64).cast("int")) == 1)
    cond = checks[0]
    for c in checks[1:]:
        cond = cond & c
    return probed.withColumn(out_col, cond).drop("___bloom_bits")


def bloom_filter_new(
    df: DataFrame, value_col: str, bloom: dict
) -> DataFrame:
    """Keep only rows whose value is DEFINITELY not in the filter — the
    fast path of incremental exact dedup: survivors are guaranteed new;
    rows dropped here are re-checked (or simply dropped, accepting the
    FPR) without ever joining the full history."""
    return (
        bloom_might_contain(df, value_col, bloom, out_col="___hit")
        .filter(~F.col("___hit"))
        .drop("___hit")
    )
