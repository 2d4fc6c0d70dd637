"""Dedup operator units: LSH hot-bucket cap behavior under skew."""

from __future__ import annotations

import pyspark.sql.functions as F

from blq_cli_spark.operators import dedup


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_hot_bucket_cap_bounds_pairs_and_keeps_connectivity(spark):
    """1k identical docs share every band bucket. Uncapped, that is
    ~499.5k pairs per band; with the cap the star fallback emits O(n)
    pairs while keeping all docs reachable from the representative."""
    rows = [(f"d{i:04d}", "the same boilerplate text repeated") for i in range(1000)]
    pairs = dedup.minhash_lsh_candidates(
        _docs(spark, rows), hot_bucket_cap=64
    ).collect()
    assert len(pairs) == 999  # one star edge per non-representative doc
    rep = min(r[0] for r in rows)
    assert all(p["id_a"] == rep for p in pairs)
    assert {p["id_b"] for p in pairs} == {r[0] for r in rows} - {rep}


def test_cold_buckets_unaffected_by_cap(spark):
    """A diverse corpus below the cap must produce identical candidates
    whatever the cap is (the guard only rewrites hot buckets)."""
    rows = [(f"a{i}", f"alpha beta gamma delta {i}") for i in range(20)] + [
        (f"b{i}", f"totally different words here {i * 7}") for i in range(20)
    ]
    lo = dedup.minhash_lsh_candidates(_docs(spark, rows), hot_bucket_cap=256)
    hi = dedup.minhash_lsh_candidates(_docs(spark, rows), hot_bucket_cap=10**9)
    assert sorted(map(tuple, lo.collect())) == sorted(map(tuple, hi.collect()))


def test_lsh_bucket_profile_flags_hot(spark):
    rows = [(f"d{i:03d}", "same text") for i in range(100)] + [
        ("x1", "unique snowflake document one"),
        ("x2", "another unique snowflake text"),
    ]
    prof = dedup.lsh_bucket_profile(_docs(spark, rows), hot_bucket_cap=50)
    hot = prof.filter(F.col("capped")).collect()
    assert hot and all(r["bucket_size"] == 100 for r in hot)
    assert prof.filter(~F.col("capped")).count() > 0
