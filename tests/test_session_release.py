"""release_local_checkpoints: the session-lifecycle block release.

Checkpoint-bearing operators (minhash signatures, banded bucket sizing,
the CC frontier, the bucketed-SemDeDup skinny assignment, IVF appends)
leave localCheckpoint blocks in the executor block managers for the
LIFE OF THE SESSION — Spark never releases them when the DataFrame
goes out of Python scope. A long-lived session calling them repeatedly
accumulates dead blocks without bound (executor eviction churn / OOM at
scale). release_local_checkpoints is the documented release point:
call it once every result derived from those operators is materialized.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from blq_cli_spark.session import (
    quiet_rdd_release_warnings,
    release_local_checkpoints,
)


def test_release_frees_blocks_and_returns_count(spark):
    before = len(spark.sparkContext._jsc.getPersistentRDDs())
    a = spark.range(1000).localCheckpoint(eager=True)
    b = spark.range(10).withColumn("x", F.lit(1)).localCheckpoint(eager=False)
    assert b.count() == 10  # materialize the lazy one
    held = len(spark.sparkContext._jsc.getPersistentRDDs())
    assert held >= before + 2

    n = release_local_checkpoints(spark)
    assert n == held
    assert len(spark.sparkContext._jsc.getPersistentRDDs()) == 0
    # keep the handles alive until after the release so the blocks
    # could not have been dropped by GC instead of by the call
    del a, b


def test_session_fully_usable_after_release(spark):
    spark.range(100).localCheckpoint(eager=True)
    release_local_checkpoints(spark)
    # fresh work — including a NEW checkpoint — runs normally
    df = spark.range(50).groupBy((F.col("id") % 5).alias("k")).count()
    assert df.count() == 5
    again = spark.range(20).localCheckpoint(eager=True)
    assert again.count() == 20
    release_local_checkpoints(spark)


def test_release_is_idempotent_and_safe_on_empty_session(spark):
    release_local_checkpoints(spark)
    assert release_local_checkpoints(spark) == 0


def test_release_is_noop_without_jvm_gateway():
    """Connect-shaped session (no sparkContext._jsc): no-op, not a py4j
    AttributeError (VERDICT r10 ask #8 — no _jsc access blows up on the
    query path)."""

    class _ConnectishSession:
        pass  # no sparkContext attribute at all, like pyspark.sql.connect

    class _NoGatewayContext:
        sparkContext = object()  # has no _jsc

    assert release_local_checkpoints(_ConnectishSession()) == 0
    assert release_local_checkpoints(_NoGatewayContext()) == 0
    assert quiet_rdd_release_warnings(_ConnectishSession()) is False
    assert quiet_rdd_release_warnings(_NoGatewayContext()) is False


def test_quiet_rdd_release_warnings_drops_logger_to_error(spark):
    """The release WARN spam killer (VERDICT r10 ask #1): after the
    call, the org.apache.spark.rdd logger sits at ERROR, so the
    one-WARN-per-released-block flood cannot bury the bench's
    per-query stderr lines in the driver's bounded tail capture."""
    assert quiet_rdd_release_warnings(spark) is True
    jvm = spark.sparkContext._jvm
    lvl = jvm.org.apache.logging.log4j.LogManager.getLogger(
        "org.apache.spark.rdd"
    ).getLevel()
    assert str(lvl) == "ERROR"
    # a full checkpoint+release cycle still works with the logger quiet
    df = spark.range(500).localCheckpoint(eager=True)
    assert df.count() == 500
    assert release_local_checkpoints(spark) >= 1
