"""SparkSession factory.

The reference delegates execution wholly to DuckDB in-process
(src/blq/storage.py:560-582); our equivalent is a SparkSession with the
knobs that matter at scale set up-front:

- AQE on (runtime re-plan, skew-join splitting, partition coalescing)
- modest shuffle partitions for local mode; on a real cluster this is
  overridden by AQE's coalescing + advisory partition size anyway
- Arrow enabled so the few Pandas-UDF paths are vectorized
- zstd parquet compression (parity with reference's COPY ... zstd,
  src/blq/commands/core.py:2002-2009)
- UTC session timezone so timestamp semantics are stable across hosts
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "blq-cli-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or os.environ.get("SPARK_MASTER", f"local[{cpus}]")
    # Ship this package's location to Python workers explicitly. Without
    # it, workers resolve `blq_cli_spark` only when their inherited cwd
    # happens to be the repo root — so the first get_spark() call from
    # any other directory (CLI run from a project dir, test that chdir'd)
    # poisons every later Arrow-UDF task with ModuleNotFoundError. Must
    # run BEFORE the JVM starts: the worker daemon inherits the driver's
    # env via the JVM. A pip-installed deployment hits the same path via
    # site-packages; this makes the source checkout equally relocatable.
    pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    parts = os.environ.get("PYTHONPATH", "")
    if pkg_root not in parts.split(os.pathsep):
        os.environ["PYTHONPATH"] = (
            pkg_root + (os.pathsep + parts if parts else "")
        )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 32))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.parquet.compression.codec", "zstd")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        # default-on, but the numpy kernels' per-process GEMM priming
        # (operators/similarity._prime_gemm) relies on it — keep explicit
        .config("spark.python.worker.reuse", "true")
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def release_local_checkpoints(spark: SparkSession) -> int:
    """Unpersist every persistent RDD on the session; returns the count.

    Several operators cut lineage / pin a reused intermediate with
    ``localCheckpoint`` (minhash signatures, banded bucket sizing, the
    connected-components frontier, the bucketed-SemDeDup skinny
    assignment, IVF append batches). Those blocks live in the executor
    block managers until the SESSION dies — Spark has no automatic
    release for checkpoint blocks whose DataFrame went out of Python
    scope. A long-lived session (serve mode, a notebook, a bench loop)
    that calls such operators repeatedly therefore accumulates dead
    blocks without bound: at 100 TB that is eventual executor eviction
    churn / OOM; even at bench scale it is measurable cross-query GC
    pressure.

    Call this at result-consumed boundaries: every DataFrame produced by
    a checkpoint-bearing operator must be fully materialized (written,
    collected, counted) before the call — unpersisting truncates the
    only copy, and a later action on a still-live handle fails with
    "checkpoint block not found" rather than recomputing (the lineage
    was cut; there is nothing to recompute from).

    Non-blocking (``unpersist(false)``): the block managers drop the
    blocks asynchronously; the freed memory is available to the next
    job's tasks, not necessarily to the very next instruction.

    Classic sessions only: the persistent-RDD census lives on the
    driver-side JVM gateway, which a Spark Connect client does not
    have. Under Connect this is a no-op returning 0 (blocks are then
    owned by the server's session lifecycle) instead of an
    AttributeError deep in py4j.
    """
    sc = getattr(spark, "sparkContext", None)
    jsc = getattr(sc, "_jsc", None) if sc is not None else None
    if jsc is None:  # Spark Connect client: no JVM gateway
        return 0
    jmap = jsc.getPersistentRDDs()
    rdds = list(jmap.values())
    for rdd in rdds:
        rdd.unpersist(False)
    return len(rdds)


def quiet_rdd_release_warnings(spark: SparkSession) -> bool:
    """Drop the ``org.apache.spark.rdd`` logger to ERROR; True on success.

    Every ``release_local_checkpoints`` call makes Spark log one
    ``WARN MapPartitionsRDD: RDD n was locally checkpointed, its
    lineage has been truncated and cannot be recomputed after
    unpersisting`` line PER released block. At a correct call site the
    warning is vacuous by contract (the result was already consumed;
    nothing will ever ask for a recompute), but the spam is not free:
    a bounded log-tail capture (the bench driver's) loses the real
    per-query lines under it (round 10: BENCH_r10's tail was 100%
    this WARN and PERF_r10 lost its whole per_query table).

    Scoped to the ``org.apache.spark.rdd`` logger only — everything
    else keeps the session's normal level. Classic sessions only (the
    log4j2 Configurator lives behind the py4j gateway); returns False
    under Connect or if the logging backend is not log4j2.
    """
    sc = getattr(spark, "sparkContext", None)
    jvm = getattr(sc, "_jvm", None) if sc is not None else None
    if jvm is None:
        return False
    try:
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.rdd", jvm.org.apache.logging.log4j.Level.ERROR
        )
        return True
    except Exception:
        return False
