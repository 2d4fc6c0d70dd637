"""Interleaved A/B: explicit-format suite path vs auto path, same session."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main():
    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.driver.memory", "16g")
        .getOrCreate()
    )
    from blq_cli_spark.gates import parsing
    from blq_cli_spark.sources import logparse_fast as lf

    ev = parsing._events(spark, SF_DIR)
    gcc_docs, es_docs, rust_docs = parsing._family_docs(ev)

    def _tag(docs, prefix):
        return docs.select(
            F.concat(F.lit(prefix + ":"), F.col("source_id")).alias("source_id"),
            "content",
        )

    corpus = (
        _tag(gcc_docs, "g").unionByName(_tag(es_docs, "e")).unionByName(_tag(rust_docs, "r"))
    )
    corpus = corpus.repartition(spark.sparkContext.defaultParallelism).localCheckpoint(
        eager=True
    )
    corpus.count()

    def explicit():
        return (
            lf.fast_parse_df(corpus.filter(F.col("source_id").startswith("g:")), "gcc")
            .unionByName(lf.fast_parse_df(corpus.filter(F.col("source_id").startswith("e:")), "eslint"))
            .unionByName(lf.fast_parse_df(corpus.filter(F.col("source_id").startswith("r:")), "rustc"))
            .count()
        )

    def auto():
        return lf.fast_parse_auto_df(corpus).count()

    ex, au = [], []
    explicit(); auto()  # warm both
    for i in range(3):
        t0 = time.time(); explicit(); ex.append(time.time() - t0)
        t0 = time.time(); auto(); au.append(time.time() - t0)
    print(f"explicit: {['%.2f' % t for t in ex]}  min {min(ex):.2f}")
    print(f"auto    : {['%.2f' % t for t in au]}  min {min(au):.2f}")
    print(f"ratio(min): {min(au)/min(ex):.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
