"""Profile fast_parse_auto_df stage-by-stage on the x_parse_auto bench
corpus (round 9, VERDICT ask #1). Run: python scripts/profile_auto.py"""
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
    from blq_cli_spark.sources import logparse as lp

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
    n_docs = corpus.count()
    print(f"corpus: {n_docs} docs")

    def t(label, fn, reps=2):
        best = None
        for _ in range(reps):
            t0 = time.time()
            fn()
            el = time.time() - t0
            best = el if best is None else min(best, el)
        print(f"{label:32s} {best:6.2f} s")
        return best

    # warm
    corpus.count()

    # 1. explicit path (one format over its slice x3 — what the suite does)
    t("explicit x3 fast_parse_df", lambda: (
        lf.fast_parse_df(corpus.filter(F.col("source_id").startswith("g:")), "gcc")
        .unionByName(lf.fast_parse_df(corpus.filter(F.col("source_id").startswith("e:")), "eslint"))
        .unionByName(lf.fast_parse_df(corpus.filter(F.col("source_id").startswith("r:")), "rustc"))
        .count()
    ))

    # 2. presence agg alone
    content = F.coalesce(F.col("content"), F.lit(""))
    cand = lf._auto_candidate_exprs(content)
    t("presence agg", lambda: corpus.agg(
        *[F.max(c.cast("int")).alias(f) for f, c in cand.items()]
    ).collect())

    present_row = corpus.agg(
        *[F.max(c.cast("int")).alias(f) for f, c in cand.items()]
    ).collect()[0]
    present = [f for f in cand if present_row[f]]
    per_line = [f for f in present if f not in lf._DF_BUILDERS]
    builders = [f for f in present if f in lf._DF_BUILDERS]
    print(f"present ({len(present)}): {present}")
    print(f"  per_line ({len(per_line)}): {per_line}")
    print(f"  builders ({len(builders)}): {builders}")

    # 3. per-line chain alone (no windows): explode count
    def chain_only():
        staged = lf._lines(corpus, "source_id", "content")
        tagged = []
        for fmt in per_line:
            staged, rules = lf.FAST_FORMATS[fmt](staged)
            tagged += [(fmt, c, e) for c, e in rules]
        staged, g_rules = lf._r_generic(staged)
        tagged += [("generic", c, e) for c, e in g_rules]
        lf._explode_tagged(staged, tagged).count()

    t("per-line chain (no windows)", chain_only)

    # 4. builder branches alone
    def builders_only():
        n = 0
        for fmt in builders:
            sub_lines = lf._lines(corpus.filter(cand[fmt]), "source_id", "content")
            n += lf._events_for(sub_lines, fmt).count()
        return n

    if builders:
        t("builder branches", builders_only)

    # 5. full auto
    t("full fast_parse_auto_df", lambda: lf.fast_parse_auto_df(corpus).count())

    # NOTE (round 11): fast_parse_auto_df now FUSES the census with the
    # parse scan (one checkpointed pass; flags rebuild from per-doc
    # pack bits). The split below still measures the stages in their
    # round-10 standalone shapes — useful for attributing cost, but
    # "1 presence census" is no longer a separate corpus scan in the
    # real pipeline.
    # 6. cumulative stage split of the REAL auto pipeline (round 10,
    # VERDICT r9 ask #3): each step adds one stage of
    # fast_parse_auto_df; differences between consecutive steps are the
    # per-stage costs (census / gated rule pass / builders / routing
    # windows / event_index assembly).
    print("\n-- cumulative stage split (gated pipeline) --")
    prog = lf._PRESENCE_CACHE.get("content") or lf._auto_presence_program(content)
    atom_names, packs, preds = prog[0], prog[1], prog[2]

    def census():
        corpus.select(*packs).agg(
            *[F.bit_or(F.col(f"_pack{k}")).alias(f"_pack{k}") for k in range(len(packs))]
        ).collect()

    t1 = t("1 presence census", census)

    flag = {f: f"_cand_{f}" for f in present}

    def gated_chain(stop_after):
        df2 = corpus.select(
            F.col("source_id"),
            F.col("content"),
            *[cand[f].alias(flag[f]) for f in present],
        ).repartition(F.col("source_id"))
        lines0 = lf._lines_flagged(df2, "source_id", "content", [flag[f] for f in present])
        pend_all, tagged = [], []
        for fmt in per_line:
            pend, rules = lf._format_plan(fmt, flag[fmt])
            pend_all += pend
            tagged += [(fmt, c, e) for c, e in rules]
        g_pend, g_rules = lf._format_plan("generic", None)
        pend_all += g_pend
        tagged += [("generic", c, e) for c, e in g_rules]
        staged = lf._apply_staging(lines0, pend_all)
        ev = lf._explode_tagged(staged, tagged)
        if stop_after == "rules":
            return ev.count()
        parts = [ev.withColumnRenamed("format_used", "_fmt")]
        if builders:
            any_b = F.lit(False)
            for f in builders:
                any_b = any_b | F.col(flag[f])
            b_lines = lf._lines_flagged(
                df2.filter(any_b), "source_id", "content", [flag[f] for f in builders]
            )
            for fmt in builders:
                sub = b_lines.filter(F.col(flag[fmt])).select(
                    "source_id", "line_no", "line"
                )
                parts.append(lf._events_for(sub, fmt).withColumn("_fmt", F.lit(fmt)))
        allev = parts[0]
        for p in parts[1:]:
            allev = allev.unionByName(p)
        if len(parts) > 1:
            allev = allev.repartition(F.col("source_id"))
        return allev.count()

    t2 = t("2 + gated per-line rules", lambda: census() or gated_chain("rules"))
    t3 = t("3 + builder branches", lambda: census() or gated_chain("all"))
    t5 = t("5 full (routing+assembly)", lambda: lf.fast_parse_auto_df(corpus).count())
    print("\n-- decomposition (min-of-2 deltas; negatives = noise) --")
    print(f"presence census      {t1:6.2f} s")
    print(f"gated rule pass      {t2 - t1:6.2f} s")
    print(f"builder branches     {t3 - t2:6.2f} s")
    print(f"routing + assembly   {t5 - t3:6.2f} s")

    spark.stop()


if __name__ == "__main__":
    main()
