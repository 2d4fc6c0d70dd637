"""Stage-split of the EXPLICIT fast_parse_df path on the x_parse_suite
corpus (round-10 optimization): doc assembly / line explode / fmt rules
only / fmt+generic rules / full parse incl. windows. All timings use the
noop sink (guide 1.4) and min-of-N interleaved passes.

Run: python scripts/profile_explicit.py [passes]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    passes = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    from blq_cli_spark.session import get_spark

    spark = get_spark(
        app_name="profile-explicit",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from blq_cli_spark.gates import parsing
    from blq_cli_spark.sources import logparse_fast as lf

    ev = parsing._events(spark, SF_DIR)
    fams = dict(zip(["gcc", "eslint", "rustc"], parsing._family_docs(ev)))

    stages = {}

    def add(name, thunk):
        stages[name] = thunk

    for fam, docs in fams.items():
        add(f"{fam}:docs", lambda d=docs: _noop(d))
        lines = lf._lines(docs, "source_id", "content")
        add(f"{fam}:lines", lambda l=lines: _noop(l))
        if fam != "rustc":
            evf = lf._events_for(lines, fam)
            add(f"{fam}:fmt_rules_only", lambda e=evf: _noop(e))
            g_pend, g_rules = lf._format_plan("generic", None)
            pend, rules = lf._format_plan(fam, None)
            staged = lf._apply_staging(lines, pend + g_pend)
            both = lf._explode_tagged(
                staged,
                [(fam, c, e) for c, e in rules]
                + [("generic", c, e) for c, e in g_rules],
            )
            add(f"{fam}:fmt+generic_rules", lambda e=both: _noop(e))
        else:
            evf = lf._events_for(lines, fam)
            add(f"{fam}:builder_only", lambda e=evf: _noop(e))
        full = lf.fast_parse_df(docs, fam)
        add(f"{fam}:full_parse", lambda e=full: _noop(e))

    results = {k: [] for k in stages}
    for p in range(passes):
        for name, thunk in stages.items():
            spark.sparkContext.setJobDescription(name)
            t0 = time.perf_counter()
            thunk()
            results[name].append(time.perf_counter() - t0)
    for name, ts in results.items():
        print(f"{name:28s} min={min(ts):6.3f}  all={[round(t,3) for t in ts]}")
    spark.stop()


if __name__ == "__main__":
    main()
