#!/usr/bin/env python
"""Scaling probe: time headline operators across the three driver scale
factors (sf0.001 / sf0.01 / sf0.1 — 100x data growth) and print the
wall-clock curve. Near-flat-then-linear curves back the 100 TB design
claims; a super-linear jump flags a quadratic hiding somewhere.

Run from the repo root: python scripts/scaling_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

PROBES = [
    "q1_pricing_summary",
    "q3_top_unshipped_orders",
    "x_exact_dedup",
    "x_minhash_lsh_candidates",
    "x_embedding_neardup",
    "x_lsh_ann",
    "ts_tumbling_window",
    "w_analytics_suite",
    "x_term_search",
    "a_corr_stats",
    "a_unpivot_metrics",
    "x_repetition_profile",
    "x_decontaminate",
    "x_dedup_clusters",
    "x_quantized_embeddings",
    "x_source_mix",
    "q19_brand_size_quantity",
    "x_unigram_logprob",
    "x_source_kl",
    "x_winnow_tokens",
    "ts_funnel_conversion",
    "ts_cohort_retention",
    "ts_anomaly_days",
    "ts_error_streaks",
]

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1"]


def main() -> None:
    from blq_cli_spark.gates import queries
    from blq_cli_spark.session import get_spark

    spark = get_spark(app_name="scaling-probe")
    qs = queries()
    # warm codegen + python workers on the smallest sf (steady-state is
    # what scales; compile cost amortizes to zero on a real cluster)
    for name in PROBES:
        qs[name](spark, SFS[0]).count()

    print(f"{'gate':32s} " + " ".join(f"{sf.split('/')[-1]:>9s}" for sf in SFS) + "   x0.01->x0.1")
    for name in PROBES:
        times = []
        for sf in SFS:
            best = min(
                _time_once(qs[name], spark, sf) for _ in range(2)
            )
            times.append(best)
        ratio = times[2] / max(times[1], 1e-9)
        print(
            f"{name:32s} " + " ".join(f"{t:8.3f}s" for t in times) + f"   {ratio:6.2f}x"
        )
    spark.stop()


def _time_once(fn, spark, sf) -> float:
    t0 = time.perf_counter()
    fn(spark, sf).count()
    return time.perf_counter() - t0


if __name__ == "__main__":
    main()
