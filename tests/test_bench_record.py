"""The bench stdout record must survive the driver's bounded tail
capture (round 9, VERDICT r8 ask #8): no per-query maps on the line,
length asserted far below the ~2000-char window even for a suite twice
today's size."""

import json

import bench


def _fake_full_record(n_queries: int) -> dict:
    qnames = [f"x_query_with_a_long_name_{i:02d}" for i in range(n_queries)]
    qmap = {n: 12.345 for n in qnames}
    return {
        "metric": "headline_suite_wall_clock",
        "value": 123.456,
        "unit": "sec",
        "queries": dict(qmap),
        "sf": 0.1,
        "calib_ms": 55.5,
        "calib_ref_ms": 50.9,
        "value_calib_normalized": 113.2,
        "comparable_18_calib_normalized": 7.123,
        "bench_passes": 2,
        "queries_min": dict(qmap),
        "variance_pct": {n: 12.3 for n in qnames},
        "shuffle_calib_s": 1.234,
        "shuffle_ref_s": 1.111,
        "queries_shuffle_normalized": dict(qmap),
        "comparable_18_shuffle_normalized": 6.654,
        "anchor_ratio_vs_r2": {n: 1.01 for n in qnames},
        "anchor_ratio_median": 0.93,
        "anchor_ratio_worst": 1.15,
        "anchor_ratio_vs_r7": {n: 1.0 for n in qnames},
        "anchor_ratio_vs_r7_median": 0.96,
        "anchor_ratio_vs_r7_worst": 1.23,
    }


def test_compact_record_fits_tail_window():
    for n in (26, 60):  # today's suite and ~2x growth
        compact = bench._compact_record(_fake_full_record(n), "/x/bench_full.json")
        line = json.dumps(compact)
        assert len(line) < 1500, (n, len(line))
        # no per-query map survives on the line
        assert not any(isinstance(v, dict) for v in compact.values())
        # the scalars the judge compares rounds on are all present
        for key in (
            "metric", "value", "unit", "sf", "bench_passes",
            "value_calib_normalized", "comparable_18_calib_normalized",
            "comparable_18_shuffle_normalized", "anchor_ratio_median",
            "anchor_ratio_worst", "anchor_ratio_vs_r7_median",
            "anchor_ratio_vs_r7_worst", "full_record", "n_queries",
        ):
            assert key in compact, key
        assert compact["n_queries"] == n
        assert compact["full_record"] == "bench_full.json"
