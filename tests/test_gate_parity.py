"""Differential test: every gate query with an oracle must match DuckDB
on the driver's sf0.001 tables (fast loop; the driver re-runs at sf0.01)."""

from __future__ import annotations

import pytest

import os

from blq_cli_spark.gates import oracles, queries
from tests.conftest import SF_SMOKE
from tests.oracle import run_gate

GATE_NAMES = sorted(queries().keys())
# override with BLQ_PARITY_SF=/root/testdata/sf0.01 for driver-scale checks
PARITY_SF = os.environ.get("BLQ_PARITY_SF", SF_SMOKE)


@pytest.mark.parametrize("name", GATE_NAMES)
def test_gate_matches_oracle(spark, name):
    problems = run_gate(spark, name, PARITY_SF)
    assert not problems, f"{name}: " + "; ".join(problems)


def test_every_oracle_has_query():
    assert set(oracles().keys()) <= set(queries().keys())


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
