"""Value oracles for driver rows retired from the 50-entry contract budget
(the F12 precedent: a retired row keeps its exact Spark-vs-DuckDB value pin
here, so the evidence never weakens — only the driver slot is reassigned).

Round 5 retirements: a9_collect_set (slot → decontam) and
w5_deterministic_sample (slot → stratified_sample).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import __spark_entry__ as entrymod
from tools.parity import compare, duck_connect

from conftest import SF_DIR


def _pin(spark, fn, sql):
    got = fn(spark, SF_DIR).toPandas()
    con = duck_connect(SF_DIR)
    try:
        want = con.execute(sql).fetchdf()
    finally:
        con.close()
    return got, want


def test_a9_collect_set_value_oracle(spark):
    got, want = _pin(spark, entrymod._q_a9_collect_set, entrymod.A9_ORACLE_SQL)
    assert len(got) > 0
    errs = compare("a9_collect_set", got, want)
    assert not errs, errs


def test_w5_deterministic_sample_value_oracle(spark):
    got, want = _pin(
        spark, entrymod._q_w5_deterministic_sample, entrymod.W5_ORACLE_SQL
    )
    assert len(got) == 100
    errs = compare("w5_deterministic_sample", got, want)
    assert not errs, errs
