"""Driver contract: entry() smoke + queries()/oracle_sql() consistency.

The full DuckDB comparison runs via tools/check_oracle.py; here we keep the
cheap structural guarantees inside `pytest -x -q`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_queries_and_oracles_align():
    qs = E.queries()
    oracles = E.oracle_sql()
    assert qs, "no queries registered"
    unknown = set(oracles) - set(qs)
    assert not unknown, f"oracle without query: {unknown}"


def test_each_query_runs_smoke(spark):
    for name, fn in E.queries().items():
        df = fn(spark, SF)
        assert df.columns, name
        df.limit(1).collect()


def test_entry_smoke(spark):
    df = E.entry(spark)
    assert df.count() > 0
    assert set(["record_id", "url", "cluster_id"]) <= set(df.columns)
