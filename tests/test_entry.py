"""Driver-contract smoke tests: entry() runs, queries()/oracle_sql() are
consistent, every query executes at sf0.001 and returns a stable schema."""

from __future__ import annotations

import __spark_entry__ as entry_mod


def test_entry_runs(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns[0] == "l_returnflag"


def test_queries_have_oracles(spark):
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert len(qs) >= 30
    # every oracle key must be a query key
    assert set(oracles) <= set(qs)
    # the vast majority of queries must be oracle-checked (non-SQL ops exempt)
    assert len(oracles) >= len(qs) - 3


def test_all_queries_execute(spark, sf_dir):
    qs = entry_mod.queries()
    for name, fn in qs.items():
        df = fn(spark, sf_dir)
        assert df.columns, name
        df.limit(5).collect()  # executes the plan
