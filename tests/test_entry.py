"""Driver-contract smoke tests: entry() runs, every query runs at
sf0.001 with stable schema, every oracle key exists in queries()."""

import __spark_entry__ as entry_mod


def test_entry_returns_rows(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0


def test_all_queries_run_smoke(spark, sf_smoke):
    qs = entry_mod.queries()
    assert len(qs) >= 20
    for name, fn in qs.items():
        df = fn(spark, sf_smoke)
        assert df.columns, name
        assert df.count() >= 0, name


def test_oracle_keys_subset_of_queries():
    qs = entry_mod.queries()
    for name in entry_mod.oracle_sql():
        assert name in qs
