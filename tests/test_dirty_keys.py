"""NULL-key / duplicate-key semantics of referential_integrity_audit.

TPC-H primary keys are never null, so the driver's oracle gate cannot
distinguish sum(nf - 1) from the oracle's COUNT(*) - COUNT(DISTINCT)
on the shared NULL group (COUNT DISTINCT skips NULLs, so EVERY
null-key row is a violation, not n - 1). r9 advisor finding — this
fixture makes the divergence observable: 3 NULL o_orderkey rows plus
2 duplicated real keys, engine vs DuckDB oracle on the same files.
"""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import duckdb
import pytest

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from falcon_metrics_etl_spark.plans.registry import all_queries  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"
_TABLES = ("lineitem", "orders", "customer", "part", "nation")


@pytest.fixture(scope="module")
def dirty_dir(tmp_path_factory):
    out = tmp_path_factory.mktemp("dirty_sf")
    con = duckdb.connect()
    for t in _TABLES:
        if t == "orders":
            continue
        con.execute(
            f"COPY (SELECT * FROM '{SF_DIR}/{t}.parquet') "
            f"TO '{out}/{t}.parquet' (FORMAT PARQUET)"
        )
    # 3 NULL primary keys (deterministic pick) + 2 duplicated real keys
    con.execute(
        f"""
        COPY (
            SELECT * REPLACE (
                CASE WHEN o_orderkey IN (
                    SELECT o_orderkey FROM '{SF_DIR}/orders.parquet'
                    ORDER BY o_orderkey LIMIT 3
                ) THEN NULL ELSE o_orderkey END AS o_orderkey)
            FROM '{SF_DIR}/orders.parquet'
            UNION ALL
            SELECT * FROM (
                SELECT * FROM '{SF_DIR}/orders.parquet'
                ORDER BY o_orderkey DESC LIMIT 2)
        ) TO '{out}/orders.parquet' (FORMAT PARQUET)
        """
    )
    con.close()
    return str(out)


def test_null_and_dup_keys_match_oracle(spark, dirty_dir):
    q = all_queries()["referential_integrity_audit"]
    got = {
        (r.check_type, r.check_name, r.n_rows, r.n_violations)
        for r in q.spark(spark, dirty_dir).collect()
    }
    con = duckdb.connect()
    for t in _TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{dirty_dir}/{t}.parquet'"
        )
    want = {tuple(r) for r in con.execute(q.oracle).fetchall()}
    con.close()
    assert got == want
    # the dirt is actually observable: 3 null-key rows + 2 dups = 5
    uniq = {r for r in got if r[:2] == ("unique", "orders.o_orderkey")}
    assert uniq == {("unique", "orders.o_orderkey", len_orders(dirty_dir), 5)}


def len_orders(dirty_dir: str) -> int:
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{dirty_dir}/orders.parquet'"
    ).fetchone()[0]
    con.close()
    return n
