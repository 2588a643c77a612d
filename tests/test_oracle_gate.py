"""The driver's t2 correctness gate as a pytest: EVERY registered query
runs on Spark AND its DuckDB oracle at sf0.001, comparing row count,
column set, and the order-insensitive normalized value multiset.

This makes `pytest` itself carry the oracle-equivalence signal for
queries the driver's 50-per-round sample has not yet reached (the
driver rotates; see SELFCHECK_r3_*.json for the sf0.01/sf0.1 runs of
the same check). sf0.001 keeps the whole sweep to a few minutes.
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
from falcon_metrics_etl_spark.sources.tables import TABLES  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# normalization helpers shared with scripts/selfcheck.py
_spec = importlib.util.spec_from_file_location(
    "selfcheck", ROOT / "scripts" / "selfcheck.py"
)
_selfcheck = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_selfcheck)
frame_multiset = _selfcheck.frame_multiset

_QUERIES = all_queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, spark, duck):
    q = _QUERIES[name]
    sdf = q.spark(spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns
    if q.oracle is None:
        pytest.skip("rows-only query (no SQL oracle)")
    ores = duck.execute(q.oracle)
    ocols = [d[0] for d in ores.description]
    orows = ores.fetchall()

    assert len(srows) == len(orows), f"row count {len(srows)} vs {len(orows)}"
    assert sorted(scols) == sorted(ocols)
    sm, om = frame_multiset(scols, srows), frame_multiset(ocols, orows)
    diffs = [(a, b) for a, b in zip(sm, om) if a != b][:3]
    assert sm == om, f"value multiset differs; first diffs: {diffs}"
