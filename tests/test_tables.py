"""Session-conf discipline of the table readers (sources/tables.py):
UTC verification and table caching are per-SparkSession, not
per-applicationId (ADVICE: newSession() shares an applicationId but
carries its own SQL confs)."""

from __future__ import annotations

from falcon_metrics_etl_spark.sources.tables import (
    ensure_session_confs,
    load_table,
)


def test_new_session_is_verified_independently(spark, sf_smoke):
    ensure_session_confs(spark)  # parent verified (UTC fixture session)
    sibling = spark.newSession()
    sibling.conf.set("spark.sql.session.timeZone", "America/New_York")
    # same applicationId, different session: memoizing on applicationId
    # would SKIP conf application here and leave the sibling non-UTC,
    # silently shifting NTZ instants. Per-session keying re-applies the
    # confs (forcing UTC) before any read.
    assert load_table(sibling, sf_smoke, "region").count() > 0
    assert sibling.conf.get("spark.sql.session.timeZone") == "UTC"


def test_table_cache_is_per_session(spark, sf_smoke):
    a = load_table(spark, sf_smoke, "region")
    assert load_table(spark, sf_smoke, "region") is a  # cached
    sibling = spark.newSession()
    sibling.conf.set("spark.sql.session.timeZone", "UTC")
    b = load_table(sibling, sf_smoke, "region")
    assert b is not a  # session B never receives session-A-bound plans
