"""Readers for the driver-generated lakehouse tables.

The testdata parquet has carried timestamps two ways across driver
versions: INT64 TIMESTAMP(NANOS) (readable as long nanos with
``spark.sql.legacy.parquet.nanosAsLong=true``) and plain
``timestamp[us]`` without timezone (read as TIMESTAMP_NTZ). We
normalize both to session-UTC TimestampType so downstream
``unix_micros``/window math type-checks, and so values line up
exactly with DuckDB's TIMESTAMP in the oracle comparison.

At 100 TB these readers stay valid: ``spark.read.parquet`` gives
Catalyst filter pushdown + column pruning + partition pruning for
free; nothing here collects to the driver.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.session import RUNTIME_CONFS

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# columns that may arrive as INT64 nanos (bigint under nanosAsLong);
# this dict drives ONLY the bigint-nanos path — NTZ normalization is
# schema-driven over all columns in load_table
_BIGINT_NANO_COLUMNS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


# Per-SparkSession state, stored ON the session object itself so its
# lifetime is exactly the session's. SQL confs (and therefore the UTC
# verification) are per-SESSION, not per-context: two sessions from
# newSession() share an applicationId but each carries its own timeZone
# conf, so memoizing on applicationId alone would let an unverified
# session skip the UTC assert and receive DataFrames bound to a sibling
# session. (A module-global WeakKeyDictionary would NOT work here: the
# cached DataFrames reference their session, so the value dict keeps
# the weak key alive forever and dropped sessions leak.)
# Value shape: {"confed": bool, "tables": {(sf_dir, name): DataFrame}}.
# Caching the reader DataFrame (an immutable logical plan) skips the
# per-call file listing + parquet footer probe (~140 ms each).
_STATE_ATTR = "_falcon_metrics_session_state"


def _session_state(spark: SparkSession) -> dict:
    state = getattr(spark, _STATE_ATTR, None)
    if state is None:
        state = {"confed": False, "tables": {}}
        setattr(spark, _STATE_ATTR, state)
    return state


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply runtime-settable SQL confs to an externally-built session.

    The driver calls ``entry(spark)`` with its own session; these confs
    (nanos-as-long, UTC, AQE, Arrow) are all SQL confs, so setting them
    here is safe and effective for subsequent reads. Verified once per
    SparkSession object (not per applicationId — see _SESSION_STATE).
    """
    state = _session_state(spark)
    if state["confed"]:
        return
    for key, value in RUNTIME_CONFS.items():
        try:
            spark.conf.set(key, value)
        except Exception:
            pass  # non-runtime conf on some builds: keep going
    # NTZ->timestamp normalization in load_table is only instant-preserving
    # under a UTC session zone; fail loudly rather than silently shift
    tz = spark.conf.get("spark.sql.session.timeZone")
    if tz != "UTC":
        raise RuntimeError(
            f"spark.sql.session.timeZone={tz!r}; this engine requires UTC "
            "(NTZ timestamp normalization would shift instants otherwise)"
        )
    state["confed"] = True


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing nano-timestamps to TimestampType."""
    ensure_session_confs(spark)
    tables = _session_state(spark)["tables"]
    cached = tables.get((sf_dir, name))
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for col in _BIGINT_NANO_COLUMNS.get(name, ()):
        if dtypes.get(col) == "bigint":
            # integer div truncates sub-microsecond nanos, same as DuckDB
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    for col, dtype in dtypes.items():
        if dtype == "timestamp_ntz":
            # wall-clock micros; session tz is UTC so the instant is unchanged
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    tables[(sf_dir, name)] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view for the SQL API."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
