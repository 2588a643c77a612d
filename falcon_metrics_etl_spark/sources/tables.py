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
_NANO_TS_COLUMNS = {
    "orders": ("o_orderdate",),
    "lineitem": ("l_shipdate",),
    "events": ("ts",),
}


# (applicationId, sf_dir, name) -> reader DataFrame. A DataFrame is an
# immutable logical plan, so reusing it skips the per-call file listing
# + parquet footer probe (~140 ms each) without changing semantics;
# keying on applicationId drops entries when the session is rebuilt.
_TABLE_CACHE: dict[tuple[str, str, str], DataFrame] = {}

# applicationIds whose session confs were already applied + verified
_CONFED_APPS: set[str] = set()


def ensure_session_confs(spark: SparkSession) -> None:
    """Apply runtime-settable SQL confs to an externally-built session.

    The driver calls ``entry(spark)`` with its own session; these confs
    (nanos-as-long, UTC, AQE, Arrow) are all SQL confs, so setting them
    here is safe and effective for subsequent reads.
    """
    app_id = spark.sparkContext.applicationId
    if app_id in _CONFED_APPS:
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
    _CONFED_APPS.add(app_id)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one testdata table, normalizing nano-timestamps to TimestampType."""
    ensure_session_confs(spark)
    cache_key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _TABLE_CACHE.get(cache_key)
    if cached is not None:
        return cached
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    dtypes = dict(df.dtypes)
    for col in _NANO_TS_COLUMNS.get(name, ()):
        if dtypes.get(col) == "bigint":
            # integer div truncates sub-microsecond nanos, same as DuckDB
            df = df.withColumn(col, F.expr(f"timestamp_micros({col} div 1000)"))
    for col, dtype in dtypes.items():
        if dtype == "timestamp_ntz":
            # wall-clock micros; session tz is UTC so the instant is unchanged
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    _TABLE_CACHE[cache_key] = df
    return df


def register_views(spark: SparkSession, sf_dir: str, tables=TABLES) -> None:
    """Register each table as a temp view for the SQL API."""
    for name in tables:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
