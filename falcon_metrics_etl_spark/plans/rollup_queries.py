"""Hypertable rollup + KMV sketch queries (operators/rollup.py)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.rollup import (
    hypertable_rollup,
    kmv_distinct,
)
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.sources import load_table

_DUCK_HASH_USER = (
    "(('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT)"
)
KMV_K = 64


@register(
    "hypertable_rollup_events",
    doc="Hypertable-style continuous aggregate (operators/rollup.py::"
    "hypertable_rollup): event counts + value sums per event_type at "
    "hour/day/week resolutions, stacked as (resolution, bucket_start, "
    "key) — the serving shape incremental runs MERGE into per bucket",
    tags=("rollup", "timeseries", "aggregate"),
    oracle="""
SELECT 'hour' AS resolution, date_trunc('hour', ts) AS bucket_start,
       event_type, COUNT(*) AS n_events,
       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0 AS total_value
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'day', date_trunc('day', ts), event_type, COUNT(*),
       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0
FROM events GROUP BY 2, 3
UNION ALL
SELECT 'week', date_trunc('week', ts), event_type, COUNT(*),
       SUM(CAST(round(value * 100) AS BIGINT)) / 100.0
FROM events GROUP BY 2, 3
""",
)
def hypertable_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return hypertable_rollup(
        ev,
        "ts",
        ["event_type"],
        {
            "n_events": F.count(F.lit(1)),
            "total_value": F.sum(F.round(F.col("value") * 100).cast("long")) / F.lit(100.0),
        },
        resolutions=("hour", "day", "week"),
    )


@register(
    "kmv_distinct_users",
    doc="KMV distinct-count sketch (operators/rollup.py::kmv_distinct): "
    f"{KMV_K} minimum portable-hash values per event_type estimate "
    "distinct users as (K-1)*2^60/h_K — reproducible across engines "
    "(the oracle computes the identical number), mergeable, ~12% error "
    "at K=64; exact below K distinct",
    tags=("sketch", "approx", "aggregate"),
    oracle=f"""
WITH hashed AS (
    SELECT DISTINCT event_type, {_DUCK_HASH_USER} AS h FROM events
),
ranked AS (
    SELECT event_type, h,
           ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rn
    FROM hashed
),
topk AS (
    SELECT event_type, COUNT(*) AS n, MAX(h) AS hk
    FROM ranked WHERE rn <= {KMV_K} GROUP BY event_type
)
SELECT event_type,
       CASE WHEN n < {KMV_K} THEN n
            ELSE CAST(FLOOR(({KMV_K - 1}.0 * 1152921504606846976.0) / hk)
                      AS BIGINT) END AS distinct_est
FROM topk
""",
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return kmv_distinct(ev, ["event_type"], "user_id", k=KMV_K)


@register(
    "kmv_set_ops_pairs",
    doc="Mergeable-sketch set algebra (operators/rollup.py::"
    f"kmv_pairwise_set_ops): per-event-type K={KMV_K} KMV sketches, "
    "then for every type pair the UNION estimate from the merged "
    "sketch (union hash sets, re-take K smallest) and the INTERSECTION "
    "via inclusion-exclusion clamped at 0 — the audience-overlap / "
    "cross-source-dedup shape where sketches combine without "
    "re-touching raw data; everything past the first dedup handles "
    "at most K rows per group",
    tags=("sketch", "approx", "merge", "aggregate"),
    oracle=f"""
WITH hashed AS (
    SELECT DISTINCT event_type AS g, {_DUCK_HASH_USER} AS h FROM events
),
ranked AS (
    SELECT g, h, ROW_NUMBER() OVER (PARTITION BY g ORDER BY h) AS rn
    FROM hashed
),
sketch AS (SELECT g, h FROM ranked WHERE rn <= {KMV_K}),
per_group AS (
    SELECT g, COUNT(*) AS n, MAX(h) AS hk FROM sketch GROUP BY g
),
est AS (
    SELECT g,
           CASE WHEN n < {KMV_K} THEN n
                ELSE CAST(FLOOR(({KMV_K - 1}.0 * 1152921504606846976.0) / hk)
                          AS BIGINT) END AS est
    FROM per_group
),
pairs AS (
    SELECT a.g AS ga, b.g AS gb, a.est AS est_a, b.est AS est_b
    FROM est a JOIN est b ON a.g < b.g
),
tagged AS (
    SELECT p.ga, p.gb, s.h FROM pairs p JOIN sketch s ON s.g = p.ga
    UNION
    SELECT p.ga, p.gb, s.h FROM pairs p JOIN sketch s ON s.g = p.gb
),
mranked AS (
    SELECT ga, gb, h,
           ROW_NUMBER() OVER (PARTITION BY ga, gb ORDER BY h) AS rn
    FROM tagged
),
magg AS (
    SELECT ga, gb, COUNT(*) AS n, MAX(h) AS hk
    FROM mranked WHERE rn <= {KMV_K} GROUP BY ga, gb
),
mest AS (
    SELECT ga, gb,
           CASE WHEN n < {KMV_K} THEN n
                ELSE CAST(FLOOR(({KMV_K - 1}.0 * 1152921504606846976.0) / hk)
                          AS BIGINT) END AS est_union
    FROM magg
)
SELECT p.ga AS group_a, p.gb AS group_b,
       p.est_a, p.est_b, m.est_union,
       GREATEST(p.est_a + p.est_b - m.est_union, 0) AS est_intersect
FROM pairs p JOIN mest m ON p.ga = m.ga AND p.gb = m.gb
""",
)
def kmv_set_ops_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.rollup import kmv_pairwise_set_ops

    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return kmv_pairwise_set_ops(ev, "event_type", "user_id", k=KMV_K)


HIST_BUCKET_WIDTH = 1000  # l_extendedprice spans ~900..105k
HIST_QS = (50, 90, 99)


@register(
    "histogram_quantiles_price",
    doc=f"Mergeable fixed-width histogram quantiles: bucket every "
    f"lineitem price into {HIST_BUCKET_WIDTH}-wide integer buckets, "
    "aggregate per-bucket counts per return flag, then read "
    f"p{HIST_QS[0]}/p{HIST_QS[1]}/p{HIST_QS[2]} as the lower bound of "
    "the first bucket whose cumulative count reaches ceil(q*N) — the "
    "Prometheus-histogram shape for percentiles at scale: per-partition "
    "histograms merge by adding counts (no raw-value shuffle), error "
    "bounded by bucket width; all arithmetic is integer-exact",
    tags=("sketch", "histogram", "percentile", "merge"),
    oracle=f"""
WITH b AS (
    SELECT l_returnflag,
           CAST(FLOOR(CAST(l_extendedprice AS DOUBLE) / {HIST_BUCKET_WIDTH})
                AS BIGINT) AS bucket
    FROM lineitem
),
h AS (
    SELECT l_returnflag, bucket, COUNT(*) AS n
    FROM b GROUP BY l_returnflag, bucket
),
c AS (
    SELECT l_returnflag, bucket, n,
           SUM(n) OVER (PARTITION BY l_returnflag ORDER BY bucket) AS cum,
           SUM(n) OVER (PARTITION BY l_returnflag) AS total
    FROM h
),
q AS (
    SELECT l_returnflag, qq.q,
           MIN(bucket * {HIST_BUCKET_WIDTH}) AS est
    FROM c CROSS JOIN (
        SELECT unnest([{", ".join(str(q) for q in HIST_QS)}]) AS q
    ) qq
    WHERE cum >= CAST(CEIL(qq.q * total / 100.0) AS BIGINT)
    GROUP BY l_returnflag, qq.q
)
SELECT l_returnflag, CAST(q AS INT) AS q, CAST(est AS BIGINT) AS est
FROM q
""",
)
def histogram_quantiles_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice"
    )
    from pyspark.sql import Window

    b = li.select(
        "l_returnflag",
        F.floor(
            F.col("l_extendedprice").cast("double") / F.lit(HIST_BUCKET_WIDTH)
        )
        .cast("long")
        .alias("bucket"),
    )
    h = b.groupBy("l_returnflag", "bucket").agg(F.count(F.lit(1)).alias("n"))
    wcum = (
        Window.partitionBy("l_returnflag")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wtot = Window.partitionBy("l_returnflag")
    c = h.withColumn("cum", F.sum("n").over(wcum)).withColumn(
        "total", F.sum("n").over(wtot)
    )
    qs = spark.range(1).select(
        F.explode(F.array(*[F.lit(q) for q in HIST_QS])).alias("q")
    )
    return (
        c.join(F.broadcast(qs))
        .filter(
            F.col("cum")
            >= F.ceil(F.col("q") * F.col("total") / F.lit(100.0)).cast("long")
        )
        .groupBy("l_returnflag", "q")
        .agg(F.min(F.col("bucket") * F.lit(HIST_BUCKET_WIDTH)).alias("est"))
        .select(
            "l_returnflag",
            F.col("q").cast("int").alias("q"),
            F.col("est").cast("long").alias("est"),
        )
    )


@register(
    "cube_orders_priority_status",
    doc="Full CUBE over (priority, status): every grouping combination "
    "incl. grand total in ONE scan + one shuffle (Expand feeds the "
    "aggregate 4 grouping projections; grouping_id disambiguates the "
    "NULL-as-total rows from genuine NULLs) — the §2.4 OLAP-cube "
    "complement to the GROUPING SETS rollup",
    tags=("aggregate", "cube", "grouping-sets"),
    oracle="""
SELECT o_orderpriority AS priority, o_orderstatus AS status,
       GROUPING(o_orderpriority, o_orderstatus) AS gid,
       COUNT(*) AS n_orders,
       SUM(CAST(round(o_totalprice * 100) AS BIGINT)) / 100.0 AS total_price
FROM orders
GROUP BY CUBE (o_orderpriority, o_orderstatus)
""",
)
def cube_orders_priority_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube(
            F.col("o_orderpriority").alias("priority"),
            F.col("o_orderstatus").alias("status"),
        )
        .agg(
            F.grouping_id().alias("gid"),
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
                / F.lit(100.0)
            ).alias("total_price"),
        )
        .select("priority", "status", F.col("gid").cast("long").alias("gid"),
                "n_orders", "total_price")
    )
