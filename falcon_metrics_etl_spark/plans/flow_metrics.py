"""Flow-metric queries (SURVEY.md A1, A3-A7) mapped onto the driver's
synthetic tables per FIXTURES.md section 4:

- ``orders``   -> work-item head: o_orderdate = commitment date,
                  o_orderpriority = class of service,
                  o_orderstatus = current state.
- ``lineitem`` -> snapshots/revisions grain: l_shipdate = departure
                  (event) date, l_returnflag = state,
                  l_linestatus F/O = completed/in-progress.

Each query registers a Spark plan and a DuckDB oracle with identical
column names and deterministic value semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.cfd import cumulative_flow
from falcon_metrics_etl_spark.operators.metrics import (
    arrival_rate_quantiles,
    class_of_service_share,
    profile_of_work,
    throughput,
)
from falcon_metrics_etl_spark.plans.registry import register
from falcon_metrics_etl_spark.session import perf_checkpoint
from falcon_metrics_etl_spark.sources import load_table

WIP_AS_OF_DATE = "1998-06-01"  # mid-range of o_orderdate (1995..2001)


# --------------------------------------------------------------------------
# A1 — cumulative flow diagram (flagship)
# --------------------------------------------------------------------------
_CFD_ORACLE = """
WITH completed_daily AS (
    SELECT l_returnflag AS state,
           CAST(l_shipdate AS DATE) AS snapshot_date,
           COUNT(*) AS daily_count
    FROM lineitem
    WHERE l_linestatus = 'F'
    GROUP BY 1, 2
),
completed AS (
    SELECT state, snapshot_date, 'completed' AS state_category,
           CAST(SUM(daily_count) OVER (
               PARTITION BY state ORDER BY snapshot_date
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS item_count
    FROM completed_daily
),
inprogress AS (
    SELECT l_returnflag AS state,
           CAST(l_shipdate AS DATE) AS snapshot_date,
           'inprogress' AS state_category,
           COUNT(*) AS item_count
    FROM lineitem
    WHERE l_linestatus = 'O'
    GROUP BY 1, 2, 3
)
SELECT * FROM completed
UNION ALL
SELECT * FROM inprogress
"""


@register(
    "cfd",
    doc="A1 CFD: completed branch cumulative count per (state, day) union "
    "in-progress plain count; reference aurora/ddl/calculate_cfd.sql:18-70",
    tags=("aggregate", "window", "union"),
    oracle=_CFD_ORACLE,
)
def cfd(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    snapshots = lineitem.select(
        F.col("l_returnflag").alias("state"),
        F.col("l_shipdate").alias("snapshot_date"),
        # raw status code as the category: the branch filters stay
        # plain EqualTo predicates the parquet scan accepts
        F.col("l_linestatus").alias("state_category"),
    )
    return cumulative_flow(
        snapshots,
        completed_value="F",
        inprogress_value="O",
        completed_label="completed",
        inprogress_label="inprogress",
    )


# --------------------------------------------------------------------------
# A7 — lead time percentiles per class of service
# --------------------------------------------------------------------------
@register(
    "lead_time_by_priority",
    doc="A7 lead time p85/avg: days from commitment (o_orderdate) to "
    "departure (l_shipdate) per o_orderpriority; broadcast-joinable dim side",
    tags=("join", "aggregate", "percentile"),
    oracle=f"""
SELECT o.o_orderpriority AS class_of_service,
       percentile_disc(0.85) WITHIN GROUP (ORDER BY datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) AS lead_time_p85,
       ROUND(CAST(SUM(datediff('day', CAST(o.o_orderdate AS DATE), CAST(l.l_shipdate AS DATE))) AS DOUBLE) / COUNT(*), 2) AS lead_time_avg,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
""",
)
def lead_time_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("class_of_service"),
        F.col("o_orderdate").alias("commitment_date"),
    )
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").alias("departure_date")
    )
    items = lineitem.join(orders, lineitem.l_orderkey == orders.o_orderkey)
    lead = F.datediff(F.col("departure_date"), F.col("commitment_date"))
    departed = items.withColumn("lead_time_days", lead)
    from falcon_metrics_etl_spark.operators.metrics import percentile_disc

    return departed.groupBy("class_of_service").agg(
        percentile_disc("lead_time_days", 0.85).alias("lead_time_p85"),
        F.round(
            F.sum("lead_time_days").cast("double") / F.count(F.lit(1)), 2
        ).alias("lead_time_avg"),
        F.count(F.lit(1)).alias("n_items"),
    )


# --------------------------------------------------------------------------
# A7 — throughput per week per state
# --------------------------------------------------------------------------
@register(
    "throughput_weekly",
    doc="A7 throughput: departures per week per state over snapshots",
    tags=("aggregate",),
    oracle="""
SELECT l_returnflag AS state,
       CAST(date_trunc('week', l_shipdate) AS DATE) AS bucket,
       COUNT(*) AS throughput
FROM lineitem
WHERE l_shipdate IS NOT NULL
GROUP BY 1, 2
""",
)
def throughput_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("state"),
        F.col("l_shipdate").alias("departure_date"),
    )
    return throughput(lineitem, ["state"], grain="week")


# --------------------------------------------------------------------------
# A3 — productivity quantiles of weekly arrivals
# --------------------------------------------------------------------------
@register(
    "arrival_quantiles",
    doc="A3 productivity quantiles: min + quartiles of weekly new-item "
    "(order) counts; two-level aggregation",
    tags=("aggregate", "percentile"),
    oracle="""
WITH weekly AS (
    SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS week,
           COUNT(*) AS weekly_count
    FROM orders
    GROUP BY 1
)
SELECT MIN(weekly_count) AS min_weekly,
       percentile_disc(0.25) WITHIN GROUP (ORDER BY weekly_count) AS q1,
       percentile_disc(0.50) WITHIN GROUP (ORDER BY weekly_count) AS q2,
       percentile_disc(0.75) WITHIN GROUP (ORDER BY weekly_count) AS q3
FROM weekly
""",
)
def arrival_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderdate").alias("arrival_date")
    )
    return arrival_rate_quantiles(orders)


# --------------------------------------------------------------------------
# A4 — class-of-service distribution / expedite share
# --------------------------------------------------------------------------
@register(
    "class_of_service_share",
    doc="A4 class-of-service distribution -> percentage share "
    "(expedite%% = the 1-URGENT row)",
    tags=("aggregate", "window"),
    oracle="""
WITH counts AS (
    SELECT o_orderpriority AS class_of_service, COUNT(*) AS n
    FROM orders GROUP BY 1
)
SELECT class_of_service, n,
       ROUND(n * 100.0 / SUM(n) OVER (), 2) AS pct
FROM counts
""",
)
def cos_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return class_of_service_share(orders, "o_orderpriority")


# --------------------------------------------------------------------------
# A5 — profile of work percentages
# --------------------------------------------------------------------------
@register(
    "profile_of_work",
    doc="A5 profile-of-work: per-tag value shares rounded to 2dp",
    tags=("aggregate", "window"),
    oracle="""
WITH counts AS (
    SELECT o_orderstatus AS tag, o_orderpriority AS key, COUNT(*) AS n
    FROM orders GROUP BY 1, 2
)
SELECT tag, key,
       ROUND(n * 100.0 / SUM(n) OVER (PARTITION BY tag), 2) AS pct
FROM counts
""",
)
def profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    return profile_of_work(orders, "o_orderstatus", "o_orderpriority")


# --------------------------------------------------------------------------
# A7 — WIP count + age as of a date
# --------------------------------------------------------------------------
@register(
    "wip_as_of",
    doc=f"A7 WIP: committed (o_orderdate) on/before {WIP_AS_OF_DATE}, not yet "
    "departed (max l_shipdate per order) by it; count + age p85/avg per class",
    tags=("join", "aggregate", "percentile"),
    oracle=f"""
WITH departures AS (
    SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS departure_date
    FROM lineitem GROUP BY 1
),
items AS (
    SELECT o.o_orderpriority AS class_of_service,
           CAST(o.o_orderdate AS DATE) AS commitment_date,
           d.departure_date
    FROM orders o LEFT JOIN departures d ON o.o_orderkey = d.l_orderkey
),
wip AS (
    SELECT class_of_service,
           datediff('day', commitment_date, DATE '{WIP_AS_OF_DATE}') AS wip_age_days
    FROM items
    WHERE commitment_date <= DATE '{WIP_AS_OF_DATE}'
      AND (departure_date IS NULL OR departure_date > DATE '{WIP_AS_OF_DATE}')
)
SELECT class_of_service,
       COUNT(*) AS wip_count,
       percentile_disc(0.85) WITHIN GROUP (ORDER BY wip_age_days) AS wip_age_p85,
       ROUND(CAST(SUM(wip_age_days) AS DOUBLE) / COUNT(*), 2) AS wip_age_avg
FROM wip
GROUP BY 1
""",
)
def wip_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    lineitem = load_table(spark, sf_dir, "lineitem")
    departures = lineitem.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("departure_date")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("class_of_service"),
        F.col("o_orderdate").alias("commitment_date"),
    )
    items = orders.join(
        departures, orders.o_orderkey == departures.l_orderkey, "left"
    ).select("class_of_service", "commitment_date", "departure_date")

    as_of = F.lit(WIP_AS_OF_DATE).cast("date")
    wip = items.filter(
        (F.to_date("commitment_date") <= as_of)
        & (F.col("departure_date").isNull() | (F.col("departure_date") > as_of))
    ).withColumn("wip_age_days", F.datediff(as_of, F.to_date("commitment_date")))
    from falcon_metrics_etl_spark.operators.metrics import percentile_disc

    return wip.groupBy("class_of_service").agg(
        F.count(F.lit(1)).alias("wip_count"),
        percentile_disc("wip_age_days", 0.85).alias("wip_age_p85"),
        F.round(F.sum("wip_age_days").cast("double") / F.count(F.lit(1)), 2).alias(
            "wip_age_avg"
        ),
    )


# --------------------------------------------------------------------------
# A6 — flow debt (wip age p85 / lead time p85)
# --------------------------------------------------------------------------
@register(
    "flow_debt",
    doc="A6 flow debt = 100 * wip_age_p85 / lead_time_p85 per class of "
    "service, joining the two metric aggregates; 0/NULL guards",
    tags=("join", "aggregate", "expression"),
    oracle=f"""
WITH departures AS (
    SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS departure_date
    FROM lineitem GROUP BY 1
),
items AS (
    SELECT o.o_orderpriority AS class_of_service,
           CAST(o.o_orderdate AS DATE) AS commitment_date,
           d.departure_date
    FROM orders o LEFT JOIN departures d ON o.o_orderkey = d.l_orderkey
),
lead AS (
    SELECT class_of_service,
           percentile_disc(0.85) WITHIN GROUP (
               ORDER BY datediff('day', commitment_date, departure_date)
           ) AS lead_time_p85
    FROM items WHERE departure_date IS NOT NULL
    GROUP BY 1
),
wip AS (
    SELECT class_of_service,
           percentile_disc(0.85) WITHIN GROUP (
               ORDER BY datediff('day', commitment_date, DATE '{WIP_AS_OF_DATE}')
           ) AS wip_age_p85
    FROM items
    WHERE commitment_date <= DATE '{WIP_AS_OF_DATE}'
      AND (departure_date IS NULL OR departure_date > DATE '{WIP_AS_OF_DATE}')
    GROUP BY 1
)
SELECT l.class_of_service, w.wip_age_p85, l.lead_time_p85,
       CASE WHEN l.lead_time_p85 IS NULL OR l.lead_time_p85 = 0 THEN NULL
            ELSE ROUND(w.wip_age_p85 * 100.0 / l.lead_time_p85, 2) END AS flow_debt
FROM lead l JOIN wip w ON l.class_of_service = w.class_of_service
""",
)
def flow_debt_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.metrics import percentile_disc

    lineitem = load_table(spark, sf_dir, "lineitem")
    departures = lineitem.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("departure_date")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("class_of_service"),
        F.to_date("o_orderdate").alias("commitment_date"),
    )
    items = orders.join(
        departures, orders.o_orderkey == departures.l_orderkey, "left"
    ).select("class_of_service", "commitment_date", "departure_date")

    lead = (
        items.filter(F.col("departure_date").isNotNull())
        .withColumn(
            "lead_time_days", F.datediff("departure_date", "commitment_date")
        )
        .groupBy("class_of_service")
        .agg(percentile_disc("lead_time_days", 0.85).alias("lead_time_p85"))
    )
    as_of = F.lit(WIP_AS_OF_DATE).cast("date")
    wip = (
        items.filter(
            (F.col("commitment_date") <= as_of)
            & (F.col("departure_date").isNull() | (F.col("departure_date") > as_of))
        )
        .withColumn("wip_age_days", F.datediff(as_of, "commitment_date"))
        .groupBy("class_of_service")
        .agg(percentile_disc("wip_age_days", 0.85).alias("wip_age_p85"))
    )
    joined = lead.join(wip, "class_of_service").select(
        "class_of_service", "wip_age_p85", "lead_time_p85"
    )
    return joined.withColumn(
        "flow_debt",
        F.when(
            F.col("lead_time_p85").isNull() | (F.col("lead_time_p85") == 0),
            F.lit(None),
        ).otherwise(F.round(F.col("wip_age_p85") * 100.0 / F.col("lead_time_p85"), 2)),
    )


# --------------------------------------------------------------------------
# A3-A7 fused — the 9-parallel-metric-calls view in ONE pass
# --------------------------------------------------------------------------
@register(
    "insights_metrics_single_pass",
    doc="A3-A7 fused: the reference's insights view fires 9 parallel "
    "metric API calls per (context, window) (extract_flomatika_insights_"
    "processor.ts:339-348); here lead-time p85/avg, WIP count + age p85, "
    "throughput and flow debt all come from ONE join + ONE grouped "
    "aggregation with conditional (null-skipping) aggregates — one scan "
    "of the fact table instead of nine",
    tags=("join", "aggregate", "percentile", "fused"),
    oracle=f"""
WITH departures AS (
    SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS departure_date
    FROM lineitem GROUP BY 1
),
items AS (
    SELECT o.o_orderpriority AS class_of_service,
           CAST(o.o_orderdate AS DATE) AS commitment_date,
           d.departure_date
    FROM orders o LEFT JOIN departures d ON o.o_orderkey = d.l_orderkey
),
m AS (
    SELECT class_of_service,
           percentile_disc(0.85) WITHIN GROUP (
               ORDER BY CASE WHEN departure_date IS NOT NULL
                   THEN datediff('day', commitment_date, departure_date) END
           ) AS lead_time_p85,
           ROUND(AVG(CASE WHEN departure_date IS NOT NULL
               THEN datediff('day', commitment_date, departure_date) END), 2)
               AS lead_time_avg,
           CAST(COALESCE(SUM(CASE WHEN commitment_date <= DATE '{WIP_AS_OF_DATE}'
                AND (departure_date IS NULL OR departure_date > DATE '{WIP_AS_OF_DATE}')
                THEN 1 END), 0) AS BIGINT) AS wip_count,
           percentile_disc(0.85) WITHIN GROUP (
               ORDER BY CASE WHEN commitment_date <= DATE '{WIP_AS_OF_DATE}'
                   AND (departure_date IS NULL OR departure_date > DATE '{WIP_AS_OF_DATE}')
                   THEN datediff('day', commitment_date, DATE '{WIP_AS_OF_DATE}') END
           ) AS wip_age_p85,
           CAST(COALESCE(SUM(CASE WHEN departure_date IS NOT NULL THEN 1 END), 0)
               AS BIGINT) AS throughput_total
    FROM items
    GROUP BY 1
)
SELECT class_of_service, lead_time_p85, lead_time_avg, wip_count,
       wip_age_p85, throughput_total,
       CASE WHEN lead_time_p85 IS NULL OR lead_time_p85 = 0 THEN NULL
            ELSE ROUND(wip_age_p85 * 100.0 / lead_time_p85, 2) END AS flow_debt
FROM m
""",
)
def insights_metrics_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.metrics import percentile_disc

    lineitem = load_table(spark, sf_dir, "lineitem")
    departures = lineitem.groupBy("l_orderkey").agg(
        F.max(F.to_date("l_shipdate")).alias("departure_date")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.col("o_orderpriority").alias("class_of_service"),
        F.to_date("o_orderdate").alias("commitment_date"),
    )
    items = orders.join(
        departures, orders.o_orderkey == departures.l_orderkey, "left"
    ).select("class_of_service", "commitment_date", "departure_date")

    as_of = F.lit(WIP_AS_OF_DATE).cast("date")
    departed = F.col("departure_date").isNotNull()
    in_wip = (F.col("commitment_date") <= as_of) & (
        F.col("departure_date").isNull() | (F.col("departure_date") > as_of)
    )
    lead_days = F.when(
        departed, F.datediff("departure_date", "commitment_date")
    )
    wip_age = F.when(in_wip, F.datediff(as_of, "commitment_date"))

    scored = items.select(
        "class_of_service",
        lead_days.alias("lead_days"),
        wip_age.alias("wip_age"),
        departed.cast("int").alias("departed"),
        in_wip.cast("int").alias("in_wip"),
    )
    m = scored.groupBy("class_of_service").agg(
        percentile_disc("lead_days", 0.85).alias("lead_time_p85"),
        F.round(F.avg("lead_days"), 2).alias("lead_time_avg"),
        F.coalesce(F.sum("in_wip"), F.lit(0)).cast("long").alias("wip_count"),
        percentile_disc("wip_age", 0.85).alias("wip_age_p85"),
        F.coalesce(F.sum("departed"), F.lit(0))
        .cast("long")
        .alias("throughput_total"),
    )
    return m.withColumn(
        "flow_debt",
        F.when(
            F.col("lead_time_p85").isNull() | (F.col("lead_time_p85") == 0),
            F.lit(None),
        ).otherwise(
            F.round(F.col("wip_age_p85") * 100.0 / F.col("lead_time_p85"), 2)
        ),
    )


# --------------------------------------------------------------------------
# Robust outliers — median absolute deviation per class of service
# --------------------------------------------------------------------------
@register(
    "order_value_mad_outliers",
    doc="Robust outlier stats: per-class median order value and median "
    "absolute deviation (both discrete percentiles — actual data "
    "points, engine-exact) plus the count of orders beyond 3 MAD; the "
    "heavy-tail-safe alternative to the z-score flags in "
    "daily_count_anomalies",
    tags=("aggregate", "percentile", "quality"),
    oracle="""
WITH med AS (
    SELECT o_orderpriority AS class_of_service,
           percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice) AS median_value
    FROM orders GROUP BY 1
),
dev AS (
    SELECT m.class_of_service, m.median_value,
           percentile_disc(0.5) WITHIN GROUP (
               ORDER BY ABS(o.o_totalprice - m.median_value)
           ) AS mad
    FROM orders o JOIN med m ON o.o_orderpriority = m.class_of_service
    GROUP BY 1, 2
)
SELECT d.class_of_service,
       ROUND(d.median_value, 2) AS median_value,
       ROUND(d.mad, 2) AS mad,
       CAST(COALESCE(SUM(CASE WHEN ABS(o.o_totalprice - d.median_value)
                                   > 3 * d.mad THEN 1 END), 0) AS BIGINT)
           AS n_outliers,
       COUNT(*) AS n_orders
FROM orders o JOIN dev d ON o.o_orderpriority = d.class_of_service
GROUP BY 1, 2, 3
""",
)
def order_value_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.metrics import percentile_disc

    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("class_of_service"), "o_totalprice"
    )
    med = orders.groupBy("class_of_service").agg(
        percentile_disc("o_totalprice", 0.5, cast_to="double").alias(
            "median_value"
        )
    )
    with_med = orders.join(F.broadcast(med), "class_of_service")
    dev = (
        with_med.withColumn(
            "abs_dev", F.abs(F.col("o_totalprice") - F.col("median_value"))
        )
        .groupBy("class_of_service", "median_value")
        .agg(percentile_disc("abs_dev", 0.5, cast_to="double").alias("mad"))
    )
    flagged = orders.join(F.broadcast(dev), "class_of_service")
    return (
        flagged.groupBy(
            "class_of_service",
            F.round("median_value", 2).alias("median_value"),
            F.round("mad", 2).alias("mad"),
        )
        .agg(
            F.coalesce(
                F.sum(
                    F.when(
                        F.abs(F.col("o_totalprice") - F.col("median_value"))
                        > 3 * F.col("mad"),
                        1,
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_outliers"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# --------------------------------------------------------------------------
# A1 incremental — gold CFD maintenance (IVM)
# --------------------------------------------------------------------------
CFD_CUTOFF = "1998-01-01"


@register(
    "cfd_incremental_update",
    doc="Incremental CFD maintenance (operators/cfd.py::maintain_cfd): "
    f"the gold CFD exists up to {CFD_CUTOFF}; the later period arrives "
    "as a delta and folds in WITHOUT touching raw history — per-state "
    "cumulative offsets come from the gold table itself (max of a "
    "nondecreasing cum) and the only window runs over the delta's "
    "(state, day) aggregate. Output equals the full recompute, so the "
    "oracle IS the plain CFD. Out-of-window late data takes the ST3 "
    "recompute path instead.",
    tags=("aggregate", "window", "incremental", "scale"),
    oracle=_CFD_ORACLE,
)
def cfd_incremental_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    from falcon_metrics_etl_spark.operators.cfd import maintain_cfd

    lineitem = load_table(spark, sf_dir, "lineitem")
    snaps = lineitem.select(
        F.col("l_returnflag").alias("state"),
        F.col("l_shipdate").alias("snapshot_date"),
        F.col("l_linestatus").alias("state_category"),
    )
    cutoff = F.lit(CFD_CUTOFF).cast("date")
    base = snaps.filter(F.to_date("snapshot_date") < cutoff)
    delta = snaps.filter(F.to_date("snapshot_date") >= cutoff)
    # gold is consumed twice (union output + the per-state offsets
    # aggregate) and in production it is a READ table — the maintained
    # CFD is persisted state, not a per-run derivation. r15 (verdict
    # #4): the gold rollup lands once as staged parquet state (same
    # protocol as every other *_incremental* entry) and every
    # invocation — including a cold session — plans a parquet scan for
    # it, so the cold plan prices the delta fold, not the 2-shuffle
    # closure rebuild. Doubles/longs/dates round-trip parquet exactly;
    # hashes untouched.
    from falcon_metrics_etl_spark.session import staged_index

    # key embeds the cutoff (r15 advisor, low #3): moving CFD_CUTOFF
    # re-keys the staged rollup instead of serving the old period split
    gold = staged_index(
        spark,
        f"cfd_gold:cutoff={CFD_CUTOFF}:{sf_dir}",
        lambda: cumulative_flow(
            base,
            completed_value="F",
            inprogress_value="O",
            completed_label="completed",
            inprogress_label="inprogress",
        ),
        src_dir=sf_dir,
    )
    return maintain_cfd(
        gold,
        delta,
        completed_value="F",
        inprogress_value="O",
        completed_label="completed",
        inprogress_label="inprogress",
    )
