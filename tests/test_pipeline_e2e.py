"""Full-lifecycle integration (SURVEY §3.1): raw JSON staging ->
bronze flatten -> silver transform (event dates, snapshots) -> keyed
MERGE sinks -> compaction -> gold read-back. One test, every layer."""

import json

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.sinks.compaction import compact
from falcon_metrics_etl_spark.sinks.merge import upsert_snapshots, upsert_states
from falcon_metrics_etl_spark.sources.json_staging import read_json_staging
from falcon_metrics_etl_spark.operators.transform import transform_work_items

ITEM_SCHEMA = (
    "workflow_id string, status_id string, status_name string, "
    "created string, updated string, "
    "revisions array<struct<revision:int, changed:string, "
    "status_id:string, status_name:string>>"
)


def _stage_items(tmp_path):
    def put(org, ds, item, payload):
        d = tmp_path / org / f"state-{ds}"
        d.mkdir(parents=True, exist_ok=True)
        (d / f"{item}.json").write_text(json.dumps(payload, indent=1))

    put("org1", "jira1", "A", {
        "workflow_id": "wf1", "status_id": "s3",
        "status_name": "departure step",
        "created": "2021-03-01 00:00:00", "updated": "2021-03-05 00:00:00",
        "revisions": [
            {"revision": 1, "changed": "2021-03-02 00:00:00",
             "status_id": "s1", "status_name": "arrival step"},
            {"revision": 2, "changed": "2021-03-03 00:00:00",
             "status_id": "s2", "status_name": "commitment step"},
            {"revision": 3, "changed": "2021-03-04 00:00:00",
             "status_id": "s3", "status_name": "departure step"},
        ],
    })
    put("org1", "jira1", "B", {
        "workflow_id": "wf1", "status_id": "s1",
        "status_name": "arrival step",
        "created": "2021-03-02 00:00:00", "updated": "2021-03-06 00:00:00",
        "revisions": [
            {"revision": 1, "changed": "2021-03-03 00:00:00",
             "status_id": "s1", "status_name": "arrival step"},
        ],
    })
    return str(tmp_path)


def test_full_lifecycle(spark, tmp_path):
    staging = _stage_items(tmp_path / "landing")

    # bronze: read raw staging, flatten nested revisions
    raw = read_json_staging(spark, staging, ITEM_SCHEMA)
    work_items = raw.select(
        "org_id", "datasource_id", "work_item_id", "workflow_id",
        "status_id", "status_name",
        F.to_timestamp("created").alias("created_date"),
        F.to_timestamp("updated").alias("updated_date"),
    )
    revisions = raw.select(
        "org_id", "datasource_id", "work_item_id", "workflow_id",
        F.explode("revisions").alias("r"),
    ).select(
        "org_id", "datasource_id", "work_item_id", "workflow_id",
        F.col("r.revision").alias("revision"),
        F.to_timestamp("r.changed").alias("changed_date"),
        F.lit("state_change").alias("type"),
        F.col("r.status_id").alias("status_id"),
        F.col("r.status_name").alias("status_name"),
        F.lit(None).cast("string").alias("from_status_id"),
        F.lit(None).cast("string").alias("from_status_name"),
        F.lit(None).cast("string").alias("assignee"),
        F.lit(None).cast("string").alias("blocked_reason"),
        F.lit(None).cast("string").alias("discarded_reason"),
        F.lit(None).cast("boolean").alias("flagged"),
    )

    steps = spark.createDataFrame(
        [("wf1", "s0", "backlog step", 0, "queue"),
         ("wf1", "s1", "arrival step", 1, "queue"),
         ("wf1", "s2", "commitment step", 2, "active"),
         ("wf1", "s3", "departure step", 3, "active")],
        "workflow_id string, step_id string, step_name string, "
        "step_order int, state_type string",
    )
    events = spark.createDataFrame(
        [("wf1", 1, 2, 3)],
        "workflow_id string, arrival_point_order int, "
        "commitment_point_order int, departure_point_order int",
    )

    # silver
    states, snapshots = transform_work_items(work_items, revisions, steps, events)
    states = states.withColumn(
        "partition_key", F.concat_ws("#", F.lit("state"), F.col("org_id"))
    ).withColumn(
        "sort_key", F.concat_ws("#", F.col("datasource_id"), F.col("work_item_id"))
    )

    # sinks: idempotent MERGE, twice (redelivery), then compaction
    states_path = str(tmp_path / "states")
    snaps_path = str(tmp_path / "snapshots")
    for _ in range(2):
        upsert_states(spark, states_path, states)
        upsert_snapshots(
            spark,
            snaps_path,
            snapshots.withColumn("org_id", F.lit("org1"))
            .withColumn(
                "partition_key",
                F.concat_ws("#", F.lit("snapshot"), F.col("org_id")),
            )
            .withColumn("type", F.lit("state_change"))
            .withColumn("snapshot_date", F.col("changed_date")),
        )
    compact(spark, states_path, partition_cols=("org_id",), min_files=1)

    # gold read-back
    got = {
        r["work_item_id"]: r.asDict()
        for r in spark.read.parquet(states_path).collect()
    }
    assert set(got) == {"A", "B"}  # merge stayed idempotent
    a = got["A"]
    assert str(a["arrival_date"])[:10] == "2021-03-02"
    assert str(a["commitment_date"])[:10] == "2021-03-03"
    assert str(a["departure_date"])[:10] == "2021-03-04"
    assert a["state_category"] == "completed"
    b = got["B"]
    assert str(b["arrival_date"])[:10] == "2021-03-03"
    assert b["commitment_date"] is None
    assert b["state_category"] == "proposed"

    snaps = spark.read.parquet(snaps_path)
    # snapshots: one per revision incl. the synthesized revision 0
    assert snaps.filter(F.col("work_item_id") == "A").count() == 4
    assert snaps.filter(F.col("work_item_id") == "B").count() == 2
