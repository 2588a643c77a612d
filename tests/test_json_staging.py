"""S7 JSON staging readers: per-item files with path-derived keys and
corrupt-record quarantine; array id-list files with filename keys."""

import json
import os

import pytest

from falcon_metrics_etl_spark.sources.json_staging import (
    CORRUPT_COL,
    read_id_list_staging,
    read_json_staging,
)

ITEM_SCHEMA = "title string, status string, points int"


@pytest.fixture()
def staging(tmp_path):
    def put(org, kind, ds, item, payload, raw=None):
        d = tmp_path / org / f"{kind}-{ds}"
        d.mkdir(parents=True, exist_ok=True)
        body = raw if raw is not None else json.dumps(payload, indent=2)
        (d / f"{item}.json").write_text(body)

    put("org1", "state", "jira-abc", "FLO-1",
        {"title": "fix login", "status": "Done", "points": 3})
    put("org1", "state", "jira-abc", "FLO-2",
        {"title": "add sso", "status": "Doing", "points": 5})
    put("org2", "snapshot", "ado-xyz", "77",
        {"title": "migrate db", "status": "New", "points": 8})
    put("org2", "snapshot", "ado-xyz", "78", None, raw="{not valid json!")
    return str(tmp_path)


def test_read_json_staging_payload_and_keys(spark, staging):
    df = read_json_staging(spark, staging, ITEM_SCHEMA)
    rows = {r["work_item_id"]: r.asDict() for r in df.collect()}
    assert set(rows) == {"FLO-1", "FLO-2", "77", "78"}
    assert rows["FLO-1"]["org_id"] == "org1"
    assert rows["FLO-1"]["item_kind"] == "state"
    assert rows["FLO-1"]["datasource_id"] == "jira-abc"
    assert rows["FLO-1"]["status"] == "Done"
    assert rows["77"]["org_id"] == "org2"
    assert rows["77"]["item_kind"] == "snapshot"
    assert rows["77"]["datasource_id"] == "ado-xyz"


def test_corrupt_record_quarantined_not_fatal(spark, staging):
    df = read_json_staging(spark, staging, ITEM_SCHEMA)
    bad = df.filter(df[CORRUPT_COL].isNotNull()).collect()
    assert [r["work_item_id"] for r in bad] == ["78"]
    assert bad[0]["title"] is None
    assert "not valid json" in bad[0][CORRUPT_COL]


def test_read_id_list_staging(spark, tmp_path):
    lists = tmp_path / "lists"
    lists.mkdir()
    (lists / "org1--ds9--ctxA.json").write_text(json.dumps(["FLO-1", "FLO-2"]))
    (lists / "org2--ds3--ctxB.json").write_text(json.dumps(["77"]))
    df = read_id_list_staging(spark, str(lists))
    got = sorted(tuple(r) for r in df.collect())
    assert got == [
        ("77", "org2", "ds3", "ctxB"),
        ("FLO-1", "org1", "ds9", "ctxA"),
        ("FLO-2", "org1", "ds9", "ctxA"),
    ]


def test_context_pipeline_staging_to_bridge(spark, tmp_path):
    """SURVEY §3.2 end-to-end: staged id-list arrays -> bridge refresh
    with per-context anti-delete (stale pairs vanish, other contexts
    untouched)."""
    from falcon_metrics_etl_spark.sinks.maintenance import refresh_bridge

    lists = tmp_path / "lists"
    lists.mkdir()
    (lists / "org1--ds1--ctxA.json").write_text(json.dumps(["W1", "W2", "W2"]))
    (lists / "org1--ds1--ctxB.json").write_text(json.dumps(["W2", "W3"]))
    bridge = str(tmp_path / "bridge")

    ids = read_id_list_staging(spark, str(lists))
    for ctx in ("ctxA", "ctxB"):
        refresh_bridge(
            spark, bridge, ctx,
            ids.filter(ids.context_id == ctx).select("work_item_id"),
        )
    got = sorted(
        (r["context_id"], r["work_item_id"])
        for r in spark.read.parquet(bridge).collect()
    )
    assert got == [("ctxA", "W1"), ("ctxA", "W2"), ("ctxB", "W2"), ("ctxB", "W3")]

    # re-extract ctxA with W1 dropped: stale pair deleted, ctxB intact
    (lists / "org1--ds1--ctxA.json").write_text(json.dumps(["W2", "W9"]))
    ids2 = read_id_list_staging(spark, str(lists))
    refresh_bridge(
        spark, bridge, "ctxA",
        ids2.filter(ids2.context_id == "ctxA").select("work_item_id"),
    )
    got = sorted(
        (r["context_id"], r["work_item_id"])
        for r in spark.read.parquet(bridge).collect()
    )
    assert got == [("ctxA", "W2"), ("ctxA", "W9"), ("ctxB", "W2"), ("ctxB", "W3")]


def test_bronze_schema_evolution_merge(spark, tmp_path):
    """Bronze schema drift: newer micro-batches add columns; a
    mergeSchema read unions the schemas and back-fills nulls — old
    files stay valid, no rewrite (the lakehouse answer to the
    reference's open-world `fields: {[prop]: any}` raw payloads)."""
    bronze = str(tmp_path / "bronze")
    spark.createDataFrame(
        [(1, "todo")], "work_item_id long, state string"
    ).write.parquet(bronze + "/batch=1")
    # later extract adds a column the old files don't have
    spark.createDataFrame(
        [(2, "doing", "alice")],
        "work_item_id long, state string, assignee string",
    ).write.parquet(bronze + "/batch=2")

    merged = spark.read.option("mergeSchema", "true").parquet(bronze)
    assert set(merged.columns) >= {"work_item_id", "state", "assignee"}
    rows = {r.work_item_id: r for r in merged.collect()}
    assert rows[1].assignee is None  # back-filled, not failed
    assert rows[2].assignee == "alice"


def test_staging_keys_with_uri_reserved_chars(spark, tmp_path):
    """File/dir names with spaces, '%', and '+' must round-trip to the
    true ids — input_file_name() returns a percent-encoded URI, so the
    extraction decodes it (with '+' kept literal, URI-style)."""
    import os

    root = tmp_path / "stage" / "org 1" / "type-ds%2"
    os.makedirs(root)
    (root / "ITEM 42+A.json").write_text('{"state": "done"}')
    from falcon_metrics_etl_spark.sources.json_staging import read_json_staging

    df = read_json_staging(spark, str(tmp_path / "stage"), "state string")
    row = df.collect()[0]
    assert row["org_id"] == "org 1"
    assert row["datasource_id"] == "ds%2"
    assert row["work_item_id"] == "ITEM 42+A"
    assert row["state"] == "done"
