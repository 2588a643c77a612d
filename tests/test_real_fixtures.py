"""Real-payload parity: the reference repo ships full Jira API
payloads as fixtures (FLO-1331/1370/1386.json, each with live
issuelinks). Feed the raw JSON through the engine's schema'd reader +
HOF translator and assert the reference test's expectations
(translate_linked_items.test.ts). Skipped when the read-only
reference checkout isn't present."""

import os

import pytest
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.functions.linked_items import (
    translate_linked_items,
)

FIXTURE_DIR = "/root/reference/src/jiracloud/process/tests"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURE_DIR), reason="reference fixtures not available"
)

LINKS_SCHEMA = (
    "key string, fields struct<issuelinks: array<struct<"
    "type: struct<outward: string, inward: string>, "
    "outwardIssue: struct<key: string>, inwardIssue: struct<key: string>>>>"
)


def links_of(spark, name):
    df = (
        spark.read.schema(LINKS_SCHEMA)
        .option("multiLine", "true")
        .json(os.path.join(FIXTURE_DIR, name))
    )
    row = df.select(
        "key",
        translate_linked_items(F.col("fields.issuelinks")).alias("links"),
    ).collect()[0]
    return {(l["type"], l["workItemId"]) for l in row["links"]}


def test_flo_1331_blocked_by_and_cloned_by(spark):
    got = links_of(spark, "FLO-1331.json")
    assert {("is blocked by", "FLO-1370"), ("is cloned by", "FLO-1386")} <= got


def test_flo_1386_relates_to(spark):
    got = links_of(spark, "FLO-1386.json")
    assert ("relates to", "FLO-1370") in got


def test_flo_1370_blocks_and_relates(spark):
    got = links_of(spark, "FLO-1370.json")
    assert {
        ("blocks", "FLO-1331"),
        ("blocks", "FLO-1330"),
        ("relates to", "FLO-1386"),
    } <= got
