"""Python UDTF surface (SURVEY §2.10): a table function that parses a
JSON changelog payload and emits one row per transition — the
UDTF-shaped fallback for payloads whose structure genuinely can't be
declared to from_json (the reference's changelog walk,
src/jiracloud/process/revision_processor.ts:224-334, is expressible
with explode + windows and the engine does it that way in
operators/revisions.py; this demonstrates the escape hatch exists and
composes with LATERAL).

UDTFs are the slow path (per-row Python) — the engine uses them for
API-surface completeness, never in hot paths; see SCALE.md "Python
boundary policy".
"""

import json

import pytest
from pyspark.sql.functions import col, lit, udtf


@udtf(returnType="seq int, from_state string, to_state string")
class ParseTransitions:
    def eval(self, payload: str):
        try:
            items = json.loads(payload)
        except (ValueError, TypeError):
            return
        for i, it in enumerate(items):
            yield i, it.get("from"), it.get("to")


def test_udtf_parses_changelog_rows(spark):
    payload = json.dumps(
        [{"from": "todo", "to": "doing"}, {"from": "doing", "to": "done"}]
    )
    out = ParseTransitions(lit(payload)).collect()
    assert [(r["seq"], r["from_state"], r["to_state"]) for r in out] == [
        (0, "todo", "doing"),
        (1, "doing", "done"),
    ]


def test_udtf_lateral_join_per_item(spark):
    spark.udtf.register("parse_transitions", ParseTransitions)
    df = spark.createDataFrame(
        [
            ("WI-1", json.dumps([{"from": "a", "to": "b"}])),
            ("WI-2", json.dumps([{"from": "x", "to": "y"}, {"from": "y", "to": "z"}])),
            ("WI-3", "not json"),
        ],
        "work_item_id string, changelog string",
    )
    df.createOrReplaceTempView("items")
    rows = spark.sql(
        """
        SELECT i.work_item_id, t.seq, t.from_state, t.to_state
        FROM items i, LATERAL parse_transitions(i.changelog) t
        ORDER BY i.work_item_id, t.seq
        """
    ).collect()
    # WI-3's unparseable payload yields no rows (quarantine-by-absence)
    assert [(r[0], r[1], r[2], r[3]) for r in rows] == [
        ("WI-1", 0, "a", "b"),
        ("WI-2", 0, "x", "y"),
        ("WI-2", 1, "y", "z"),
    ]
