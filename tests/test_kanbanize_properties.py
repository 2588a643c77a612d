"""Randomized equivalence for the round-4 operators vs spec-level
Python reimplementations of the reference loops:

- compress_transitions vs getStateTransitions' reduce-with-last-kept
  (transform_processor.ts:293-312);
- parse_changelog vs getRevisions' nested forEach walk
  (revision_processor.ts:335-448).

One Spark job per operator over hundreds of random histories."""

import random

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.operators.kanbanize import compress_transitions
from falcon_metrics_etl_spark.operators.revisions import parse_changelog


def ref_get_state_transitions(transitions):
    """Literal model of getStateTransitions (ts:293-312): accum keeps
    the first transition, then any whose column differs from the LAST
    KEPT one; revision = original array index."""
    accum = []
    for i, t in enumerate(transitions):
        if not accum:
            accum.append((i, t))
        elif t["column_id"] != accum[-1][1]["column_id"]:
            accum.append((i, t))
    return [(i, t["column_id"]) for i, t in accum]


def test_compress_transitions_matches_reference_reduce(spark):
    rng = random.Random(42)
    rows, expected = [], {}
    for card in range(200):
        trans = [
            {"column_id": rng.randint(1, 4)}
            for _ in range(rng.randint(1, 15))
        ]
        expected[card] = ref_get_state_transitions(trans)
        for i, t in enumerate(trans):
            rows.append((card, i, t["column_id"]))
    df = spark.createDataFrame(rows, "card_id int, idx int, column_id int")
    got = {}
    for r in compress_transitions(df).collect():
        got.setdefault(r["card_id"], []).append((r["revision"], r["column_id"]))
    for card in expected:
        assert sorted(got.get(card, [])) == expected[card], card


BLOCKED_ID = "customfield_77"
DISCARDED_ID = "customfield_88"
FIELDS = [
    ("status", "status"),
    ("assignee", "assignee"),
    ("Flagged", "customfield_10021"),
    ("Rank", "customfield_10019"),  # never a revision
    ("Blocked Why", BLOCKED_ID),
    ("Discard", DISCARDED_ID),
]


def ref_get_revisions(histories):
    """Literal model of getRevisions (ts:335-448) emitting
    (history_id, type, status_id, status_name, flagged)."""
    out = []
    for h in histories:
        for it in h["items"]:
            if it["field"] == "Flagged" and it["to"] == "" and it["toString"] == "":
                out.append((h["id"], "flagged", "flagged", "flagged", False))
            if it["to"] and it["toString"]:
                if it["field"] == "status":
                    t = "state_change"
                elif it["field"] == "Flagged":
                    t = "flagged"
                elif it["field"] == "assignee":
                    t = "assignee_change"
                elif it["fieldId"] == BLOCKED_ID:
                    t = "blocked_reason"
                elif it["fieldId"] == DISCARDED_ID:
                    t = "discarded_reason"
                else:
                    continue
                out.append(
                    (h["id"], t, it["to"], it["toString"], t == "flagged")
                )
    return sorted(out)


def test_parse_changelog_matches_reference_walk(spark):
    rng = random.Random(7)
    rows, expected = [], {}
    for item in range(120):
        histories = []
        for hid in range(1, rng.randint(1, 8) + 1):
            items = []
            for _ in range(rng.randint(1, 3)):
                field, field_id = rng.choice(FIELDS)
                roll = rng.random()
                if roll < 0.15:
                    to, to_s = "", ""  # empty entry (unflag / dropped)
                elif roll < 0.30:
                    # null-cleared entry: strictly DIFFERENT from ''
                    # in the reference (=== comparison) — emits nothing
                    # even for Flagged
                    to, to_s = None, None
                elif roll < 0.35:
                    to, to_s = None, ""  # mixed null/empty: also nothing
                else:
                    to, to_s = f"v{rng.randint(1, 5)}", f"Val {rng.randint(1, 5)}"
                items.append(
                    {
                        "field": field,
                        "fieldId": field_id,
                        "from": None,
                        "fromString": None,
                        "to": to,
                        "toString": to_s,
                    }
                )
            histories.append(
                {
                    "id": str(hid),
                    "created": f"2024-01-{(hid % 27) + 1:02d}T00:00:00",
                    "items": items,
                }
            )
        expected[str(item)] = ref_get_revisions(histories)
        rows.append(
            (
                str(item),
                [
                    (
                        h["id"],
                        h["created"],
                        [
                            (
                                i["field"],
                                i["fieldId"],
                                i["from"],
                                i["fromString"],
                                i["to"],
                                i["toString"],
                            )
                            for i in h["items"]
                        ],
                    )
                    for h in histories
                ],
            )
        )
    df = spark.createDataFrame(
        rows,
        "work_item_id string, changelog array<struct<id:string, "
        "created:string, items:array<struct<field:string, fieldId:string, "
        "from:string, fromString:string, to:string, toString:string>>>>",
    )
    parsed = parse_changelog(
        df,
        blocked_reason_field_id=BLOCKED_ID,
        discarded_reason_field_id=DISCARDED_ID,
    )
    got = {}
    for r in parsed.collect():
        got.setdefault(r["work_item_id"], []).append(
            (str(r["revision"]), r["type"], r["status_id"], r["status_name"], r["flagged"])
        )
    for item, exp in expected.items():
        assert sorted(got.get(item, [])) == exp, item
