"""Randomized equivalence: the window-expression revision reducers vs
direct spec-level reimplementations of the reference's reduce-vs-last-
kept loops (revision_utils.ts) — hundreds of random histories, one
Spark job per operator."""

import random

from falcon_metrics_etl_spark.operators.revisions import (
    blocked_revisions,
    custom_field_revisions,
    dedupe_consecutive,
)

VALUES = [None, "No", "Yes", "Blocked: sys", "X"]


def histories(seed, n_items=150, max_len=12):
    rng = random.Random(seed)
    rows = []
    for item in range(n_items):
        for rev in range(1, rng.randint(1, max_len) + 1):
            rows.append((f"it{item}", rev, rng.choice(VALUES)))
    return rows


def ref_blocked(item_rows):
    """Spec: nothing kept until the first non-null non-'No' value; then
    every change vs the LAST KEPT value is kept, flagged when the new
    value blocks (revision_utils.ts:3-39)."""
    kept = []
    for rev, val in sorted(item_rows):
        if not kept:
            if val is not None and val != "No":
                kept.append((rev, val, True))
        elif kept[-1][1] != val:
            kept.append((rev, val, val is not None and val != "No"))
    return kept


def ref_custom_field(item_rows):
    """Spec: nulls never emit and never become the baseline
    (revision_utils.ts:112-145)."""
    kept = []
    for rev, val in sorted(item_rows):
        if val is None:
            continue
        if not kept or kept[-1][1] != val:
            kept.append((rev, val))
    return kept


def ref_dedupe(item_rows):
    """Spec: first row always kept; then change-vs-last-kept
    (null-safe) (revision_utils.ts:73-107)."""
    kept = []
    for rev, val in sorted(item_rows):
        if not kept or kept[-1][1] != val:
            kept.append((rev, val))
    return kept


def by_item(rows):
    out = {}
    for item, rev, val in rows:
        out.setdefault(item, []).append((rev, val))
    return out


def test_reducers_match_reference_spec_on_random_histories(spark):
    rows = histories(20260813)
    df = spark.createDataFrame(
        rows, "work_item_id string, revision int, val string"
    ).repartition(5)
    grouped = by_item(rows)

    got = {}
    for r in blocked_revisions(df, "val", order_cols=("revision",)).collect():
        got.setdefault(r["work_item_id"], []).append(
            (r["revision"], r["val"], r["flagged"])
        )
    for item, item_rows in grouped.items():
        assert sorted(got.get(item, [])) == ref_blocked(item_rows), item

    got = {}
    for r in custom_field_revisions(df, "val", order_cols=("revision",)).collect():
        got.setdefault(r["work_item_id"], []).append((r["revision"], r["val"]))
    for item, item_rows in grouped.items():
        assert sorted(got.get(item, [])) == ref_custom_field(item_rows), item

    got = {}
    for r in dedupe_consecutive(df, "val", order_cols=("revision",)).collect():
        got.setdefault(r["work_item_id"], []).append((r["revision"], r["val"]))
    for item, item_rows in grouped.items():
        assert sorted(got.get(item, [])) == ref_dedupe(item_rows), item
