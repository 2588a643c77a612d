"""Ported scenario suite for exact event-date extraction (W2).

Source scenarios: /root/reference/src/configuration/
event_date_extractor.test.ts (zone-transition matrix lines 306-966,
delayed rules 967-1066, regressions FLO-1430 line 1068 / BET-151 line
1171), re-expressed as (revisions-in -> event-dates-out) fixtures over
the pandas-UDF path and the full DataFrame path.

Standard workflow: orders 0..3 with points (arrival=1, commitment=2,
departure=3): step order 0 = preceding, 1 = arrival zone,
2 = commitment zone, 3 = departure zone.
"""

from datetime import datetime, timedelta

import pandas as pd
import pytest

from falcon_metrics_etl_spark.operators.event_dates import (
    _extract_one_item,
    extract_event_dates,
    tag_zones,
)

D0 = datetime(2021, 1, 10, 0, 0, 0)


def rev_frame(rows):
    """rows: list of (revision, zone, changed_date)."""
    return pd.DataFrame(
        {
            "work_item_id": ["item-1"] * len(rows),
            "revision": [r[0] for r in rows],
            "zone": pd.array([r[1] for r in rows], dtype="Int64"),
            "changed_date": [pd.Timestamp(r[2]) for r in rows],
        }
    )


def extract(rows):
    out = _extract_one_item(rev_frame(rows))
    row = out.iloc[0]

    def v(x):
        return None if pd.isna(x) else (x.to_pydatetime() if isinstance(x, pd.Timestamp) else x)

    return {
        "arrival": v(row["arrival_date"]),
        "commitment": v(row["commitment_date"]),
        "departure": v(row["departure_date"]),
        "is_delayed": bool(row["is_delayed"]),
        "delayed_revision": v(row["delayed_revision"]),
    }


def days(n):
    return D0 + timedelta(days=n)


def hours(n):
    return D0 + timedelta(hours=n)


# ---------------------------------------------------------------- basic

def test_simple_sequential_arrival_commitment_departure():
    got = extract([(1, 1, days(0)), (2, 2, days(1)), (3, 3, days(2))])
    assert got["arrival"] == days(0)
    assert got["commitment"] == days(1)
    assert got["departure"] == days(2)
    assert got["is_delayed"] is False


def test_same_day_arrival_commitment_departure_arrival_is_only_arrival():
    # test.ts:140 — same-day a > c > d > a keeps only the arrival
    got = extract(
        [(1, 1, hours(0)), (2, 2, hours(1)), (3, 3, hours(2)), (4, 1, hours(3))]
    )
    assert got["arrival"] == hours(0)
    assert got["commitment"] is None
    assert got["departure"] is None
    assert got["is_delayed"] is False


# ------------------------------------------------- moving into preceding

def test_only_preceding_no_dates():
    got = extract([(1, 0, days(0))])
    assert got == {
        "arrival": None,
        "commitment": None,
        "departure": None,
        "is_delayed": False,
        "delayed_revision": None,
    }


def test_arrival_then_preceding_resets_arrival():
    got = extract([(1, 1, days(0)), (2, 0, days(2))])
    assert got["arrival"] is None
    assert got["commitment"] is None


def test_arrival_commitment_then_preceding_is_delayed():
    got = extract([(1, 1, days(0)), (2, 2, days(1)), (3, 0, days(2))])
    assert got["arrival"] == days(0)
    assert got["commitment"] == days(1)
    assert got["departure"] is None
    assert got["is_delayed"] is True
    assert got["delayed_revision"] == 3


def test_arrival_commitment_departure_then_preceding_clears_departure():
    got = extract(
        [(1, 1, days(0)), (2, 2, days(1)), (3, 3, days(2)), (4, 0, days(4))]
    )
    assert got["arrival"] == days(0)
    assert got["commitment"] == days(1)
    assert got["departure"] is None
    assert got["is_delayed"] is True
    assert got["delayed_revision"] == 4


# --------------------------------------------------- moving into arrival

def test_first_arrival_only():
    got = extract([(1, 1, days(0))])
    assert got["arrival"] == days(0)
    assert got["commitment"] is None


def test_second_arrival_keeps_first_date():
    got = extract([(1, 1, days(0)), (2, 1, days(1))])
    assert got["arrival"] == days(0)


def test_commitment_then_back_to_arrival_later_day_is_delayed():
    got = extract([(1, 1, days(0)), (2, 2, days(2)), (3, 1, days(3))])
    assert got["arrival"] == days(0)
    assert got["commitment"] == days(2)
    assert got["is_delayed"] is True
    assert got["delayed_revision"] == 3


def test_commitment_departure_then_arrival_clears_departure_delayed():
    got = extract(
        [(1, 1, days(0)), (2, 2, days(2)), (3, 3, days(3)), (4, 1, days(4))]
    )
    assert got["arrival"] == days(0)
    assert got["commitment"] == days(2)
    assert got["departure"] is None
    assert got["is_delayed"] is True
    assert got["delayed_revision"] == 4


def test_delayed_then_back_to_commitment_not_delayed_anymore():
    # test.ts:600 — later commitment move clears the delay
    got = extract(
        [(1, 1, days(0)), (2, 2, days(2)), (3, 1, days(3)), (4, 2, days(20))]
    )
    assert got["arrival"] == days(0)
    assert got["commitment"] == days(2)
    assert got["is_delayed"] is False


def test_delayed_then_departure_not_delayed_anymore():
    # test.ts:648 — later departure move clears the delay and departs
    got = extract(
        [(1, 1, days(0)), (2, 2, days(2)), (3, 1, days(3)), (4, 3, days(20))]
    )
    assert got["arrival"] == days(0)
    assert got["commitment"] == days(2)
    assert got["departure"] == days(20)
    assert got["is_delayed"] is False


# ------------------------------------------------ moving into commitment

def test_commitment_only_backfills_arrival():
    got = extract([(1, 2, days(1))])
    assert got["arrival"] == days(1)
    assert got["commitment"] == days(1)
    assert got["departure"] is None


def test_arrival_then_commitment():
    got = extract([(1, 1, days(0)), (2, 2, days(1))])
    assert got["arrival"] == days(0)
    assert got["commitment"] == days(1)


def test_departure_then_second_commitment_keeps_first_commitment():
    # test.ts:762 — a+c+d then back to commitment: departure cleared,
    # commitment stays the first one, NOT delayed
    got = extract(
        [(1, 1, days(0)), (2, 2, days(1)), (3, 3, days(2)), (4, 2, days(3))]
    )
    assert got["arrival"] == days(0)
    assert got["commitment"] == days(1)
    assert got["departure"] is None
    assert got["is_delayed"] is False


# ------------------------------------------------- moving into departure

def test_departure_only_backfills_all():
    got = extract([(1, 3, days(0))])
    assert got["arrival"] == days(0)
    assert got["commitment"] == days(0)
    assert got["departure"] == days(0)


def test_arrival_then_departure_commitment_inherits_arrival():
    # test.ts:850 — commitment back-fills from ARRIVAL, not departure
    got = extract([(1, 1, days(0)), (2, 3, days(1))])
    assert got["arrival"] == days(0)
    assert got["commitment"] == days(0)
    assert got["departure"] == days(1)


def test_full_path_then_second_departure_keeps_first():
    got = extract(
        [(1, 1, days(0)), (2, 2, days(1)), (3, 3, days(2)), (4, 3, days(3))]
    )
    assert got["departure"] == days(2)
    assert got["is_delayed"] is False


# ------------------------------------------------------------- delayed

def test_delayed_if_back_to_arrival_on_later_date():
    # test.ts:969 — same-day a>c>d then next-day arrival
    got = extract(
        [(1, 1, hours(0)), (2, 2, hours(1)), (3, 3, hours(2)), (4, 1, days(1) + timedelta(hours=2))]
    )
    assert got["arrival"] == hours(0)
    assert got["commitment"] == hours(1)
    assert got["departure"] is None
    assert got["is_delayed"] is True
    assert got["delayed_revision"] == 4


# ---------------------------------------------------------- regressions

def test_flo_1430_same_day_bounce_no_commitment():
    # test.ts:1068 — steps: created/arrival both zone arrival; the
    # "commitment step" has order 3 >= departure point => departure zone;
    # a same-minute return to arrival ignores everything but arrival.
    t0 = datetime(2021, 9, 24, 2, 41, 48, 699000)
    t1 = datetime(2021, 9, 24, 2, 42, 41, 220000)
    t2 = datetime(2021, 9, 24, 2, 43, 3, 407000)
    t3 = datetime(2021, 9, 24, 2, 44, 0, 943000)
    got = extract([(0, 1, t0), (1, 1, t1), (2, 3, t2), (3, 1, t3)])
    assert got["arrival"] == t0
    assert got["commitment"] is None
    assert got["departure"] is None
    assert got["is_delayed"] is False


def test_bet_151_before_arrival_roundtrip():
    # test.ts:1171 — backlog(before) -> commitment-zone -> backlog:
    # arrival back-fills from commitment; delayed
    t0 = datetime(2021, 9, 22, 1, 28, 19, 769000)
    t1 = datetime(2021, 10, 8, 1, 28, 19, 769000)
    t2 = datetime(2021, 10, 10, 1, 28, 19, 769000)
    got = extract([(1, 0, t0), (2, 2, t1), (3, 0, t2)])
    assert got["arrival"] == t1
    assert got["commitment"] == t1
    assert got["departure"] is None
    assert got["is_delayed"] is True


# ------------------------------------------------------- unknown steps

def test_unknown_zone_revisions_are_inert_but_reset_delay():
    # unknown step between commitment and end resets the delayed flag
    got = extract(
        [(1, 1, days(0)), (2, 2, days(1)), (3, 0, days(2)), (4, None, days(3))]
    )
    # last future revision is unknown-zone => delayed reset to False
    assert got["commitment"] == days(1)
    assert got["is_delayed"] is False


# ---------------------------------------------------- DataFrame path

def test_dataframe_path_with_zone_tagging(spark):
    rows = [
        # item A: clean a -> c -> d
        ("A", 1, "s1", "arrival step", days(0)),
        ("A", 2, "s2", "commitment step", days(1)),
        ("A", 3, "s3", "departure step", days(2)),
        # item B: commitment then back to arrival next day (delayed)
        ("B", 1, "s1", "arrival step", days(0)),
        ("B", 2, "s2", "commitment step", days(1)),
        ("B", 3, "s1", "arrival step", days(2)),
        # item C: unknown step only
        ("C", 1, "sX", "mystery step", days(0)),
    ]
    revisions = spark.createDataFrame(
        [(w, r, sid, sn, d, "wf1") for (w, r, sid, sn, d) in rows],
        "work_item_id string, revision int, status_id string, "
        "status_name string, changed_date timestamp, workflow_id string",
    )
    steps = spark.createDataFrame(
        [
            ("wf1", "s1", "arrival step", 1),
            ("wf1", "s2", "commitment step", 2),
            ("wf1", "s3", "departure step", 3),
        ],
        "workflow_id string, step_id string, step_name string, step_order int",
    )
    events = spark.createDataFrame(
        [("wf1", 1, 2, 3)],
        "workflow_id string, arrival_point_order int, "
        "commitment_point_order int, departure_point_order int",
    )
    tagged = tag_zones(revisions, steps, events)
    out = {
        r["work_item_id"]: r.asDict()
        for r in extract_event_dates(tagged).collect()
    }
    assert out["A"]["arrival_date"] == days(0)
    assert out["A"]["commitment_date"] == days(1)
    assert out["A"]["departure_date"] == days(2)
    assert out["A"]["is_delayed"] is False
    assert out["B"]["commitment_date"] == days(1)
    assert out["B"]["is_delayed"] is True
    assert out["B"]["delayed_revision"] == 3
    assert out["C"]["arrival_date"] is None
    assert out["C"]["commitment_date"] is None
    assert out["C"]["departure_date"] is None


def test_expr_path_matches_pandas_udf_on_fuzz(spark):
    """The Catalyst-expression W2 must agree with the reference pandas
    UDF on randomized histories (incl. zone-0 resets, same-day bounces,
    unknown steps) — seeded, deterministic."""
    import random

    from falcon_metrics_etl_spark.operators.event_dates import (
        extract_event_dates_expr,
    )

    rng = random.Random(20260813)
    rows = []
    for item in range(250):
        n = rng.randint(1, 10)
        t = D0
        for rev in range(1, n + 1):
            # frequent same-day steps: advance by 0..2 days, 1..5 hours
            t = t + timedelta(days=rng.randint(0, 2), hours=rng.randint(1, 5))
            zone = rng.choice([0, 0, 1, 1, 1, 2, 2, 2, 3, 3, None])
            rows.append((f"it{item}", rev, zone, t))
        t = D0  # reset base for next item

    df = spark.createDataFrame(
        rows,
        "work_item_id string, revision int, zone int, changed_date timestamp",
    ).repartition(4)

    udf_out = {
        r["work_item_id"]: r.asDict() for r in extract_event_dates(df).collect()
    }
    expr_out = {
        r["work_item_id"]: r.asDict()
        for r in extract_event_dates_expr(df).collect()
    }
    assert udf_out.keys() == expr_out.keys()
    for k in udf_out:
        assert udf_out[k] == expr_out[k], (k, udf_out[k], expr_out[k])


def test_input_row_order_does_not_matter(spark):
    """Reference 'ascending sorting works' (event_date_extractor.test.ts:8):
    the extractor sorts history internally, so a shuffled input frame must
    yield identical results on both the pandas-UDF and expression paths."""
    import random

    from falcon_metrics_etl_spark.operators.event_dates import (
        extract_event_dates_expr,
    )

    rows = [
        ("A", 1, 1, days(0)), ("A", 2, 2, days(1)), ("A", 3, 3, days(2)),
        ("B", 1, 1, days(0)), ("B", 2, 2, days(1)), ("B", 3, 1, days(2)),
        ("C", 1, 2, days(0)), ("C", 2, 0, hours(3)), ("C", 3, 3, days(4)),
    ]
    shuffled = rows[:]
    random.Random(7).shuffle(shuffled)
    schema = "work_item_id string, revision int, zone int, changed_date timestamp"
    base = spark.createDataFrame(rows, schema)
    shuf = spark.createDataFrame(shuffled, schema).repartition(3)
    for fn in (extract_event_dates, extract_event_dates_expr):
        a = {r["work_item_id"]: r.asDict() for r in fn(base).collect()}
        b = {r["work_item_id"]: r.asDict() for r in fn(shuf).collect()}
        assert a == b


def test_effective_point_orders_infinity_for_empty_zone(spark):
    from falcon_metrics_etl_spark.operators.event_dates import (
        effective_point_orders,
    )

    # FLO-1430 workflow shape: steps at orders 1,1,3,4 with configured
    # points (1,2,3): commitment zone [2,3) is empty => Infinity
    steps = spark.createDataFrame(
        [("wf1", "created", "created", 1), ("wf1", "arr", "arr", 1),
         ("wf1", "com", "com", 3), ("wf1", "dep", "dep", 4)],
        "workflow_id string, step_id string, step_name string, step_order int",
    )
    events = spark.createDataFrame(
        [("wf1", 1, 2, 3)],
        "workflow_id string, arrival_point_order int, "
        "commitment_point_order int, departure_point_order int",
    )
    row = effective_point_orders(steps, events).collect()[0]
    assert row["effective_arrival_order"] == 1.0
    assert row["effective_commitment_order"] == float("inf")
    assert row["effective_departure_order"] == 3.0


def test_zone_and_step_category_null_point_orders(spark):
    """A workflow absent from workflow_events (null point orders) must
    classify to NO zone/category — not fall through null comparisons
    into departure/'completed'."""
    from pyspark.sql import functions as F

    from falcon_metrics_etl_spark.operators.event_dates import (
        step_category,
        zone_of,
    )

    df = spark.createDataFrame(
        [(2.0, None, None, None), (None, 1.0, 2.0, 3.0), (2.0, 1.0, 2.0, 3.0)],
        "o double, a double, c double, d double",
    )
    out = df.select(
        zone_of(F.col("o"), F.col("a"), F.col("c"), F.col("d")).alias("z"),
        step_category(F.col("o"), F.col("a"), F.col("c"), F.col("d")).alias("s"),
    ).collect()
    assert (out[0]["z"], out[0]["s"]) == (None, None)
    assert (out[1]["z"], out[1]["s"]) == (None, None)
    assert out[2]["z"] == 2 and out[2]["s"] == "inprogress"


def _dt(s):
    return datetime.fromisoformat(s)


def test_whale_history_observation(spark):
    """observe_history_length reports max(revision)+1 via an Observation
    piggybacked on the action — the routing signal for items whose
    ordered per-item window would serialize the expr path."""
    from falcon_metrics_etl_spark.operators.event_dates import (
        WHALE_HISTORY_REVISIONS,
        extract_event_dates_expr,
        observe_history_length,
    )

    rows = [("itm-normal", i, f"2024-01-{(i % 27) + 1:02d}", 1) for i in range(40)]
    rows += [("itm-whale", i, "2024-02-01", 2) for i in range(120)]
    tagged = spark.createDataFrame(
        [(w, r, _dt(d), z) for w, r, d, z in rows],
        "work_item_id string, revision int, changed_date timestamp, zone int",
    )
    observed, obs = observe_history_length(tagged)
    extract_event_dates_expr(observed).write.format("noop").mode(
        "overwrite"
    ).save()
    stats = obs.get
    assert stats["max_history_len"] == 120
    assert stats["n_revisions"] == 160
    # the guard itself: the routing rule fires only beyond the bound
    assert stats["max_history_len"] < WHALE_HISTORY_REVISIONS


def test_whale_observation_through_transform_pipeline(spark):
    """transform_work_items(stats_out=...) exposes the observation and
    the metric survives the full states/snapshots composition."""
    from falcon_metrics_etl_spark.operators.transform import transform_work_items

    d1, d2 = _dt("2024-01-01"), _dt("2024-01-02")
    items = spark.createDataFrame(
        [("org1", "ds1", "w1", "wf1", "s2", "Doing", d1, d2)],
        "org_id string, datasource_id string, work_item_id string, "
        "workflow_id string, status_id string, status_name string, "
        "created_date timestamp, updated_date timestamp",
    )
    revs = spark.createDataFrame(
        [
            ("org1", "ds1", "w1", "wf1", 1, d2, "state_change", "s2",
             "Doing", "s1", "Todo", None, None, None, None),
        ],
        "org_id string, datasource_id string, work_item_id string, "
        "workflow_id string, revision int, changed_date timestamp, "
        "type string, status_id string, status_name string, "
        "from_status_id string, from_status_name string, assignee string, "
        "blocked_reason string, discarded_reason string, flagged boolean",
    )
    steps = spark.createDataFrame(
        [
            ("wf1", "s1", "Todo", 1, "queue", "proposed", True),
            ("wf1", "s2", "Doing", 2, "active", "inprogress", True),
        ],
        "workflow_id string, step_id string, step_name string, "
        "step_order int, state_type string, state_category string, "
        "active boolean",
    )
    events = spark.createDataFrame(
        [("wf1", 1, 2, 3)],
        "workflow_id string, arrival_point_order int, "
        "commitment_point_order int, departure_point_order int",
    )
    stats = {}
    states, _snaps = transform_work_items(
        items, revs, steps, events, stats_out=stats
    )
    states.write.format("noop").mode("overwrite").save()
    got = stats["observation"].get
    # synthesize_initial_revision adds revision 0; max real revision is 1
    assert got["max_history_len"] == 2
    assert got["n_revisions"] == 2


def test_observe_history_length_empty_stream_reports_zero(spark):
    """max over an empty stream is NULL; the observation coalesces it
    to 0 so callers' threshold comparisons never hit a None."""
    from falcon_metrics_etl_spark.operators.event_dates import (
        observe_history_length,
    )

    empty = spark.createDataFrame(
        [],
        "work_item_id string, revision int, changed_date timestamp, zone int",
    )
    observed, obs = observe_history_length(empty)
    observed.write.format("noop").mode("overwrite").save()
    assert obs.get["max_history_len"] == 0
    assert obs.get["n_revisions"] == 0


def test_split_by_history_length_exact_counts(spark):
    """The split keys on exact per-item ROW counts — valid for raw
    Jira history-id revisions (which are NOT dense; a small history
    can carry huge revision numbers and must not be misrouted)."""
    from falcon_metrics_etl_spark.operators.event_dates import (
        split_by_history_length,
    )

    rows = [("itm-big-ids", 900_000 + i, _dt("2024-01-01"), 1) for i in range(3)]
    rows += [("itm-long", i, _dt("2024-01-02"), 2) for i in range(80)]
    tagged = spark.createDataFrame(
        rows,
        "work_item_id string, revision long, changed_date timestamp, zone int",
    )
    normal, whales, stats = split_by_history_length(tagged, threshold=50)
    # raw history ids near 1M do NOT make itm-big-ids a whale (3 rows)
    assert sorted(
        r[0] for r in normal.select("work_item_id").distinct().collect()
    ) == ["itm-big-ids"]
    assert [r[0] for r in whales.select("work_item_id").distinct().collect()] == [
        "itm-long"
    ]
    assert stats == {
        "max_history_len": 80, "n_revisions": 83, "n_whales": 1,
        "n_null_key_whales": 0,
    }


def test_split_by_history_length_no_whales_is_passthrough(spark):
    from falcon_metrics_etl_spark.operators.event_dates import (
        split_by_history_length,
    )

    tagged = spark.createDataFrame(
        [("a", 1, _dt("2024-01-01"), 1)],
        "work_item_id string, revision int, changed_date timestamp, zone int",
    )
    normal, whales, stats = split_by_history_length(tagged, threshold=50)
    assert whales is None
    assert normal is tagged
    assert stats == {
        "max_history_len": 1, "n_revisions": 1, "n_whales": 0,
        "n_null_key_whales": 0,
    }

    empty = tagged.filter("1=0")
    _, whales2, stats2 = split_by_history_length(empty, threshold=50)
    assert whales2 is None
    assert stats2 == {
        "max_history_len": 0, "n_revisions": 0, "n_whales": 0,
        "n_null_key_whales": 0,
    }


def test_whale_routing_matches_expr_path_on_manufactured_whale(spark):
    """extract_event_dates_routed with a manufactured 30k-revision
    whale (3x the default threshold): the whale takes the mapInPandas
    branch, normals take the expr branch, and the union is row-for-row
    identical to running the expr path over everything."""
    from pyspark.sql import functions as F

    from falcon_metrics_etl_spark.operators.event_dates import (
        extract_event_dates_expr,
        extract_event_dates_routed,
    )

    whale = spark.range(30_000).select(
        F.lit("itm-whale").alias("work_item_id"),
        F.col("id").cast("int").alias("revision"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(mins=F.col("id").cast("int"))
        ).alias("changed_date"),
        # zones cycle 1,2,3 then settle in departure: exercises the
        # same-day lookahead rules deep inside the history
        F.when(F.col("id") < 29_000, (F.col("id") % 3 + 1).cast("int"))
        .otherwise(F.lit(3))
        .cast("int")
        .alias("zone"),
    )
    normals = spark.createDataFrame(
        [
            ("itm-a", 1, _dt("2024-03-01 08:00:00"), 1),
            ("itm-a", 2, _dt("2024-03-02 09:00:00"), 2),
            ("itm-a", 3, _dt("2024-03-03 10:00:00"), 3),
            ("itm-b", 1, _dt("2024-03-05 08:00:00"), 1),
            ("itm-b", 2, _dt("2024-03-05 08:30:00"), 0),
            ("itm-b", 3, _dt("2024-03-06 11:00:00"), 1),
        ],
        "work_item_id string, revision int, changed_date timestamp, zone int",
    )
    tagged = whale.unionByName(normals)

    stats = {}
    routed = extract_event_dates_routed(tagged, stats_out=stats)
    assert stats["n_whales"] == 1
    assert stats["max_history_len"] == 30_000

    got = {r["work_item_id"]: r.asDict() for r in routed.collect()}
    want = {
        r["work_item_id"]: r.asDict()
        for r in extract_event_dates_expr(tagged).collect()
    }
    assert got == want
    assert set(got) == {"itm-whale", "itm-a", "itm-b"}


def test_transform_work_items_routes_whales(spark):
    """transform_work_items(whale_routing=True, low threshold): the
    split runs inside the full pipeline, states stay correct, and
    stats_out carries the exact counts."""
    from falcon_metrics_etl_spark.operators.transform import transform_work_items

    d = _dt("2024-01-01")
    items = spark.createDataFrame(
        [
            ("org1", "ds1", "w-whale", "wf1", "s3", "Done", d, d),
            ("org1", "ds1", "w-small", "wf1", "s2", "Doing", d, d),
        ],
        "org_id string, datasource_id string, work_item_id string, "
        "workflow_id string, status_id string, status_name string, "
        "created_date timestamp, updated_date timestamp",
    )
    rev_rows = [
        ("org1", "ds1", "w-whale", "wf1", i + 1,
         d + timedelta(minutes=i + 1), "state_change",
         "s2" if i % 2 == 0 else "s3",
         "Doing" if i % 2 == 0 else "Done",
         "s1", "Todo", None, None, None, None)
        for i in range(10)
    ]
    rev_rows.append(
        ("org1", "ds1", "w-small", "wf1", 1, d + timedelta(hours=1),
         "state_change", "s2", "Doing", "s1", "Todo", None, None, None, None)
    )
    revs = spark.createDataFrame(
        rev_rows,
        "org_id string, datasource_id string, work_item_id string, "
        "workflow_id string, revision int, changed_date timestamp, "
        "type string, status_id string, status_name string, "
        "from_status_id string, from_status_name string, assignee string, "
        "blocked_reason string, discarded_reason string, flagged boolean",
    )
    steps = spark.createDataFrame(
        [
            ("wf1", "s1", "Todo", 1, "queue", "proposed", True),
            ("wf1", "s2", "Doing", 2, "active", "inprogress", True),
            ("wf1", "s3", "Done", 3, "queue", "completed", True),
        ],
        "workflow_id string, step_id string, step_name string, "
        "step_order int, state_type string, state_category string, "
        "active boolean",
    )
    events = spark.createDataFrame(
        [("wf1", 1, 2, 3)],
        "workflow_id string, arrival_point_order int, "
        "commitment_point_order int, departure_point_order int",
    )

    stats = {}
    states, snaps = transform_work_items(
        items, revs, steps, events, stats_out=stats,
        whale_routing=True, whale_threshold=5
    )
    rows = {r["work_item_id"]: r for r in states.collect()}
    assert stats["n_whales"] == 1  # w-whale: 10 revisions + synthetic > 5
    assert set(rows) == {"w-whale", "w-small"}
    # the whale went through the pandas branch and still produced dates
    assert rows["w-whale"]["departure_date"] is not None
    # unrouted run must agree exactly
    states_plain, _ = transform_work_items(
        items, revs, steps, events, whale_routing=False
    )
    plain = {r["work_item_id"]: r for r in states_plain.collect()}
    assert {k: v.asDict() for k, v in rows.items()} == {
        k: v.asDict() for k, v in plain.items()
    }


def test_split_by_history_length_null_keys_route_to_normal(spark):
    """NULL work_item_id rows must not vanish: isin() is NULL (not
    false) for NULL keys, so the split coalesces — null-keyed rows go
    to the normal branch in BOTH the isin and join strategies."""
    from falcon_metrics_etl_spark.operators.event_dates import (
        split_by_history_length,
    )

    rows = [(None, i, _dt("2024-01-01"), 1) for i in range(3)]
    rows += [("itm-whale", i, _dt("2024-01-02"), 2) for i in range(80)]
    rows += [("itm-a", 1, _dt("2024-01-03"), 1)]
    tagged = spark.createDataFrame(
        rows,
        "work_item_id string, revision int, changed_date timestamp, zone int",
    )
    normal, whales, stats = split_by_history_length(tagged, threshold=50)
    assert stats["n_whales"] == 1
    assert normal.filter("work_item_id IS NULL").count() == 3
    assert whales.filter("work_item_id IS NULL").count() == 0
    # nothing dropped overall
    assert normal.count() + whales.count() == tagged.count()


def test_split_null_key_whale_counted_separately_routes_normal(spark):
    """A NULL-keyed group over the threshold cannot reach the whales
    branch (isin/collect_list drop NULLs; the >cap path is a semi
    join) — the stats must SAY so: it is excluded from n_whales and
    reported as n_null_key_whales, and its rows stay in the normal
    branch rather than being dropped."""
    from falcon_metrics_etl_spark.operators.event_dates import (
        split_by_history_length,
    )

    rows = [(None, i, _dt("2024-01-01"), 1) for i in range(60)]
    rows += [("itm-whale", i, _dt("2024-01-02"), 2) for i in range(70)]
    rows += [("itm-a", 1, _dt("2024-01-03"), 1)]
    tagged = spark.createDataFrame(
        rows,
        "work_item_id string, revision long, changed_date timestamp, zone int",
    )
    normal, whales, stats = split_by_history_length(tagged, threshold=50)
    assert stats == {
        "max_history_len": 70, "n_revisions": 131, "n_whales": 1,
        "n_null_key_whales": 1,
    }
    assert whales is not None
    assert [r[0] for r in whales.select("work_item_id").distinct().collect()] \
        == ["itm-whale"]
    # NULL rows survive in the normal branch (60 NULL + 1 itm-a)
    assert normal.count() == 61
    assert normal.filter("work_item_id IS NULL").count() == 60


def test_split_only_null_key_whale_is_passthrough(spark):
    """If the ONLY over-threshold group is NULL-keyed, there is no
    routable whale: the split returns the single-branch passthrough
    while the telemetry still reports the violation."""
    from falcon_metrics_etl_spark.operators.event_dates import (
        split_by_history_length,
    )

    rows = [(None, i, _dt("2024-01-01"), 1) for i in range(60)]
    tagged = spark.createDataFrame(
        rows,
        "work_item_id string, revision long, changed_date timestamp, zone int",
    )
    normal, whales, stats = split_by_history_length(tagged, threshold=50)
    assert whales is None
    assert normal is tagged
    assert stats == {
        "max_history_len": 60, "n_revisions": 60, "n_whales": 0,
        "n_null_key_whales": 1,
    }
