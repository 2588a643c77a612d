"""Event-date extraction — SURVEY.md W2/W3/W4/W5.

Given each work item's ordered revision history and the workflow's
arrival/commitment/departure point orders, derive arrivalDate /
commitmentDate / departureDate (+ isDelayed). Behavioral reference:
/root/reference/src/configuration/event_date_extractor.ts:117-368 and
src/common/process_revision_utils.ts:60-114 (re-expressed, not
translated — a batched pandas path replaces the per-item JS loop).

Three layers:

- ``zone_of``/``step_category``/... — pure Catalyst expressions.
- ``first_entry_event_dates`` — the simplified first-zone-entry pass
  (single conditional-min aggregation; map-side combinable).
- ``extract_event_dates`` — the exact lookahead semantics (same-day
  commitment bounce, delayed detection, departure lookahead, invariant
  back-fill) in Python: hash-repartition + sortWithinPartitions +
  ``mapInPandas`` with a cross-batch group carry, so whole Arrow
  batches (not 1e2-row per-item groups) cross the Python boundary; the
  input is projected to 4 narrow columns before the shuffle and the
  only shuffle keys on the natural key (work_item_id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# zone ordinals (event_date_extractor.ts:49-115 partitions workflow
# steps into before-arrival / arrival / commitment / departure zones
# by configured point orders)
ZONE_BEFORE_ARRIVAL = 0
ZONE_ARRIVAL = 1
ZONE_COMMITMENT = 2
ZONE_DEPARTURE = 3


def zone_of(order_col: Column, arrival: Column, commitment: Column, departure: Column) -> Column:
    """Classify a step order into its workflow zone (null order -> null:
    steps unknown to the workflow belong to no zone; null point orders
    — a workflow missing from workflow_events — likewise classify
    nothing, rather than letting the null comparisons fall through
    ``otherwise`` into the departure zone)."""
    any_null = (
        order_col.isNull()
        | arrival.isNull()
        | commitment.isNull()
        | departure.isNull()
    )
    return F.when(any_null, F.lit(None).cast("int")).otherwise(
        F.when(order_col < arrival, F.lit(ZONE_BEFORE_ARRIVAL))
        .when(order_col < commitment, F.lit(ZONE_ARRIVAL))
        .when(order_col < departure, F.lit(ZONE_COMMITMENT))
        .otherwise(F.lit(ZONE_DEPARTURE))
    )


def step_category(order_col: Column, arrival: Column, commitment: Column, departure: Column) -> Column:
    """W3 — step category from order vs the three *effective* point
    orders (process_revision_utils.ts:82-114). Pass the recalculated
    orders from ``effective_point_orders`` for reference parity.

    Null inputs (status not a workflow step / workflow without point
    orders) return null — the same guard as ``zone_of``; without it the
    null comparisons skip every branch and ``otherwise`` mislabels a
    never-started item 'completed'."""
    any_null = (
        order_col.isNull()
        | arrival.isNull()
        | commitment.isNull()
        | departure.isNull()
    )
    return F.when(any_null, F.lit(None).cast("string")).otherwise(
        F.when(order_col < arrival, F.lit("preceding"))
        .when(order_col < commitment, F.lit("proposed"))
        .when(order_col < departure, F.lit("inprogress"))
        .otherwise(F.lit("completed"))
    )


def effective_point_orders(
    workflow_steps: DataFrame,
    workflow_events: DataFrame,
    key: str = "workflow_id",
) -> DataFrame:
    """Recalculated point orders per workflow: the min step order inside
    each configured zone (process_revision_utils.ts:60-80). A zone with
    no steps yields +Infinity (double), matching Math.min() semantics.

    Both inputs are small config dims; the output is broadcast-joined.
    The events side carries an explicit broadcast hint: workflow_steps
    is often a perf_checkpoint'd frame (auto-mapped dim), and a
    checkpointed relation has no AQE size stats, so without the hint
    the planner falls back to a sort-merge join on two dim tables.
    """
    steps = workflow_steps.join(F.broadcast(workflow_events), key)
    inf = F.lit(float("inf"))
    order = F.col("step_order").cast("double")
    return steps.groupBy(key).agg(
        F.coalesce(
            F.min(
                F.when(
                    (order >= F.col("arrival_point_order"))
                    & (order < F.col("commitment_point_order")),
                    order,
                )
            ),
            inf,
        ).alias("effective_arrival_order"),
        F.coalesce(
            F.min(
                F.when(
                    (order >= F.col("commitment_point_order"))
                    & (order < F.col("departure_point_order")),
                    order,
                )
            ),
            inf,
        ).alias("effective_commitment_order"),
        F.coalesce(
            F.min(F.when(order >= F.col("departure_point_order"), order)),
            inf,
        ).alias("effective_departure_order"),
    )


def state_category_from_dates(
    arrival: str = "arrival_date",
    commitment: str = "commitment_date",
    departure: str = "departure_date",
) -> Column:
    """W4 — state category from event-date presence
    (src/utils/date_utils.ts:42-65)."""
    return (
        F.when(F.col(departure).isNotNull(), F.lit("completed"))
        .when(F.col(commitment).isNotNull(), F.lit("inprogress"))
        .when(F.col(arrival).isNotNull(), F.lit("proposed"))
        .otherwise(F.lit("preceding"))
    )


def point_in_time_state_category(
    changed: Column,
    arrival: Column,
    commitment: Column,
    departure: Column,
) -> Column:
    """W5 — state category *as of* a revision's changedDate, in the
    reference's exact guard ORDER (src/utils/date_utils.ts:67-95):
    arrival is checked first, so a comparison date before arrival is
    'preceding' even when it is past an (out-of-order) commitment or
    departure — observable when commitment precedes arrival, which the
    event-date rules permit (a zone-2 acceptance before the effective
    zone-1 arrival)."""
    return (
        F.when(arrival.isNull() | (changed < arrival), F.lit("preceding"))
        .when(commitment.isNull() | (changed < commitment), F.lit("proposed"))
        .when(departure.isNull() | (changed < departure), F.lit("inprogress"))
        .otherwise(F.lit("completed"))
    )


def is_delayed_snapshot(revision: Column, delayed_revision: Column) -> Column:
    """W8 — a snapshot is delayed iff its revision >= the item's
    delaying revision (process_revision_utils.ts:47-52)."""
    return F.when(
        delayed_revision.isNotNull() & (revision >= delayed_revision), F.lit(True)
    ).otherwise(F.lit(False))


def first_entry_event_dates(
    revisions: DataFrame,
    item_col: str,
    order_col: str,
    date_col: str,
    arrival_point: int,
    commitment_point: int,
    departure_point: int,
) -> DataFrame:
    """W2-lite: event date = first revision at/past each point order.

    A single conditional-min aggregation: partial-aggregates map-side,
    shuffles one row per item — the cheapest possible plan shape.
    """
    order = F.col(order_col)
    date = F.col(date_col)
    return revisions.groupBy(item_col).agg(
        F.min(F.when(order >= arrival_point, date)).alias("arrival_date"),
        F.min(F.when(order >= commitment_point, date)).alias("commitment_date"),
        F.min(F.when(order >= departure_point, date)).alias("departure_date"),
    )


# --------------------------------------------------------------------------
# Exact semantics (lookahead rules) — batched pandas path
# --------------------------------------------------------------------------

EVENT_DATES_SCHEMA = (
    "work_item_id string, arrival_date timestamp, commitment_date timestamp, "
    "departure_date timestamp, is_delayed boolean, delayed_revision int"
)

_LOW_ZONES = (ZONE_BEFORE_ARRIVAL, ZONE_ARRIVAL)


def _same_utc_day(a: np.datetime64, b: np.datetime64) -> bool:
    return a.astype("datetime64[D]") == b.astype("datetime64[D]")


def _extract_core(zones, dates, revs):
    """Array-level derivation for ONE item (rows already ordered by
    (changed_date, revision)); returns the 5 result fields as plain
    values. Split from the pandas wrappers so the batch path builds no
    per-item DataFrames."""
    n = len(zones)
    arrival = commitment = departure = None
    is_delayed = False
    delayed_revision = None

    for i in range(n):
        z = zones[i]
        if np.isnan(z):
            continue
        if (
            z == ZONE_BEFORE_ARRIVAL
            and arrival is not None
            and commitment is None
            and departure is None
        ):
            arrival = None
        if arrival is None and z == ZONE_ARRIVAL:
            arrival = dates[i]
        if commitment is None and z == ZONE_COMMITMENT:
            ignore_same_day = False
            delayed = False
            delayed_rev = None
            for j in range(i + 1, n):
                zj = zones[j]
                if not np.isnan(zj) and zj in _LOW_ZONES:
                    if not _same_utc_day(dates[j], dates[i]):
                        delayed = True
                        delayed_rev = revs[j]
                    else:
                        delayed = False
                        ignore_same_day = True
                else:
                    delayed = False
            is_delayed = False
            if not ignore_same_day:
                commitment = dates[i]
                if delayed:
                    is_delayed = True
                    delayed_revision = delayed_rev
        if departure is None and z == ZONE_DEPARTURE:
            later = zones[i + 1 :]
            returns_to_earlier_zone = bool(
                np.any(later[~np.isnan(later)] < ZONE_DEPARTURE)
            )
            if not returns_to_earlier_zone:
                departure = dates[i]

    # invariant back-fill (ts:331-365)
    if (departure is not None or commitment is not None) and arrival is None:
        arrival = commitment if commitment is not None else departure
    if arrival is not None and commitment is None and departure is not None:
        commitment = arrival
    if commitment is not None and departure is not None and commitment > departure:
        commitment = departure
    if commitment is not None and arrival is not None and arrival > commitment:
        arrival = commitment

    return (
        arrival,
        commitment,
        departure,
        is_delayed,
        int(delayed_revision) if delayed_revision is not None else None,
    )


def _extract_one_item(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact event-date derivation for one item's full ordered history.

    Behavioral spec (event_date_extractor.ts:117-368):
    - scan revisions ascending by changed_date (stable on revision);
    - arrival  = first arrival-zone revision (ts:203-211); reset when a
      before-arrival revision appears while neither commitment nor
      departure has been found (ts:188-201);
    - commitment = first commitment-zone candidate, skipped entirely if
      any later revision returns to the arrival/before zone on the
      *same UTC day* (ts:220-285). The candidate also decides delay:
      the item is delayed iff the LAST subsequent revision is an
      arrival/before-zone move on a different day ("delayed at time of
      extract", ts:241-277); the delaying revision is remembered;
    - departure = first departure-zone candidate with NO later revision
      in any earlier zone (ts:288-322);
    - back-fill invariants (ts:331-365): missing arrival inherits
      commitment (else departure); missing commitment of a departed
      item inherits the *arrival*; then clamp commitment<=departure and
      arrival<=commitment.
    - revisions whose step is unknown to the workflow belong to no zone
      (zone null): they trigger nothing directly, but in the delay scan
      they reset the delayed flag like any non-arrival revision.
    """
    pdf = pdf.sort_values(["changed_date", "revision"], kind="stable")
    zones = pdf["zone"].to_numpy(dtype="float64", na_value=np.nan)
    dates = pdf["changed_date"].to_numpy()
    revs = pdf["revision"].to_numpy()

    arrival, commitment, departure, is_delayed, delayed_revision = _extract_core(
        zones, dates, revs
    )

    def ts(v):
        return pd.Timestamp(v) if v is not None else pd.NaT

    return pd.DataFrame(
        {
            "work_item_id": [str(pdf["work_item_id"].iloc[0])],
            "arrival_date": [ts(arrival)],
            "commitment_date": [ts(commitment)],
            "departure_date": [ts(departure)],
            "is_delayed": [is_delayed],
            "delayed_revision": [delayed_revision],
        }
    )


def tag_zones(
    revisions: DataFrame,
    workflow_steps: DataFrame,
    workflow_events: DataFrame,
    key: str = "workflow_id",
) -> DataFrame:
    """J2 + zone classification: join each revision to its workflow step
    on (workflow_id, step id, step name) — IsSameWorkflowStepKey matches
    both id and name (src/data/work_item_type_aurora.ts:70-76) — then
    classify the step order into a zone using the configured point
    orders. Both config dims broadcast."""
    step_cols = [
        key,
        F.col("step_id").alias("status_id"),
        F.col("step_name").alias("status_name"),
        F.col("step_order"),
    ]
    if "state_type" in workflow_steps.columns:
        step_cols.append(F.col("state_type"))
    steps = workflow_steps.select(*step_cols)
    events = workflow_events.select(
        key,
        "arrival_point_order",
        "commitment_point_order",
        "departure_point_order",
    )
    joined = revisions.join(
        F.broadcast(steps), [key, "status_id", "status_name"], "left"
    ).join(F.broadcast(events), key, "left")
    return joined.withColumn(
        "zone",
        zone_of(
            F.col("step_order"),
            F.col("arrival_point_order"),
            F.col("commitment_point_order"),
            F.col("departure_point_order"),
        ),
    )


def _extract_many(pdf: pd.DataFrame) -> pd.DataFrame:
    """Batch extraction over rows pre-sorted by (work_item_id,
    changed_date, revision): item boundaries are array change-points,
    each slice runs the core, ONE output frame per batch."""
    ids = pdf["work_item_id"].to_numpy()
    zones = pdf["zone"].to_numpy(dtype="float64", na_value=np.nan)
    dates = pdf["changed_date"].to_numpy()
    revs = pdf["revision"].to_numpy()
    change = np.nonzero(ids[1:] != ids[:-1])[0] + 1
    starts = np.concatenate(([0], change))
    ends = np.concatenate((change, [len(ids)]))
    rows = []
    for s, e in zip(starts, ends):
        a, c, d, delayed, drev = _extract_core(
            zones[s:e], dates[s:e], revs[s:e]
        )
        rows.append((str(ids[s]), a, c, d, delayed, drev))
    out = pd.DataFrame(
        rows,
        columns=[
            "work_item_id", "arrival_date", "commitment_date",
            "departure_date", "is_delayed", "delayed_revision",
        ],
    )
    for c in ("arrival_date", "commitment_date", "departure_date"):
        out[c] = pd.to_datetime(out[c])
    return out


def _extract_partition(batches):
    """mapInPandas worker: items are contiguous within the partition
    (hash-partitioned + sorted), but an item's rows can straddle two
    Arrow batches — the trailing (possibly incomplete) item is carried
    into the next batch and flushed at end-of-partition."""
    carry = None
    for pdf in batches:
        if carry is not None and len(carry):
            pdf = pd.concat([carry, pdf], ignore_index=True)
        if not len(pdf):
            continue
        last_id = pdf["work_item_id"].iloc[-1]
        tail = pdf["work_item_id"] == last_id
        carry = pdf[tail]
        head = pdf[~tail]
        if len(head):
            yield _extract_many(head)
    if carry is not None and len(carry):
        yield _extract_many(carry)


def extract_event_dates(tagged_revisions: DataFrame) -> DataFrame:
    """W2 exact: per-item event dates with the reference's lookahead rules.

    Input must carry (work_item_id, changed_date, revision, zone) —
    produced by ``tag_zones``. Only those 4 columns shuffle.

    Plan shape: hash-repartition on work_item_id + sortWithinPartitions
    + ``mapInPandas`` — NOT ``groupBy().applyInPandas``, which ships
    one Arrow batch per group and pays ~3 ms/group on histories of
    10-1000 rows (48 s for 15k items; this path runs it in ~2 s). The
    per-item loop itself is unchanged (_extract_one_item).
    """
    narrow = tagged_revisions.select(
        F.col("work_item_id").cast("string"),
        F.col("changed_date"),
        F.col("revision").cast("int"),
        F.col("zone").cast("int"),
    )
    clustered = narrow.repartition("work_item_id").sortWithinPartitions(
        "work_item_id", "changed_date", "revision"
    )
    return clustered.mapInPandas(_extract_partition, schema=EVENT_DATES_SCHEMA)


# Routing threshold for the whale-history guard (observe_history_length):
# per-item ordered windows cannot be split by AQE, so one item with a
# pathologically long history serializes its partition (skew probe,
# SCALE.md: 1.68x under a manufactured 300k-revision item; real
# work-tracking histories are bounded ~300x lower). Items beyond this
# many revisions should route to extract_event_dates (mapInPandas — the
# per-item loop is O(n) without a sort-based window) or raise an alert.
WHALE_HISTORY_REVISIONS = 10_000


def observe_history_length(
    tagged_revisions: DataFrame, name: str = "history_stats"
) -> tuple[DataFrame, "Observation"]:
    """Whale-history ALERT signal: attach an ``Observation`` to the
    tagged history stream reporting ``max_history_len`` via
    ``max(revision) + 1`` — an O(1) aggregate piggybacking on whatever
    action runs next, no extra pass or shuffle — plus ``n_revisions``.

    VALIDITY: ``max(revision)+1`` bounds the longest history only when
    ``revision`` is a dense per-item index (e.g. the synthetic index
    used by the Kanbanize/compression paths and this repo's tests).
    The Jira path's ``parse_changelog`` emits the RAW changelog
    history id (operators/revisions.py — the reference does the same),
    which routinely exceeds any count threshold: those streams are NOT
    valid input for this signal and would alert spuriously. Routing
    decisions therefore never use this observation — use
    ``split_by_history_length`` (exact per-item row counts) instead;
    this stays as cheap telemetry for dense-index pipelines.
    Empty streams report 0 (max over nothing is NULL, coalesced).
    Returns (observed_df, observation)."""
    from pyspark.sql import Observation

    obs = Observation(name)
    observed = tagged_revisions.observe(
        obs,
        F.coalesce(
            F.max(F.col("revision").cast("long")) + 1, F.lit(0)
        ).alias("max_history_len"),
        F.count(F.lit(1)).alias("n_revisions"),
    )
    return observed, obs


# whale-id sets beyond this size stop being driver literals (isin) and
# become a broadcast semi/anti join instead — bounds driver transfer
_WHALE_ISIN_CAP = 1000


def history_length_stats(
    tagged_revisions: DataFrame,
    threshold: int = WHALE_HISTORY_REVISIONS,
    item_col: str = "work_item_id",
    with_whale_ids: bool = False,
) -> dict:
    """Exact per-item history-length telemetry in ONE column-pruned
    aggregate job: ``max_history_len``, ``n_revisions``, ``n_whales``
    (non-NULL-keyed groups over ``threshold`` — the routable ones),
    ``n_null_key_whales`` (NULL-keyed groups over the threshold, which
    always take the expr path). This is the monitoring hook for the
    data-model bound SCALE.md documents (~10^2-10^3 revisions/item in
    the reference's model, event_date_extractor.ts:142-154): pipelines
    record it per run so a bound violation is SEEN, not assumed.

    ``with_whale_ids=True`` additionally collects the routable whale
    ids (sliced to the isin cap + 1) for ``split_by_history_length``.
    """
    lens = tagged_revisions.groupBy(item_col).agg(
        F.count(F.lit(1)).alias("h_len")
    )
    over = F.col("h_len") > threshold
    key_null = F.col(item_col).isNull()
    aggs = [
        F.coalesce(F.max("h_len"), F.lit(0)).alias("max_history_len"),
        F.coalesce(F.sum("h_len"), F.lit(0)).alias("n_revisions"),
        F.sum(
            F.when(over & ~key_null, 1).otherwise(0)
        ).alias("n_whales"),
        F.sum(
            F.when(over & key_null, 1).otherwise(0)
        ).alias("n_null_key_whales"),
    ]
    if with_whale_ids:
        aggs.append(
            F.slice(
                F.collect_list(F.when(over, F.col(item_col))),
                1,
                _WHALE_ISIN_CAP + 1,
            ).alias("whale_ids")
        )
    row = lens.agg(*aggs).collect()[0]
    out = {
        "max_history_len": row["max_history_len"],
        "n_revisions": row["n_revisions"],
        "n_whales": row["n_whales"] or 0,
        "n_null_key_whales": row["n_null_key_whales"] or 0,
    }
    if with_whale_ids:
        out["whale_ids"] = row["whale_ids"]
    return out


def split_by_history_length(
    tagged_revisions: DataFrame,
    threshold: int = WHALE_HISTORY_REVISIONS,
) -> tuple[DataFrame, DataFrame | None, dict]:
    """Exact count-based whale split: partition the tagged history
    stream into (normal, whales) on per-item ROW COUNTS — valid for
    any ``revision`` encoding, unlike ``observe_history_length``'s
    dense-index bound.

    One extra column-pruned aggregate job runs eagerly (count per
    work_item_id partial-aggregates map-side; the final agg is one
    row). The whale-id read is control-plane — items with >threshold
    revisions are by definition few; the collected array is sliced to
    ``_WHALE_ISIN_CAP + 1`` driver-side, and beyond the cap the split
    switches from pushed-down ``isin`` literals to a broadcast
    semi/anti join on the whale-id frame.

    Returns (normal, whales_or_None, stats) where stats carries exact
    ``max_history_len`` / ``n_revisions`` / ``n_whales`` /
    ``n_null_key_whales``. ``n_whales`` counts only NON-NULL-keyed
    groups — the ones the whales branch can actually receive; a
    NULL-keyed group over the threshold is counted separately in
    ``n_null_key_whales`` and always takes the normal/expr path
    (collect_list drops NULLs and the >cap path is a left_anti/semi
    join, so NULL keys route normal either way — the stats now say
    so instead of disagreeing with the routing). whales is None when
    no routable item exceeds the threshold — callers then keep the
    single-branch plan with zero overhead beyond the count job."""
    row = history_length_stats(
        tagged_revisions, threshold, with_whale_ids=True
    )
    stats = {
        k: row[k]
        for k in (
            "max_history_len", "n_revisions", "n_whales",
            "n_null_key_whales",
        )
    }
    whale_ids = row["whale_ids"]
    if not whale_ids:
        return tagged_revisions, None, stats
    if len(whale_ids) <= _WHALE_ISIN_CAP:
        # coalesce: isin is NULL (not false) for NULL keys, and a bare
        # ~isin/isin pair would silently DROP null-keyed rows from both
        # branches; null keys route to the normal branch, matching the
        # left_anti semantics of the >cap join path below
        is_whale = F.coalesce(
            F.col("work_item_id").isin(list(whale_ids)), F.lit(False)
        )
        return (
            tagged_revisions.filter(~is_whale),
            tagged_revisions.filter(is_whale),
            stats,
        )
    # materialize the count table once: without the checkpoint the
    # groupBy re-derives from the raw stream inside BOTH branch joins
    from falcon_metrics_etl_spark.session import perf_checkpoint

    whales_dim = F.broadcast(
        perf_checkpoint(
            tagged_revisions.groupBy("work_item_id")
            .agg(F.count(F.lit(1)).alias("h_len"))
            .filter(F.col("h_len") > threshold)
            .select("work_item_id")
        )
    )
    return (
        tagged_revisions.join(whales_dim, "work_item_id", "left_anti"),
        tagged_revisions.join(whales_dim, "work_item_id", "left_semi"),
        stats,
    )


def extract_event_dates_routed(
    tagged_revisions: DataFrame,
    threshold: int = WHALE_HISTORY_REVISIONS,
    stats_out: dict | None = None,
) -> DataFrame:
    """W2 with automatic whale routing: items whose history exceeds
    ``threshold`` revisions go through ``extract_event_dates``
    (mapInPandas), everything else through the whole-stage-codegen
    ``extract_event_dates_expr`` scale path; the branches union. With
    no whales (the overwhelmingly common case) the plan is exactly the
    expr path — the only overhead is the column-pruned count job in
    ``split_by_history_length``.

    MEASURED CAVEAT (SCALE.md, r6 skew probe): on a manufactured
    300k-revision whale the routing is a net LOSS — the expr path
    absorbs the whale at 1.46x (one serialized JVM window partition),
    while the pandas extractor costs 27x (Python per-row loop with
    per-day lookahead, ~100x the JVM per-row cost) and buffers the
    whole item in Python memory where WindowExec would spill. The
    split mechanism is kept because it is semantics-neutral, exactly
    counted, and the right scaffold if a faster whale destination
    (e.g. a vectorized extractor) lands; transform_work_items
    therefore defaults whale_routing=False."""
    normal, whales, stats = split_by_history_length(tagged_revisions, threshold)
    if stats_out is not None:
        stats_out.update(stats)
    out = extract_event_dates_expr(normal)
    if whales is not None:
        out = out.unionByName(extract_event_dates(whales))
    return out


def extract_event_dates_expr(tagged_revisions: DataFrame) -> DataFrame:
    """W2 exact semantics as pure Catalyst window expressions — the
    scale path (no Python in the plan; whole-stage codegen end to end).

    Equivalence argument, rule by rule (same spec as _extract_one_item):

    - commitment is *accepted* at row i iff zone=2 and no later
      same-UTC-day revision in zones {0,1}; acceptance depends only on
      the suffix, so "first accepted" is a conditional min.
    - departure is accepted at row i iff zone=3 and the suffix has no
      revision in zones {0,1,2}.
    - the arrival-reset rule fires at a zone-0 row only while no
      commitment/departure has been accepted at an earlier row; so the
      effective arrival is the first zone-1 row AFTER the last such
      zone-0 row.
    - delayed iff a commitment was accepted and the item's LAST revision
      is a zone-{0,1} move on a different UTC day than the commitment.

    Plan shape: ONE shuffle (hash on work_item_id) and ONE sort. The
    per-item windows order by (day, changed_date, revision) — the same
    total order as (changed_date, revision), because day is a monotone
    coarsening of changed_date — so the (work_item_id, day)-partitioned
    windows' required ordering is a prefix of the same sort and Spark
    inserts no further Sort. Suffix counts are computed as
    whole-partition total minus running prefix (two O(n) frames) rather
    than a shrinking [i+1, end] frame, which Spark re-evaluates per row.
    """
    big = F.lit(1 << 31)
    item = Window.partitionBy("work_item_id")
    w = item.orderBy("day", "changed_date", "revision")
    w_upto = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_all = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    day_w = Window.partitionBy("work_item_id", "day")
    day_upto = day_w.orderBy("changed_date", "revision").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )

    low = F.col("zone").isin(ZONE_BEFORE_ARRIVAL, ZONE_ARRIVAL)
    low_1 = F.when(low, 1).otherwise(0)
    low3_1 = F.when(F.col("zone") < ZONE_DEPARTURE, 1).otherwise(0)
    # single select per dependency layer: window expressions sharing a
    # (partition, order) spec collapse into one WindowExec pass each —
    # 4 passes here instead of one per withColumn
    df = tagged_revisions.select(
        F.col("work_item_id").cast("string").alias("work_item_id"),
        F.col("changed_date"),
        F.col("revision").cast("int").alias("revision"),
        F.col("zone").cast("int").alias("zone"),
        F.to_date("changed_date").alias("day"),
    ).select(
        "*",
        F.row_number().over(w).alias("rn"),
        (F.sum(low3_1).over(item) - F.sum(low3_1).over(w_upto)).alias(
            "later_low3"
        ),
        (F.sum(low_1).over(day_w) - F.sum(low_1).over(day_upto)).alias(
            "same_day_later_low"
        ),
        F.last("zone").over(w_all).alias("last_zone"),
        F.last("day").over(w_all).alias("last_day"),
        F.last("revision").over(w_all).alias("last_revision"),
    )

    accepted_c = (F.col("zone") == ZONE_COMMITMENT) & (
        F.col("same_day_later_low") == 0
    )
    accepted_d = (F.col("zone") == ZONE_DEPARTURE) & (F.col("later_low3") == 0)
    df = df.select(
        "*",
        F.min(F.when(accepted_c, F.col("rn"))).over(item).alias("c_rn"),
        F.min(F.when(accepted_d, F.col("rn"))).over(item).alias("d_rn"),
    ).withColumn(
        "reset_rn",
        F.max(
            F.when(
                (F.col("zone") == ZONE_BEFORE_ARRIVAL)
                & (F.col("rn") < F.coalesce(F.col("c_rn"), big))
                & (F.col("rn") < F.coalesce(F.col("d_rn"), big)),
                F.col("rn"),
            )
        ).over(item),
    )

    agg = df.groupBy("work_item_id").agg(
        F.min(
            F.when(
                (F.col("zone") == ZONE_ARRIVAL)
                & (F.col("rn") > F.coalesce(F.col("reset_rn"), F.lit(-1))),
                F.col("changed_date"),
            )
        ).alias("arrival_raw"),
        F.min(F.when(accepted_c, F.col("changed_date"))).alias("commitment_raw"),
        F.min(F.when(accepted_d, F.col("changed_date"))).alias("departure_raw"),
        F.any_value(F.col("last_zone")).alias("last_zone"),
        F.any_value(F.col("last_day")).alias("last_day"),
        F.any_value(F.col("last_revision")).alias("last_revision"),
    )

    delayed = (
        F.col("commitment_raw").isNotNull()
        & F.col("last_zone").isin(ZONE_BEFORE_ARRIVAL, ZONE_ARRIVAL)
        & (F.col("last_day") != F.to_date("commitment_raw"))
    )
    # invariant back-fill, same order as the procedural path
    a1 = F.coalesce("arrival_raw", "commitment_raw", "departure_raw")
    c1 = F.when(
        F.col("commitment_raw").isNull() & F.col("departure_raw").isNotNull(), a1
    ).otherwise(F.col("commitment_raw"))
    c2 = F.when(
        F.col("departure_raw").isNotNull() & (c1 > F.col("departure_raw")),
        F.col("departure_raw"),
    ).otherwise(c1)
    a2 = F.when(c2.isNotNull() & (a1 > c2), c2).otherwise(a1)

    return agg.select(
        "work_item_id",
        a2.alias("arrival_date"),
        c2.alias("commitment_date"),
        F.col("departure_raw").alias("departure_date"),
        F.coalesce(delayed, F.lit(False)).alias("is_delayed"),
        F.when(delayed, F.col("last_revision")).alias("delayed_revision"),
    )
