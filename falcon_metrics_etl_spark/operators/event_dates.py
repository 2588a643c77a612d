"""Event-date extraction — SURVEY.md W2/W3/W4.

Given each work item's ordered revision history and the workflow's
arrival/commitment/departure point orders, derive arrivalDate /
commitmentDate / departureDate (+ isDelayed). Reference semantics:
/root/reference/src/configuration/event_date_extractor.ts:117-368.

Two implementations:

- ``first_entry_event_dates`` — the simplified first-zone-entry pass
  (pure Catalyst expressions; one groupBy, map-side combinable).
- ``extract_event_dates`` — the exact lookahead semantics (same-day
  commitment bounce, delayed detection, departure lookahead, invariant
  back-fill) as a grouped-map pandas UDF. Histories are small (1e2-1e3
  revisions/item), so the per-group pandas frame is tiny; the input is
  projected to 4 narrow columns before the shuffle to bound transfer.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# zone ordinals (event_date_extractor.ts:49-115 partitions steps into
# before-arrival / arrival / commitment / departure zones)
ZONE_BEFORE_ARRIVAL = 0
ZONE_ARRIVAL = 1
ZONE_COMMITMENT = 2
ZONE_DEPARTURE = 3


def zone_of(order_col: Column, arrival: Column, commitment: Column, departure: Column) -> Column:
    """Classify a step order into its workflow zone."""
    return (
        F.when(order_col < arrival, F.lit(ZONE_BEFORE_ARRIVAL))
        .when(order_col < commitment, F.lit(ZONE_ARRIVAL))
        .when(order_col < departure, F.lit(ZONE_COMMITMENT))
        .otherwise(F.lit(ZONE_DEPARTURE))
    )


def step_category(order_col: Column, arrival: Column, commitment: Column, departure: Column) -> Column:
    """W3 — step category from order vs the three points
    (src/common/process_revision_utils.ts:82-114)."""
    return (
        F.when(order_col < arrival, F.lit("preceding"))
        .when(order_col < commitment, F.lit("proposed"))
        .when(order_col < departure, F.lit("inprogress"))
        .otherwise(F.lit("completed"))
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
    """W5 — state category *as of* a revision's changedDate
    (src/utils/date_utils.ts:67-95)."""
    return (
        F.when(departure.isNotNull() & (changed >= departure), F.lit("completed"))
        .when(commitment.isNotNull() & (changed >= commitment), F.lit("inprogress"))
        .when(arrival.isNotNull() & (changed >= arrival), F.lit("proposed"))
        .otherwise(F.lit("preceding"))
    )


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
# Exact semantics (lookahead rules) — grouped-map pandas UDF
# --------------------------------------------------------------------------

EVENT_DATES_SCHEMA = (
    "work_item_id string, arrival_date timestamp, commitment_date timestamp, "
    "departure_date timestamp, is_delayed boolean, delayed_revision int"
)


def _extract_one_item(pdf: pd.DataFrame) -> pd.DataFrame:
    """Exact event-date derivation for one item's full ordered history.

    Behavioral spec (event_date_extractor.ts:117-368):
    - scan revisions ascending by (changed_date, revision);
    - arrival   = first entry into the arrival zone; reset if a later
      revision drops before arrival while no commitment/departure has
      been found yet (ts:188-201);
    - commitment = first entry into the commitment zone, UNLESS a
      revision later the *same UTC day* returns to the arrival zone or
      earlier (same-day bounce is ignored, ts:225-285); a *later-day*
      return to before-commitment after a commitment marks the item
      delayed and remembers the delaying revision (ts:241-253) — the
      commitment date is kept;
    - departure = first entry into the departure zone with NO later
      revision in any earlier zone (ts:288-322);
    - back-fill invariants arrival<=commitment<=departure: a missing
      arrival inherits commitment (or departure), a missing commitment
      of a departed item inherits the departure date (ts:331-365).
    """
    pdf = pdf.sort_values(["changed_date", "revision"], kind="stable")
    zones = pdf["zone"].to_numpy()
    dates = pdf["changed_date"].to_numpy()
    revs = pdf["revision"].to_numpy()
    n = len(pdf)

    arrival = None
    commitment = None
    departure = None
    is_delayed = False
    delayed_revision = None

    for i in range(n):
        z = zones[i]
        if arrival is None and commitment is None and departure is None:
            if z == ZONE_ARRIVAL or z == ZONE_COMMITMENT or z == ZONE_DEPARTURE:
                if z >= ZONE_ARRIVAL:
                    pass
        # arrival: first revision at/past the arrival zone
        if arrival is None and z >= ZONE_ARRIVAL:
            arrival = dates[i]
        # reset arrival if we drop before arrival with nothing later found
        if (
            arrival is not None
            and commitment is None
            and departure is None
            and z == ZONE_BEFORE_ARRIVAL
        ):
            arrival = None
        # commitment with same-day-bounce lookahead
        if commitment is None and z >= ZONE_COMMITMENT:
            same_day_bounce = False
            day_i = dates[i].astype("datetime64[D]")
            for j in range(i + 1, n):
                if zones[j] >= ZONE_COMMITMENT:
                    break
                day_j = dates[j].astype("datetime64[D]")
                if day_j == day_i:
                    same_day_bounce = True
                break
            if not same_day_bounce:
                commitment = dates[i]
        # delayed: later-day return below commitment after a commitment
        if (
            commitment is not None
            and not is_delayed
            and z < ZONE_COMMITMENT
            and dates[i].astype("datetime64[D]") > commitment.astype("datetime64[D]")
        ):
            is_delayed = True
            delayed_revision = int(revs[i])
        # departure: first departure-zone entry with no later earlier-zone revision
        if departure is None and z == ZONE_DEPARTURE:
            if not (zones[i + 1 :] < ZONE_DEPARTURE).any():
                departure = dates[i]

    # invariant back-fill (arrival <= commitment <= departure)
    if departure is not None and commitment is None:
        commitment = departure
    if commitment is not None and arrival is None:
        arrival = commitment
    if (
        commitment is not None
        and arrival is not None
        and arrival > commitment
    ):
        arrival = commitment
    if (
        departure is not None
        and commitment is not None
        and commitment > departure
    ):
        commitment = departure

    return pd.DataFrame(
        {
            "work_item_id": [pdf["work_item_id"].iloc[0]],
            "arrival_date": [pd.Timestamp(arrival) if arrival is not None else pd.NaT],
            "commitment_date": [
                pd.Timestamp(commitment) if commitment is not None else pd.NaT
            ],
            "departure_date": [
                pd.Timestamp(departure) if departure is not None else pd.NaT
            ],
            "is_delayed": [is_delayed],
            "delayed_revision": [delayed_revision],
        }
    )


def extract_event_dates(
    revisions: DataFrame,
    workflow_events: DataFrame,
    item_col: str = "work_item_id",
    order_col: str = "step_order",
    date_col: str = "changed_date",
    revision_col: str = "revision",
) -> DataFrame:
    """W2 exact: per-item event dates with the reference's lookahead rules.

    ``workflow_events`` carries (work_item_id-joinable key ->
    arrival/commitment/departure point orders); it is broadcast. The
    revision input is projected to (item, zone, date, revision) before
    the groupBy so the shuffle carries 4 narrow columns only.
    """
    joined = revisions.join(F.broadcast(workflow_events), "workflow_id")
    narrow = joined.select(
        F.col(item_col).alias("work_item_id"),
        zone_of(
            F.col(order_col),
            F.col("arrival_point_order"),
            F.col("commitment_point_order"),
            F.col("departure_point_order"),
        ).alias("zone"),
        F.col(date_col).alias("changed_date"),
        F.col(revision_col).alias("revision"),
    )
    return narrow.groupBy("work_item_id").applyInPandas(
        _extract_one_item, schema=EVENT_DATES_SCHEMA
    )
