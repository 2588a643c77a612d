"""Revision-stream operators — SURVEY.md W1/W9/W10/W11/W12, P4, A2.

All are window/filter expressions over the per-item ordered history:
one shuffle on work_item_id, then per-partition sorted scans.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# revision types (src/jiracloud/process/revision_processor.ts:77-83)
STATE_CHANGE = "state_change"
ASSIGNEE_CHANGE = "assignee_change"
BLOCKED_REASON = "blocked_reason"
DISCARDED_REASON = "discarded_reason"
FLAGGED = "flagged"

REVISION_TYPES = (STATE_CHANGE, ASSIGNEE_CHANGE, BLOCKED_REASON, DISCARDED_REASON, FLAGGED)


def item_window(
    item_col: str = "work_item_id",
    order_cols: tuple = ("changed_date", "revision"),
) -> Window:
    """W1 — canonical per-item ordering window."""
    return Window.partitionBy(item_col).orderBy(*order_cols)


def filter_revision_types(revisions: DataFrame, *types: str) -> DataFrame:
    """P4 — keep only the configured revision types
    (revision_processor.ts:381-417)."""
    return revisions.filter(F.col("type").isin(*types))


def synthesize_initial_revision(
    revisions: DataFrame,
    work_items: DataFrame,
    item_col: str = "work_item_id",
    with_assignee_row: bool = False,
) -> DataFrame:
    """W9 — prepend a revision 0 at creation, because Jira logs no event
    at creation (revision_processor.ts:450-499). The synthetic row takes
    the item's created date and the first revision's from-status; items
    with no state_change revisions use the item's current status.

    ``with_assignee_row=True`` replicates the full Jira synthesis
    (ts:460-499): a SECOND revision-0 row of type assignee_change
    carrying the creation-time assignee — the first assignee_change's
    fromString, i.e. who held the item before its first reassignment
    (null when the item was never reassigned, exactly the reference's
    undefined) — and the reference's closing truthy filter applied to
    the WHOLE concatenated history like ts:495-498, synthetic and raw
    rows alike. On parse_changelog output the raw side passes
    unchanged (typed rows are non-empty by the emission branch and
    unflag rows carry literal 'flagged'), but revisions fed from any
    other source with empty/null statusId or statusName drop here
    exactly as the reference would drop them. Default False keeps the
    generic single-row W9 shape shared by the non-Jira sources."""
    w = item_window(item_col)
    first_state = (
        revisions.filter(F.col("type") == STATE_CHANGE)
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            item_col,
            F.col("from_status_id").alias("first_from_id"),
            F.col("from_status_name").alias("first_from_name"),
        )
    )

    def synth(rev_type, assignee_col):
        return work_items.join(first_state, item_col, "left").select(
            F.col("org_id"),
            F.col("datasource_id"),
            F.col(item_col),
            F.lit(0).alias("revision"),
            F.col("created_date").alias("changed_date"),
            F.lit(rev_type).alias("type"),
            F.coalesce(F.col("first_from_id"), F.col("status_id")).alias(
                "status_id"
            ),
            F.coalesce(F.col("first_from_name"), F.col("status_name")).alias(
                "status_name"
            ),
            F.lit(None).cast("string").alias("from_status_id"),
            F.lit(None).cast("string").alias("from_status_name"),
            assignee_col.alias("assignee"),
            F.lit(None).cast("string").alias("blocked_reason"),
            F.lit(None).cast("string").alias("discarded_reason"),
            F.lit(None).cast("boolean").alias("flagged"),
        )

    initial = synth(STATE_CHANGE, F.lit(None).cast("string"))
    if with_assignee_row:
        first_assignee = (
            revisions.filter(F.col("type") == ASSIGNEE_CHANGE)
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") == 1)
            .select(
                item_col, F.col("from_status_name").alias("_first_assignee")
            )
        )
        assignee_initial = synth(
            ASSIGNEE_CHANGE, F.lit(None).cast("string")
        ).drop("assignee").join(first_assignee, item_col, "left").withColumn(
            "assignee", F.col("_first_assignee")
        ).drop("_first_assignee")
        initial = initial.unionByName(
            assignee_initial.select(*initial.columns)
        )
    out = revisions.unionByName(initial, allowMissingColumns=True)
    if with_assignee_row:
        # ts:495-498 — the truthy close filter, over the full
        # concatenated history (raw + synthetic), as the reference does
        out = out.filter(
            F.col("status_id").isNotNull()
            & (F.col("status_id") != "")
            & F.col("status_name").isNotNull()
            & (F.col("status_name") != "")
        )
    return out


def dedupe_consecutive(
    revisions: DataFrame,
    value_col: str,
    item_col: str = "work_item_id",
    order_cols: tuple = ("changed_date", "revision"),
) -> DataFrame:
    """A2/W10 — keep only the first of each run of equal values per item
    (src/azureboards/data/revision_utils.ts:73-107; kanbanize transition
    compression transform_processor.ts:293-312).

    Null-safe: a change from/to null counts as a change (<=> operator).
    """
    w = item_window(item_col, order_cols)
    prev = F.lag(F.col(value_col)).over(w)
    rn = F.row_number().over(w)
    return (
        revisions.withColumn("_prev", prev)
        .withColumn("_rn", rn)
        .filter((F.col("_rn") == 1) | ~F.col(value_col).eqNullSafe(F.col("_prev")))
        .drop("_prev", "_rn")
    )


def exclude_before_date(
    items: DataFrame,
    departure_col: str = "departure_date",
    exclude_col: str = "exclude_before_date",
) -> DataFrame:
    """P7 — drop items whose departure day is strictly before the
    item's configured exclude-before day
    (process_revision_utils.ts:8-22; endOf('day') comparison = date
    comparison). DORMANT in the reference — the call site is commented
    out (revision_processor.ts:290-296) — provided with the same
    default-off posture: callers opt in explicitly."""
    drop = (
        F.col(departure_col).isNotNull()
        & F.col(exclude_col).isNotNull()
        & (F.to_date(departure_col) < F.to_date(exclude_col))
    )
    return items.filter(~drop)


def blocked_revisions(
    revisions: DataFrame,
    blocked_col: str,
    item_col: str = "work_item_id",
    order_cols: tuple = ("revision",),
) -> DataFrame:
    """A2 (ADO blocked stream) — src/azureboards/data/revision_utils.ts:3-39.

    The reference reduces each item's history against the LAST KEPT
    revision with an entry gate: nothing is kept until the first
    "blocked" value (non-null and != 'No'); from there every value
    change is kept (including changes to null/'No', flagged=false).
    Window form: drop rows before the first blocked value, keep the
    boundary row, then dedupe consecutive values — equivalent because
    after the first kept row the reducer's last-kept value always
    equals the previous row's value.

    Adds ``flagged`` (value is non-null and != 'No') to kept rows.
    """
    w = item_window(item_col, order_cols)
    item = Window.partitionBy(item_col)
    val = F.col(blocked_col)
    is_blocked = val.isNotNull() & (val != "No")
    df = (
        revisions.withColumn("_rn", F.row_number().over(w))
        .withColumn("_first_rn", F.min(F.when(is_blocked, F.col("_rn"))).over(item))
        .withColumn("_prev", F.lag(val).over(w))
    )
    kept = df.filter(
        F.col("_first_rn").isNotNull()
        & (F.col("_rn") >= F.col("_first_rn"))
        & (
            (F.col("_rn") == F.col("_first_rn"))
            | ~val.eqNullSafe(F.col("_prev"))
        )
    )
    return kept.withColumn("flagged", is_blocked).drop("_rn", "_first_rn", "_prev")


# flag marker values the reference recognizes (jc_issue.ts:75-78)
FLAG_MARKERS = ("Impediment", "Impedimento")


def is_flag_value(field: Column) -> Column:
    """F11 known-field flag detection: the field is array-typed and its
    first element's ``value`` is a flag marker
    (revision_processor.ts:162-166, 1038-1053)."""
    return (F.size(field) > 0) & F.element_at(field, 1)["value"].isin(
        *FLAG_MARKERS
    )


def discover_flag_fields(
    items: DataFrame,
    fields_col: str = "fields",
    id_col: str = "work_item_id",
) -> DataFrame:
    """F11 generic flagged-field discovery — scan the raw fields map
    (``map<string, array<struct<value:string>>>``) for keys whose first
    element's ``value`` is a flag marker, the fallback the reference
    runs when no flag field is configured (jc_issue.ts:820-859: iterate
    every custom field of every issue, remember which one carried
    Impediment/Impedimento).

    Returns one row per (item, field_key) hit. Pure higher-order-
    function scan (map_filter + explode) — map-only, no shuffle, no
    Python; callers aggregate to elect the winning field id. At 100 TB
    this is a single pass over the raw column with everything else
    pruned.
    """
    flagged_keys = F.map_keys(
        F.map_filter(F.col(fields_col), lambda k, v: is_flag_value(v))
    )
    return items.select(
        F.col(id_col), F.explode(flagged_keys).alias("field_key")
    )


def custom_field_revisions(
    revisions: DataFrame,
    field_col: str,
    item_col: str = "work_item_id",
    order_cols: tuple = ("revision",),
) -> DataFrame:
    """A2 (ADO blocked/discarded-reason stream) —
    src/azureboards/data/revision_utils.ts:112-145: null values are
    never emitted and never become the comparison baseline, so this is
    filter(non-null) THEN dedupe-consecutive (order matters: a null
    between two equal values must not resurrect the second).

    Adds ``field_value`` (the kept value) like the reference.
    """
    filtered = revisions.filter(F.col(field_col).isNotNull())
    deduped = dedupe_consecutive(filtered, field_col, item_col, order_cols)
    return deduped.withColumn("field_value", F.col(field_col))


def last_change_of_day(
    revisions: DataFrame,
    item_col: str = "work_item_id",
    date_col: str = "changed_date",
) -> DataFrame:
    """W11 — collapse multiple same-day changes to the last
    (process_revision_utils.ts:28-45)."""
    w = Window.partitionBy(item_col, F.to_date(F.col(date_col))).orderBy(
        F.col(date_col).desc(), F.col("revision").desc()
    )
    return (
        revisions.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def densify_daily(
    revisions: DataFrame,
    item_col: str = "work_item_id",
    date_col: str = "changed_date",
) -> DataFrame:
    """W12 — daily filler densification: one synthetic row per whole day
    between a revision and the next (jiracloud/process/utils.ts:131-157).
    Needed to reproduce day-grain CFD from sparse snapshots.

    ``sequence`` + ``explode`` keeps this fully distributed; output rows
    carry is_filler=true and the source revision's values.
    """
    w = item_window(item_col, (date_col, "revision"))
    next_date = F.lead(F.col(date_col)).over(w)
    with_next = revisions.withColumn("_next_date", next_date)
    fillers = (
        with_next.filter(
            F.col("_next_date").isNotNull()
            & (F.datediff(F.to_date("_next_date"), F.to_date(date_col)) > 1)
        )
        .withColumn(
            "_fill_date",
            F.explode(
                F.sequence(
                    F.date_add(F.to_date(date_col), 1),
                    F.date_add(F.to_date("_next_date"), -1),
                )
            ),
        )
        .withColumn(date_col, F.col("_fill_date").cast("timestamp"))
        .withColumn("is_filler", F.lit(True))
        .drop("_fill_date")
    )
    originals = with_next.withColumn("is_filler", F.lit(False))
    return originals.unionByName(fillers).drop("_next_date")


_MICROS_PER_DAY = 24 * 3600 * 1_000_000
# revision types that both emit and terminate filler runs
# (jiracloud/process/utils.ts:132: allowedTypes)
FILLER_TYPES = (STATE_CHANGE, FLAGGED)


def filler_counts(
    revisions: DataFrame,
    item_col: str = "work_item_id",
    date_col: str = "changed_date",
    type_col: str = "type",
    order_cols: tuple = ("changed_date", "revision"),
) -> DataFrame:
    """W12 exact — per-revision filler count with the reference's full
    semantics (jiracloud/process/utils.ts:131-157, getFillersCount):

    - only state_change / flagged revisions get fillers at all;
    - the gap runs to the NEXT revision of those same types — blocked/
      discarded-reason rows in between are skipped, not boundaries;
    - count = floor(hours-to-next / 24) on the absolute instants (an
      IST-midnight history counts the same as a UTC one).

    One window pass: next-allowed instant via first(ignorenulls) over
    the [current+1, end) frame. Adds ``fillers`` (long).
    """
    allowed = F.col(type_col).isin(*FILLER_TYPES)
    w_after = item_window(item_col, order_cols).rowsBetween(
        1, Window.unboundedFollowing
    )
    next_allowed_us = F.first(
        F.when(allowed, F.unix_micros(F.col(date_col))), ignorenulls=True
    ).over(w_after)
    count = F.when(
        allowed & next_allowed_us.isNotNull(),
        F.floor(
            (next_allowed_us - F.unix_micros(F.col(date_col)))
            / F.lit(_MICROS_PER_DAY)
        ),
    ).otherwise(F.lit(0))
    return revisions.withColumn("fillers", count.cast("long"))


def densify_fillers_exact(
    revisions: DataFrame,
    item_col: str = "work_item_id",
    date_col: str = "changed_date",
    type_col: str = "type",
    order_cols: tuple = ("changed_date", "revision"),
) -> DataFrame:
    """W12 exact row generation: one synthetic row per 24 h step after
    each filler-eligible revision (timestamps at +k*24h preserve the
    source row's time of day, the reference consumer's convention).
    ``sequence``+``explode`` — distributed, no Python."""
    counted = filler_counts(revisions, item_col, date_col, type_col, order_cols)
    fillers = (
        counted.filter(F.col("fillers") > 0)
        .withColumn(
            "_k",
            F.explode(F.sequence(F.lit(1), F.col("fillers").cast("int"))),
        )
        .withColumn(
            date_col,
            F.timestamp_micros(
                F.unix_micros(F.col(date_col))
                + F.col("_k") * F.lit(_MICROS_PER_DAY)
            ),
        )
        .withColumn("is_filler", F.lit(True))
        .drop("_k")
    )
    return (
        counted.withColumn("is_filler", F.lit(False))
        .unionByName(fillers)
        .drop("fillers")
    )


def parse_changelog(
    items: DataFrame,
    blocked_reason_field_id: str | None = None,
    discarded_reason_field_id: str | None = None,
    item_col: str = "work_item_id",
) -> DataFrame:
    """Raw Jira changelog -> typed revision rows (getRevisions,
    revision_processor.ts:335-448) — the bronze->silver entrance.

    ``items`` carries ``item_col`` plus a ``changelog`` column:
    array<struct<id, created, items: array<struct<field, fieldId,
    from, fromString, to, toString>>>> — the open-world bronze shape
    (SURVEY section 1.2). Two emission rules, re-expressed as explode +
    when()/otherwise() tagging (pure Catalyst, no Python):

    - an 'unflag' (field='Flagged' with to/toString both STRICTLY the
      empty string — the reference tests ``item.to === '' &&
      item.toString === ''``, ts:357-361, so a Flagged entry cleared
      with nulls emits nothing) emits a FLAGGED row with flagged=false
      and statusId/Name 'flagged' (ts:357-379);
    - an entry with non-empty to/toString emits its typed row when the
      field is status / assignee / Flagged or the fieldId matches the
      org's configured blocked/discarded reason fields (ts:380-438);
      the status branch wins when several match (the reference's
      if/else chain order).

    revision = the history id (Jira's monotone numeric changelog id,
    kept numeric for the per-item ordering windows); changedDate =
    history.created in UTC (session zone).
    """
    h = (
        items.select(item_col, F.explode("changelog").alias("h"))
        .select(
            item_col,
            F.col("h.id").cast("long").alias("revision"),
            F.to_timestamp(F.col("h.created")).alias("changed_date"),
            F.explode("h.items").alias("it"),
        )
    )
    it = F.col("it")
    # strict '' equality, NOT JS-falsy: `=== ''` in the reference means
    # a null-cleared Flagged entry must emit nothing (ts:357-361)
    strict_empty = lambda c: c.isNotNull() & (c == "")  # noqa: E731
    nonempty = lambda c: c.isNotNull() & (c != "")  # noqa: E731

    unflag = h.filter(
        (it.getField("field") == "Flagged")
        & strict_empty(it.getField("to"))
        & strict_empty(it.getField("toString"))
    ).select(
        item_col,
        "revision",
        "changed_date",
        F.lit(FLAGGED).alias("type"),
        F.lit("flagged").alias("status_id"),
        F.lit("flagged").alias("status_name"),
        it.getField("from").alias("from_status_id"),
        it.getField("fromString").alias("from_status_name"),
        F.lit(None).cast("string").alias("assignee"),
        F.lit(None).cast("string").alias("blocked_reason"),
        F.lit(None).cast("string").alias("discarded_reason"),
        F.lit(False).alias("flagged"),
    )

    field = it.getField("field")
    field_id = it.getField("fieldId")
    to_s = it.getField("toString")
    rev_type = (
        F.when(field == "status", F.lit(STATE_CHANGE))
        .when(field == "Flagged", F.lit(FLAGGED))
        .when(field == "assignee", F.lit(ASSIGNEE_CHANGE))
    )
    if blocked_reason_field_id:
        rev_type = rev_type.when(
            field_id == blocked_reason_field_id, F.lit(BLOCKED_REASON)
        )
    if discarded_reason_field_id:
        rev_type = rev_type.when(
            field_id == discarded_reason_field_id, F.lit(DISCARDED_REASON)
        )

    typed = (
        h.filter(nonempty(it.getField("to")) & nonempty(to_s))
        .withColumn("type", rev_type)
        .filter(F.col("type").isNotNull())
        .select(
            item_col,
            "revision",
            "changed_date",
            "type",
            it.getField("to").alias("status_id"),
            to_s.alias("status_name"),
            it.getField("from").alias("from_status_id"),
            it.getField("fromString").alias("from_status_name"),
            F.when(F.col("type") == ASSIGNEE_CHANGE, to_s).alias("assignee"),
            F.when(F.col("type") == BLOCKED_REASON, to_s).alias(
                "blocked_reason"
            ),
            F.when(F.col("type") == DISCARDED_REASON, to_s).alias(
                "discarded_reason"
            ),
            (F.col("type") == FLAGGED).alias("flagged"),
        )
    )
    return unflag.unionByName(typed)
