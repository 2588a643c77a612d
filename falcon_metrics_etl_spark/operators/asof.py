"""As-of and range joins — time-series join operators Spark lacks.

As-of join: every left row picks the single latest right row with
``right_ts <= left_ts`` per key (the point-in-time lookup behind
"which workflow config / exchange rate / state was current when this
event happened"). Databases ship it natively (DuckDB ASOF JOIN, kdb
aj); Spark has no operator, and the naive inequality join explodes to
O(N*M) per key before aggregation.

Implementation — union + ordered window, O((N+M) log(N+M)) per key and
ONE shuffle on the key:

1. tag right rows (side=1) and left rows (side=0), union on
   (key, ts) with right's payload columns null on left rows;
2. per key ordered by (ts, side DESC) — right rows sort BEFORE the
   left rows at the same timestamp, making the match inclusive
   (right_ts == left_ts wins, ASOF's backward convention;
   ``strict=True`` flips the tiebreak for right_ts < left_ts);
3. ``last(payload, ignorenulls=True)`` over the running frame carries
   the latest right payload forward onto each left row.

Range (interval) join: match events to [start, end) intervals without
the BroadcastNestedLoopJoin blowup, by exploding intervals into
fixed-width buckets and equi-joining on (key, bucket) before the
exact predicate — the shuffle keys on (key, bucket) so Catalyst plans
a hash join; bucket width trades replication for selectivity.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Optional[Sequence[str]] = None,
    strict: bool = False,
    how: str = "left",
) -> DataFrame:
    """Backward as-of join: latest right row with right_ts <= left_ts
    (or < when ``strict``) per key, appended to each left row.

    ``right_cols`` limits which right payload columns land on the
    output (default: all non-key, non-ts columns). ``how='inner'``
    drops left rows with no prior right row; 'left' keeps them with
    null payloads.
    """
    keys = list(on)
    payload = [
        c
        for c in (right_cols or right.columns)
        if c not in keys and c != right_ts
    ]
    overlap = set(payload) & set(left.columns)
    if overlap:
        raise ValueError(
            f"right payload columns {sorted(overlap)} already exist on "
            "the left side; project or rename before joining"
        )

    l_tagged = left.withColumn(_SIDE, F.lit(0)).withColumn(
        "__ts", F.col(left_ts)
    )
    for c in payload:
        l_tagged = l_tagged.withColumn(c, F.lit(None).cast(dict(right.dtypes)[c]))
    # a null right timestamp sorts nulls-first to the HEAD of every key
    # partition and its payload would be carried onto left rows that
    # have no real match — an as-of match needs a timestamp, so drop
    # such rows outright
    r_tagged = (
        right.filter(F.col(right_ts).isNotNull())
        .select(*keys, F.col(right_ts).alias("__ts"), *payload)
        .withColumn(_SIDE, F.lit(1))
    )
    for c in left.columns:
        if c not in keys and c != left_ts and c not in r_tagged.columns:
            r_tagged = r_tagged.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    if left_ts not in r_tagged.columns:
        r_tagged = r_tagged.withColumn(left_ts, F.lit(None).cast(dict(left.dtypes)[left_ts]))

    unioned = l_tagged.unionByName(r_tagged.select(*l_tagged.columns))

    # right rows first at equal ts for inclusive (<=); after for strict (<)
    side_order = F.col(_SIDE).desc() if not strict else F.col(_SIDE).asc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(F.col("__ts"), side_order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # one struct per right row, carried whole: the matched payload is
    # always a single right row's values, even when some are null
    carried = (
        unioned.withColumn(
            "__p",
            F.when(
                F.col(_SIDE) == 1, F.struct(*[F.col(c) for c in payload])
            ),
        )
        .withColumn("__p", F.last(F.col("__p"), ignorenulls=True).over(w))
    )
    for c in payload:
        carried = carried.withColumn(c, F.col(f"__p.{c}"))
    out = carried.filter(F.col(_SIDE) == 0).drop(_SIDE, "__ts")
    if how == "inner":
        out = out.filter(F.col("__p").isNotNull())
    return out.drop("__p")


def range_join_bucketed(
    events: DataFrame,
    intervals: DataFrame,
    on: Sequence[str],
    event_ts: str,
    start_col: str,
    end_col: str,
    bucket: str = "1 day",
) -> DataFrame:
    """Equi-joinable interval join: events matched to [start, end)
    intervals per key.

    Intervals explode into the ``bucket``-width grid cells they cover;
    events compute their single cell; the join keys on
    (keys..., cell) — a plain shuffled hash join — and the exact
    [start, end) predicate filters the bucket-boundary false
    positives. Replication factor = interval length / bucket width.
    """
    keys = list(on)
    cell = F.window(F.col(event_ts), bucket).start
    ev = events.withColumn("__cell", cell)
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    iv = intervals.withColumn(
        "__cell",
        F.explode(
            F.sequence(
                F.window(F.col(start_col), bucket).start,
                # end is exclusive: an interval ending exactly on a
                # boundary does not reach into that cell
                F.window(
                    F.col(end_col) - F.expr("INTERVAL 1 microsecond"), bucket
                ).start,
                F.expr(f"INTERVAL {bucket}"),
            )
        ),
    )
    joined = ev.join(iv, keys + ["__cell"])
    return joined.filter(
        (F.col(event_ts) >= F.col(start_col))
        & (F.col(event_ts) < F.col(end_col))
    ).drop("__cell")
