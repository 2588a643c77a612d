"""Config-driven conditional field mapping — SURVEY.md F17.

The reference's chain-of-responsibility field mapper copies a source
field to a destination field iff every equality condition on the row
holds. EVERY mapper in the chain executes in order (map() runs its own
executeMap then delegates, field_mapper.ts:10-19), so when several
maps match the same destination the LAST one wins; a mapper with no
conditions maps nothing (ts:61 early-return — the DoNothing shape).
(/root/reference/src/configuration/field_map/field_mapper.ts:1-101;
fieldMaps config table sql/full_ddl.sql:391-401).

Spark shape: the tiny fieldMaps dim is collected once at plan-build
time and each mapper becomes one stacked when()/otherwise()
projection — config becomes Catalyst expressions (the optimizer
collapses the projection stack), so the mapping costs nothing at
scale while keeping the chain's SEQUENTIAL visibility: each mapper's
conditions read the row as mutated by the mappers before it, exactly
like the reference's delegating map() calls.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_field_maps(items: DataFrame, field_maps: list[dict]) -> DataFrame:
    """field_maps: ordered [{srcField, dstField, conditions: {col: value}}].

    Every map runs in order; a map whose conditions all hold (against
    the CURRENT row state, i.e. including earlier maps' writes) copies
    src to dst, so the last matching map wins. A map with no
    conditions never fires (ts:61 DoNothing); when nothing fires the
    existing destination value (if the column exists) or null is kept.
    """
    out = items
    for m in field_maps:
        conds = [
            F.col(col).eqNullSafe(F.lit(val))
            for col, val in m.get("conditions", {}).items()
        ]
        if not conds:  # conditionless mapper maps nothing (ts:61)
            continue
        dst = m["dstField"]
        fallback = F.col(dst) if dst in out.columns else F.lit(None)
        all_conds = reduce(lambda a, b: a & b, conds)
        out = out.withColumn(
            dst, F.when(all_conds, F.col(m["srcField"])).otherwise(fallback)
        )
    return out
