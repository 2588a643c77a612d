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
time and compiled into a single chained when()/otherwise() column
expression per destination — config becomes Catalyst expressions, so
the mapping costs nothing at scale.
"""

from __future__ import annotations

from collections import defaultdict
from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_field_maps(items: DataFrame, field_maps: list[dict]) -> DataFrame:
    """field_maps: ordered [{srcField, dstField, conditions: {col: value}}].

    For each destination column, every map runs in order and the LAST
    one whose conditions all hold supplies the value (reference chain
    semantics); a map with no conditions never fires; when nothing
    fires the existing destination value (if the column exists) or
    null is kept.
    """
    by_dst: dict[str, list[dict]] = defaultdict(list)
    for m in field_maps:
        by_dst[m["dstField"]].append(m)

    out = items
    for dst, maps in by_dst.items():
        fallback = F.col(dst) if dst in out.columns else F.lit(None)
        expr = fallback
        for m in maps:  # forward wrap: the last map lands outermost = wins
            conds = [
                F.col(col).eqNullSafe(F.lit(val))
                for col, val in m.get("conditions", {}).items()
            ]
            if not conds:  # conditionless mapper maps nothing (ts:61)
                continue
            all_conds = reduce(lambda a, b: a & b, conds)
            expr = F.when(all_conds, F.col(m["srcField"])).otherwise(expr)
        out = out.withColumn(dst, expr)
    return out
