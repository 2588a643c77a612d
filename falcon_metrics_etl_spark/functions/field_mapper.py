"""Config-driven conditional field mapping — SURVEY.md F17.

The reference's chain-of-responsibility field mapper copies a source
field to a destination field iff every equality condition on the row
holds, first matching map wins
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

    For each destination column, maps are tried in order; the first one
    whose conditions all hold supplies the value; otherwise the existing
    destination value (if the column exists) or null is kept.
    """
    by_dst: dict[str, list[dict]] = defaultdict(list)
    for m in field_maps:
        by_dst[m["dstField"]].append(m)

    out = items
    for dst, maps in by_dst.items():
        fallback = F.col(dst) if dst in out.columns else F.lit(None)
        expr = fallback
        for m in reversed(maps):  # build chain so earlier maps win
            conds = [
                F.col(col).eqNullSafe(F.lit(val))
                for col, val in m.get("conditions", {}).items()
            ]
            all_conds = reduce(lambda a, b: a & b, conds, F.lit(True))
            expr = F.when(all_conds, F.col(m["srcField"])).otherwise(expr)
        out = out.withColumn(dst, expr)
    return out
