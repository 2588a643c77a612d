"""Config-driven conditional field mapping — SURVEY.md F17.

The reference's chain-of-responsibility field mapper copies a source
field to a destination field iff every equality condition on the row
holds. EVERY mapper in the chain executes in order (map() runs its own
executeMap then delegates, field_mapper.ts:10-19), so when several
maps match the same destination the LAST one wins; a mapper with no
conditions maps nothing (ts:61 early-return — the DoNothing shape).

Visibility: ``executeMap(source, destination, conditionsSource)``
keeps THREE separate objects (ts:56-72; the unit suite calls
``map(source, dest)`` with distinct objects) — conditions evaluate
against ``conditionsSource`` and source reads come from ``source``,
while writes go only to ``destination``. Earlier mappers' writes are
therefore NEVER visible to later conditions or source reads; only the
destination value accumulates.
(/root/reference/src/configuration/field_map/field_mapper.ts:1-101;
fieldMaps config table sql/full_ddl.sql:391-401).

Spark shape: the tiny fieldMaps dim is collected once at plan-build
time and every destination compiles to ONE chained when()/otherwise()
expression over the ORIGINAL input columns, applied in a single
projection (``withColumns``) — snapshot semantics by construction,
and the optimizer sees one flat expression per destination.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_field_maps(items: DataFrame, field_maps: list[dict]) -> DataFrame:
    """field_maps: ordered [{srcField, dstField, conditions: {col: value}}].

    Every map runs in order; conditions and source reads evaluate
    against the ORIGINAL input row (reference three-object separation,
    ts:56-72), writes accumulate per destination so the last matching
    map wins. A map with no conditions never fires (ts:61 DoNothing);
    when nothing fires the existing destination value (if the column
    exists) or null is kept.
    """
    exprs: dict[str, F.Column] = {}
    for m in field_maps:
        conds = [
            F.col(col).eqNullSafe(F.lit(val))
            for col, val in m.get("conditions", {}).items()
        ]
        if not conds:  # conditionless mapper maps nothing (ts:61)
            continue
        dst = m["dstField"]
        prev = exprs.get(
            dst, F.col(dst) if dst in items.columns else F.lit(None)
        )
        all_conds = reduce(lambda a, b: a & b, conds)
        exprs[dst] = F.when(all_conds, F.col(m["srcField"])).otherwise(prev)
    return items.withColumns(exprs) if exprs else items
