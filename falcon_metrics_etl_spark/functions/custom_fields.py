"""Polymorphic custom-field extraction — SURVEY.md F9.

Jira custom-field payloads are open-world JSON: null | string | number
| bool | {name} | {value} | {displayName} | {key} | array of those |
arbitrary object. Behavioral reference:
/root/reference/src/jiracloud/process/translate_customfield.ts:3-116
(verified by its 416-line test file).

Implementation: an Arrow-batched pandas UDF over the raw JSON string —
chosen over a when()-cascade because exact parity on weird payloads
(stringify fallback, array-of-object name/value precedence) is the
contract here, and the UDF runs once per configured field at ingest,
not in the analytic hot path.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

CUSTOM_FIELD_VALUES_TYPE = T.ArrayType(T.StringType())

CUSTOM_FIELD_SCHEMA = T.ArrayType(
    T.StructType(
        [
            T.StructField("datasourceFieldName", T.StringType()),
            T.StructField("displayName", T.StringType()),
            T.StructField("datasourceFieldValue", T.StringType()),
            T.StructField("type", T.StringType()),
        ]
    )
)


def _translate_value(parsed, field_name: str = "customfield") -> list:
    """One field payload -> list of extracted string values.

    Mirrors translate_customfield.ts:
    - null -> literal 'null' (a valid response, kept as a marker row);
    - array -> one value per element (string kept; object by 'name'
      then 'value'; else JSON stringified — unconditionally,
      translate_customfield.ts:26-47);
    - object -> 'name' | 'value' | 'displayName' | 'key' precedence;
    - scalar string/number/bool -> stringified scalar;
    - any other TOP-LEVEL object -> JSON stringified only when the
      field name starts with 'customfield'
      (translate_customfield.ts:105-113); otherwise the field is
      dropped ([] — system fields of unknown shape produce no rows).
    """
    if parsed is None:
        return ["null"]
    if isinstance(parsed, list):
        out = []
        for item in parsed:
            if isinstance(item, str):
                out.append(item)
            elif isinstance(item, dict) and "name" in item:
                out.append(_scalar(item["name"]))
            elif isinstance(item, dict) and "value" in item:
                out.append(_scalar(item["value"]))
            else:
                out.append(json.dumps(item, separators=(",", ":")))
        return out
    if isinstance(parsed, dict):
        for key in ("name", "value", "displayName", "key"):
            if key in parsed:
                return [_scalar(parsed[key])]
        if field_name is not None and field_name.startswith("customfield"):
            return [json.dumps(parsed, separators=(",", ":"))]
        return []
    if isinstance(parsed, bool):
        return ["true" if parsed else "false"]
    if isinstance(parsed, (str, int, float)):
        return [_scalar(parsed)]
    if field_name is not None and field_name.startswith("customfield"):
        return [json.dumps(parsed, separators=(",", ":"))]
    return []


def _scalar(v) -> str:
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float) and v.is_integer():
        return str(int(v))
    return str(v)


@F.pandas_udf(CUSTOM_FIELD_VALUES_TYPE)
def _extract_values_udf(raw_json: pd.Series, field_name: pd.Series) -> pd.Series:
    def one(s, name):
        if s is None:
            return None
        try:
            parsed = json.loads(s)
        except (ValueError, TypeError):
            parsed = s  # raw unparseable string treated as scalar
        return _translate_value(parsed, name)

    return pd.Series(
        [one(s, n) for s, n in zip(raw_json, field_name)], dtype="object"
    )


def extract_custom_field_values(raw_json: Column, field_name=None) -> Column:
    """Vectorized: raw JSON payload string -> array of extracted values.

    A missing field (null input) yields null (the reference returns []
    when the field is absent); a JSON 'null' yields ['null'].
    ``field_name`` (Column or str literal) gates the unknown-object
    stringify fallback on the 'customfield' name prefix; when omitted
    the fallback is taken (the permissive default for ad-hoc use).
    """
    if field_name is None:
        name_col = F.lit("customfield")
    elif isinstance(field_name, str):
        name_col = F.lit(field_name)
    else:
        name_col = field_name
    return _extract_values_udf(raw_json, name_col)


def translate_custom_fields(
    items: DataFrame,
    field_configs: list[dict],
    raw_col: str = "custom_fields_raw",
) -> DataFrame:
    """Apply the extraction for every enabled custom-field config and
    collect results into one customFields array column
    (state_load_processor_aurora.ts stores them EAV + inline JSONB;
    here: one ArrayType(Struct) column, EAV view via explode).

    field_configs: [{datasourceFieldName, displayName, type}] — from the
    custom_field_configs dim (a tiny config table, collected once at
    plan-build time, like the reference preloads its config).
    """
    parts = []
    for cfg in field_configs:
        name = cfg["datasourceFieldName"]
        values = extract_custom_field_values(
            F.col(raw_col).getItem(name), field_name=name
        )
        parts.append(
            F.transform(
                values,
                lambda v: F.struct(
                    F.lit(name).alias("datasourceFieldName"),
                    F.lit(cfg["displayName"]).alias("displayName"),
                    v.alias("datasourceFieldValue"),
                    F.lit(cfg["type"]).alias("type"),
                ),
            )
        )
    combined = F.flatten(
        F.filter(F.array(*parts), lambda a: a.isNotNull())
    ) if parts else F.lit(None).cast(CUSTOM_FIELD_SCHEMA)
    return items.withColumn("custom_fields", combined)


def explode_custom_fields_eav(items: DataFrame, key_cols: list[str]) -> DataFrame:
    """EAV view: one row per (item, field, value) — the customFields
    table shape (sql/full_ddl.sql:249-262)."""
    return items.select(
        *key_cols, F.explode(F.col("custom_fields")).alias("cf")
    ).select(
        *key_cols,
        F.col("cf.datasourceFieldName").alias("datasource_field_name"),
        F.col("cf.displayName").alias("display_name"),
        F.col("cf.datasourceFieldValue").alias("datasource_field_value"),
        F.col("cf.type").alias("type"),
    )
