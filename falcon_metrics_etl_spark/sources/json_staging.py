"""Raw JSON staging reader — SURVEY.md S7.

The reference stages one JSON object per raw item at key
``org/type-datasource/workItemId.json`` plus JSON-array files for id
lists (src/workitem/s3_client.ts:38-61, 63-95). The bronze parquet
lake replaces staging for steady-state reads, but the engine still
needs the landing-format read for backfills/replays:

- explicit schema (never inferSchema at 100 TB — one listing pass to
  sample would read the world);
- PERMISSIVE parse with a ``_corrupt_record`` column, so one malformed
  payload quarantines instead of failing the backfill;
- the S3-key structure recovered as columns from the file path — the
  reference encodes (org, kind, datasource, workItemId) in the key,
  not the payload.

``multiLine=true`` because each staged object is a pretty-printed
file, not a JSONL line; Spark then parallelizes per FILE, which is the
right unit here (items are small, file count is the scale axis — pair
with sinks/compaction.py after landing to bronze).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

CORRUPT_COL = "_corrupt_record"

# .../org/kind-datasource/workItemId.json
_ORG_RE = r".*/([^/]+)/[^/]+/[^/]+\.json$"
_KIND_RE = r".*/[^/]+/([^-]+)-[^/]+/[^/]+\.json$"
_DS_RE = r".*/[^/]+/[^-]+-([^/]+)/[^/]+\.json$"
_ITEM_RE = r".*/([^/]+)\.json$"


def read_json_staging(
    spark: SparkSession,
    path: str,
    schema: str,
    with_keys: bool = True,
) -> DataFrame:
    """Read per-item JSON staging files under ``path``.

    ``schema`` is the payload schema (DDL string) WITHOUT the corrupt
    column; malformed files land with payload columns null and the raw
    text in ``_corrupt_record``.
    """
    reader = (
        spark.read.schema(f"{schema}, {CORRUPT_COL} string")
        .option("multiLine", "true")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    df = reader.json(f"{path.rstrip('/')}/*/*/*.json")
    if with_keys:
        # input_file_name() returns a percent-encoded URI — decode each
        # extracted part so ids with spaces/#/% match their true values
        # (reference workItemIds are arbitrary strings). url_decode is
        # FORM decoding ('+' -> space), but URI encoding leaves '+'
        # literal — protect it as %2B first so both round-trip.
        def uri_decode(col):
            return F.url_decode(F.regexp_replace(col, r"\+", "%2B"))

        f = F.input_file_name()
        df = (
            df.withColumn("org_id", uri_decode(F.regexp_extract(f, _ORG_RE, 1)))
            .withColumn("item_kind", uri_decode(F.regexp_extract(f, _KIND_RE, 1)))
            .withColumn("datasource_id", uri_decode(F.regexp_extract(f, _DS_RE, 1)))
            .withColumn("work_item_id", uri_decode(F.regexp_extract(f, _ITEM_RE, 1)))
        )
    return df


def read_id_list_staging(spark: SparkSession, path: str) -> DataFrame:
    """Read JSON-array id-list files (s3_client.ts:63-95): each file is
    a JSON array of workItemId strings keyed
    ``org--datasource--context.json``. One row per id, with the key
    parts recovered from the filename.

    wholetext + from_json(array<string>) + explode — arrays of SCALARS
    don't row-ize through the schema'd JSON reader (that path needs
    objects), and wholetext keeps one task per file, the natural unit.
    """
    raw = spark.read.option("wholetext", "true").text(
        f"{path.rstrip('/')}/*.json"
    )
    name = F.regexp_extract(F.input_file_name(), r".*/([^/]+)\.json$", 1)
    parts = F.split(name, "--")
    return (
        raw.select(
            F.explode(F.from_json(F.col("value"), "array<string>")).alias(
                "work_item_id"
            ),
            parts.getItem(0).alias("org_id"),
            parts.getItem(1).alias("datasource_id"),
            parts.getItem(2).alias("context_id"),
        )
    )
