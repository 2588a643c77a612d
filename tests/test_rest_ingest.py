"""S1-S6 paginated ingestion: offsets-DataFrame paging, cursor paging
under the time budget, nested-page flattening (sources/rest_ingest.py).
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from falcon_metrics_etl_spark.sources.rest_ingest import (
    cursor_paged_ingest,
    fake_page_fetcher,
    flatten_nested_page,
    paged_ingest,
)

SCHEMA = "id long, key string, updated long"


def test_paged_ingest_fetches_every_page_exactly_once(spark):
    df = paged_ingest(
        spark, fake_page_fetcher(total=123, page_size=50), 123, 50, SCHEMA
    )
    rows = df.collect()
    assert len(rows) == 123
    assert {r.id for r in rows} == set(range(123))
    assert all(r._corrupt_record is None for r in rows)
    # page-size-50 scan of 123 items = 3 pages, one task each max
    assert df.rdd.getNumPartitions() <= 3


def test_paged_ingest_zero_total_is_empty_with_schema(spark):
    df = paged_ingest(spark, fake_page_fetcher(0, 50), 0, 50, SCHEMA)
    assert df.count() == 0
    assert set(df.columns) == {"id", "key", "updated", "_corrupt_record"}


def test_paged_ingest_quarantines_bad_payloads(spark):
    def bad_fetcher(page_start):
        return ["{not json", json.dumps({"id": 7, "key": "K", "updated": 1})]

    df = paged_ingest(spark, bad_fetcher, 1, 50, SCHEMA)
    good = df.filter(F.col("_corrupt_record").isNull()).collect()
    bad = df.filter(F.col("_corrupt_record").isNotNull()).collect()
    assert [r.id for r in good] == [7]
    assert len(bad) == 1 and bad[0]._corrupt_record == "{not json"


def _cursor_fetcher(pages):
    """pages: list of lists of dicts; cursor is the stringified index."""

    def _fetch(cursor):
        i = int(cursor) if cursor is not None else 0
        rows = [json.dumps(d) for d in pages[i]]
        nxt = str(i + 1) if i + 1 < len(pages) else None
        return rows, nxt

    return _fetch


def test_cursor_paged_ingest_drains_all_pages(spark):
    pages = [[{"id": 1}], [{"id": 2}, {"id": 3}], [{"id": 4}]]
    df, resume = cursor_paged_ingest(
        spark,
        _cursor_fetcher(pages),
        "id long",
        start_time_ms=0,
        run_delay_minutes=60,
        now_ms=lambda: 0,
    )
    assert resume is None
    assert sorted(r.id for r in df.collect()) == [1, 2, 3, 4]


def test_cursor_paged_ingest_time_budget_returns_resume_cursor(spark):
    pages = [[{"id": 1}], [{"id": 2}], [{"id": 3}]]
    clock = iter([10_000_000, 20_000_000, 30_000_000])
    # budget exhausted immediately after the first page
    df, resume = cursor_paged_ingest(
        spark,
        _cursor_fetcher(pages),
        "id long",
        start_time_ms=0,
        run_delay_minutes=1,
        now_ms=lambda: next(clock),
    )
    assert resume == "1"  # resume from the second page next run
    assert [r.id for r in df.collect()] == [1]


def test_flatten_nested_page_explodes_mr_commits(spark):
    df = spark.createDataFrame(
        [
            (1, [{"sha": "a"}, {"sha": "b"}]),
            (2, []),
        ],
        "mr_id long, commits array<struct<sha: string>>",
    )
    flat = flatten_nested_page(df, "commits", ["mr_id"])
    got = {(r.mr_id, r.sha) for r in flat.collect()}
    assert got == {(1, "a"), (1, "b"), (2, None)}


# ---------------------------------------------------------------------------
# Native Python Data Source (spark.read.format("falcon_rest"))
# ---------------------------------------------------------------------------
def test_rest_datasource_reads_pages_as_partitions(spark):
    from falcon_metrics_etl_spark.sources.rest_datasource import (
        RestPagedDataSource,
    )

    spark.dataSource.register(RestPagedDataSource)
    df = (
        spark.read.format("falcon_rest")
        .option("fetcher", "synthetic")
        .option("total", 120)
        .option("page_size", 50)
        .load()
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    # 120 items over pages [0,50,100] (page sizes 50/50/20), one
    # corrupt payload per page
    assert len(good) == 120
    assert len(bad) == 3
    assert {r["_corrupt_record"] for r in bad} == {
        "not-json-0", "not-json-50", "not-json-100",
    }
    assert {r["work_item_id"] for r in good} == {f"WI-{i}" for i in range(120)}
    assert df.rdd.getNumPartitions() == 3  # one task per page


def test_rest_datasource_honours_explicit_schema_and_pruning(spark):
    from falcon_metrics_etl_spark.sources.rest_datasource import (
        RestPagedDataSource,
    )

    spark.dataSource.register(RestPagedDataSource)
    df = (
        spark.read.format("falcon_rest")
        .option("fetcher", "synthetic")
        .option("total", 10)
        .option("page_size", 5)
        .schema("work_item_id string, state string")
        .load()
    )
    got = {r["work_item_id"]: r["state"] for r in df.collect()}
    # corrupt payloads are dropped when no _corrupt_record column exists
    assert len(got) == 10
    assert got["WI-1"] == "doing"


def test_rest_datasource_stream_cursor_resume(spark, tmp_path):
    """The offset log IS the ingestion cursor: a first availableNow run
    drains pages 0..total, a restart from the same checkpoint emits
    nothing new (ST1 resume semantics)."""
    from falcon_metrics_etl_spark.sources.rest_datasource import (
        RestPagedDataSource,
    )

    spark.dataSource.register(RestPagedDataSource)
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")

    def drain():
        stream = (
            spark.readStream.format("falcon_rest")
            .option("fetcher", "synthetic")
            .option("total", 100)
            .option("page_size", 40)
            .load()
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(out).collect()

    first = drain()
    assert len([r for r in first if r["_corrupt_record"] is None]) == 100
    # restart from the same checkpoint: cursor already at 100 -> the
    # second drain appends nothing (ST1 resume)
    second = drain()
    assert len(second) == len(first)


def test_rest_datasource_zero_total_returns_empty(spark):
    from falcon_metrics_etl_spark.sources.rest_datasource import (
        RestPagedDataSource,
    )

    spark.dataSource.register(RestPagedDataSource)
    df = spark.read.format("falcon_rest").option("fetcher", "synthetic").load()
    assert df.collect() == []


def test_rest_datasource_corrupt_column_position_independent(spark):
    from falcon_metrics_etl_spark.sources.rest_datasource import (
        RestPagedDataSource,
    )

    spark.dataSource.register(RestPagedDataSource)
    df = (
        spark.read.format("falcon_rest")
        .option("fetcher", "synthetic")
        .option("total", 5)
        .option("page_size", 5)
        .schema("work_item_id string, _corrupt_record string, state string")
        .load()
    )
    rows = df.collect()
    good = [r for r in rows if r["_corrupt_record"] is None]
    assert len(good) == 5
    # columns land by NAME even with _corrupt_record mid-schema
    assert {r["work_item_id"] for r in good} == {f"WI-{i}" for i in range(5)}
    assert all(r["state"] in ("todo", "doing", "done") for r in good)
    bad = [r for r in rows if r["_corrupt_record"] is not None]
    assert [r["_corrupt_record"] for r in bad] == ["not-json-0"]
    assert bad[0]["work_item_id"] is None and bad[0]["state"] is None


def test_rest_stream_reader_equal_offsets_yields_empty_page():
    """A microbatch planned with equal start/end offsets must return an
    explicit empty partition (PySpark substitutes [None] for an empty
    list and read(None) crashes) — same guard as the batch reader."""
    from pyspark.sql.types import StructType

    from falcon_metrics_etl_spark.sources.rest_datasource import (
        RestPagedStreamReader,
    )

    r = RestPagedStreamReader(
        StructType.fromDDL("work_item_id string"),
        {"total": "0", "page_size": "10", "fetcher": "synthetic"},
    )
    parts = r.partitions({"offset": 5}, {"offset": 5})
    assert len(parts) == 1 and parts[0].size == 0
    assert list(r.read(parts[0])) == []
