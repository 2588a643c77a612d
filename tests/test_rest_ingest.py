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
