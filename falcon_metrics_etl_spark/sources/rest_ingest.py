"""Paginated REST/OData/GraphQL ingestion — SURVEY.md S1-S6 made
concrete as Spark jobs (not just "out of scope by design").

The reference fetches work items three ways:

- offset paging with a known total: compute count, chunk startAt
  offsets by page size, fetch 5 pages concurrently
  (src/jiracloud/data/jc_issue.ts:935-946, 1024-1036);
- server-driven cursor paging: follow ``@odata.nextLink`` /
  GraphQL ``endCursor`` until exhausted
  (src/azureboards/data/ab_query.ts:73-81;
  src/git_data_extractor/gitlab_extractor.ts:276-330);
- both under a time budget with adaptive batch sizing
  (src/common/extract_utils.ts:17-85).

Spark translation:

- offset paging -> an OFFSETS DATAFRAME: ``spark.range`` over page
  starts, ``mapPartitions`` runs the fetch on executors — page
  parallelism is task parallelism (S2's chunked Promise.all), retries
  are Spark task retries, and the result lands as rows without ever
  collecting to the driver.
- cursor paging is inherently sequential (each link comes from the
  previous response), so the LOOP runs on the driver but each page's
  payload is parallelized into a DataFrame immediately; the loop obeys
  the reference's time-budget math (streaming/controls.py).

The fetcher is a plain callable (page_start -> list[str] of JSON row
payloads) so tests and air-gapped runs inject deterministic fakes; a
production deployment passes a closure over its HTTP client. The
callable must be picklable (top-level function or functools.partial).
"""

from __future__ import annotations

import json
from typing import Callable, Iterable, Iterator, Optional, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from falcon_metrics_etl_spark.streaming.controls import is_time_to_quit

# fetch_page(page_start) -> iterable of JSON strings (one per raw item)
PageFetcher = Callable[[int], Iterable[str]]
# fetch_cursor(cursor|None) -> (json_rows, next_cursor|None)
CursorFetcher = Callable[[Optional[str]], Tuple[Iterable[str], Optional[str]]]


def paged_ingest(
    spark: SparkSession,
    fetch_page: PageFetcher,
    total: int,
    page_size: int,
    schema: str,
    parallelism: Optional[int] = None,
) -> DataFrame:
    """S1/S2: offset-paged scan as an offsets DataFrame.

    ``spark.range(0, total, page_size)`` enumerates page starts;
    ``mapPartitions`` fetches on executors. ``parallelism`` caps
    concurrent pages (the reference uses 5 concurrent pages of 50;
    here it is the partition count — default one task per page up to
    32). The JSON payloads parse with an explicit schema + PERMISSIVE
    corrupt-record quarantine, same contract as json_staging.
    """
    if total <= 0:
        empty = spark.createDataFrame([], schema=f"{schema}, _corrupt_record string")
        return empty
    n_pages = (total + page_size - 1) // page_size
    slices = min(parallelism or 32, n_pages)
    offsets = spark.range(0, total, page_size, numPartitions=slices)

    def _fetch(rows: Iterator) -> Iterator:
        for row in rows:
            for payload in fetch_page(row.id):
                yield (payload,)

    raw = spark.createDataFrame(
        offsets.rdd.mapPartitions(_fetch), "payload string"
    )
    # invalid JSON -> PERMISSIVE parse captures the raw payload in
    # _corrupt_record (same contract as sources/json_staging.py)
    parsed = raw.select(
        F.from_json(
            "payload",
            f"{schema}, _corrupt_record string",
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
        ).alias("r")
    )
    return parsed.select("r.*")


def cursor_paged_ingest(
    spark: SparkSession,
    fetch_cursor: CursorFetcher,
    schema: str,
    start_time_ms: int,
    run_delay_minutes: float,
    now_ms: Callable[[], int],
    max_pages: int = 10_000,
) -> Tuple[DataFrame, Optional[str]]:
    """S4/S6: server-driven cursor paging under the reference's time
    budget.

    Returns (DataFrame of all fetched rows, resume_cursor). The loop
    exits early — returning the cursor to resume from — when
    ``is_time_to_quit`` fires (extract_utils.ts:17-38 semantics with
    the 30 s margin) or ``max_pages`` is hit; a completed scan returns
    resume_cursor=None. The driver-side loop is inherent to cursor
    pagination (each link depends on the previous response); payloads
    still parse/parallelize on executors per page.
    """
    payloads: list[str] = []
    cursor: Optional[str] = None
    for _ in range(max_pages):
        rows, next_cursor = fetch_cursor(cursor)
        payloads.extend(rows)
        cursor = next_cursor
        if cursor is None:
            break
        if is_time_to_quit(start_time_ms, run_delay_minutes, now_ms()):
            break
    df = (
        spark.createDataFrame([(p,) for p in payloads], ["payload"])
        if payloads
        else spark.createDataFrame([], "payload string")
    )
    parsed = df.select(F.from_json("payload", schema).alias("r")).select("r.*")
    return parsed, cursor


def flatten_nested_page(
    df: DataFrame, nested_col: str, parent_cols: Iterable[str]
) -> DataFrame:
    """S6: GitLab nests each MR's commits as an array page
    (gitlab_extractor.ts:188-200 flattens them) — explode the nested
    array, carrying the parent's identifying columns."""
    return df.select(*parent_cols, F.explode_outer(nested_col).alias("_n")).select(
        *parent_cols, "_n.*"
    )


def fake_page_fetcher(total: int, page_size: int) -> PageFetcher:
    """Deterministic offline fetcher for tests/air-gapped runs: page
    ``p`` yields items [p, min(p+page_size, total)) as JSON docs."""

    def _fetch(page_start: int) -> Iterable[str]:
        hi = min(page_start + page_size, total)
        return [
            json.dumps({"id": i, "key": f"ITEM-{i}", "updated": i * 1000})
            for i in range(page_start, hi)
        ]

    return _fetch
