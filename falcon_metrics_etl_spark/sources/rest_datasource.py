"""A native PySpark Python Data Source for paged REST ingestion.

``sources/rest_ingest.py`` implements S1-S6 as offsets-DataFrame +
``mapPartitions`` jobs; this module exposes the SAME offset-paging
contract through Spark's first-class Python Data Source API
(pyspark.sql.datasource, Spark 4), so a deployment reads a paged API
like any other table:

    spark.dataSource.register(RestPagedDataSource)
    df = (spark.read.format("falcon_rest")
          .option("fetcher", "synthetic")
          .option("total", 120)
          .option("page_size", 50)
          .load())

Why this shape matters at scale: each page start becomes an
``InputPartition``, so page parallelism IS task parallelism (the
reference fetches 5 concurrent pages of 50,
src/jiracloud/data/jc_issue.ts:935-946 — here the scheduler runs as
many concurrent page fetches as there are task slots), retries are
Spark task retries, and no payload ever round-trips through the
driver.

Fetchers are looked up by NAME in ``FETCHERS`` (data-source options
are strings, so callables can't ride through them); a deployment
registers its HTTP-client-backed fetcher at import time. The bundled
``synthetic`` fetcher is the same deterministic fake the
rest_ingest tests use — offset-derived JSON rows with one corrupt
payload per page to exercise the quarantine contract.

Rows parse against the declared schema with the PERMISSIVE
corrupt-record contract of sources/json_staging.py: unparseable
payloads land with every data column null and the raw payload in
``_corrupt_record``.
"""

from __future__ import annotations

import json
from typing import Callable, Iterable, Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql.types import StructType

# name -> fetch_page(page_start, page_size) -> iterable of JSON strings
Fetcher = Callable[[int, int], Iterable[str]]
FETCHERS: dict[str, Fetcher] = {}


def register_fetcher(name: str, fn: Fetcher) -> None:
    FETCHERS[name] = fn


def synthetic_fetch(page_start: int, page_size: int) -> Iterable[str]:
    """Deterministic offline fake: one JSON work item per offset, plus
    one corrupt payload per page (at the page's first offset) so the
    quarantine path is always exercised."""
    out = []
    for i in range(page_start, page_start + page_size):
        out.append(
            json.dumps(
                {
                    "work_item_id": f"WI-{i}",
                    "revision": i % 7,
                    "state": ["todo", "doing", "done"][i % 3],
                }
            )
        )
    out.append(f"not-json-{page_start}")
    return out


register_fetcher("synthetic", synthetic_fetch)

DEFAULT_SCHEMA = (
    "work_item_id string, revision int, state string, _corrupt_record string"
)


class PagePartition(InputPartition):
    def __init__(self, start: int, size: int):
        self.start = start
        self.size = size


class RestPagedReader(DataSourceReader):
    def __init__(self, schema: StructType, options: dict):
        self._schema = schema
        self._fetcher_name = options.get("fetcher", "synthetic")
        self._total = int(options.get("total", 0))
        self._page_size = max(1, int(options.get("page_size", 50)))

    def partitions(self):
        if self._total <= 0:
            # PySpark substitutes [None] for an empty partition list and
            # read(None) would crash — emit one explicit empty page
            return [PagePartition(0, 0)]
        return [
            PagePartition(start, min(self._page_size, self._total - start))
            for start in range(0, self._total, self._page_size)
        ]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        if partition.size <= 0:
            return
        fetch = FETCHERS[self._fetcher_name]
        # rows are built per schema field POSITION, so _corrupt_record
        # may sit anywhere in a user-supplied schema
        names = [f.name for f in self._schema.fields]
        has_corrupt = "_corrupt_record" in names
        for payload in fetch(partition.start, partition.size):
            try:
                obj = json.loads(payload)
                if not isinstance(obj, dict):
                    raise ValueError("not an object")
            except (ValueError, json.JSONDecodeError):
                if has_corrupt:
                    yield tuple(
                        payload if n == "_corrupt_record" else None
                        for n in names
                    )
                continue
            yield tuple(
                None if n == "_corrupt_record" else obj.get(n) for n in names
            )


# ---------------------------------------------------------------------------
# Streaming variant: the incremental cursor (ST1) as a NATIVE streaming
# source — the checkpoint carries the page offset, so restart-resume is
# exactly the reference's nextRunStartFrom cursor (config.ts:250-262)
# with Spark's offset log as the cursor table.
# ---------------------------------------------------------------------------
class RestPagedStreamReader(DataSourceStreamReader):
    def __init__(self, schema: StructType, options: dict):
        self._inner = RestPagedReader(schema, options)

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        # the synthetic feed's high-water mark is the configured total;
        # a live deployment returns the API's current count here
        return {"offset": self._inner._total}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["offset"]), int(end["offset"])
        size = self._inner._page_size
        if hi <= lo:
            # same guard as the batch reader: PySpark substitutes
            # [None] for an empty list and read(None) crashes —
            # reachable when a microbatch is planned with equal
            # offsets (restart / availableNow edges)
            return [PagePartition(lo, 0)]
        return [
            PagePartition(s, min(size, hi - s)) for s in range(lo, hi, size)
        ]

    def read(self, partition: PagePartition) -> Iterator[tuple]:
        return self._inner.read(partition)

    def commit(self, end: dict) -> None:
        # offsets are durable in the checkpoint's offset log — nothing
        # to acknowledge source-side (the reference's SQS ack analog
        # happens in the sink's idempotent MERGE)
        pass


class RestPagedDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "falcon_rest"

    def schema(self) -> str:
        return self.options.get("schema", DEFAULT_SCHEMA)

    def reader(self, schema: StructType) -> RestPagedReader:
        return RestPagedReader(schema, dict(self.options))

    def streamReader(self, schema: StructType) -> RestPagedStreamReader:
        return RestPagedStreamReader(schema, dict(self.options))
