"""Contract tests for the StatePointerStore seam (r16, r15 verdict
missing #1 / next-round #3): the versioned-state protocol must run
green against BOTH pointer backends — local ``os.replace`` and the
object-store **conditional PUT** protocol — so the 100 TB claim
("swap os.replace for a conditional PUT") is executable, not prose.

The fake client implements the store-side semantics every major
object store ships (S3 If-Match/If-None-Match, GCS generation-match,
Azure etag): get -> (bytes, etag) | None; put with a precondition
that fails when the object changed since the read. Pointer objects
are mirrored to their filesystem key path, exactly what a real
object store at file:// would show, so the suite's on-disk
assertions hold unchanged.

Also pins the r15 advisor's state-layer items: strict pointer-read
errors (an EXISTING but unreadable _CURRENT raises instead of
serving the retired flat layout), the admission index surviving a
maintenance compaction, pre-r15 staged-slug GC, flat-layout
underscore-remnant GC, and the partitioned-table compaction guard.
"""

from __future__ import annotations

import hashlib
import os

import pytest
from pyspark.sql import functions as F

import test_state_versioned as TSV
from falcon_metrics_etl_spark.state import (
    ConditionalPutPointerStore,
    PreconditionFailed,
    StatePointerError,
    compact_state_table,
    gc_state_table,
    overwrite_state,
    read_state,
    resolve_state_path,
    set_pointer_store,
)


class FakeConditionalStore:
    """In-memory conditional-PUT object store.

    ``objects``: key -> (bytes, etag). ``put`` enforces If-Match /
    If-None-Match and raises ``PreconditionFailed`` on a miss — the
    CAS primitive. ``on_get`` is an injectable race hook (fired after
    each get) so a test can interleave a competing writer between a
    publisher's read and its conditional put. Pointer bytes are
    mirrored to the key's filesystem path (atomic replace), matching
    what a real store serving file:// keys would show.
    """

    def __init__(self):
        self.objects: dict[str, tuple[bytes, str]] = {}
        self.put_attempts: list[tuple[str, str | None, bool]] = []
        self.precondition_failures = 0
        self.on_get = None
        self._seq = 0

    def get(self, key):
        got = self.objects.get(key)
        if self.on_get is not None:
            hook, self.on_get = self.on_get, None
            hook()
        return got

    def _store(self, key, data):
        self._seq += 1
        etag = hashlib.sha256(
            data + str(self._seq).encode()
        ).hexdigest()[:12]
        self.objects[key] = (data, etag)
        os.makedirs(os.path.dirname(key), exist_ok=True)
        tmp = key + f".fake-tmp-{self._seq}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, key)
        return etag

    def put(self, key, data, if_match=None, if_none_match=False):
        self.put_attempts.append((key, if_match, if_none_match))
        cur = self.objects.get(key)
        if if_none_match and cur is not None:
            self.precondition_failures += 1
            raise PreconditionFailed(key)
        if if_match is not None and (cur is None or cur[1] != if_match):
            self.precondition_failures += 1
            raise PreconditionFailed(key)
        return self._store(key, data)

    # test-side writer used by the race hooks (bypasses preconditions,
    # like an independent client doing its own successful CAS)
    def force_put(self, key, data):
        return self._store(key, data)


@pytest.fixture
def fake_store():
    client = FakeConditionalStore()
    prev = set_pointer_store(ConditionalPutPointerStore(client))
    try:
        yield client
    finally:
        set_pointer_store(prev)


# ---------------------------------------------------------------------------
# THE contract: the same-process versioned-state suite, replayed
# verbatim through the conditional-PUT backend. (The cross-process
# test stays local-only — the fake lives in this process.)
# ---------------------------------------------------------------------------
_REPLAYED = [
    TSV.test_overwrite_state_is_reader_safe,
    TSV.test_compact_state_table_concurrent_reader,
    TSV.test_compaction_then_appends_then_compaction,
    TSV.test_maintain_state_dir_threshold,
    TSV.test_gc_heals_lost_retirement_stamp,
    TSV.test_merge_state_is_reader_safe_and_last_write_wins,
    TSV.test_dangling_pointer_raises_loudly,
    TSV.test_overwrite_state_repairs_dangling_pointer,
]


@pytest.mark.parametrize("case", _REPLAYED, ids=lambda f: f.__name__)
def test_versioned_suite_under_conditional_put(
    spark, tmp_path, case, fake_store
):
    case(spark, tmp_path)
    # the replay really went through the fake: every publish the case
    # performed is a recorded conditional put
    assert fake_store.put_attempts


def test_cas_retries_past_concurrent_publisher(spark, tmp_path, fake_store):
    """A competing pointer write lands between our read and our put:
    the first conditional PUT precondition-fails, the publisher
    re-reads the winner's etag and retries — last-writer-wins, the
    os.replace outcome, but the race is DETECTED, never a torn or
    silently-lost write."""
    path = str(tmp_path / "t")
    TSV._fragment(spark, path, n_batches=2)
    v1 = overwrite_state(read_state(spark, path), path)
    key = f"{path}/_CURRENT"

    # land a competing pointer write between the next publish's read
    # and its conditional put (patching put is the deterministic way
    # to interleave at exactly that point)
    orig_put = fake_store.put
    raced = []

    def racing_put(k, data, if_match=None, if_none_match=False):
        if not raced:
            raced.append(True)
            fake_store.force_put(key, b"_v-000099-deadbeef")
        return orig_put(
            k, data, if_match=if_match, if_none_match=if_none_match
        )

    fake_store.put = racing_put
    before_failures = fake_store.precondition_failures
    v2 = overwrite_state(read_state(spark, v1), path)
    fake_store.put = orig_put
    assert fake_store.precondition_failures == before_failures + 1
    # our publish won the retry; the table serves OUR snapshot
    assert resolve_state_path(path) == v2


def test_cas_exhaustion_raises_loudly(tmp_path, fake_store):
    """A writer storm that never lets the CAS succeed must surface as
    StatePointerError, not spin or silently drop the publish."""
    from falcon_metrics_etl_spark.state import get_pointer_store

    path = str(tmp_path / "t")
    os.makedirs(path)
    key = f"{path}/_CURRENT"
    fake_store.force_put(key, b"_v-000001-aaaaaaaa")

    class StormClient:
        def get(self, k):
            return fake_store.get(k)

        def put(self, k, data, if_match=None, if_none_match=False):
            fake_store.force_put(k, b"_v-000002-bbbbbbbb")
            raise PreconditionFailed(k)

    store = ConditionalPutPointerStore(StormClient(), max_cas_retries=3)
    with pytest.raises(StatePointerError, match="CAS exhausted"):
        store.publish_pointer(path, "_v-000003-cccccccc")
    assert isinstance(get_pointer_store(), ConditionalPutPointerStore)


def test_unreadable_local_pointer_raises(spark, tmp_path):
    """r15 advisor low #2: a _CURRENT that EXISTS but cannot be read
    (here: it is a directory, so open() fails with IsADirectoryError)
    must raise StatePointerError — never fall back to the flat layout
    and serve retired/empty data."""
    path = str(tmp_path / "t")
    TSV._fragment(spark, path, n_batches=2)
    overwrite_state(read_state(spark, path), path)
    cur = os.path.join(path, "_CURRENT")
    os.remove(cur)
    os.makedirs(cur)  # exists, unreadable as a file
    with pytest.raises(StatePointerError, match="could not be read"):
        resolve_state_path(path)


def test_admission_index_survives_compaction(spark, tmp_path):
    """r15 advisor MEDIUM, the exact scenario: the admission window
    index is compacted into the versioned layout and the flat files
    are GC'd — a later batch must still see every previously-admitted
    passage (reads resolve the pointer) and its appends must land in
    the live snapshot (visible to the batch after it)."""
    from falcon_metrics_etl_spark.streaming.admission import (
        substring_admission_batch,
    )

    idx = str(tmp_path / "index")
    out = str(tmp_path / "flags")
    passage = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    other = "uno dos tres cuatro cinco seis siete ocho nueve diez"
    substring_admission_batch(
        spark,
        spark.createDataFrame([(1, passage)], "doc_id long, text string"),
        idx, out, batch_id=1,
    )
    substring_admission_batch(
        spark,
        spark.createDataFrame([(2, other)], "doc_id long, text string"),
        idx, out, batch_id=2,
    )

    # maintenance window: the fragmented index (one append wave per
    # batch) compacts into the versioned layout; grace-0 GC drops flat
    report = compact_state_table(spark, idx, min_files=2,
                                 target_file_bytes=64 * 1024 * 1024)
    assert report["partitions_compacted"] == 1
    gc_state_table(idx, grace_seconds=0)
    assert resolve_state_path(idx) != idx  # genuinely versioned
    assert not [
        n for n in os.listdir(idx) if not n.startswith(("_", "."))
    ], "flat layout should be gone"

    # batch 3 repeats batch 1's passage: must score fully seen — the
    # advisor's failure mode was an empty-index read re-admitting it
    substring_admission_batch(
        spark,
        spark.createDataFrame([(3, passage)], "doc_id long, text string"),
        idx, out, batch_id=3,
    )
    r3 = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert r3[3]["seen_ratio"] == 1.0

    # a FRESH passage admitted post-compaction appends INSIDE the live
    # snapshot: the next batch sees it
    fresh = "one two three four five six seven eight nine ten"
    substring_admission_batch(
        spark,
        spark.createDataFrame([(4, fresh)], "doc_id long, text string"),
        idx, out, batch_id=4,
    )
    substring_admission_batch(
        spark,
        spark.createDataFrame([(5, fresh)], "doc_id long, text string"),
        idx, out, batch_id=5,
    )
    r5 = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    assert r5[5]["seen_ratio"] == 1.0


def test_partitioned_table_compaction_is_skipped(spark, tmp_path):
    """Hive-partitioned tables (the admission flags sink) are owned by
    the partition-aware compactor; the unpartitioned versioned rewrite
    must skip them instead of flattening their layout."""
    path = str(tmp_path / "flags")
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "doc_id long, batch_id long"
    )
    df.repartition(8).write.partitionBy("batch_id").parquet(path)
    report = compact_state_table(spark, path, min_files=1,
                                 target_file_bytes=1)
    assert report.get("skipped_partitioned") is True
    assert report["partitions_compacted"] == 0
    # layout untouched: still hive dirs, no pointer
    assert any("=" in n for n in os.listdir(path))
    assert resolve_state_path(path) == path


def test_flat_gc_removes_underscore_remnants(spark, tmp_path):
    """r15 advisor low #4 (flat half): once the flat layout is past
    grace, its _SUCCESS / _temporary remnants go with the data files;
    the version machinery's own names survive."""
    path = str(tmp_path / "t")
    TSV._fragment(spark, path, n_batches=2)
    open(os.path.join(path, "_SUCCESS"), "w").write("")
    os.makedirs(os.path.join(path, "_temporary"))
    overwrite_state(read_state(spark, path), path)
    assert gc_state_table(path, grace_seconds=0) > 0
    left = sorted(os.listdir(path))
    assert "_SUCCESS" not in left and "_temporary" not in left
    assert "_CURRENT" in left
    assert read_state(spark, path).count() == 8


def test_gc_staged_state_retires_pre_r15_slugs(tmp_path, monkeypatch):
    """r15 advisor low #4 (staged half): version dirs whose slug lacks
    the 8-hex key-hash suffix predate r15 keying and are unreachable —
    they must be retired (and collected past grace) instead of leaking
    forever as singleton slug groups."""
    from falcon_metrics_etl_spark.session import (
        STATE_DIR_ENV,
        gc_staged_state,
    )

    root = str(tmp_path / "state-root")
    monkeypatch.setenv(STATE_DIR_ENV, root)
    legacy = os.path.join(root, "media_fp_base_sf0.1-" + "ab" * 8)
    modern = os.path.join(
        root, "media_fp_base_sf0.1.12345678-" + "cd" * 8
    )
    for p in (legacy, modern):
        os.makedirs(p)
        open(os.path.join(p, "_SUCCESS"), "w").write("")
    # first sweep retires the legacy dir (grace clock starts)...
    assert gc_staged_state(root, grace_seconds=3600) == 0
    from falcon_metrics_etl_spark.state import RETIRED_MARKER

    assert os.path.isfile(os.path.join(legacy, RETIRED_MARKER))
    assert not os.path.isfile(os.path.join(modern, RETIRED_MARKER))
    # ...second sweep past grace collects it; the modern dir survives
    assert gc_staged_state(root, grace_seconds=0) == 1
    assert not os.path.isdir(legacy)
    assert os.path.isdir(modern)
