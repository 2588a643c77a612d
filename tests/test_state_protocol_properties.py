"""Property pins for the versioned-state pointer/GC mechanics
(state.py, r15) WITHOUT Spark: snapshots are simulated as dirs with a
sentinel data file, so hypothesis can walk hundreds of op sequences in
seconds. Invariants under ANY sequence of publish / gc(grace) /
lose-stamp / stray-stamp events:

  I1  the pointer always resolves to an existing dir (or raises the
      documented loud error — never a silent flat fallback);
  I2  GC never deletes the current snapshot;
  I3  a snapshot retired less than the grace period ago survives GC;
  I4  every non-current snapshot is eventually collectible: after a
      heal sweep plus a past-grace sweep, only the current snapshot
      remains.
"""

from __future__ import annotations

import os

from hypothesis import given, settings, strategies as st

from falcon_metrics_etl_spark.state import (
    CURRENT_POINTER,
    RETIRED_MARKER,
    _publish_pointer,
    gc_state_table,
    mark_retired,
    resolve_state_path,
)


def _new_snapshot(table: str, seq: int) -> str:
    name = f"_v-{seq:06d}-{'ab' * 4}"
    d = os.path.join(table, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "part-0.parquet"), "w") as f:
        f.write("data")
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        f.write("")
    return name


def _publish(table: str, seq: int) -> str:
    prev = None
    try:
        prev = resolve_state_path(table)
    except FileNotFoundError:
        prev = None
    name = _new_snapshot(table, seq)
    _publish_pointer(table, name)
    try:
        os.remove(os.path.join(table, name, RETIRED_MARKER))
    except OSError:
        pass
    if prev and prev != table:
        mark_retired(prev, refresh=True)
    return name


# op alphabet: publish a new version; gc with grace 0 or huge;
# lose a random retired stamp; drop a stray stamp on current
OPS = st.lists(
    st.sampled_from(
        ["publish", "gc0", "gc_inf", "lose_stamp", "stray_stamp"]
    ),
    min_size=1,
    max_size=12,
)


@settings(max_examples=120, deadline=None)
@given(ops=OPS)
def test_pointer_gc_invariants(tmp_path_factory, ops):
    table = str(tmp_path_factory.mktemp("tbl"))
    seq = 0
    _publish(table, seq := seq + 1)
    for op in ops:
        if op == "publish":
            _publish(table, seq := seq + 1)
        elif op == "gc0":
            gc_state_table(table, grace_seconds=0)
        elif op == "gc_inf":
            before = set(os.listdir(table))
            assert gc_state_table(table, grace_seconds=1e9) == 0  # I3
            assert set(os.listdir(table)) == before
        elif op == "lose_stamp":
            for e in os.listdir(table):
                m = os.path.join(table, e, RETIRED_MARKER)
                if os.path.isfile(m):
                    os.remove(m)
                    break
        elif op == "stray_stamp":
            cur = resolve_state_path(table)
            if cur != table:
                with open(
                    os.path.join(cur, RETIRED_MARKER), "w"
                ) as f:
                    f.write("stray")
        # I1: pointer resolves to an existing dir after every op
        cur = resolve_state_path(table)
        assert os.path.isdir(cur) and cur != table
        # I2: the current snapshot still holds its data file
        assert os.path.isfile(os.path.join(cur, "part-0.parquet"))
    # I4: heal sweep (stamps unmarked corpses) + past-grace sweep
    # leaves exactly the current snapshot
    gc_state_table(table, grace_seconds=0)  # heals + collects stamped
    gc_state_table(table, grace_seconds=0)  # collects the healed
    cur = os.path.basename(resolve_state_path(table))
    versions = [e for e in os.listdir(table) if e.startswith("_v-")]
    assert versions == [cur]


def test_publish_clears_stray_stamp(tmp_path):
    """The stray-stamp race (r15 self-review #3) end to end with the
    real helpers: GC stamps a version mid-publish, the publisher
    clears it, a later supersede starts the grace clock fresh."""
    import time

    table = str(tmp_path / "t")
    os.makedirs(table)
    _publish(table, 1)
    v2 = _publish(table, 2)
    # a racing GC stamps v2 (current) — GC itself never deletes it
    mark_retired(os.path.join(table, v2))
    assert gc_state_table(table, grace_seconds=0) >= 0
    assert os.path.isdir(os.path.join(table, v2))
    # age the stray stamp far past any grace, then supersede: the
    # refresh at publish must reset the clock, so v2 survives a
    # short-grace GC immediately after the swap
    old = time.time() - 10_000
    os.utime(os.path.join(table, v2, RETIRED_MARKER), (old, old))
    _publish(table, 3)
    assert gc_state_table(table, grace_seconds=3600) == 0
    assert os.path.isdir(os.path.join(table, v2))
    # and collects once genuinely past grace
    assert gc_state_table(table, grace_seconds=0) >= 1
    assert not os.path.isdir(os.path.join(table, v2))
