"""bench.py stall-guard unit tests (no Spark session needed).

Two rounds in a row a VM stall corrupted a committed bench median
(r7: a 5.5 s entry re-measured at 1.29 s; r8: an 11.04 s outlier
against a 2.07 s median in the driver rerun) and was hand-purged.
draw_runs automates exactly that: a draw whose max/min ratio exceeds
the stall threshold is discarded and measured once more.
"""

from __future__ import annotations

import time

import bench


def test_clean_draw_not_redrawn():
    vals = iter([0.10, 0.12, 0.11])
    runs, redrawn = bench.draw_runs(lambda: next(vals), repeats=3)
    assert not redrawn
    assert sorted(runs) == [0.10, 0.11, 0.12]


def test_stalled_draw_is_discarded_and_remeasured():
    # first draw carries a 10x stall; the fresh draw is clean
    vals = iter([0.10, 1.00, 0.11, 0.10, 0.12, 0.11])
    runs, redrawn = bench.draw_runs(lambda: next(vals), repeats=3, ratio=3.0)
    assert redrawn
    assert max(runs) <= 0.12  # the stalled draw never reaches the median


def test_injected_sleep_triggers_redraw():
    """The verdict's acceptance check: inject an artificial sleep into
    one repeat of a REAL timed callable and watch the guard re-draw."""
    calls = {"n": 0}

    def fn() -> float:
        t0 = time.time()
        time.sleep(0.25 if calls["n"] == 0 else 0.01)
        calls["n"] += 1
        return time.time() - t0

    runs, redrawn = bench.draw_runs(fn, repeats=3, ratio=3.0)
    assert redrawn
    assert calls["n"] == 6  # full fresh draw, not an in-place patch
    assert max(runs) < 0.2


def test_second_stall_is_kept_and_reported():
    """A stalled RE-draw is not iterated — the runs (and their spread)
    surface the bad session instead of looping forever."""
    vals = iter([0.10, 1.00, 0.11, 0.10, 2.00, 0.11])
    runs, redrawn = bench.draw_runs(lambda: next(vals), repeats=3, ratio=3.0)
    assert redrawn
    assert max(runs) == 2.00


def test_output_targets_protect_tracked_medians():
    """Default bench runs must never touch the tracked medians file;
    --commit-medians / SPARK_GRAFT_BENCH_COMMIT=1 opt in (r10)."""
    import bench

    default = bench._output_targets(["bench.py"], {})
    assert [p.split("/")[-1] for p in default] == ["BENCH_OUT.json"]
    flagged = bench._output_targets(["bench.py", "--commit-medians"], {})
    assert [p.split("/")[-1] for p in flagged] == [
        "BENCH_OUT.json",
        "BENCH_MEDIANS.json",
    ]
    env = bench._output_targets(["bench.py"], {"SPARK_GRAFT_BENCH_COMMIT": "1"})
    assert [p.split("/")[-1] for p in env][-1] == "BENCH_MEDIANS.json"
    redirected = bench._output_targets(
        ["bench.py"], {"SPARK_GRAFT_BENCH_OUT": "/tmp/x.json"}
    )
    assert redirected == ["/tmp/x.json"]


def test_staged_ivm_entries_are_registered_headline_queries():
    """r16: the untimed pre-warm list must track the registry — a
    renamed IVM twin that silently drops out of the list would move
    its one-time staging back inside the timed repeats (the r15
    driver artifact's 2x cold-staging distortion)."""
    from falcon_metrics_etl_spark.plans.registry import all_queries

    reg = all_queries()
    for name in bench.STAGED_IVM_ENTRIES:
        assert name in reg, name
        assert name in bench.HEADLINE, name
    # and the disclosure block carries exactly the staged-timing set
    prov = bench._staged_semantics_provenance()
    assert prov["staged_semantics"] == sorted(
        set(bench.STAGED_IVM_ENTRIES + bench.STAGED_BENCH_ENTRIES)
    )
