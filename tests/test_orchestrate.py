"""Resumable DAG runner (plans/orchestrate.py): topo order, cycle
detection, failure isolation per branch, resume-skips-completed."""

from __future__ import annotations

import pytest

from falcon_metrics_etl_spark.plans.orchestrate import Job, run_dag


def test_runs_in_dependency_order_and_records(spark, tmp_path):
    ran = []

    def mk(name):
        return lambda s: ran.append(name)

    jobs = [
        Job("load", mk("load"), deps=("transform",)),
        Job("extract", mk("extract")),
        Job("transform", mk("transform"), deps=("extract",)),
    ]
    state = str(tmp_path / "dag.json")
    report = run_dag(spark, jobs, state)
    assert ran == ["extract", "transform", "load"]
    assert all(v["status"] == "ok" for v in report.values())
    # re-run: everything skipped
    report2 = run_dag(spark, jobs, state)
    assert all(v["status"] == "skipped" for v in report2.values())
    assert ran == ["extract", "transform", "load"]


def test_failure_stops_dependents_then_resume_skips_done(spark, tmp_path):
    ran = []
    fail = {"on": True}

    def flaky(s):
        if fail["on"]:
            raise RuntimeError("boom")
        ran.append("transform")

    jobs = [
        Job("extract", lambda s: ran.append("extract")),
        Job("transform", flaky, deps=("extract",)),
        Job("load", lambda s: ran.append("load"), deps=("transform",)),
    ]
    state = str(tmp_path / "dag.json")
    report = run_dag(spark, jobs, state)
    assert report["extract"]["status"] == "ok"
    assert report["transform"]["status"] == "failed"
    # dependent never started, but IS reported
    assert report["load"]["status"] == "skipped_failed_dep"
    assert report["load"]["blocked_by"] == ["transform"]
    assert ran == ["extract"]

    fail["on"] = False
    report2 = run_dag(spark, jobs, state)
    assert report2["extract"]["status"] == "skipped"  # not re-run
    assert report2["transform"]["status"] == "ok"
    assert report2["load"]["status"] == "ok"
    assert ran == ["extract", "transform", "load"]


def test_independent_branch_survives_failure(spark, tmp_path):
    """A failure must not starve branches that don't depend on it,
    even when they come later in topological order."""
    ran = []
    jobs = [
        Job("bad", lambda s: (_ for _ in ()).throw(RuntimeError("boom"))),
        Job("bad_child", lambda s: ran.append("bad_child"), deps=("bad",)),
        Job("bad_grandchild", lambda s: ran.append("bad_grandchild"),
            deps=("bad_child",)),
        Job("other", lambda s: ran.append("other")),
        Job("other_child", lambda s: ran.append("other_child"),
            deps=("other",)),
    ]
    report = run_dag(spark, jobs)
    assert report["bad"]["status"] == "failed"
    assert report["bad_child"]["status"] == "skipped_failed_dep"
    # transitive: grandchild blocked through the skipped child
    assert report["bad_grandchild"]["status"] == "skipped_failed_dep"
    assert report["other"]["status"] == "ok"
    assert report["other_child"]["status"] == "ok"
    assert ran == ["other", "other_child"]
    assert set(report) == {j.name for j in jobs}  # one entry per job


def test_cycle_and_unknown_dep_detection(spark):
    with pytest.raises(ValueError, match="cycle"):
        run_dag(
            spark,
            [Job("a", lambda s: None, deps=("b",)),
             Job("b", lambda s: None, deps=("a",))],
        )
    with pytest.raises(ValueError, match="unknown"):
        run_dag(spark, [Job("a", lambda s: None, deps=("ghost",))])
