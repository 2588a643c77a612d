"""Resumable DAG runner (plans/orchestrate.py): topo order, cycle
detection, failure stop, resume-skips-completed."""

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
    assert "load" not in report  # dependent never started
    assert ran == ["extract"]

    fail["on"] = False
    report2 = run_dag(spark, jobs, state)
    assert report2["extract"]["status"] == "skipped"  # not re-run
    assert report2["transform"]["status"] == "ok"
    assert report2["load"]["status"] == "ok"
    assert ran == ["extract", "transform", "load"]


def test_cycle_and_unknown_dep_detection(spark):
    with pytest.raises(ValueError, match="cycle"):
        run_dag(
            spark,
            [Job("a", lambda s: None, deps=("b",)),
             Job("b", lambda s: None, deps=("a",))],
        )
    with pytest.raises(ValueError, match="unknown"):
        run_dag(spark, [Job("a", lambda s: None, deps=("ghost",))])
