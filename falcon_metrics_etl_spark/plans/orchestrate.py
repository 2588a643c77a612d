"""Minimal resumable job-DAG runner — the engine-side shape of the
reference's orchestration.

The reference chains stages through EventBridge schedules -> Lambda ->
SNS/SQS -> Lambda (serverless.yml:131-371; SURVEY.md section 3): each
hop exists to sequence work and survive partial failure. Inside one
Spark driver those hops collapse to function calls, but the two
operational properties are still worth having:

- explicit DEPENDENCIES, validated (cycle detection) and executed in
  topological order;
- RESUMABILITY: a completed job is recorded durably; re-running the
  DAG after a mid-run failure skips finished jobs (the SQS-redelivery
  role, played by a state file + the sinks' idempotent MERGEs).

Deliberately not an Airflow: no scheduling, no parallel branches —
job bodies are Spark actions, which already parallelize inside the
cluster; orchestration-level parallelism adds nothing on one driver.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass, field
from typing import Callable, Optional, Sequence

from pyspark.sql import SparkSession


@dataclass(frozen=True)
class Job:
    name: str
    fn: Callable[[SparkSession], object]
    deps: tuple = field(default_factory=tuple)


def _toposort(jobs: Sequence[Job]) -> list[Job]:
    names = [j.name for j in jobs]
    dupes = {n for n in names if names.count(n) > 1}
    if dupes:
        # a dict build would silently drop all but the last job of a
        # name — its body would never run and the report would lie
        raise ValueError(f"duplicate job names: {sorted(dupes)}")
    by_name = {j.name: j for j in jobs}
    for j in jobs:
        for d in j.deps:
            if d not in by_name:
                raise ValueError(f"job {j.name!r} depends on unknown {d!r}")
    order: list[Job] = []
    state: dict[str, int] = {}  # 0 visiting, 1 done

    def visit(name: str, chain: tuple) -> None:
        if state.get(name) == 1:
            return
        if state.get(name) == 0:
            cycle = " -> ".join(chain + (name,))
            raise ValueError(f"dependency cycle: {cycle}")
        state[name] = 0
        for d in by_name[name].deps:
            visit(d, chain + (name,))
        state[name] = 1
        order.append(by_name[name])

    for j in jobs:
        visit(j.name, ())
    return order


def run_dag(
    spark: SparkSession,
    jobs: Sequence[Job],
    state_path: Optional[str] = None,
) -> dict:
    """Run jobs in dependency order; returns {name: {status, seconds}}.

    With ``state_path``, completed jobs are recorded after each success
    and skipped on re-run — combined with idempotent MERGE sinks this
    makes the whole DAG safely re-runnable after a partial failure.
    A failing job is reported with status 'failed'; its dependents
    (transitively) are reported 'skipped_failed_dep' and never start,
    but independent branches keep running — the report always contains
    one entry per job. Previously completed work stays recorded.
    """
    done: set[str] = set()
    if state_path and os.path.exists(state_path):
        with open(state_path) as f:
            done = set(json.load(f)["completed"])

    def record(name: str) -> None:
        done.add(name)
        if state_path:
            tmp = state_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"completed": sorted(done)}, f)
            os.replace(tmp, state_path)

    report: dict[str, dict] = {}
    failed: set[str] = set()  # failed jobs + their transitive dependents
    for job in _toposort(jobs):
        if job.name in done:
            report[job.name] = {"status": "skipped", "seconds": 0.0}
            continue
        blocked = sorted(d for d in job.deps if d in failed)
        if blocked:
            failed.add(job.name)
            report[job.name] = {
                "status": "skipped_failed_dep",
                "seconds": 0.0,
                "blocked_by": blocked,
            }
            continue
        t0 = time.time()
        try:
            job.fn(spark)
        except Exception as e:
            failed.add(job.name)
            report[job.name] = {
                "status": "failed",
                "seconds": round(time.time() - t0, 3),
                "error": f"{type(e).__name__}: {e}",
            }
            continue
        record(job.name)
        report[job.name] = {
            "status": "ok",
            "seconds": round(time.time() - t0, 3),
        }
    return report
