"""Ingest run-control math — SURVEY.md ST5/ST6.

Spark makes the reference's run-control LOOPS unnecessary (tasks
retry, AQE sizes partitions, schedulers own wall-clock budgets), but
the control MATH is part of the reference's behavior surface, so it
lives here as pure functions for the ingestion jobs that feed the
lake:

- adaptive batch sizing ±10 within [10, 2000]
  (src/common/extract_utils.ts:67-85;
  src/common/types_and_constants.ts:11-17);
- time-budget early exit with a 30 s margin
  (src/common/extract_utils.ts:17-38) — ``now_ms`` is injected, never
  read from a clock, so schedulers stay testable/deterministic.
"""

from __future__ import annotations

BATCH_SIZE_CHANGE_RATE = 10
BATCH_SIZE_MIN = BATCH_SIZE_CHANGE_RATE
BATCH_SIZE_MAX = 2000

QUIT_MARGIN_MS = 30_000


def next_batch_size(current: int, direction: int) -> int:
    """direction: +1 grow / -1 shrink; a step that would leave
    [MIN, MAX] keeps the current size (the reference only persists
    in-range values, extract_utils.ts:75-85)."""
    proposed = current + direction * BATCH_SIZE_CHANGE_RATE
    if BATCH_SIZE_MIN <= proposed <= BATCH_SIZE_MAX:
        return proposed
    return current


def is_time_to_quit(
    start_time_ms: int, run_delay_minutes: float, now_ms: int
) -> bool:
    """True once elapsed >= run delay minus the 30 s grace margin
    (extract_utils.ts:17-38)."""
    return (now_ms - start_time_ms) >= run_delay_minutes * 60_000 - QUIT_MARGIN_MS
