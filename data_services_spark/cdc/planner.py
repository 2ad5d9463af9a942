"""Replay-range planning (checkpoint math).

Truth-table semantics mirror the reference's delta planner tests
(``test_ardc_nrt/test_lib_common_processing.py:19-57``): (a) new data ->
plan ranges, (b) never processed -> bootstrap from the beginning, (c) up to
date -> no-op, (d) impossible (checkpoint ahead of source) -> error, write
nothing. Ranges are half-open on the left: ``(lo, hi]`` in LSN space —
the Spark analogue of the reference's month-aligned ``(start, end)``
download ranges (``lib/python/aims_realtime_util.py:300-350``).
"""

from __future__ import annotations

from dataclasses import dataclass


class CheckpointAheadOfSource(Exception):
    """Checkpoint claims more data than the source has — refuse to write."""


@dataclass(frozen=True)
class ReplayPlan:
    decision: str  # "new_data" | "bootstrap" | "up_to_date"
    ranges: list[tuple[int, int]]  # list of (lo_exclusive, hi_inclusive]


def plan_replay(
    source_hi_lsn: int | None,
    committed_lsn: int | None,
    chunk_size: int,
) -> ReplayPlan:
    if chunk_size <= 0:
        raise ValueError("chunk_size must be positive")
    if source_hi_lsn is None:  # empty source
        if committed_lsn is not None and committed_lsn >= 0:
            raise CheckpointAheadOfSource(
                f"checkpoint at {committed_lsn} but source is empty"
            )
        return ReplayPlan("up_to_date", [])
    lo = -1 if committed_lsn is None else committed_lsn
    if lo > source_hi_lsn:
        raise CheckpointAheadOfSource(
            f"checkpoint at {lo} ahead of source hi {source_hi_lsn}"
        )
    if lo == source_hi_lsn:
        return ReplayPlan("up_to_date", [])
    ranges = []
    cur = lo
    while cur < source_hi_lsn:
        nxt = min(cur + chunk_size, source_hi_lsn)
        ranges.append((cur, nxt))
        cur = nxt
    decision = "bootstrap" if committed_lsn is None else "new_data"
    return ReplayPlan(decision, ranges)
