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


class SparseLsnSpace(Exception):
    """chunk_size would produce a pathological number of ranges.

    Fixed-LSN-width chunking assumes LSNs are dense. Real change streams
    often are NOT: MongoDB orders by ``t * 2^32 + i`` (consecutive events
    are 4 billion LSNs apart), MySQL binlog positions jump by event byte
    size, Postgres LSNs by WAL record size. Planning ``(hi - lo) /
    chunk_size`` ranges over such a space materializes billions of empty
    ranges before the first chunk runs. Callers with sparse LSNs should
    chunk by event mass instead: ``CdcApplier.replay(chunk_rows=...)``
    derives boundaries from the stream's own LSN quantiles."""


@dataclass(frozen=True)
class ReplayPlan:
    decision: str  # "new_data" | "bootstrap" | "up_to_date"
    ranges: list[tuple[int, int]]  # list of (lo_exclusive, hi_inclusive]


# Far above any sane plan (10^10 events / 10^4-row chunks = 10^6 ranges);
# a fixed-width plan that trips this is chunking a sparse LSN space.
MAX_RANGES = 8_000_000


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
    n_ranges = -((lo - source_hi_lsn) // chunk_size)  # ceil div
    if n_ranges > MAX_RANGES:
        raise SparseLsnSpace(
            f"chunk_size={chunk_size} over LSN span ({lo}, {source_hi_lsn}] "
            f"plans {n_ranges} ranges (cap {MAX_RANGES}): the LSN space is "
            "sparse relative to chunk_size — chunk by event mass instead "
            "(CdcApplier.replay(chunk_rows=...)) or raise chunk_size"
        )
    ranges = []
    cur = lo
    while cur < source_hi_lsn:
        nxt = min(cur + chunk_size, source_hi_lsn)
        ranges.append((cur, nxt))
        cur = nxt
    decision = "bootstrap" if committed_lsn is None else "new_data"
    return ReplayPlan(decision, ranges)


def plan_replay_bounds(
    bounds: list[int],
    committed_lsn: int | None,
    source_hi_lsn: int,
) -> ReplayPlan:
    """Build a plan from pre-computed LSN boundaries (e.g. stream
    quantiles). ``bounds`` are inclusive upper edges; the committed LSN is
    the first exclusive lower edge; the final range always tops out at
    ``source_hi_lsn`` so the plan covers the whole stream even when the
    quantile sketch under-shoots the max."""
    lo = -1 if committed_lsn is None else committed_lsn
    if lo > source_hi_lsn:
        raise CheckpointAheadOfSource(
            f"checkpoint at {lo} ahead of source hi {source_hi_lsn}"
        )
    if lo == source_hi_lsn:
        return ReplayPlan("up_to_date", [])
    edges = sorted({int(b) for b in bounds if lo < int(b) < source_hi_lsn})
    edges.append(source_hi_lsn)
    ranges = []
    cur = lo
    for e in edges:
        ranges.append((cur, e))
        cur = e
    decision = "bootstrap" if committed_lsn is None else "new_data"
    return ReplayPlan(decision, ranges)
