"""Shared watermark-maturity front half of the buffered stateful
streaming operators (as-of join, funnel, retention).

All three follow the same contract: rows buffer per key only while
the event-time watermark has not passed them; each batch splits the
buffer at the (millisecond-granular, Spark's watermark unit) maturity
boundary, folds the mature slice into O(1)-per-key operator state,
EVICTS it, and registers an event-time timeout at the earliest
immature row so idle keys flush when the watermark advances without
new input (availableNow's final no-data batch included — the batch-
parity replay guarantee). This module is that split + scheduling;
the per-operator fold stays in the operator.
"""

from __future__ import annotations

__all__ = ["split_mature", "schedule_flush"]


def split_mature(buf, wm_ms, key=None):
    """Split buffer rows (leading element = event-time µs) at the
    watermark: returns ``(mature_sorted, keep)`` — mature rows sorted
    by ``key`` (default: tuple order), immature rows in arrival
    order."""
    mature, keep = [], []
    for r in buf:
        (mature if r[0] // 1000 <= wm_ms else keep).append(r)
    mature.sort(key=key)
    return mature, keep


def schedule_flush(state, keep, wm_ms) -> None:
    """Register an event-time timeout so ``keep``'s earliest row is
    processed as soon as the watermark can mature it (the timestamp
    must land strictly above the current watermark)."""
    if keep:
        state.setTimeoutTimestamp(
            max(min(r[0] for r in keep) // 1000 - 1, wm_ms + 1))
