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

Terminal 1-ms boundary (shared caveat): Spark fires an event-time
timeout only when ``timeout < watermark`` (strict), and a timeout may
not be set at or below the CURRENT watermark — so a buffered row
whose maturity millisecond is exactly ``wm + 1`` gets its timeout
clamped ONTO its own maturity millisecond. If the stream then ends
with the terminal watermark landing exactly on that millisecond (the
row sits in the stream's final watermark millisecond under
``delay=0``), the timeout never fires and the row is dropped instead
of flushed. This is the one millisecond where the advertised
availableNow batch parity does not hold; it cannot be closed from
inside the operator (both clamp and strictness are Spark's timeout
contract). Any non-zero ``delay``, or any event after the boundary
row, moves the terminal watermark past it and the flush happens. The
property suites keep event-ms and watermark parities disjoint to test
everything except this documented boundary.
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


def schedule_flush(state, keep, wm_ms, deadlines_ms=()) -> None:
    """Register an event-time timeout so ``keep``'s earliest row is
    processed as soon as the watermark can mature it, or the earliest
    of ``deadlines_ms`` (extra wake-ups in watermark milliseconds —
    e.g. a forward as-of tolerance expiry, which needs the fn invoked
    once ``wm > deadline``) fires — whichever is sooner. The timestamp
    must land strictly above the current watermark (Spark's timeout
    contract; see the module docstring for the terminal-millisecond
    consequence)."""
    cands = [r[0] // 1000 - 1 for r in keep] + list(deadlines_ms)
    if cands:
        state.setTimeoutTimestamp(max(min(cands), wm_ms + 1))
