"""Explicit lifecycle handle for operator-internal persisted frames.

Some operators persist an intermediate frame that stays live AFTER
they return, because the returned (lazy) DataFrame's plan references
it on every action — the cascade partials in
:func:`~.temporal.rollup_cascade`, the per-round frontiers in
:func:`~.graph.propagate_flags`. Unpersisting inside the operator
would force re-derivation at action time; never unpersisting leaks
executor memory in long-lived sessions.

Before r9 these frames were exposed as a Python attribute on the
returned DataFrame (``out._cascade_partials``), which silently
vanishes on ANY further transformation (``out.filter(...)`` is a new
object without the attribute) — the one caller who composes before
releasing leaked the pins anyway. The explicit handle survives
composition: pass a :class:`Pins` in, release it when done.

    pins = Pins()
    out = rollup_cascade(df, "ts", "v", ("hour", "day"), pins=pins)
    out.filter(...).write.parquet(...)   # compose freely
    pins.release()                       # executor memory returned

Releasing after the consuming action is always safe: unpersist never
invalidates a result, it only means a LATER action on the same lazy
plan would re-derive the subtree (by then the result is usually
written/collected). One-shot jobs can omit ``pins`` entirely — the
frames die with the session, exactly as before.
"""

from __future__ import annotations

__all__ = ["Pins"]


class Pins:
    """Collects the DataFrames an operator persisted while building
    its result; ``release()`` unpersists them all. Usable as a
    context manager (releases on exit)."""

    def __init__(self) -> None:
        self._frames = []

    def add(self, df):
        """Track a persisted frame (operator-side API)."""
        self._frames.append(df)
        return df

    @property
    def frames(self) -> list:
        """The tracked frames, in pin order (read-only copy)."""
        return list(self._frames)

    def __len__(self) -> int:
        return len(self._frames)

    def release(self, blocking: bool = False) -> None:
        """Unpersist every tracked frame and forget them (idempotent)."""
        frames, self._frames = self._frames, []
        for f in frames:
            f.unpersist(blocking)

    def __enter__(self) -> "Pins":
        return self

    def __exit__(self, *exc) -> None:
        self.release()
