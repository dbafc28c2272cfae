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

__all__ = ["Pins", "release_checkpoint"]


def release_checkpoint(df, blocking: bool = False) -> None:
    """Unpersist the RDD behind a ``localCheckpoint``'d DataFrame.

    ``DataFrame.unpersist()`` only removes CacheManager entries, so on
    a checkpointed frame it is a silent NO-OP and the persisted
    checkpoint RDD lives until the session dies — the leak class every
    iterative operator here was carrying (r13). This reaches the
    ``LogicalRDD``'s RDD directly. No-op on non-checkpointed frames.

    SAFETY: unlike a cache, a released checkpoint cannot be re-derived
    — a later action on a plan that still references it FAILS with a
    missing-block error rather than recomputing. Only call this when
    nothing live references the frame (e.g. the next round's eager
    checkpoint has already materialized).
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(blocking)
    except Exception:
        pass  # best-effort: a leak is better than a crash here


class Pins:
    """Collects the DataFrames an operator persisted while building
    its result; ``release()`` unpersists them all. Usable as a
    context manager (releases on exit).

    Two pin classes:

    - ``add(df)`` — a CACHED frame. Releasing is always safe: a later
      action on a plan that referenced it simply re-derives.
    - ``add_checkpoint(df)`` — a ``localCheckpoint``-backed frame (or
      the checkpoint ANCHOR a cached result's lineage rests on).
      ``DataFrame.unpersist()`` cannot release these (r13), so
      ``release()`` drops their checkpoint RDD blocks directly — after
      which a plan that still references them FAILS instead of
      recomputing. Release a Pins carrying checkpoint pins only when
      you are DONE with every frame derived from the operator's
      result (the drivers here — oracle gate, bench trials, the entry
      session registry — all consume a result fully before releasing).
    """

    def __init__(self) -> None:
        self._frames = []
        self._ckpts = []

    def add(self, df):
        """Track a persisted frame (operator-side API)."""
        self._frames.append(df)
        return df

    def add_checkpoint(self, df):
        """Track a localCheckpoint-backed frame (see class docstring
        for the release carve-out)."""
        self._ckpts.append(df)
        return df

    @property
    def frames(self) -> list:
        """The tracked frames, in pin order (read-only copy;
        checkpoint pins last)."""
        return list(self._frames) + list(self._ckpts)

    def __len__(self) -> int:
        return len(self._frames) + len(self._ckpts)

    def absorb(self, other: "Pins") -> None:
        """Take over every pin tracked by ``other`` (which becomes
        empty) — for operators that build a result under a local Pins
        and hand the survivors to the caller's."""
        self._frames.extend(other._frames)
        self._ckpts.extend(other._ckpts)
        other._frames, other._ckpts = [], []

    def release(self, blocking: bool = False) -> None:
        """Unpersist every tracked frame and forget them (idempotent)."""
        frames, self._frames = self._frames, []
        ckpts, self._ckpts = self._ckpts, []
        for f in frames:
            f.unpersist(blocking)
        for f in ckpts:
            f.unpersist(blocking)
            release_checkpoint(f, blocking)

    def __enter__(self) -> "Pins":
        return self

    def __exit__(self, *exc) -> None:
        self.release()
