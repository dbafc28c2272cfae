"""Typed clustering-event log + sink (reference ``ml/df/SummarySink.scala``).

Re-expression of the reference's observability surface
(``SummarySink.scala:27-170``): a sealed hierarchy of training events,
a mutable ``SummarySink`` collector, an ``IterationTracker`` helper
(``SummarySink.scala:346-377``), and an immutable ``ClusteringSummary``
with the derived metrics (``SummarySink.scala:169-283``).

Differences from the reference, by design:

- events are frozen dataclasses with a ``to_dict``/``from_dict``
  JSON-lines round-trip so the log persists inside ``summary.json``
  (the reference keeps events only in memory);
- ``ClusteringSummary.to_df`` renders the event log as a DataFrame for
  SQL-side analysis of training telemetry;
- the engine actually EMITS these events from its training loops
  (``plans/lloyds.py`` / ``plans/accelerated.py``) — in the reference
  the sink API exists but no trainer records into it;
- ``IterationCompleted.assignment_changes`` is ``-1`` (unknown) when
  emitted live: tracking per-row assignment deltas would force an extra
  wide state join per iteration, which the one-job-per-iteration plan
  refuses to pay. Callers constructing events manually can supply it.

Everything here is driver-side: a few dozen tiny records per fit.
"""

from __future__ import annotations

import json
import threading
import time as _time
from dataclasses import dataclass, field, fields


def _now_ms() -> int:
    return int(_time.time() * 1000)


@dataclass(frozen=True)
class ClusteringEvent:
    """Base event; subclasses set ``event_type`` (``SummarySink.scala:27-30``)."""

    event_type = "event"

    def to_dict(self) -> dict:
        d = {f.name: getattr(self, f.name) for f in fields(self)}
        if "cluster_ids" in d:
            d["cluster_ids"] = sorted(d["cluster_ids"])
        d["event_type"] = self.event_type
        return d


@dataclass(frozen=True)
class IterationStarted(ClusteringEvent):
    iteration: int
    timestamp: int = field(default_factory=_now_ms)
    event_type = "iteration_started"


@dataclass(frozen=True)
class IterationCompleted(ClusteringEvent):
    """``SummarySink.scala:59-68``: cost, center movement, assignment
    changes (−1 = not tracked), duration — all for one iteration."""

    iteration: int
    cost: float
    center_movement: float
    assignment_changes: int = -1
    duration: int = 0  # milliseconds
    timestamp: int = field(default_factory=_now_ms)
    event_type = "iteration_completed"


@dataclass(frozen=True)
class ConvergenceDetected(ClusteringEvent):
    iteration: int
    reason: str
    timestamp: int = field(default_factory=_now_ms)
    event_type = "convergence_detected"


@dataclass(frozen=True)
class EmptyClustersDetected(ClusteringEvent):
    iteration: int
    cluster_ids: frozenset
    action: str  # "kept" | "dropped" | "reseeded"
    timestamp: int = field(default_factory=_now_ms)
    event_type = "empty_clusters_detected"

    def __post_init__(self):
        object.__setattr__(self, "cluster_ids", frozenset(self.cluster_ids))


@dataclass(frozen=True)
class WarningEvent(ClusteringEvent):
    iteration: int
    message: str
    severity: str = "medium"  # low | medium | high
    timestamp: int = field(default_factory=_now_ms)
    event_type = "warning"


@dataclass(frozen=True)
class InitializationCompleted(ClusteringEvent):
    method: str
    duration: int  # milliseconds
    timestamp: int = field(default_factory=_now_ms)
    event_type = "initialization_completed"


@dataclass(frozen=True)
class TrainingCompleted(ClusteringEvent):
    total_iterations: int
    final_cost: float
    total_duration: int  # milliseconds
    timestamp: int = field(default_factory=_now_ms)
    event_type = "training_completed"


_EVENT_TYPES = {
    cls.event_type: cls
    for cls in (IterationStarted, IterationCompleted, ConvergenceDetected,
                EmptyClustersDetected, WarningEvent, InitializationCompleted,
                TrainingCompleted)
}


def event_from_dict(d: dict) -> ClusteringEvent:
    """Inverse of ``ClusteringEvent.to_dict`` (JSON round-trip)."""
    d = dict(d)
    try:
        cls = _EVENT_TYPES[d.pop("event_type")]
    except KeyError as e:
        raise ValueError(f"unknown event_type in {d!r}") from e
    return cls(**d)


class ClusteringSummary:
    """Immutable event-log view + derived metrics (``SummarySink.scala:169-283``)."""

    def __init__(self, events, start_time: int, end_time: int):
        self.events = list(events)
        self.start_time = int(start_time)
        self.end_time = int(end_time)

    # -- typed accessors ------------------------------------------------
    def events_of_type(self, cls):
        return [e for e in self.events if isinstance(e, cls)]

    @property
    def iterations(self):
        return self.events_of_type(IterationCompleted)

    @property
    def warnings(self):
        return self.events_of_type(WarningEvent)

    @property
    def convergence(self):
        ev = self.events_of_type(ConvergenceDetected)
        return ev[0] if ev else None

    @property
    def initialization(self):
        ev = self.events_of_type(InitializationCompleted)
        return ev[0] if ev else None

    @property
    def completion(self):
        ev = self.events_of_type(TrainingCompleted)
        return ev[0] if ev else None

    # -- derived metrics (SummarySink.scala:196-243) --------------------
    @property
    def num_iterations(self) -> int:
        return len(self.iterations)

    @property
    def total_duration(self) -> int:
        return self.end_time - self.start_time

    @property
    def avg_iteration_duration(self) -> float:
        it = self.iterations
        return sum(e.duration for e in it) / len(it) if it else 0.0

    @property
    def final_cost(self):
        it = self.iterations
        return it[-1].cost if it else None

    @property
    def cost_improvement(self):
        it = self.iterations
        return it[0].cost - it[-1].cost if it else None

    @property
    def cost_improvement_percent(self):
        it = self.iterations
        if not it or it[0].cost == 0:
            return None
        return (it[0].cost - it[-1].cost) / it[0].cost * 100.0

    @property
    def avg_center_movement(self) -> float:
        it = self.iterations
        return sum(e.center_movement for e in it) / len(it) if it else 0.0

    @property
    def total_assignment_changes(self) -> int:
        return sum(e.assignment_changes for e in self.iterations
                   if e.assignment_changes >= 0)

    @property
    def num_empty_cluster_events(self) -> int:
        return len(self.events_of_type(EmptyClustersDetected))

    @property
    def converged(self) -> bool:
        return self.convergence is not None

    @property
    def convergence_reason(self):
        c = self.convergence
        return c.reason if c else None

    # -- report (SummarySink.scala:246-282) -----------------------------
    def report(self) -> str:
        out = ["=== Clustering Summary ===",
               f"Duration: {self.total_duration}ms",
               f"Iterations: {self.num_iterations}"]
        if self.final_cost is not None:
            out.append(f"Final Cost: {self.final_cost:.4f}")
        pct = self.cost_improvement_percent
        if pct is not None:
            out.append(f"Cost Improvement: {pct:.2f}%")
        if self.converged:
            out.append(f"Converged: Yes ({self.convergence_reason})")
        if self.warnings:
            out.append(f"\nWarnings ({len(self.warnings)}):")
            out.extend(f"  [Iter {w.iteration}] {w.message}"
                       for w in self.warnings)
        if self.num_empty_cluster_events:
            out.append(f"\nEmpty Clusters: {self.num_empty_cluster_events} events")
        out.append("\nPer-Iteration Metrics:")
        out.append("Iter\tCost\t\tMovement\tChanges\tDuration")
        out.extend(
            f"{e.iteration:4d}\t{e.cost:.4f}\t{e.center_movement:.4f}\t"
            f"{e.assignment_changes:6d}\t{e.duration:4d}ms"
            for e in self.iterations
        )
        return "\n".join(out) + "\n"

    # -- export ---------------------------------------------------------
    def to_json_lines(self) -> str:
        """One JSON object per line, in recording order."""
        return "\n".join(json.dumps(e.to_dict(), sort_keys=True)
                         for e in self.events)

    @classmethod
    def from_json_lines(cls, text: str, start_time: int = 0,
                        end_time: int = 0) -> "ClusteringSummary":
        events = [event_from_dict(json.loads(ln))
                  for ln in text.splitlines() if ln.strip()]
        return cls(events, start_time, end_time)

    def to_df(self, spark):
        """Event log as a DataFrame (long form: one row per event,
        type-specific fields null where not applicable) — SQL-side
        analysis of training telemetry."""
        rows = []
        for i, e in enumerate(self.events):
            d = e.to_dict()
            rows.append((
                i, e.event_type, int(d["timestamp"]),
                d.get("iteration"),
                float(d["cost"]) if "cost" in d else None,
                float(d["center_movement"]) if "center_movement" in d else None,
                d.get("assignment_changes"),
                d.get("duration"),
                d.get("reason") or d.get("message") or d.get("action")
                or d.get("method"),
                json.dumps(d.get("cluster_ids")) if "cluster_ids" in d else None,
            ))
        return spark.createDataFrame(
            rows,
            "seq int, event_type string, timestamp long, iteration int, "
            "cost double, center_movement double, assignment_changes long, "
            "duration long, detail string, cluster_ids string",
        )


class SummarySink:
    """Mutable, thread-safe event collector (``SummarySink.scala:299-344``)."""

    def __init__(self):
        self._events: list[ClusteringEvent] = []
        self._lock = threading.Lock()
        self._start = _now_ms()

    def record(self, event: ClusteringEvent) -> None:
        with self._lock:
            self._events.append(event)

    def record_all(self, events) -> None:
        with self._lock:
            self._events.extend(events)

    @property
    def size(self) -> int:
        with self._lock:
            return len(self._events)

    def get_events(self) -> list:
        with self._lock:
            return list(self._events)

    def summary(self) -> ClusteringSummary:
        with self._lock:
            return ClusteringSummary(list(self._events), self._start, _now_ms())

    def clear(self) -> None:
        with self._lock:
            self._events.clear()

    @staticmethod
    def noop() -> "SummarySink":
        """Sink that discards everything (``SummarySink.scala:340-343``)."""
        return _NoopSink()


class _NoopSink(SummarySink):
    def record(self, event) -> None:
        pass

    def record_all(self, events) -> None:
        pass


class IterationTracker:
    """Start/complete helper that stamps duration (``SummarySink.scala:350-369``)."""

    def __init__(self, sink: SummarySink, iteration: int):
        self.sink = sink
        self.iteration = iteration
        self._t0 = _now_ms()
        sink.record(IterationStarted(iteration, timestamp=self._t0))

    def complete(self, cost: float, center_movement: float,
                 assignment_changes: int = -1) -> None:
        now = _now_ms()
        self.sink.record(IterationCompleted(
            iteration=self.iteration, cost=float(cost),
            center_movement=float(center_movement),
            assignment_changes=int(assignment_changes),
            duration=now - self._t0, timestamp=now,
        ))
