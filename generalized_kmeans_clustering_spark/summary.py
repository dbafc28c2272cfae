"""Training telemetry (reference ``TrainingSummary.scala:43-153``)."""

from __future__ import annotations

from dataclasses import dataclass, field, asdict


@dataclass
class TrainingSummary:
    algorithm: str
    k: int
    dim: int
    divergence: str
    iterations: int = 0
    converged: bool = False
    distortion_history: list = field(default_factory=list)
    movement_history: list = field(default_factory=list)
    cluster_sizes: list = field(default_factory=list)
    elapsed_sec: float = 0.0
    #: accelerated (Elkan/Hamerly) plan only: per-iteration count of
    #: rows whose bounds held — the distance array was never evaluated
    #: for them (reference AcceleratedSEAssignment.scala:199-232
    #: pruning accumulators)
    pruned_history: list = field(default_factory=list)
    #: typed ClusteringEvent log recorded during fit (events.py,
    #: reference ml/df/SummarySink.scala) — round-trips through
    #: summary.json as dicts and is rehydrated to event objects on load
    events: list = field(default_factory=list)

    def __post_init__(self):
        from .events import ClusteringEvent, event_from_dict

        self.events = [
            e if isinstance(e, ClusteringEvent) else event_from_dict(e)
            for e in self.events
        ]

    def clustering_summary(self):
        """Event-log view with the reference's derived metrics
        (``ClusteringSummary``, SummarySink.scala:169-283)."""
        from .events import ClusteringSummary

        ts = [e.timestamp for e in self.events]
        start = min(ts) if ts else 0
        return ClusteringSummary(self.events, start,
                                 start + int(self.elapsed_sec * 1000))

    @property
    def pruning_rate(self) -> float:
        """Mean fraction of rows pruned per bound-checked iteration
        (NaN when the exact plan ran — nothing was ever pruned)."""
        if not self.pruned_history or not self.cluster_sizes:
            return float("nan")
        n = sum(self.cluster_sizes)
        if n <= 0:
            return float("nan")
        return float(sum(self.pruned_history) / (len(self.pruned_history) * n))

    @property
    def final_distortion(self) -> float:
        return self.distortion_history[-1] if self.distortion_history else float("nan")

    def to_dict(self) -> dict:
        d = asdict(self)
        # asdict loses the event_type class attribute (and frozensets
        # aren't JSON) — serialize events through their own to_dict
        d["events"] = [e.to_dict() for e in self.events]
        return d

    def to_df(self, spark):
        """1-row DataFrame view, like the reference's ``summary.toDF``."""
        import json

        return spark.createDataFrame(
            [(self.algorithm, self.k, self.dim, self.divergence, self.iterations,
              self.converged, float(self.final_distortion), self.elapsed_sec,
              json.dumps(self.distortion_history))],
            "algorithm string, k int, dim int, divergence string, iterations int, "
            "converged boolean, final_distortion double, elapsed_sec double, "
            "distortion_history string",
        )
