"""The single pluggable Lloyd iterator that drives every batch variant.

Re-expression of ``df/LloydsIterator.scala:110-240`` +
``strategies/ConvergenceCheck.scala:49-97`` +
``strategies/EmptyClusterHandler.scala``.

Per iteration this engine runs exactly ONE Spark job:
  assignment (codegen'd expression projection over the cached input)
  → groupBy(cluster) one-pass stats (weight, count, cost, gradient sums)
  → k rows to the driver → new centers + movement + distortion on the
  driver.

Compare the reference's 2–4 jobs per iteration
(cache+count / aggregateByKey / empty-handler sample / convergence agg —
SURVEY.md §3.1.6). Because centers return to the driver each iteration
and re-enter the next plan as literals, every iteration's lineage is
(source scan → one projection → one agg): constant depth, so no
checkpointing is needed at any iteration count — the reference's
``checkpointInterval`` machinery exists only to fight its growing
lineage (``LloydsIterator.scala:201-211``).

Empty-cluster strategies mirror the reference: "keep" (retain old
center), "drop" (shrink k), "reseed" (farthest-point reseed using the
stats pass's max-distance info — costs one extra tiny job only on the
iterations where a cluster actually empties).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from time import time

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import Kernel
from ..operators.assignment import auto_assigner
from ..operators.update import cluster_stats, centers_from_stats, median_centers

__all__ = ["LloydsConfig", "LloydsResult", "run_lloyds"]


@dataclass
class LloydsConfig:
    k: int
    kernel: Kernel
    max_iter: int = 20
    tol: float = 1e-4
    features_col: str = "features"
    weight_col: str | None = None
    assignment_strategy: str = "auto"
    empty_cluster_strategy: str = "keep"  # keep | drop | reseed
    seed: int = 0
    #: optional typed-event collector (events.SummarySink); the loop
    #: emits IterationStarted/Completed, EmptyClustersDetected and
    #: ConvergenceDetected into it (reference SummarySink.scala defines
    #: this surface but never wires a trainer to it)
    sink: object | None = None
    #: opt-in: carry each iteration's assignment as a persisted column
    #: and fold a changed-count into the stats pass so
    #: IterationCompleted.assignment_changes is real instead of −1.
    #: Costs one persist per iteration (the exact loop is otherwise
    #: stateless) — off by default; iteration 0 counts every row as
    #: changed (from unassigned).
    track_assignment_changes: bool = False


@dataclass
class LloydsResult:
    centers: np.ndarray
    iterations: int = 0
    converged: bool = False
    distortion_history: list = field(default_factory=list)
    movement_history: list = field(default_factory=list)
    cluster_sizes: list = field(default_factory=list)
    elapsed_sec: float = 0.0
    # accelerated plan only: rows whose bounds held per iteration
    pruned_history: list = field(default_factory=list)


def _movement(old: np.ndarray, new: np.ndarray) -> float:
    """Max Euclidean center movement (convergence criterion,
    ``ConvergenceCheck.scala:49-66``)."""
    if old.shape != new.shape:
        return float("inf")
    return float(np.sqrt(((old - new) ** 2).sum(axis=1)).max())


def _reseed_empty(df, kernel, centers, empty, cfg) -> np.ndarray:
    """Replace empty clusters with the points farthest from their
    assigned center (reference reseed-random: ``EmptyClusterHandler.scala:63-71``;
    farthest-point is the deterministic variant)."""
    assigner = auto_assigner(len(centers), centers.shape[1],
                             cfg.assignment_strategy, kernel=kernel)
    assigned = assigner.assign(df, kernel, centers.tolist(), cfg.features_col)
    far = (
        assigned.select(F.col(cfg.features_col).alias("f"), F.col("_dist"))
        .orderBy(F.desc("_dist"))
        .limit(len(empty))
        .collect()
    )
    out = centers.copy()
    for slot, row in zip(empty, far):
        out[slot] = np.array(row["f"], dtype=np.float64)
    return out


def run_lloyds(df: DataFrame, centers: np.ndarray, cfg: LloydsConfig) -> LloydsResult:
    from ..events import (ConvergenceDetected, EmptyClustersDetected,
                          IterationTracker, SummarySink, WarningEvent)

    t0 = time()
    kernel = cfg.kernel
    centers = np.asarray(centers, dtype=np.float64)
    k, d = centers.shape
    res = LloydsResult(centers=centers)
    sizes: list[int] = []
    sink = cfg.sink if cfg.sink is not None else SummarySink.noop()
    prev_empty: set[int] = set()
    track = cfg.track_assignment_changes
    cur = df  # carries _prev_c when change tracking is on
    carry_state = None

    for it in range(cfg.max_iter):
        tracker = IterationTracker(sink, it)
        assigner = auto_assigner(k, d, cfg.assignment_strategy,
                                 spark=df.sparkSession, kernel=kernel)
        assigned = assigner.assign(cur, kernel, centers.tolist(),
                                   cfg.features_col)
        if track:
            prevc = (F.col("_prev_c") if "_prev_c" in cur.columns
                     else F.lit(-1))
            assigned = assigned.withColumn(
                "_chg", (F.col("_cluster") != prevc).cast("long"))
            assigned = (assigned.localCheckpoint(eager=False)
                        if (it + 1) % 5 == 0 else assigned.persist())
        # keyed on the chosen assigner, not the strategy string — auto
        # also selects the pruned rung for SE-decomposable kernels at
        # high k, and its telemetry should fold in either way
        pruned = (getattr(assigner, "name", None) == "pruned"
                  and kernel.mean_update)
        changes = -1
        if kernel.mean_update:
            stats = cluster_stats(
                assigned, kernel, d, cfg.features_col, cfg.weight_col,
                ncomp_col="_ncomp" if pruned else None,
                changes_col="_chg" if track else None,
            )
            if track:
                changes = int(sum(s.get("chg") or 0 for s in stats))
            new_centers, cost, sizes, empty = centers_from_stats(
                stats, kernel, k, centers
            )
            if pruned:
                # same statistic the accelerated plan records: effective
                # rows whose distance work was skipped this iteration
                # (n·k − Σncomp distance computations saved, ÷k) — so
                # summary.pruning_rate == 1 − avg_computations/k, the
                # reference's logged rate (AcceleratedSEAssignment
                # .scala:220-232)
                n_total = sum(s["n"] for s in stats)
                ncomp_total = sum(s.get("ncomp") or 0 for s in stats)
                res.pruned_history.append(
                    float(n_total - ncomp_total / max(k, 1))
                )
        else:  # L1 / K-Medians: distributed per-dim median
            new_centers, cost, sizes, empty = median_centers(
                assigned, d, k, cfg.features_col, cfg.weight_col,
                old_centers=centers,
            )
            if track:  # assigned is persisted: one cheap scalar agg
                changes = int(assigned.agg(
                    F.sum("_chg")).first()[0] or 0)

        if empty:
            action = {"drop": "dropped", "reseed": "reseeded"}.get(
                cfg.empty_cluster_strategy, "kept")
            sink.record(EmptyClustersDetected(
                iteration=it, cluster_ids=frozenset(int(c) for c in empty),
                action=action))
            stuck = prev_empty & set(empty)
            if stuck and cfg.empty_cluster_strategy == "keep":
                # a kept-empty cluster whose center didn't move can never
                # re-acquire points — surface it instead of burning k slots
                sink.record(WarningEvent(
                    iteration=it,
                    message=(f"clusters {sorted(stuck)} empty for "
                             "consecutive iterations under "
                             "empty_cluster_strategy='keep'; consider "
                             "'reseed' or a smaller k"),
                    severity="medium"))
            prev_empty = set(empty)
            if cfg.empty_cluster_strategy == "drop":
                keep = [i for i in range(k) if i not in set(empty)]
                new_centers = new_centers[keep]
                centers = centers[keep]
                k = len(new_centers)
            elif cfg.empty_cluster_strategy == "reseed":
                new_centers = _reseed_empty(df, kernel, new_centers, empty, cfg)
            # "keep": already retains the old center
        else:
            prev_empty = set()

        mv = _movement(centers, new_centers)
        centers = new_centers
        res.distortion_history.append(float(cost))
        res.movement_history.append(mv)
        res.iterations = it + 1
        tracker.complete(cost=float(cost), center_movement=float(mv),
                         assignment_changes=changes if track else -1)
        if track:
            nxt = assigned.select(
                cfg.features_col,
                *([cfg.weight_col] if cfg.weight_col else []),
                F.col("_cluster").alias("_prev_c"),
            )
            if carry_state is not None:
                carry_state.unpersist()
            carry_state = assigned
            cur = nxt
        if mv <= cfg.tol:
            res.converged = True
            sink.record(ConvergenceDetected(
                iteration=it, reason="center_movement_below_tol"))
            break

    if carry_state is not None:
        carry_state.unpersist()
    res.centers = centers
    res.cluster_sizes = sizes
    res.elapsed_sec = time() - t0
    return res
