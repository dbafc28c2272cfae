"""Accelerated Lloyd iterator: cross-iteration triangle-inequality bounds.

Re-expression of the reference's Elkan machinery
(``df/ElkanLloydsIterator.scala:53-513`` — per-row ``_elkan_upper /
_lower / _cluster`` bound columns updated by center movements;
``strategies/impl/AcceleratedSEAssignment.scala:64-239`` — Lemma-1
pruning) as a Hamerly-style DataFrame plan (one upper + one lower
bound per row instead of k lower bounds — the column-state design is
identical, the bound set is the cheaper variant):

state frame (persisted across iterations):
  features, _c (assigned cluster), _u (upper bound on the EUCLIDEAN
  distance to the assigned center), _l (lower bound on the distance to
  the second-closest center).

per iteration:
  1. exact per-cluster gradient sums from the current assignment — one
     groupBy(k rows) job (assignment is always exact; only the
     *distances* carry slack);
  2. new centers on the driver → per-center movements δ_j;
  3. bound adjustment (map-only): _u += δ_{_c},  _l −= max_j δ_j;
  4. conditional reassignment: rows with _u ≤ _l keep everything —
     Catalyst's ``CASE WHEN`` short-circuits per row, so the k-distance
     array is only *evaluated* for rows whose bounds overlap (the same
     work-skipping the reference gets from its bound columns);
  5. ``localCheckpoint`` every few iterations truncates the growing
     bounds lineage (the reference checkpoints for the same reason).

Valid for squaredEuclidean only (bounds need a metric; euclidean =
√(2·D_se)). The distortion history is exact: the stats pass computes
the divergence to the *assigned* center (one per row, not k), so the
sequence is the true monotone Lloyd distortion; the _u/_l slack only
affects which rows re-evaluate the full distance array.
"""

from __future__ import annotations

from time import time

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import Kernel
from ..operators.assignment import distances_column
from .lloyds import LloydsConfig, LloydsResult

__all__ = ["run_accelerated_lloyds"]

_CHECKPOINT_EVERY = 5


def _euclid_dists(kernel: Kernel, features_col: str, centers) -> F.Column:
    dists = distances_column(kernel, F.col(features_col), centers)
    return F.transform(
        dists, lambda d_: F.sqrt(2.0 * F.greatest(d_, F.lit(0.0)))
    )


def _attach_bounds(df: DataFrame, eu_col: str, keep=None,
                   u_adj=None, l_adj=None, track=False) -> DataFrame:
    """(_c, _u, _l) from a staged euclidean-distance array column.

    The array lives in its own projection (non-cheap higher-order
    expression referenced 3×, so CollapseProject keeps it staged — it
    is evaluated once per refreshed row, NULL for kept rows).
    """
    eu = F.col(eu_col)
    c_new = (F.array_position(eu, F.array_min(eu)) - 1).cast("int")
    u_new = F.array_min(eu)
    l_new = F.array_min(
        F.filter(eu, lambda v, i: i != (F.array_position(eu, F.array_min(eu)) - 1))
    )
    if keep is None:
        return (
            df.withColumn("_c", c_new)
            .withColumn("_u", u_new)
            .withColumn("_l", l_new)
        )
    out = (
        df.withColumn("_c2", F.when(keep, F.col("_c")).otherwise(c_new))
        .withColumn("_u2", F.when(keep, u_adj).otherwise(u_new))
        .withColumn("_l2", F.when(keep, l_adj).otherwise(l_new))
    )
    if track:
        # old _c still present: the changed flag costs nothing extra
        # because the materializing agg job already runs
        out = out.withColumn(
            "_chg", (F.col("_c2") != F.col("_c")).cast("long"))
    return (
        out.drop("_c", "_u", "_l")
        .withColumnRenamed("_c2", "_c")
        .withColumnRenamed("_u2", "_u")
        .withColumnRenamed("_l2", "_l")
    )


def run_accelerated_lloyds(
    df: DataFrame, centers: np.ndarray, cfg: LloydsConfig
) -> LloydsResult:
    t0 = time()
    kernel = cfg.kernel
    if kernel.name != "squaredEuclidean":
        raise ValueError(
            "accelerated (Elkan/Hamerly) iterator requires squaredEuclidean"
        )
    centers = np.asarray(centers, dtype=np.float64)
    k, d = centers.shape
    if k < 2:
        from .lloyds import run_lloyds

        return run_lloyds(df, centers, cfg)
    res = LloydsResult(centers=centers)
    w = F.col(cfg.weight_col) if cfg.weight_col else F.lit(1.0)

    from ..events import (ConvergenceDetected, EmptyClustersDetected,
                          IterationTracker, SummarySink)

    sink = cfg.sink if cfg.sink is not None else SummarySink.noop()
    track = cfg.track_assignment_changes
    pending_changes = None  # set by each refresh for the NEXT iteration

    state = _attach_bounds(
        df.withColumn(
            "_eu", _euclid_dists(kernel, cfg.features_col, centers.tolist())
        ),
        "_eu",
    ).drop("_eu").persist()
    prev_state = None
    sizes: list[int] = []

    try:
        for it in range(cfg.max_iter):
            tracker = IterationTracker(sink, it)
            grad = kernel.grad(F.col(cfg.features_col))
            # exact distance to the ASSIGNED center (one divergence per
            # row, not k) keeps the distortion history the true Lloyd
            # sequence — monotone — instead of the _u upper bound
            centers_lit = F.array(*[
                F.array(*[F.lit(float(v)) for v in c]) for c in centers
            ])
            d_assigned = kernel.pairwise(
                F.col(cfg.features_col),
                F.element_at(centers_lit, F.col("_c") + 1),
            )
            aggs = [
                F.sum(w).alias("w"),
                F.count(F.lit(1)).alias("n"),
                F.sum(w * d_assigned).alias("cost"),
            ] + [
                F.sum(w * F.element_at(grad, i + 1)).alias(f"g{i}")
                for i in range(d)
            ]
            rows = state.groupBy("_c").agg(*aggs).collect()
            new_centers = centers.copy()
            sizes = [0] * k
            cost = 0.0
            for r in rows:
                c = int(r["_c"])
                sizes[c] = int(r["n"])
                cost += float(r["cost"] or 0.0)
                if r["w"] and r["w"] > 0:
                    g = np.array([float(r[f"g{i}"]) for i in range(d)])
                    new_centers[c] = kernel.finalize_center(g / r["w"])
            # empty clusters: keep old center (cfg strategies drop/reseed
            # fall back to the exact engine; "keep" is the common case here)
            empty = [c for c in range(k) if sizes[c] == 0]
            if empty:
                sink.record(EmptyClustersDetected(
                    iteration=it, cluster_ids=frozenset(empty),
                    action="kept"))
            deltas = np.sqrt(((centers - new_centers) ** 2).sum(axis=1))
            mv = float(deltas.max())
            centers = new_centers
            res.distortion_history.append(cost)
            res.movement_history.append(mv)
            res.iterations = it + 1
            if track:
                # iteration 0: every row moved from unassigned; later
                # iterations: the refresh agg counted the flips
                changes = (sum(sizes) if it == 0 else
                           int(pending_changes or 0))
            else:
                changes = -1
            tracker.complete(cost=float(cost), center_movement=mv,
                             assignment_changes=changes)
            if mv <= cfg.tol:
                res.converged = True
                sink.record(ConvergenceDetected(
                    iteration=it, reason="center_movement_below_tol"))
                break

            # bound adjustment + conditional refresh: the distance array
            # is NULL (never evaluated) for rows whose bounds still hold
            dlit = F.array(*[F.lit(float(x)) for x in deltas])
            u_adj = F.col("_u") + F.element_at(dlit, F.col("_c") + 1)
            l_adj = F.col("_l") - F.lit(float(deltas.max()))
            keep = u_adj <= l_adj
            staged = state.withColumn(
                "_eu",
                F.when(
                    ~keep, _euclid_dists(kernel, cfg.features_col,
                                         centers.tolist())
                ),
            )
            nxt = _attach_bounds(
                staged.withColumn("_kept", keep), "_eu", keep=keep,
                u_adj=u_adj, l_adj=l_adj, track=track,
            ).drop("_eu")
            aggs = [F.sum(F.col("_kept").cast("long")).alias("p")]
            if track:
                aggs.append(F.sum("_chg").alias("chg"))
            if (it + 1) % _CHECKPOINT_EVERY == 0:
                nxt = nxt.localCheckpoint(eager=True)
                kept_row = nxt.agg(*aggs).collect()[0]
            else:
                nxt = nxt.persist()
                # the materializing job doubles as the pruning counter
                # (reference keeps the same stats in accumulators)
                kept_row = nxt.agg(*aggs).collect()[0]
            if track:
                pending_changes = int(kept_row["chg"] or 0)
            # _kept (1 byte/row) stays in the state frame: dropping it
            # would wrap the persisted frame in a projection and break
            # the later unpersist; next iteration's withColumn replaces it
            res.pruned_history.append(int(kept_row["p"] or 0))
            if prev_state is not None:
                prev_state.unpersist()
            prev_state = state
            state = nxt
    finally:
        state.unpersist()
        if prev_state is not None:
            prev_state.unpersist()

    res.centers = centers
    res.cluster_sizes = sizes
    res.elapsed_sec = time() - t0
    return res
