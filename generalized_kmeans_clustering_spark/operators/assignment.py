"""Assignment operators: point → nearest-center, the engine's "join" layer.

Re-expression of the reference's assignment strategies
(``strategies/AssignmentStrategy.scala:18-41`` and impls under
``strategies/impl/``) as Catalyst expressions:

- ``ExpressionAssignment`` — centers embedded as an array-of-arrays
  literal; distances via ``transform`` over the literal; argmin via
  ``array_position(dists, array_min(dists))`` (first-index-wins
  tie-break, matching ``BroadcastUDFAssignment.scala:84-90``'s strict
  ``dist < minDist``). The whole stage is a single codegen'd projection
  — no shuffle, no Python, no broadcast join. This subsumes the
  reference's BroadcastUDFAssignment for k·d up to ~100k elements.
- ``ChunkedExpressionAssignment`` — centers processed in chunks to
  bound the expression-tree/codegen size (reference
  ``ChunkedBroadcastAssignment.scala:23-120``); per-chunk
  struct(min_dist, argmin), combined with ``least`` (struct ordering =
  lexicographic → min dist, ties → lower id).
- ``PandasAssignment`` — Arrow-vectorized numpy argmin for very large
  k·d (reference ``BroadcastUDFAssignment``'s role at scale).
- ``CrossJoinAssignment`` — points × broadcast centers-DataFrame +
  ``min_by`` groupBy (reference ``SECrossJoinAssignment.scala:16-75``,
  but with the README-recommended min_by-on-rowid shape instead of the
  whole-row window, ``README.md:308-312``).
- ``auto_assigner`` — decision tree mirroring ``AutoAssignment.scala:19-89``.

Scale notes (100 TB): the expression paths are map-only — they scale
linearly with input partitions, shuffle nothing, and keep the parquet
scan's predicate pushdown and column pruning intact. CrossJoin is kept
for parity/testing; at scale the chunked expression path dominates it
(no rowid shuffle).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import Kernel, array_lit

__all__ = [
    "distances_column",
    "ExpressionAssignment",
    "ChunkedExpressionAssignment",
    "PandasAssignment",
    "PrunedSEAssignment",
    "CrossJoinAssignment",
    "auto_assigner",
    "pruning_stats",
]

# k·d beyond which a single expression tree gets unwieldy and we chunk
EXPRESSION_ELEM_LIMIT = 16_384
# k·d beyond which we leave codegen and use Arrow+numpy
CHUNKED_ELEM_LIMIT = 262_144
# centers from which auto prefers Lemma-1 pruning for SE-decomposable
# kernels (bench: pruned beats the exact expression plan from ~k=16)
PRUNED_AUTO_MIN_K = 16
# centers beyond which auto stops choosing the pruned rung:
# PrunedSEAssignment precomputes a k×k center-distance matrix on the
# driver and ships it in the Arrow UDF closure, so memory is O(k²·8 B)
# — 32 MiB at this cap, but ~34 GiB at k=65536 (an IVF coarse
# quantizer). Past the cap auto falls through to the chunked/pandas
# rungs whose driver state stays O(k·d), preserving SCALE.md's
# "driver state = k×d" guarantee. Explicit strategy="pruned" is not
# capped (the caller owns the k² tradeoff).
PRUNED_AUTO_MAX_K = 2048


def distances_column(kernel: Kernel, features: Column, centers: Sequence[Sequence[float]]) -> Column:
    """array<double> of D(x, μ_j) for every center, as one expression."""
    centers_lit = F.array(*[array_lit(c) for c in centers])
    return F.transform(centers_lit, lambda c: kernel.pairwise(features, c))


class ExpressionAssignment:
    """Single-projection argmin over a centers literal.

    DELIBERATE SHAPE NOTE (measured, sf0.1 = 600k×4d): the HOF form
    (``transform`` over a centers literal folding ``zip_with`` terms)
    is interpreted Catalyst eval — HOFs never whole-stage-codegen —
    and runs ~0.5-0.7 s per assignment+stats pass at k=32, warm. An
    unrolled non-HOF rewrite (plain arithmetic over ``F.get``; also
    tried with centers as broadcast-parameter data so the generated
    class is iteration-invariant) DOES codegen, but at k=32·d=4 the
    generated method is 10,714 bytecode — past HotSpot's 8,000
    HugeMethodLimit, so it is never JIT-compiled and runs in the
    bytecode interpreter at a stable 4.7 s (7× slower); splitting
    (methodSplitThreshold=128) only recovers to ~3 s. Interpreted HOF
    eval is itself compiled JVM code and wins below the pandas/pruned
    crossover, so the HOF literal projection is the keeper. For large
    k the auto tree already routes to the Arrow/numpy paths.
    """

    name = "expression"

    def assign(
        self,
        df: DataFrame,
        kernel: Kernel,
        centers: Sequence[Sequence[float]],
        features_col: str,
        cluster_col: str = "_cluster",
        dist_col: str = "_dist",
    ) -> DataFrame:
        dists = distances_column(kernel, F.col(features_col), centers)
        df = df.withColumn("_dists", dists)
        df = df.withColumn(
            cluster_col,
            (F.expr("array_position(_dists, array_min(_dists))") - 1).cast("int"),
        )
        return df.withColumn(dist_col, F.array_min("_dists")).drop("_dists")


class ChunkedExpressionAssignment:
    """Centers in chunks; per-chunk struct(min, argmin); global least()."""

    name = "chunked"

    def __init__(self, chunk_size: int = 256):
        self.chunk_size = chunk_size

    def assign(self, df, kernel, centers, features_col,
               cluster_col="_cluster", dist_col="_dist"):
        chunk_cols = []
        for ci, start in enumerate(range(0, len(centers), self.chunk_size)):
            chunk = centers[start:start + self.chunk_size]
            dists = distances_column(kernel, F.col(features_col), chunk)
            name = f"_chunk{ci}"
            df = df.withColumn("_cd", dists).withColumn(
                name,
                F.struct(
                    F.array_min("_cd").alias("dist"),
                    (F.expr("array_position(_cd, array_min(_cd))") - 1 + start)
                    .cast("int")
                    .alias("id"),
                ),
            ).drop("_cd")
            chunk_cols.append(name)
        best = F.least(*[F.col(c) for c in chunk_cols]) if len(chunk_cols) > 1 \
            else F.col(chunk_cols[0])
        df = df.withColumn("_best", best)
        df = df.withColumn(cluster_col, F.col("_best.id"))
        df = df.withColumn(dist_col, F.col("_best.dist"))
        return df.drop("_best", *chunk_cols)


class PandasAssignment:
    """Arrow-vectorized numpy argmin (struct-returning pandas_udf).

    The centers array rides in the serialized closure — functionally a
    broadcast (one copy per executor, not per row).
    """

    name = "pandas"

    def assign(self, df, kernel, centers, features_col,
               cluster_col="_cluster", dist_col="_dist"):
        from pyspark.sql.functions import pandas_udf

        C = np.asarray(centers, dtype=np.float64)
        k = kernel

        @pandas_udf("struct<cluster:int,dist:double>")
        def _argmin(feats: pd.Series) -> pd.DataFrame:
            X = np.asarray(feats.tolist(), dtype=np.float64)
            if X.size == 0:
                return pd.DataFrame({"cluster": [], "dist": []})
            D = k.div_np(X, C)
            idx = np.argmin(D, axis=1)  # first-index-wins on ties
            return pd.DataFrame(
                {"cluster": idx.astype(np.int32),
                 "dist": D[np.arange(len(idx)), idx]}
            )

        df = df.withColumn("_a", _argmin(F.col(features_col)))
        return (df.withColumn(cluster_col, F.col("_a.cluster"))
                  .withColumn(dist_col, F.col("_a.dist")).drop("_a"))


class PrunedSEAssignment:
    """Per-call Elkan Lemma-1 pruned assignment (reference
    ``strategies/impl/AcceleratedSEAssignment.scala:64-239``).

    Triangle-inequality pruning within a single assignment pass: once a
    point's current-best (half-squared) distance ``dmin`` is known, any
    center c' with ``d(best, c') ≥ 2·√(2·dmin)`` cannot be closer, so
    its distance is never evaluated. Center-to-center distances (k², on
    the driver — same ceiling as the reference) ride in the Arrow UDF
    closure; the per-row loop is vectorized per center over the whole
    Arrow batch, not per point.

    Emits an ``ncomp`` column (distances actually computed per row,
    1..k) — the expression analog of the reference's
    ``totalDistanceComputations`` accumulator — so the pruning rate is
    measurable with :func:`pruning_stats` or folded into the Lloyd
    stats pass. Only valid for kernels whose capability descriptor sets
    ``se_fast_path`` (SE; spherical on pre-normalized features), and
    falls back to the exact expression path below ``min_k`` centers
    where pruning overhead cannot pay off (reference
    ``AcceleratedSEAssignment.scala:183-190``).
    """

    name = "pruned"

    def __init__(self, min_k: int = 5):
        self.min_k = min_k

    def assign(self, df, kernel, centers, features_col,
               cluster_col="_cluster", dist_col="_dist",
               ncomp_col="_ncomp"):
        from ..functions.capabilities import capabilities_for

        caps = capabilities_for(kernel)
        if not caps.se_fast_path:
            raise ValueError(
                "PrunedSEAssignment requires a squared-Euclidean-"
                f"decomposable kernel (se_fast_path), got {kernel.name!r}"
            )
        C = np.asarray(centers, dtype=np.float64)
        k = len(C)
        if k < self.min_k:
            out = ExpressionAssignment().assign(
                df, kernel, centers, features_col, cluster_col, dist_col
            )
            # no pruning attempted: every distance was computed
            return out.withColumn(ncomp_col, F.lit(k))

        # k×k center-to-center Euclidean distances, precomputed driver-side
        diff = C[:, None, :] - C[None, :, :]
        cdist = np.sqrt((diff * diff).sum(axis=-1))

        from pyspark.sql.functions import pandas_udf

        @pandas_udf("struct<cluster:int,dist:double,ncomp:int>")
        def _prune(feats: pd.Series) -> pd.DataFrame:
            X = np.asarray(feats.tolist(), dtype=np.float64)
            if X.size == 0:
                return pd.DataFrame({"cluster": [], "dist": [], "ncomp": []})
            n = len(X)
            best = np.zeros(n, dtype=np.int64)
            delta = X - C[0]
            dmin = 0.5 * (delta * delta).sum(axis=1)
            ncomp = np.ones(n, dtype=np.int64)
            for i in range(1, k):
                # Lemma 1: skip center i when d(best, i) >= 2·d(x, best)
                need = cdist[best, i] < 2.0 * np.sqrt(2.0 * dmin)
                if not need.any():
                    continue
                delta = X[need] - C[i]
                di = 0.5 * (delta * delta).sum(axis=1)
                ncomp[need] += 1
                upd = di < dmin[need]
                idx = np.flatnonzero(need)[upd]
                dmin[idx] = di[upd]
                best[idx] = i
            return pd.DataFrame({
                "cluster": best.astype(np.int32),
                "dist": dmin,
                "ncomp": ncomp.astype(np.int32),
            })

        df = df.withColumn("_pa", _prune(F.col(features_col)))
        return (
            df.withColumn(cluster_col, F.col("_pa.cluster"))
            .withColumn(dist_col, F.col("_pa.dist"))
            .withColumn(ncomp_col, F.col("_pa.ncomp"))
            .drop("_pa")
        )


def pruning_stats(assigned: DataFrame, k: int,
                  ncomp_col: str = "_ncomp") -> dict:
    """Aggregate the pruning telemetry of a PrunedSEAssignment output:
    rows, average distance computations per row, and the pruning rate
    ``1 − avg/k`` (the reference's logged statistic,
    ``AcceleratedSEAssignment.scala:220-232``). One small agg job."""
    row = assigned.agg(
        F.sum(ncomp_col).alias("nc"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    n = int(row["n"] or 0)
    if n == 0:
        return {"rows": 0, "avg_computations": float("nan"),
                "pruning_rate": float("nan")}
    avg = float(row["nc"]) / n
    rate = (1.0 - avg / k) if k > 1 else 0.0
    return {"rows": n, "avg_computations": avg, "pruning_rate": rate}


class CrossJoinAssignment:
    """points × broadcast(centers df) + min_by argmin.

    Kept for parity with ``SECrossJoinAssignment.scala`` and for cases
    where centers already live in a DataFrame; requires a stable row id
    and a join back, so the expression paths are preferred.
    """

    name = "crossjoin"

    def assign(self, df, kernel, centers, features_col,
               cluster_col="_cluster", dist_col="_dist"):
        spark = df.sparkSession
        centers_df = spark.createDataFrame(
            [(int(i), [float(v) for v in c]) for i, c in enumerate(centers)],
            "center_id int, _center array<double>",
        )
        # The non-deterministic row id is evaluated on exactly ONE path:
        # original columns ride through the groupBy via first() instead
        # of a join back onto a second evaluation of the same frame
        # (task retries / speculative execution could re-stamp different
        # ids and silently misalign a self-join).
        orig_cols = df.columns
        stamped = df.withColumn("_rid", F.monotonically_increasing_id())
        joined = stamped.crossJoin(F.broadcast(centers_df)).withColumn(
            "_d", kernel.pairwise(F.col(features_col), F.col("_center"))
        )
        best = joined.groupBy("_rid").agg(
            F.min_by(F.struct(F.col("_d").alias("dist"),
                              F.col("center_id").alias("id")),
                     F.struct("_d", "center_id")).alias("_best"),
            *[F.first(c).alias(c) for c in orig_cols],
        )
        out = best.withColumn(cluster_col, F.col("_best.id"))
        out = out.withColumn(dist_col, F.col("_best.dist"))
        return out.select(*orig_cols, cluster_col, dist_col)


def adaptive_chunk_size(spark, d: int, broadcast_fraction: float = 0.1,
                        safety_factor: float = 2.0) -> int:
    """Centers-per-chunk from the executor memory budget (reference
    ``AdaptiveBroadcastAssignment.scala:50-190``): chunk ≈
    executor_mem × memory.fraction × broadcast_fraction / safety /
    (d × 8 bytes)."""
    mem_str = spark.conf.get("spark.executor.memory", "1g").lower()
    units = {"k": 2**10, "m": 2**20, "g": 2**30, "t": 2**40}
    mult = units.get(mem_str[-1], 1)
    mem = float(mem_str[:-1] if mult > 1 else mem_str) * mult
    frac = float(spark.conf.get("spark.memory.fraction", "0.6"))
    budget = mem * frac * broadcast_fraction / safety_factor
    return max(16, int(budget / (max(d, 1) * 8)))


def auto_assigner(k: int, d: int, strategy: str = "auto", spark=None,
                  kernel=None):
    """Decision tree mirroring ``AutoAssignment.scala:19-89``: small k·d →
    single expression; medium → chunked expressions; huge → Arrow/numpy.

    When ``kernel`` is given, the kernel's capability descriptor
    (``functions/capabilities.py``, reference ``ml/df/KernelOps.scala``)
    gates the single-expression rung: a kernel's ``broadcast_threshold``
    caps how many centers ride in one expression tree (SE/spherical
    1000; asymmetric Bregman kernels 500 — their two-argument zip_with
    chains are roughly twice the expression weight per center).
    """
    # "elkan" selects the accelerated fit-time iterator; single-pass
    # assignment (transform etc.) falls back to the auto decision tree
    if strategy == "adaptive":
        if spark is not None:
            return ChunkedExpressionAssignment(
                chunk_size=min(adaptive_chunk_size(spark, d), 1024)
            )
        return ChunkedExpressionAssignment()
    if strategy and strategy not in ("auto", "elkan"):
        return {
            "expression": ExpressionAssignment,
            "broadcast": ExpressionAssignment,
            "chunked": ChunkedExpressionAssignment,
            "pandas": PandasAssignment,
            "pruned": PrunedSEAssignment,
            "crossjoin": CrossJoinAssignment,
        }[strategy]()
    elems = k * max(d, 1)
    center_cap = None
    if kernel is not None:
        from ..functions.capabilities import capabilities_for

        caps = capabilities_for(kernel)
        center_cap = caps.broadcast_threshold
        # Lemma-1 pruning pays once there are enough centers to skip
        # (measured crossover ~k=16 at sf0.1; below that the Arrow
        # round-trip costs more than the skipped distance math) and is
        # only sound for SE-decomposable kernels
        # (``AutoAssignment.scala:19-89`` prefers the accelerated SE
        # strategy in the same regime). Upper-bounded so the k×k
        # center-distance matrix stays broadcast-small (see
        # PRUNED_AUTO_MAX_K).
        if caps.se_fast_path and PRUNED_AUTO_MIN_K <= k <= PRUNED_AUTO_MAX_K:
            return PrunedSEAssignment()
    if elems <= EXPRESSION_ELEM_LIMIT and (center_cap is None or k < center_cap):
        return ExpressionAssignment()
    if elems <= CHUNKED_ELEM_LIMIT:
        return ChunkedExpressionAssignment()
    return PandasAssignment()
