"""CoClustering: Bregman block co-clustering over COO triples.

Re-expression of ``CoClustering.scala:209-330`` (block means :324-330,
prediction :491-531): the matrix is a long-format DataFrame
(row_index, col_index, value); alternating updates of row clusters and
column clusters against the k_r × k_c block-mean matrix.

Spark shape — fully distributed, no collect of data rows:
- block means: ``groupBy(row_cluster, col_cluster).agg(sum, count)``
  → k_r·k_c rows to the driver;
- row update: each entry expands to a k_r-vector of squared residuals
  against the block means for its column's cluster (pure array
  expression from a broadcast literal matrix), then
  ``groupBy(row_index)`` sums the vectors element-wise and takes the
  argmin — one shuffle keyed by row_index (and symmetrically for
  columns). Assignments live in two small (index → cluster) frames
  that re-join the triples by key each half-iteration.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .summary import TrainingSummary

__all__ = ["CoClustering", "CoClusteringModel"]


class CoClustering:
    _algorithm = "CoClustering"

    def __init__(
        self,
        num_row_clusters: int = 2,
        num_col_clusters: int = 2,
        max_iter: int = 10,
        tol: float = 1e-6,
        seed: int = 0,
        row_index_col: str = "row_index",
        col_index_col: str = "col_index",
        value_col: str = "value",
        regularization: float = 0.0,
        init_mode: str = "hash",  # hash | modulo
    ):
        if num_row_clusters < 1 or num_col_clusters < 1:
            raise ValueError("cluster counts must be >= 1")
        if init_mode not in ("hash", "modulo"):
            raise ValueError("init_mode: hash | modulo")
        self.kr = num_row_clusters
        self.kc = num_col_clusters
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.row_index_col = row_index_col
        self.col_index_col = col_index_col
        self.value_col = value_col
        self.regularization = regularization
        self.init_mode = init_mode

    def _block_means(self, joined) -> tuple[np.ndarray, float]:
        rows = (
            joined.groupBy("_rc", "_cc")
            .agg(F.sum(self.value_col).alias("s"),
                 F.count(F.lit(1)).alias("n"))
            .collect()
        )
        global_sum = sum(float(r["s"] or 0.0) for r in rows)
        global_n = sum(int(r["n"]) for r in rows)
        gmean = global_sum / max(global_n, 1)
        B = np.full((self.kr, self.kc), gmean)
        for r in rows:
            if r["n"] > 0:
                B[int(r["_rc"]), int(r["_cc"])] = (
                    float(r["s"]) + self.regularization * gmean
                ) / (int(r["n"]) + self.regularization)
        return B, gmean

    def _reassign(self, joined, B: np.ndarray, axis: str):
        """axis='row': argmin over row clusters given column clusters."""
        if axis == "row":
            key, other, k = self.row_index_col, "_cc", self.kr
            Bmat = B  # B[r, cc]
        else:
            key, other, k = self.col_index_col, "_rc", self.kc
            Bmat = B.T  # B.T[c, rc]
        lit = F.array(*[
            F.array(*[F.lit(float(v)) for v in Bmat[j]]) for j in range(k)
        ])
        # residual vector per entry: for each candidate cluster j:
        # (value − B[j, other_cluster])²
        def _sq(c):
            return c * c

        resid = F.transform(
            lit,
            lambda row: _sq(
                F.col(self.value_col) - F.element_at(row, F.col(other) + 1)
            ),
        )
        per_key = (
            joined.withColumn("_resid", resid)
            .groupBy(key)
            .agg(*[
                F.sum(F.element_at("_resid", j + 1)).alias(f"r{j}")
                for j in range(k)
            ])
        )
        arr = F.array(*[F.col(f"r{j}") for j in range(k)])
        return per_key.select(
            F.col(key),
            (F.expr(
                f"array_position(array({','.join(f'r{j}' for j in range(k))}),"
                f" array_min(array({','.join(f'r{j}' for j in range(k))})))"
            ) - 1).cast("int").alias("_new"),
        )

    def fit(self, df: DataFrame) -> "CoClusteringModel":
        from time import time

        t0 = time()
        spark = df.sparkSession
        work = df.select(
            self.row_index_col, self.col_index_col, self.value_col
        ).cache()
        try:
            # deterministic initial assignments: seeded hash (default) or
            # plain index-modulo ('modulo' — bit-identical in any SQL
            # engine, used by the oracle-checkable entry query)
            if self.init_mode == "modulo":
                rc0 = F.pmod(F.col(self.row_index_col), F.lit(self.kr))
                cc0 = F.pmod(F.col(self.col_index_col), F.lit(self.kc))
            else:
                rc0 = F.pmod(
                    F.xxhash64(F.col(self.row_index_col), F.lit(self.seed)),
                    F.lit(self.kr))
                cc0 = F.pmod(
                    F.xxhash64(F.col(self.col_index_col), F.lit(self.seed + 1)),
                    F.lit(self.kc))
            rowc = work.select(self.row_index_col).distinct().withColumn(
                "_rc", rc0.cast("int")).cache()
            colc = work.select(self.col_index_col).distinct().withColumn(
                "_cc", cc0.cast("int")).cache()
            prev_cost = None
            cost_hist: list[float] = []
            converged = False
            iterations = 0
            B = np.zeros((self.kr, self.kc))
            for it in range(self.max_iter):
                joined = work.join(rowc, self.row_index_col).join(
                    colc, self.col_index_col
                )
                B, gmean = self._block_means(joined)
                # row pass
                new_rowc = self._reassign(joined, B, "row").withColumnRenamed(
                    "_new", "_rc"
                )
                rowc.unpersist()
                rowc = new_rowc.cache()
                joined = work.join(rowc, self.row_index_col).join(
                    colc, self.col_index_col
                )
                B, _ = self._block_means(joined)
                # column pass
                new_colc = self._reassign(joined, B, "col").withColumnRenamed(
                    "_new", "_cc"
                )
                colc.unpersist()
                colc = new_colc.cache()
                joined = work.join(rowc, self.row_index_col).join(
                    colc, self.col_index_col
                )
                B, _ = self._block_means(joined)
                blit = F.array(*[
                    F.array(*[F.lit(float(v)) for v in B[j]])
                    for j in range(self.kr)
                ])
                resid1 = (
                    F.col(self.value_col)
                    - F.element_at(
                        F.element_at(blit, F.col("_rc") + 1),
                        F.col("_cc") + 1,
                    )
                )
                cost = joined.select(
                    F.sum(resid1 * resid1).alias("c")
                ).collect()[0]["c"]
                cost = float(cost or 0.0)
                cost_hist.append(cost)
                iterations = it + 1
                if prev_cost is not None and abs(prev_cost - cost) <= self.tol * max(
                    abs(prev_cost), 1e-12
                ):
                    converged = True
                    break
                prev_cost = cost

            row_assign = {
                r[self.row_index_col]: int(r["_rc"]) for r in rowc.collect()
            }
            col_assign = {
                r[self.col_index_col]: int(r["_cc"]) for r in colc.collect()
            }
            rowc.unpersist()
            colc.unpersist()
        finally:
            work.unpersist()

        summary = TrainingSummary(
            algorithm=self._algorithm, k=self.kr * self.kc, dim=2,
            divergence="squaredEuclidean", iterations=iterations,
            converged=converged, distortion_history=cost_hist,
            movement_history=[], cluster_sizes=[], elapsed_sec=time() - t0,
        )
        return CoClusteringModel(
            block_means=B, row_assign=row_assign, col_assign=col_assign,
            row_index_col=self.row_index_col,
            col_index_col=self.col_index_col, value_col=self.value_col,
            summary=summary,
            params={"numRowClusters": self.kr, "numColClusters": self.kc,
                    "maxIter": self.max_iter, "seed": self.seed},
        )


class CoClusteringModel:
    """Block means + index→cluster maps; transform broadcast-joins the
    maps onto a triples frame (``CoClustering.scala:491-531``)."""

    def __init__(self, block_means, row_assign, col_assign,
                 row_index_col="row_index", col_index_col="col_index",
                 value_col="value", summary=None, params=None):
        self.block_means = np.asarray(block_means, dtype=np.float64)
        self.row_assign = row_assign
        self.col_assign = col_assign
        self.row_index_col = row_index_col
        self.col_index_col = col_index_col
        self.value_col = value_col
        self.summary = summary
        self.params = params or {}

    def transform(self, df: DataFrame) -> DataFrame:
        spark = df.sparkSession
        rmap = spark.createDataFrame(
            [(k, v) for k, v in self.row_assign.items()],
            f"{self.row_index_col} long, row_cluster int",
        )
        cmap = spark.createDataFrame(
            [(k, v) for k, v in self.col_assign.items()],
            f"{self.col_index_col} long, col_cluster int",
        )
        blit = F.array(*[
            F.array(*[F.lit(float(v)) for v in row]) for row in self.block_means
        ])
        out = df.join(F.broadcast(rmap), self.row_index_col, "left")
        out = out.join(F.broadcast(cmap), self.col_index_col, "left")
        return out.withColumn(
            "block_mean",
            F.element_at(
                F.element_at(blit, F.col("row_cluster") + 1),
                F.col("col_cluster") + 1,
            ),
        )

    def residual_cost(self, df: DataFrame) -> float:
        out = self.transform(df)
        row = out.select(
            F.sum(
                F.pow(F.col(self.value_col) - F.col("block_mean"), F.lit(2.0))
            ).alias("c")
        ).collect()[0]
        return float(row["c"] or 0.0)
