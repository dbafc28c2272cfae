"""SpectralClustering: affinity graph → Laplacian eigenmaps → k-means.

Re-expression of ``SpectralClustering.scala:224-330`` +
``df/SpectralGraph.scala:71-549``:

- affinity from any Mercer kernel (``full`` dense, ``knn``
  symmetrized top-m, or ``epsilon`` thresholded);
- graph Laplacian ``unnormalized`` (D−W), ``symmetric``
  (I − D^-½ W D^-½), or ``randomwalk`` (I − D⁻¹ W);
- k smallest eigenvectors (numpy ``eigh`` — no scipy in this
  environment), row-normalized for the symmetric Laplacian
  (Ng–Jordan–Weiss);
- driver-side k-means++ Lloyd on the spectral embedding.

Exact path is O(n²)/O(n³) on COLLECTED data with the reference's
documented ceiling; ``use_nystrom`` (auto above ``nystrom_threshold``
like the reference's n>5000 rule, ``SpectralClustering.scala:242-252``)
switches to the landmark approximation: m landmark rows, kernel-PCA
embedding Φ = K(X, L)·U·Λ^-½ from the m×m landmark Gram — the n×m
kernel block is computed in an Arrow-vectorized pass, so only m² work
and m·k state live on the driver.

``transform`` assigns new points by nearest input-space cluster
centroid (spectral clustering is transductive; this is the standard
out-of-sample approximation, documented in the model params).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.mercer import get_mercer_kernel
from .kmeans import GeneralizedKMeansModel, _ensure_array_features
from .summary import TrainingSummary

__all__ = ["SpectralClustering"]

log = logging.getLogger(__name__)

_WARN_ROWS = 10_000


def _kmeanspp_lloyd(E: np.ndarray, k: int, seed: int, iters: int = 50):
    """Plain numpy k-means++ + Lloyd on the (n×k) embedding."""
    rng = np.random.RandomState(seed)
    n = len(E)
    centers = [E[rng.randint(n)]]
    d2 = ((E - centers[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        total = d2.sum()
        probs = d2 / total if total > 0 else np.full(n, 1.0 / n)
        centers.append(E[rng.choice(n, p=probs)])
        d2 = np.minimum(d2, ((E - centers[-1]) ** 2).sum(axis=1))
    C = np.vstack(centers)
    labels = np.zeros(n, dtype=int)
    for _ in range(iters):
        D = ((E[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        new = D.argmin(axis=1)
        if (new == labels).all():
            labels = new
            break
        labels = new
        for c in range(k):
            m = labels == c
            if m.any():
                C[c] = E[m].mean(axis=0)
    return labels


class SpectralClustering:
    _algorithm = "SpectralClustering"

    def __init__(
        self,
        k: int = 2,
        kernel_type: str = "rbf",
        gamma: float | None = None,
        affinity_type: str = "full",  # full | knn | epsilon
        num_neighbors: int = 10,
        epsilon: float = 0.0,
        laplacian_type: str = "symmetric",  # unnormalized | symmetric | randomwalk
        use_nystrom: bool | None = None,
        num_landmarks: int = 500,
        nystrom_threshold: int = 5000,
        max_iter: int = 50,
        seed: int = 0,
        features_col: str = "features",
        prediction_col: str = "prediction",
    ):
        if affinity_type not in ("full", "knn", "epsilon"):
            raise ValueError("affinity_type: full | knn | epsilon")
        if laplacian_type not in ("unnormalized", "symmetric", "randomwalk"):
            raise ValueError("laplacian_type: unnormalized | symmetric | randomwalk")
        self.k = k
        self.kernel_type = kernel_type
        self.gamma = gamma
        self.affinity_type = affinity_type
        self.num_neighbors = num_neighbors
        self.epsilon = epsilon
        self.laplacian_type = laplacian_type
        self.use_nystrom = use_nystrom
        self.num_landmarks = num_landmarks
        self.nystrom_threshold = nystrom_threshold
        self.max_iter = max_iter
        self.seed = seed
        self.features_col = features_col
        self.prediction_col = prediction_col

    def _mercer(self):
        return get_mercer_kernel(self.kernel_type, gamma=self.gamma)

    # ------------------------------------------------------------- exact
    def _affinity(self, X: np.ndarray) -> np.ndarray:
        W = self._mercer().gram(X)
        np.fill_diagonal(W, 0.0)
        if self.affinity_type == "knn":
            m = min(self.num_neighbors, len(X) - 1)
            keep = np.zeros_like(W, dtype=bool)
            idx = np.argpartition(-W, m, axis=1)[:, :m]
            rowsel = np.arange(len(X))[:, None]
            keep[rowsel, idx] = True
            keep = keep | keep.T  # symmetrize
            W = np.where(keep, W, 0.0)
        elif self.affinity_type == "epsilon":
            W = np.where(W >= self.epsilon, W, 0.0)
        return W

    def _embed_exact(self, X: np.ndarray) -> np.ndarray:
        W = self._affinity(X)
        deg = W.sum(axis=1)
        deg = np.maximum(deg, 1e-12)
        if self.laplacian_type == "unnormalized":
            L = np.diag(deg) - W
        elif self.laplacian_type == "symmetric":
            Dm12 = 1.0 / np.sqrt(deg)
            L = np.eye(len(X)) - (Dm12[:, None] * W) * Dm12[None, :]
        else:  # randomwalk: eig of D^-1 W == sym problem on D^-1/2 W D^-1/2
            Dm12 = 1.0 / np.sqrt(deg)
            L = np.eye(len(X)) - (Dm12[:, None] * W) * Dm12[None, :]
        vals, vecs = np.linalg.eigh(L)
        E = vecs[:, np.argsort(vals)[: self.k]]
        if self.laplacian_type == "symmetric":
            norms = np.linalg.norm(E, axis=1, keepdims=True)
            E = E / np.maximum(norms, 1e-12)
        elif self.laplacian_type == "randomwalk":
            # recover random-walk eigenvectors: u = D^-1/2 v
            E = E / np.sqrt(deg)[:, None]
        return E

    # ----------------------------------------------------------- nystrom
    def _fit_nystrom(self, df: DataFrame, t0: float) -> GeneralizedKMeansModel:
        from time import time
        from pyspark.sql.functions import pandas_udf

        mercer = self._mercer()
        land_rows = (
            df.select(self.features_col)
            .withColumn("_h", F.xxhash64(F.col(self.features_col), F.lit(self.seed)))
            .orderBy("_h").limit(self.num_landmarks).collect()
        )
        L = np.asarray(
            [r[self.features_col] for r in land_rows], dtype=np.float64
        )
        Wmm = mercer.gram(L)
        vals, U = np.linalg.eigh(Wmm)
        keep = vals > max(vals.max(), 0) * 1e-10
        U, vals = U[:, keep], vals[keep]
        proj = U / np.sqrt(vals)[None, :]  # m × r : Φ(y) = K(y, L) @ proj
        topk = min(self.k, proj.shape[1])

        # distributed embedding pass (Arrow-vectorized)
        Lmat, projmat = L, proj

        @pandas_udf("array<double>")
        def _embed(feats: pd.Series) -> pd.Series:
            if len(feats) == 0:
                return pd.Series([], dtype=object)
            Y = np.asarray(feats.tolist(), dtype=np.float64)
            Phi = mercer.gram(Y, Lmat) @ projmat
            return pd.Series([row[-topk:][::-1].tolist() for row in Phi])

        emb_df = df.select(
            _embed(F.col(self.features_col)).alias("_emb")
        )
        # k-means on the embedding with the engine's own distributed loop
        from .kmeans import GeneralizedKMeans

        km = GeneralizedKMeans(
            k=self.k, divergence="squaredEuclidean", max_iter=self.max_iter,
            seed=self.seed, features_col="_emb",
        ).fit(emb_df)
        sizes = km.summary.cluster_sizes
        model = GeneralizedKMeansModel(
            centers=np.zeros((self.k, 1)),  # placeholder, see _nystrom fields
            kernel_name="squaredEuclidean",
            features_col=self.features_col,
            prediction_col=self.prediction_col,
            summary=TrainingSummary(
                algorithm=self._algorithm, k=self.k, dim=L.shape[1],
                divergence=f"spectral:{self.kernel_type}",
                iterations=km.summary.iterations, converged=True,
                distortion_history=km.summary.distortion_history,
                movement_history=[], cluster_sizes=sizes,
                elapsed_sec=time() - t0,
            ),
            params={"k": self.k, "kernelType": self.kernel_type,
                    "useNystrom": True, "numLandmarks": len(L),
                    "transformNote": "nystrom embedding + embedding argmin"},
        )
        model._nystrom = (L, proj, topk, km.centers, mercer)
        # override transform with embedding-space assignment
        model.transform = _NystromTransform(model, self.prediction_col,
                                            self.features_col)
        return model

    # ------------------------------------------- distributed epsilon path
    def _fit_epsilon_distributed(self, df: DataFrame, n: int,
                                 t0: float) -> GeneralizedKMeansModel:
        """Scale path for ``affinity_type='epsilon'``: the affinity graph
        is built as a DISTRIBUTED edge list (grid-bucketed join,
        ``operators/graph.py``) and the Laplacian spectrum comes from a
        landmark Nyström extension of the normalized affinity — the
        feature column is never collected (landmark state only: m rows,
        m×m eigenproblem on the driver, same ceiling as ``_fit_nystrom``).

        Semantics: RBF affinity w(x,y)=exp(−γ‖x−y‖²); edges kept where
        w ≥ ``epsilon`` (equivalently half-SE distance ≤ −ln ε ∕ 2γ,
        the exact path's thresholding restated as a radius so the grid
        join applies); symmetric normalized Laplacian L = I − D^-½WD^-½,
        whose smallest eigenvectors are the LARGEST of A = D^-½WD^-½ —
        Nyström-extended from the landmark block, then row-normalized
        (Ng–Jordan–Weiss) and clustered with the engine's own
        distributed k-means.
        """
        from time import time

        from .kmeans import GeneralizedKMeans
        from .operators.graph import epsilon_affinity_edges

        if self.kernel_type != "rbf":
            raise ValueError(
                "distributed epsilon affinity requires kernel_type='rbf' "
                "(the threshold maps to a Euclidean radius only for RBF); "
                "set use_nystrom=False for the driver-side exact path"
            )
        if self.laplacian_type != "symmetric":
            raise ValueError(
                "distributed epsilon affinity supports "
                "laplacian_type='symmetric' (Ng–Jordan–Weiss); "
                "set use_nystrom=False for the driver-side exact path"
            )
        if not 0.0 < self.epsilon < 1.0:
            raise ValueError(
                "epsilon is an RBF-affinity threshold in (0, 1) "
                f"(got {self.epsilon})"
            )
        spark = df.sparkSession
        ids = df.select(
            F.monotonically_increasing_id().alias("_sid"),
            F.col(self.features_col).alias("_sf"),
        ).cache()
        dim = ids.select(F.size("_sf").alias("d")).first()["d"]
        if self.gamma is not None:
            g = float(self.gamma)
        else:
            # sklearn-'scale' auto gamma 1/(d·var), computed distributedly
            # over the flattened feature elements (matches RBFKernel._gamma)
            s = ids.select(F.explode("_sf").alias("v")).agg(
                F.avg("v").alias("m"), F.avg(F.col("v") * F.col("v")).alias("m2")
            ).first()
            var = max(float(s["m2"]) - float(s["m"]) ** 2, 0.0)
            g = 1.0 / (dim * var) if var > 0 else 1.0
        cutoff = -np.log(self.epsilon) / (2.0 * g)  # half-SE radius
        edges = epsilon_affinity_edges(
            ids, dim, id_col="_sid", features_col="_sf",
            epsilon=cutoff, gamma=2.0 * g,  # w = exp(−2γ·halfSE) = exp(−γ‖x−y‖²)
        ).persist()
        deg = (
            edges.select(F.col("i").alias("_sid"), "w")
            .unionAll(edges.select(F.col("j").alias("_sid"), "w"))
            .groupBy("_sid").agg(F.sum("w").alias("_deg"))
        )

        # landmark state: m rows + their GLOBAL graph degrees
        m = min(self.num_landmarks, n)
        land = (
            ids.withColumn("_h", F.xxhash64("_sf", F.lit(self.seed)))
            .orderBy("_h").limit(m).select("_sid", "_sf")
            .join(deg, "_sid", "left").collect()
        )
        lids = [r["_sid"] for r in land]
        Lmat = np.asarray([r["_sf"] for r in land], dtype=np.float64)
        ldeg = np.array([float(r["_deg"] or 0.0) for r in land])
        # landmark-landmark block of the SAME graph: RBF, thresholded,
        # zero diagonal, normalized by the global degrees
        x2 = (Lmat ** 2).sum(axis=1)
        d2 = np.maximum(x2[:, None] - 2.0 * Lmat @ Lmat.T + x2[None, :], 0.0)
        Wmm = np.exp(-g * d2)
        np.fill_diagonal(Wmm, 0.0)
        Wmm[Wmm < self.epsilon] = 0.0
        dsafe = np.maximum(ldeg, 1e-12)
        Amm = Wmm / np.sqrt(dsafe[:, None] * dsafe[None, :])
        vals, U = np.linalg.eigh(Amm)
        topk = min(self.k, len(vals))
        lam = vals[-topk:][::-1]
        U = U[:, -topk:][:, ::-1]
        lam = np.where(np.abs(lam) > 1e-10, lam, 1e-10)
        proj = U / lam[None, :]  # Nyström: ũ_i = Σ_l A_il · U_lt / λ_t

        land_df = F.broadcast(spark.createDataFrame(
            [(int(lid), float(dv), [float(v) for v in proj[i]])
             for i, (lid, dv) in enumerate(zip(lids, dsafe))],
            "_lid long, _ldeg double, _p array<double>",
        ))
        # edges incident to a landmark, both orientations; A_il then
        # scatter-adds the landmark's projection row into the embedding
        el = (
            edges.select(F.col("i").alias("_sid"), F.col("j").alias("_lid"), "w")
            .unionAll(
                edges.select(F.col("j").alias("_sid"), F.col("i").alias("_lid"), "w"))
            .join(land_df, "_lid")
            .join(deg, "_sid")
        )
        a = F.col("w") / F.sqrt(
            F.greatest(F.col("_deg"), F.lit(1e-12)) * F.col("_ldeg"))
        emb = (
            el.select("_sid", *[
                (a * F.element_at("_p", t + 1)).alias(f"_e{t}")
                for t in range(topk)
            ])
            .groupBy("_sid")
            .agg(*[F.sum(f"_e{t}").alias(f"_e{t}") for t in range(topk)])
        )
        emb_full = ids.join(emb, "_sid", "left").na.fill(
            {f"_e{t}": 0.0 for t in range(topk)})
        arr = F.array(*[F.col(f"_e{t}") for t in range(topk)])
        norm = F.sqrt(F.aggregate(
            arr, F.lit(0.0), lambda acc, v: acc + v * v))
        emb_full = emb_full.withColumn(
            "_emb",
            F.transform(arr, lambda v: v / F.greatest(norm, F.lit(1e-12))),
        ).select("_sid", "_sf", "_emb").persist()

        km = GeneralizedKMeans(
            k=self.k, divergence="squaredEuclidean", max_iter=self.max_iter,
            seed=self.seed, features_col="_emb",
        ).fit(emb_full)
        assigned = km.transform(emb_full)
        # input-space centroids (distributed elementwise mean) give the
        # same out-of-sample transform the exact path documents
        cent_rows = (
            assigned.select("prediction", F.posexplode("_sf").alias("_p", "_v"))
            .groupBy("prediction", "_p").agg(F.avg("_v").alias("_m"),
                                             F.count(F.lit(1)).alias("_n"))
            .collect()
        )
        centers = np.zeros((self.k, dim))
        counts = np.zeros(self.k, dtype=np.int64)
        for r in cent_rows:
            centers[int(r["prediction"]), int(r["_p"])] = float(r["_m"])
            counts[int(r["prediction"])] = int(r["_n"])
        sizes = counts.tolist()
        edges.unpersist()
        ids.unpersist()

        model = GeneralizedKMeansModel(
            centers=centers, kernel_name="squaredEuclidean",
            features_col=self.features_col, prediction_col=self.prediction_col,
            summary=TrainingSummary(
                algorithm=self._algorithm, k=self.k, dim=dim,
                divergence=f"spectral:{self.kernel_type}",
                iterations=km.summary.iterations,
                converged=km.summary.converged,
                distortion_history=km.summary.distortion_history,
                movement_history=km.summary.movement_history,
                cluster_sizes=sizes, elapsed_sec=time() - t0,
            ),
            params={"k": self.k, "kernelType": self.kernel_type,
                    "affinityType": "epsilon", "laplacianType": "symmetric",
                    "useNystrom": True, "numLandmarks": m,
                    "distributedGraph": True, "gamma": g,
                    "transformNote":
                        "out-of-sample points use nearest input-space centroid"},
        )
        model.training_assignments = assigned.select(
            "_sid", F.col("prediction").alias(self.prediction_col))
        emb_full.unpersist()
        return model

    # --------------------------------------------------------------- fit
    def fit(self, df: DataFrame) -> GeneralizedKMeansModel:
        from time import time

        t0 = time()
        df = _ensure_array_features(df, self.features_col)
        n = df.count()
        nystrom = (
            self.use_nystrom
            if self.use_nystrom is not None
            else n > self.nystrom_threshold
        )
        if (nystrom and self.affinity_type == "epsilon"
                and self.kernel_type == "rbf"
                and self.laplacian_type == "symmetric"
                and 0.0 < self.epsilon < 1.0):
            # the distributed edge-list path honors the epsilon
            # thresholding the plain landmark embedding would ignore
            return self._fit_epsilon_distributed(df, n, t0)
        if nystrom:
            if self.affinity_type == "epsilon":
                log.warning(
                    "epsilon affinity at scale needs rbf + symmetric "
                    "Laplacian + epsilon in (0,1) for the distributed "
                    "graph path; falling back to the landmark embedding "
                    "(threshold ignored)")
            return self._fit_nystrom(df, t0)

        rows = df.select(self.features_col).collect()
        if len(rows) > _WARN_ROWS:
            log.warning(
                "SpectralClustering exact path collects %d rows; "
                "set use_nystrom=True at scale", len(rows),
            )
        X = np.asarray([r[self.features_col] for r in rows], dtype=np.float64)
        E = self._embed_exact(X)
        labels = _kmeanspp_lloyd(E, self.k, self.seed, self.max_iter)
        k = self.k
        # input-space centroids for out-of-sample transform
        centers = np.vstack([
            X[labels == c].mean(axis=0) if (labels == c).any()
            else X[np.random.RandomState(self.seed + c).randint(len(X))]
            for c in range(k)
        ])
        sizes = np.bincount(labels, minlength=k).tolist()
        summary = TrainingSummary(
            algorithm=self._algorithm, k=k, dim=X.shape[1],
            divergence=f"spectral:{self.kernel_type}", iterations=1,
            converged=True, distortion_history=[], movement_history=[],
            cluster_sizes=sizes, elapsed_sec=time() - t0,
        )
        model = GeneralizedKMeansModel(
            centers=centers, kernel_name="squaredEuclidean",
            features_col=self.features_col, prediction_col=self.prediction_col,
            summary=summary,
            params={"k": self.k, "kernelType": self.kernel_type,
                    "affinityType": self.affinity_type,
                    "laplacianType": self.laplacian_type,
                    "useNystrom": False,
                    "transformNote":
                        "out-of-sample points use nearest input-space centroid"},
        )
        model.training_labels = labels
        return model


class _NystromTransform:
    """Bound transform: Nyström-embed then argmin to embedding centers."""

    def __init__(self, model, prediction_col, features_col):
        self.model = model
        self.prediction_col = prediction_col
        self.features_col = features_col

    def __call__(self, df: DataFrame) -> DataFrame:
        from pyspark.sql.functions import pandas_udf

        L, proj, topk, centers, mercer = self.model._nystrom
        df = _ensure_array_features(df, self.features_col)
        C = centers

        @pandas_udf("int")
        def _pred(feats: pd.Series) -> pd.Series:
            if len(feats) == 0:
                return pd.Series([], dtype="int32")
            Y = np.asarray(feats.tolist(), dtype=np.float64)
            Phi = mercer.gram(Y, L) @ proj
            Phi = Phi[:, ::-1][:, :topk]
            D = ((Phi[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
            return pd.Series(D.argmin(axis=1).astype(np.int32))

        return df.withColumn(self.prediction_col, _pred(F.col(self.features_col)))
