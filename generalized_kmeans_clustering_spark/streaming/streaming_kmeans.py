"""StreamingKMeans: incremental decay updates over micro-batches.

Re-expression of ``StreamingKMeans.scala`` — fit (:180-198), per-batch
update (:285-404: decay :356-369, center update :371-395,
dying-cluster split :407-433), structured-streaming updater
(:505-561):

- initial centers from a batch fit (the shared engine) or explicit;
- per micro-batch: ONE groupBy(cluster) aggregation computing count +
  per-dimension sums (k rows to the driver), then the classic decay
  update  c ← (a·w·c + s) / (a·w + m)  with a = decay_factor per batch
  (or decay^m when ``time_unit='points'``); ``half_life`` sets
  decay = 0.5^(1/half_life);
- dying clusters (weight < 1e-8 × max) absorb a split of the heaviest
  cluster (± ε perturbation), exactly the reference's strategy;
- ``StreamingUpdater.update_on(stream_df)`` wires this into
  ``writeStream.foreachBatch``; every batch snapshots
  ``<checkpoint_dir>/centers/latest.parquet`` so a crashed job resumes
  from the last materialized model (``README.md:530-538`` layout).

Model state is driver-held (k×d doubles) like the reference; the only
cluster-scale work per batch is the assignment + aggregation job.
"""

from __future__ import annotations

import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import get_kernel
from ..kmeans import GeneralizedKMeans, GeneralizedKMeansModel, \
    _ensure_array_features
from ..operators.assignment import auto_assigner

__all__ = ["StreamingKMeans", "StreamingKMeansModel", "StreamingUpdater"]


class StreamingKMeans:
    _algorithm = "StreamingKMeans"

    def __init__(
        self,
        k: int = 2,
        divergence: str = "squaredEuclidean",
        decay_factor: float = 1.0,
        half_life: float | None = None,
        time_unit: str = "batches",  # batches | points
        max_iter: int = 20,
        seed: int = 0,
        features_col: str = "features",
        prediction_col: str = "prediction",
        initial_centers=None,
        initial_weights=None,
    ):
        if time_unit not in ("batches", "points"):
            raise ValueError("time_unit: batches | points")
        self.k = k
        self.divergence = divergence
        self.decay_factor = (
            0.5 ** (1.0 / half_life) if half_life else float(decay_factor)
        )
        self.half_life = half_life
        self.time_unit = time_unit
        self.max_iter = max_iter
        self.seed = seed
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.initial_centers = initial_centers
        self.initial_weights = initial_weights

    def fit(self, df: DataFrame) -> "StreamingKMeansModel":
        """Batch warm-start (``StreamingKMeans.scala:180-198``)."""
        if self.initial_centers is not None:
            centers = np.asarray(self.initial_centers, dtype=np.float64)
            weights = np.asarray(
                self.initial_weights
                if self.initial_weights is not None
                else np.zeros(len(centers)),
                dtype=np.float64,
            )
        else:
            base = GeneralizedKMeans(
                k=self.k, divergence=self.divergence, max_iter=self.max_iter,
                seed=self.seed, features_col=self.features_col,
                prediction_col=self.prediction_col,
            ).fit(df)
            centers = base.centers
            weights = np.asarray(base.summary.cluster_sizes, dtype=np.float64)
        return StreamingKMeansModel(
            centers=centers, weights=weights, kernel_name=self.divergence,
            decay_factor=self.decay_factor, time_unit=self.time_unit,
            features_col=self.features_col,
            prediction_col=self.prediction_col,
        )


class StreamingKMeansModel(GeneralizedKMeansModel):
    """Mutable streaming model: centers + exponential-decay weights."""

    DYING_RATIO = 1e-8

    def __init__(self, centers, weights, kernel_name="squaredEuclidean",
                 decay_factor=1.0, time_unit="batches",
                 features_col="features", prediction_col="prediction"):
        super().__init__(
            centers, kernel_name, features_col=features_col,
            prediction_col=prediction_col,
            params={"decayFactor": decay_factor, "timeUnit": time_unit},
        )
        self.weights = np.asarray(weights, dtype=np.float64)
        self.decay_factor = float(decay_factor)
        self.time_unit = time_unit
        self.num_batches = 0

    def update(self, batch_df: DataFrame) -> "StreamingKMeansModel":
        """One micro-batch: assignment + k-row aggregation + driver math
        (``StreamingKMeans.scala:285-404``)."""
        kernel = get_kernel(self.kernel_name, smoothing=self.smoothing)
        batch_df = _ensure_array_features(batch_df, self.features_col)
        d = self.dim
        feats_col = self.features_col
        if kernel.pre_normalize:
            batch_df = batch_df.withColumn(
                feats_col, kernel.normalize(F.col(feats_col))
            )
        assigner = auto_assigner(self.k, d, "auto", kernel=kernel)
        assigned = assigner.assign(
            batch_df, kernel, self.centers.tolist(), feats_col
        )
        rows = assigned.groupBy("_cluster").agg(
            F.count(F.lit(1)).alias("m"),
            *[F.sum(F.element_at(F.col(feats_col), i + 1)).alias(f"s{i}")
              for i in range(d)],
        ).collect()
        m_tot = sum(int(r["m"]) for r in rows)
        if m_tot == 0:
            return self
        a = (
            self.decay_factor
            if self.time_unit == "batches"
            else self.decay_factor ** m_tot
        )
        # decay all weights first (:356-369)
        self.weights *= a
        for r in rows:
            c = int(r["_cluster"])
            m = float(r["m"])
            s = np.array([float(r[f"s{i}"] or 0.0) for i in range(d)])
            w = self.weights[c]
            self.centers[c] = (w * self.centers[c] + s) / (w + m)
            if kernel.pre_normalize:
                n = np.linalg.norm(self.centers[c])
                if n > 0:
                    self.centers[c] /= n
            self.weights[c] = w + m
        self._split_dying()
        self.num_batches += 1
        return self

    def _split_dying(self):
        """Smallest cluster below DYING_RATIO × largest absorbs a split
        of the largest (``StreamingKMeans.scala:407-433``)."""
        if self.k < 2:
            return
        small = int(self.weights.argmin())
        large = int(self.weights.argmax())
        if self.weights[small] >= self.DYING_RATIO * self.weights[large]:
            return
        w = self.weights[large] / 2.0
        self.weights[large] = w
        self.weights[small] = w
        eps = 1e-4 * max(np.abs(self.centers[large]).max(), 1.0)
        direction = np.random.RandomState(self.num_batches).randn(self.dim)
        direction = direction / (np.linalg.norm(direction) + 1e-12) * eps
        self.centers[small] = self.centers[large] + direction
        self.centers[large] = self.centers[large] - direction

    def _extra_metadata(self) -> dict:
        return {"decayFactor": self.decay_factor, "timeUnit": self.time_unit,
                "numBatches": self.num_batches}

    def _center_weights(self):
        return [float(w) for w in self.weights]

    @classmethod
    def _construct_loaded(cls, centers, weights, meta):
        ex = meta.get("extra", {})
        m = cls(
            centers=centers, weights=weights,
            kernel_name=meta["divergence"],
            decay_factor=ex.get("decayFactor", 1.0),
            time_unit=ex.get("timeUnit", "batches"),
            features_col=meta.get("featuresCol", "features"),
            prediction_col=meta.get("predictionCol", "prediction"),
        )
        m.num_batches = int(ex.get("numBatches", 0))
        return m

    # -- snapshots ----------------------------------------------------------
    def snapshot(self, spark, checkpoint_dir: str):
        path = os.path.join(checkpoint_dir, "centers", "latest.parquet")
        spark.createDataFrame(
            [(int(i), float(w), [float(v) for v in c])
             for i, (w, c) in enumerate(zip(self.weights, self.centers))],
            "center_id int, weight double, vector array<double>",
        ).coalesce(1).write.mode("overwrite").parquet(path)

    @classmethod
    def read_snapshot(cls, spark, checkpoint_dir: str,
                      kernel_name="squaredEuclidean", **kw):
        path = os.path.join(checkpoint_dir, "centers", "latest.parquet")
        rows = spark.read.parquet(path).orderBy("center_id").collect()
        return cls(
            centers=np.asarray([r["vector"] for r in rows]),
            weights=np.asarray([r["weight"] for r in rows]),
            kernel_name=kernel_name, **kw,
        )

    def create_streaming_updater(self, checkpoint_dir: str | None = None):
        return StreamingUpdater(self, checkpoint_dir)


class StreamingUpdater:
    """``writeStream.foreachBatch`` wiring (``StreamingKMeans.scala:505-561``)."""

    def __init__(self, model: StreamingKMeansModel,
                 checkpoint_dir: str | None = None):
        self.model = model
        self.checkpoint_dir = checkpoint_dir

    def _process_batch(self, batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        self.model.update(batch_df)
        if self.checkpoint_dir:
            self.model.snapshot(batch_df.sparkSession, self.checkpoint_dir)

    def update_on(self, stream_df: DataFrame, trigger: dict | None = None,
                  query_name: str = "streaming_kmeans"):
        """Start the streaming query; returns the StreamingQuery."""
        writer = stream_df.writeStream.foreachBatch(self._process_batch)
        writer = writer.queryName(query_name).outputMode("update")
        if self.checkpoint_dir:
            writer = writer.option(
                "checkpointLocation",
                os.path.join(self.checkpoint_dir, "query"),
            )
        if trigger:
            writer = writer.trigger(**trigger)
        return writer.start()
