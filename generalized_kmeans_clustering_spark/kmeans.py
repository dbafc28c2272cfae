"""GeneralizedKMeans estimator + model: Bregman k-means on DataFrames.

PySpark-native re-expression of
``GeneralizedKMeans.scala:178-268`` (fit) and
``GeneralizedKMeansModel.scala:70-217`` (transform/predict/cost).
The estimator duck-types the ``pyspark.ml`` surface
(``fit``/``transform``/``save``/``load``/param getters) so reference
examples port 1:1 without a JVM or py4j.

Features are ``array<double>`` natively; ``VectorUDT`` columns are
accepted and converted at the API boundary via
``pyspark.ml.functions.vector_to_array`` (SURVEY.md §7.3.6).
"""

from __future__ import annotations

import json
import hashlib
import os

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .functions.kernels import Kernel, get_kernel
from .operators.assignment import auto_assigner, distances_column
from .operators.initialization import initialize
from .plans.lloyds import LloydsConfig, run_lloyds
from .summary import TrainingSummary

__all__ = ["GeneralizedKMeans", "GeneralizedKMeansModel"]


def _ensure_array_features(df: DataFrame, col: str) -> DataFrame:
    """Accept VectorUDT or array<numeric>; normalize to array<double>."""
    dtype = df.schema[col].dataType
    if isinstance(dtype, T.ArrayType):
        if not isinstance(dtype.elementType, T.DoubleType):
            return df.withColumn(col, F.col(col).cast("array<double>"))
        return df
    if dtype.typeName() in ("vector", "vectorudt"):
        from pyspark.ml.functions import vector_to_array

        return df.withColumn(col, vector_to_array(F.col(col)).cast("array<double>"))
    raise TypeError(
        f"features column '{col}' must be array<double> or ml Vector, got {dtype}"
    )


#: per-violation-type remediation advice, keyed by (domain, violation)
#: (reference ``util/DivergenceDomainValidator.scala:35-120`` +
#: ``README.md:374-471`` error catalog)
_DOMAIN_ADVICE = {
    ("any", "nan"): "replace NaN/null features (e.g. na.fill) before fitting",
    ("nonneg", "negative"):
        "this divergence requires non-negative values — shift the data "
        "(x − min) or clip at 0",
    ("positive", "negative"):
        "Itakura-Saito requires strictly positive values — shift or clip "
        "above 0",
    ("positive", "zero"):
        "Itakura-Saito requires strictly positive values — add a small "
        "epsilon (or raise `smoothing`)",
    ("unit", "out_of_interval"):
        "logistic loss requires values in [0, 1] — min-max scale or "
        "sigmoid-transform the features",
}


def _validate_domain(df: DataFrame, kernel: Kernel, col: str, sample: int = 1000):
    """Sampled per-violation-type domain validation with an actionable
    error catalog (reference ``util/DivergenceDomainValidator.scala:35-120``).

    One aggregation over a ≤``sample``-row prefix counts rows per
    violation class (NaN / negative / zero / out-of-interval, as the
    divergence requires) and keeps one offending example per class.
    """
    dom = kernel.domain
    checks = [("any", "nan", lambda v: F.isnan(v) | v.isNull())]
    if dom == "nonneg":
        checks.append((dom, "negative", lambda v: v < 0))
    elif dom == "positive":
        checks.append((dom, "negative", lambda v: v < 0))
        checks.append((dom, "zero", lambda v: v == 0))
    elif dom == "unit":
        checks.append((dom, "out_of_interval", lambda v: (v < 0) | (v > 1)))
    s = df.select(F.col(col)).limit(sample)
    aggs = []
    for _, vname, pred in checks:
        hit = F.exists(F.col(col), pred)
        aggs.append(F.sum(hit.cast("int")).alias(f"n_{vname}"))
        aggs.append(
            F.max(F.when(hit, F.col(col).cast("string"))).alias(f"ex_{vname}")
        )
    row = s.agg(*aggs).collect()[0]
    problems = []
    for d, vname, _ in checks:
        n = int(row[f"n_{vname}"] or 0)
        if n > 0:
            advice = _DOMAIN_ADVICE[(d, vname)]
            problems.append(
                f"  - {vname}: {n} of first {sample} rows "
                f"(e.g. {row[f'ex_{vname}']}); {advice}"
            )
    if problems:
        raise ValueError(
            f"divergence '{kernel.name}' domain violations in column "
            f"'{col}':\n" + "\n".join(problems)
        )


class GeneralizedKMeans:
    """Lloyd's algorithm generalized to Bregman divergences.

    Parameters mirror ``GeneralizedKMeansParams.scala:9-215`` (defaults
    at :201-214): k, divergence, maxIter, tol, seed, initMode,
    initSteps, smoothing, featuresCol, predictionCol, weightCol,
    distanceCol, assignmentStrategy, emptyClusterStrategy.
    """

    _algorithm = "GeneralizedKMeans"

    def __init__(
        self,
        k: int = 2,
        divergence: str = "squaredEuclidean",
        max_iter: int = 20,
        tol: float = 1e-4,
        seed: int = 0,
        init_mode: str = "k-means||",
        init_steps: int = 2,
        smoothing: float = 1e-10,
        features_col: str = "features",
        prediction_col: str = "prediction",
        weight_col: str | None = None,
        distance_col: str | None = None,
        assignment_strategy: str = "auto",
        empty_cluster_strategy: str = "keep",
        initial_centers=None,
        # checkpoint_interval/checkpoint_dir: accepted for reference API
        # parity but intentionally NO-OPS — each iteration here is a
        # fresh constant-depth plan from literal centers (no growing
        # lineage to truncate), unlike the reference's RDD chain
        # (plans/lloyds.py has the full rationale)
        checkpoint_interval: int = 0,
        checkpoint_dir: str | None = None,
        # user-supplied events.SummarySink — fit records its typed
        # ClusteringEvents into it live (reference SummarySink usage:
        # caller constructs the sink, trainer records); when None a
        # private sink is used and the log still lands on
        # summary.events
        event_sink=None,
        # opt-in: real IterationCompleted.assignment_changes at the cost
        # of one persisted state frame per iteration (plans/lloyds.py)
        track_assignment_changes: bool = False,
    ):
        from .errors import InvalidK, InvalidMaxIterations

        if k < 1:
            raise InvalidK(k)
        # max_iter=0 is a legitimate assignment-only fit (e.g. building
        # an IVF index around caller-supplied centroids) — reject only
        # negatives, a deliberate relaxation of the reference's >= 1
        if max_iter < 0:
            raise InvalidMaxIterations(max_iter, minimum=0)
        self.k = k
        self.divergence = divergence
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.init_mode = init_mode
        self.init_steps = init_steps
        self.smoothing = smoothing
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.weight_col = weight_col
        self.distance_col = distance_col
        self.assignment_strategy = assignment_strategy
        self.empty_cluster_strategy = empty_cluster_strategy
        self.initial_centers = initial_centers
        self.checkpoint_interval = checkpoint_interval
        self.checkpoint_dir = checkpoint_dir
        self.event_sink = event_sink
        self.track_assignment_changes = track_assignment_changes

    # pyspark.ml-style getters
    def getK(self):
        return self.k

    def getDivergence(self):
        return self.divergence

    def _kernel(self) -> Kernel:
        return get_kernel(self.divergence, smoothing=self.smoothing)

    def _prepare(self, df: DataFrame, kernel: Kernel) -> DataFrame:
        df = _ensure_array_features(df, self.features_col)
        if kernel.pre_normalize:
            df = df.withColumn(self.features_col, kernel.normalize(F.col(self.features_col)))
        return df

    def fit(self, df: DataFrame) -> "GeneralizedKMeansModel":
        kernel = self._kernel()
        df = self._prepare(df, kernel)
        _validate_domain(df, kernel, self.features_col)

        work = df.select(
            *([self.features_col] + ([self.weight_col] if self.weight_col else []))
        )
        # Under-partitioned input (e.g. one small parquet file) serializes
        # the whole fit onto one core; rebalance once up front. At real
        # scale inputs already have >= cores partitions and this is a no-op.
        spark = df.sparkSession
        target = spark.sparkContext.defaultParallelism
        if work.rdd.getNumPartitions() < max(2, target // 2):
            work = work.repartition(target)
        cache_here = work.storageLevel.useMemory is False
        if cache_here:
            work = work.cache()
        from .events import InitializationCompleted, SummarySink, TrainingCompleted

        sink = self.event_sink if self.event_sink is not None else SummarySink()
        # a shared user sink may already hold earlier fits' events;
        # summary.events gets only this fit's slice
        _ev_start = sink.size
        try:
            import time as _t

            _init_t0 = _t.time()
            if self.initial_centers is not None:
                centers = np.asarray(self.initial_centers, dtype=np.float64)
                if kernel.pre_normalize:
                    centers = kernel.normalize_np(centers)
                init_method = "provided"
            else:
                centers = initialize(
                    work, self.k, kernel, self.features_col, self.seed,
                    self.init_mode, self.init_steps,
                )
                init_method = self.init_mode
            sink.record(InitializationCompleted(
                method=init_method,
                duration=int((_t.time() - _init_t0) * 1000)))
            cfg = LloydsConfig(
                k=len(centers),
                kernel=kernel,
                max_iter=self.max_iter,
                tol=self.tol,
                features_col=self.features_col,
                weight_col=self.weight_col,
                assignment_strategy=self.assignment_strategy,
                empty_cluster_strategy=self.empty_cluster_strategy,
                seed=self.seed,
                sink=sink,
                track_assignment_changes=self.track_assignment_changes,
            )
            # Explicit opt-in only: warm-JVM A/B at sf0.1 shows the
            # stateless exact loop beats the bound-state path at every
            # tested (k, n) in local mode — the bookkeeping (persist +
            # count per iteration) costs more than the skipped distance
            # work. The bounds would pay off on clusters where the
            # per-row distance work dominates I/O (huge k·d); keep it
            # behind assignment_strategy="elkan".
            # The accelerated iterator always keeps empty-cluster centers;
            # drop/reseed semantics need the exact loop.
            use_accel = (
                self.assignment_strategy == "elkan"
                and self.empty_cluster_strategy == "keep"
            )
            if self.assignment_strategy == "elkan" and not use_accel:
                import warnings

                warnings.warn(
                    "assignment_strategy='elkan' supports only "
                    "empty_cluster_strategy='keep'; falling back to the "
                    "exact Lloyd loop", stacklevel=2,
                )
            if use_accel:
                from .plans.accelerated import run_accelerated_lloyds

                result = run_accelerated_lloyds(work, centers, cfg)
            else:
                result = run_lloyds(work, centers, cfg)
        finally:
            if cache_here:
                work.unpersist()

        sink.record(TrainingCompleted(
            total_iterations=result.iterations,
            final_cost=float(result.distortion_history[-1])
            if result.distortion_history else float("nan"),
            total_duration=int(result.elapsed_sec * 1000),
        ))
        summary = TrainingSummary(
            algorithm=self._algorithm,
            k=len(result.centers),
            dim=result.centers.shape[1],
            divergence=kernel.name,
            iterations=result.iterations,
            converged=result.converged,
            distortion_history=result.distortion_history,
            movement_history=result.movement_history,
            cluster_sizes=result.cluster_sizes,
            elapsed_sec=result.elapsed_sec,
            pruned_history=result.pruned_history,
            events=sink.get_events()[_ev_start:],
        )
        return GeneralizedKMeansModel(
            centers=result.centers,
            kernel_name=kernel.name,
            smoothing=self.smoothing,
            features_col=self.features_col,
            prediction_col=self.prediction_col,
            distance_col=self.distance_col,
            assignment_strategy=self.assignment_strategy,
            summary=summary,
            params=self._param_map(),
        )

    def _param_map(self) -> dict:
        return {
            "k": self.k, "divergence": self.divergence, "maxIter": self.max_iter,
            "tol": self.tol, "seed": self.seed, "initMode": self.init_mode,
            "initSteps": self.init_steps, "smoothing": self.smoothing,
            "featuresCol": self.features_col, "predictionCol": self.prediction_col,
            "weightCol": self.weight_col, "distanceCol": self.distance_col,
            "assignmentStrategy": self.assignment_strategy,
            "emptyClusterStrategy": self.empty_cluster_strategy,
        }


class GeneralizedKMeansModel:
    """Fitted model: k×d centers + kernel. ``transform`` is fully lazy —
    a single codegen'd projection, no job until the caller acts
    (reference ``GeneralizedKMeansModel.scala:70-126``)."""

    LAYOUT_VERSION = 1

    def __init__(self, centers, kernel_name, smoothing=1e-10,
                 features_col="features", prediction_col="prediction",
                 distance_col=None, assignment_strategy="auto",
                 summary: TrainingSummary | None = None, params: dict | None = None):
        self.centers = np.asarray(centers, dtype=np.float64)
        self.kernel_name = kernel_name
        self.smoothing = smoothing
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.distance_col = distance_col
        self.assignment_strategy = assignment_strategy
        self.summary = summary
        self.params = params or {}

    @property
    def k(self) -> int:
        return len(self.centers)

    @property
    def dim(self) -> int:
        return self.centers.shape[1]

    def _kernel(self) -> Kernel:
        return get_kernel(self.kernel_name, smoothing=self.smoothing)

    def cluster_centers(self) -> np.ndarray:
        return self.centers.copy()

    def centers_df(self, spark) -> DataFrame:
        return spark.createDataFrame(
            [(int(i), [float(v) for v in c]) for i, c in enumerate(self.centers)],
            "center_id int, center array<double>",
        )

    def transform(self, df: DataFrame) -> DataFrame:
        kernel = self._kernel()
        df = _ensure_array_features(df, self.features_col)
        feats = F.col(self.features_col)
        if kernel.pre_normalize:
            feats = kernel.normalize(feats)
        assigner = auto_assigner(self.k, self.dim, self.assignment_strategy,
                                 spark=df.sparkSession, kernel=kernel)
        tmp = df.withColumn("_f_norm", feats) if kernel.pre_normalize else df
        fcol = "_f_norm" if kernel.pre_normalize else self.features_col
        out = assigner.assign(
            tmp, kernel, self.centers.tolist(), fcol,
            cluster_col=self.prediction_col,
            dist_col=self.distance_col or "_dist_tmp",
        )
        if not self.distance_col:
            out = out.drop("_dist_tmp")
        if kernel.pre_normalize:
            out = out.drop("_f_norm")
        # pruned strategy's telemetry column is fit-internal; only drop it
        # when the assigner added it (a pre-existing user column named
        # _ncomp must survive untouched)
        if "_ncomp" in out.columns and "_ncomp" not in df.columns:
            out = out.drop("_ncomp")
        return out

    def predict(self, vector) -> int:
        kernel = self._kernel()
        x = np.asarray(vector, dtype=np.float64)[None, :]
        return int(np.argmin(kernel.div_np(x, self.centers)[0]))

    def compute_cost(self, df: DataFrame) -> float:
        """WCSS: Σ w·min_c D(x, μ_c) (``GeneralizedKMeansModel.scala:161-191``)."""
        kernel = self._kernel()
        df = _ensure_array_features(df, self.features_col)
        feats = F.col(self.features_col)
        if kernel.pre_normalize:
            feats = kernel.normalize(feats)
        dists = distances_column(kernel, feats, self.centers.tolist())
        row = df.select(F.sum(F.array_min(dists)).alias("cost")).collect()[0]
        return float(row["cost"] or 0.0)

    # -- persistence: metadata.json + centers/*.parquet + sha256 ------------
    # layout contract: reference SPECIFICATION.md:227-256,
    # df/persistence/PersistenceLayout.scala:82-177. Subclasses override
    # _extra_metadata/_center_weights/_apply_extra to round-trip their
    # additional state; persistence.load_model dispatches on modelClass.
    def _extra_metadata(self) -> dict:
        return {}

    def _center_weights(self):
        return [1.0] * self.k

    def _apply_extra(self, extra: dict, weights):
        pass

    def save(self, spark, path: str):
        os.makedirs(path, exist_ok=True)
        centers_path = os.path.join(path, "centers")
        wts = [float(x) for x in self._center_weights()]
        spark.createDataFrame(
            [(int(i), wts[i], [float(v) for v in c])
             for i, c in enumerate(self.centers)],
            "center_id int, weight double, vector array<double>",
        ).repartition(1).sortWithinPartitions("center_id") \
            .write.mode("overwrite").parquet(centers_path)
        canonical = json.dumps(
            [[i, [float(v) for v in c]] for i, c in enumerate(self.centers)]
        )
        meta = {
            "layoutVersion": self.LAYOUT_VERSION,
            "algorithm": "GeneralizedKMeansModel",
            "modelClass": type(self).__name__,
            "divergence": self.kernel_name,
            "k": self.k,
            "dim": self.dim,
            "smoothing": self.smoothing,
            "paramMap": self.params,
            "featuresCol": self.features_col,
            "predictionCol": self.prediction_col,
            "distanceCol": self.distance_col,
            "extra": self._extra_metadata(),
            "checksums": {"centers_sha256": hashlib.sha256(canonical.encode()).hexdigest()},
        }
        with open(os.path.join(path, "metadata.json"), "w") as f:
            json.dump(meta, f, indent=2, sort_keys=True)
        if self.summary is not None:
            with open(os.path.join(path, "summary.json"), "w") as f:
                json.dump(self.summary.to_dict(), f, indent=2)

    @classmethod
    def load(cls, spark, path: str) -> "GeneralizedKMeansModel":
        with open(os.path.join(path, "metadata.json")) as f:
            meta = json.load(f)
        summary = None
        spath = os.path.join(path, "summary.json")
        if os.path.exists(spath):
            with open(spath) as f:
                summary = TrainingSummary(**json.load(f))
        rows = (
            spark.read.parquet(os.path.join(path, "centers"))
            .orderBy("center_id").collect()
        )
        centers = np.asarray([r["vector"] for r in rows], dtype=np.float64)
        weights = [float(r["weight"]) for r in rows]
        canonical = json.dumps(
            [[i, [float(v) for v in c]] for i, c in enumerate(centers)]
        )
        digest = hashlib.sha256(canonical.encode()).hexdigest()
        expected = meta.get("checksums", {}).get("centers_sha256")
        if expected and digest != expected:
            raise IOError(f"centers checksum mismatch at {path}")
        model = cls._construct_loaded(centers, weights, meta)
        model.summary = summary
        return model

    @classmethod
    def _construct_loaded(cls, centers, weights, meta) -> "GeneralizedKMeansModel":
        model = cls(
            centers=centers,
            kernel_name=meta["divergence"],
            smoothing=meta.get("smoothing", 1e-10),
            features_col=meta.get("featuresCol", "features"),
            prediction_col=meta.get("predictionCol", "prediction"),
            distance_col=meta.get("distanceCol"),
            params=meta.get("paramMap", {}),
        )
        model._apply_extra(meta.get("extra", {}), weights)
        return model
