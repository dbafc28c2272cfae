"""pyspark.ml Pipeline integration for the native estimators.

The reference estimators extend Spark ML ``Estimator``/``Model``
(``ml/GeneralizedKMeans.scala:178``, params
``GeneralizedKMeansParams.scala:9-215``, Python wrapper
``python/massivedatascience/clusterer/kmeans.py:211-330``) so they
compose with ``Pipeline``, ``CrossValidator`` and ML persistence. The
native classes here are deliberately plain Python (no py4j); this
module provides thin adapter stages that subclass the real
``pyspark.ml`` base classes and delegate fit/transform to the native
engine:

- ``GeneralizedKMeans`` (ml variant): ``pyspark.ml.Estimator`` with
  proper ``Param`` machinery (works in Pipeline / ParamGridBuilder /
  CrossValidator).
- ``GeneralizedKMeansModel`` (ml variant): ``pyspark.ml.Model`` whose
  ``transform`` is the native lazy projection; persists via the native
  layout (metadata.json + centers parquet + sha256) wrapped in the ML
  reader/writer protocol, so ``PipelineModel.save/load`` round-trips.

VectorUDT feature columns (e.g. from ``VectorAssembler``) are accepted
natively — the engine converts at the API boundary.
"""

from __future__ import annotations

from pyspark import keyword_only
from pyspark.ml import Estimator, Model, Transformer
from pyspark.ml.param import Param, Params, TypeConverters
from pyspark.ml.param.shared import (
    HasFeaturesCol, HasMaxIter, HasPredictionCol, HasSeed, HasTol,
    HasWeightCol,
)
from pyspark.ml.util import (
    DefaultParamsReadable, DefaultParamsWritable, MLReadable, MLReader,
    MLWritable, MLWriter,
)

from .kmeans import GeneralizedKMeans as _NativeEstimator

__all__ = ["GeneralizedKMeans", "GeneralizedKMeansModel"]


class _GeneralizedKMeansParams(
    HasFeaturesCol, HasPredictionCol, HasMaxIter, HasSeed, HasTol,
    HasWeightCol,
):
    """Shared Param definitions (mirrors GeneralizedKMeansParams.scala)."""

    k = Param(
        Params._dummy(), "k", "number of clusters (> 1)",
        typeConverter=TypeConverters.toInt,
    )
    divergence = Param(
        Params._dummy(), "divergence",
        "Bregman divergence / kernel name (squaredEuclidean, kl, "
        "itakuraSaito, generalizedI, logistic, l1, spherical, ...)",
        typeConverter=TypeConverters.toString,
    )
    initMode = Param(
        Params._dummy(), "initMode", "center initialization: random | k-means||",
        typeConverter=TypeConverters.toString,
    )
    initSteps = Param(
        Params._dummy(), "initSteps", "k-means|| rounds",
        typeConverter=TypeConverters.toInt,
    )
    smoothing = Param(
        Params._dummy(), "smoothing",
        "divergence domain smoothing epsilon",
        typeConverter=TypeConverters.toFloat,
    )
    distanceCol = Param(
        Params._dummy(), "distanceCol",
        "optional output column with the distance to the assigned center",
        typeConverter=TypeConverters.toString,
    )
    assignmentStrategy = Param(
        Params._dummy(), "assignmentStrategy",
        "auto | expression | chunked | pandas | crossjoin | elkan",
        typeConverter=TypeConverters.toString,
    )
    emptyClusterStrategy = Param(
        Params._dummy(), "emptyClusterStrategy", "keep | drop | reseed",
        typeConverter=TypeConverters.toString,
    )

    def _native_kwargs(self) -> dict:
        return dict(
            k=self.getOrDefault(self.k),
            divergence=self.getOrDefault(self.divergence),
            max_iter=self.getOrDefault(self.maxIter),
            tol=self.getOrDefault(self.tol),
            seed=self.getOrDefault(self.seed),
            init_mode=self.getOrDefault(self.initMode),
            init_steps=self.getOrDefault(self.initSteps),
            smoothing=self.getOrDefault(self.smoothing),
            features_col=self.getOrDefault(self.featuresCol),
            prediction_col=self.getOrDefault(self.predictionCol),
            weight_col=self.getOrDefault(self.weightCol) or None,
            distance_col=self.getOrDefault(self.distanceCol) or None,
            assignment_strategy=self.getOrDefault(self.assignmentStrategy),
            empty_cluster_strategy=self.getOrDefault(self.emptyClusterStrategy),
        )


class GeneralizedKMeans(
    Estimator, _GeneralizedKMeansParams,
    DefaultParamsWritable, DefaultParamsReadable,
):
    """``pyspark.ml``-native Bregman k-means estimator (adapter).

    Example::

        pipe = Pipeline(stages=[
            VectorAssembler(inputCols=[...], outputCol="features"),
            GeneralizedKMeans(k=4, divergence="kl"),
        ])
        model = pipe.fit(df)          # PipelineModel
        model.transform(df).show()
    """

    @keyword_only
    def __init__(self, *, k=2, divergence="squaredEuclidean", maxIter=20,
                 tol=1e-4, seed=0, initMode="k-means||", initSteps=2,
                 smoothing=1e-10, featuresCol="features",
                 predictionCol="prediction", weightCol="",
                 distanceCol="", assignmentStrategy="auto",
                 emptyClusterStrategy="keep"):
        super().__init__()
        self._setDefault(
            k=2, divergence="squaredEuclidean", maxIter=20, tol=1e-4,
            seed=0, initMode="k-means||", initSteps=2, smoothing=1e-10,
            featuresCol="features", predictionCol="prediction",
            weightCol="", distanceCol="", assignmentStrategy="auto",
            emptyClusterStrategy="keep",
        )
        self._set(**self._input_kwargs)

    @keyword_only
    def setParams(self, **kwargs):
        return self._set(**self._input_kwargs)

    def setK(self, value):
        return self._set(k=value)

    def getK(self):
        return self.getOrDefault(self.k)

    def setDivergence(self, value):
        return self._set(divergence=value)

    def getDivergence(self):
        return self.getOrDefault(self.divergence)

    def setFeaturesCol(self, value):
        return self._set(featuresCol=value)

    def setPredictionCol(self, value):
        return self._set(predictionCol=value)

    def setMaxIter(self, value):
        return self._set(maxIter=value)

    def setSeed(self, value):
        return self._set(seed=value)

    def setTol(self, value):
        return self._set(tol=value)

    def _fit(self, dataset) -> "GeneralizedKMeansModel":
        native = _NativeEstimator(**self._native_kwargs()).fit(dataset)
        model = GeneralizedKMeansModel(native)
        model._resetUid(self.uid)
        model._set(**{p.name: self.getOrDefault(p) for p in self.params})
        return model


class _NativeModelWriter(MLWriter):
    def __init__(self, instance):
        super().__init__()
        self.instance = instance

    def saveImpl(self, path):
        self.instance._native.save(self.sparkSession, path)


class _NativeModelReader(MLReader):
    def __init__(self, cls):
        super().__init__()
        self._cls = cls

    def load(self, path):
        from pyspark.sql import SparkSession

        from .persistence import load_model

        spark = SparkSession.getActiveSession() or SparkSession.builder.getOrCreate()
        native = load_model(spark, path)
        wrapper = self._cls(native)
        wrapper._set(
            featuresCol=native.features_col,
            predictionCol=native.prediction_col,
        )
        return wrapper


class GeneralizedKMeansModel(
    Model, _GeneralizedKMeansParams, MLWritable, MLReadable,
):
    """Fitted ML-stage wrapper around the native model.

    ``transform`` is the native lazy assignment projection; the native
    model is reachable as ``.native`` for engine APIs
    (``compute_cost``, ``predict``, ``summary``, ``centers``).
    """

    def __init__(self, native=None):
        super().__init__()
        self._native = native

    @property
    def native(self):
        return self._native

    @property
    def clusterCenters(self):
        return self._native.centers.copy()

    @property
    def summary(self):
        return self._native.summary

    def computeCost(self, dataset) -> float:
        return self._native.compute_cost(dataset)

    def predict(self, vector) -> int:
        return self._native.predict(vector)

    def _transform(self, dataset):
        return self._native.transform(dataset)

    def write(self) -> MLWriter:
        return _NativeModelWriter(self)

    @classmethod
    def read(cls) -> MLReader:
        return _NativeModelReader(cls)


class FeatureTransformer(
    Transformer, DefaultParamsWritable, DefaultParamsReadable,
):
    """Pipeline stage applying a named feature transform
    (``functions/transforms.py``; reference ``FeatureTransform.scala``
    + its use in transform-aware pipelines).

    The transform is referenced BY NAME (resolved through
    ``transforms.from_string``) so the stage round-trips through the
    standard ML params writer. Accepts array<double> or VectorUDT
    input; output is array<double>.

    Example::

        pipe = Pipeline(stages=[
            VectorAssembler(inputCols=[...], outputCol="raw"),
            FeatureTransformer(transformName="kl", inputCol="raw",
                               outputCol="features"),
            GeneralizedKMeans(k=4, divergence="kl"),
        ])
    """

    transformName = Param(
        Params._dummy(), "transformName",
        "transform name: identity | log1p | epsilon_shift | "
        "normalize_l2 | normalize_l1 | kl | spherical",
        typeConverter=TypeConverters.toString,
    )
    inputCol = Param(
        Params._dummy(), "inputCol", "input features column",
        typeConverter=TypeConverters.toString,
    )
    outputCol = Param(
        Params._dummy(), "outputCol", "output (transformed) column",
        typeConverter=TypeConverters.toString,
    )

    @keyword_only
    def __init__(self, *, transformName="identity",
                 inputCol="features", outputCol="features_t"):
        super().__init__()
        self._setDefault(transformName="identity", inputCol="features",
                         outputCol="features_t")
        self._set(**self._input_kwargs)

    @keyword_only
    def setParams(self, **kwargs):
        return self._set(**kwargs)

    def getTransformName(self):
        return self.getOrDefault(self.transformName)

    def setTransformName(self, value):
        return self._set(transformName=value)

    def setInputCol(self, value):
        return self._set(inputCol=value)

    def setOutputCol(self, value):
        return self._set(outputCol=value)

    @property
    def native(self):
        """The resolved FeatureTransform (compatibility checks, numpy
        twin, center inverse)."""
        from .functions.transforms import from_string

        return from_string(self.getOrDefault(self.transformName))

    def _transform(self, dataset):
        from .kmeans import _ensure_array_features

        in_col = self.getOrDefault(self.inputCol)
        out_col = self.getOrDefault(self.outputCol)
        dataset = _ensure_array_features(dataset, in_col)
        return self.native.apply(dataset, in_col, out_col)
