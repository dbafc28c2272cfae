"""Typed error hierarchy (reference ml/df/GKMError.scala)."""

import pytest

from generalized_kmeans_clustering_spark.errors import (
    AssertionFailed, ConfigurationError, ConvergenceError,
    ConvergenceFailure, CostIncreased, DataError, DimensionMismatch,
    EmptyDataset, ErrorCategory, GKMError, IncompatibleTransform,
    InvalidFeatures, InvalidK, InvalidMaxIterations, InvalidSeed,
    InvalidTolerance, InvalidWeight, MissingColumn, UnknownInitMethod,
    UnknownKernel, ValidationError,
)


def test_messages_mirror_reference_formats():
    assert InvalidK(0, 100).message == \
        "Invalid k=0: must be positive and <= dataset size (100)"
    assert InvalidTolerance(-0.5).message == \
        "Invalid tolerance=-0.5: must be >= 0.0"
    assert InvalidMaxIterations(0).message == "Invalid maxIter=0: must be >= 1"
    assert InvalidSeed(-1).message == "Invalid seed=-1: must be >= 0"
    assert InvalidWeight(-2.0, row_index=7).message == \
        "Invalid weight=-2.0 at row 7: must be > 0.0 and finite"
    assert UnknownKernel("foo", ["se", "kl"]).message == \
        "Unknown kernel 'foo'. Supported: se, kl"
    assert UnknownInitMethod("bar", ["random"]).message == \
        "Unknown initialization method 'bar'. Supported: random"
    assert IncompatibleTransform("log1p", "l1", "bad").message == \
        "Transform 'log1p' incompatible with kernel 'l1': bad"
    assert MissingColumn("features", ["id", "x"]).message == \
        "Missing required column 'features'. Available: id, x"
    assert EmptyDataset("init").message == "Empty dataset: init"
    assert EmptyDataset().message == "Empty dataset"
    assert InvalidFeatures("contains NaN", 3, "features").message == \
        "Invalid features in column 'features' at row 3: contains NaN"
    assert DimensionMismatch(4, 3, 9).message == \
        "Dimension mismatch at row 9: expected 4, got 3"
    assert ConvergenceFailure(20, 1.5, 0.01).message == \
        "Failed to converge after 20 iterations (final cost=1.5000, delta=0.010000)"
    assert CostIncreased(2, 1.0, 2.0).message == \
        "Cost increased at iteration 2: 1.0000 -> 2.0000 (delta=1.0000)"
    assert AssertionFailed("x > 0", "update").message == \
        "Assertion failed: x > 0 (update)"


def test_categories():
    assert InvalidK(0).category is ErrorCategory.VALIDATION
    assert UnknownKernel("x").category is ErrorCategory.CONFIGURATION
    assert EmptyDataset().category is ErrorCategory.DATA
    assert ConvergenceFailure(1, 0.0, 0.0).category is \
        ErrorCategory.CONVERGENCE
    assert AssertionFailed("a").category is ErrorCategory.INTERNAL


def test_stdlib_bridges_match_reference_toException():
    # Validation/Data/Configuration -> catchable as ValueError
    assert isinstance(InvalidK(0), ValueError)
    assert isinstance(EmptyDataset(), ValueError)
    assert isinstance(MissingColumn("c"), ValueError)
    # kernel lookup additionally keeps the KeyError registry contract
    assert isinstance(UnknownKernel("x"), KeyError)
    assert str(UnknownKernel("x", ["se"])) == \
        "Unknown kernel 'x'. Supported: se"  # no KeyError repr-quoting
    # Convergence/Internal -> RuntimeError
    assert isinstance(ConvergenceFailure(1, 0.0, 0.0), RuntimeError)
    assert isinstance(AssertionFailed("a"), RuntimeError)
    # everything is a GKMError
    for e in (InvalidK(0), UnknownKernel("x"), EmptyDataset(),
              ConvergenceFailure(1, 0.0, 0.0)):
        assert isinstance(e, GKMError)


def test_wired_call_sites():
    from generalized_kmeans_clustering_spark import GeneralizedKMeans
    from generalized_kmeans_clustering_spark.functions.capabilities import (
        capabilities_for,
    )
    from generalized_kmeans_clustering_spark.functions.kernels import (
        get_kernel,
    )

    with pytest.raises(InvalidK):
        GeneralizedKMeans(k=0)
    with pytest.raises(InvalidMaxIterations):
        GeneralizedKMeans(k=2, max_iter=-1)
    GeneralizedKMeans(k=2, max_iter=0)  # assignment-only fit is legal
    with pytest.raises(UnknownKernel):
        get_kernel("noSuchDivergence")
    # legacy catch styles still work
    with pytest.raises(ValueError):
        get_kernel("noSuchDivergence")
    with pytest.raises(KeyError):
        capabilities_for("noSuchKernel")
    with pytest.raises(GKMError):
        capabilities_for("noSuchKernel")


def test_wired_transform_and_init_sites(spark):
    import numpy as np

    from generalized_kmeans_clustering_spark.functions import transforms as T
    from generalized_kmeans_clustering_spark.functions.kernels import (
        get_kernel,
    )
    from generalized_kmeans_clustering_spark.operators.initialization import (
        initialize,
    )

    with pytest.raises(IncompatibleTransform):
        T.validate_compatibility(get_kernel("spherical"), T.identity())
    df = spark.createDataFrame([([1.0, 2.0],)], "features array<double>")
    with pytest.raises(UnknownInitMethod):
        initialize(df, 1, get_kernel("se"), "features", 0, "bogus-mode")


def test_gkm_config_fluent_validate_and_presets(spark):
    from generalized_kmeans_clustering_spark.config import GKMConfig
    from generalized_kmeans_clustering_spark.errors import (
        InvalidK, InvalidState, InvalidTolerance,
    )

    cfg = (GKMConfig.default().with_k(10).with_kernel("kl")
           .with_max_iter(50).with_weight_col("w"))
    assert cfg.k == 10 and cfg.kernel == "kl" and cfg.weight_col == "w"
    assert cfg.without_weight_col().weight_col is None
    cfg.validate()  # clean
    with pytest.raises(InvalidK):
        GKMConfig(k=0).validate()
    with pytest.raises(InvalidTolerance):
        GKMConfig(tolerance=-1.0).validate()
    with pytest.raises(InvalidState):
        GKMConfig(mini_batch_fraction=0.0).validate()
    s = GKMConfig.kl(4).summary
    assert "kernel: kl" in s and "k: 4" in s
    # presets map to the engine's kernel registry names
    for preset in (GKMConfig.euclidean(3), GKMConfig.manhattan(3),
                   GKMConfig.itakura_saito(3), GKMConfig.cosine(3),
                   GKMConfig.fast(3), GKMConfig.high_quality(3),
                   GKMConfig.debug(3), GKMConfig.production(3),
                   GKMConfig.weighted(3, "w")):
        preset.validate()
        from generalized_kmeans_clustering_spark.functions.kernels import (
            get_kernel,
        )
        get_kernel(preset.kernel)  # resolvable


def test_gkm_config_to_estimator_fits(spark):
    import numpy as np

    from generalized_kmeans_clustering_spark.config import GKMConfig

    rng = np.random.RandomState(1)
    df = spark.createDataFrame(
        [([float(v) for v in rng.randn(2) + 8 * (i % 2)],)
         for i in range(60)],
        "features array<double>")
    est = GKMConfig.euclidean(2, max_iter=3).with_seed(5).to_estimator()
    m = est.fit(df)
    assert m.centers.shape == (2, 2)
    mb = GKMConfig.mini_batch(2).to_estimator()
    assert type(mb).__name__ == "MiniBatchKMeans"
