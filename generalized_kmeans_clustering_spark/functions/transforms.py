"""Feature transforms with divergence-compatibility checks.

Re-expression of the reference's ``ml/df/FeatureTransform.scala:41-359``:
a small set of composable feature-space transforms (identity, log1p,
epsilon shift, L1/L2 normalization, standard scaling) each carrying

- a pure Catalyst column expression (``col(...)`` — the DataFrame
  path stays JVM-side, no UDF),
- a numpy twin (``apply_np``) for driver-side center math,
- an inverse for mapping centers back to the original space
  (``inverse_center``), and
- a divergence-compatibility predicate (``compatible_with``) consumed
  by :func:`validate_compatibility` together with the kernel
  capability descriptors (``capabilities.py``; reference
  ``KernelOps.isTransformSafe``).

Compatibility rules mirror the reference: log1p → KL/SE; epsilon
shift → positive-domain divergences; L2 normalization → SE/spherical;
L1 normalization → KL/SE (probability simplexes); identity/scaling →
anything except spherical, which REQUIRES L2 normalization
(``KernelOps.scala:199-210``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "FeatureTransform", "NoOpTransform", "Log1pTransform",
    "EpsilonShiftTransform", "NormalizeL2Transform",
    "NormalizeL1Transform", "StandardScalingTransform",
    "ComposedTransform", "identity", "log1p", "epsilon_shift",
    "normalize_l2", "normalize_l1", "standard_scale", "for_kl",
    "for_spherical", "from_string", "validate_compatibility",
    "recommended_transform",
]


def _norm_name(s: str) -> str:
    return s.lower().replace("-", "").replace("_", "").replace(" ", "")


class FeatureTransform:
    """Base contract (``FeatureTransform.scala:41-95``)."""

    name: str = "base"

    def expr(self, features: Column) -> Column:
        raise NotImplementedError

    def apply(self, df: DataFrame, features_col: str,
              out_col: str) -> DataFrame:
        return df.withColumn(out_col, self.expr(F.col(features_col)))

    def apply_np(self, v: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def inverse_center(self, center: np.ndarray) -> np.ndarray:
        """Map a center from transformed space back (identity where the
        transform is not invertible per-point, matching the reference)."""
        return np.asarray(center, dtype=np.float64)

    def compatible_with(self, divergence: str) -> bool:
        return True

    def and_then(self, other: "FeatureTransform") -> "FeatureTransform":
        return ComposedTransform(self, other)


class NoOpTransform(FeatureTransform):
    name = "identity"

    def expr(self, features: Column) -> Column:
        return features

    def apply_np(self, v):
        return np.asarray(v, dtype=np.float64)


class Log1pTransform(FeatureTransform):
    """x → ln(1+x) for non-negative heavy-tailed data
    (``FeatureTransform.scala:112-140``)."""

    name = "log1p"

    def expr(self, features: Column) -> Column:
        return F.transform(features, lambda x: F.log1p(x))

    def apply_np(self, v):
        return np.log1p(np.asarray(v, dtype=np.float64))

    def inverse_center(self, center):
        return np.expm1(np.asarray(center, dtype=np.float64))

    def compatible_with(self, divergence):
        # log1p of a positive input stays positive, so generalized-I is
        # well defined on the transformed features (recommended_transform
        # returns for_kl for GI; the two must agree with each other).
        return _norm_name(divergence) in (
            "kl", "kullbackleibler", "relativeentropy",
            "generalizedi", "gi",
            "squaredeuclidean", "euclidean", "se", "l2",
        )


class EpsilonShiftTransform(FeatureTransform):
    """x → x + ε, guaranteeing strictly positive features
    (``FeatureTransform.scala:142-172``)."""

    def __init__(self, epsilon: float = 1e-10):
        self.epsilon = float(epsilon)
        self.name = f"epsilon_shift({self.epsilon})"

    def expr(self, features: Column) -> Column:
        e = self.epsilon
        return F.transform(features, lambda x: x + F.lit(e))

    def apply_np(self, v):
        return np.asarray(v, dtype=np.float64) + self.epsilon

    def inverse_center(self, center):
        return np.asarray(center, dtype=np.float64) - self.epsilon

    def compatible_with(self, divergence):
        return _norm_name(divergence) in (
            "kl", "kullbackleibler", "generalizedi", "gi",
            "itakurasaito", "is", "burg",
        )


class NormalizeL2Transform(FeatureTransform):
    """x → x/max(‖x‖₂, min_norm) (``FeatureTransform.scala:175-212``)."""

    name = "normalize_l2"

    def __init__(self, min_norm: float = 1e-10):
        self.min_norm = float(min_norm)

    def expr(self, features: Column) -> Column:
        nrm = F.sqrt(F.aggregate(
            F.transform(features, lambda x: x * x),
            F.lit(0.0), lambda a, v: a + v,
        ))
        safe = F.greatest(nrm, F.lit(self.min_norm))
        return F.transform(features, lambda x: x / safe)

    def apply_np(self, v):
        v = np.asarray(v, dtype=np.float64)
        return v / max(float(np.linalg.norm(v)), self.min_norm)

    def compatible_with(self, divergence):
        return _norm_name(divergence) in (
            "squaredeuclidean", "euclidean", "se", "l2",
            "cosine", "spherical",
        )


class NormalizeL1Transform(FeatureTransform):
    """x → x/max(‖x‖₁, min_norm) — probability simplexes for KL
    (``FeatureTransform.scala:215-249``)."""

    name = "normalize_l1"

    def __init__(self, min_norm: float = 1e-10):
        self.min_norm = float(min_norm)

    def expr(self, features: Column) -> Column:
        nrm = F.aggregate(
            F.transform(features, lambda x: F.abs(x)),
            F.lit(0.0), lambda a, v: a + v,
        )
        safe = F.greatest(nrm, F.lit(self.min_norm))
        return F.transform(features, lambda x: x / safe)

    def apply_np(self, v):
        v = np.asarray(v, dtype=np.float64)
        return v / max(float(np.abs(v).sum()), self.min_norm)

    def compatible_with(self, divergence):
        return _norm_name(divergence) in (
            "kl", "kullbackleibler",
            "squaredeuclidean", "euclidean", "se", "l2",
        )


class StandardScalingTransform(FeatureTransform):
    """x → (x − μ)/σ with pre-computed statistics
    (``FeatureTransform.scala:258-290``)."""

    name = "standard_scaling"

    def __init__(self, mean, stddev):
        self.mean = np.asarray(mean, dtype=np.float64)
        self.stddev = np.asarray(stddev, dtype=np.float64)
        if (self.stddev <= 0).any():
            raise ValueError("stddev entries must be > 0")

    def expr(self, features: Column) -> Column:
        mu = F.array(*[F.lit(float(m)) for m in self.mean])
        sd = F.array(*[F.lit(float(s)) for s in self.stddev])
        centered = F.zip_with(features, mu, lambda x, m: x - m)
        return F.zip_with(centered, sd, lambda x, s: x / s)

    def apply_np(self, v):
        return (np.asarray(v, dtype=np.float64) - self.mean) / self.stddev

    def inverse_center(self, center):
        return np.asarray(center, dtype=np.float64) * self.stddev + self.mean


class ComposedTransform(FeatureTransform):
    """first → second (``FeatureTransform.scala:292-308``)."""

    def __init__(self, first: FeatureTransform, second: FeatureTransform):
        self.first = first
        self.second = second
        self.name = f"{first.name} -> {second.name}"

    def expr(self, features: Column) -> Column:
        return self.second.expr(self.first.expr(features))

    def apply_np(self, v):
        return self.second.apply_np(self.first.apply_np(v))

    def inverse_center(self, center):
        return self.first.inverse_center(self.second.inverse_center(center))

    def compatible_with(self, divergence):
        return (self.first.compatible_with(divergence)
                and self.second.compatible_with(divergence))


# -- factory (``FeatureTransform.scala:313-359``) ---------------------------

def identity() -> FeatureTransform:
    return NoOpTransform()


def log1p() -> FeatureTransform:
    return Log1pTransform()


def epsilon_shift(epsilon: float = 1e-10) -> FeatureTransform:
    return EpsilonShiftTransform(epsilon)


def normalize_l2(min_norm: float = 1e-10) -> FeatureTransform:
    return NormalizeL2Transform(min_norm)


def normalize_l1(min_norm: float = 1e-10) -> FeatureTransform:
    return NormalizeL1Transform(min_norm)


def standard_scale(mean, stddev) -> FeatureTransform:
    return StandardScalingTransform(mean, stddev)


def for_kl(epsilon: float = 1e-10) -> FeatureTransform:
    """Epsilon shift then log1p (``FeatureTransform.scala:341``)."""
    return epsilon_shift(epsilon).and_then(log1p())


def for_spherical(min_norm: float = 1e-10) -> FeatureTransform:
    return normalize_l2(min_norm)


def from_string(name: str) -> FeatureTransform:
    key = _norm_name(name)
    table = {
        "identity": identity, "none": identity,
        "log1p": log1p,
        "epsilonshift": epsilon_shift,
        "normalizel2": normalize_l2, "l2": normalize_l2,
        "normalizel1": normalize_l1, "l1": normalize_l1,
        "kl": for_kl,
        "spherical": for_spherical,
    }
    if key not in table:
        raise ValueError(
            f"unknown transform {name!r}; known: identity, log1p, "
            "epsilon_shift, normalize_l2, normalize_l1, kl, spherical"
        )
    return table[key]()


def validate_compatibility(kernel, transform: FeatureTransform) -> None:
    """Raise unless the transform is safe for the kernel — spherical
    REQUIRES L2 normalization; SE accepts anything
    (``KernelOps.isTransformSafe`` + ``validateCompatibility``)."""
    from .capabilities import capabilities_for

    caps = capabilities_for(kernel)
    if caps.name == "spherical":
        def _ends_in_l2(t):
            if isinstance(t, NormalizeL2Transform):
                return True
            if isinstance(t, ComposedTransform):
                return _ends_in_l2(t.second)
            return False

        ok = _ends_in_l2(transform)
    elif caps.name == "squaredEuclidean":
        ok = True
    else:
        ok = transform.compatible_with(caps.name)
    if not ok:
        from ..errors import IncompatibleTransform

        reason = ("spherical requires the transform chain to end in L2 "
                  "normalization" if caps.name == "spherical" else
                  "transform output violates the kernel's domain")
        raise IncompatibleTransform(transform.name, caps.name, reason)


def recommended_transform(kernel) -> FeatureTransform:
    """``KernelOps.recommendedTransform``: forKL for KL/generalized-I,
    forSpherical for cosine, identity otherwise."""
    from .capabilities import capabilities_for

    name = capabilities_for(kernel).name
    if name in ("kl", "generalizedI"):
        return for_kl()
    if name == "spherical":
        return for_spherical()
    return identity()
