"""Driver-side numeric guards (reference ``ml/df/NumericGuards.scala``).

Vectorized numpy twins of the reference's per-element guard loops:
each check raises the typed :class:`~..errors.InvalidFeatures` /
:class:`~..errors.InvalidWeight` with the reference's actionable
guidance text and a vector preview. These guard DRIVER-SIDE state
(centers, scalar weights, config scalars) — k·d doubles; data-plane
validation belongs to ``validation.py``'s Spark-side validators, never
a Python loop over rows.
"""

from __future__ import annotations

import numpy as np

from ..errors import InvalidFeatures, InvalidWeight

__all__ = [
    "check_finite", "check_positive", "check_probability",
    "check_finite_scalar", "check_weight", "safe_add", "safe_scale",
]


def _preview(arr: np.ndarray) -> str:
    vals = [repr(float(x)) for x in arr[:10]]
    tail = ", ...]" if len(arr) > 10 else "]"
    return "[" + ", ".join(vals) + tail


def check_finite(v, context: str) -> None:
    """No NaN/Inf (``NumericGuards.scala:45-74``)."""
    arr = np.asarray(v, dtype=np.float64)
    nan = np.flatnonzero(np.isnan(arr))
    if nan.size:
        raise InvalidFeatures(
            f"{context}: Vector contains NaN at index {int(nan[0])}. "
            f"Vector preview: {_preview(arr)}. This may indicate:\n"
            "  - Numerical instability in divergence calculations\n"
            "  - Division by zero in center updates\n"
            "  - Missing smoothing parameter for KL/IS divergence")
    inf = np.flatnonzero(np.isinf(arr))
    if inf.size:
        raise InvalidFeatures(
            f"{context}: Vector contains Inf at index {int(inf[0])}. "
            f"Vector preview: {_preview(arr)}. This may indicate:\n"
            "  - Overflow in distance computations\n"
            "  - Extremely large input values\n"
            "  - Numerical instability")


def check_positive(v, context: str, epsilon: float = 1e-10) -> None:
    """No negatives beyond tolerance (``NumericGuards.scala:90-110``)."""
    arr = np.asarray(v, dtype=np.float64)
    bad = np.flatnonzero(arr < -epsilon)
    if bad.size:
        i = int(bad[0])
        raise InvalidFeatures(
            f"{context}: Vector contains negative value {arr[i]!r} at "
            f"index {i}. Vector preview: {_preview(arr)}. "
            "KL/Itakura-Saito divergences require positive values. "
            "Solutions:\n"
            "  - Use smoothing to add an epsilon shift\n"
            "  - Transform input data to ensure positivity\n"
            "  - Consider using Squared Euclidean or L1 divergence instead")


def check_probability(v, context: str, epsilon: float = 1e-10) -> None:
    """All values strictly inside (0, 1) — logistic loss
    (``NumericGuards.scala:122-145``)."""
    arr = np.asarray(v, dtype=np.float64)
    bad = np.flatnonzero((arr <= epsilon) | (arr >= 1.0 - epsilon))
    if bad.size:
        i = int(bad[0])
        raise InvalidFeatures(
            f"{context}: Vector contains value {arr[i]!r} at index {i} "
            f"outside (0,1). Vector preview: {_preview(arr)}. "
            "Logistic loss requires values strictly inside (0, 1); "
            "clip or rescale the features first")


def check_finite_scalar(value: float, context: str) -> None:
    if np.isnan(value) or np.isinf(value):
        raise InvalidFeatures(f"{context}: non-finite scalar {value!r}")


def check_weight(weight: float, context: str) -> None:
    """Positive and finite (``NumericGuards.scala:181-189``)."""
    if np.isnan(weight) or np.isinf(weight) or weight <= 0.0:
        raise InvalidWeight(weight)


def safe_add(v1, v2, context: str) -> np.ndarray:
    """v1 + v2 with overflow detection (``NumericGuards.scala:213-240``)."""
    a1 = np.asarray(v1, dtype=np.float64)
    a2 = np.asarray(v2, dtype=np.float64)
    if a1.shape != a2.shape:
        raise InvalidFeatures(
            f"{context}: Vector dimensions must match: "
            f"{a1.shape} vs {a2.shape}")
    # overflow is the condition being GUARDED, not an anomaly — silence
    # numpy's RuntimeWarning and report through InvalidFeatures instead
    with np.errstate(over="ignore", invalid="ignore"):
        out = a1 + a2
    bad = np.flatnonzero(~np.isfinite(out))
    if bad.size:
        i = int(bad[0])
        raise InvalidFeatures(
            f"{context}: Overflow in vector addition at index {i}: "
            f"{a1.flat[i]!r} + {a2.flat[i]!r} = {out.flat[i]!r}")
    return out


def safe_scale(v, scalar: float, context: str) -> np.ndarray:
    """v · scalar with overflow detection (``NumericGuards.scala:244-270``)."""
    check_finite_scalar(scalar, f"{context}: scalar multiplier")
    arr = np.asarray(v, dtype=np.float64)
    with np.errstate(over="ignore", invalid="ignore"):
        out = arr * scalar
    bad = np.flatnonzero(~np.isfinite(out))
    if bad.size:
        i = int(bad[0])
        raise InvalidFeatures(
            f"{context}: Overflow in scalar multiplication at index {i}: "
            f"{arr.flat[i]!r} * {scalar!r} = {out.flat[i]!r}")
    return out
