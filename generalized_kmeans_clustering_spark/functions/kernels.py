"""Divergence kernels as Catalyst Column-expression factories.

Re-expression of the reference's kernel layer
(``/root/reference/src/main/scala/com/massivedatascience/clusterer/ml/kernels/``:
``SquaredEuclideanKernel.scala:12-38``, ``KLDivergenceKernel.scala:17-61``,
``ItakuraSaitoKernel.scala:17-61``, ``GeneralizedIDivergenceKernel.scala:17-60``,
``LogisticLossKernel.scala:17-61``, ``L1Kernel.scala:18-38``,
``SphericalKernel.scala:35-154``, factory ``KernelFactory.scala:57-199``)
as pure PySpark column expressions over ``array<double>`` features.

Where the reference evaluates a black-box JVM UDF per row, we compile the
divergence to ``zip_with``/``aggregate`` expressions so the whole
assignment stage stays inside Tungsten whole-stage codegen — no Python,
no serialization, fully vectorizable, and Catalyst can constant-fold the
broadcast center literals.

Bregman centroid contract (reference ``SPECIFICATION.md:27-48``): the
center of a weighted point set is ``inv_grad(Σ wᵢ·grad(xᵢ) / Σ wᵢ)``.
``grad`` is exposed both as a Column expression (so the per-cluster
gradient sums aggregate JVM-side, map-side-combined) and as a numpy twin
(driver-side center math, k×d small).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "Kernel",
    "SquaredEuclideanKernel",
    "KLDivergenceKernel",
    "ItakuraSaitoKernel",
    "GeneralizedIKernel",
    "LogisticLossKernel",
    "L1Kernel",
    "SphericalKernel",
    "get_kernel",
    "KERNELS",
    "array_lit",
    "dot",
]

EPS = 1e-10  # smoothing guard, mirrors reference default smoothing=1e-10


def array_lit(values) -> Column:
    """array<double> literal column from a python sequence."""
    return F.array(*[F.lit(float(v)) for v in values])


def dot(x: Column, y: Column) -> Column:
    """JVM-side dot product of two array<double> columns."""
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )


def _asum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda acc, v: acc + v)


class Kernel:
    """Contract mirroring reference ``kernels/ClusteringKernel.scala:16-46``:
    ``divergence``, ``grad``, ``inv_grad``, ``validate``, plus numpy twins
    for driver-side center math.
    """

    name: str = "base"
    aliases: tuple = ()
    is_bregman: bool = True
    #: True when the update step is inv_grad(weighted mean of grad) —
    #: False for L1 (median) and spherical (normalized mean).
    mean_update: bool = True
    #: features should be L2-normalized once before the Lloyd loop
    pre_normalize: bool = False

    def __init__(self, smoothing: float = EPS):
        self.smoothing = float(smoothing)

    @property
    def capabilities(self):
        """Capability descriptor (flags + optimization hints) from the
        catalog in :mod:`..functions.capabilities` — the analog of the
        reference's ``KernelOps`` typeclass (``ml/df/KernelOps.scala``)."""
        from .capabilities import capabilities_for

        return capabilities_for(self)

    # -- Column expressions -------------------------------------------------
    def pairwise(self, x: Column, mu: Column) -> Column:
        """D(x, mu) as a Column expression (both array<double>)."""
        raise NotImplementedError

    def grad(self, x: Column) -> Column:
        """∇F(x) as an array<double> Column expression."""
        raise NotImplementedError

    #: declarative domain: None (any finite) | "nonneg" | "positive" | "unit"
    domain: str | None = None

    def validate(self, x: Column) -> Column:
        """Boolean Column: every element of x is in the kernel's domain."""
        return F.forall(x, lambda v: ~F.isnan(v) & ~v.isNull())

    # -- numpy twins (driver-side, k×d small) -------------------------------
    def grad_np(self, X: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def inv_grad_np(self, T: np.ndarray) -> np.ndarray:
        raise NotImplementedError

    def div_np(self, X: np.ndarray, C: np.ndarray) -> np.ndarray:
        """Pairwise divergence matrix: X (n×d), C (k×d) → (n×k)."""
        raise NotImplementedError

    def finalize_center(self, grad_mean: np.ndarray) -> np.ndarray:
        """Center from the weighted mean gradient (Bregman centroid)."""
        return self.inv_grad_np(grad_mean)


class SquaredEuclideanKernel(Kernel):
    """D(x,μ) = ½‖x−μ‖²; grad = x; inv_grad = θ.

    Reference: ``kernels/SquaredEuclideanKernel.scala:12-38``.
    """

    name = "squaredEuclidean"
    aliases = ("se", "euclidean", "l2")

    def pairwise(self, x, mu):
        return (
            _asum(F.zip_with(x, mu, lambda a, b: (a - b) * (a - b))) / 2.0
        )

    def grad(self, x):
        return x

    def grad_np(self, X):
        return X

    def inv_grad_np(self, T):
        return T

    def div_np(self, X, C):
        # ½(‖x‖² − 2x·c + ‖c‖²), vectorized
        x2 = np.einsum("ij,ij->i", X, X)[:, None]
        c2 = np.einsum("ij,ij->i", C, C)[None, :]
        return 0.5 * np.maximum(x2 - 2.0 * X @ C.T + c2, 0.0)


class KLDivergenceKernel(Kernel):
    """D(x,μ) = Σ x̂ᵢ·(ln x̂ᵢ − ln μ̂ᵢ) with x̂=x+ε smoothing.

    grad = ln x + 1; inv_grad = exp(θ−1) (negative-entropy generator).
    Reference: ``kernels/KLDivergenceKernel.scala:17-61``.

    Note (matches the reference's contract): this assignment cost omits
    the ``−x+μ`` terms of the generalized-I divergence, while the
    update is ``inv_grad(mean grad)`` — the GI-generator centroid
    (element-wise geometric mean). Off the probability simplex the two
    differ by a μ-dependent term, so the per-iteration KL cost is not
    guaranteed monotone (use ``generalizedI`` for a strict Bregman
    descent on unnormalized data, or L1-normalize features first —
    ``functions/transforms.normalize_l1``).
    """

    name = "kl"
    aliases = ("kullbackLeibler", "relativeEntropy")
    domain = "nonneg"

    def pairwise(self, x, mu):
        e = self.smoothing
        return _asum(
            F.zip_with(
                x, mu,
                lambda a, b: (a + e) * (F.log(a + e) - F.log(b + e)),
            )
        )

    def grad(self, x):
        return F.transform(x, lambda v: F.log(v + self.smoothing) + 1.0)

    def validate(self, x):
        return F.forall(x, lambda v: ~F.isnan(v) & (v >= 0))

    def grad_np(self, X):
        return np.log(X + self.smoothing) + 1.0

    def inv_grad_np(self, T):
        return np.exp(T - 1.0)

    def div_np(self, X, C):
        e = self.smoothing
        Xs, Cs = X + e, C + e
        # Σ x ln x − Σ x ln c  = rowterm − Xs @ ln(Cs).T
        row = np.einsum("ij,ij->i", Xs, np.log(Xs))[:, None]
        return row - Xs @ np.log(Cs).T


class ItakuraSaitoKernel(Kernel):
    """D(x,μ) = Σ (x̂/μ̂ − ln(x̂/μ̂) − 1); grad = −1/x; inv_grad = −1/θ.

    Reference: ``kernels/ItakuraSaitoKernel.scala:17-61``.
    """

    name = "itakuraSaito"
    aliases = ("is", "burg")
    domain = "positive"

    def pairwise(self, x, mu):
        e = self.smoothing
        return _asum(
            F.zip_with(
                x, mu,
                lambda a, b: (a + e) / (b + e)
                - (F.log(a + e) - F.log(b + e))
                - 1.0,
            )
        )

    def grad(self, x):
        return F.transform(x, lambda v: -1.0 / (v + self.smoothing))

    def validate(self, x):
        return F.forall(x, lambda v: ~F.isnan(v) & (v > 0))

    def grad_np(self, X):
        return -1.0 / (X + self.smoothing)

    def inv_grad_np(self, T):
        return -1.0 / T

    def div_np(self, X, C):
        e = self.smoothing
        Xs, Cs = X + e, C + e
        return (
            Xs @ (1.0 / Cs).T
            - np.log(Xs).sum(axis=1)[:, None]
            + np.log(Cs).sum(axis=1)[None, :]
            - X.shape[1]
        )


class GeneralizedIKernel(Kernel):
    """D(x,μ) = Σ (x̂ ln(x̂/μ̂) − x̂ + μ̂); grad = ln x; inv_grad = exp θ.

    Reference: ``kernels/GeneralizedIDivergenceKernel.scala:17-60``.
    """

    name = "generalizedI"
    aliases = ("gi", "idivergence")
    domain = "nonneg"

    def pairwise(self, x, mu):
        e = self.smoothing
        return _asum(
            F.zip_with(
                x, mu,
                lambda a, b: (a + e) * (F.log(a + e) - F.log(b + e))
                - (a + e)
                + (b + e),
            )
        )

    def grad(self, x):
        return F.transform(x, lambda v: F.log(v + self.smoothing))

    def validate(self, x):
        return F.forall(x, lambda v: ~F.isnan(v) & (v >= 0))

    def grad_np(self, X):
        return np.log(X + self.smoothing)

    def inv_grad_np(self, T):
        return np.exp(T)

    def div_np(self, X, C):
        e = self.smoothing
        Xs, Cs = X + e, C + e
        row = np.einsum("ij,ij->i", Xs, np.log(Xs))[:, None] - Xs.sum(axis=1)[:, None]
        return row - Xs @ np.log(Cs).T + Cs.sum(axis=1)[None, :]


class LogisticLossKernel(Kernel):
    """Binary cross-entropy divergence on (0,1) values.

    D(x,μ) = Σ x̃ ln(x̃/μ̃) + (1−x̃) ln((1−x̃)/(1−μ̃)), values clamped to
    [ε, 1−ε]. grad = logit; inv_grad = sigmoid.
    Reference: ``kernels/LogisticLossKernel.scala:17-61``.
    """

    name = "logistic"
    aliases = ("logisticLoss", "bernoulli")
    domain = "unit"

    def _clamp(self, v):
        e = self.smoothing
        return F.least(F.greatest(v, F.lit(e)), F.lit(1.0 - e))

    def pairwise(self, x, mu):
        def term(a, b):
            ac, bc = self._clamp(a), self._clamp(b)
            return ac * (F.log(ac) - F.log(bc)) + (1.0 - ac) * (
                F.log(1.0 - ac) - F.log(1.0 - bc)
            )

        return _asum(F.zip_with(x, mu, term))

    def grad(self, x):
        return F.transform(
            x, lambda v: F.log(self._clamp(v)) - F.log(1.0 - self._clamp(v))
        )

    def validate(self, x):
        return F.forall(x, lambda v: ~F.isnan(v) & (v >= 0) & (v <= 1))

    def _clamp_np(self, X):
        e = self.smoothing
        return np.clip(X, e, 1.0 - e)

    def grad_np(self, X):
        Xc = self._clamp_np(X)
        return np.log(Xc / (1.0 - Xc))

    def inv_grad_np(self, T):
        return 1.0 / (1.0 + np.exp(-T))

    def div_np(self, X, C):
        Xc, Cc = self._clamp_np(X), self._clamp_np(C)
        row = (
            np.einsum("ij,ij->i", Xc, np.log(Xc))
            + np.einsum("ij,ij->i", 1 - Xc, np.log(1 - Xc))
        )[:, None]
        return row - Xc @ np.log(Cc).T - (1 - Xc) @ np.log(1 - Cc).T


class L1Kernel(Kernel):
    """D(x,μ) = Σ |xᵢ−μᵢ| (Manhattan). Not Bregman; centers are
    per-dimension weighted medians (K-Medians).
    Reference: ``kernels/L1Kernel.scala:18-38``, median update
    ``strategies/UpdateStrategy.scala:152-253``.
    """

    name = "l1"
    aliases = ("manhattan", "cityblock", "kmedians")
    is_bregman = False
    mean_update = False

    def pairwise(self, x, mu):
        return _asum(F.zip_with(x, mu, lambda a, b: F.abs(a - b)))

    def grad(self, x):
        return x  # unused; median update path

    def grad_np(self, X):
        return X

    def inv_grad_np(self, T):
        return T

    def div_np(self, X, C):
        return np.abs(X[:, None, :] - C[None, :, :]).sum(axis=2)


class SphericalKernel(Kernel):
    """Cosine distance 1 − cos(x,μ). On L2-normalized inputs this is
    1 − x·μ = ‖x−μ‖²/2, so the Lloyd loop pre-normalizes features once
    and the assignment reduces to a dot product; centers are the
    L2-normalized weighted mean. Reference: ``kernels/SphericalKernel.scala:35-154``.
    """

    name = "spherical"
    aliases = ("cosine",)
    is_bregman = False
    mean_update = True  # mean then re-normalize (finalize_center)
    pre_normalize = True

    def pairwise(self, x, mu):
        # general form (inputs not assumed normalized)
        nx = F.sqrt(dot(x, x))
        nm = F.sqrt(dot(mu, mu))
        return 1.0 - dot(x, mu) / (nx * nm + self.smoothing)

    def pairwise_normalized(self, x, mu):
        """Fast path when both sides are already unit-norm."""
        return 1.0 - dot(x, mu)

    def normalize(self, x: Column) -> Column:
        n = F.sqrt(dot(x, x)) + self.smoothing
        return F.transform(x, lambda v: v / n)

    def grad(self, x):
        return x

    def grad_np(self, X):
        return X

    def inv_grad_np(self, T):
        return T

    def finalize_center(self, grad_mean):
        n = np.linalg.norm(grad_mean)
        return grad_mean / (n + self.smoothing)

    def normalize_np(self, X):
        n = np.linalg.norm(X, axis=-1, keepdims=True)
        return X / (n + self.smoothing)

    def div_np(self, X, C):
        Xn, Cn = self.normalize_np(X), self.normalize_np(C)
        return 1.0 - Xn @ Cn.T


KERNELS: dict[str, type] = {}
for _cls in (
    SquaredEuclideanKernel,
    KLDivergenceKernel,
    ItakuraSaitoKernel,
    GeneralizedIKernel,
    LogisticLossKernel,
    L1Kernel,
    SphericalKernel,
):
    KERNELS[_cls.name.lower()] = _cls
    for _a in _cls.aliases:
        KERNELS[_a.lower()] = _cls


def get_kernel(name: str, smoothing: float = EPS) -> Kernel:
    """Name → kernel instance (registry mirrors ``KernelFactory.scala:57-199``)."""
    key = name.lower().replace("-", "").replace("_", "")
    if key not in KERNELS:
        from ..errors import UnknownKernel

        raise UnknownKernel(name, sorted({c.name for c in KERNELS.values()}))
    return KERNELS[key](smoothing=smoothing)
