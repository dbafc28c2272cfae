"""Mercer (positive-semidefinite) kernel functions for kernel k-means
and spectral affinity.

Re-expression of ``kernels/MercerKernel.scala:110-327`` (factory at
:315-327): RBF, polynomial, linear, sigmoid, Laplacian. These are
Gram-matrix kernels k(x, y) — used by the bounded-n specialists
(KernelKMeans, SpectralClustering), so the implementations are
vectorized numpy over collected matrices, with ``pairwise_col`` Column
twins for the distributed affinity paths where needed.
"""

from __future__ import annotations

import numpy as np

__all__ = ["MercerKernel", "get_mercer_kernel", "MERCER_KERNELS"]


class MercerKernel:
    name = "base"

    def gram(self, X: np.ndarray, Y: np.ndarray | None = None) -> np.ndarray:
        """Gram matrix K[i,j] = k(X[i], Y[j]); Y=None → K(X, X)."""
        raise NotImplementedError


class LinearKernel(MercerKernel):
    name = "linear"

    def gram(self, X, Y=None):
        Y = X if Y is None else Y
        return X @ Y.T


class RBFKernel(MercerKernel):
    """k(x,y) = exp(−γ‖x−y‖²). γ=None → auto 1/(d·var) like sklearn's
    'scale' (reference autoGamma, ``KernelKMeans.scala``)."""

    name = "rbf"

    def __init__(self, gamma: float | None = None):
        self.gamma = gamma

    def _gamma(self, X):
        if self.gamma is not None:
            return self.gamma
        v = X.var()
        return 1.0 / (X.shape[1] * v) if v > 0 else 1.0

    def gram(self, X, Y=None):
        Y = X if Y is None else Y
        g = self._gamma(X)
        x2 = (X ** 2).sum(axis=1)[:, None]
        y2 = (Y ** 2).sum(axis=1)[None, :]
        d2 = np.maximum(x2 - 2.0 * X @ Y.T + y2, 0.0)
        return np.exp(-g * d2)


class PolynomialKernel(MercerKernel):
    """k(x,y) = (γ·x·y + coef0)^degree."""

    name = "polynomial"

    def __init__(self, gamma: float = 1.0, coef0: float = 1.0, degree: int = 3):
        self.gamma = gamma
        self.coef0 = coef0
        self.degree = degree

    def gram(self, X, Y=None):
        Y = X if Y is None else Y
        return (self.gamma * (X @ Y.T) + self.coef0) ** self.degree


class SigmoidKernel(MercerKernel):
    """k(x,y) = tanh(γ·x·y + coef0)."""

    name = "sigmoid"

    def __init__(self, gamma: float = 1.0, coef0: float = 0.0):
        self.gamma = gamma
        self.coef0 = coef0

    def gram(self, X, Y=None):
        Y = X if Y is None else Y
        return np.tanh(self.gamma * (X @ Y.T) + self.coef0)


class LaplacianKernel(MercerKernel):
    """k(x,y) = exp(−γ‖x−y‖₁)."""

    name = "laplacian"

    def __init__(self, gamma: float = 1.0):
        self.gamma = gamma

    def gram(self, X, Y=None):
        Y = X if Y is None else Y
        D = np.abs(X[:, None, :] - Y[None, :, :]).sum(axis=2)
        return np.exp(-self.gamma * D)


MERCER_KERNELS = {
    "linear": LinearKernel,
    "rbf": RBFKernel,
    "gaussian": RBFKernel,
    "polynomial": PolynomialKernel,
    "poly": PolynomialKernel,
    "sigmoid": SigmoidKernel,
    "laplacian": LaplacianKernel,
}


def get_mercer_kernel(name: str, **kw) -> MercerKernel:
    """Factory mirroring ``MercerKernel.scala:315-327``."""
    key = name.lower()
    if key not in MERCER_KERNELS:
        raise ValueError(
            f"unknown Mercer kernel '{name}'; available: "
            + ", ".join(sorted(set(MERCER_KERNELS)))
        )
    cls = MERCER_KERNELS[key]
    import inspect

    accepted = set(inspect.signature(cls.__init__).parameters) - {"self"}
    return cls(**{k: v for k, v in kw.items() if k in accepted and v is not None})
