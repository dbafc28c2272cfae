"""Elastic sequence distances + DBA barycenter (numpy).

Re-expression of ``kernels/SequenceKernel.scala``: DTW (:108-239),
SoftDTW (:260), GAK (:345), DerivativeDTW (:409), factory (:668-678),
DBA barycenter (:141-146). These power TimeSeriesKMeans — bounded-n
driver math and Arrow-vectorized pandas_udf distance columns; each
series is one 1-D ``array<double>`` row (SURVEY §1.1).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "dtw", "soft_dtw", "gak_distance", "derivative_dtw",
    "dba_barycenter", "get_sequence_distance",
]


def dtw(a: np.ndarray, b: np.ndarray, window: int | None = None) -> float:
    """Classic DTW with optional Sakoe–Chiba band; squared local cost,
    returns the root of the accumulated cost (common convention)."""
    la, lb = len(a), len(b)
    w = max(window, abs(la - lb)) if window is not None else max(la, lb)
    D = np.full((la + 1, lb + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, la + 1):
        lo, hi = max(1, i - w), min(lb, i + w)
        for j in range(lo, hi + 1):
            cost = (a[i - 1] - b[j - 1]) ** 2
            D[i, j] = cost + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return float(np.sqrt(D[la, lb]))


def dtw_path(a: np.ndarray, b: np.ndarray, window: int | None = None):
    """DTW alignment path [(i, j), ...] (for DBA)."""
    la, lb = len(a), len(b)
    w = max(window, abs(la - lb)) if window is not None else max(la, lb)
    D = np.full((la + 1, lb + 1), np.inf)
    D[0, 0] = 0.0
    for i in range(1, la + 1):
        lo, hi = max(1, i - w), min(lb, i + w)
        for j in range(lo, hi + 1):
            cost = (a[i - 1] - b[j - 1]) ** 2
            D[i, j] = cost + min(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    path = []
    i, j = la, lb
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        step = int(np.argmin([D[i - 1, j - 1], D[i - 1, j], D[i, j - 1]]))
        if step == 0:
            i, j = i - 1, j - 1
        elif step == 1:
            i -= 1
        else:
            j -= 1
    return path[::-1]


def soft_dtw(a: np.ndarray, b: np.ndarray, gamma: float = 1.0) -> float:
    """Soft-DTW (Cuturi & Blondel 2017): soft-min DP, differentiable;
    can be negative for similar series."""
    la, lb = len(a), len(b)
    D = np.full((la + 1, lb + 1), np.inf)
    D[0, 0] = 0.0

    def softmin(x, y, z):
        m = min(x, y, z)
        if np.isinf(m):
            return m
        s = np.exp(-(x - m) / gamma) + np.exp(-(y - m) / gamma) + np.exp(
            -(z - m) / gamma
        )
        return m - gamma * np.log(s)

    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            cost = (a[i - 1] - b[j - 1]) ** 2
            D[i, j] = cost + softmin(D[i - 1, j], D[i, j - 1], D[i - 1, j - 1])
    return float(D[la, lb])


def _gak_sim(a: np.ndarray, b: np.ndarray, sigma: float) -> float:
    la, lb = len(a), len(b)
    K = np.zeros((la + 1, lb + 1))
    K[0, 0] = 1.0
    for i in range(1, la + 1):
        for j in range(1, lb + 1):
            local = np.exp(-((a[i - 1] - b[j - 1]) ** 2) / (2.0 * sigma * sigma))
            K[i, j] = local * (K[i - 1, j] + K[i, j - 1] + K[i - 1, j - 1])
    return float(K[la, lb])


def gak_distance(a: np.ndarray, b: np.ndarray, sigma: float = 1.0) -> float:
    """Global Alignment Kernel distance: −log normalized GAK similarity."""
    kab = _gak_sim(a, b, sigma)
    kaa = _gak_sim(a, a, sigma)
    kbb = _gak_sim(b, b, sigma)
    norm = kab / np.sqrt(max(kaa * kbb, 1e-300))
    return float(-np.log(max(norm, 1e-300)))


def _derivative(a: np.ndarray) -> np.ndarray:
    """Keogh–Pazzani derivative estimate."""
    if len(a) < 3:
        return np.gradient(a) if len(a) > 1 else np.zeros_like(a)
    d = np.empty(len(a))
    d[1:-1] = ((a[1:-1] - a[:-2]) + (a[2:] - a[:-2]) / 2.0) / 2.0
    d[0] = d[1]
    d[-1] = d[-2]
    return d


def derivative_dtw(a: np.ndarray, b: np.ndarray,
                   window: int | None = None) -> float:
    return dtw(_derivative(a), _derivative(b), window)


def dba_barycenter(series: list[np.ndarray], init: np.ndarray | None = None,
                   iters: int = 5, window: int | None = None) -> np.ndarray:
    """DTW Barycenter Averaging (Petitjean 2011): align every series to
    the running average, average the aligned points per index."""
    if not series:
        raise ValueError("empty series list")
    center = np.array(init if init is not None else series[0], dtype=np.float64)
    for _ in range(iters):
        sums = np.zeros_like(center)
        counts = np.zeros(len(center))
        for s in series:
            for ci, sj in dtw_path(center, np.asarray(s, dtype=np.float64),
                                   window):
                sums[ci] += s[sj]
                counts[ci] += 1
        mask = counts > 0
        new = center.copy()
        new[mask] = sums[mask] / counts[mask]
        if np.allclose(new, center):
            center = new
            break
        center = new
    return center


def get_sequence_distance(kind: str, **kw):
    """Factory mirroring ``SequenceKernel.scala:668-678``."""
    kind = kind.lower()
    if kind == "dtw":
        return lambda a, b: dtw(a, b, kw.get("window"))
    if kind in ("softdtw", "soft_dtw"):
        return lambda a, b: soft_dtw(a, b, kw.get("gamma", 1.0))
    if kind == "gak":
        return lambda a, b: gak_distance(a, b, kw.get("sigma", 1.0))
    if kind in ("ddtw", "derivativedtw", "derivative_dtw"):
        return lambda a, b: derivative_dtw(a, b, kw.get("window"))
    raise ValueError(f"unknown sequence kernel '{kind}'")
