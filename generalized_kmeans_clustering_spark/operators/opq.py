"""Optimized Product Quantization (OPQ) — a learned orthogonal
rotation in front of PQ.

Engine extension (driver mandate: similarity search at 100 TB). Plain
PQ (:mod:`.quantization`) quantizes each d/m-dim subspace
independently, so its distortion is hostage to how the data's variance
happens to align with the subspace cuts: energy concentrated in one
subspace, or correlation ACROSS subspaces, wastes codewords. OPQ (Ge,
He, Ke, Sun, "Optimized Product Quantization", CVPR 2013 / TPAMI 2014,
non-parametric solution) learns an orthogonal d×d rotation ``R`` that
re-balances the space before the subspace split, by alternating two
steps until they agree:

1. **codebooks | R** — train PQ on the rotated vectors ``y = x·R``
   (each subspace fit warm-started from the previous round's
   codebooks);
2. **R | codebooks** — orthogonal Procrustes: with ``X`` the original
   vectors and ``X̂`` their rotated-space PQ reconstructions,
   ``R = U·Vᵀ`` from the SVD of the d×d cross matrix ``Xᵀ·X̂``.

Because ``R`` is orthogonal, squared-L2 distances in rotated space ARE
the original distances, so search is exactly PQ's ADC over the rotated
codes — the rotation touches only the (cheap) query side at serve
time.

Distribution: step 1 is the engine's own distributed k-means per
subspace (``train_pq``); step 2's only data-sized work is the d×d
cross matrix, computed as per-partition numpy partial sums via
``mapInPandas`` (driver receives one d² array per partition; the SVD
itself is an O(d³) driver-side solve of MODEL state, never data). The
rotation is applied with an Arrow-batched pandas UDF (one vectorized
(batch × d)·(d × d) matmul per batch — a pandas_udf by design, not a
slow path).

At 100 TB: train on a :func:`~.sampling.sample_hash` sample exactly
like PQ (rotation + codebook quality saturate far below corpus size);
encode the corpus once (one map-only pass: rotate + argmin); serve
reads m bytes per candidate. Reference repo has no quantization layer
at all — extension (cf. SURVEY.md §2.10).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .quantization import (
    PQModel, pq_decode, pq_encode, pq_topk, train_pq,
)

__all__ = [
    "OPQModel", "train_opq", "opq_encode", "opq_decode", "opq_topk",
    "ivf_opq_index", "ivf_opq_topk",
    "write_ivf_opq_index", "read_ivf_opq_index",
    "rotate_vectors", "write_opq_model", "read_opq_model",
]


@dataclass
class OPQModel:
    """``rotation`` is the learned orthogonal d×d matrix, applied as
    ``y = x · rotation`` (row-vector convention); ``pq`` holds the
    codebooks trained in the ROTATED space."""

    rotation: list  # d × d floats
    pq: PQModel

    @property
    def d(self) -> int:
        return self.pq.d

    @property
    def m(self) -> int:
        return self.pq.m

    @property
    def k_sub(self) -> int:
        return self.pq.k_sub


def rotate_vectors(
    df: DataFrame,
    rotation,
    vec_col: str = "embedding",
    out_col: str = "_rotated",
) -> DataFrame:
    """Add ``out_col = vec · rotation`` (array<double>). The rotation
    rides in the UDF closure as model state (d² doubles); each Arrow
    batch is one numpy matmul."""
    R = np.asarray(rotation, dtype=np.float64)
    if R.ndim != 2 or R.shape[0] != R.shape[1]:
        raise ValueError(f"rotation must be square, got {R.shape}")

    @pandas_udf("array<double>")
    def _rot(v: pd.Series) -> pd.Series:
        # NULL vectors rotate to NULL (parity with pq_encode's
        # NULL-tolerant Catalyst path) instead of crashing np.stack
        mask = v.notna().to_numpy()
        res = np.empty(len(v), dtype=object)
        if mask.any():
            Y = np.stack(v.to_numpy()[mask]) @ R
            for i, j in enumerate(np.flatnonzero(mask)):
                res[j] = Y[i]
        return pd.Series(res, index=v.index)

    return df.withColumn(out_col, _rot(F.col(vec_col).cast("array<double>")))


def _procrustes_rotation(df: DataFrame, x_col: str, xhat_col: str,
                         d: int) -> np.ndarray:
    """argmin_{R orthogonal} ||X·R − X̂||_F = U·Vᵀ from SVD(Xᵀ·X̂).
    The cross matrix is distributed: one d² partial sum per partition
    (mapInPandas), summed and decomposed on the driver — driver state
    is num_partitions × d² doubles of MODEL aggregate, never rows."""

    def part(batches):
        acc = np.zeros((d, d))
        seen = False
        for pdf in batches:
            pdf = pdf.dropna()  # NULL vectors contribute nothing
            if len(pdf):
                X = np.stack(pdf[x_col].to_numpy())
                H = np.stack(pdf[xhat_col].to_numpy())
                acc += X.T @ H
                seen = True
        if seen:
            yield pd.DataFrame({"s": [acc.ravel()]})

    parts = df.select(x_col, xhat_col).mapInPandas(
        part, "s array<double>").collect()
    S = np.zeros((d, d))
    for r in parts:
        S += np.asarray(r["s"], dtype=np.float64).reshape(d, d)
    U, _, Vt = np.linalg.svd(S)
    return U @ Vt


def train_opq(
    df: DataFrame,
    m: int = 8,
    k_sub: int = 256,
    vec_col: str = "embedding",
    n_iter: int = 3,
    pq_iter: int = 4,
    seed: int = 42,
) -> OPQModel:
    """Alternate codebook fits and Procrustes rotation updates for
    ``n_iter`` rounds, ending on a codebook update so the returned
    codebooks are aligned with the returned rotation. ``n_iter=1``
    degenerates to plain PQ under the identity rotation (the baseline
    OPQ must beat). Train on a hash sample at scale, like
    :func:`~.quantization.train_pq`."""
    if n_iter < 1:
        raise ValueError("n_iter must be >= 1")
    first = (df.where(F.col(vec_col).isNotNull())
             .select(F.size(vec_col).alias("n")).first())
    if first is None:
        raise ValueError("train_opq: empty input")
    d = int(first["n"])
    if d % m != 0:
        raise ValueError(f"m={m} must divide vector dim {d}")
    # train on present vectors only (the Procrustes pass also skips
    # NULLs); encode stays NULL-preserving
    base = (df.where(F.col(vec_col).isNotNull())
            .select(F.col(vec_col).cast("array<double>").alias("_x")))
    R = np.eye(d)
    codebooks = None
    pq = None
    for it in range(n_iter):
        # persist the round's rotated frame: every subspace fit's
        # Lloyd iterations (and the Procrustes pass) would otherwise
        # re-run the rotation UDF through lineage — m × pq_iter + 1
        # redundant Arrow passes per round
        rot = rotate_vectors(base, R, "_x", "_y").persist()
        try:
            pq = train_pq(rot, m=m, k_sub=k_sub, vec_col="_y", seed=seed,
                          max_iter=pq_iter, initial_codebooks=codebooks)
            codebooks = pq.codebooks
            if it == n_iter - 1:
                break
            dec = pq_decode(
                pq_encode(rot, pq, vec_col="_y", code_col="_c"),
                pq, code_col="_c", out_col="_h")
            R = _procrustes_rotation(dec, "_x", "_h", d)
        finally:
            rot.unpersist()
    return OPQModel(
        rotation=[[float(x) for x in row] for row in R], pq=pq)


def opq_encode(
    df: DataFrame,
    model: OPQModel,
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Rotate, then PQ-encode: one map-only pass (Arrow matmul +
    Catalyst argmin); the rotated vector never persists."""
    rot = rotate_vectors(df, model.rotation, vec_col, "_opq_y")
    return pq_encode(rot, model.pq, vec_col="_opq_y",
                     code_col=code_col).drop("_opq_y")


def opq_decode(
    df: DataFrame,
    model: OPQModel,
    code_col: str = "codes",
    out_col: str = "reconstruction",
) -> DataFrame:
    """Reconstruct in the ORIGINAL space (decode, then rotate back by
    Rᵀ = R⁻¹) — for distortion measurement against the raw vectors;
    ADC search never decodes."""
    dec = pq_decode(df, model.pq, code_col=code_col, out_col="_opq_h")
    back = rotate_vectors(
        dec, np.asarray(model.rotation, dtype=np.float64).T,
        "_opq_h", out_col)
    return back.drop("_opq_h")


def opq_topk(
    encoded: DataFrame,
    model: OPQModel,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
    exclude_self: bool = True,
    max_broadcast_queries: int | None = 4096,
    n_queries: int | None = None,
    where=None,
) -> DataFrame:
    """ADC top-k over OPQ codes: rotate the (small) query side, then
    exactly :func:`~.quantization.pq_topk` — distances in rotated
    space equal original squared L2 because the rotation is
    orthogonal. Same contract (``where`` candidate predicate,
    broadcast-queries guard, ``(query_id, neighbor_id, approx_dist,
    rank)`` output)."""
    q = rotate_vectors(queries, model.rotation, vec_col, "_opq_q")
    return pq_topk(
        encoded, model.pq, q, k=k, id_col=id_col, vec_col="_opq_q",
        code_col=code_col, exclude_self=exclude_self,
        max_broadcast_queries=max_broadcast_queries,
        n_queries=n_queries, where=where)


def ivf_opq_index(
    corpus: DataFrame,
    rotation,
    n_lists: int = 64,
    m: int = 8,
    k_sub: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    coarse_max_iter: int = 10,
    pq_max_iter: int = 10,
    **kwargs,
):
    """OPQ pre-transform + residual IVF-PQ (the Faiss
    ``OPQ<m>,IVF<n>,PQ<m>`` pipeline): rotate the corpus once, then
    build the coarse lists and residual PQ codebooks entirely in
    ROTATED space. ``rotation`` is a learned d×d orthogonal matrix —
    train it with :func:`train_opq` on a hash sample (the flat-PQ
    codebooks it returns are the training proxy; the index trains its
    own residual codebooks here). Returns ``(encoded, coarse_model,
    pq_model)`` exactly as :func:`~.quantization.ivf_pq_index` —
    persist ``encoded`` partitioned by ``_list`` as there."""
    from .quantization import ivf_pq_index

    rot = rotate_vectors(corpus, rotation, vec_col, "_opq_y")
    return ivf_pq_index(
        rot, n_lists=n_lists, m=m, k_sub=k_sub, id_col=id_col,
        vec_col="_opq_y", seed=seed, coarse_max_iter=coarse_max_iter,
        pq_max_iter=pq_max_iter, **kwargs)


def ivf_opq_topk(
    encoded: DataFrame,
    coarse_model,
    pq_model: PQModel,
    rotation,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    **kwargs,
) -> DataFrame:
    """Probe an :func:`ivf_opq_index`: rotate the (broadcast-small)
    query side into the index's space, then exactly
    :func:`~.quantization.ivf_pq_topk` — coarse probe selection,
    residual lookup tables and ADC scores all live in rotated space,
    where squared L2 equals the original distance."""
    from .quantization import ivf_pq_topk

    q = rotate_vectors(queries, rotation, vec_col, "_opq_q")
    return ivf_pq_topk(
        encoded, coarse_model, pq_model, q, k=k, nprobe=nprobe,
        id_col=id_col, vec_col="_opq_q", **kwargs)


def write_ivf_opq_index(encoded: DataFrame, coarse_model, pq_model,
                        rotation, path: str,
                        mode: str = "overwrite") -> None:
    """Persist an :func:`ivf_opq_index` for serving: the IVF-PQ layout
    (codes partitioned by ``_list``, coarse + PQ sidecars — see
    :func:`~.quantization.write_ivf_pq_index`) plus the rotation as
    its own checksummed sidecar. Serve via
    :func:`read_ivf_opq_index` → :func:`ivf_opq_topk`."""
    from ..sources.sidecar import write_model_sidecar
    from .quantization import write_ivf_pq_index

    write_ivf_pq_index(encoded, coarse_model, pq_model, path, mode=mode)
    R = np.asarray(rotation, dtype=np.float64)
    write_model_sidecar(
        encoded.sparkSession, f"{path}/rotation", "opq_rotation", {
            "d": int(R.shape[0]),
            "rotation": [[float(x) for x in row] for row in R],
        }, mode=mode)


def read_ivf_opq_index(spark, path: str):
    """Load a :func:`write_ivf_opq_index` layout. Returns ``(encoded,
    coarse_model, pq_model, rotation)`` — the exact
    :func:`ivf_opq_topk` argument order."""
    from ..sources.sidecar import read_model_sidecar
    from .quantization import read_ivf_pq_index

    encoded, coarse, pq = read_ivf_pq_index(spark, path)
    p = read_model_sidecar(spark, f"{path}/rotation", "opq_rotation")
    rotation = [[float(x) for x in row] for row in p["rotation"]]
    return encoded, coarse, pq, rotation


def write_opq_model(spark, model: OPQModel, path: str,
                    mode: str = "overwrite") -> None:
    """Persist rotation + codebooks through the shared checksummed
    sidecar layout (``sources/sidecar.py``)."""
    from ..sources.sidecar import write_model_sidecar

    write_model_sidecar(spark, path, "opq_model", {
        "d": int(model.d),
        "m": int(model.m),
        "k_sub": int(model.k_sub),
        "rotation": [[float(x) for x in row] for row in model.rotation],
        "codebooks": [[[float(x) for x in c] for c in cb]
                      for cb in model.pq.codebooks],
    }, mode=mode)


def read_opq_model(spark, path: str) -> OPQModel:
    """Load a :func:`write_opq_model` sidecar (sha256-verified)."""
    from ..sources.sidecar import read_model_sidecar

    p = read_model_sidecar(spark, path, "opq_model")
    return OPQModel(
        rotation=[[float(x) for x in row] for row in p["rotation"]],
        pq=PQModel(
            codebooks=[[[float(x) for x in c] for c in cb]
                       for cb in p["codebooks"]],
            d=int(p["d"]),
        ),
    )
