"""Clustering evaluation metrics (reference §2.9 inventory).

Re-expression of ``GeneralizedKMeansModel.scala:467-728`` metric
methods as one-pass DataFrame aggregations + tiny driver math:

- WCSS / distortion     (:467-475)  — Σ w·D(x, μ_assigned)
- BCSS                  (:490-524)  — Σ nᵢ·D(μᵢ, μ̄)
- Calinski–Harabasz     (:526-540)  — (BCSS/(k−1)) / (WCSS/(n−k))
- Davies–Bouldin        (:548-604)  — mean_i max_j (sᵢ+sⱼ)/d(μᵢ,μⱼ)
- Dunn index            (:606-652)  — min inter-center / max intra diameter
- Silhouette (proxy)    (:667-728)  — (b−a)/max(a,b) with center
  distances as proxies, over a sample (default 10% like the reference)
- cluster_sizes         (:479-488)

Scale note: every metric needs exactly ONE groupBy(prediction)
aggregation over the assigned frame (k result rows) plus O(k²) driver
math — no per-pair shuffles, no collect of data rows. ``evaluate``
computes them all from a single cached assignment pass.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import Kernel, get_kernel
from .operators.assignment import distances_column

__all__ = ["ClusteringEvaluator", "evaluate"]


def _assigned_frame(model, df: DataFrame) -> tuple[DataFrame, str, str]:
    """model.transform with a guaranteed distance column."""
    dist_col = model.distance_col or "_eval_dist"
    if model.distance_col:
        out = model.transform(df)
    else:
        import copy

        m = copy.copy(model)
        m.distance_col = dist_col
        out = m.transform(df)
    return out, model.prediction_col, dist_col


def evaluate(model, df: DataFrame, silhouette_sample: float = 0.1,
             seed: int = 42, label_col: str | None = None) -> dict:
    """All §2.9 metrics in one pass. Returns a plain dict.

    ``label_col`` (optional) adds the EXTERNAL agreement metrics
    (:mod:`.agreement`: ari / nmi / homogeneity / completeness /
    v_measure / purity vs the ground-truth column) from one extra
    contingency aggregation over the same assigned frame."""
    kernel: Kernel = model._kernel()
    C = model.centers
    k = len(C)
    assigned, pred_col, dist_col = _assigned_frame(model, df)
    feats = F.col(model.features_col)
    if kernel.pre_normalize:
        feats = kernel.normalize(feats)
    d = C.shape[1]

    per_cluster = (
        assigned.groupBy(pred_col)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dist_col).alias("wcss"),
            F.avg(dist_col).alias("s_mean"),
            F.max(dist_col).alias("s_max"),
            *[F.sum(F.element_at(feats, i + 1)).alias(f"f{i}") for i in range(d)],
        )
        .collect()
    )
    sizes = [0] * k
    wcss_c = np.zeros(k)
    s_mean = np.zeros(k)
    s_max = np.zeros(k)
    fsum = np.zeros((k, d))
    for r in per_cluster:
        c = int(r[pred_col])
        sizes[c] = int(r["n"])
        wcss_c[c] = float(r["wcss"] or 0.0)
        s_mean[c] = float(r["s_mean"] or 0.0)
        s_max[c] = float(r["s_max"] or 0.0)
        fsum[c] = [float(r[f"f{i}"] or 0.0) for i in range(d)]
    n_total = int(sum(sizes))
    wcss = float(wcss_c.sum())

    # BCSS: Σ nᵢ·D(μᵢ, μ̄) with μ̄ the global mean (driver math)
    nonzero = [c for c in range(k) if sizes[c] > 0]
    overall = fsum.sum(axis=0) / max(n_total, 1)
    Dctr = kernel.div_np(C, overall[None, :])[:, 0]
    bcss = float(sum(sizes[c] * Dctr[c] for c in nonzero))

    k_eff = len(nonzero)
    ch = float("nan")
    if k_eff > 1 and n_total > k_eff and wcss > 0:
        ch = (bcss / (k_eff - 1)) / (wcss / (n_total - k_eff))

    # Davies–Bouldin + Dunn from the k×k center-distance matrix
    Dkk = kernel.div_np(C, C)
    db = float("nan")
    dunn = float("nan")
    if k_eff > 1:
        ratios = []
        for i in nonzero:
            worst = max(
                ((s_mean[i] + s_mean[j]) / Dkk[i, j]
                 for j in nonzero if j != i and Dkk[i, j] > 0),
                default=0.0,
            )
            ratios.append(worst)
        db = float(np.mean(ratios))
        inter = min(Dkk[i, j] for i in nonzero for j in nonzero if i < j)
        intra = float(s_max[nonzero].max())
        dunn = float(inter / intra) if intra > 0 else float("inf")

    sil = silhouette_proxy(
        assigned, kernel, C, model.features_col, pred_col, dist_col,
        sample=silhouette_sample, seed=seed,
    ) if k_eff > 1 else float("nan")

    out = {
        "wcss": wcss,
        "bcss": bcss,
        "calinski_harabasz": ch,
        "davies_bouldin": db,
        "dunn": dunn,
        "silhouette": sil,
        "cluster_sizes": sizes,
        "n": n_total,
        "k_effective": k_eff,
    }
    if label_col is not None:
        from .agreement import agreement_from_cells, contingency_table

        cells = [
            (r["label"], r["pred"], float(r["n"]))
            for r in contingency_table(
                assigned, label_col, pred_col).collect()
        ]
        ext = agreement_from_cells(cells)
        for key in ("ari", "nmi", "homogeneity", "completeness",
                    "v_measure", "purity"):
            out[key] = ext[key]
    return out


def silhouette_proxy(assigned: DataFrame, kernel: Kernel, centers,
                     features_col: str, pred_col: str, dist_col: str,
                     sample: float = 0.1, seed: int = 42) -> float:
    """Center-proxy silhouette on a sample
    (``GeneralizedKMeansModel.scala:667-728``): a = D(x, own center),
    b = min over other centers; one aggregation, no pairwise points."""
    C = list(np.asarray(centers, dtype=np.float64))
    feats = F.col(features_col)
    if kernel.pre_normalize:
        feats = kernel.normalize(feats)
    sdf = assigned if sample >= 1.0 else assigned.sample(sample, seed=seed)
    dists = distances_column(kernel, feats, C)
    # b = min over centers != own: drop the own entry by position
    with_b = sdf.withColumn(
        "_b",
        F.array_min(
            F.filter(
                dists, lambda v, i: i != F.col(pred_col)
            )
        ),
    )
    row = with_b.select(
        F.avg(
            (F.col("_b") - F.col(dist_col))
            / F.greatest(F.col("_b"), F.col(dist_col))
        ).alias("sil")
    ).collect()[0]
    return float(row["sil"]) if row["sil"] is not None else float("nan")


class ClusteringEvaluator:
    """pyspark.ml-style evaluator facade over :func:`evaluate`."""

    def __init__(self, metric: str = "silhouette", **kw):
        self.metric = metric
        self.kw = kw

    def evaluate_model(self, model, df: DataFrame) -> float:
        res = evaluate(model, df, **self.kw)
        key = {
            "silhouette": "silhouette",
            "wcss": "wcss",
            "bcss": "bcss",
            "calinskiHarabasz": "calinski_harabasz",
            "daviesBouldin": "davies_bouldin",
            "dunn": "dunn",
        }[self.metric]
        return res[key]
