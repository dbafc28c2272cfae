"""External clustering-agreement metrics (ground-truth comparison).

Engine extension: the reference's evaluation layer
(``GeneralizedKMeansModel.scala:467-728``) is all INTERNAL metrics
(WCSS, Calinski–Harabasz, silhouette, …) — quality without labels.
When labels exist (the ``embeddings.label`` ground truth, a prior
model's assignments, a human taxonomy), the questions become "did the
clustering recover the classes?" and "how much did the clustering
move between runs?". Standard answers, all computable from ONE
contingency table:

- **Adjusted Rand Index** (Hubert & Arabie 1985) — pair-counting,
  chance-corrected; 1 = identical partitions, ~0 = random.
- **Rand index / Fowlkes–Mallows** — raw pair agreement forms.
- **NMI** (sqrt normalization) — information-theoretic overlap.
- **Homogeneity / completeness / V-measure** (Rosenberg & Hirschberg
  2007) — each cluster holds one class / each class lands in one
  cluster / their harmonic mean.
- **Purity** — majority-class mass per cluster.

Distributed shape (the whole point at 100 TB): agreement needs only
the contingency table N[a, b] = |{rows with label a, prediction b}|,
which is ONE map-side-combined ``groupBy(a, b).count()`` — k_a · k_b
result rows of model-state-sized driver math, identical to the
:func:`~.functions.information.column_mutual_information` pattern.
No pairs are enumerated: all pair-counting metrics reduce to sums of
C(n, 2) over contingency cells and marginals, so the O(n²) pair space
never materializes. Driver state is k_a · k_b longs.

Conventions match scikit-learn: degenerate partitions (a single
cluster, or all-singleton on both sides) give homogeneity /
completeness = 1.0 where the conditional entropy is vacuously zero,
and ARI = 1.0 when both partitions are identical-and-degenerate.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["contingency_table", "agreement_metrics",
           "agreement_from_cells", "clustering_stability"]


def contingency_table(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """``(label, pred, n)`` cell counts — the single data-scale pass.

    NULL on either side is its own category (dropped rows would
    silently change n and every metric; callers filter explicitly).
    """
    return (
        df.groupBy(
            F.col(label_col).alias("label"), F.col(pred_col).alias("pred")
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )


def _comb2(x: float) -> float:
    return x * (x - 1.0) / 2.0


def agreement_from_cells(cells: list[tuple]) -> dict:
    """All metrics from ``(label, pred, n)`` cell triples (driver math,
    k_a·k_b cells). Returns a plain dict; see module docstring for the
    formulas and degenerate-case conventions."""
    n = float(sum(c[2] for c in cells))
    if n <= 0:
        raise ValueError("agreement_metrics: empty input")
    a: dict = {}
    b: dict = {}
    for lab, prd, cnt in cells:
        a[lab] = a.get(lab, 0.0) + cnt
        b[prd] = b.get(prd, 0.0) + cnt

    sum_comb_cells = sum(_comb2(float(c[2])) for c in cells)
    sum_comb_a = sum(_comb2(v) for v in a.values())
    sum_comb_b = sum(_comb2(v) for v in b.values())
    total_pairs = _comb2(n)
    expected = (
        sum_comb_a * sum_comb_b / total_pairs if total_pairs > 0 else 0.0
    )
    max_index = 0.5 * (sum_comb_a + sum_comb_b)
    # identical degenerate partitions (both one cluster, or both all
    # singletons): max_index == expected; convention ARI = 1
    ari = (
        1.0
        if max_index == expected
        else (sum_comb_cells - expected) / (max_index - expected)
    )
    rand = (
        1.0
        if total_pairs == 0
        else (total_pairs + 2.0 * sum_comb_cells - sum_comb_a - sum_comb_b)
        / total_pairs
    )
    fm_denom = math.sqrt(sum_comb_a * sum_comb_b)
    fowlkes_mallows = sum_comb_cells / fm_denom if fm_denom > 0 else 0.0

    def _ent(marg: dict) -> float:
        return -sum(
            (v / n) * math.log(v / n) for v in marg.values() if v > 0
        )

    h_a, h_b = _ent(a), _ent(b)
    # H(A|B) = −Σ_ij (n_ij/n) ln(n_ij / b_j);  MI = H(A) − H(A|B)
    h_a_given_b = -sum(
        (c[2] / n) * math.log(c[2] / b[c[1]]) for c in cells if c[2] > 0
    )
    mi = h_a - h_a_given_b
    nmi_denom = math.sqrt(h_a * h_b)
    nmi = mi / nmi_denom if nmi_denom > 0 else 1.0
    homogeneity = 1.0 if h_a == 0 else mi / h_a
    completeness = 1.0 if h_b == 0 else mi / h_b
    v_measure = (
        0.0
        if homogeneity + completeness == 0
        else 2.0 * homogeneity * completeness / (homogeneity + completeness)
    )
    best_per_pred: dict = {}
    for lab, prd, cnt in cells:
        best_per_pred[prd] = max(best_per_pred.get(prd, 0.0), float(cnt))
    purity = sum(best_per_pred.values()) / n
    return {
        "n": int(n),
        "ari": ari,
        "rand": rand,
        "fowlkes_mallows": fowlkes_mallows,
        "nmi": nmi,
        "homogeneity": homogeneity,
        "completeness": completeness,
        "v_measure": v_measure,
        "purity": purity,
    }


def agreement_metrics(
    df: DataFrame, label_col: str, pred_col: str
) -> DataFrame:
    """One-row DataFrame of all agreement metrics between two discrete
    columns. One ``groupBy(label, pred).count()`` over the data; the
    k_a·k_b cell table comes to the driver (model-state-sized — both
    columns must be categorical: class labels, cluster ids, bins)."""
    cells = [
        (r["label"], r["pred"], float(r["n"]))
        for r in contingency_table(df, label_col, pred_col).collect()
    ]
    m = agreement_from_cells(cells)
    spark = df.sparkSession
    return spark.createDataFrame(
        [tuple(m[k] for k in (
            "n", "ari", "rand", "fowlkes_mallows", "nmi",
            "homogeneity", "completeness", "v_measure", "purity",
        ))],
        "n bigint, ari double, rand double, fowlkes_mallows double, "
        "nmi double, homogeneity double, completeness double, "
        "v_measure double, purity double",
    )


def clustering_stability(
    df,
    estimator_factory,
    seeds,
    id_col: str,
) -> "DataFrame":
    """Run-to-run stability of a clustering configuration: refit with
    each seed, compare every pair of runs with :func:`agreement_metrics`,
    return ``(seed_a, seed_b, ari, nmi, v_measure)`` per pair.

    The stability criterion for model selection (Ben-Hur, Elisseeff &
    Guyon 2002): a k whose refits agree (high pairwise ARI) reflects
    real structure; a k whose refits scatter is over- or under-split.
    Mean pairwise ARI across seeds is the usual scalar gauge::

        stab = clustering_stability(df, lambda s: GeneralizedKMeans(
            k=k, divergence="se", max_iter=10, seed=s), seeds=range(5),
            id_col="id")
        stab.agg(F.avg("ari")).show()

    Cost: ``len(seeds)`` fits plus C(len(seeds), 2) contingency aggs —
    each agg is one groupBy over two int columns (k² cells). The
    prediction frames are cached between comparisons; rows must carry
    a stable ``id_col`` so runs join row-for-row.
    """
    from pyspark.sql import functions as F

    if len(seeds) < 2:
        raise ValueError("clustering_stability needs >= 2 seeds")
    preds = []
    for s in seeds:
        model = estimator_factory(s)
        p = model.fit(df).transform(df).select(
            F.col(id_col),
            F.col(model.prediction_col).alias(f"_p{s}"),
        ).cache()
        p.count()
        preds.append((s, p))
    rows = []
    try:
        for i, (sa, pa) in enumerate(preds):
            for sb, pb in preds[i + 1:]:
                joined = pa.join(pb, on=id_col)
                m = agreement_metrics(joined, f"_p{sa}", f"_p{sb}") \
                    .collect()[0]
                rows.append((sa, sb, m["ari"], m["nmi"], m["v_measure"]))
    finally:
        for _, p in preds:
            p.unpersist()
    spark = df.sparkSession
    return spark.createDataFrame(
        rows,
        "seed_a int, seed_b int, ari double, nmi double, v_measure double",
    )
