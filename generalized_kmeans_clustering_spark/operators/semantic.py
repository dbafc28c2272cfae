"""SemDeDup-style SEMANTIC deduplication over embedding columns.

Engine extension (driver mandate: large-scale training-data pipeline
operators). Exact and fuzzy text dedup (``operators.dedup``) miss
paraphrases — documents that say the same thing in different words.
SemDeDup (Abbas et al., 2023, arXiv:2303.09540) removes them in
embedding space: coarse-cluster the embeddings, call within-cluster
pairs with cosine similarity ≥ threshold *semantic duplicates*, and
keep ONE representative per duplicate group. The paper's keep rule
retains the member with the LOWEST cosine similarity to its cluster
centroid (the most atypical phrasing of the shared content); that is
the default here, with ``keep="near_centroid"`` and ``keep="min_id"``
as alternatives.

This is a pure composition of existing engine operators — the
clustering engine IS the curation engine:

1. :func:`~.similarity.ivf_index` — spherical k-means coarse clusters
   (or caller-fixed centroids with ``max_iter=0`` for deterministic
   replays).
2. within-list pair join — candidate work is ~1/n_lists of all-pairs;
   the join is keyed on the list id, never a global cross join.
3. :func:`~.dedup.duplicate_components` — pairs → duplicate groups
   (a pair graph, because A~B and B~C does not imply sim(A,C) ≥ τ;
   grouping by transitive closure matches the dedup-family contract).
4. one window over the component for the keep rule.

At 100 TB: one k-means fit (sample-trainable), one map-only assignment,
one bucketed self-join keyed on ``_list``, component rounds keyed on
the id, one window keyed on the component. Recall is bounded by bucket
purity exactly as in :func:`~.similarity.embedding_near_dups_ivf` —
raise ``n_lists`` resolution or lower the threshold margin for higher
recall; duplicates that straddle a cluster boundary are the method's
documented blind spot (SemDeDup §3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.kernels import array_lit, dot
from .dedup import duplicate_components
from .similarity import _as_double, cosine_sim, ivf_index

__all__ = ["semantic_near_dup_pairs", "semantic_dedup"]

_KEEP_POLICIES = ("far_from_centroid", "near_centroid", "min_id")


def semantic_near_dup_pairs(
    indexed: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
) -> DataFrame:
    """Within-list semantic duplicate pairs ``(i, j, sim)`` (i < j,
    cosine ≥ threshold) from an :func:`~.similarity.ivf_index` frame.

    The self-join is keyed on the coarse ``_list`` — candidate work is
    the sum of squared list sizes (~1/n_lists of brute force for
    balanced lists), never an all-pairs cross join.
    """
    a = indexed.select(
        F.col("_list"), F.col(id_col).alias("i"), F.col("_v").alias("_vi")
    )
    b = indexed.select(
        F.col("_list"), F.col(id_col).alias("j"), F.col("_v").alias("_vj")
    )
    pairs = a.join(b, on="_list").where(F.col("i") < F.col("j"))
    sim = cosine_sim(F.col("_vi"), F.col("_vj"))
    return pairs.select("i", "j", sim.alias("sim")).where(
        F.col("sim") >= threshold
    )


def semantic_dedup(
    df: DataFrame,
    threshold: float = 0.95,
    n_lists: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    initial_centers=None,
    keep: str = "far_from_centroid",
    method: str = "auto",
) -> DataFrame:
    """Per-row semantic-dedup verdicts:
    ``(id, list, centroid_sim, component, is_canonical)``.

    Every input row survives (this is a verdict frame, not a filter —
    ``.where("is_canonical")`` is the dedup). Rows with no semantic
    duplicate are their own singleton component and canonical by
    definition. ``component`` is the smallest member id (the
    :func:`~.dedup.duplicate_components` contract), ``centroid_sim``
    the cosine similarity to the assigned coarse centroid, and
    ``is_canonical`` follows ``keep``:

    - ``"far_from_centroid"`` (SemDeDup's rule): lowest centroid_sim
      wins, ties → smallest id.
    - ``"near_centroid"``: highest centroid_sim wins (prototypical
      member — the choice for building exemplar sets).
    - ``"min_id"``: smallest id wins (content-addressed, embedding-
      noise-independent).

    ``initial_centers`` + ``max_iter=0`` makes the whole pipeline
    deterministic (fixed coarse geometry) — the oracle-replay mode;
    production trains the centroids (optionally on a
    :func:`~.sampling.sample_hash` sample, then assigns the full
    corpus with ``max_iter=0``).
    """
    if keep not in _KEEP_POLICIES:
        raise ValueError(f"keep: one of {_KEEP_POLICIES}, got {keep!r}")
    indexed, model = ivf_index(
        df, n_lists=n_lists, id_col=id_col, vec_col=vec_col, seed=seed,
        max_iter=max_iter, initial_centers=initial_centers,
    )
    centers_lit = F.array(*[array_lit(c) for c in model.centers.tolist()])
    scored = indexed.withColumn(
        "centroid_sim",
        cosine_sim(
            F.col("_v"),
            _as_double(F.element_at(centers_lit, F.col("_list") + 1)),
        ),
    )
    pairs = semantic_near_dup_pairs(indexed, threshold, id_col=id_col)
    comp = duplicate_components(pairs, method=method).select(
        F.col("id").alias(id_col), "component"
    )
    labeled = scored.join(comp, on=id_col, how="left").withColumn(
        "component", F.coalesce(F.col("component"), F.col(id_col))
    )
    if keep == "far_from_centroid":
        order = [F.asc("centroid_sim"), F.asc(id_col)]
    elif keep == "near_centroid":
        order = [F.desc("centroid_sim"), F.asc(id_col)]
    else:
        order = [F.asc(id_col)]
    w = Window.partitionBy("component").orderBy(*order)
    return labeled.select(
        id_col,
        F.col("_list").alias("list"),
        "centroid_sim",
        "component",
        (F.row_number().over(w) == 1).alias("is_canonical"),
    )
