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

Skew hardening: real embedding distributions are skewed, and k-means
routinely produces one catch-all mega-list; a within-list self-join is
quadratic in the hottest list, so a single list holding 50% of rows
re-introduces near-all-pairs work. Lists larger than ``list_size_cap``
are therefore RECURSIVELY SUB-SPLIT before the pair join — the same
move FAISS-family systems make when a coarse quantizer cell overflows:
"if one list holds half the corpus, the quantizer is too coarse there;
refine it". Per level, each oversized list gets ``k_sub`` sub-centers
(a deterministic hash sample of its rows, thinned driver-side by
farthest-point selection — model state, never data) and a map-only
nearest-sub-center assignment re-keys its rows; lists still over the
cap split again, up to ``max_split_levels``. Rows are multi-probed to
their ``split_probes`` nearest sub-centers, so a near-dup pair on a
sub-cell boundary still meets in ≥1 shared sub-list — the recall model
is the coarse layer's documented boundary blind spot (SemDeDup §3),
applied recursively, NOT a new failure mode. (An SRP/LSH banding
variant was measured and rejected: within a k-means list vectors are
globally correlated, so sign-random-projection buckets skew and the
band fan-out MULTIPLIES candidate work instead of cutting it.)

A mega-list of near-IDENTICAL vectors is the one shape sub-splitting
cannot shrink (every sample point is the same point) — but there every
pair qualifies, so the output itself is quadratic and no pair-
enumerating algorithm does better; the loop detects the degenerate
split and stops burning levels on it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.kernels import array_lit, dot
from .dedup import duplicate_components
from .similarity import _as_double, cosine_sim, ivf_index

__all__ = [
    "semantic_near_dup_pairs",
    "semantic_dedup",
    "semantic_list_stats",
]

_KEEP_POLICIES = ("far_from_centroid", "near_centroid", "min_id")

#: default within-list self-join size cap: C(32768, 2) ≈ 5.4e8 cosine
#: evaluations per list is seconds of executor work; above it the
#: sub-split's extra passes over the hot rows pay for themselves.
DEFAULT_LIST_SIZE_CAP = 32768

#: sub-centers sampled per oversized list and per level (bounds the
#: driver-side model state at ~256 lists × k_sub × d doubles/level)
_MAX_HOT_LISTS_PER_LEVEL = 256
_CENTER_OVERSAMPLE = 4
_SAMPLE_MOD = 1 << 20


def _farthest_point_centers(rows, k_sub):
    """Greedy max-min (farthest-point) selection of ``k_sub`` unit
    sub-centers from a sampled row set — deterministic (rows sorted by
    id, start at the smallest). Stops early when every remaining point
    coincides with a chosen center (the degenerate all-identical list:
    splitting cannot help, and the caller detects the single-center
    result and stops re-splitting that list)."""
    import numpy as np

    rows = sorted(rows, key=lambda r: r[0])
    V = np.asarray([r[1] for r in rows], dtype=float)
    V /= np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
    chosen = [0]
    best_sim = V @ V[0]
    while len(chosen) < min(k_sub, len(V)):
        nxt = int(np.argmin(best_sim))
        if best_sim[nxt] >= 1.0 - 1e-9:
            break
        chosen.append(nxt)
        best_sim = np.maximum(best_sim, V @ V[nxt])
    return [V[i].tolist() for i in chosen]


def _refine_oversized(
    hot: DataFrame,
    cap: int,
    k_sub: int,
    split_probes: int,
    max_split_levels: int,
    seed: int,
) -> DataFrame:
    """Recursively sub-split ``(_skey string, _id, _v)`` rows until no
    key exceeds ``cap`` (or levels run out). Per level: ONE count agg
    over the hot rows, ONE deterministic hash-sample collect (≤
    ~256·4·k_sub vectors of model state), ONE map-only multi-probe
    assignment. Sub-keys are ``parent/probe`` path strings, so the
    originating coarse list is always the first path segment."""
    cur = hot
    for level in range(max_split_levels):
        sizes = {
            r["_skey"]: r["n"]
            for r in cur.groupBy("_skey").agg(
                F.count("*").alias("n")).collect()
        }
        hot_keys = sorted(
            (k for k, n in sizes.items() if n > cap),
            key=lambda k: -sizes[k],
        )[:_MAX_HOT_LISTS_PER_LEVEL]
        if not hot_keys:
            break
        rate = {
            k: min(
                _SAMPLE_MOD,
                int(_SAMPLE_MOD * _CENTER_OVERSAMPLE * k_sub
                    / sizes[k]) + 1,
            )
            for k in hot_keys
        }
        rate_map = F.create_map(
            *[x for k in hot_keys for x in (F.lit(k), F.lit(rate[k]))])
        in_hot = F.col("_skey").isin(hot_keys)
        hotf = cur.where(in_hot)
        rest = cur.where(~in_hot)
        samp = hotf.where(
            F.pmod(F.xxhash64("_id", F.lit(seed + level)),
                   F.lit(_SAMPLE_MOD))
            < F.element_at(rate_map, F.col("_skey"))
        ).collect()
        by_key: dict = {}
        for r in samp:
            by_key.setdefault(r["_skey"], []).append((r["_id"], r["_v"]))
        centers = {
            k: _farthest_point_centers(v, k_sub) for k, v in by_key.items()
        }
        # a key whose sample collapsed to one center cannot split —
        # pass it through instead of re-keying it forever
        splittable = [k for k in hot_keys if len(centers.get(k, [])) >= 2]
        if not splittable:
            break
        in_split = F.col("_skey").isin(splittable)
        rest = rest.unionByName(hotf.where(~in_split))
        hotf = hotf.where(in_split)
        cmap = F.create_map(*[
            x for k in splittable
            for x in (F.lit(k),
                      F.array(*[array_lit(c) for c in centers[k]]))
        ])
        v = _as_double(F.col("_v"))
        sims = F.transform(F.element_at(cmap, F.col("_skey")),
                           lambda c: dot(v, c))
        # top split_probes sub-centers by similarity; ties collapse to
        # the first position (identical vectors thus take identical
        # probe sets — planted exact duplicates always meet)
        top_vals = F.slice(F.sort_array(sims, asc=False), 1, split_probes)
        probe_arr = F.slice(
            F.array_distinct(
                F.transform(top_vals, lambda t: F.array_position(sims, t))),
            1, split_probes)
        split = hotf.select(
            "_skey", "_id", "_v", F.explode(probe_arr).alias("_probe"),
        ).select(
            F.concat(F.col("_skey"), F.lit("/"),
                     F.col("_probe").cast("string")).alias("_skey"),
            "_id", "_v",
        )
        cur = rest.unionByName(split)
    return cur


def _split_by_list_size(indexed: DataFrame, id_col: str, cap):
    """(normal_rows, hot_rows, sizes) — rows of lists ≤/> cap, split
    via a broadcast join on the (n_lists-row) per-list size frame.
    Hot rows carry ``_skey``, the stringified list id that seeds the
    recursive sub-split's path keys."""
    sizes = indexed.groupBy("_list").agg(F.count("*").alias("_list_size"))
    flagged = indexed.join(F.broadcast(sizes), on="_list").select(
        "_list", F.col(id_col).alias("_id"), "_v", "_list_size"
    )
    normal = flagged.where(F.col("_list_size") <= cap).drop("_list_size")
    hot = flagged.where(F.col("_list_size") > cap).select(
        F.col("_list").cast("string").alias("_skey"), "_id", "_v"
    )
    return normal, hot, sizes


def semantic_near_dup_pairs(
    indexed: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    list_size_cap: int | None = DEFAULT_LIST_SIZE_CAP,
    k_sub: int = 16,
    split_probes: int = 2,
    max_split_levels: int = 3,
    seed: int = 17,
) -> DataFrame:
    """Within-list semantic duplicate pairs ``(i, j, sim)`` (i < j,
    cosine ≥ threshold) from an :func:`~.similarity.ivf_index` frame.

    The self-join is keyed on the coarse ``_list`` — candidate work is
    the sum of squared list sizes (~1/n_lists of brute force for
    balanced lists), never an all-pairs cross join. Lists larger than
    ``list_size_cap`` are recursively sub-split first (see module
    docstring): ``k_sub`` sub-centers per level, rows multi-probed to
    their ``split_probes`` nearest, so per-task candidate volume stays
    bounded (~``split_probes²/k_sub`` of the unsplit quadratic per
    level) even when one mega-list holds most of the corpus. Lists at
    or under the cap are EXACT; over-cap lists lose only sub-cell
    boundary pairs every probe misses — the coarse layer's documented
    recall model, recursively applied. Measured on a 3-d hot list at
    τ = 0.95 with ~8% of pairs qualifying (the SemDeDup regime):
    recall 0.94 at defaults, 0.97 at ``split_probes=3``, 1.0 at 4; in
    a DENSE list where ~27% of ALL pairs qualify the output itself is
    near-quadratic and pruning inherently costs recall (0.52 at
    defaults — raise ``split_probes`` or the cap there).
    ``list_size_cap=None`` disables splitting (the exact
    pre-hardening behavior). For very large runs persist ``indexed``
    first: each split level re-reads the hot rows (one count + one
    sample + the re-key).
    """
    from .similarity import _norm

    if list_size_cap is None:
        a = indexed.select(
            F.col("_list"), F.col(id_col).alias("i"),
            F.col("_v").alias("_vi")).withColumn(
                "_ni", _norm(F.col("_vi")))
        b = indexed.select(
            F.col("_list"), F.col(id_col).alias("j"),
            F.col("_v").alias("_vj")).withColumn(
                "_nj", _norm(F.col("_vj")))
        pairs = a.join(b, on="_list").where(F.col("i") < F.col("j"))
        # one dot per in-list pair; norms precomputed per row
        sim = dot(F.col("_vi"), F.col("_vj")) / (
            F.col("_ni") * F.col("_nj"))
        return pairs.select("i", "j", sim.alias("sim")).where(
            F.col("sim") >= threshold)

    normal, hot, _ = _split_by_list_size(indexed, id_col, list_size_cap)
    exact = semantic_near_dup_pairs(
        normal.select("_list", F.col("_id").alias(id_col), "_v"),
        threshold, id_col=id_col, list_size_cap=None)

    refined = _refine_oversized(
        hot, list_size_cap, k_sub, split_probes, max_split_levels, seed)
    a = refined.select(
        "_skey", F.col("_id").alias("i"), F.col("_v").alias("_vi")
    ).withColumn("_ni", _norm(F.col("_vi")))
    b = refined.select(
        "_skey", F.col("_id").alias("j"), F.col("_v").alias("_vj")
    ).withColumn("_nj", _norm(F.col("_vj")))
    sim = dot(F.col("_vi"), F.col("_vj")) / (F.col("_ni") * F.col("_nj"))
    hot_pairs = (
        a.join(b, on="_skey")
        .where(F.col("i") < F.col("j"))
        .select("i", "j", sim.alias("sim"))
        .where(F.col("sim") >= threshold)
        # multi-probe rows meet in up to split_probes² sub-lists with
        # identical sim — dedupe AFTER the threshold so the distinct
        # shuffles output-sized data, not candidate-sized
        .dropDuplicates(["i", "j"])
    )
    return exact.unionByName(hot_pairs)


def semantic_list_stats(
    indexed: DataFrame,
    id_col: str = "vec_id",
    list_size_cap: int | None = DEFAULT_LIST_SIZE_CAP,
    k_sub: int = 16,
    split_probes: int = 2,
    max_split_levels: int = 3,
    seed: int = 17,
) -> DataFrame:
    """Per-coarse-list candidate-volume telemetry for
    :func:`semantic_near_dup_pairs`:
    ``(list, size, oversized, candidate_pairs)`` where
    ``candidate_pairs`` is the EXACT number of (i, j) candidates the
    pair join will evaluate for that list — C(size, 2) for normal
    lists, the sum of per-sub-list C(n, 2) (multi-probe copies
    included) for recursively split oversized lists. Run it before a
    big dedup to see whether the cap engaged and what it bought; the
    skew-hardening acceptance gauge.
    """
    if list_size_cap is None:
        return (
            indexed.groupBy("_list")
            .agg(F.count("*").alias("size"))
            .select(
                F.col("_list").alias("list"), "size",
                F.lit(False).alias("oversized"),
                (F.col("size") * (F.col("size") - 1) / 2)
                .cast("long").alias("candidate_pairs"),
            )
        )
    normal, hot, sizes = _split_by_list_size(indexed, id_col, list_size_cap)
    normal_stats = (
        normal.groupBy("_list").agg(F.count("*").alias("size"))
        .select(
            F.col("_list").cast("string").alias("_skey0"),
            "size", F.lit(False).alias("oversized"),
            (F.col("size") * (F.col("size") - 1) / 2)
            .cast("long").alias("candidate_pairs"),
        )
    )
    refined = _refine_oversized(
        hot, list_size_cap, k_sub, split_probes, max_split_levels, seed)
    hot_stats = (
        refined.groupBy("_skey").agg(F.count("*").alias("n"))
        .withColumn("_skey0", F.split(F.col("_skey"), "/").getItem(0))
        .groupBy("_skey0")
        .agg(
            F.sum(F.col("n") * (F.col("n") - 1) / 2)
            .cast("long").alias("candidate_pairs"),
        )
        .join(
            F.broadcast(sizes.select(
                F.col("_list").cast("string").alias("_skey0"),
                F.col("_list_size"))),
            on="_skey0",
        )
        .select(
            "_skey0", F.col("_list_size").alias("size"),
            F.lit(True).alias("oversized"), "candidate_pairs",
        )
    )
    return (
        normal_stats.unionByName(hot_stats)
        .select(
            F.col("_skey0").cast("int").alias("list"),
            "size", "oversized", "candidate_pairs",
        )
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
    list_size_cap: int | None = DEFAULT_LIST_SIZE_CAP,
    k_sub: int = 16,
    split_probes: int = 2,
    max_split_levels: int = 3,
    pins=None,
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
    # evaluate-once (r13): `indexed` feeds the centroid-sim scoring,
    # the pair search (which itself reads it for the per-list sizes
    # AND the within-list join when capped) and, through the pairs,
    # the eager component rounds — as lazy lineage the coarse
    # assignment ran once per branch. Persisted, the corpus is scanned
    # and assigned exactly once; the cache is (id, _v, _list) rows.
    # Pass a Pins to release in long-lived sessions.
    indexed = indexed.persist()
    if pins is not None:
        pins.add(indexed)
    centers_lit = F.array(*[array_lit(c) for c in model.centers.tolist()])
    scored = indexed.withColumn(
        "centroid_sim",
        cosine_sim(
            F.col("_v"),
            # 0-based F.get: same value as element_at(_list + 1) for
            # real lists, NULL (not an index error) for the -1
            # sentinel ivf_index now assigns to null vectors (r13)
            _as_double(F.get(centers_lit, F.col("_list"))),
        ),
    )
    pairs = semantic_near_dup_pairs(
        indexed, threshold, id_col=id_col, list_size_cap=list_size_cap,
        k_sub=k_sub, split_probes=split_probes,
        max_split_levels=max_split_levels, seed=seed,
    )
    comp = duplicate_components(pairs, method=method, pins=pins).select(
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
