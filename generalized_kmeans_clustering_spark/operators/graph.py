"""Distributed affinity-graph construction for spectral methods.

Engine extension: the reference's spectral path builds its epsilon /
k-NN affinity graph from COLLECTED points (``df/SpectralGraph.scala:71-196``,
driver-side dense matrix) — fine at its documented n ≤ 5k ceiling, a
non-starter at 100 TB. This module provides the scale path: an
epsilon-neighborhood edge list built with **grid bucketing** so the
join touches only same-or-adjacent cells, never all pairs.

Plan shape: quantize each feature to a cell index (cell side =
Euclidean radius, so any pair within distance ``radius`` shares or
neighbors a cell); explode ONE side over the 3^d neighbor offsets;
shuffle on the cell key; exact distance filter inside the bucket. For
d beyond ~8 the 3^d fan-out dominates — use the IVF/LSH operators in
``similarity.py`` instead (documented, not silently slow).

Output edges are undirected (i < j), optionally RBF-weighted
``w = exp(−gamma·d)`` with d the half-squared-Euclidean distance used
everywhere else in this engine.
"""

from __future__ import annotations

from itertools import product

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["epsilon_affinity_edges", "propagate_flags", "same_key_pairs"]


def same_key_pairs(
    df: DataFrame,
    key_col: str,
    id_col: str,
    group_cap: int = 4096,
    salt: int = 16,
    pins=None,
) -> DataFrame:
    """All ``(src < dst)`` id pairs sharing a non-null key — the
    same-fingerprint edge build for :func:`propagate_flags`,
    skew-guarded (r13, the r12 verdict's item 5).

    NULL keys are dropped, matching the self-join this construction
    replaces (NULL never equi-joins NULL); grouping them instead would
    fabricate edges among every null-key row (the r12 advisor's find).

    Groups of at most ``group_cap`` rows pair via ONE
    ``groupBy(key).collect_list`` + in-group explode — the key
    expression is evaluated once and shuffled once, and no group row
    exceeds ``group_cap`` ids. HOT groups (> ``group_cap`` — the
    empty/boilerplate fingerprint at corpus scale) would otherwise
    collect every member into a single array in a single task and
    explode quadratically there; they are paired instead with a
    salt-block join: the left side replicates each row over the
    ``salt`` block ids, the right side carries its deterministic chunk
    ``pmod(xxhash64(id), salt)``, and the equi-join on (key, block)
    matches every pair exactly once — per-task work falls to ~1/salt
    of the group's quadratic and no single row materializes the group
    (guide §2.5: deterministic salt, never rand()).

    The keyed frame feeds both branches and the hot-key count, so it
    is persisted — register on ``pins`` to release. The hot-key list
    (≤ rows/group_cap keys by construction) is broadcast.
    """
    if group_cap <= 1:
        raise ValueError("group_cap must be > 1")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    keyed = df.select(F.col(key_col), F.col(id_col)) \
        .where(F.col(key_col).isNotNull()).persist()
    if pins is not None:
        pins.add(keyed)
    hot_keys = (
        keyed.groupBy(key_col).agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > group_cap).select(key_col)
    )
    small = keyed.join(F.broadcast(hot_keys), on=key_col, how="left_anti")
    small_edges = (
        small.groupBy(key_col).agg(F.collect_list(id_col).alias("_ids"))
        .select(F.explode("_ids").alias("src"), "_ids")
        .select("src", F.explode("_ids").alias("dst"))
        .where(F.col("src") < F.col("dst"))
    )
    hot = keyed.join(F.broadcast(hot_keys), on=key_col, how="left_semi")
    left = hot.select(
        F.col(key_col), F.col(id_col).alias("src"),
        F.explode(F.sequence(F.lit(0), F.lit(salt - 1))).alias("_blk"))
    right = hot.select(
        F.col(key_col), F.col(id_col).alias("dst"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(salt))
        .cast("int").alias("_blk"))
    hot_edges = (
        left.join(right, on=[key_col, "_blk"])
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst")
    )
    return small_edges.unionByName(hot_edges)


def propagate_flags(
    edges: DataFrame,
    seeds: DataFrame,
    rounds: int = 2,
    src_col: str = "src",
    dst_col: str = "dst",
    id_col: str = "id",
    pins=None,
) -> DataFrame:
    """Bounded flag propagation over an undirected edge list: starting
    from the ``seeds`` ids (round 0), each round flags every neighbor
    of an already-flagged node. Returns ``(id, round)`` with ``round``
    the FIRST round at which the id was flagged — the curation use is
    spreading a contamination / spam / takedown verdict across the
    near-duplicate graph ("this doc is flagged, so are its near-dups
    and their near-dups").

    Bounded BFS, not closure: ``rounds`` hops from the seed set. For
    the full transitive closure use
    :func:`~.dedup.duplicate_components` — this operator exists for
    the common case where the graph IS near-clique-shaped (LSH pair
    lists) and one or two hops capture the component at a fraction of
    the cost.

    Distributed shape: per round, one equi-join of the (symmetrized)
    edge list against the CURRENT frontier — only newly-flagged ids
    join the next round, so work per round is O(edges touching the
    frontier), and a fixed ``rounds`` bound keeps the lineage/shuffle
    count constant. min(round) dedups multi-path discoveries. No
    collect; the frontier never materializes on the driver.

    Multi-round walks (rounds >= 2) persist the symmetrized edge list
    (partitioned on the join key, so each round's join reuses the
    partitioning and only the frontier side moves — the
    ``_components_label`` pattern) and every REUSED frontier — each is
    a live branch of the result's union, so unpersisting here would
    re-derive all earlier rounds at action time. Pass a
    :class:`~.pins.Pins` as ``pins`` to release them when done in a
    long-lived session (the handle survives composition, unlike an
    attribute on the returned frame); one-shot jobs can omit it.
    """
    if rounds < 1:
        raise ValueError("propagate_flags: rounds must be >= 1")
    # symmetrize with ONE evaluation of the caller's edge lineage (the
    # old two-branch union re-derived ``edges`` per branch — for edge
    # lists built from expensive derived keys, e.g. a fingerprint
    # self-join, that doubled the dominant cost before any walk began)
    sym = edges.select(F.explode(F.array(
        F.struct(F.col(src_col).alias("a"), F.col(dst_col).alias("b")),
        F.struct(F.col(dst_col).alias("a"), F.col(src_col).alias("b")),
    )).alias("_e")).select("_e.a", "_e.b")
    flagged = seeds.select(F.col(id_col).alias("id")).distinct() \
        .withColumn("round", F.lit(0))
    if rounds >= 2:
        # round r's tree references sym and every earlier frontier
        # several times (next join, anti-join, result union); persist
        # once so the walk computes each exactly once per action. The
        # repartition keys the cache on the join column, so per-round
        # joins reuse the partitioning instead of re-shuffling edges.
        sym = sym.repartition(F.col("a")).persist()
        flagged = flagged.persist()
        if pins is not None:
            pins.add(sym)
            pins.add(flagged)
    frontier = flagged
    for r in range(1, rounds + 1):
        nbrs = (
            sym.join(frontier.select(F.col("id").alias("a")), "a")
            .select(F.col("b").alias("id")).distinct()
            .withColumn("round", F.lit(r))
        )
        # ids already flagged keep their earlier round
        frontier = nbrs.join(flagged.select("id"), "id", "left_anti")
        if r < rounds:
            # reused frontiers only: the FINAL frontier is a single
            # branch of the result union, so caching it would cost a
            # write with no second read
            frontier = frontier.persist()
            if pins is not None:
                pins.add(frontier)
        flagged = flagged.unionByName(frontier)
        # a drained frontier ends the walk early at the plan level too:
        # joins against it produce nothing; no driver-side check needed
    return flagged


def epsilon_affinity_edges(
    df: DataFrame,
    dim: int,
    id_col: str = "id",
    features_col: str = "features",
    epsilon: float = 1.0,
    gamma: float | None = None,
) -> DataFrame:
    """Edges (i, j, dist[, w]) with half-SE distance ≤ ``epsilon``.

    ``epsilon`` is in the engine's half-squared-Euclidean convention
    (½‖x−y‖²), so the Euclidean radius is √(2ε) — that radius is the
    grid cell side, guaranteeing neighbors share or touch a cell.
    One shuffle on the cell key; 3^dim fan-out on the left side only.
    """
    if dim < 1:
        raise ValueError("dim must be >= 1")
    if dim > 8:
        raise ValueError(
            f"grid bucketing fans out 3^{dim} neighbor cells — beyond "
            "d=8 use the LSH/IVF paths in operators/similarity.py"
        )
    radius = float((2.0 * epsilon) ** 0.5)
    f = F.col(features_col)
    cells = [
        F.floor(F.element_at(f, m + 1) / F.lit(radius)).cast("long")
        for m in range(dim)
    ]
    base = df.select(
        F.col(id_col).alias("_gid"), f.alias("_gf"),
        *[c.alias(f"_c{m}") for m, c in enumerate(cells)],
    )
    offsets = list(product((-1, 0, 1), repeat=dim))
    off_col = F.array(*[
        F.struct(*[F.lit(o[m]).alias(f"o{m}") for m in range(dim)])
        for o in offsets
    ])
    left = base.select(
        F.col("_gid").alias("_li"), F.col("_gf").alias("_lf"),
        F.explode(off_col).alias("_o"),
        *[F.col(f"_c{m}").alias(f"_lc{m}") for m in range(dim)],
    ).select(
        "_li", "_lf",
        *[(F.col(f"_lc{m}") + F.col(f"_o.o{m}")).alias(f"_k{m}")
          for m in range(dim)],
    )
    right = base.select(
        F.col("_gid").alias("_ri"), F.col("_gf").alias("_rf"),
        *[F.col(f"_c{m}").alias(f"_k{m}") for m in range(dim)],
    )
    dist = F.aggregate(
        F.zip_with("_lf", "_rf", lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, v: acc + v,
    ) / 2.0
    edges = (
        left.join(right, on=[f"_k{m}" for m in range(dim)])
        .where(F.col("_li") < F.col("_ri"))
        .withColumn("_d", dist)
        .where(F.col("_d") <= F.lit(float(epsilon)))
        .select(
            F.col("_li").alias("i"), F.col("_ri").alias("j"),
            F.col("_d").alias("dist"),
        )
        # no distinct needed: a pair shares exactly one offset vector
        # (o = rc − lc per dimension), so each edge joins exactly once
    )
    if gamma is not None:
        edges = edges.withColumn(
            "w", F.exp(-F.lit(float(gamma)) * F.col("dist"))
        )
    return edges
