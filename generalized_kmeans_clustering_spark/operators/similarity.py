"""Similarity search over embedding columns (array<float|double>).

Engine extensions beyond the reference surface (driver mandate).

- ``cosine_topk``: brute-force top-k — broadcast the (small) query
  set against the corpus, dot products as ``zip_with``/``aggregate``
  expressions, per-query top-k via window ``row_number``. Exact
  baseline; scales as |queries| × |corpus| map work with no corpus
  shuffle (queries broadcast).
- ``ivf_index`` / ``ivf_topk``: the scale path — cluster the corpus
  with the engine's own GeneralizedKMeans (spherical divergence),
  store (centroid_id, vec) partitioned by centroid, and probe only
  ``nprobe`` nearest centroids per query: classic IVF-Flat, built
  entirely from this engine's operators.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.kernels import dot

__all__ = [
    "cosine_sim", "cosine_topk", "ivf_index", "ivf_topk",
    "embedding_near_dup_pairs", "embedding_near_dups_ivf",
    "embedding_simhash", "embedding_simhash_near_dups",
    "ann_recall", "knn_graph", "exact_rerank",
]


def cosine_sim(x: Column, y: Column) -> Column:
    return dot(x, y) / (F.sqrt(dot(x, x)) * F.sqrt(dot(y, y)))


def _norm(v: Column) -> Column:
    """sqrt(v·v) — precomputed per ROW before a pair join so the pair
    stage evaluates 1 dot product instead of 3 (r12 optimization:
    Catalyst has no cross-row common-subexpression elimination, so
    ``cosine_sim`` inside an n×m join recomputed both operand norms
    for every pair). ``dot(q,c)/(_nq*_nc)`` is bit-identical to
    ``cosine_sim(q, c)``: same operands, same multiplication order,
    only the evaluation site moves."""
    return F.sqrt(dot(v, v))


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def _candidate_filter(df: DataFrame, where) -> DataFrame:
    """PRE-filter the candidate side of a top-k search so ``k``
    survives predicate filtering (post-filtering the ranked output
    silently under-fills k). ``where`` is a Column or SQL string over
    the candidate frame's columns; applied before the probe join /
    WindowGroupLimit, so it pushes down to the candidate scan."""
    if where is None:
        return df
    return df.where(F.expr(where) if isinstance(where, str) else where)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    where=None,
) -> DataFrame:
    """(query_id, neighbor_id, sim, rank) for top-k cosine neighbors.
    ``where`` (Column or SQL string over CORPUS columns) pre-filters
    candidates so each query still gets k results."""
    q = queries.select(
        F.col(id_col).alias("query_id"),
        _as_double(F.col(vec_col)).alias("_qv"),
    ).withColumn("_qnrm", _norm(F.col("_qv")))
    c = _candidate_filter(corpus, where).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(F.col(vec_col)).alias("_cv"),
    ).withColumn("_cnrm", _norm(F.col("_cv")))
    joined = c.crossJoin(F.broadcast(q))
    if exclude_self:
        joined = joined.where(F.col("neighbor_id") != F.col("query_id"))
    # per-pair work: ONE dot product; norms precomputed per row above
    scored = joined.withColumn(
        "sim", dot(F.col("_qv"), F.col("_cv"))
        / (F.col("_qnrm") * F.col("_cnrm")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "sim", "rank")
    )


def exact_rerank(
    candidates: DataFrame,
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    metric: str = "sqeuclidean",
) -> DataFrame:
    """Exact-distance re-ranking of an ANN candidate frame — the
    Faiss-style REFINE step: recall ``k' > k`` candidates cheaply
    with any approximate path (``pq_topk`` / ``ivf_pq_topk`` /
    ``sq_topk`` / ``opq_topk`` / ``ivf_topk``), then recompute the
    TRUE distance for just those candidates and keep the exact
    top-k. Compensates quantization error at the cost of reading
    ``|queries| × k'`` full vectors instead of zero — the standard
    accuracy/IO dial between pure ADC serving and brute force.

    ``candidates`` needs ``(query_id, neighbor_id)`` (extra columns
    ignored); ``corpus``/``queries`` supply the full vectors by
    ``id_col``. Output matches the ANN contract:
    ``(query_id, neighbor_id, exact_dist, rank)`` ascending for
    ``metric="sqeuclidean"`` (the PQ/SQ families' distance),
    ``(query_id, neighbor_id, sim, rank)`` descending for
    ``metric="cosine"`` (the :func:`cosine_topk` contract — its
    brute-force result restricted to the candidate set, exactly).

    Distributed shape at 100 TB: the candidate frame is
    ``|queries| × k'`` rows — BROADCAST it against the corpus scan,
    so the only full-vector reads are one map-side pass with no
    corpus shuffle (mirror of :func:`cosine_topk`'s query
    broadcast); queries broadcast likewise; the re-rank window
    shuffles only the candidate rows (tiny).
    """
    if metric not in ("sqeuclidean", "cosine"):
        raise ValueError(
            f"exact_rerank: metric sqeuclidean|cosine, got {metric!r}")
    cand = candidates.select("query_id", "neighbor_id")
    cs = corpus.select(F.col(id_col).alias("neighbor_id"),
                       _as_double(F.col(vec_col)).alias("_cv"))
    qs = queries.select(F.col(id_col).alias("query_id"),
                        _as_double(F.col(vec_col)).alias("_qv")) \
        .withColumn("_qnrm", _norm(F.col("_qv")))
    j = (cs.join(F.broadcast(cand), "neighbor_id")
         .join(F.broadcast(qs), "query_id"))
    if metric == "cosine":
        # query norm precomputed per query row (the broadcast side);
        # the candidate norm stays per pair — each (query, neighbor)
        # pair is already a distinct row after the cand join, so there
        # is no cross-pair reuse to exploit on that side
        scored = j.withColumn(
            "sim", dot(F.col("_qv"), F.col("_cv"))
            / (F.col("_qnrm") * _norm(F.col("_cv"))))
        w = Window.partitionBy("query_id").orderBy(
            F.desc("sim"), F.asc("neighbor_id"))
        cols = ("query_id", "neighbor_id", "sim", "rank")
    else:
        d = F.aggregate(
            F.zip_with(F.col("_qv"), F.col("_cv"),
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, v: acc + v)
        scored = j.withColumn("exact_dist", d)
        w = Window.partitionBy("query_id").orderBy(
            F.asc("exact_dist"), F.asc("neighbor_id"))
        cols = ("query_id", "neighbor_id", "exact_dist", "rank")
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k).select(*cols))


def embedding_near_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact near-duplicate pairs (i < j, cosine ≥ threshold).

    All-pairs self-join — the exact baseline for small/medium corpora
    and the verifier for the bucketed variant below. At 100 TB use
    :func:`embedding_near_dups_ivf`, which only joins within centroid
    buckets.
    """
    w = df.select(
        F.col(id_col), _as_double(F.col(vec_col)).alias("_v"),
    ).withColumn("_nrm", _norm(F.col("_v")))
    a, b = w.alias("a"), w.alias("b")
    pairs = a.join(b, F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
    # one dot per pair; norms precomputed per row (n, not n²)
    sim = dot(F.col("a._v"), F.col("b._v")) / (
        F.col("a._nrm") * F.col("b._nrm"))
    return (
        pairs.select(
            F.col(f"a.{id_col}").alias("i"),
            F.col(f"b.{id_col}").alias("j"),
            sim.alias("sim"),
        )
        .where(F.col("sim") >= threshold)
    )


def embedding_near_dups_ivf(
    df: DataFrame,
    threshold: float = 0.95,
    n_lists: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    where=None,
) -> DataFrame:
    """Scale path: cluster with the engine's spherical k-means, then
    search pairs only within each centroid bucket (candidate work is
    ~1/n_lists of brute force; recall is bounded by bucket purity —
    raise n_lists' inverse or lower threshold margin for higher
    recall).

    ``where`` (Column or SQL string over ``df``'s columns) restricts
    the search to rows satisfying the predicate — applied BEFORE
    indexing and bucketing, so it prunes the scan and the clustering
    never touches excluded rows (per-language / per-license dedup
    without a second pipeline)."""
    indexed, _ = ivf_index(
        _candidate_filter(df, where),
        n_lists=n_lists, id_col=id_col, vec_col=vec_col, seed=seed
    )
    a = indexed.select(
        F.col("_list"), F.col(id_col).alias("i"), F.col("_v").alias("_vi")
    ).withColumn("_ni", _norm(F.col("_vi")))
    b = indexed.select(
        F.col("_list"), F.col(id_col).alias("j"), F.col("_v").alias("_vj")
    ).withColumn("_nj", _norm(F.col("_vj")))
    pairs = a.join(b, on="_list").where(F.col("i") < F.col("j"))
    # one dot per in-bucket pair; norms precomputed per row
    sim = dot(F.col("_vi"), F.col("_vj")) / (F.col("_ni") * F.col("_nj"))
    return pairs.select("i", "j", sim.alias("sim")).where(
        F.col("sim") >= threshold
    )


def ivf_index(
    corpus: DataFrame,
    n_lists: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    initial_centers=None,
):
    """Build an IVF index: spherical k-means centroids + assignments.

    Returns (indexed_df, model). ``indexed_df`` carries a ``_list``
    column; persist it partitioned/bucketed by ``_list`` for 100 TB
    serving so each probe reads only matching partitions.
    ``initial_centers`` (with ``max_iter=0``) builds the index around
    caller-supplied coarse centroids — deterministic, and useful when
    the centroids come from a prior sample-based training job.

    All OTHER columns of ``corpus`` ride through onto ``indexed``
    (metadata stays next to the vector), so a ``where=`` predicate in
    :func:`ivf_topk` / :func:`knn_graph` can filter candidates on
    them at the scan. ``vec_col`` itself does NOT ride through — it
    is fully redundant with the searched ``_v`` copy, and keeping
    both would double the stored index's vector bytes
    (:func:`write_ivf_index`) and every probe's scan.
    """
    from ..kmeans import GeneralizedKMeans

    reserved = {"_v", "_list", "query_id"} & set(corpus.columns)
    if reserved - {vec_col}:
        # _v/_list collide with the index's working columns; query_id
        # would make ivf_topk's self-exclusion filter ambiguous after
        # the probe join (the asof_join reserved-name convention)
        raise ValueError(
            f"ivf_index: reserved columns {sorted(reserved - {vec_col})} "
            "present on the corpus; rename them")
    base = corpus.select(
        *[c for c in corpus.columns if c != vec_col],
        _as_double(F.col(vec_col)).alias("_v"))
    model = GeneralizedKMeans(
        k=n_lists, divergence="spherical", seed=seed, max_iter=max_iter,
        features_col="_v", prediction_col="_list",
        initial_centers=initial_centers,
    ).fit(base)
    indexed = model.transform(base)
    # Make ``_list`` provably NON-NULLABLE (r13). The prediction
    # expression is nullable (null/degenerate vectors assign null), so
    # every downstream equi-join on ``_list`` made the planner infer
    # IsNotNull(_list) — and pushing that filter below this projection
    # re-INLINED the whole coarse-assignment expression (n_lists × d
    # interpreted dot products with the feature norm re-expanded per
    # element): every probed candidate row paid its assignment twice.
    # coalesce to the -1 sentinel is non-nullable by construction, so
    # no IsNotNull is ever inferred (and the join stays a plain
    # EqualTo, keeping partition pruning on stored indexes). Sentinel
    # rows (null vectors only) match no probe — exactly what the old
    # null key did in an inner join.
    indexed = indexed.withColumn(
        "_list", F.coalesce(F.col("_list"), F.lit(-1)))
    return indexed, model


def ivf_topk(
    indexed: DataFrame,
    model,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    broadcast_queries: bool = True,
    where=None,
) -> DataFrame:
    """Probe the nprobe nearest centroid lists per query, exact cosine
    within probed lists only.

    ``where`` (Column or SQL string over the columns of ``indexed``)
    PRE-filters candidates before the probe join and the top-k window,
    so a metadata-constrained search (language, source, license…)
    still returns k rows per query — post-filtering the ranked output
    would silently under-fill k. The predicate sits directly on the
    candidate scan, so it prunes files/row-groups too. Keep the
    metadata columns on ``indexed`` (join them on after
    :func:`ivf_index`, or build the index from a frame that carries
    them).

    Fully distributed: the n_lists×d centroid matrix rides as an
    expression literal (it is model state, k·d doubles — never data),
    per-query centroid sims + rank ≤ nprobe are a projection + window,
    and candidates come from the equi-join on ``_list``. The query
    table is never collected to the driver, so this works when the
    query side is itself a large table (set ``broadcast_queries=False``
    to let the ``_list`` join shuffle instead of broadcasting).
    Candidate work is ~nprobe/n_lists of brute force; the join prunes
    on the ``_list`` partitioning column."""
    from ..functions.kernels import array_lit, dot

    C = model.centers  # n_lists × d, unit norm
    centers_lit = F.array(*[array_lit(c) for c in C.tolist()])
    q = queries.select(F.col(id_col).alias("query_id"),
                       _as_double(F.col(vec_col)).alias("_qv"))
    qn = F.col("_qv")
    norm = F.sqrt(dot(qn, qn)) + F.lit(1e-12)
    qunit = F.transform(qn, lambda x: x / norm)
    staged = q.withColumn("_qn", qunit).withColumn(
        "_csims", F.transform(centers_lit, lambda c: dot(F.col("_qn"), c))
    )
    # top-nprobe lists per query as a MAP-ONLY array expression
    # (r12 optimization): rank (csim DESC, list ASC) == ascending
    # struct sort on (-csim, list) — SQL double ordering treats
    # -0.0 == 0.0, so ties fall to list exactly as row_number did.
    # The old posexplode + Window(partitionBy query_id) shuffled the
    # ENTIRE query side (n_lists copies of each query vector) just to
    # rank n_lists numbers per row; with broadcast_queries=False (the
    # knn_graph self-probe, where the corpus IS the query side) that
    # was a full-corpus Exchange+Sort. Now probe selection costs zero
    # shuffles; _qnrm is computed once per query row instead of once
    # per surviving probe row.
    keyed = F.transform(
        F.col("_csims"),
        lambda s, i: F.struct((-s).alias("ns"), i.alias("l")))
    probes = (
        staged.withColumn("_qnrm", _norm(F.col("_qv")))
        .select("query_id", "_qv", "_qnrm",
                F.explode(F.slice(F.array_sort(keyed), 1, nprobe))
                .alias("_p"))
        .select("query_id", F.col("_p.l").alias("_list"), "_qv", "_qnrm")
    )
    if broadcast_queries:
        probes = F.broadcast(probes)
    # candidate-side norm precomputed per scanned row, BEFORE the probe
    # join fans each row out to every query probing its list
    cand = _candidate_filter(indexed, where).withColumn(
        "_cnrm", _norm(F.col("_v"))).join(probes, on="_list")
    cand = cand.where(F.col(id_col) != F.col("query_id"))
    scored = cand.withColumn(
        "sim", dot(F.col("_qv"), F.col("_v"))
        / (F.col("_qnrm") * F.col("_cnrm")))
    w = Window.partitionBy("query_id").orderBy(F.desc("sim"), F.asc(id_col))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"), "sim", "rank")
    )


def srp_signs(num_bits: int, dim: int, seed: int) -> list:
    """Deterministic Rademacher hyperplane matrix (num_bits × dim of
    ±1.0) from md5 of ``seed|bit|dim`` — parameter state, generated
    driver-side and embedded as literals, so any engine (the DuckDB
    oracle included) reproduces it without sharing a hash function."""
    import hashlib

    return [
        [
            1.0 if hashlib.md5(
                f"{seed}|{i}|{j}".encode()).digest()[0] & 1 else -1.0
            for j in range(dim)
        ]
        for i in range(num_bits)
    ]


def embedding_simhash(
    df: DataFrame,
    num_bits: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    out_col: str = "simhash",
) -> DataFrame:
    """Charikar sign-random-projection signatures for embeddings:
    bit i = [⟨v, hᵢ⟩ > 0] with Rademacher hyperplanes hᵢ —
    P(bit differs) = angle(u,v)/π, so Hamming distance estimates
    cosine similarity. The text-SimHash twin for the vector column:
    60 bits packed into a positive BIGINT, map-only (hyperplanes are
    ~num_bits·d literal doubles — parameter state, never data), no
    shuffle; feed the result to
    :func:`~.dedup.simhash_near_dups`-style pigeonhole blocking.

    Unlike :func:`embedding_near_dups_ivf` this needs NO trained
    index — the right tool when you want one cheap pass that buckets
    near-duplicate vectors before any clustering exists."""
    from ..functions.kernels import array_lit, dot

    first = df.select(F.size(vec_col).alias("n")).first()
    if first is None:
        raise ValueError("embedding_simhash: empty input")
    dim = first["n"]
    signs = srp_signs(num_bits, dim, seed)
    v = _as_double(F.col(vec_col))
    sig = F.lit(0).cast("long")
    for i, row in enumerate(signs):
        sig = sig + F.when(
            dot(v, array_lit(row)) > 0, F.lit(1 << i).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return df.withColumn(out_col, sig)


def embedding_simhash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    num_bits: int = 60,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
) -> DataFrame:
    """(i, j, hamming) pairs with signature Hamming ≤ max_hamming —
    :func:`embedding_simhash` composed with the dedup layer's 16-bit
    pigeonhole blocked join (sound for max_hamming ≤ 3): candidate
    work is per-bucket, never all-pairs."""
    from .dedup import simhash_near_dups

    sigs = embedding_simhash(
        df, num_bits=num_bits, id_col=id_col, vec_col=vec_col, seed=seed)
    return simhash_near_dups(
        sigs.select(id_col, "simhash"), id_col=id_col,
        max_hamming=max_hamming)


def ann_recall(
    approx: DataFrame,
    exact: DataFrame,
    k: int,
    query_col: str = "query_id",
    neighbor_col: str = "neighbor_id",
) -> DataFrame:
    """Per-query recall@k of an approximate ANN result against an
    exact baseline: ``(query_id, recall)`` with recall = |approx ∩
    exact| / k. The in-engine quality gauge for tuning
    nprobe/n_lists/PQ size — run it on a query sample while the index
    parameters are chosen, at full scale it is one equi-join + one
    groupBy on the (tiny) result tables, never on the corpus.

    Queries present in ``exact`` but absent from ``approx`` (or with
    no overlapping neighbors) score 0."""
    if k <= 0:
        raise ValueError("k must be positive")
    hits = (
        approx.select(query_col, neighbor_col)
        .join(exact.select(query_col, neighbor_col),
              [query_col, neighbor_col])
        .groupBy(query_col)
        .agg((F.count("*") / F.lit(float(k))).alias("recall"))
    )
    qs = exact.select(query_col).distinct()
    return qs.join(hits, query_col, "left").select(
        query_col, F.coalesce(F.col("recall"), F.lit(0.0)).alias("recall"))


def write_ivf_index(indexed: DataFrame, model, path: str,
                    mode: str = "overwrite") -> None:
    """Persist an IVF index for serving: the indexed vectors as parquet
    PARTITIONED BY the ``_list`` column (probe joins/filters prune to
    the probed partitions — at 100 TB a probe touches nprobe/n_lists of
    the files, not the corpus) plus the coarse centroids as a JSON
    sidecar (model state: n_lists × d doubles).
    """
    indexed.write.mode(mode).partitionBy("_list").parquet(f"{path}/vectors")
    # centroids via the model's own persistence-free state (tiny).
    # Written through the shared checksummed sidecar layout
    # (sources/sidecar.py) so vectors and sidecar land on the SAME
    # filesystem (HDFS/S3/local alike) and a truncated sidecar fails
    # its sha256 instead of silently serving wrong centers.
    from ..sources.sidecar import write_model_sidecar

    write_model_sidecar(indexed.sparkSession, f"{path}/centroids",
                        "ivf_centroids", {
                            "n_lists": int(len(model.centers)),
                            "dim": int(model.centers.shape[1]),
                            "kernel": model.kernel_name,
                            "centers": [[float(v) for v in c]
                                        for c in model.centers],
                        }, mode=mode)


def read_ivf_index(spark, path: str):
    """Load an IVF index written by :func:`write_ivf_index`. Returns
    ``(indexed_df, model)`` ready for :func:`ivf_topk`; probes on the
    partitioned ``_list`` column are pruned at the parquet-scan level
    (visible as PartitionFilters in the plan)."""
    import json
    import os

    from ..kmeans import GeneralizedKMeansModel

    # Prefer the current Spark-written layout: a pre-0.3 index that was
    # later re-written in place leaves its driver-local centroids.json
    # behind (overwrite only replaces what Spark manages), and loading
    # that stale sidecar would silently pair old centers with new
    # vectors. The legacy file is only consulted when no centroids/
    # dataset exists.
    from pyspark.errors import AnalysisException

    from ..sources.sidecar import read_model_sidecar

    try:
        try:
            p = read_model_sidecar(spark, f"{path}/centroids",
                                   "ivf_centroids")
            sidecar = {"centers": [list(c) for c in p["centers"]],
                       "kernel": p["kernel"]}
        except ValueError as ve:
            if "not a shared-layout sidecar" not in str(ve):
                raise
            # r4-r6 bespoke Spark-written 1-row JSON layout
            row = spark.read.json(f"{path}/centroids").first()
            sidecar = {"centers": [list(c) for c in row["centers"]],
                       "kernel": row["kernel"]}
    except AnalysisException as e:
        # Fall back ONLY when the centroids dataset is absent. A
        # corrupt or partially-written centroids/ (or a transient FS
        # error) must propagate — silently loading the stale legacy
        # sidecar would pair old centers with new vectors, exactly the
        # failure the layout precedence exists to prevent.
        cond = getattr(e, "getCondition", getattr(
            e, "getErrorClass", lambda: None))() or str(e)
        if "PATH_NOT_FOUND" not in cond:
            raise
        legacy = f"{path}/centroids.json"
        if not os.path.exists(legacy):
            raise
        with open(legacy) as f:  # pre-0.3 layout: driver-local sidecar
            sidecar = json.load(f)
    indexed = spark.read.parquet(f"{path}/vectors")
    model = GeneralizedKMeansModel(
        centers=sidecar["centers"], kernel_name=sidecar["kernel"],
        features_col="_v", prediction_col="_list",
    )
    return indexed, model


def knn_graph(
    df: DataFrame,
    k: int = 10,
    n_lists: int = 64,
    nprobe: int = 8,
    mode: str = "union",  # "union" | "mutual" | "directed"
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    initial_centers=None,
    where=None,
) -> DataFrame:
    """Corpus-scale k-NN graph: EVERY row's approximate top-k cosine
    neighbors via the IVF self-probe — the standard affinity input for
    graph clustering (the k-NN alternative to
    :func:`~.graph.epsilon_affinity_edges`, which needs d ≤ 8),
    label propagation, or outlier scoring.

    The query side is the corpus itself, so it is NEVER broadcast:
    probes shuffle on the ``_list`` key against the indexed table
    (``ivf_topk(..., broadcast_queries=False)``) — candidate work is
    ~nprobe/n_lists of the quadratic all-pairs, per-query top-k via
    ``WindowGroupLimit``. Recall is the IVF model's (raise nprobe /
    n_lists resolution to trade work for recall).

    ``mode="union"`` keeps an undirected edge when EITHER endpoint
    ranks the other in its top-k (the usual spectral choice);
    ``"mutual"`` requires BOTH (sparser, robust to hubs); ``"directed"``
    returns the raw per-query ranking ``(query_id, neighbor_id, sim,
    rank)``. Undirected output is ``(i, j, sim)`` with i < j.

    ``where`` (Column or SQL string over ``df``'s columns) builds the
    graph over the rows satisfying the predicate: BOTH the query and
    candidate sides are pre-filtered (each surviving node still gets
    k surviving neighbors — post-filtering the edge list would lose
    the degree guarantee), and the candidate filter reaches the scan,
    pruning files. The coarse centroids are still trained on the full
    frame (assignment is per-row, so the surviving rows' lists are
    unchanged); pre-filter ``df`` yourself if the index should see
    only the subset.
    """
    if mode not in ("union", "mutual", "directed"):
        raise ValueError("mode: union | mutual | directed")
    indexed, model = ivf_index(
        df, n_lists=n_lists, id_col=id_col, vec_col=vec_col, seed=seed,
        max_iter=max_iter, initial_centers=initial_centers)
    nn = ivf_topk(indexed, model, _candidate_filter(df, where),
                  k=k, nprobe=nprobe, id_col=id_col,
                  vec_col=vec_col, broadcast_queries=False, where=where)
    if mode == "directed":
        return nn
    und = nn.select(
        F.least("query_id", "neighbor_id").alias("i"),
        F.greatest("query_id", "neighbor_id").alias("j"),
        "sim",
    )
    g = und.groupBy("i", "j").agg(
        F.max("sim").alias("sim"), F.count(F.lit(1)).alias("_c"))
    if mode == "mutual":
        g = g.where(F.col("_c") == 2)
    return g.select("i", "j", "sim")
