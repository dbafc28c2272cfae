"""Product quantization (PQ) for embedding columns — the memory-scale
ANN path.

Engine extension (driver mandate: similarity search at 100 TB).
IVF-Flat (:mod:`.similarity`) prunes *candidates* but still stores and
scans full float vectors. PQ (Jégou, Douze, Schmid, "Product
Quantization for Nearest Neighbor Search", IEEE TPAMI 2011) compresses
the vectors themselves: split each d-dim vector into ``m`` subvectors,
k-means each subspace into ``k_sub`` codewords, and store each vector
as ``m`` small codes — d·4 bytes shrink to ``m`` code slots (64-dim
float32 at m=8, k_sub=256 is 32× smaller), and distances against a
query are additive lookups in a per-query ``m × k_sub`` table (ADC —
asymmetric distance computation), never a decode.

The clustering engine IS the codebook trainer: each subspace codebook
is a :class:`~..kmeans.GeneralizedKMeans` SE fit over the sliced
column — distributed training, no sklearn. Everything else is pure
Catalyst expressions:

- encode: per subspace an argmin over the codebook literal
  (``array_position(dists, array_min(dists))`` — first-index-wins,
  the assignment layer's convention);
- search: the query-side lookup tables are a staged projection, the
  corpus side is one broadcast join + an ``aggregate``/``zip_with``
  fold over (codes, tables) — no Python, no decode, no shuffle of the
  corpus beyond the final per-query top-k window (Spark 4's
  WindowGroupLimit keeps ≤ k rows per partition pre-shuffle).

At 100 TB: train on a :func:`~.sampling.sample_hash` sample (PQ
codebooks need ~100k-1M vectors, not the corpus), encode the corpus in
one map-only pass, store ``(id, codes)`` — the scan that serves ANN
reads m bytes/vector, not d·4. Compose with
:func:`~.similarity.ivf_index` for IVF-PQ: coarse lists prune
candidates, PQ codes score them. Distances are PLAIN squared L2
(not the Bregman half-SE): exact for encode argmin in each subspace,
additive-approximate for ADC (quantization error is bounded by the
per-subspace distortion the training fit minimizes).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.kernels import array_lit

__all__ = [
    "PQModel", "train_pq", "pq_encode", "pq_decode", "pq_topk",
    "ivf_pq_index", "ivf_pq_topk",
    "write_pq_model", "read_pq_model",
    "write_ivf_pq_index", "read_ivf_pq_index",
    "SQModel", "train_sq", "sq_encode", "sq_decode", "sq_topk",
    "write_sq_model", "read_sq_model",
    "ivf_sq_index", "ivf_sq_topk",
]


@dataclass
class PQModel:
    """``codebooks[j]`` is the j-th subspace's ``k_sub × (d/m)``
    codeword list; ``d = m · dsub``."""

    codebooks: list  # m × k_sub × dsub floats
    d: int

    @property
    def m(self) -> int:
        return len(self.codebooks)

    @property
    def k_sub(self) -> int:
        return len(self.codebooks[0])

    @property
    def dsub(self) -> int:
        return self.d // self.m


def _sqdist(x: Column, y: Column) -> Column:
    """Plain squared L2 between two equal-length array columns."""
    return F.aggregate(
        F.zip_with(x, y, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _sub(vec: Column, j: int, dsub: int) -> Column:
    return F.slice(vec, j * dsub + 1, dsub)


def _codeword_dists(subv: Column, cb_lit: Column) -> Column:
    """array<double> of squared L2 from ``subv`` to every codeword.
    The HOF lambda takes ONE parameter on purpose: pyspark passes
    (element, index) to two-parameter lambdas — defaults included —
    so binding the subvector must happen via this closure, not a
    default argument."""
    return F.transform(cb_lit, lambda c: _sqdist(subv, c))


def train_pq(
    df: DataFrame,
    m: int = 8,
    k_sub: int = 256,
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
    initial_codebooks=None,
) -> PQModel:
    """Train per-subspace codebooks with the engine's own k-means.

    ``m`` must divide the vector dimension. ``initial_codebooks`` +
    ``max_iter=0`` pins the codebooks (deterministic replays / loading
    a previously trained model); otherwise each subspace runs a
    distributed SE fit. Train on a hash sample at scale — codebook
    quality saturates far below corpus size.
    """
    from ..kmeans import GeneralizedKMeans

    first = (df.where(F.col(vec_col).isNotNull())
             .select(F.size(vec_col).alias("n")).first())
    if first is None:
        raise ValueError("train_pq: empty input")
    d = first["n"]
    if d % m != 0:
        raise ValueError(f"m={m} must divide vector dim {d}")
    dsub = d // m
    # train on present vectors only; encode stays NULL-preserving
    base = (df.where(F.col(vec_col).isNotNull())
            .select(F.col(vec_col).cast("array<double>").alias("_v")))
    codebooks = []
    for j in range(m):
        init = None if initial_codebooks is None else initial_codebooks[j]
        sub = base.select(_sub(F.col("_v"), j, dsub).alias("_s"))
        model = GeneralizedKMeans(
            k=k_sub, divergence="se", seed=seed + j, max_iter=max_iter,
            features_col="_s", initial_centers=init,
        ).fit(sub)
        codebooks.append([[float(x) for x in c] for c in model.centers])
    return PQModel(codebooks=codebooks, d=d)


def pq_encode(
    df: DataFrame,
    model: PQModel,
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """Add ``codes``: array<int> of length m, ``codes[j]`` = index of
    the nearest codeword in subspace j (squared L2, first-index-wins).
    One map-only projection; the codebooks ride as expression literals
    (model state, m·k_sub·dsub doubles — never data)."""
    v = F.col(vec_col).cast("array<double>")
    codes = []
    for j, cb in enumerate(model.codebooks):
        cb_lit = F.array(*[array_lit(c) for c in cb])
        dists = _codeword_dists(_sub(v, j, model.dsub), cb_lit)
        codes.append(
            (F.array_position(dists, F.array_min(dists)) - 1).cast("int"))
    return df.withColumn(code_col, F.array(*codes))


def pq_decode(
    df: DataFrame,
    model: PQModel,
    code_col: str = "codes",
    out_col: str = "reconstruction",
) -> DataFrame:
    """Reconstruct the quantized vector (concatenated codewords) —
    for distortion measurement; ADC search never decodes."""
    parts = [
        F.element_at(
            F.array(*[array_lit(c) for c in cb]),
            F.element_at(F.col(code_col), j + 1) + 1,
        )
        for j, cb in enumerate(model.codebooks)
    ]
    return df.withColumn(out_col, F.concat(*parts))


def _guard_brute_queries(
    queries: DataFrame,
    max_broadcast_queries: int | None,
    n_queries: int | None,
    fn_name: str,
    advice: str,
) -> None:
    """Warn when the query side of a brute top-k is too big to
    broadcast-and-score. With ``n_queries`` (a caller-supplied size
    hint) the check is free; otherwise it runs ONE ``limit(n+1)``
    count job on the query side — which also re-evaluates the query
    frame's lineage if it is an expensive unpersisted subquery. Pass
    ``n_queries`` or ``max_broadcast_queries=None`` to avoid that."""
    if max_broadcast_queries is None:
        return
    if n_queries is not None:
        probe = int(n_queries)
    else:
        probe = queries.limit(max_broadcast_queries + 1).count()
    if probe > max_broadcast_queries:
        import warnings

        warnings.warn(
            f"{fn_name}: query side exceeds {max_broadcast_queries} "
            f"rows — the brute path scores |corpus| x |queries| "
            f"candidates with no pruning. {advice}, or raise "
            "max_broadcast_queries to acknowledge the cost.",
            stacklevel=3,
        )


def pq_topk(
    encoded: DataFrame,
    model: PQModel,
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
    """ADC top-k: ``(query_id, neighbor_id, approx_dist, rank)`` by
    ascending approximate squared L2. ``where`` pre-filters candidates
    (Column or SQL string over ``encoded``'s columns) so k survives
    metadata filtering.

    The per-query ``m × k_sub`` lookup tables are staged as ONE
    query-side projection (computed once per query, not per
    candidate), the join broadcasts the query side, and scoring is an
    ``aggregate`` over ``zip_with(codes, tables)`` — pure JVM
    expressions over the m-byte codes; full vectors are only read on
    the query side.

    This is the BRUTE path: every corpus code is scored against every
    query (|corpus| × |queries| work, no pruning) — intended for
    broadcast-small query sets. A query table larger than
    ``max_broadcast_queries`` raises a warning pointing to
    :func:`ivf_pq_topk` (the nprobe-pruned scale path). The probe
    costs one extra ``limit(n+1)`` count JOB per call (and recomputes
    the query frame's lineage if it is unpersisted) — pass the
    ``n_queries`` size hint when the caller already knows the count,
    or ``max_broadcast_queries=None`` to skip the guard entirely."""
    _guard_brute_queries(
        queries, max_broadcast_queries, n_queries, "pq_topk",
        "Use ivf_pq_topk (nprobe-pruned lists) for large query tables")
    from .similarity import _candidate_filter

    encoded = _candidate_filter(encoded, where)
    qv = F.col(vec_col).cast("array<double>")
    luts = F.array(*[
        _codeword_dists(
            _sub(qv, j, model.dsub),
            F.array(*[array_lit(c) for c in cb]),
        )
        for j, cb in enumerate(model.codebooks)
    ])
    q = queries.select(
        F.col(id_col).alias("query_id"), luts.alias("_luts"))
    cand = encoded.select(
        F.col(id_col).alias("neighbor_id"), code_col
    ).crossJoin(F.broadcast(q))
    if exclude_self:
        cand = cand.where(F.col("neighbor_id") != F.col("query_id"))
    score = F.aggregate(
        F.zip_with(
            F.col(code_col), F.col("_luts"),
            lambda cd, lut: F.element_at(lut, cd + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc("neighbor_id"))
    return (
        cand.withColumn("approx_dist", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rank")
    )


def write_pq_model(spark, model: PQModel, path: str,
                   mode: str = "overwrite") -> None:
    """Persist codebooks through the shared checksummed sidecar layout
    (``sources/sidecar.py`` — sha256-verified on read, written THROUGH
    Spark so it lands on the data's filesystem): train once on a
    sample job, encode/serve from any later job."""
    from ..sources.sidecar import write_model_sidecar

    write_model_sidecar(spark, path, "pq_codebooks", {
        "m": int(model.m),
        "k_sub": int(model.k_sub),
        "d": int(model.d),
        "codebooks": [[[float(x) for x in c] for c in cb]
                      for cb in model.codebooks],
    }, mode=mode)


def read_pq_model(spark, path: str) -> PQModel:
    """Load a :func:`write_pq_model` sidecar (shared checksummed
    layout; pre-r7 bespoke 1-row JSON still readable)."""
    from ..sources.sidecar import read_model_sidecar

    try:
        p = read_model_sidecar(spark, path, "pq_codebooks")
    except ValueError as e:
        if "not a shared-layout sidecar" not in str(e):
            raise
        row = spark.read.json(path).first()  # legacy pre-r7 layout
        p = row.asDict()
    return PQModel(
        codebooks=[[[float(x) for x in c] for c in cb]
                   for cb in p["codebooks"]],
        d=int(p["d"]),
    )


def ivf_pq_index(
    corpus: DataFrame,
    n_lists: int = 64,
    m: int = 8,
    k_sub: int = 256,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    coarse_max_iter: int = 10,
    pq_max_iter: int = 10,
    initial_coarse=None,
    initial_codebooks=None,
    coarse_assignment_strategy: str = "auto",
):
    """IVF-PQ index (Faiss-style, residual-encoded): coarse SE k-means
    buckets the corpus into ``n_lists`` inverted lists, then PQ
    codebooks are trained on the RESIDUALS ``v - centroid`` (residual
    energy is what is left to quantize once the coarse step has
    explained the bucket mean — the standard accuracy win over coding
    raw vectors). Both trainers are this engine's own distributed
    GeneralizedKMeans; pin ``initial_coarse``/``initial_codebooks``
    with the ``*_max_iter=0`` convention for deterministic replays.

    Returns ``(encoded, coarse_model, pq_model)`` where ``encoded`` is
    ``(id, _list, codes)`` — m code slots per vector instead of d·4
    bytes. Persist it partitioned by ``_list`` (the
    :func:`~.similarity.write_ivf_index` layout): at 100 TB a probe
    reads nprobe/n_lists of the files and m bytes per candidate.
    """
    from ..kmeans import GeneralizedKMeans

    base = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    coarse = GeneralizedKMeans(
        k=n_lists, divergence="se", seed=seed, max_iter=coarse_max_iter,
        features_col="_v", prediction_col="_list",
        initial_centers=initial_coarse,
        assignment_strategy=coarse_assignment_strategy,
    ).fit(base)
    indexed = coarse.transform(base)
    # non-nullable _list (r13): stops every downstream equi-join on
    # _list from inferring IsNotNull and re-inlining the coarse
    # assignment below the encode projection (see
    # similarity.ivf_index). F.get is 0-based and returns NULL for the
    # -1 sentinel instead of element_at's index error — null vectors
    # keep their null residual/codes exactly as before.
    indexed = indexed.withColumn(
        "_list", F.coalesce(F.col("_list"), F.lit(-1)))
    centers_lit = F.array(*[array_lit(c) for c in coarse.centers.tolist()])
    resid = F.zip_with(
        F.col("_v"),
        F.get(centers_lit, F.col("_list")),
        lambda a, b: a - b,
    )
    with_res = indexed.withColumn("_r", resid)
    pq = train_pq(
        with_res, m=m, k_sub=k_sub, vec_col="_r", seed=seed,
        max_iter=pq_max_iter, initial_codebooks=initial_codebooks,
    )
    encoded = pq_encode(with_res, pq, vec_col="_r").select(
        id_col, "_list", "codes")
    return encoded, coarse, pq


def ivf_pq_topk(
    encoded: DataFrame,
    coarse_model,
    pq_model: PQModel,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    broadcast_queries: bool = True,
    where=None,
) -> DataFrame:
    """ADC top-k through the inverted lists: probe the ``nprobe``
    nearest coarse centroids per query (squared L2), build the lookup
    tables from the per-list QUERY RESIDUAL ``q - centroid`` (so the
    additive score approximates ``|q - v|²`` exactly as in residual
    IVF-PQ: ``q - v = (q - c) - (v - c)`` with ``v - c`` quantized),
    and score candidates by m lookups — corpus vectors are never read.

    The probe side (nprobe rows × m·k_sub lookup doubles per query) is
    broadcast into an equi-join on ``_list``, which prunes to the
    probed partitions when ``encoded`` is stored partitioned by
    ``_list``. Set ``broadcast_queries=False`` for a large query table
    — the join then shuffles both sides on ``_list``.

    ``where`` (Column or SQL string over the columns of ``encoded``)
    PRE-filters candidates before the probe join and the top-k window
    so k survives metadata filtering (see
    :func:`~.similarity.ivf_topk`).
    """
    from .similarity import _candidate_filter

    encoded = _candidate_filter(encoded, where)
    C = coarse_model.centers
    centers_lit = F.array(*[array_lit(c) for c in C.tolist()])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"))
    cd = F.transform(centers_lit, lambda c: _sqdist(F.col("_qv"), c))
    # top-nprobe lists as a MAP-ONLY array expression (r12): ascending
    # struct sort on (_cdist, _list) == the old row_number rank over
    # (_cdist ASC, _list ASC); ties fall to list identically (SQL
    # double ordering). Removes the posexplode + Window shuffle of the
    # query side — with broadcast_queries=False that was a full
    # query-table Exchange+Sort just to rank n_lists numbers per row.
    keyed = F.transform(
        cd, lambda s, i: F.struct(s.alias("d"), i.alias("l")))
    probes = (
        q.select("query_id", "_qv",
                 F.explode(F.slice(F.array_sort(keyed), 1, nprobe))
                 .alias("_p"))
        .select("query_id", F.col("_p.l").alias("_list"), "_qv")
    )
    qres = F.zip_with(
        F.col("_qv"),
        F.element_at(centers_lit, F.col("_list") + 1),
        lambda a, b: a - b,
    )
    luts = F.array(*[
        _codeword_dists(
            _sub(F.col("_qr"), j, pq_model.dsub),
            F.array(*[array_lit(c) for c in cb]),
        )
        for j, cb in enumerate(pq_model.codebooks)
    ])
    staged = (
        probes.withColumn("_qr", qres)
        .withColumn("_luts", luts)
        .select("query_id", "_list", "_luts")
    )
    if broadcast_queries:
        staged = F.broadcast(staged)
    cand = encoded.join(staged, on="_list")
    if exclude_self:
        cand = cand.where(F.col(id_col) != F.col("query_id"))
    score = F.aggregate(
        F.zip_with(
            F.col("codes"), F.col("_luts"),
            lambda cd_, lut: F.element_at(lut, cd_ + 1),
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc(id_col))
    return (
        cand.withColumn("approx_dist", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", F.col(id_col).alias("neighbor_id"),
                "approx_dist", "rank")
    )


def write_ivf_pq_index(encoded: DataFrame, coarse_model, pq_model: PQModel,
                       path: str, mode: str = "overwrite") -> None:
    """Persist an :func:`ivf_pq_index` for serving: the ``(id, _list,
    codes)`` frame as parquet PARTITIONED BY ``_list`` (probe joins
    prune to the probed partitions — nprobe/n_lists of the files, m
    bytes per candidate) plus the coarse centroids and PQ codebooks as
    checksummed sidecars. Train once on a sample job; encode + write
    once; serve from any later job via :func:`read_ivf_pq_index`."""
    from ..sources.sidecar import write_model_sidecar

    encoded.write.mode(mode).partitionBy("_list").parquet(f"{path}/codes")
    write_model_sidecar(
        encoded.sparkSession, f"{path}/coarse", "ivf_centroids", {
            "n_lists": int(len(coarse_model.centers)),
            "dim": int(coarse_model.centers.shape[1]),
            "kernel": coarse_model.kernel_name,
            "centers": [[float(v) for v in c]
                        for c in coarse_model.centers],
        }, mode=mode)
    write_pq_model(encoded.sparkSession, pq_model, f"{path}/pq", mode=mode)


def read_ivf_pq_index(spark, path: str):
    """Load a :func:`write_ivf_pq_index` layout. Returns ``(encoded,
    coarse_model, pq_model)`` ready for :func:`ivf_pq_topk`; probes on
    the partitioned ``_list`` column prune at the parquet scan."""
    from ..kmeans import GeneralizedKMeansModel
    from ..sources.sidecar import read_model_sidecar

    p = read_model_sidecar(spark, f"{path}/coarse", "ivf_centroids")
    coarse = GeneralizedKMeansModel(
        centers=[list(c) for c in p["centers"]], kernel_name=p["kernel"],
        features_col="_v", prediction_col="_list",
    )
    pq = read_pq_model(spark, f"{path}/pq")
    return spark.read.parquet(f"{path}/codes"), coarse, pq


# --------------------------------------------------------------------------
# Scalar quantization (SQ8) — the zero-training memory-scale path
# --------------------------------------------------------------------------

@dataclass
class SQModel:
    """Per-dimension affine int8 quantizer: ``code_i = round((x_i −
    mins[i]) · 255 / (maxs[i] − mins[i]))`` clamped to [0, 255];
    decode is ``mins[i] + code_i · (maxs[i] − mins[i]) / 255``.
    Model state is 2·d doubles — the smallest model in the ANN layer."""

    mins: list
    maxs: list

    @property
    def d(self) -> int:
        return len(self.mins)

    def _params_lit(self) -> Column:
        """array<struct<mn, s, inv>> literal: s is the encode scale
        (255/range, 0 for a constant dimension so its code pins to 0)
        and inv the decode step (range/255)."""
        entries = []
        for mn, mx in zip(self.mins, self.maxs):
            rng = mx - mn
            s = 255.0 / rng if rng > 0 else 0.0
            inv = rng / 255.0
            entries.append(F.struct(
                F.lit(float(mn)).alias("mn"),
                F.lit(float(s)).alias("s"),
                F.lit(float(inv)).alias("inv"),
            ))
        return F.array(*entries)


def train_sq(
    df: DataFrame, vec_col: str = "embedding"
) -> SQModel:
    """Per-dimension [min, max] over the corpus — ONE
    posexplode + groupBy(dim) agg (d result rows of model state; the
    shuffle carries d keys, map-side combined). SQ8 (Faiss
    ``ScalarQuantizer`` QT_8bit shape) trades PQ's trained codebooks
    for a training-free 4× compression with per-dim resolution —
    the right first rung before PQ's 16-32×."""
    rows = (
        df.select(F.posexplode(F.col(vec_col).cast("array<double>"))
                  .alias("_i", "_x"))
        .groupBy("_i")
        .agg(F.min("_x").alias("mn"), F.max("_x").alias("mx"))
        .orderBy("_i")
        .collect()
    )
    if not rows:
        raise ValueError("train_sq: empty input")
    return SQModel(mins=[r["mn"] for r in rows],
                   maxs=[r["mx"] for r in rows])


def sq_encode(
    df: DataFrame,
    model: SQModel,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    code_col: str = "codes",
) -> DataFrame:
    """``(id, codes: array<int>)`` — map-only projection (store the
    codes column as 1-byte values at rest; parquet's integer encoding
    already collapses the 0-255 range). ``floor(x·s + 0.5)`` is used
    instead of engine-native round so the DuckDB oracle twin is
    bit-identical."""
    p = model._params_lit()
    codes = F.zip_with(
        F.col(vec_col).cast("array<double>"),
        p,
        lambda x, q: F.greatest(
            F.lit(0),
            F.least(
                F.lit(255),
                F.floor((x - q["mn"]) * q["s"] + F.lit(0.5)).cast("int"),
            ),
        ),
    )
    return df.select(F.col(id_col), codes.alias(code_col))


def sq_decode(
    encoded: DataFrame,
    model: SQModel,
    id_col: str = "vec_id",
    code_col: str = "codes",
    vec_col: str = "vector",
) -> DataFrame:
    """Reconstruct approximate vectors from codes (map-only)."""
    p = model._params_lit()
    dec = F.zip_with(
        F.col(code_col), p, lambda c, q: q["mn"] + c * q["inv"]
    )
    return encoded.select(F.col(id_col), dec.alias(vec_col))


def sq_topk(
    encoded: DataFrame,
    model: SQModel,
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
    """Asymmetric top-k over SQ codes: ``(query_id, neighbor_id,
    approx_dist, rank)`` by ascending approximate squared L2 (decoded
    corpus point vs full-precision query).

    The decode is staged ONCE as a corpus-side projection (query-
    independent, unlike PQ's per-query LUTs), then the broadcast-
    small query side cross-joins in and the score is one
    ``aggregate``/``zip_with`` fold — d multiplies per candidate
    (PQ pays m lookups; SQ pays d FLOPs but zero training and exact
    per-dim resolution). Brute path: |corpus| × |queries| with no
    pruning — the same ``max_broadcast_queries`` guard as
    :func:`pq_topk` warns on large query tables (one extra count job
    unless the ``n_queries`` size hint is passed). ``where``
    pre-filters candidates so k survives metadata filtering."""
    _guard_brute_queries(
        queries, max_broadcast_queries, n_queries, "sq_topk",
        "Prune with an IVF list join first (ivf_sq_topk)")
    from .similarity import _candidate_filter

    encoded = _candidate_filter(encoded, where)
    staged = sq_decode(
        encoded, model, id_col=id_col, code_col=code_col,
        vec_col="_dec",
    ).withColumnRenamed(id_col, "neighbor_id")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    cand = staged.crossJoin(F.broadcast(q))
    if exclude_self:
        cand = cand.where(F.col("neighbor_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc("neighbor_id"))
    return (
        cand.withColumn("approx_dist", _sqdist(F.col("_dec"), F.col("_qv")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "approx_dist", "rank")
    )


def write_sq_model(spark, model: SQModel, path: str) -> None:
    """Persist through the shared checksummed sidecar layout."""
    from ..sources.sidecar import write_model_sidecar

    write_model_sidecar(
        spark, path, "sq",
        {"mins": [float(v) for v in model.mins],
         "maxs": [float(v) for v in model.maxs]},
    )


def read_sq_model(spark, path: str) -> SQModel:
    from ..sources.sidecar import read_model_sidecar

    payload = read_model_sidecar(spark, path, "sq")
    return SQModel(mins=payload["mins"], maxs=payload["maxs"])


def ivf_sq_index(
    corpus: DataFrame,
    n_lists: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    coarse_max_iter: int = 10,
    initial_coarse=None,
    coarse_assignment_strategy: str = "auto",
):
    """IVF-SQ index: coarse SE k-means buckets the corpus into
    ``n_lists`` inverted lists, then the RESIDUALS ``v − centroid``
    are scalar-quantized (:func:`train_sq` on the residual frame —
    residual ranges are much tighter than raw ranges, so the 8-bit
    step shrinks exactly where the coarse step has already explained
    the bucket mean). The middle rung of the quantization matrix:
    more accurate than raw SQ8 at the same 4× compression, no
    codebook training beyond the coarse fit.

    Returns ``(encoded, coarse_model, sq_model)`` with ``encoded`` =
    ``(id, _list, codes)``. Persist partitioned by ``_list`` for
    partition-pruned probes.
    """
    from ..kmeans import GeneralizedKMeans

    base = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v"))
    coarse = GeneralizedKMeans(
        k=n_lists, divergence="se", seed=seed, max_iter=coarse_max_iter,
        features_col="_v", prediction_col="_list",
        initial_centers=initial_coarse,
        assignment_strategy=coarse_assignment_strategy,
    ).fit(base)
    indexed = coarse.transform(base)
    # non-nullable _list + F.get — see ivf_pq_index (r13)
    indexed = indexed.withColumn(
        "_list", F.coalesce(F.col("_list"), F.lit(-1)))
    centers_lit = F.array(*[array_lit(c) for c in coarse.centers.tolist()])
    resid = F.zip_with(
        F.col("_v"),
        F.get(centers_lit, F.col("_list")),
        lambda a, b: a - b,
    )
    with_res = indexed.withColumn("_r", resid)
    sq = train_sq(with_res, vec_col="_r")
    encoded = sq_encode(with_res, sq, id_col=id_col, vec_col="_r") \
        .join(indexed.select(id_col, "_list"), on=id_col) \
        .select(id_col, "_list", "codes")
    return encoded, coarse, sq


def ivf_sq_topk(
    encoded: DataFrame,
    coarse_model,
    sq_model: SQModel,
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = True,
    broadcast_queries: bool = True,
    where=None,
) -> DataFrame:
    """Asymmetric top-k through the inverted lists: probe the
    ``nprobe`` nearest coarse centroids per query, decode candidate
    residuals map-only, and score ``|(q − c) − decode(codes)|²`` —
    the residual identity ``q − v = (q − c) − (v − c)`` with
    ``v − c`` scalar-quantized. The probe side (nprobe rows × d
    doubles per query) is broadcast into the ``_list`` equi-join
    (partition-pruned when ``encoded`` is stored by ``_list``);
    ``broadcast_queries=False`` shuffles both sides on ``_list`` for
    large query tables. ``where`` pre-filters candidates (Column or
    SQL string over ``encoded``'s columns) so k survives metadata
    filtering (see :func:`~.similarity.ivf_topk`)."""
    from .similarity import _candidate_filter

    encoded = _candidate_filter(encoded, where)
    C = coarse_model.centers
    centers_lit = F.array(*[array_lit(c) for c in C.tolist()])
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"))
    cd = F.transform(centers_lit, lambda c: _sqdist(F.col("_qv"), c))
    # map-only top-nprobe (r12): same array_sort probe selection as
    # ivf_pq_topk — see the comment there; removes the query-side
    # Exchange+Sort the old posexplode + Window paid.
    keyed = F.transform(
        cd, lambda s, i: F.struct(s.alias("d"), i.alias("l")))
    qres = F.zip_with(
        F.col("_qv"),
        F.element_at(centers_lit, F.col("_list") + 1),
        lambda a, b: a - b,
    )
    probes = (
        q.select("query_id", "_qv",
                 F.explode(F.slice(F.array_sort(keyed), 1, nprobe))
                 .alias("_p"))
        .select("query_id", F.col("_p.l").alias("_list"), "_qv")
        .withColumn("_qr", qres)
        .select("query_id", "_list", "_qr")
    )
    if broadcast_queries:
        probes = F.broadcast(probes)
    p = sq_model._params_lit()
    dec = F.zip_with(F.col("codes"), p, lambda c, q_: q_["mn"] + c * q_["inv"])
    cand = encoded.withColumn("_dec", dec).join(probes, on="_list")
    if exclude_self:
        cand = cand.where(F.col(id_col) != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.asc("approx_dist"), F.asc(id_col))
    return (
        cand.withColumn("approx_dist", _sqdist(F.col("_dec"), F.col("_qr")))
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", id_col, "approx_dist", "rank")
        .withColumnRenamed(id_col, "neighbor_id")
    )
