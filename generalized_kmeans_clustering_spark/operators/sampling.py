"""Deterministic corpus sampling for training-data curation.

Engine extensions (driver mandate: large-scale training-data pipeline
operators). A training mix is specified as per-stratum (language,
domain, source, …) sampling rates or TOKEN BUDGETS; this module turns
that into a reproducible, content-addressed sample:

- keep/drop is a pure function of ``hash(id, seed)`` — the same rows
  are kept on every run, any partitioning, any cluster size, and any
  engine (``hash_fn="md5"`` is bit-identical in DuckDB for oracle
  checks). ``df.sample()`` gives none of these: its RNG draws depend
  on partition layout.
- everything is expression-only (map-side filter); the only job that
  touches the driver is the per-stratum token-sum in
  :func:`token_budget_sample` (k strata rows).

At 100 TB: :func:`sample_hash` / :func:`stratified_sample_hash` are
shuffle-free scans with the filter pushed at the scan when the id and
stratum columns are top-level parquet columns; ``token_budget_sample``
adds ONE map-side-combined aggregation keyed on the stratum.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hash_key",
    "bernoulli_keep",
    "cap_per_group",
    "sample_hash",
    "split_assign",
    "stratified_sample_hash",
    "token_budget_sample",
    "temperature_budgets",
    "temperature_sample",
    "interleave_shards",
    "curriculum_shards",
]

#: denominator of the keep predicate: hash-bucket ∈ [0, _SCALE) and a
#: fraction f keeps buckets < f·_SCALE — so fractions are honored to
#: 1e-6 granularity
_SCALE = 1_000_000


def hash_key(id_col: Column, seed: int, hash_fn: str = "xxhash64") -> Column:
    """int64 hash of ``(id, seed)`` — deterministic and
    partitioning-independent; the shared primitive behind hash
    sampling here and the shard/order keys in
    :mod:`operators.packing`. ``md5`` mode (non-negative, 60-bit) is
    engine-portable — the DuckDB oracle's ``_MD5INT`` computes the
    identical value; ``xxhash64`` is the fastest JVM-side production
    path."""
    s = F.concat_ws("|", id_col.cast("string"), F.lit(str(seed)))
    if hash_fn == "xxhash64":
        return F.xxhash64(s)
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    raise ValueError(f"hash_fn: xxhash64 | md5, got {hash_fn!r}")


def _bucket(id_col: Column, seed: int, hash_fn: str) -> Column:
    """Uniform bucket in [0, _SCALE) from (id, seed)."""
    return F.pmod(hash_key(id_col, seed, hash_fn), F.lit(_SCALE))


def sample_hash(
    df: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Reproducible Bernoulli(fraction) sample keyed on the id column.

    Disjointness: samples with the same seed nest (fraction 0.1 ⊆
    fraction 0.2), and different seeds are independent — so a held-out
    split is ``sample_hash(df, f, seed=a)`` vs its complement, never a
    second RNG draw.
    """
    if not (0.0 <= fraction <= 1.0):
        raise ValueError("fraction in [0, 1]")
    return df.where(
        _bucket(F.col(id_col), seed, hash_fn) < int(fraction * _SCALE)
    )


def stratified_sample_hash(
    df: DataFrame,
    fractions: dict,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Per-stratum reproducible sampling: ``fractions`` maps stratum
    value → keep fraction; strata not listed keep ``default_fraction``
    (0 = drop, 1 = keep all). One expression-only filter — the
    fraction lookup is a CASE chain over the (small) fractions dict.
    """
    for v in fractions.values():
        if not (0.0 <= v <= 1.0):
            raise ValueError("every fraction in [0, 1]")
    thresh = F.lit(int(default_fraction * _SCALE))
    for value, frac in sorted(fractions.items(), key=lambda kv: str(kv[0])):
        thresh = F.when(
            F.col(strata_col) == F.lit(value), F.lit(int(frac * _SCALE))
        ).otherwise(thresh)
    return df.where(_bucket(F.col(id_col), seed, hash_fn) < thresh)


def token_budget_sample(
    df: DataFrame,
    budgets: dict,
    strata_col: str = "lang",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
    keep_unlisted: bool = False,
) -> DataFrame:
    """Sample each stratum down to a TOKEN budget — the way a training
    mix is actually specified ("100 B tokens of en, 30 B of de, …").

    One aggregation computes per-stratum token totals (k strata rows to
    the driver); the keep fraction per stratum is
    ``min(1, budget / total)`` and the sample itself is the same
    deterministic hash filter as :func:`stratified_sample_hash`, so the
    realized token count concentrates around the budget (exact in
    expectation; relative error ~1/√n_docs per stratum).

    Strata without a budget are dropped unless ``keep_unlisted``.
    """
    totals = {
        r["s"]: r["t"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.sum(token_col).alias("t")).collect()
    }
    fractions = {}
    for stratum, budget in budgets.items():
        # sum() aggregates to NULL (None) when every token value in the
        # stratum is NULL — treat as zero tokens, same as absent
        total = totals.get(stratum) or 0
        fractions[stratum] = 1.0 if total <= budget else budget / total
    return stratified_sample_hash(
        df, fractions, strata_col=strata_col, id_col=id_col,
        default_fraction=1.0 if keep_unlisted else 0.0,
        seed=seed, hash_fn=hash_fn,
    )


def temperature_budgets(
    totals: dict, alpha: float, total_budget: int
) -> dict:
    """Allocate a total token budget across strata by temperature
    sampling (the multilingual-LM mixing rule, e.g. mT5/XLM-R):
    ``p_s ∝ totals[s] ** alpha``, budget_s = p_s · total_budget.
    ``alpha=1`` is proportional (no rebalancing); ``alpha→0`` is
    uniform; the usual range is 0.2-0.7 to up-weight low-resource
    strata. Pure driver math over k strata rows."""
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    powered = {s: (t or 0) ** alpha for s, t in totals.items() if (t or 0) > 0}
    # fold in sorted-stratum order: float addition is order-sensitive
    # and `totals` arrives in collect() order — keep the normalizer
    # bit-reproducible across runs (and mirrorable by the SQL twin)
    z = sum(powered[s] for s in sorted(powered, key=str))
    if z == 0:
        return {s: 0 for s in totals}
    return {s: p / z * total_budget for s, p in powered.items()}


def temperature_sample(
    df: DataFrame,
    alpha: float,
    total_budget: int,
    strata_col: str = "lang",
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """One-call temperature-mixed sample: per-stratum token totals
    (one map-side-combined agg, k rows to the driver) →
    :func:`temperature_budgets` → the deterministic hash filter of
    :func:`stratified_sample_hash`.

    Downsampling only: a stratum whose temperature share exceeds its
    actual tokens keeps everything (fraction capped at 1) — hash
    sampling cannot replicate rows. True up-sampling of small strata
    is an epoch-schedule concern: repeat the stratum across epochs via
    :func:`interleave_shards` with per-epoch seeds.
    """
    totals = {
        r["s"]: r["t"]
        for r in df.groupBy(F.col(strata_col).alias("s"))
        .agg(F.sum(token_col).alias("t")).collect()
    }
    budgets = temperature_budgets(totals, alpha, total_budget)
    fractions = {}
    for stratum, budget in budgets.items():
        total = totals.get(stratum) or 0
        fractions[stratum] = 1.0 if total <= budget else budget / total
    return stratified_sample_hash(
        df, fractions, strata_col=strata_col, id_col=id_col,
        default_fraction=0.0, seed=seed, hash_fn=hash_fn,
    )


def interleave_shards(
    df: DataFrame,
    num_shards: int = 1024,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Deterministic global training order — the "epoch shuffle".

    Adds ``(shard, pos)``: each row lands in ``shard =
    hash(id, seed) % num_shards`` and ``pos`` numbers the shard's rows
    in ``(hash(id, seed), id)`` order (1-based). Reading shards
    round-robin (or ``ORDER BY pos, shard``) yields a reproducible
    pseudo-random interleave of the corpus — same order on every run,
    any partitioning, any cluster size — unlike ``orderBy(rand())``,
    whose draw depends on the partition layout. A new ``seed`` is a
    new epoch order.

    The same ``(hash, id)`` key orders :func:`~.packing.pack_concat`'s
    shard streams, so interleave → pack is one consistent layout: a
    doc's interleave position and its packed sequence agree.

    At 100 TB: ONE shuffle keyed on the shard (the window numbering);
    writing with ``partitionBy(shard)`` makes each shard's order a
    plain ``ORDER BY pos`` scan at training time.
    """
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    from pyspark.sql.window import Window

    key = hash_key(F.col(id_col), seed, hash_fn)
    staged = df.withColumn("_key", key).withColumn(
        shard_col, F.pmod(F.col("_key"), F.lit(num_shards)).cast("int")
    )
    w = Window.partitionBy(shard_col).orderBy("_key", id_col)
    return staged.withColumn(
        pos_col, F.row_number().over(w).cast("long")
    ).drop("_key")


def curriculum_shards(
    df: DataFrame,
    score_col: str,
    num_shards: int = 1024,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
    ascending: bool = False,
    shard_col: str = "shard",
    pos_col: str = "pos",
) -> DataFrame:
    """Curriculum ordering: like :func:`interleave_shards`, but within
    each hash shard the position follows ``score_col`` (descending by
    default — highest quality first; ``ascending=True`` for
    easy-to-hard schedules on e.g. a perplexity column). Shard
    membership stays hash-random, so reading shards round-robin
    yields a global order that interleaves sources while trending
    along the score — the standard curriculum/annealing layout
    without a full global sort: ONE shuffle keyed on the shard,
    ties broken by id for determinism."""
    if num_shards <= 0:
        raise ValueError("num_shards must be positive")
    from pyspark.sql.window import Window

    key = hash_key(F.col(id_col), seed, hash_fn)
    staged = df.withColumn(
        shard_col, F.pmod(key, F.lit(num_shards)).cast("int"))
    order = (F.asc(score_col) if ascending else F.desc(score_col))
    w = Window.partitionBy(shard_col).orderBy(order, F.asc(id_col))
    return staged.withColumn(
        pos_col, F.row_number().over(w).cast("long"))


def cap_per_group(
    df: DataFrame,
    cap: int,
    group_col: str = "source",
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
    order_cols=None,
) -> DataFrame:
    """Keep at most ``cap`` rows per group — the RefinedWeb/CC
    per-domain cap that stops one mega-site from dominating the mix.

    Default order is ``(hash(id, seed), id)``: a uniform,
    reproducible, partitioning-independent subset (same contract as
    :func:`sample_hash`, and caps with the same seed nest — cap 100 ⊆
    cap 1000). Pass ``order_cols`` (e.g. ``[F.desc("quality"),
    F.asc("doc_id")]``) to keep the BEST rows instead of a random
    subset; make the order total (id tiebreak) or survivors depend on
    partitioning.

    One shuffle on the group key; the ``row_number ≤ cap`` filter is
    recognized by Spark 4's WindowGroupLimit, so each input partition
    forwards at most ``cap`` rows per group into the exchange — a
    skewed mega-group never materializes on one reducer beyond the
    cap.
    """
    from pyspark.sql.window import Window

    if cap <= 0:
        raise ValueError("cap must be positive")
    order = order_cols or [
        hash_key(F.col(id_col), seed, hash_fn).asc(),
        F.col(id_col).asc(),
    ]
    w = Window.partitionBy(group_col).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )


def split_assign(
    df: DataFrame,
    splits: dict,
    id_col: str = "doc_id",
    group_col: str | None = None,
    components: DataFrame | None = None,
    split_col: str = "split",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Leakage-safe train/val/test split: adds ``split_col`` with the
    name of the split each row belongs to.

    ``splits`` maps split name → fraction (insertion order matters;
    fractions must sum to 1 within 1e-6). The assignment is a pure
    function of ``hash(group_key, seed)``, where the group key is, in
    precedence order:

    - the ``components`` frame's ``(id, component)`` mapping (the
      output of :func:`~.dedup.duplicate_components`): every member of
      a duplicate component shares the component's key, so NEAR-DUP
      COPIES OF A DOCUMENT CAN NEVER STRADDLE TRAIN AND TEST — the
      split-contamination failure exact row-level splitting cannot
      prevent. Ids absent from ``components`` are their own singleton
      group (same coalesce rule as
      :func:`~.dedup.canonical_duplicates`).
    - ``group_col`` — split by an existing grouping (source domain,
      url host, repository, …) so correlated documents co-travel.
    - ``id_col`` — plain row-level hash split.

    Properties (all inherited from the hash-interval construction):
    splits are disjoint and exhaustive (the last split absorbs the
    rounding remainder); re-runs, repartitions and engines agree
    (``hash_fn="md5"`` is bit-identical in DuckDB); and growing one
    split's fraction at the same seed only MOVES BOUNDARY BUCKETS —
    e.g. train 0.8 at the same seed contains train 0.6's members, so
    scaling up a training set never silently reshuffles what the old
    split saw.

    At 100 TB: with ``group_col``/``id_col`` this is an expression-only
    map-side tag (no shuffle, no job); the ``components`` path adds one
    left join against a frame that is ≪ corpus-sized (only ids touched
    by a duplicate pair).
    """
    if not splits:
        raise ValueError("splits must name at least one split")
    fracs = list(splits.values())
    if any(f < 0 for f in fracs):
        raise ValueError("every split fraction must be >= 0")
    if abs(sum(fracs) - 1.0) > 1e-6:
        raise ValueError(
            f"split fractions must sum to 1, got {sum(fracs)}")
    if group_col is not None and components is not None:
        raise ValueError("pass group_col or components, not both")

    if components is not None:
        # the dedup layer's shared singleton rule (left join +
        # coalesce-to-own-id); the label column is temporary
        from .dedup import with_components

        df = with_components(df, components, id_col, "_split_comp")
        key = F.col("_split_comp")
    else:
        key = F.col(group_col if group_col is not None else id_col)

    bucket = _bucket(key, seed, hash_fn)
    names = list(splits)
    # cumulative upper bounds; the LAST split takes everything left so
    # integer truncation can never leave a row unlabeled. CASE chain in
    # order (first matching bound wins).
    cum = 0.0
    arms = []
    for name, frac in list(splits.items())[:-1]:
        cum += frac
        arms.append((int(cum * _SCALE), name))
    label = F.lit(names[-1])
    for bound, name in reversed(arms):
        label = F.when(bucket < bound, F.lit(name)).otherwise(label)
    out = df.withColumn(split_col, label)
    return out.drop("_split_comp") if components is not None else out


def bernoulli_keep(
    df: DataFrame,
    prob_col: str,
    id_col: str = "doc_id",
    seed: int = 0,
    hash_fn: str = "xxhash64",
) -> DataFrame:
    """Keep each row with its OWN probability ``prob_col`` ∈ [0, 1] —
    the realization step for per-row sampling weights (e.g.
    :func:`~.dedup.repetition_weights`' soft-dedup weights, a quality
    score turned keep-probability, DSIR importance weights rescaled to
    [0, 1]) when the trainer cannot consume example weights directly.

    Same contract as :func:`sample_hash` with a per-row fraction: the
    draw is ``hash(id, seed)`` so it is reproducible across runs,
    partitionings and engines, and keeps at the same seed NEST as a
    row's probability grows. Expression-only map-side filter; rows
    with NULL probability are dropped (NULL < nothing).

    **Use distinct seeds across stages.** Every hash-draw operator in
    this module (:func:`sample_hash`, :func:`bernoulli_keep`,
    :func:`split_assign`) derives its draw from the SAME
    ``hash(id, seed)``, so two stages sharing a seed make perfectly
    correlated decisions: ``bernoulli_keep(seed=0)`` followed by
    ``sample_hash(fraction=f, seed=0)`` keeps exactly the rows whose
    probability exceeds their hash AND whose hash is below ``f`` —
    the sample is the nesting-prefix of the survivors, NOT an
    independent thinning. Within ONE operator that nesting is the
    documented reproducibility feature; across pipeline stages pass a
    different seed per stage to get independent draws.
    """
    return df.where(
        _bucket(F.col(id_col), seed, hash_fn)
        < (F.col(prob_col).cast("double") * _SCALE).cast("long")
    )
