"""Deduplication operators for document corpora at 100 TB scale.

Engine extensions beyond the reference surface (driver mandate).
All hot paths are shuffle-on-key aggregations or LSH bucket joins —
never a full crossJoin of the corpus.

- ``exact_dedup`` / ``exact_dup_groups``: hash-groupBy on a content
  fingerprint; map-side combined, one shuffle on the 128-bit hash.
- ``minhash_signatures``: word-shingle → 64-bit hashes → k minima via
  universal hashing ((a·h + b) mod p), all as array expressions.
- ``lsh_candidate_pairs``: band the signature, shuffle on
  (band, band-hash), self-join within buckets — the classic
  MinHash-LSH candidate generation; candidate verification computes
  exact shingle Jaccard only on candidates.
- ``simhash64``: 64-bit SimHash from shingle hashes via bit-vote
  aggregation, as expressions over bit positions.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.text import doc_fingerprint, shingles
from .pins import release_checkpoint

__all__ = [
    "exact_dedup",
    "exact_dup_groups",
    "minhash_signatures",
    "minhash_from_hashes",
    "lsh_candidate_pairs",
    "jaccard_verify",
    "simhash64",
    "simhash_near_dups",
    "line_occurrences",
    "drop_repeated_lines",
    "drop_repeated_spans",
    "duplicate_components",
    "with_components",
    "canonical_duplicates",
    "deduplicate",
    "repetition_weights",
]

# Mersenne prime 2^31-1 for universal hashing: (h mod p)·a + b stays
# below 2^62, so the whole chain fits signed-64 under ANSI arithmetic
_P = (1 << 31) - 1


def _hash64(s: Column, hash_fn: str) -> Column:
    """64-bit-ish shingle hash.

    ``xxhash64`` (default) is the production path — fastest, JVM-side.
    ``md5`` takes the top 15 hex digits of md5 as a 60-bit integer; it
    is bit-identical in any engine with a standard md5 (DuckDB:
    ``list_reduce`` over hex digits), which makes MinHash/SimHash
    oracle-checkable cross-engine.
    """
    if hash_fn == "xxhash64":
        return F.xxhash64(s)
    if hash_fn == "md5":
        return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")
    raise ValueError(f"hash_fn: xxhash64 | md5, got {hash_fn!r}")


def exact_dup_groups(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """(fingerprint, n_dups, representative keep_id) for groups with >1 doc."""
    return (
        df.select(doc_fingerprint(F.col(text_col)).alias("fingerprint"),
                  F.col(id_col))
        .groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min(id_col).alias("keep_id"))
        .where(F.col("n_dups") > 1)
    )


def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id document per exact content fingerprint.

    One shuffle on the fingerprint; scales linearly.
    """
    w = df.select(F.col(id_col), F.col(text_col),
                  doc_fingerprint(F.col(text_col)).alias("_fp"))
    keep = w.groupBy("_fp").agg(F.min(id_col).alias(id_col))
    return df.join(keep, on=id_col, how="inner")


def _minhash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, _P), rng.randrange(0, _P)) for _ in range(num_hashes)]


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
    seed: int = 42,
    hash_fn: str = "xxhash64",
    keep_cols: tuple = (),
) -> DataFrame:
    """(id, signature: array<bigint>[num_hashes]) via expressions only.

    Single pass over the shingle hashes: the signature accumulator is an
    array of ``num_hashes`` running minima folded with one ``aggregate``
    + inner ``zip_with`` against the (a, b) parameter structs — O(S·H)
    work instead of the naive H separate scans that would re-evaluate
    the shingle array per hash function.

    ``hash_fn='md5'`` uses the cross-engine shingle hash (see
    :func:`_hash64`) so signatures are oracle-checkable.
    """
    params = _minhash_params(num_hashes, seed)
    ab = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in params
    ])
    base = F.transform(shingles(F.col(text_col), shingle_n),
                       lambda s: F.abs(_hash64(s, hash_fn)) % _P)
    sig = F.aggregate(
        base,
        F.array_repeat(F.lit(_P).cast("long"), num_hashes),
        lambda acc, h: F.zip_with(
            acc, ab, lambda m, p: F.least(m, (h * p["a"] + p["b"]) % _P)
        ),
    )
    # Record the signature width in column metadata so downstream LSH
    # banding can read it from the schema instead of probing a row.
    # keep_cols rides extra columns through (e.g. an event-time column
    # for the streaming stream-stream join).
    return df.select(
        F.col(id_col),
        sig.alias("signature", metadata={"num_hashes": num_hashes}),
        *[F.col(c) for c in keep_cols],
    )


def minhash_from_hashes(
    df: DataFrame,
    hashes_col: str,
    id_col: str = "doc_id",
    num_hashes: int = 32,
    seed: int = 42,
    keep_cols: tuple = (),
) -> DataFrame:
    """:func:`minhash_signatures` generalized to precomputed element
    hashes: the input carries an ``array<bigint>`` of per-element
    hashes (video frame perceptual hashes, feature ids, token ids —
    any SET representation) and the same single-pass min-fold produces
    the ``(id, signature)`` frame that :func:`lsh_candidate_pairs`
    consumes. The fold's minima are order-independent, so a
    ``collect_set`` upstream needs no ordering."""
    params = _minhash_params(num_hashes, seed)
    ab = F.array(*[
        F.struct(F.lit(a).alias("a"), F.lit(b).alias("b")) for a, b in params
    ])
    base = F.transform(F.col(hashes_col), lambda h: F.abs(h) % _P)
    sig = F.aggregate(
        base,
        F.array_repeat(F.lit(_P).cast("long"), num_hashes),
        lambda acc, h: F.zip_with(
            acc, ab, lambda m, p: F.least(m, (h * p["a"] + p["b"]) % _P)
        ),
    )
    return df.select(
        F.col(id_col),
        sig.alias("signature", metadata={"num_hashes": num_hashes}),
        *[F.col(c) for c in keep_cols],
    )


def _resolve_num_hashes(sigs: DataFrame, num_hashes: int | None) -> int | None:
    """Signature width from the ``signature`` column metadata (written
    by the signature builders — no job), falling back to a single-row
    probe for foreign frames. None only when the frame is empty."""
    if num_hashes is not None:
        return num_hashes
    meta = sigs.schema["signature"].metadata
    if meta and "num_hashes" in meta:
        return int(meta["num_hashes"])
    row = sigs.select("signature").first()
    return None if row is None else len(row["signature"])


def _band_explode_meta(
    sigs: DataFrame,
    id_col: str,
    num_hashes: int | None,
    num_bands: int,
) -> DataFrame:
    """(id, band, bucket) band rows with the width resolved via
    :func:`_resolve_num_hashes` — the shared front half of every
    bucketed LSH join (self, incremental, streaming)."""
    num_hashes = _resolve_num_hashes(sigs, num_hashes)
    if num_hashes is None:
        spark = sigs.sparkSession
        return spark.createDataFrame(
            [], f"{id_col} {dict(sigs.dtypes)[id_col]}, band int, bucket bigint"
        )
    rows_per_band = num_hashes // num_bands

    def key(b):
        return F.xxhash64(F.concat_ws(",", *[
            F.element_at("signature", b * rows_per_band + r + 1)
            for r in range(rows_per_band)
        ]))

    return sigs.select(
        F.col(id_col),
        F.posexplode(F.array(*[key(b) for b in range(num_bands)]))
        .alias("band", "bucket"),
    )


def lsh_candidate_pairs(
    sigs: DataFrame,
    id_col: str = "doc_id",
    num_bands: int = 8,
    num_hashes: int | None = None,
    bucket_mode: str = "hash",
) -> DataFrame:
    """Distinct candidate pairs (i < j) sharing ≥1 LSH band bucket.

    Shuffles on (band, hash-of-rows) — never a full cross join.
    ``num_hashes`` is the signature length; when None it is read from
    the ``signature`` column's metadata (written by
    :func:`minhash_signatures` — no job launched), falling back to a
    single-row probe only for foreign signature frames.
    ``bucket_mode='raw'`` keys buckets on the joined band string itself
    instead of its xxhash64 (bit-identical cross-engine; bulkier keys).
    """
    num_hashes = _resolve_num_hashes(sigs, num_hashes)
    if num_hashes is None:
        spark = sigs.sparkSession
        return spark.createDataFrame([], f"i {dict(sigs.dtypes)[id_col]}, j {dict(sigs.dtypes)[id_col]}")
    rows_per_band = num_hashes // num_bands

    def band_key(b):
        joined = F.concat_ws(
            ",", *[F.element_at("signature", b * rows_per_band + r + 1)
                   for r in range(rows_per_band)])
        return F.xxhash64(joined) if bucket_mode == "hash" else joined

    banded = sigs.select(
        F.col(id_col),
        F.posexplode(
            F.array(*[band_key(b) for b in range(num_bands)])
        ).alias("band", "bucket"),
    )
    left = banded.alias("l")
    right = banded.alias("r")
    pairs = (
        left.join(right, on=["band", "bucket"])
        .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
        .select(F.col(f"l.{id_col}").alias("i"), F.col(f"r.{id_col}").alias("j"))
        .distinct()
    )
    return pairs


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    pins=None,
) -> DataFrame:
    """Exact shingle-Jaccard on candidate pairs only (two broadcast-able
    joins against the shingle sets of the candidates).

    Shingle sets are computed ONLY for documents that appear in a
    candidate pair (semi-join on the candidate ids first): at 100 TB
    candidates ≪ corpus, so shingling the full corpus here would be
    the dominant cost. The pair frame is referenced three times below
    (two joins + the id semi-join), so it is lazily local-checkpointed
    — the LSH chain evaluates once, not three times. The checkpoint
    RDD outlives the call (r13: ``DataFrame.unpersist`` cannot release
    a checkpoint) — register on ``pins`` (checkpoint class; release
    once done with every frame derived from this result)."""
    pairs = pairs.localCheckpoint(eager=False)
    if pins is not None:
        pins.add_checkpoint(pairs)
    cand_ids = (
        pairs.select(F.col("i").alias(id_col))
        .unionAll(pairs.select(F.col("j").alias(id_col)))
        .distinct()
    )
    sh = df.join(cand_ids, id_col).select(
        F.col(id_col),
        F.array_distinct(shingles(F.col(text_col), shingle_n)).alias("_sh"))
    out = (
        pairs.join(sh.withColumnRenamed(id_col, "i").withColumnRenamed("_sh", "_shi"), "i")
        .join(sh.withColumnRenamed(id_col, "j").withColumnRenamed("_sh", "_shj"), "j")
        .withColumn("_inter", F.size(F.array_intersect("_shi", "_shj")))
        .withColumn("_union", F.size(F.array_union("_shi", "_shj")))
        .withColumn("jaccard", F.col("_inter") * 1.0 / F.greatest("_union", F.lit(1)))
        .where(F.col("jaccard") >= threshold)
        .select("i", "j", "jaccard")
    )
    return out


def simhash64(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
              shingle_n: int = 2, hash_fn: str = "xxhash64") -> DataFrame:
    """64-bit SimHash: per-bit vote over shingle hash values.

    Bit b of the hash contributes +1 when set, −1 when clear; the
    SimHash bit is 1 when the vote is positive. Pure expressions.
    ``hash_fn='md5'`` (60-bit, bits 60-63 always clear) is the
    cross-engine oracle-checkable variant.
    """
    sh = shingles(F.col(text_col), shingle_n)
    hashes = F.transform(sh, lambda s: _hash64(s, hash_fn))
    # bit masks as literals; 1<<63 wraps to long min, bitwiseAND still works
    masks = F.array(*[
        F.lit((1 << b) if b < 63 else -(1 << 63)).cast("long") for b in range(64)
    ])
    # one pass: fold hashes into a 64-wide vote vector via zip_with
    votes = F.aggregate(
        hashes,
        F.array_repeat(F.lit(0).cast("long"), 64),
        lambda acc, h: F.zip_with(
            acc, masks,
            lambda c, m: c + F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1),
        ),
    )
    # reduce votes → 64-bit value: sum of masks where the vote is positive
    sim = F.aggregate(
        F.zip_with(votes, masks,
                   lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("long"))),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(F.col(id_col), sim.alias("simhash"))


def simhash_near_dups(sigs: DataFrame, id_col: str = "doc_id",
                      max_hamming: int = 3, pins=None) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming.

    Blocked join on 16-bit quarters (pigeonhole: ≤3 differing bits →
    at least one of 4 quarters identical), so no full cross join.

    The quartered signature frame is persisted before the 4-branch
    self-join union: all 8 join inputs reference it, and with lazy
    lineage each input re-derived ``sigs`` from scratch — for
    expensive signature lineages (the :func:`simhash64` shingle-hash
    vote, SRP projections) that meant 8 corpus scans + signature
    evaluations per action instead of 1. The cached frame is 5 longs
    per row. Pass a :class:`~.pins.Pins` to release it in a
    long-lived session; one-shot jobs can omit it.
    """
    quarters = [(F.shiftrightunsigned(F.col("simhash"), 16 * q).bitwiseAND(F.lit(0xFFFF))).alias(f"q{q}")
                for q in range(4)]
    w = sigs.select(F.col(id_col), F.col("simhash"), *quarters).persist()
    if pins is not None:
        pins.add(w)
    out = None
    for q in range(4):
        l, r = w.alias("l"), w.alias("r")
        cand = (
            l.join(r, F.col(f"l.q{q}") == F.col(f"r.q{q}"))
            .where(F.col(f"l.{id_col}") < F.col(f"r.{id_col}"))
            .select(F.col(f"l.{id_col}").alias("i"), F.col(f"r.{id_col}").alias("j"),
                    F.col("l.simhash").alias("_si"), F.col("r.simhash").alias("_sj"))
        )
        out = cand if out is None else out.unionByName(cand)
    out = out.distinct().withColumn(
        "hamming", F.bit_count(F.col("_si").bitwiseXOR(F.col("_sj")))
    )
    return out.where(F.col("hamming") <= max_hamming).select("i", "j", "hamming")


#: integral Spark SQL types for which the label-sum convergence scalar
#: is exact; any other orderable type uses a hash-sum change detector
_INTEGRAL_TYPES = ("tinyint", "smallint", "int", "bigint")


def _label_signature(col_type: str):
    """Scalar change detector for a label column: exact sum for
    integral ids; 64-bit hash sum otherwise (labels are element-wise
    monotone under min, so an unchanged sum ⟺ fixpoint — exactly for
    sums, w.h.p. for hash sums)."""
    if col_type in _INTEGRAL_TYPES:
        return lambda c: F.sum(F.col(c).cast("decimal(38,0)"))
    # decimal accumulator: a long sum of 64-bit hashes overflows under
    # ANSI arithmetic
    return lambda c: F.sum(
        F.xxhash64(F.col(c).cast("string")).cast("decimal(38,0)"))


#: Rounds of min-label propagation ``method="auto"`` tries before
#: concluding the graph is not near-clique-shaped and switching to
#: star contraction. LSH/SimHash dup components converge in 2-3.
AUTO_LABEL_ROUNDS = 3


def duplicate_components(pairs: DataFrame, i_col: str = "i",
                         j_col: str = "j", max_iter: int = 25,
                         method: str = "auto",
                         telemetry: dict | None = None,
                         pins=None) -> DataFrame:
    """Connected components over a duplicate-pair edge list →
    ``(id, component)`` with ``component`` = the smallest id reachable
    (the id column's own ordering — long, string, UUID all work; the
    two id columns must share a type).

    Engine extension: turns verified near-dup PAIRS (LSH/SimHash/
    embedding) into duplicate GROUPS — the step a training-data
    pipeline actually needs before canonical-document selection.

    Three strategies behind one API:

    - ``method="auto"`` (default): min-label propagation for up to
      ``AUTO_LABEL_ROUNDS`` rounds — enough for the near-clique
      components LSH banding produces — then, if not converged,
      restarts with star contraction. The common case stays on the
      cheap path; chain-shaped graphs converge without the caller
      having to know their graph's diameter.
    - ``method="label"``: iterative min-label propagation —
      each round is one ``groupBy(id).min(label)`` over the node's own
      label unioned with its neighbors' labels. Rounds = graph
      DIAMETER; near-dup components from LSH banding are near-cliques,
      so 2-4 rounds is typical. The fast path for dedup graphs.
    - ``method="star"``: alternating large-star/small-star contraction
      (Kiveris et al., "Connected Components in MapReduce and
      Beyond"): each round rewires edges toward local minima, halving
      component height — O(log n) rounds regardless of shape. Choose
      this when components can be long CHAINS (e.g. transitive
      near-dup edits), where label propagation would need
      diameter-many rounds.

    Convergence is detected with a single scalar aggregate per round
    (label sum for integral ids, hash sum otherwise); lineage is cut
    with ``localCheckpoint``. If the fixpoint is not reached within
    ``max_iter`` a warning is emitted — the result may be OVER-SPLIT
    (under-deduplication). Pass ``telemetry={}`` to receive
    ``{"rounds": r, "converged": bool, "method": strategy_used}``. Only ids touched by at least
    one pair appear in the output (singletons are their own component
    by definition).

    At 100 TB: shuffles are keyed on the id column only; edge rows =
    2·|pairs| ≪ n for any sane threshold; driver state is one scalar
    per round.
    """
    import warnings

    from ..errors import DataError

    if method not in ("auto", "label", "star"):
        raise ValueError("method: 'auto' | 'label' | 'star'")
    dtypes = dict(pairs.dtypes)
    ti, tj = dtypes[i_col], dtypes[j_col]
    if ti != tj:
        raise DataError(
            f"duplicate_components: id columns must share a type, got "
            f"{i_col}: {ti} vs {j_col}: {tj}"
        )
    sig = _label_signature(ti)
    # The returned labels frame is the operator's living result,
    # registered on `pins` (r13): unreleased, it leaked one
    # result-sized RDD per call AND — on the label path, where it is a
    # cached plan — let a later identical run be silently served from
    # it through CacheManager's canonical-plan matching (the bench
    # min-of-n taint class). Release the pins only once done with the
    # result: star-path results are checkpoint pins (see Pins).
    method_used = method
    if method == "star":
        labels, rounds, converged = _components_star(
            pairs, i_col, j_col, max_iter, sig, pins=pins)
    elif method == "label":
        labels, rounds, converged = _components_label(
            pairs, i_col, j_col, max_iter, sig, pins=pins)
    else:  # auto: cheap label rounds first, star if the graph is deep
        from .pins import Pins

        budget = min(AUTO_LABEL_ROUNDS, max_iter)
        attempt = Pins()
        labels, rounds, converged = _components_label(
            pairs, i_col, j_col, budget, sig, pins=attempt)
        method_used = "label"
        if not converged:
            # the abandoned label attempt's caches are dead weight
            # (star restarts from `pairs`) — release them now (they
            # leaked per auto-escalation before r13)
            attempt.release()
            labels, srounds, converged = _components_star(
                pairs, i_col, j_col, max_iter, sig, pins=pins)
            rounds += srounds
            method_used = "star"
        elif pins is not None:
            pins.absorb(attempt)
    if not converged:
        warnings.warn(
            f"duplicate_components(method={method_used!r}) did not reach "
            f"a fixpoint within max_iter={max_iter} rounds; components "
            f"may be over-split (under-deduplication). Label propagation "
            f"needs diameter-many rounds — raise max_iter or use "
            f"method='star' (O(log n) rounds) for chain-shaped graphs.",
            RuntimeWarning,
        )
    if telemetry is not None:
        telemetry["rounds"] = rounds
        telemetry["converged"] = converged
        telemetry["method"] = method_used
    return labels


def _components_label(pairs, i_col, j_col, max_iter, sig, pins=None):
    """Min-label propagation; rounds = component diameter."""
    e = (
        pairs.select(F.col(i_col).alias("src"), F.col(j_col).alias("dst"))
        .unionAll(
            pairs.select(F.col(j_col).alias("src"),
                         F.col(i_col).alias("dst")))
        # hash-partition ONCE on the per-round join key: every round
        # joins e on src, and an unpartitioned persisted edge list
        # would re-shuffle all 2·|pairs| edge rows each round (r12: the
        # per-round exchange on e disappears — rounds × |e| shuffle
        # bytes saved; labels still shuffle, that movement is the
        # algorithm)
        .repartition(F.col("src"))
        .persist()
    )
    labels = (
        e.select(F.col("src").alias("id")).distinct()
        .withColumn("component", F.col("id"))
        .persist()
    )
    prev_sum = labels.agg(sig("component")).first()[0]
    prev = None
    last_ckpt = None
    rounds, converged = 0, False
    for it in range(max_iter):
        nb = (
            e.join(labels.withColumnRenamed("id", "src"), "src")
            .select(F.col("dst").alias("id"), "component")
        )
        nxt = (
            labels.unionAll(nb)
            .groupBy("id").agg(F.min("component").alias("component"))
        )
        is_ckpt = (it + 1) % 5 == 0
        nxt = nxt.localCheckpoint(eager=True) if is_ckpt else nxt.persist()
        s = nxt.agg(sig("component")).first()[0]
        if is_ckpt and last_ckpt is not None:
            # a NEWER checkpoint has materialized: every live frame's
            # lineage is truncated at it, so the previous checkpoint's
            # RDD (which DataFrame.unpersist() cannot release — r13)
            # is provably unreferenced now
            release_checkpoint(last_ckpt)
        if is_ckpt:
            last_ckpt = nxt
        if prev is not None:
            prev.unpersist()  # no-op on checkpoint rounds, by design
        prev = labels
        labels = nxt
        rounds = it + 1
        if s == prev_sum:  # labels only decrease: equal sum == fixpoint
            converged = True
            break
        prev_sum = s
    e.unpersist()
    if prev is not None:
        prev.unpersist()
    # the final `labels` stays live — it IS the result. Register it on
    # the caller's pins; when the run went past a %5 checkpoint round,
    # the LAST checkpoint is the lineage anchor the result rests on —
    # registered as a checkpoint pin (released only when the caller is
    # done with the result; see Pins docstring).
    if pins is not None:
        if labels is last_ckpt:
            pins.add_checkpoint(labels)
        else:
            pins.add(labels)
            if last_ckpt is not None:
                pins.add_checkpoint(last_ckpt)
    return labels, rounds, converged


def _star_sym(e):
    return e.unionAll(
        e.select(F.col("v").alias("u"), F.col("u").alias("v")))


def _large_star(e):
    """For each node u: connect every LARGER neighbor to
    min(Γ(u) ∪ {u}) — pulls high nodes toward local minima."""
    s = _star_sym(e)
    mins = s.groupBy("u").agg(F.min("v").alias("_mv"))
    return (
        s.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"),
                F.least(F.col("_mv"), F.col("u")).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(e):
    """For each node u: connect u and every SMALLER neighbor to the
    minimum of those neighbors — flattens chains into stars."""
    s = (e.select(F.greatest("u", "v").alias("u"),
                  F.least("u", "v").alias("v"))
         .where(F.col("u") != F.col("v")))
    mins = s.groupBy("u").agg(F.min("v").alias("_mv"))
    rewired = s.join(mins, "u").select(
        F.col("v").alias("u"), F.col("_mv").alias("v"))
    own = mins.select(F.col("u"), F.col("_mv").alias("v"))
    return (rewired.unionAll(own)
            .where(F.col("u") != F.col("v")).distinct())


def _components_star(pairs, i_col, j_col, max_iter, sig, pins=None):
    """Large-star/small-star alternation; O(log n) rounds for any
    component shape. At the fixpoint the edge set is a star forest
    (every node → its component minimum)."""
    nodes = (
        pairs.select(F.col(i_col).alias("id"))
        .unionAll(pairs.select(F.col(j_col).alias("id")))
        .distinct().persist()
    )
    e = (
        pairs.select(F.col(i_col).alias("u"), F.col(j_col).alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct().persist()
    )
    edge_sig = e.agg(F.count(F.lit(1)),
                     sig("u"), sig("v")).first()
    prev_sig = tuple(edge_sig)
    rounds, converged = 0, False
    prev = None
    for it in range(max_iter):
        nxt = _small_star(_large_star(e)).localCheckpoint(eager=True)
        s = tuple(nxt.agg(F.count(F.lit(1)), sig("u"), sig("v")).first())
        if prev is not None:
            # every round is an EAGER checkpoint, so once nxt has
            # materialized nothing references the round before last —
            # release its checkpoint RDD for real (DataFrame.unpersist
            # is a silent no-op on checkpointed frames, which leaked
            # one edge-list copy per round until r13)
            prev.unpersist()
            release_checkpoint(prev)
        prev = e
        e = nxt
        rounds = it + 1
        if s == prev_sig:  # star forest reached: both ops are no-ops
            converged = True
            break
        prev_sig = s
    comp = e.groupBy("u").agg(F.min("v").alias("component"))
    labels = (
        nodes.join(comp.withColumnRenamed("u", "id"), "id", "left")
        .select("id",
                F.coalesce("component", F.col("id")).alias("component"))
        .localCheckpoint(eager=True)
    )
    # labels is eagerly checkpointed (self-contained), so the working
    # frames are provably unreferenced now
    nodes.unpersist()
    if prev is not None:
        prev.unpersist()
        release_checkpoint(prev)
    e.unpersist()
    release_checkpoint(e)
    if pins is not None:
        pins.add_checkpoint(labels)  # the result (see Pins docstring)
    return labels, rounds, converged


def _regex_quote(sep: str) -> str:
    """Java ``Pattern.quote``: ``F.split`` treats its separator as a
    regex, while reassembly (``array_join``) and the oracle twins use
    it literally — so quote it, or ``|``/``.``/``\\r\\n``-style
    separators split wrong and corrupt the rejoin."""
    return "\\Q" + sep.replace("\\E", "\\E\\\\E\\Q") + "\\E"


def line_occurrences(df: DataFrame, text_col: str = "text",
                     line_sep: str = "\n") -> DataFrame:
    """Corpus-wide line frequency table ``(line_hash, n)`` — the
    evidence behind :func:`drop_repeated_lines`. One shuffle keyed on
    the 128-bit line fingerprint (map-side combined). ``line_sep`` is
    taken literally (regex-quoted before the split)."""
    lines = df.select(
        F.explode(F.split(F.col(text_col), _regex_quote(line_sep)))
        .alias("_line"))
    return (
        lines.where(F.col("_line") != "")
        .groupBy(F.md5(F.col("_line").cast("binary")).alias("line_hash"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


def drop_repeated_lines(
    df: DataFrame,
    text_col: str = "text",
    line_sep: str = "\n",
    max_occurrences: int = 1,
    min_line_chars: int = 1,
) -> DataFrame:
    """Remove boilerplate: drop every line whose EXACT content appears
    more than ``max_occurrences`` times across the whole corpus
    (headers, navigation, license blocks — the C4/RefinedWeb line-dedup
    rule). ALL occurrences of an over-represented line are dropped, not
    just the copies. Lines shorter than ``min_line_chars`` are always
    kept (short and empty lines repeat naturally; the default of 1
    preserves blank-line paragraph structure).

    Output = input columns with ``text_col`` rewritten (kept lines
    re-joined in original order) plus ``n_lines_kept`` /
    ``n_lines_dropped``. Rows are grouped by the non-text columns for
    reassembly, so they must identify the document (any table with a
    doc id qualifies).

    At 100 TB: one groupBy shuffle on the line fingerprint; only the
    OVER-REPRESENTED lines (≪ corpus for any sane threshold) join back
    against the exploded lines, so AQE broadcasts them; reassembly is
    one groupBy keyed on the doc columns. No collect.
    """
    other_cols = [c for c in df.columns if c != text_col]
    # posexplode_outer: a NULL text splits to NULL and a plain
    # posexplode would emit ZERO rows — the document would silently
    # vanish from the output (and from prepare_corpus's audit, breaking
    # its row-preservation invariant). The outer variant keeps one
    # (_pos, _line) = (NULL, NULL) row, which no rule drops, so the
    # document survives with text NULL and n_lines_kept = 0.
    exploded = df.select(
        *other_cols,
        F.posexplode_outer(F.split(F.col(text_col),
                                   _regex_quote(line_sep)))
        .alias("_pos", "_line"),
    ).withColumn("_lh", F.md5(F.col("_line").cast("binary")))
    repeated = (
        exploded.groupBy("_lh")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > max_occurrences)
        .select("_lh")
    )
    marked = exploded.join(
        repeated.withColumn("_rep", F.lit(True)), "_lh", "left"
    ).withColumn(
        "_drop",
        F.coalesce(F.col("_rep"), F.lit(False))
        & (F.length("_line") >= min_line_chars),
    )
    kept_text = F.array_join(
        F.transform(
            F.array_sort(F.collect_list(
                F.when(~F.col("_drop") & F.col("_line").isNotNull(),
                       F.struct(F.col("_pos"), F.col("_line"))))),
            lambda s: s["_line"],
        ),
        line_sep,
    )
    rebuilt = (
        marked.groupBy(*other_cols)
        .agg(
            # NULL-text docs (single all-NULL exploded row) keep NULL
            # text instead of being rewritten to "".
            F.when(F.max(F.col("_line").isNotNull()), kept_text)
            .alias(text_col),
            F.sum((~F.col("_drop") & F.col("_line").isNotNull())
                  .cast("long")).alias("n_lines_kept"),
            F.sum(F.col("_drop").cast("long")).alias("n_lines_dropped"),
        )
    )
    return rebuilt.select(*other_cols, text_col,
                          "n_lines_kept", "n_lines_dropped")


def drop_repeated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    max_occurrences: int = 1,
) -> DataFrame:
    """ExactSubstr-style substring dedup (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better",
    arXiv:2107.06499 — token-granular variant): CUT every maximal span
    covered by an ``n``-token sequence that occurs more than
    ``max_occurrences`` times across the whole corpus (within-document
    repeats count toward the total, as in the paper). This catches
    cross-document boilerplate at sub-line granularity — templated
    sentences, license fragments, quoted chains — that line-level
    dedup (:func:`drop_repeated_lines`) misses whenever the repetition
    does not align with line boundaries.

    Output = input columns with ``text_col`` rewritten (tokens outside
    repeated spans, original order) plus ``n_tokens_kept`` /
    ``n_tokens_dropped``. Overlapping repeated n-grams merge naturally:
    a token is dropped iff ANY repeated n-gram covers it. Documents
    shorter than ``n`` tokens contribute no n-grams and are never cut.
    Tokens are whitespace units (the curation-layer convention); run
    text through :func:`~.tokenizer.bpe_tokens` first and re-join when
    spans should mean trained-tokenizer tokens.

    At 100 TB: one groupBy shuffle on the n-gram fingerprint; only
    OVER-REPRESENTED grams (≪ corpus for sane thresholds) join back
    against the exploded grams (AQE broadcasts them); covered starts
    regroup per doc (one shuffle keyed on the id); the cut itself is a
    map-only expression — the per-token coverage test is
    O(|repeated starts in the doc|), which is ~0 for clean documents.
    No collect anywhere; this is the paper's suffix-array pass
    re-expressed as hash aggregation (exact for fixed n, rather than
    all lengths ≥ n — compose several n values to approximate that).
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    other_cols = [c for c in df.columns if c != text_col]
    toks = F.split(F.col(text_col), " ")
    staged = df.withColumn("_toks", toks)
    n_t = F.size("_toks")
    starts = F.when(
        n_t >= n, F.sequence(F.lit(1), n_t - n + 1)
    ).otherwise(F.array().cast("array<int>"))
    grams = staged.select(
        id_col,
        F.explode(starts).alias("_s"),
        F.col("_toks"),
    ).select(
        id_col, "_s",
        F.md5(F.array_join(F.slice("_toks", F.col("_s"), n), " ")
              .cast("binary")).alias("_gh"),
    )
    repeated = (
        grams.groupBy("_gh")
        .agg(F.count(F.lit(1)).alias("_n"))
        .where(F.col("_n") > max_occurrences)
        .select("_gh")
    )
    covered = (
        grams.join(repeated, "_gh")
        .groupBy(id_col)
        .agg(F.array_sort(F.collect_list("_s")).alias("_starts"))
    )
    out = staged.join(covered, id_col, "left").withColumn(
        "_starts",
        F.coalesce(F.col("_starts"), F.array().cast("array<int>")),
    )
    kept = F.filter(
        "_toks",
        lambda t, i: ~F.exists(
            "_starts",
            lambda s: (s <= i + 1) & (i + 1 < s + F.lit(n)),
        ),
    )
    out = out.withColumn("_kept", kept)
    n_kept = F.when(F.col(text_col).isNull(), F.lit(0)) \
        .otherwise(F.size("_kept")).cast("long")
    n_total = F.when(F.col(text_col).isNull(), F.lit(0)) \
        .otherwise(F.size("_toks")).cast("long")
    return out.select(
        *other_cols,
        F.when(F.col(text_col).isNull(), F.lit(None))
        .otherwise(F.array_join("_kept", " ")).alias(text_col),
        n_kept.alias("n_tokens_kept"),
        (n_total - n_kept).alias("n_tokens_dropped"),
    )


def with_components(df: DataFrame, components: DataFrame,
                    id_col: str = "doc_id",
                    component_col: str = "component") -> DataFrame:
    """Attach each row's duplicate-component label as
    ``component_col``: left join the ``(id, component)`` frame of
    :func:`duplicate_components` and coalesce missing labels to the
    row's own id — ids untouched by any duplicate pair are their own
    singleton component. The ONE shared singleton rule behind
    :func:`canonical_duplicates`, :func:`repetition_weights` and
    :func:`~.sampling.split_assign`'s components path.

    The components frame's label column is ``component`` (the
    :func:`duplicate_components` schema); a frame using a custom name
    is read through ``component_col`` when that column exists there —
    the pre-refactor :func:`canonical_duplicates` contract, kept so a
    caller pairing a custom-named frame with a matching
    ``component_col`` still resolves. A frame carrying BOTH columns is
    ambiguous (``component_col`` doubles as the output name, so an
    unrelated column that merely shares it must not silently win over
    the canonical ``component`` labels) and raises."""
    has_custom = (component_col != "component"
                  and component_col in components.columns)
    if has_custom and "component" in components.columns:
        raise ValueError(
            f"with_components: components frame has both 'component' "
            f"and {component_col!r} columns — the label source is "
            "ambiguous; drop or rename one of them")
    src = component_col if has_custom else "component"
    return df.join(
        components.select(F.col("id").alias(id_col),
                          F.col(src).alias("_comp")),
        id_col, "left",
    ).withColumn(component_col,
                 F.coalesce(F.col("_comp"), F.col(id_col))).drop("_comp")


def canonical_duplicates(df: DataFrame, components: DataFrame,
                         id_col: str = "doc_id", text_col: str = "text",
                         component_col: str = "component",
                         prefer_col: str | None = None) -> DataFrame:
    """Mark one canonical row per duplicate component: by default the
    longest ``text_col`` wins; pass ``prefer_col`` (e.g. a
    :func:`~.classifier.score_hashed_lr` quality score or an inverse
    :func:`~.lm.perplexity_score`) to keep the HIGHEST-valued
    duplicate instead — "keep the best copy", the curation-grade keep
    rule. Ties break on smallest id; rows with no dup pair are their
    own (singleton) component and always canonical.

    One shuffle keyed on the component id (window rank). Output = the
    input columns + ``component`` + ``is_canonical``.
    """
    from pyspark.sql import Window

    joined = with_components(df, components, id_col, component_col)
    head = (F.col(prefer_col).desc() if prefer_col
            else F.length(text_col).desc())
    w = Window.partitionBy(component_col).orderBy(
        head, F.col(id_col).asc())
    return joined.withColumn(
        "is_canonical", F.row_number().over(w) == 1)


def deduplicate(df: DataFrame, components: DataFrame,
                id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Drop every non-canonical duplicate row (keep = longest text,
    ties → smallest id, per component)."""
    out = canonical_duplicates(df, components, id_col, text_col)
    return out.where("is_canonical").drop("is_canonical", "component")


def repetition_weights(df: DataFrame, components: DataFrame,
                       id_col: str = "doc_id",
                       component_col: str = "component",
                       weight_col: str = "rep_weight",
                       alpha: float = 1.0) -> DataFrame:
    """SOFT dedup: keep every duplicate but down-weight it — adds
    ``component`` and ``weight_col = |component| ** -alpha``.

    Hard deduplication (:func:`deduplicate`) throws away the signal
    that a document was repeated at all; repetition-aware weighting
    keeps the corpus intact and hands the trainer (or a downstream
    sampler) a per-row weight instead:

    - ``alpha=1`` (default): each duplicate GROUP contributes unit
      total weight — distribution-equivalent to hard dedup in
      expectation, but robust to the canonical pick and to borderline
      near-dup edges.
    - ``alpha=0``: weight 1 everywhere (no deduplication).
    - ``0 < alpha < 1``: partial discount — frequently-duplicated text
      keeps SOME extra mass (duplication correlates with utility in
      web corpora; cf. the keep-probability relaxations in SemDeDup
      (arXiv:2303.09540) and GPT-3's Pareto keep rule, the same shape
      this engine uses in ``classifier.pareto_keep``).

    ``components`` is the ``(id, component)`` output of
    :func:`duplicate_components`; ids absent from it are singletons
    (weight 1). Realize the weights as a reproducible keep/drop with
    :func:`~.sampling.bernoulli_keep`, or feed them to a weighted loss.

    At 100 TB: one left join against the (≪ corpus-sized) components
    frame + a group-size aggregation over that SAME small frame joined
    back on the component. Group sizes are counted on the components
    frame, not with a corpus-wide window (r13): the pre-r13 window
    ``count(*) over (partition by component)`` shuffled EVERY corpus
    row — all columns — on the component key and sorted it, purely to
    attach a group count; the sizes aggregation touches only the
    components frame and the join-back lets the planner broadcast it
    when it fits (guide §2.3/§2.4). Identical by the operator's
    contract: ``components`` labels ids of THIS corpus (each df row's
    id at most once), so per-component df-row counts equal the
    components frame's per-component id counts, and ids absent from
    it are singletons either way (coalesce → weight 1).
    """
    if alpha < 0:
        raise ValueError("alpha must be >= 0")
    joined = with_components(df, components, id_col, component_col)
    # same label-column resolution as with_components (custom name
    # honored when the canonical one is absent)
    has_custom = (component_col != "component"
                  and component_col in components.columns)
    src = component_col if has_custom else "component"
    sizes = components.groupBy(
        F.col(src).alias(component_col)
    ).agg(F.count(F.lit(1)).alias("_gsz"))
    return (
        joined.join(sizes, component_col, "left")
        .withColumn(
            weight_col,
            F.pow(F.coalesce(F.col("_gsz"), F.lit(1)).cast("double"),
                  F.lit(-alpha)),
        )
        .drop("_gsz")
    )
