"""Deterministic sampling (operators/sampling.py) and sequence packing
(operators/packing.py) for training-data curation."""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.packing import (
    pack_concat, pack_next_fit,
)
from generalized_kmeans_clustering_spark.operators.sampling import (
    sample_hash, stratified_sample_hash, token_budget_sample,
)


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    from generalized_kmeans_clustering_spark.functions import text as Tx

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        Tx.token_count(F.col("text")).cast("long").alias("n_tokens"),
        Tx.language_id(F.col("text")).alias("lang"),
    ).cache()


# --- sampling ---------------------------------------------------------------

def test_sample_hash_reproducible_and_nested(spark, docs):
    a1 = {r["doc_id"] for r in sample_hash(docs, 0.3, seed=7).collect()}
    a2 = {r["doc_id"] for r in sample_hash(
        docs.repartition(13), 0.3, seed=7).collect()}
    assert a1 == a2  # partitioning-independent
    small = {r["doc_id"] for r in sample_hash(docs, 0.1, seed=7).collect()}
    assert small <= a1  # same-seed samples nest
    other = {r["doc_id"] for r in sample_hash(docs, 0.3, seed=8).collect()}
    assert other != a1  # different seed -> different sample
    n = docs.count()
    assert abs(len(a1) / n - 0.3) < 0.1


def test_sample_hash_bounds(spark, docs):
    assert sample_hash(docs, 0.0).count() == 0
    assert sample_hash(docs, 1.0).count() == docs.count()
    with pytest.raises(ValueError):
        sample_hash(docs, 1.5)


def test_stratified_fractions(spark, docs):
    out = stratified_sample_hash(
        docs, {"en": 1.0, "de": 0.0}, strata_col="lang", seed=3)
    got = {r["lang"]: r["n"] for r in
           out.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    en_total = docs.where("lang = 'en'").count()
    assert got.get("en", 0) == en_total
    assert "de" not in got
    # unlisted strata follow default_fraction
    assert not any(k not in ("en",) for k in got)


def test_token_budget_sample(spark, docs):
    totals = {r["lang"]: r["t"] for r in docs.groupBy("lang")
              .agg(F.sum("n_tokens").alias("t")).collect()}
    lang, total = max(totals.items(), key=lambda kv: kv[1])
    budget = total // 3
    out = token_budget_sample(docs, {lang: budget}, strata_col="lang",
                              seed=5)
    assert {r["lang"] for r in out.select("lang").distinct().collect()} \
        == {lang}
    realized = out.agg(F.sum("n_tokens")).first()[0]
    assert realized <= total
    assert abs(realized - budget) / budget < 0.35  # concentrates on budget
    # a budget above the total keeps the whole stratum
    all_kept = token_budget_sample(docs, {lang: total * 2},
                                   strata_col="lang", seed=5)
    assert all_kept.count() == docs.where(F.col("lang") == lang).count()


# --- packing ----------------------------------------------------------------

SEQ = 512


def test_pack_concat_invariants(spark, docs):
    spans = pack_concat(docs, SEQ, num_shards=8, seed=1).cache()
    # 1. every document's spans reassemble it exactly
    doc_sums = spans.groupBy("doc_id").agg(
        F.sum("length").alias("s"),
        F.min("doc_offset").alias("mn"),
        F.max(F.col("doc_offset") + F.col("length")).alias("mx"))
    joined = doc_sums.join(docs, "doc_id")
    bad = joined.where((F.col("s") != F.col("n_tokens"))
                       | (F.col("mn") != 0)
                       | (F.col("mx") != F.col("n_tokens"))).count()
    assert bad == 0
    # 2. every pack except the last per shard is exactly full
    packs = spans.groupBy("shard", "pack").agg(F.sum("length").alias("fill"))
    last = packs.groupBy("shard").agg(F.max("pack").alias("last_pack"))
    partial = (packs.join(last, "shard")
               .where((F.col("pack") != F.col("last_pack"))
                      & (F.col("fill") != SEQ)).count())
    assert partial == 0
    full = packs.where(F.col("fill") == SEQ).count()
    assert full > 0
    # 3. no span exceeds the sequence
    assert spans.where(
        (F.col("pack_offset") + F.col("length")) > SEQ).count() == 0
    spans.unpersist()


def test_pack_concat_deterministic(spark, docs):
    a = sorted(map(tuple, pack_concat(docs, SEQ, num_shards=8,
                                      seed=1).collect()))
    b = sorted(map(tuple, pack_concat(docs.repartition(17), SEQ,
                                      num_shards=8, seed=1).collect()))
    assert a == b


def test_pack_next_fit_invariants(spark, docs):
    out = pack_next_fit(docs, SEQ, num_shards=8, seed=1).cache()
    assert out.count() == docs.count()  # no doc dropped or split
    fills = (out.where(~F.col("overflow")).join(docs, "doc_id")
             .groupBy("shard", "pack").agg(F.sum("n_tokens").alias("fill")))
    assert fills.where(F.col("fill") > SEQ).count() == 0
    over = out.where(F.col("overflow")).join(docs, "doc_id")
    assert over.where(F.col("n_tokens") <= SEQ).count() == 0
    # overflow docs sit alone in their pack
    singleton = out.join(
        out.groupBy("shard", "pack").agg(F.count(F.lit(1)).alias("c")),
        ["shard", "pack"])
    assert singleton.where(F.col("overflow") & (F.col("c") > 1)).count() == 0
    out.unpersist()


def test_pack_next_fit_matches_serial_walk(spark):
    docs = spark.createDataFrame(
        [(i, n) for i, n in enumerate([100, 300, 200, 512, 600, 50, 480,
                                       40, 30, 513])],
        "doc_id long, n_tokens long")
    out = pack_next_fit(docs, 512, num_shards=1, seed=2)
    rows = {r["doc_id"]: (r["pack"], r["pack_offset"], r["overflow"])
            for r in out.collect()}
    # replicate the walk on the driver in the same hash order
    order = [r["doc_id"] for r in docs.select(
        "doc_id",
        F.xxhash64(F.concat_ws("|", F.col("doc_id").cast("string"),
                               F.lit("2"))).alias("k"))
        .orderBy("k", "doc_id").collect()]
    n_of = {r["doc_id"]: r["n_tokens"] for r in docs.collect()}
    pack, fill = 0, 0
    expect = {}
    for d in order:
        n = n_of[d]
        if n > 512:
            if fill > 0:
                pack += 1
            expect[d] = (pack, 0, True)
            pack += 1
            fill = 0
            continue
        if fill + n > 512:
            pack += 1
            fill = 0
        expect[d] = (pack, fill, False)
        fill += n
    assert rows == expect


def test_token_budget_null_token_stratum(spark):
    """A budgeted stratum whose token column is all NULL must behave
    like an empty stratum (kept in full at zero realized tokens), not
    crash on the None aggregate."""
    df = spark.createDataFrame(
        [(1, "xx", None), (2, "xx", None), (3, "en", 50)],
        "doc_id long, lang string, n_tokens long")
    out = token_budget_sample(df, {"xx": 100, "en": 10}, strata_col="lang")
    langs = [r["lang"] for r in out.collect()]
    assert langs.count("xx") == 2  # total 0 <= budget -> fraction 1.0


def test_materialize_packs_reassembles_exact_token_stream(spark, docs, sf_dir):
    """Every sequence's text must contain exactly its spans' tokens in
    offset order; full sequences carry exactly SEQ tokens."""
    from generalized_kmeans_clustering_spark.operators.packing import (
        materialize_packs,
    )

    raw = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    spans = pack_concat(docs, SEQ, num_shards=4, seed=9)
    packs = materialize_packs(raw, spans).cache()
    # token counts of the text agree with the span arithmetic
    bad = packs.where(
        F.size(F.split(F.col("text"), " ")) != F.col("n_tokens")).count()
    assert bad == 0
    # all but the last pack per shard hold exactly SEQ tokens
    last = packs.groupBy("shard").agg(F.max("pack").alias("lp"))
    partial = (packs.join(last, "shard")
               .where((F.col("pack") != F.col("lp"))
                      & (F.col("n_tokens") != SEQ)).count())
    assert partial == 0
    # total token mass is conserved
    assert packs.agg(F.sum("n_tokens")).first()[0] == \
        docs.agg(F.sum("n_tokens")).first()[0]
    packs.unpersist()


def test_curriculum_shards_orders_by_score_within_shard(spark):
    from generalized_kmeans_clustering_spark.operators.sampling import (
        curriculum_shards,
    )

    rows = [(i, float((i * 37) % 100)) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, quality double")
    out = curriculum_shards(df, "quality", num_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append((r["pos"], r["quality"]))
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, items in by_shard.items():
        items.sort()
        qs = [q for _, q in items]
        assert qs == sorted(qs, reverse=True), shard
        assert [p for p, _ in items] == list(range(1, len(items) + 1))
    # ascending mode for easy-to-hard schedules
    up = curriculum_shards(df, "quality", num_shards=4,
                           ascending=True).collect()
    one = sorted((r["pos"], r["quality"]) for r in up if r["shard"] == 0)
    assert [q for _, q in one] == sorted(q for _, q in one)
    import pytest as _pt
    with _pt.raises(ValueError):
        curriculum_shards(df, "quality", num_shards=0)


# --- split_assign / bernoulli_keep / repetition_weights ----------------------

def test_split_assign_disjoint_exhaustive(spark, docs):
    from generalized_kmeans_clustering_spark.operators.sampling import (
        split_assign,
    )

    out = split_assign(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, seed=5)
    counts = {r["split"]: r["n"] for r in
              out.groupBy("split").agg(F.count(F.lit(1)).alias("n"))
              .collect()}
    assert set(counts) <= {"train", "val", "test"}
    assert sum(counts.values()) == docs.count()  # exhaustive
    assert counts["train"] > counts.get("val", 0)
    # reproducible across partitionings
    again = split_assign(
        docs.repartition(17), {"train": 0.8, "val": 0.1, "test": 0.1},
        seed=5)
    a = {(r["doc_id"], r["split"]) for r in out.select(
        "doc_id", "split").collect()}
    b = {(r["doc_id"], r["split"]) for r in again.select(
        "doc_id", "split").collect()}
    assert a == b


def test_split_assign_monotone_growth(spark, docs):
    """Growing train's fraction at the same seed only ADDS members."""
    from generalized_kmeans_clustering_spark.operators.sampling import (
        split_assign,
    )

    small = {r["doc_id"] for r in split_assign(
        docs, {"train": 0.6, "rest": 0.4}, seed=2)
        .where("split = 'train'").collect()}
    big = {r["doc_id"] for r in split_assign(
        docs, {"train": 0.8, "rest": 0.2}, seed=2)
        .where("split = 'train'").collect()}
    assert small <= big


def test_split_assign_group_cotravel(spark, docs):
    """All rows of a group land in one split (leakage-safety)."""
    from generalized_kmeans_clustering_spark.operators.sampling import (
        split_assign,
    )

    grouped = docs.withColumn("grp", (F.col("doc_id") % 20).cast("string"))
    out = split_assign(
        grouped, {"train": 0.5, "test": 0.5}, group_col="grp", seed=9)
    per_grp = (out.groupBy("grp")
               .agg(F.countDistinct("split").alias("k")).collect())
    assert all(r["k"] == 1 for r in per_grp)
    # and the groups themselves are split roughly in half
    labels = {r["grp"]: r["s"] for r in
              out.groupBy("grp").agg(F.first("split").alias("s")).collect()}
    assert 0 < sum(v == "train" for v in labels.values()) < 20


def test_split_assign_components_path(spark):
    """Duplicate-component members can never straddle the split."""
    from generalized_kmeans_clustering_spark.operators.sampling import (
        split_assign,
    )

    df = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(40)], "doc_id long, text string")
    comp = spark.createDataFrame(
        [(1, 0), (0, 0), (7, 5), (5, 5), (9, 5)], "id long, component long")
    out = split_assign(df, {"train": 0.5, "test": 0.5},
                       components=comp, seed=11)
    got = {r["doc_id"]: r["split"] for r in out.collect()}
    assert len(got) == 40  # left join keeps every row exactly once
    assert got[0] == got[1]
    assert got[5] == got[7] == got[9]
    # singleton (not in components) hashes on its own id: same label as
    # an identical corpus split with no components frame at all
    solo = {r["doc_id"]: r["split"] for r in split_assign(
        df, {"train": 0.5, "test": 0.5}, seed=11).collect()}
    for i in range(40):
        if i not in (0, 1, 5, 7, 9):
            assert got[i] == solo[i]


def test_split_assign_validation(spark, docs):
    from generalized_kmeans_clustering_spark.operators.sampling import (
        split_assign,
    )

    with pytest.raises(ValueError, match="sum to 1"):
        split_assign(docs, {"a": 0.5, "b": 0.2})
    with pytest.raises(ValueError, match=">= 0"):
        split_assign(docs, {"a": 1.5, "b": -0.5})
    with pytest.raises(ValueError, match="not both"):
        split_assign(docs, {"a": 1.0}, group_col="lang",
                     components=docs.select(
                         F.col("doc_id").alias("id"),
                         F.col("doc_id").alias("component")))
    with pytest.raises(ValueError, match="at least one"):
        split_assign(docs, {})


def test_bernoulli_keep(spark, docs):
    from generalized_kmeans_clustering_spark.operators.sampling import (
        bernoulli_keep, sample_hash,
    )

    n = docs.count()
    zero = bernoulli_keep(docs.withColumn("p", F.lit(0.0)), "p")
    assert zero.count() == 0
    one = bernoulli_keep(docs.withColumn("p", F.lit(1.0)), "p")
    assert one.count() == n
    null = bernoulli_keep(docs.withColumn("p", F.lit(None).cast("double")),
                          "p")
    assert null.count() == 0
    # constant p coincides with sample_hash at the same seed
    half = bernoulli_keep(docs.withColumn("p", F.lit(0.4)), "p", seed=3)
    ref = sample_hash(docs, 0.4, seed=3)
    assert ({r["doc_id"] for r in half.collect()}
            == {r["doc_id"] for r in ref.collect()})


def test_hash_draw_seed_correlation(spark, docs):
    """The hash-draw operators share hash(id, seed): at the SAME seed
    a downstream sample_hash is perfectly nested in bernoulli_keep's
    survivors (correlated by design); DISTINCT seeds give an
    independent thinning whose joint rate is ~ the product."""
    from generalized_kmeans_clustering_spark.operators.sampling import (
        bernoulli_keep,
    )

    n = docs.count()
    kept = bernoulli_keep(docs.withColumn("p", F.lit(0.6)), "p", seed=5)
    k = kept.count()
    # same seed: sample_hash(0.3) after bernoulli_keep(0.6) keeps
    # EXACTLY the rows sample_hash(0.3) keeps alone — the hash-prefix
    # nesting, not an independent 0.18 thinning
    same = {r["doc_id"] for r in sample_hash(kept, 0.3, seed=5).collect()}
    alone = {r["doc_id"] for r in sample_hash(docs, 0.3, seed=5).collect()}
    assert same == alone
    # distinct seeds: joint keep rate ~ 0.6 * 0.3 (binomial tolerance)
    indep = sample_hash(kept, 0.3, seed=6).count()
    expected = k * 0.3
    assert abs(indep - expected) < 4 * (expected * 0.7) ** 0.5 + 4
    assert k > 0.5 * n  # sanity: the first stage kept ~60%


def test_repetition_weights(spark):
    from generalized_kmeans_clustering_spark.operators.dedup import (
        repetition_weights,
    )

    df = spark.createDataFrame(
        [(i, f"t{i}") for i in range(10)], "doc_id long, text string")
    comp = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 0), (5, 4), (4, 4)],
        "id long, component long")
    out = {r["doc_id"]: (r["component"], r["rep_weight"])
           for r in repetition_weights(df, comp).collect()}
    assert len(out) == 10
    for i in (0, 1, 2, 3):
        assert out[i] == (0, 0.25)
    for i in (4, 5):
        assert out[i] == (4, 0.5)
    for i in (6, 7, 8, 9):
        assert out[i] == (i, 1.0)  # singleton
    # alpha=0 -> no discount; alpha=0.5 -> sqrt discount
    flat = repetition_weights(df, comp, alpha=0.0).collect()
    assert all(r["rep_weight"] == 1.0 for r in flat)
    soft = {r["doc_id"]: r["rep_weight"]
            for r in repetition_weights(df, comp, alpha=0.5).collect()}
    assert abs(soft[0] - 0.5) < 1e-12
    with pytest.raises(ValueError):
        repetition_weights(df, comp, alpha=-1)
