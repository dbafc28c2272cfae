"""Tests for StreamingKMeans: decay math, dying split, foreachBatch."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.streaming.streaming_kmeans import (
    StreamingKMeans, StreamingKMeansModel,
)


def _mkdf(spark, pts):
    return spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )


def test_update_moves_centers_toward_batch(spark):
    m = StreamingKMeansModel(
        centers=np.array([[0.0, 0.0], [10.0, 10.0]]),
        weights=np.array([10.0, 10.0]),
    )
    rng = np.random.default_rng(101)
    batch = rng.normal([0.0, 0.0], 0.1, (20, 2)) + [1.0, 0.0]
    m.update(_mkdf(spark, batch))
    # cluster 0 pulled toward [1,0] by weight ratio 20/(10+20)
    assert m.centers[0][0] == pytest.approx(20.0 / 30.0, abs=0.1)
    assert m.weights[0] == pytest.approx(30.0)
    assert m.weights[1] == pytest.approx(10.0)  # untouched, no decay=1.0


def test_decay_factor_forgets_history(spark):
    m_nodecay = StreamingKMeansModel(
        centers=np.array([[0.0, 0.0]]), weights=np.array([100.0]),
        decay_factor=1.0,
    )
    m_decay = StreamingKMeansModel(
        centers=np.array([[0.0, 0.0]]), weights=np.array([100.0]),
        decay_factor=0.1,
    )
    batch = np.full((10, 2), 5.0)
    df = _mkdf(spark, batch)
    m_nodecay.update(df)
    m_decay.update(df)
    # decayed model forgets the 100-point prior faster → moves further
    assert m_decay.centers[0][0] > m_nodecay.centers[0][0]
    assert m_decay.centers[0][0] == pytest.approx(5.0 * 10 / 20.0, abs=0.01)


def test_half_life_sets_decay():
    est = StreamingKMeans(k=2, half_life=2.0)
    assert est.decay_factor == pytest.approx(0.5 ** 0.5)


def test_dying_cluster_split(spark):
    m = StreamingKMeansModel(
        centers=np.array([[0.0, 0.0], [50.0, 50.0]]),
        weights=np.array([1000.0, 1e-7]),
    )
    batch = np.random.default_rng(5).normal([0, 0], 0.1, (5, 2))
    m.update(_mkdf(spark, batch))
    # dead cluster re-seeded near the heavy one, weights split
    assert m.weights[0] == pytest.approx(m.weights[1])
    assert np.linalg.norm(m.centers[1] - [0, 0]) < 1.0


def test_fit_then_streaming_updater(spark, tmp_path):
    rng = np.random.default_rng(103)
    warm = np.concatenate([
        rng.normal([0, 0], 0.3, (40, 2)), rng.normal([8, 8], 0.3, (40, 2)),
    ])
    model = StreamingKMeans(k=2, seed=7, max_iter=10).fit(_mkdf(spark, warm))
    c0 = model.centers.copy()

    # stream: parquet-file source, two files of drifted data
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    drift = np.concatenate([
        rng.normal([1.0, 0.0], 0.3, (50, 2)),
        rng.normal([9.0, 8.0], 0.3, (50, 2)),
    ])
    _mkdf(spark, drift).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("features array<double>").parquet(src)
    )
    updater = model.create_streaming_updater(checkpoint_dir=ckpt)
    q = updater.update_on(stream, trigger={"availableNow": True})
    q.awaitTermination(120)
    assert model.num_batches >= 1
    # centers drifted toward the new means
    moved = np.abs(model.centers - c0).sum()
    assert moved > 0.1
    # snapshot written and loadable
    m2 = StreamingKMeansModel.read_snapshot(spark, ckpt)
    assert np.allclose(m2.centers, model.centers)
    assert np.allclose(m2.weights, model.weights)


def test_transform_inherits_model_surface(spark):
    m = StreamingKMeansModel(
        centers=np.array([[0.0, 0.0], [10.0, 10.0]]),
        weights=np.array([1.0, 1.0]),
    )
    df = _mkdf(spark, [[0.1, 0.1], [9.9, 9.9]])
    out = m.transform(df).select("prediction").collect()
    assert [r["prediction"] for r in out] == [0, 1]


def test_streaming_exact_dedup_drops_repeats(spark, tmp_path):
    """Watermarked dropDuplicatesWithinWatermark keyed on the content
    fingerprint: repeated texts inside the horizon survive once."""
    import datetime as dt

    from generalized_kmeans_clustering_spark.streaming.dedup import (
        streaming_exact_dedup,
    )

    src = str(tmp_path / "docs_src")
    ckpt = str(tmp_path / "docs_ckpt")
    os.makedirs(src, exist_ok=True)
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = [
        (1, "alpha beta gamma", t0),
        (2, "alpha beta gamma", t0 + dt.timedelta(seconds=10)),  # dup
        (3, "delta epsilon", t0 + dt.timedelta(seconds=20)),
        (4, "delta epsilon", t0 + dt.timedelta(seconds=30)),     # dup
        (5, "unique text here", t0 + dt.timedelta(seconds=40)),
    ]
    spark.createDataFrame(
        rows, "doc_id long, text string, ts timestamp"
    ).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(
        "doc_id long, text string, ts timestamp").parquet(src)
    out = streaming_exact_dedup(stream, ts_col="ts", watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("dedup_sink")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql("SELECT doc_id FROM dedup_sink").collect()
    kept_texts = spark.sql(
        "SELECT count(DISTINCT doc_id) AS n FROM dedup_sink").first()["n"]
    assert kept_texts == 3
    ids = sorted(r["doc_id"] for r in got)
    assert len(ids) == 3
    assert 5 in ids  # the unique doc always survives


def test_streaming_minhash_signatures_stateless(spark, tmp_path):
    """Signature computation is a stateless projection: the streaming
    result equals the batch operator on the same rows."""
    from generalized_kmeans_clustering_spark.operators.dedup import (
        minhash_signatures,
    )
    from generalized_kmeans_clustering_spark.streaming.dedup import (
        streaming_minhash_signatures,
    )

    src = str(tmp_path / "sig_src")
    ckpt = str(tmp_path / "sig_ckpt")
    os.makedirs(src, exist_ok=True)
    batch = spark.createDataFrame(
        [(1, "the quick brown fox jumps"), (2, "over the lazy dog today"),
         (3, "the quick brown fox jumps")],
        "doc_id long, text string",
    )
    batch.write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (streaming_minhash_signatures(stream, num_hashes=8)
         .writeStream.format("memory").queryName("sig_sink")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r["doc_id"]: list(r["signature"])
           for r in spark.sql("SELECT * FROM sig_sink").collect()}
    want = {r["doc_id"]: list(r["signature"])
            for r in minhash_signatures(batch, num_hashes=8).collect()}
    assert got == want
    assert got[1] == got[3]  # identical text -> identical signature


def test_streaming_near_dup_across_batches(spark, tmp_path):
    """Cross-batch near-dups: a doc arriving in batch 1 is caught
    against a batch-0 doc through the signature state store; replaying
    a batch is idempotent."""
    from generalized_kmeans_clustering_spark.streaming.dedup import (
        StreamingNearDup,
    )

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the field all afternoon long") * 2
    nd = StreamingNearDup(
        state_dir=str(tmp_path / "state"),
        pairs_dir=str(tmp_path / "pairs"),
        num_hashes=16, num_bands=4, threshold=0.5,
    )
    b0 = spark.createDataFrame(
        [(1, base), (2, "completely different content about databases "
                        "and distributed query engines running at scale")],
        "doc_id long, text string")
    nd.process_batch(b0, 0)
    got0 = {(r["i"], r["j"]) for r in nd.pairs(spark).collect()}
    assert got0 == set()  # nothing similar within batch 0

    b1 = spark.createDataFrame(
        [(3, base + " with a small tail edit"),
         (4, "yet another unrelated piece of text entirely")],
        "doc_id long, text string")
    nd.process_batch(b1, 1)
    got1 = {(r["i"], r["j"]) for r in nd.pairs(spark).collect()}
    assert (3, 1) in got1 or (1, 3) in got1   # cross-batch dup found
    assert all({i, j} != {2, 4} for i, j in got1)

    # replay batch 1 (checkpoint recovery): same result, no duplication
    nd.process_batch(b1, 1)
    got2 = [(r["i"], r["j"]) for r in nd.pairs(spark).collect()]
    assert sorted(got2) == sorted(got1)

    ests = [r["est_jaccard"] for r in nd.pairs(spark).collect()]
    assert all(0.5 <= e <= 1.0 for e in ests)


def test_streaming_near_dup_via_foreachBatch(spark, tmp_path):
    """The handler works as a real foreachBatch sink."""
    from generalized_kmeans_clustering_spark.streaming.dedup import (
        StreamingNearDup,
    )

    src = str(tmp_path / "nd_src")
    os.makedirs(src, exist_ok=True)
    text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau") * 2
    spark.createDataFrame(
        [(10, text), (11, text + " small change at the end here"),
         (12, "nothing like the others at all in any way")],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(src)
    nd = StreamingNearDup(
        state_dir=str(tmp_path / "nd_state"),
        pairs_dir=str(tmp_path / "nd_pairs"),
        num_hashes=16, num_bands=4, threshold=0.5,
    )
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    q = (stream.writeStream.foreachBatch(nd.process_batch)
         .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r["i"], r["j"]) for r in nd.pairs(spark).collect()}
    assert (10, 11) in got


def test_streaming_near_dup_matches_batch_lsh(spark, sf_dir, tmp_path):
    """Batch parity: a 3-batch streamed run over the documents table
    must emit exactly the pairs the batch operators produce —
    lsh_candidate_pairs candidates filtered by the same
    estimated-Jaccard — independent of micro-batch boundaries."""
    from pyspark.sql import functions as F

    from generalized_kmeans_clustering_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_signatures,
    )
    from generalized_kmeans_clustering_spark.streaming.dedup import (
        StreamingNearDup,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    src = str(tmp_path / "nd_src")
    docs.repartition(3, "doc_id").write.mode("overwrite").parquet(src)

    nd = StreamingNearDup(
        state_dir=str(tmp_path / "nd_state"),
        pairs_dir=str(tmp_path / "nd_pairs"),
        num_hashes=16, num_bands=4, shingle_n=3, threshold=0.5,
        seed=42, hash_fn="md5")
    stream = (spark.readStream.schema(docs.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.foreachBatch(nd.process_batch)
         .option("checkpointLocation", str(tmp_path / "nd_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    streamed = {
        (r["i"], r["j"], r["est_jaccard"])
        for r in nd.pairs(spark)
        .select(F.least("i", "j").alias("i"),
                F.greatest("i", "j").alias("j"), "est_jaccard")
        .distinct().collect()
    }

    sigs = minhash_signatures(docs, num_hashes=16, shingle_n=3,
                              seed=42, hash_fn="md5")
    cand = lsh_candidate_pairs(sigs, num_bands=4)
    batch = {
        (r["i"], r["j"], r["est_jaccard"])
        for r in cand
        .join(sigs.select(F.col("doc_id").alias("i"),
                          F.col("signature").alias("_si")), "i")
        .join(sigs.select(F.col("doc_id").alias("j"),
                          F.col("signature").alias("_sj")), "j")
        .withColumn(
            "est_jaccard",
            F.aggregate(
                F.zip_with("_si", "_sj",
                           lambda a, b: (a == b).cast("int")),
                F.lit(0), lambda acc, v: acc + v) / F.lit(16.0))
        .where(F.col("est_jaccard") >= 0.5)
        .select("i", "j", "est_jaccard").collect()
    }
    assert streamed == batch and len(batch) > 0


def test_streaming_lsh_pairs_watermarked_join(spark, tmp_path):
    """TRUE stream-stream LSH join: near-dups within the event-time
    horizon pair across micro-batch boundaries; the same content
    farther apart than the horizon does not; band multi-matches emit
    once."""
    import datetime

    from pyspark.sql import functions as F

    from generalized_kmeans_clustering_spark.streaming.dedup import (
        streaming_lsh_pairs,
    )

    text = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "lambda mu nu xi omicron pi rho sigma tau ") * 2
    t0 = datetime.datetime(2026, 1, 1, 0, 0, 0)
    m = datetime.timedelta(minutes=1)
    src = str(tmp_path / "ss_src")
    # two files -> two micro-batches (maxFilesPerTrigger=1); the
    # (1, 2) near-dup pair spans the batch boundary
    spark.createDataFrame(
        [(1, text, t0),
         (3, "completely different content here in every way", t0 + 2 * m)],
        "doc_id long, text string, ts timestamp",
    ).coalesce(1).write.parquet(f"{src}/f0")
    spark.createDataFrame(
        [(2, text + "tiny change", t0 + m),
         (4, text, t0 + datetime.timedelta(hours=3))],  # out of horizon
        "doc_id long, text string, ts timestamp",
    ).coalesce(1).write.parquet(f"{src}/f1")

    stream = (spark.readStream
              .schema("doc_id long, text string, ts timestamp")
              .option("maxFilesPerTrigger", 1)
              .parquet(f"{src}/*"))
    pairs = streaming_lsh_pairs(
        stream, ts_col="ts", horizon="10 minutes",
        num_hashes=16, num_bands=4, threshold=0.5)
    out = str(tmp_path / "ss_out")
    q = (pairs.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ss_ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(300)
    got = sorted((r["i"], r["j"]) for r in spark.read.parquet(out).collect())
    assert got == [(1, 2)]  # cross-batch, in-horizon, emitted once
    est = spark.read.parquet(out).first()["est_jaccard"]
    assert 0.5 <= est <= 1.0


def test_streaming_throttle_batch_parity_in_order(spark, tmp_path):
    """streaming_throttle (dropDuplicatesWithinWatermark on the fixed
    window bucket) equals the batch throttle on an in-order replay —
    one parquet file sorted by ts, so arrival order = event-time
    order and first-arrival = earliest-event semantics coincide."""
    import datetime as dt

    from generalized_kmeans_clustering_spark.operators.rollup import (
        throttle_events,
    )
    from generalized_kmeans_clustering_spark.streaming.dedup import (
        streaming_throttle,
    )

    src = str(tmp_path / "ev_src")
    ckpt = str(tmp_path / "ev_ckpt")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    rows = []
    eid = 0
    for u in range(3):
        for s in (0, 5, 30, 61, 65, 200):  # bursts inside 60s windows
            rows.append((eid, u, "x", t0 + dt.timedelta(seconds=s)))
            eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    df.orderBy("ts", "event_id").coalesce(1).write.mode(
        "overwrite").parquet(src)

    stream = spark.readStream.schema(
        "event_id long, user_id long, event_type string, ts timestamp"
    ).parquet(src)
    out = streaming_throttle(stream, ("user_id", "event_type"), "ts",
                             window_seconds=60.0, watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("throttle_sink")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in
                 spark.sql("SELECT event_id FROM throttle_sink").collect())
    exp = sorted(r["event_id"] for r in throttle_events(
        df, ("user_id", "event_type"), "ts", window_seconds=60.0,
        tiebreak_col="event_id").collect())
    assert got == exp
    # 6 events per user -> windows 0s,61s,200s survive => 3 per user
    assert len(got) == 9


def test_streaming_throttle_fractional_window_grid(spark, tmp_path):
    """The dedup-based streaming_throttle must tile the SAME epoch
    grid as batch throttle_events for fractional windows (8.2 s:
    truncating w_us gives 8_199_999 vs the shared rounded 8_200_000 —
    boundary events land in different buckets and parity breaks; the
    r12 advisor caught this third throttle implementation still
    truncating after the other two were unified)."""
    import datetime as dt

    from generalized_kmeans_clustering_spark.operators.rollup import (
        throttle_events,
    )
    from generalized_kmeans_clustering_spark.streaming.dedup import (
        streaming_throttle,
    )

    from generalized_kmeans_clustering_spark.operators.rollup import (
        throttle_grid_us,
    )

    src = str(tmp_path / "frac_src")
    ckpt = str(tmp_path / "frac_ckpt")
    t0 = dt.datetime(2026, 1, 1, 12, 0, 0)
    # The grid is ABSOLUTE-epoch-aligned: place two events 10 µs apart
    # straddling the next rounded-grid boundary after t0 — different
    # rounded buckets by construction, (almost surely) the same bucket
    # under the old truncated grid, which therefore dropped one.
    w = throttle_grid_us(8.2)
    assert w == 8_200_000
    e0 = int(t0.replace(tzinfo=dt.timezone.utc).timestamp() * 1_000_000)
    boundary = ((e0 // w) + 1) * w  # next grid line, in epoch µs
    epoch = dt.datetime(1970, 1, 1)
    rows = [
        # ≥ one full window before the boundary pair → its own bucket
        (1, 1, "x", t0 - dt.timedelta(seconds=20)),
        (2, 1, "x", epoch + dt.timedelta(microseconds=boundary - 10)),
        (3, 1, "x", epoch + dt.timedelta(microseconds=boundary)),
        (4, 1, "x", t0 + dt.timedelta(seconds=500)),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, event_type string, ts timestamp")
    df.orderBy("ts", "event_id").coalesce(1).write.mode(
        "overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    out = streaming_throttle(stream, ("user_id", "event_type"), "ts",
                             window_seconds=8.2, watermark="1 hour")
    q = (out.writeStream.format("memory").queryName("throttle_frac")
         .option("checkpointLocation", ckpt)
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted(r["event_id"] for r in
                 spark.sql("SELECT event_id FROM throttle_frac").collect())
    exp = sorted(r["event_id"] for r in throttle_events(
        df, ("user_id", "event_type"), "ts", window_seconds=8.2,
        tiebreak_col="event_id").collect())
    assert got == exp
    # events 2 and 3 are in DIFFERENT rounded-grid buckets (9 vs 10):
    # all four survive; the truncated grid would merge them and drop 3
    assert got == [1, 2, 3, 4]


def test_streaming_near_dup_where_filter(spark, tmp_path):
    """The where= candidate predicate excludes rows BEFORE signatures:
    filtered docs never enter the signature store or any pair."""
    from generalized_kmeans_clustering_spark.streaming.dedup import (
        StreamingNearDup,
    )

    base = ("the quick brown fox jumps over the lazy dog and keeps "
            "running through the field all afternoon long") * 2
    nd = StreamingNearDup(
        state_dir=str(tmp_path / "state"),
        pairs_dir=str(tmp_path / "pairs"),
        num_hashes=16, num_bands=4, threshold=0.5,
        where="lang = 'en'",
    )
    b0 = spark.createDataFrame(
        [(1, base, "en"), (2, base + " tail", "de")],
        "doc_id long, text string, lang string")
    nd.process_batch(b0, 0)
    # doc 2 is near-identical but filtered out — no pair
    assert nd.pairs(spark).count() == 0
    state = spark.read.parquet(str(tmp_path / "state"))
    assert {r["doc_id"] for r in state.collect()} == {1}

    b1 = spark.createDataFrame(
        [(3, base + " with a small edit", "en")],
        "doc_id long, text string, lang string")
    nd.process_batch(b1, 1)
    got = {(r["i"], r["j"]) for r in nd.pairs(spark).collect()}
    assert got and all({i, j} == {1, 3} for i, j in got)
