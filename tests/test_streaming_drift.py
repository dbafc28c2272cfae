"""Streaming drift monitor (streaming/drift.py): batch parity and
replay idempotence."""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.drift import (
    corpus_drift,
)
from generalized_kmeans_clustering_spark.streaming.drift import (
    StreamingDriftMonitor,
)


@pytest.fixture()
def corpora(spark):
    ref = spark.createDataFrame(
        [(0, "x x y z"), (1, "x w")], "doc_id long, text string"
    )
    arriving = spark.createDataFrame(
        [(10, "x y y"), (11, "y w q"), (12, "z z"), (13, "q q x")],
        "doc_id long, text string",
    )
    return ref, arriving


def _run_stream(spark, tmp_path, ref, arriving, n_files=2):
    root = str(tmp_path)
    indir = f"{root}/in"
    arriving.repartition(n_files, "doc_id").write \
        .mode("overwrite").parquet(indir)
    StreamingDriftMonitor.write_reference(ref, f"{root}/ref")
    mon = StreamingDriftMonitor(
        f"{root}/ref", f"{root}/state", f"{root}/gauges")
    stream = (spark.readStream.schema(arriving.schema)
              .option("maxFilesPerTrigger", 1).parquet(indir))
    q = (stream.writeStream.foreachBatch(mon.process_batch)
         .option("checkpointLocation", f"{root}/ckpt")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return mon


def test_cumulative_equals_batch(spark, tmp_path, corpora):
    ref, arriving = corpora
    mon = _run_stream(spark, tmp_path, ref, arriving)
    got = mon.cumulative_drift(spark).collect()[0]
    want = corpus_drift(ref, arriving).collect()[0]
    for k in ("tokens_a", "tokens_b", "vocab_union", "js", "kl_ab",
              "kl_ba", "tv", "vocab_jaccard"):
        assert got[k] == pytest.approx(want[k]), k


def test_per_batch_history_recorded(spark, tmp_path, corpora):
    ref, arriving = corpora
    mon = _run_stream(spark, tmp_path, ref, arriving)
    hist = mon.gauges(spark).orderBy("batch_id").collect()
    assert len(hist) >= 2  # one gauge row per micro-batch
    assert all(r["js"] >= 0 for r in hist)


def test_batch_replay_idempotent(spark, tmp_path, corpora):
    ref, arriving = corpora
    mon = _run_stream(spark, tmp_path, ref, arriving)
    before = mon.cumulative_drift(spark).collect()[0]
    # simulate a checkpoint replay of batch 0: reprocess the same data
    batch0 = spark.read.parquet(str(tmp_path / "state")) \
        .where(F.col("batch_id") == 0)
    n_before = mon.cumulative_counts(spark).count()
    first_file = arriving.where(F.col("doc_id").isin(
        [r["doc_id"] for r in arriving.limit(2).collect()]))
    # reprocessing overwrites batch 0's partition, not duplicates it
    replay_src = spark.createDataFrame(
        [(r["token"], r["n"]) for r in batch0.select("token", "n")
         .collect()], "token string, n bigint")
    assert replay_src.count() > 0
    del first_file
    docs0_tokens = {r["token"] for r in batch0.collect()}
    # rerun process_batch with the same batch_id on equivalent data
    from generalized_kmeans_clustering_spark.operators.drift import (
        token_counts,
    )
    # reconstruct which docs were in batch 0 is not exposed; instead
    # assert idempotence by re-invoking with identical counts via a
    # synthetic frame whose token_counts equal batch0's counts
    synth = spark.createDataFrame(
        [(0, " ".join(
            t for r in batch0.collect() for t in [r["token"]] * r["n"]))],
        "doc_id long, text string")
    assert {r["token"] for r in token_counts(synth).collect()} \
        == docs0_tokens
    mon.process_batch(synth, 0)
    after = mon.cumulative_drift(spark).collect()[0]
    assert mon.cumulative_counts(spark).count() == n_before
    for k in ("js", "tv", "tokens_b"):
        assert after[k] == pytest.approx(before[k]), k


def test_empty_store_readers(spark, tmp_path, corpora):
    ref, _ = corpora
    StreamingDriftMonitor.write_reference(ref, str(tmp_path / "ref"))
    mon = StreamingDriftMonitor(
        str(tmp_path / "ref"), str(tmp_path / "state"),
        str(tmp_path / "gauges"))
    assert mon.gauges(spark).count() == 0
    assert mon.cumulative_counts(spark).count() == 0


def test_alpha_validation(tmp_path):
    with pytest.raises(ValueError):
        StreamingDriftMonitor("r", "s", "g", alpha=-0.1)
