"""Training-shard sink: write/read/verify + partition pruning."""

from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.functions import text as Tx
from generalized_kmeans_clustering_spark.operators.packing import (
    materialize_packs,
    pack_concat,
)
from generalized_kmeans_clustering_spark.sources.shards import (
    read_training_shards,
    shard_manifest,
    verify_training_shards,
    write_training_shards,
)


def _packs(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    spans = pack_concat(
        docs.select("doc_id", Tx.token_count(F.col("text"))
                    .alias("n_tokens")),
        seq_len=64, num_shards=8, seed=1,
    )
    return materialize_packs(docs, spans)


def test_roundtrip_and_verify_intact(spark, sf_dir, tmp_path):
    packs = _packs(spark, sf_dir)
    path = str(tmp_path / "shards")
    write_training_shards(packs, path)
    got, manifest = read_training_shards(spark, path)
    assert got.count() == packs.count()
    m = {r["shard"]: r for r in manifest.collect()}
    assert len(m) == 8
    # manifest totals equal the data totals per shard
    want = {r["shard"]: r for r in shard_manifest(packs).collect()}
    for s in want:
        assert m[s]["n_packs"] == want[s]["n_packs"]
        assert m[s]["n_tokens"] == want[s]["n_tokens"]
        assert m[s]["sha256"] == want[s]["sha256"]
    # verification passes on intact data
    assert verify_training_shards(spark, path).count() == 0


def test_manifest_is_reproducible_across_runs(spark, sf_dir):
    a = {r["shard"]: r["sha256"]
         for r in shard_manifest(_packs(spark, sf_dir)).collect()}
    b = {r["shard"]: r["sha256"]
         for r in shard_manifest(_packs(spark, sf_dir)).collect()}
    assert a == b


def test_verify_detects_tampered_manifest(spark, sf_dir, tmp_path):
    packs = _packs(spark, sf_dir)
    path = str(tmp_path / "shards")
    write_training_shards(packs, path)
    _, manifest = read_training_shards(spark, path)
    rows = [
        (r["shard"], r["n_packs"], r["n_docs"], r["n_tokens"],
         "0" * 64 if r["shard"] == 3 else r["sha256"])
        for r in manifest.collect()  # materialize before overwriting
    ]
    bad = spark.createDataFrame(
        rows,
        "shard int, n_packs long, n_docs long, n_tokens long, sha256 string",
    )
    bad.coalesce(1).write.mode("overwrite").json(f"{path}/manifest")
    rows = verify_training_shards(spark, path).collect()
    assert [r["shard"] for r in rows] == [3]
    assert rows[0]["expected_sha256"] == "0" * 64
    assert rows[0]["actual_sha256"] != rows[0]["expected_sha256"]


def test_single_shard_read_prunes_partitions(spark, sf_dir, tmp_path):
    packs = _packs(spark, sf_dir)
    path = str(tmp_path / "shards")
    write_training_shards(packs, path)
    got, _ = read_training_shards(spark, path)
    one = got.where(F.col("shard") == 5)
    plan = one._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan
    assert one.count() > 0
    assert one.select("shard").distinct().collect()[0]["shard"] == 5


def test_null_text_pack_changes_shard_digest(spark):
    """ADVICE r6: array_join silently skips NULL elements, so a shard
    with a NULL-text pack used to hash identically to the shard with
    that pack absent — the integrity gate was blind to it. The NULL
    sentinel must also stay distinct from an empty-text pack."""
    schema = "shard int, pack long, n_docs long, n_tokens long, text string"
    intact = spark.createDataFrame(
        [(0, 0, 1, 4, "aaaa"), (0, 1, 1, 4, "bbbb")], schema)
    nulled = spark.createDataFrame(
        [(0, 0, 1, 4, "aaaa"), (0, 1, 1, 4, None)], schema)
    absent = spark.createDataFrame([(0, 0, 1, 4, "aaaa")], schema)
    empty = spark.createDataFrame(
        [(0, 0, 1, 4, "aaaa"), (0, 1, 1, 0, "")], schema)
    digests = [shard_manifest(d).collect()[0]["sha256"]
               for d in (intact, nulled, absent, empty)]
    assert len(set(digests)) == 4, digests


def test_id_packs_roundtrip_with_integrity_gate(spark, tmp_path):
    """Packed token-ID sequences write/read/verify through the same
    content-addressed sink: intact shards verify clean, a tampered ID
    stream is caught, and text-vs-ids digests never collide."""
    from generalized_kmeans_clustering_spark.operators.packing import (
        materialize_packs_ids, pack_concat,
    )
    from generalized_kmeans_clustering_spark.operators.tokenizer import (
        BPEModel, bpe_encode,
    )
    from generalized_kmeans_clustering_spark.sources.shards import (
        read_training_shards, verify_training_shards,
        write_training_shards,
    )

    model = BPEModel(merges=[["e", "s"], ["es", "t"]])
    df = spark.createDataFrame(
        [(i, "newest widest " * (i % 4 + 1)) for i in range(30)],
        "doc_id long, text string")
    enc = bpe_encode(df, model)
    counted = enc.select(
        "doc_id", F.size("token_ids").cast("bigint").alias("n_tokens"))
    spans = pack_concat(counted, seq_len=32, num_shards=2, seed=2)
    packs = materialize_packs_ids(enc, spans)
    path = str(tmp_path / "idshards")
    write_training_shards(packs, path, content_col="token_ids")
    got, manifest = read_training_shards(spark, path)
    assert got.count() == packs.count()
    assert verify_training_shards(
        spark, path, content_col="token_ids").count() == 0
    # tamper: rewrite one shard's data with one id flipped
    bad = got.withColumn(
        "token_ids",
        F.when(F.col("shard") == 0,
               F.concat(F.slice("token_ids", 1, 1),
                        F.slice("token_ids", 1, 10000)))
        .otherwise(F.col("token_ids")))
    bad.localCheckpoint(eager=True) \
        .write.mode("overwrite").partitionBy("shard") \
        .parquet(f"{path}/data")
    broken = verify_training_shards(
        spark, path, content_col="token_ids").collect()
    assert {r["shard"] for r in broken} == {0}
