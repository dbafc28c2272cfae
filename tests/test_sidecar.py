"""Shared checksummed model-sidecar layout (sources/sidecar.py):
round-trips for all three migrated models, checksum verification,
kind dispatch, and pre-r7 legacy-layout readability."""

import json

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.sources.sidecar import (
    read_model_sidecar,
    write_model_sidecar,
)


def test_roundtrip_verifies_and_returns_payload(spark, tmp_path):
    payload = {"a": [1.0, 2.5], "b": "x", "n": 7}
    write_model_sidecar(spark, str(tmp_path / "m"), "demo", payload)
    assert read_model_sidecar(spark, str(tmp_path / "m"), "demo") == payload


def test_kind_mismatch_and_corruption_fail_loudly(spark, tmp_path):
    path = str(tmp_path / "m")
    write_model_sidecar(spark, path, "demo", {"w": [1.0]})
    with pytest.raises(ValueError, match="kind"):
        read_model_sidecar(spark, path, "other")
    # flip a payload byte in place: the SIDECAR's sha256 must catch it
    # (drop Hadoop's local-FS .crc so we test our integrity layer, not
    # the transport's)
    import glob
    import os

    f = glob.glob(f"{path}/part-*.json")[0]
    row = json.loads(open(f).read())
    row["payload"] = row["payload"].replace("1.0", "2.0")
    open(f, "w").write(json.dumps(row))
    for crc in glob.glob(f"{path}/.*.crc"):
        os.remove(crc)
    with pytest.raises(IOError, match="checksum"):
        read_model_sidecar(spark, path, "demo")


def test_lr_model_roundtrips_through_shared_layout(spark, tmp_path):
    from generalized_kmeans_clustering_spark.operators.classifier import (
        HashedLRModel, read_lr_model, write_lr_model,
    )

    m = HashedLRModel(weights=[0.5, -1.5, 0.0], bias=0.25,
                      n_buckets=3, seed=9, hash_fn="xxhash64")
    write_lr_model(spark, m, str(tmp_path / "lr"))
    got = read_lr_model(spark, str(tmp_path / "lr"))
    assert got.weights == m.weights and got.bias == m.bias
    assert (got.n_buckets, got.seed, got.hash_fn) == (3, 9, "xxhash64")
    # the file on disk IS the shared layout
    raw = spark.read.json(str(tmp_path / "lr")).first()
    assert raw["kind"] == "hashed_lr" and raw["layout_version"] == 1


def test_lr_legacy_layout_still_readable(spark, tmp_path):
    """Pre-r7 sidecars (bare field columns, no payload/sha256) load."""
    from generalized_kmeans_clustering_spark.operators.classifier import (
        read_lr_model,
    )

    legacy = spark.createDataFrame(
        [([1.0, 2.0], 0.5, 2, 4, "md5")],
        "weights array<double>, bias double, n_buckets int, "
        "seed int, hash_fn string",
    )
    legacy.coalesce(1).write.json(str(tmp_path / "old"))
    got = read_lr_model(spark, str(tmp_path / "old"))
    assert got.weights == [1.0, 2.0] and got.hash_fn == "md5"


def test_pq_model_roundtrips_and_legacy_readable(spark, tmp_path):
    from generalized_kmeans_clustering_spark.operators.quantization import (
        PQModel, read_pq_model, write_pq_model,
    )

    cbs = [[[0.0, 0.0], [1.0, 1.0]], [[2.0, 2.0], [3.0, 3.0]]]
    m = PQModel(codebooks=cbs, d=4)
    write_pq_model(spark, m, str(tmp_path / "pq"))
    got = read_pq_model(spark, str(tmp_path / "pq"))
    assert got.codebooks == cbs and got.d == 4
    raw = spark.read.json(str(tmp_path / "pq")).first()
    assert raw["kind"] == "pq_codebooks"
    legacy = spark.createDataFrame(
        [(2, 2, 4, cbs)],
        "m int, k_sub int, d int, codebooks array<array<array<double>>>",
    )
    legacy.coalesce(1).write.json(str(tmp_path / "pqold"))
    got2 = read_pq_model(spark, str(tmp_path / "pqold"))
    assert got2.codebooks == cbs and got2.d == 4


def test_ivf_index_roundtrips_and_legacy_readable(spark, tmp_path):
    from generalized_kmeans_clustering_spark.operators.similarity import (
        ivf_index, read_ivf_index, write_ivf_index,
    )

    df = spark.createDataFrame(
        [(i, [float(i % 2), float(i % 3), 1.0]) for i in range(12)],
        "vec_id long, embedding array<double>")
    indexed, model = ivf_index(df, n_lists=2, seed=0, max_iter=2)
    path = str(tmp_path / "ivf")
    write_ivf_index(indexed, model, path)
    raw = spark.read.json(f"{path}/centroids").first()
    assert raw["kind"] == "ivf_centroids" and raw["sha256"]
    got_df, got_model = read_ivf_index(spark, path)
    assert got_df.count() == 12
    assert [list(c) for c in got_model.centers] == [
        list(c) for c in model.centers]
    # r4-r6 bespoke layout still reads
    legacy = spark.createDataFrame(
        [(2, 3, model.kernel_name,
          [[float(v) for v in c] for c in model.centers])],
        "n_lists int, dim int, kernel string, "
        "centers array<array<double>>",
    )
    legacy.coalesce(1).write.mode("overwrite").json(f"{path}/centroids")
    got_df2, got_model2 = read_ivf_index(spark, path)
    assert [list(c) for c in got_model2.centers] == [
        list(c) for c in model.centers]
