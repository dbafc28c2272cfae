"""Optimized Product Quantization (operators/opq.py): learned
orthogonal rotation in front of PQ (Ge et al., CVPR 2013,
non-parametric alternation)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.opq import (
    OPQModel, opq_decode, opq_encode, opq_topk, read_opq_model,
    rotate_vectors, train_opq, write_opq_model,
)
from generalized_kmeans_clustering_spark.operators.quantization import (
    pq_decode, pq_encode, train_pq,
)

D, M, KSUB, N = 8, 4, 8, 512


def _correlated(seed=0, n=N, d=D):
    """Anisotropic Gaussian rotated by a fixed orthogonal matrix so the
    variance is smeared ACROSS the m subspace cuts — the regime where
    plain PQ wastes codewords and the learned rotation recovers."""
    rng = np.random.default_rng(seed)
    scales = np.linspace(3.0, 0.05, d)
    z = rng.standard_normal((n, d)) * scales
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    return z @ q


@pytest.fixture(scope="module")
def vecs(spark):
    X = _correlated()
    df = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in enumerate(X)],
        "vec_id long, embedding array<double>",
    ).repartition(4).cache()
    df.count()
    return df


def _mse(df, vec_col, rec_col):
    return df.select(F.avg(F.aggregate(
        F.zip_with(vec_col, rec_col, lambda a, b: (a - b) * (a - b)),
        F.lit(0.0), lambda acc, v: acc + v)).alias("e")).first()["e"]


def test_rotation_is_orthogonal(spark, vecs):
    model = train_opq(vecs, m=M, k_sub=KSUB, n_iter=3, pq_iter=3, seed=1)
    R = np.asarray(model.rotation)
    assert R.shape == (D, D)
    assert np.allclose(R.T @ R, np.eye(D), atol=1e-9)
    # rotation preserves norms end-to-end through the UDF
    out = rotate_vectors(vecs, model.rotation, "embedding", "y")
    mism = out.select(
        (F.abs(F.aggregate("embedding", F.lit(0.0),
                           lambda a, v: a + v * v)
               - F.aggregate("y", F.lit(0.0), lambda a, v: a + v * v))
         > 1e-6).alias("bad")).where("bad").count()
    assert mism == 0


def test_opq_distortion_beats_plain_pq(spark, vecs):
    """On cross-subspace-correlated data the learned rotation must cut
    reconstruction MSE vs identity-rotation PQ (same m, k_sub, seed,
    same number of final-fit Lloyd iterations)."""
    pq = train_pq(vecs, m=M, k_sub=KSUB, max_iter=3, seed=1)
    pq_err = _mse(
        pq_decode(pq_encode(vecs, pq), pq), "embedding", "reconstruction")
    opq = train_opq(vecs, m=M, k_sub=KSUB, n_iter=4, pq_iter=3, seed=1)
    opq_err = _mse(
        opq_decode(opq_encode(vecs, opq), opq), "embedding",
        "reconstruction")
    assert opq_err < pq_err * 0.95, (opq_err, pq_err)


def test_n_iter_1_is_plain_pq(spark, vecs):
    """One round = identity rotation + a plain PQ fit: codes match
    train_pq exactly at the same seed/iterations."""
    opq = train_opq(vecs, m=M, k_sub=KSUB, n_iter=1, pq_iter=3, seed=7)
    assert np.allclose(np.asarray(opq.rotation), np.eye(D))
    pq = train_pq(vecs, m=M, k_sub=KSUB, max_iter=3, seed=7)
    a = {r["vec_id"]: r["codes"] for r in opq_encode(vecs, opq).collect()}
    b = {r["vec_id"]: r["codes"] for r in pq_encode(vecs, pq).collect()}
    assert a == b


def test_opq_topk_contract(spark, vecs):
    model = train_opq(vecs, m=M, k_sub=KSUB, n_iter=2, pq_iter=3, seed=3)
    enc = opq_encode(vecs, model).cache()
    q = vecs.where("vec_id < 5")
    out = opq_topk(enc, model, q, k=4, n_queries=5).collect()
    assert len(out) == 20
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        ranks = sorted(r["rank"] for r in rows)
        assert ranks == [1, 2, 3, 4]
        assert all(r["neighbor_id"] != qid for r in rows)  # exclude_self
        dists = [r["approx_dist"] for r in sorted(rows,
                                                  key=lambda r: r["rank"])]
        assert dists == sorted(dists)
    # where= pre-filters candidates before the top-k
    flt = opq_topk(enc, model, q, k=4, n_queries=5,
                   where="vec_id >= 100").collect()
    assert all(r["neighbor_id"] >= 100 for r in flt)
    enc.unpersist()


def test_opq_persistence_roundtrip(spark, vecs, tmp_path):
    model = train_opq(vecs, m=M, k_sub=KSUB, n_iter=2, pq_iter=2, seed=5)
    path = str(tmp_path / "opq_model")
    write_opq_model(spark, model, path)
    back = read_opq_model(spark, path)
    assert back.rotation == model.rotation
    assert back.pq.codebooks == model.pq.codebooks
    assert (back.d, back.m, back.k_sub) == (model.d, model.m, model.k_sub)
    a = {r["vec_id"]: r["codes"] for r in opq_encode(vecs, model).collect()}
    b = {r["vec_id"]: r["codes"] for r in opq_encode(vecs, back).collect()}
    assert a == b


def test_train_opq_validation(spark, vecs):
    with pytest.raises(ValueError, match="n_iter"):
        train_opq(vecs, n_iter=0)
    with pytest.raises(ValueError, match="divide"):
        train_opq(vecs, m=3)
    with pytest.raises(ValueError, match="empty"):
        train_opq(vecs.where("vec_id < 0"))
    with pytest.raises(ValueError, match="square"):
        rotate_vectors(vecs, [[1.0, 0.0]], "embedding")


def test_ivf_opq_identity_matches_ivf_pq(spark, vecs):
    """Identity rotation must reproduce plain residual IVF-PQ exactly
    (same seeds, iterations, probes)."""
    from generalized_kmeans_clustering_spark.operators.opq import (
        ivf_opq_index, ivf_opq_topk,
    )
    from generalized_kmeans_clustering_spark.operators.quantization import (
        ivf_pq_index, ivf_pq_topk,
    )

    eye = np.eye(D).tolist()
    kw = dict(n_lists=4, m=M, k_sub=KSUB, seed=2,
              coarse_max_iter=3, pq_max_iter=3)
    enc_o, co_o, pq_o = ivf_opq_index(vecs, eye, **kw)
    enc_p, co_p, pq_p = ivf_pq_index(vecs, **kw)
    assert pq_o.codebooks == pq_p.codebooks
    q = vecs.where("vec_id < 4")
    a = [tuple(r) for r in ivf_opq_topk(
        enc_o, co_o, pq_o, eye, q, k=3, nprobe=2)
        .orderBy("query_id", "rank").collect()]
    b = [tuple(r) for r in ivf_pq_topk(
        enc_p, co_p, pq_p, q, k=3, nprobe=2)
        .orderBy("query_id", "rank").collect()]
    assert a == b


def test_ivf_opq_learned_rotation_contract(spark, vecs):
    from generalized_kmeans_clustering_spark.operators.opq import (
        ivf_opq_index, ivf_opq_topk, train_opq,
    )

    model = train_opq(vecs, m=M, k_sub=KSUB, n_iter=2, pq_iter=2, seed=4)
    enc, coarse, pq = ivf_opq_index(
        vecs, model.rotation, n_lists=4, m=M, k_sub=KSUB, seed=4,
        coarse_max_iter=2, pq_max_iter=2)
    assert enc.columns == ["vec_id", "_list", "codes"]
    q = vecs.where("vec_id < 3")
    out = ivf_opq_topk(enc, coarse, pq, model.rotation, q, k=4, nprobe=4)
    rows = out.collect()
    assert {r["query_id"] for r in rows} == {0, 1, 2}
    for qid in (0, 1, 2):
        mine = sorted((r for r in rows if r["query_id"] == qid),
                      key=lambda r: r["rank"])
        assert [r["rank"] for r in mine] == [1, 2, 3, 4]
        ds = [r["approx_dist"] for r in mine]
        assert ds == sorted(ds)
        assert all(r["neighbor_id"] != qid for r in mine)


def test_rotate_vectors_null_tolerant(spark, vecs):
    """NULL embeddings rotate to NULL (pq_encode parity) and are
    ignored by the Procrustes cross matrix instead of crashing."""
    from generalized_kmeans_clustering_spark.operators.opq import (
        _procrustes_rotation,
    )

    withnull = vecs.withColumn(
        "embedding",
        F.when(F.col("vec_id") == 0,
               F.lit(None).cast("array<double>"))
        .otherwise(F.col("embedding")))
    out = rotate_vectors(withnull, np.eye(D).tolist(), "embedding", "y")
    rows = {r["vec_id"]: r["y"] for r in out.collect()}
    assert rows[0] is None
    assert rows[1] is not None and len(rows[1]) == D
    # Procrustes over (x, x) with a NULL row: still the identity
    both = out.select(F.col("embedding").alias("x"),
                      F.col("y").alias("h"))
    R = _procrustes_rotation(both, "x", "h", D)
    assert np.allclose(R.T @ R, np.eye(D), atol=1e-9)


def test_opq_topk_serving_plan_shape(spark, vecs):
    """Pin the serving-plan contract for OPQ ADC top-k: codes are
    pure Catalyst (no row-at-a-time BatchEvalPython — the only Python
    is the Arrow-batched rotation matmul), top-k runs through
    WindowGroupLimit, and the per-query LUT join is broadcast with no
    shuffle exchange or cartesian product anywhere in the plan. (On a
    parquet corpus the query predicate additionally reaches the scan
    as a PushedFilter — verified on the oracle query's plan, which
    reads /root/testdata parquet.)"""
    model = OPQModel(
        rotation=[[1.0 if j == D - 1 - i else 0.0 for j in range(D)]
                  for i in range(D)],
        pq=train_opq(vecs, m=M, k_sub=KSUB, n_iter=1, pq_iter=1,
                     seed=3).pq)
    enc = opq_encode(vecs, model)
    out = opq_topk(enc, model, vecs.where(F.col("vec_id") < 4), k=3,
                   n_queries=4)
    plan = out._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode
        .fromString("formatted"))
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" in plan          # the by-design rotation
    assert "WindowGroupLimit" in plan
    assert "BroadcastExchange" in plan
    assert "CartesianProduct" not in plan
    import re
    assert not re.search(r"Exchange (hash|range)partitioning", plan), (
        "OPQ serving must not shuffle")
