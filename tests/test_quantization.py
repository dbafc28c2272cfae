"""Product quantization (train_pq / pq_encode / pq_decode / pq_topk)."""

import math

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.quantization import (
    PQModel,
    pq_decode,
    pq_encode,
    pq_topk,
    train_pq,
)

# 4-dim vectors, m=2 subspaces of 2 dims; codebooks with 2 codewords
# per subspace placed exactly at the data's subvector values
CB = [
    [[0.0, 0.0], [10.0, 10.0]],   # subspace 0
    [[0.0, 5.0], [5.0, 0.0]],     # subspace 1
]
MODEL = PQModel(codebooks=CB, d=4)


def _df(spark):
    rows = [
        (0, [0.1, -0.1, 0.0, 5.1]),    # codes (0, 0)
        (1, [9.9, 10.2, 4.9, 0.1]),    # codes (1, 1)
        (2, [10.1, 9.8, 0.2, 4.8]),    # codes (1, 0)
        (3, [0.0, 0.3, 5.2, -0.2]),    # codes (0, 1)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_encode_picks_nearest_codeword_per_subspace(spark):
    out = pq_encode(_df(spark), MODEL).collect()
    got = {r["vec_id"]: list(r["codes"]) for r in out}
    assert got == {0: [0, 0], 1: [1, 1], 2: [1, 0], 3: [0, 1]}


def test_decode_reconstructs_codeword_concat(spark):
    enc = pq_encode(_df(spark), MODEL)
    dec = pq_decode(enc, MODEL).collect()
    rec = {r["vec_id"]: list(r["reconstruction"]) for r in dec}
    assert rec[0] == [0.0, 0.0, 0.0, 5.0]
    assert rec[1] == [10.0, 10.0, 5.0, 0.0]
    # distortion vs original is the small placement noise only
    for r in dec:
        err = sum((a - b) ** 2
                  for a, b in zip(r["embedding"], r["reconstruction"]))
        assert err < 0.2


def test_exact_codeword_vectors_have_zero_adc_distance(spark):
    rows = [(10, [0.0, 0.0, 5.0, 0.0]), (11, [10.0, 10.0, 0.0, 5.0])]
    df = _df(spark).union(
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"))
    enc = pq_encode(df, MODEL)
    out = pq_topk(enc, MODEL, df.where(F.col("vec_id") == 10), k=6,
                  exclude_self=False)
    got = {r["neighbor_id"]: r["approx_dist"] for r in out.collect()}
    # self distance is exactly 0 (vector 10 IS codewords (0,1))
    assert got[10] == 0.0
    # vector 3 shares the same codes → identical ADC distance 0
    assert got[3] == 0.0


def test_topk_orders_by_additive_lookup(spark):
    df = _df(spark)
    enc = pq_encode(df, MODEL)
    out = pq_topk(enc, MODEL, df.where(F.col("vec_id") == 0), k=3)
    rows = out.orderBy("rank").collect()
    assert [r["neighbor_id"] for r in rows] == [3, 2, 1]
    dists = [r["approx_dist"] for r in rows]
    assert dists == sorted(dists)
    # ADC = sum of query-subvector-to-codeword distances for the
    # neighbor's codes: neighbor 3 is (0, 1) → d(q0, cb0[0]) +
    # d(q1, cb1[1]) with q = [0.1,-0.1 | 0.0,5.1]
    expected = (0.1**2 + 0.1**2) + (5.0**2 + 5.1**2)
    assert math.isclose(dists[0], expected, rel_tol=1e-9)


def test_train_pq_recovers_subspace_clusters(spark):
    import random

    rng = random.Random(0)
    rows = []
    for i in range(400):
        a = [0.0, 0.0] if i % 2 == 0 else [10.0, 10.0]
        b = [0.0, 5.0] if i % 3 == 0 else [5.0, 0.0]
        vec = [x + rng.gauss(0, 0.05) for x in a + b]
        rows.append((i, vec))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    model = train_pq(df, m=2, k_sub=2, seed=1, max_iter=8)
    assert model.m == 2 and model.k_sub == 2 and model.dsub == 2
    # each learned codebook has one codeword near each true center
    for j, truths in enumerate([[[0, 0], [10, 10]], [[0, 5], [5, 0]]]):
        for t in truths:
            best = min(
                sum((a - b) ** 2 for a, b in zip(c, t))
                for c in model.codebooks[j]
            )
            assert best < 0.1, (j, t, model.codebooks[j])
    # reconstruction error after training is the noise floor
    enc = pq_decode(pq_encode(df, model), model)
    mse = enc.select(
        F.aggregate(
            F.zip_with("embedding", "reconstruction",
                       lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, v: acc + v,
        ).alias("e")
    ).agg(F.avg("e")).first()[0]
    assert mse < 0.1


def test_train_pq_validates_m(spark):
    with pytest.raises(ValueError, match="divide"):
        train_pq(_df(spark), m=3, k_sub=2)


def test_encode_plan_is_python_free(spark):
    enc = pq_encode(_df(spark), MODEL)
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan


# ---- IVF-PQ (residual-encoded) ----

from generalized_kmeans_clustering_spark.operators.quantization import (  # noqa: E402
    ivf_pq_index,
    ivf_pq_topk,
)

COARSE = [[0.0, 0.0, 0.0, 0.0], [10.0, 10.0, 10.0, 10.0]]
RES_CB = [
    [[0.0, 0.0], [1.0, 1.0]],     # subspace 0 residual codewords
    [[0.0, 0.0], [-1.0, -1.0]],   # subspace 1 residual codewords
]


def _ivf_df(spark):
    rows = [
        (0, [0.1, 0.1, 0.0, 0.0]),      # list 0, residual codes (0, 0)
        (1, [1.0, 1.0, -1.0, -1.0]),    # list 0, residual codes (1, 1)
        (2, [10.0, 10.0, 10.0, 10.0]),  # list 1, residual codes (0, 0)
        (3, [11.0, 11.0, 9.0, 9.0]),    # list 1, residual codes (1, 1)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _pinned_index(spark):
    return ivf_pq_index(
        _ivf_df(spark), n_lists=2, m=2, k_sub=2, seed=0,
        coarse_max_iter=0, pq_max_iter=0,
        initial_coarse=COARSE, initial_codebooks=RES_CB,
    )


def test_ivf_pq_index_lists_and_residual_codes(spark):
    enc, coarse, pq = _pinned_index(spark)
    got = {r["vec_id"]: (r["_list"], list(r["codes"]))
           for r in enc.collect()}
    assert got == {0: (0, [0, 0]), 1: (0, [1, 1]),
                   2: (1, [0, 0]), 3: (1, [1, 1])}
    assert pq.m == 2 and pq.dsub == 2


def test_ivf_pq_topk_nprobe1_stays_in_probed_list(spark):
    enc, coarse, pq = _pinned_index(spark)
    df = _ivf_df(spark)
    out = ivf_pq_topk(enc, coarse, pq, df.where(F.col("vec_id") == 0),
                      k=10, nprobe=1)
    rows = out.collect()
    # only list 0 is probed → the sole candidate is vector 1
    assert [(r["neighbor_id"], r["rank"]) for r in rows] == [(1, 1)]
    # residual exactly at a codeword → ADC distance is EXACT |q-v|^2
    assert math.isclose(rows[0]["approx_dist"], 3.62, rel_tol=1e-9)


def test_ivf_pq_topk_nprobe2_exact_when_residuals_are_codewords(spark):
    enc, coarse, pq = _pinned_index(spark)
    df = _ivf_df(spark)
    out = ivf_pq_topk(enc, coarse, pq, df.where(F.col("vec_id") == 0),
                      k=3, nprobe=2)
    rows = out.orderBy("rank").collect()
    assert [r["neighbor_id"] for r in rows] == [1, 2, 3]
    # every residual coincides with a codeword, so all ADC distances
    # equal the true squared L2 from the query
    want = {1: 3.62, 2: 396.02, 3: 399.62}
    for r in rows:
        assert math.isclose(r["approx_dist"], want[r["neighbor_id"]],
                            rel_tol=1e-9), r


def test_ivf_pq_trained_end_to_end_finds_cluster_neighbors(spark):
    import random

    rng = random.Random(7)
    centers = [[0.0] * 4, [20.0] * 4, [0.0, 20.0, 0.0, 20.0]]
    rows = [
        (i, [c + rng.gauss(0, 0.3) for c in centers[i % 3]])
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    enc, coarse, pq = ivf_pq_index(df, n_lists=3, m=2, k_sub=4, seed=1,
                                   coarse_max_iter=8, pq_max_iter=4)
    out = ivf_pq_topk(enc, coarse, pq, df.where(F.col("vec_id") < 6),
                      k=5, nprobe=1)
    rows = out.collect()
    assert len(rows) == 30
    # neighbors must come from the query's own cluster (mod-3 class)
    for r in rows:
        assert r["neighbor_id"] % 3 == r["query_id"] % 3, r


def test_ivf_pq_plans_python_free_and_broadcast(spark):
    enc, coarse, pq = _pinned_index(spark)
    df = _ivf_df(spark)
    out = ivf_pq_topk(enc, coarse, pq, df.where(F.col("vec_id") == 0),
                      k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan


def test_ivf_probe_selection_is_shuffle_free(spark):
    """r12 optimization pin: the per-query top-nprobe centroid ranking
    is a map-only array_sort/slice expression — the ONLY Window in an
    IVF-family top-k plan is the final per-query rank (the old probe
    shape paid a second Window plus an Exchange of the query side)."""
    enc, coarse, pq = _pinned_index(spark)
    df = _ivf_df(spark)
    q = df.where(F.col("vec_id") == 0)
    pq_plan = ivf_pq_topk(enc, coarse, pq, q, k=3, nprobe=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert pq_plan.count("Window [") == 1, pq_plan

    from generalized_kmeans_clustering_spark.operators.quantization import (
        ivf_sq_index, ivf_sq_topk,
    )
    enc2, coarse2, sq = ivf_sq_index(_ivf_df(spark), n_lists=2, seed=3,
                                     coarse_max_iter=4)
    sq_plan = ivf_sq_topk(enc2, coarse2, sq, q, k=3, nprobe=2) \
        ._jdf.queryExecution().executedPlan().toString()
    assert sq_plan.count("Window [") == 1, sq_plan


def test_pq_model_roundtrip(spark, tmp_path):
    from generalized_kmeans_clustering_spark.operators.quantization import (
        read_pq_model, write_pq_model,
    )

    path = str(tmp_path / "pq_model")
    write_pq_model(spark, MODEL, path)
    loaded = read_pq_model(spark, path)
    assert loaded.codebooks == MODEL.codebooks
    assert loaded.d == MODEL.d and loaded.m == MODEL.m
    # loaded model encodes identically
    a = pq_encode(_df(spark), MODEL).collect()
    b = pq_encode(_df(spark), loaded).collect()
    assert sorted((r["vec_id"], list(r["codes"])) for r in a) == \
        sorted((r["vec_id"], list(r["codes"])) for r in b)


def test_pq_topk_warns_on_large_query_table(spark):
    """VERDICT r6 #4: the brute ADC path is |corpus| x |queries| with
    no pruning — a query table above max_broadcast_queries must warn
    loudly and point to ivf_pq_topk instead of silently blowing up."""
    import warnings as w

    df = _df(spark)
    enc = pq_encode(df, MODEL)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        pq_topk(enc, MODEL, df, k=1, max_broadcast_queries=2)
    msgs = [str(r.message) for r in rec]
    assert any("ivf_pq_topk" in m for m in msgs), msgs
    # small query sets and the opt-out stay silent
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        pq_topk(enc, MODEL, df.where(F.col("vec_id") == 0), k=1)
        pq_topk(enc, MODEL, df, k=1, max_broadcast_queries=None)
    assert not [r for r in rec if "pq_topk" in str(r.message)]


def test_topk_n_queries_hint_skips_probe_job(spark):
    """With the n_queries size hint the guard must not run its count
    job — proven by handing it a query frame that RAISES on any
    evaluation: building the (lazy) top-k plan must succeed."""
    import warnings as w

    import pandas as pd_

    df = _df(spark)
    enc = pq_encode(df, MODEL)

    def boom(it):
        raise RuntimeError("query side must not be evaluated")
        yield pd_.DataFrame()

    landmine = df.mapInPandas(boom, schema=df.schema)
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        pq_topk(enc, MODEL, landmine, k=1, n_queries=2)          # no job
        sq = __import__(
            "generalized_kmeans_clustering_spark.operators.quantization",
            fromlist=["sq_topk", "train_sq", "sq_encode"])
        m = sq.train_sq(df)
        sq.sq_topk(sq.sq_encode(df, m), m, landmine, k=1, n_queries=2)
    ours = [str(r.message) for r in rec
            if "pq_topk" in str(r.message) or "sq_topk" in str(r.message)]
    assert not ours, ours
    # the hint still drives the warning when it exceeds the cap
    with w.catch_warnings(record=True) as rec:
        w.simplefilter("always")
        pq_topk(enc, MODEL, landmine, k=1, n_queries=5000)
    assert any("ivf_pq_topk" in str(r.message) for r in rec)


# --------------------------------------------------------------------------
# Scalar quantization (SQ8)
# --------------------------------------------------------------------------

def test_sq_roundtrip_bounds(spark):
    from generalized_kmeans_clustering_spark.operators.quantization import (
        SQModel, sq_decode, sq_encode, train_sq,
    )

    df = spark.createDataFrame(
        [(0, [0.0, 10.0]), (1, [1.0, 20.0]), (2, [0.5, 15.0])],
        "vec_id long, embedding array<double>",
    )
    m = train_sq(df)
    assert m.mins == [0.0, 10.0] and m.maxs == [1.0, 20.0]
    enc = {r["vec_id"]: r["codes"] for r in sq_encode(df, m).collect()}
    assert enc[0] == [0, 0] and enc[1] == [255, 255]
    assert enc[2] == [128, 128]  # midpoint rounds up via floor(x+0.5)
    dec = {r["vec_id"]: r["vector"]
           for r in sq_decode(sq_encode(df, m), m).collect()}
    # reconstruction error bounded by half a step per dim
    for vid, orig in ((0, [0.0, 10.0]), (1, [1.0, 20.0]), (2, [0.5, 15.0])):
        for o, d, step in zip(orig, dec[vid], [1 / 255, 10 / 255]):
            assert abs(o - d) <= step / 2 + 1e-12


def test_sq_constant_dimension(spark):
    from generalized_kmeans_clustering_spark.operators.quantization import (
        sq_decode, sq_encode, train_sq,
    )

    df = spark.createDataFrame(
        [(0, [5.0, 1.0]), (1, [5.0, 2.0])],
        "vec_id long, embedding array<double>",
    )
    m = train_sq(df)
    enc = {r["vec_id"]: r["codes"] for r in sq_encode(df, m).collect()}
    assert enc[0][0] == 0 and enc[1][0] == 0
    dec = {r["vec_id"]: r["vector"]
           for r in sq_decode(sq_encode(df, m), m).collect()}
    assert dec[0][0] == 5.0  # constant dim reconstructs exactly


def test_sq_topk_matches_exact_on_coarse_grid(spark):
    from generalized_kmeans_clustering_spark.operators.quantization import (
        sq_encode, sq_topk, train_sq,
    )

    # well-separated points: quantized ordering == exact ordering
    rows = [(i, [float(i * 10), float(100 - i * 10)]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = train_sq(df)
    out = sq_topk(sq_encode(df, m), m, df.where("vec_id = 0"), k=3,
                  max_broadcast_queries=None).collect()
    assert [r["neighbor_id"] for r in out] == [1, 2, 3]


def test_sq_topk_warns_on_large_query_side(spark):
    import warnings

    from generalized_kmeans_clustering_spark.operators.quantization import (
        sq_encode, sq_topk, train_sq,
    )

    rows = [(i, [float(i), 0.0]) for i in range(8)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    m = train_sq(df)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        sq_topk(sq_encode(df, m), m, df, k=2, max_broadcast_queries=4)
    assert any("sq_topk" in str(x.message) for x in w)


def test_sq_model_sidecar_roundtrip(spark, tmp_path):
    from generalized_kmeans_clustering_spark.operators.quantization import (
        SQModel, read_sq_model, write_sq_model,
    )

    m = SQModel(mins=[0.0, -1.5], maxs=[2.0, 3.5])
    path = str(tmp_path / "sq_model")
    write_sq_model(spark, m, path)
    back = read_sq_model(spark, path)
    assert back.mins == m.mins and back.maxs == m.maxs
    assert back.d == 2


def test_train_sq_empty_raises(spark):
    import pytest as _pt

    from generalized_kmeans_clustering_spark.operators.quantization import (
        train_sq,
    )

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    with _pt.raises(ValueError):
        train_sq(empty)


def test_ivf_sq_recall_vs_brute(spark):
    import numpy as np

    from generalized_kmeans_clustering_spark.operators.quantization import (
        ivf_sq_index, ivf_sq_topk,
    )
    from generalized_kmeans_clustering_spark.operators.similarity import (
        ann_recall,
    )

    rng = np.random.default_rng(11)
    # 4 well-separated gaussian blobs in 8d
    centers = rng.normal(0, 10, (4, 8))
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append((i, [float(x) for x in c + rng.normal(0, 0.5, 8)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    enc, cm, sm = ivf_sq_index(emb, n_lists=4, seed=3, coarse_max_iter=5)
    approx = ivf_sq_topk(enc, cm, sm, emb.where("vec_id < 10"),
                         k=5, nprobe=2)
    # exact brute-force L2 baseline
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window
    a = emb.select(F.col("vec_id").alias("query_id"),
                   F.col("embedding").alias("_q")).where("query_id < 10")
    b = emb.select(F.col("vec_id").alias("neighbor_id"),
                   F.col("embedding").alias("_v"))
    d = F.aggregate(F.zip_with("_q", "_v", lambda x, y: (x - y) * (x - y)),
                    F.lit(0.0), lambda acc, v: acc + v)
    w = Window.partitionBy("query_id").orderBy(F.asc("dist"),
                                               F.asc("neighbor_id"))
    exact = (b.crossJoin(F.broadcast(a))
             .where(F.col("neighbor_id") != F.col("query_id"))
             .withColumn("dist", d)
             .withColumn("rank", F.row_number().over(w))
             .where("rank <= 5")
             .select("query_id", "neighbor_id", "rank"))
    rec = ann_recall(approx, exact, k=5).agg(
        F.avg("recall").alias("r")).collect()[0]["r"]
    # tight blobs + residual SQ: near-exact at nprobe=2 of 4
    assert rec >= 0.9


def test_ivf_sq_residual_tighter_than_raw(spark):
    import numpy as np

    from generalized_kmeans_clustering_spark.operators.quantization import (
        ivf_sq_index, train_sq,
    )

    rng = np.random.default_rng(5)
    centers = rng.normal(0, 20, (4, 6))
    rows = []
    for i in range(200):
        c = centers[i % 4]
        rows.append((i, [float(x) for x in c + rng.normal(0, 0.3, 6)]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    _, _, sq_res = ivf_sq_index(emb, n_lists=4, seed=1, coarse_max_iter=5)
    sq_raw = train_sq(emb)
    step_res = sum(mx - mn for mn, mx in zip(sq_res.mins, sq_res.maxs))
    step_raw = sum(mx - mn for mn, mx in zip(sq_raw.mins, sq_raw.maxs))
    # residual ranges (hence quantization steps) are much tighter
    assert step_res < step_raw / 3


def test_ivf_pq_index_persistence_roundtrip(spark, tmp_path):
    """write/read the IVF-PQ serving layout: identical top-k after the
    round-trip and partition-pruned probes on the _list column."""
    import numpy as np
    from generalized_kmeans_clustering_spark.operators.quantization import (
        ivf_pq_index, ivf_pq_topk, read_ivf_pq_index, write_ivf_pq_index,
    )

    rng = np.random.default_rng(3)
    X = rng.standard_normal((300, 8))
    df = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(X)],
        "vec_id long, embedding array<double>")
    enc, coarse, pq = ivf_pq_index(
        df, n_lists=4, m=2, k_sub=4, seed=1,
        coarse_max_iter=2, pq_max_iter=2)
    q = df.where("vec_id < 4")
    before = [tuple(r) for r in ivf_pq_topk(
        enc, coarse, pq, q, k=3, nprobe=2)
        .orderBy("query_id", "rank").collect()]

    path = str(tmp_path / "ivfpq")
    write_ivf_pq_index(enc, coarse, pq, path)
    enc2, coarse2, pq2 = read_ivf_pq_index(spark, path)
    assert pq2.codebooks == pq.codebooks
    assert [list(c) for c in coarse2.centers] == \
        [list(c) for c in coarse.centers]
    out = ivf_pq_topk(enc2, coarse2, pq2, q, k=3, nprobe=2)
    after = [tuple(r) for r in out.orderBy("query_id", "rank").collect()]
    assert after == before
    # the probe equi-join on _list prunes the partitioned scan
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "_list" in \
        plan.split("PartitionFilters")[1][:160]


def test_ivf_opq_index_persistence_roundtrip(spark, tmp_path):
    import numpy as np
    from generalized_kmeans_clustering_spark.operators.opq import (
        ivf_opq_index, ivf_opq_topk, read_ivf_opq_index, train_opq,
        write_ivf_opq_index,
    )

    rng = np.random.default_rng(5)
    X = rng.standard_normal((300, 8)) * np.linspace(3, 0.1, 8)
    df = spark.createDataFrame(
        [(i, [float(x) for x in r]) for i, r in enumerate(X)],
        "vec_id long, embedding array<double>")
    model = train_opq(df, m=2, k_sub=4, n_iter=2, pq_iter=2, seed=2)
    enc, coarse, pq = ivf_opq_index(
        df, model.rotation, n_lists=4, m=2, k_sub=4, seed=2,
        coarse_max_iter=2, pq_max_iter=2)
    q = df.where("vec_id < 4")
    before = [tuple(r) for r in ivf_opq_topk(
        enc, coarse, pq, model.rotation, q, k=3, nprobe=2)
        .orderBy("query_id", "rank").collect()]

    path = str(tmp_path / "ivfopq")
    write_ivf_opq_index(enc, coarse, pq, model.rotation, path)
    enc2, coarse2, pq2, rot2 = read_ivf_opq_index(spark, path)
    assert rot2 == model.rotation
    after = [tuple(r) for r in ivf_opq_topk(
        enc2, coarse2, pq2, rot2, q, k=3, nprobe=2)
        .orderBy("query_id", "rank").collect()]
    assert after == before
