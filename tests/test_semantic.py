"""semantic_dedup (SemDeDup-style) + interleave_shards tests."""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.packing import pack_concat
from generalized_kmeans_clustering_spark.operators.sampling import (
    interleave_shards,
)
from generalized_kmeans_clustering_spark.operators.semantic import (
    semantic_dedup,
    semantic_list_stats,
    semantic_near_dup_pairs,
)


def _emb_df(spark):
    # two tight groups near the axes plus two isolated singletons; the
    # fixed centers put groups in separate lists
    rows = [
        (0, [1.0, 0.0, 0.0]),       # group A (near e1), most typical
        (1, [0.99, 0.14, 0.0]),     # group A
        (2, [0.97, 0.24, 0.0]),     # group A, least typical
        (3, [0.0, 1.0, 0.0]),       # group B (near e2)
        (4, [0.1, 0.99, 0.0]),      # group B
        (5, [0.0, 0.0, 1.0]),       # singleton (own list)
        (6, [-1.0, 0.2, 0.1]),      # singleton in list 1's cell? no: far
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


CENTERS = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]


def _run(spark, keep):
    df = _emb_df(spark)
    out = semantic_dedup(
        df, threshold=0.95, n_lists=3, seed=0, max_iter=0,
        initial_centers=CENTERS, keep=keep,
    )
    return {r["vec_id"]: r.asDict() for r in out.collect()}


def test_all_rows_survive_and_groups_form(spark):
    v = _run(spark, "far_from_centroid")
    assert set(v) == {0, 1, 2, 3, 4, 5, 6}
    # group A = {0,1,2} shares component 0; group B = {3,4} shares 3
    assert v[0]["component"] == v[1]["component"] == v[2]["component"] == 0
    assert v[3]["component"] == v[4]["component"] == 3
    # singletons are their own component and canonical
    for vid in (5, 6):
        assert v[vid]["component"] == vid
        assert v[vid]["is_canonical"]


def test_far_from_centroid_keeps_least_typical(spark):
    v = _run(spark, "far_from_centroid")
    # group A: vec 2 has the lowest cosine to e1 → canonical
    assert [vid for vid in (0, 1, 2) if v[vid]["is_canonical"]] == [2]
    # exactly one canonical per component
    assert sum(v[vid]["is_canonical"] for vid in (3, 4)) == 1


def test_near_centroid_and_min_id_policies(spark):
    near = _run(spark, "near_centroid")
    assert [vid for vid in (0, 1, 2) if near[vid]["is_canonical"]] == [0]
    mid = _run(spark, "min_id")
    assert [vid for vid in (0, 1, 2) if mid[vid]["is_canonical"]] == [0]
    assert [vid for vid in (3, 4) if mid[vid]["is_canonical"]] == [3]


def test_pairs_stay_within_list(spark):
    from generalized_kmeans_clustering_spark.operators.similarity import (
        ivf_index,
    )

    df = _emb_df(spark)
    indexed, _ = ivf_index(df, n_lists=3, seed=0, max_iter=0,
                           initial_centers=CENTERS)
    pairs = semantic_near_dup_pairs(indexed, 0.95).collect()
    got = {(r["i"], r["j"]) for r in pairs}
    # cross-list near-dups are the method's documented blind spot:
    # only within-list pairs can appear
    lists = {r["vec_id"]: r["_list"] for r in indexed.collect()}
    for i, j in got:
        assert lists[i] == lists[j]
    assert (0, 1) in got and (1, 2) in got


def _skewed_indexed(spark, n_hot=220, n_dup_pairs=10):
    """An ivf_index frame where ONE list holds >50% of the rows: a
    LOOSE cluster around e1 (most pairs far below threshold) with
    planted identical-vector duplicate pairs, plus a spread of rows in
    the other two lists."""
    import numpy as np

    from generalized_kmeans_clustering_spark.operators.similarity import (
        ivf_index,
    )

    rng = np.random.default_rng(7)
    rows = []
    vid = 0
    for _ in range(n_hot - n_dup_pairs):
        # σ=0.6 ⇒ ~8% of within-list pairs reach cosine 0.95 — the
        # realistic SemDeDup density (σ=0.3 would make ~27% of ALL
        # pairs duplicates: the output-bound regime where candidate
        # pruning inherently costs recall)
        v = np.array([1.0, 0.0, 0.0]) + rng.normal(0, 0.6, 3)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    for k in range(n_dup_pairs):  # planted exact dups inside the hot list
        base = rows[k][1]
        rows.append((vid, list(base)))
        vid += 1
    for _ in range(60):  # the cool lists
        axis = rng.integers(1, 3)
        v = np.eye(3)[axis] + rng.normal(0, 0.1, 3)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
        vid += 1
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    indexed, _ = ivf_index(df, n_lists=3, seed=0, max_iter=0,
                           initial_centers=CENTERS)
    return indexed


def test_skew_cap_bounds_candidate_volume(spark):
    """VERDICT r6 #1: one list holding >50% of rows must NOT reintroduce
    near-all-pairs work — over-cap lists are recursively sub-split and
    the telemetry operator proves the candidate count is bounded."""
    indexed = _skewed_indexed(spark)
    stats = {r["list"]: r.asDict()
             for r in semantic_list_stats(indexed, list_size_cap=50)
             .collect()}
    hot = sorted((s for s in stats.values() if s["oversized"]),
                 key=lambda s: -s["size"])
    assert hot and hot[0]["size"] >= 150  # the mega-list engaged the cap
    # 16-way sub-split (2 probes) must beat the quadratic count by a
    # wide margin on the mega-list; lists barely over the cap only
    # need to come in under their quadratic count (split overhead
    # shrinks as size/cap grows)
    mega_full = hot[0]["size"] * (hot[0]["size"] - 1) // 2
    assert hot[0]["candidate_pairs"] < mega_full / 3, (hot[0], mega_full)
    for s in hot[1:]:
        full = s["size"] * (s["size"] - 1) // 2
        assert s["candidate_pairs"] < full, (s, full)
    for s in stats.values():
        if not s["oversized"]:
            assert s["candidate_pairs"] == s["size"] * (s["size"] - 1) // 2


def test_skew_split_is_subset_with_high_recall(spark):
    """Sub-splitting prunes candidates, never adds them: the over-cap
    result is a subset of the exact result, keeps every planted
    identical-vector pair (identical vectors take identical probes),
    and multi-probing keeps boundary recall high."""
    indexed = _skewed_indexed(spark)
    exact = {(r["i"], r["j"]) for r in semantic_near_dup_pairs(
        indexed, 0.95, list_size_cap=None).collect()}
    split = {(r["i"], r["j"]) for r in semantic_near_dup_pairs(
        indexed, 0.95, list_size_cap=50).collect()}
    assert split <= exact
    assert len(split) >= 0.85 * len(exact), (len(split), len(exact))
    for k in range(10):  # planted dups: ids 210..219 duplicate 0..9
        assert (k, 210 + k) in split
    # and no duplicate (i, j) rows leak from multi-probe collisions
    rows = semantic_near_dup_pairs(indexed, 0.95, list_size_cap=50).collect()
    assert len(rows) == len({(r["i"], r["j"]) for r in rows})


def test_default_cap_keeps_small_lists_exact(spark):
    """Lists at or under the cap take the exact path: default-cap and
    cap=None agree bit-for-bit on the small fixture."""
    from generalized_kmeans_clustering_spark.operators.similarity import (
        ivf_index,
    )

    df = _emb_df(spark)
    indexed, _ = ivf_index(df, n_lists=3, seed=0, max_iter=0,
                           initial_centers=CENTERS)
    with_cap = {(r["i"], r["j"], round(r["sim"], 12))
                for r in semantic_near_dup_pairs(indexed, 0.95).collect()}
    exact = {(r["i"], r["j"], round(r["sim"], 12))
             for r in semantic_near_dup_pairs(
                 indexed, 0.95, list_size_cap=None).collect()}
    assert with_cap == exact


def test_semantic_dedup_with_cap_engaged_keeps_planted_groups(spark):
    """semantic_dedup over the skewed corpus with the cap engaged:
    every planted duplicate pair lands in one component with exactly
    one canonical member."""
    import numpy as np

    rng = np.random.default_rng(7)
    rows = []
    for vid in range(120):
        v = np.array([1.0, 0.0, 0.0]) + rng.normal(0, 0.3, 3)
        v /= np.linalg.norm(v)
        rows.append((vid, [float(x) for x in v]))
    for k in range(5):
        rows.append((120 + k, list(rows[k][1])))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r.asDict() for r in semantic_dedup(
        df, threshold=0.999, n_lists=3, seed=0, max_iter=0,
        initial_centers=CENTERS, list_size_cap=40,
    ).collect()}
    assert len(out) == 125  # verdict frame: every row survives
    from collections import Counter

    canon_per_comp = Counter(
        v["component"] for v in out.values() if v["is_canonical"])
    comps = {v["component"] for v in out.values()}
    assert all(canon_per_comp[c] == 1 for c in comps)
    for k in range(5):  # identical vectors always share a component
        assert out[k]["component"] == out[120 + k]["component"]
        # and the pair's component is not a singleton for both
        assert not (out[k]["is_canonical"] and out[120 + k]["is_canonical"])


def test_bad_keep_policy_raises(spark):
    with pytest.raises(ValueError, match="keep"):
        semantic_dedup(_emb_df(spark), keep="newest")


def test_interleave_deterministic_and_partition_independent(spark):
    df = spark.range(0, 1000).select(F.col("id").alias("doc_id"))
    a = interleave_shards(df, num_shards=8, seed=7)
    b = interleave_shards(df.repartition(13), num_shards=8, seed=7)
    ra = {r["doc_id"]: (r["shard"], r["pos"]) for r in a.collect()}
    rb = {r["doc_id"]: (r["shard"], r["pos"]) for r in b.collect()}
    assert ra == rb
    # pos is a 1..n_shard_rows numbering within each shard
    from collections import Counter

    per_shard = Counter(s for s, _ in ra.values())
    for shard, n in per_shard.items():
        poss = sorted(p for s, p in ra.values() if s == shard)
        assert poss == list(range(1, n + 1))


def test_interleave_seed_changes_order(spark):
    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: (r["shard"], r["pos"])
         for r in interleave_shards(df, num_shards=4, seed=1).collect()}
    b = {r["doc_id"]: (r["shard"], r["pos"])
         for r in interleave_shards(df, num_shards=4, seed=2).collect()}
    assert a != b


def test_interleave_agrees_with_pack_concat_order(spark):
    """interleave → pack is one consistent layout: within a shard,
    ascending interleave pos must equal ascending first-pack/offset
    order of pack_concat under the same (num_shards, seed, hash_fn)."""
    df = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") % 37 + 1).alias("n_tokens"),
    )
    inter = {r["doc_id"]: (r["shard"], r["pos"])
             for r in interleave_shards(df, num_shards=4, seed=9).collect()}
    spans = pack_concat(df, seq_len=64, num_shards=4, seed=9)
    first = (
        spans.groupBy("doc_id", "shard")
        .agg(F.min(F.struct("pack", "pack_offset")).alias("at"))
        .collect()
    )
    assert {r["doc_id"]: r["shard"] for r in first} == {
        d: s for d, (s, _) in inter.items()
    }
    for shard in range(4):
        by_inter = sorted(
            (p, d) for d, (s, p) in inter.items() if s == shard)
        by_pack = sorted(
            ((r["at"]["pack"], r["at"]["pack_offset"]), r["doc_id"])
            for r in first if r["shard"] == shard)
        assert [d for _, d in by_inter] == [d for _, d in by_pack]


def test_interleave_rejects_bad_shards(spark):
    with pytest.raises(ValueError, match="num_shards"):
        interleave_shards(spark.range(3).withColumnRenamed("id", "doc_id"),
                          num_shards=0)


def test_streaming_semantic_dedup_batch_parity(spark, tmp_path):
    """StreamingSemanticDedup replayed over micro-batches must emit
    exactly the batch semantic_near_dup_pairs result for the same
    fixed centroids (union over batches of new-vs-new + new-vs-older
    candidates = the full within-list pair set)."""
    from generalized_kmeans_clustering_spark.operators.similarity import (
        ivf_index,
    )
    from generalized_kmeans_clustering_spark.streaming.semantic import (
        StreamingSemanticDedup,
    )

    df = _emb_df(spark)
    indexed, _ = ivf_index(df, n_lists=3, seed=0, max_iter=0,
                           initial_centers=CENTERS)
    want = {(r["i"], r["j"], round(r["sim"], 9))
            for r in semantic_near_dup_pairs(
                indexed, 0.95, list_size_cap=None).collect()}

    sd = StreamingSemanticDedup(
        str(tmp_path / "state"), str(tmp_path / "pairs"),
        centers=CENTERS, threshold=0.95)
    # replay in 3 artificial micro-batches split by id
    for b, lo, hi in ((0, 0, 2), (1, 2, 5), (2, 5, 99)):
        sd.process_batch(
            df.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), b)
    got = {(r["i"], r["j"], round(r["sim"], 9))
           for r in sd.pairs(spark).collect()}
    assert got == want and want  # non-empty parity
    # replay idempotency: reprocessing batch 1 must not change pairs
    sd.process_batch(
        df.where((F.col("vec_id") >= 2) & (F.col("vec_id") < 5)), 1)
    again = {(r["i"], r["j"], round(r["sim"], 9))
             for r in sd.pairs(spark).collect()}
    assert again == want


def test_streaming_semantic_dedup_where_prefilters_state(spark, tmp_path):
    """StreamingSemanticDedup(where=...): excluded rows never enter
    the state store or any pair join — the result equals running the
    unfiltered operator over the pre-filtered stream (the r9 graph/
    pair-layer predicate convention)."""
    from generalized_kmeans_clustering_spark.operators.similarity import (
        ivf_index,
    )
    from generalized_kmeans_clustering_spark.streaming.semantic import (
        StreamingSemanticDedup,
    )

    df = _emb_df(spark)
    pred = F.col("vec_id") % 2 == 0
    indexed, _ = ivf_index(df.where(pred), n_lists=3, seed=0, max_iter=0,
                           initial_centers=CENTERS)
    want = {(r["i"], r["j"], round(r["sim"], 9))
            for r in semantic_near_dup_pairs(
                indexed, 0.9, list_size_cap=None).collect()}

    sd = StreamingSemanticDedup(
        str(tmp_path / "fstate"), str(tmp_path / "fpairs"),
        centers=CENTERS, threshold=0.9, where=pred)
    for b, lo, hi in ((0, 0, 3), (1, 3, 99)):
        sd.process_batch(
            df.where((F.col("vec_id") >= lo) & (F.col("vec_id") < hi)), b)
    got = {(r["i"], r["j"], round(r["sim"], 9))
           for r in sd.pairs(spark).collect()}
    assert got == want and want          # non-empty parity
    assert all(r["i"] % 2 == 0 and r["j"] % 2 == 0 for r in
               sd.pairs(spark).collect())
    # the state store itself holds only predicate rows
    st = spark.read.parquet(str(tmp_path / "fstate"))
    assert st.where(F.col("_id") % 2 == 1).count() == 0
