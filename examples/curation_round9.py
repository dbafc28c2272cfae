"""Executable documentation: the round-9 curation additions as one
pipeline — near-dup components → SOFT dedup weights (keep everything,
down-weight duplicates) → deterministic weight realization → adaptive
per-source quality cutoff → leakage-safe train/val/test split keyed on
the duplicate components — plus OPQ (rotated product quantization) on
the embedding side, persisted and reloaded.

Every stage is deterministic (hash draws, pinned seeds): re-running
reproduces the same weights, kept set, and split labels.
"""

import os
import sys
import tempfile

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from generalized_kmeans_clustering_spark.operators.dedup import (
        duplicate_components, jaccard_verify, lsh_candidate_pairs,
        minhash_signatures, repetition_weights,
    )
    from generalized_kmeans_clustering_spark.operators.opq import (
        opq_encode, opq_topk, read_opq_model, train_opq, write_opq_model,
    )
    from generalized_kmeans_clustering_spark.operators.sampling import (
        bernoulli_keep, split_assign,
    )
    from generalized_kmeans_clustering_spark.operators.stats import (
        filter_by_group_quantile,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_input = docs.count()

    # 1. near-dup components: minhash -> LSH bands -> exact-Jaccard
    #    verify -> connected components (the r6 pipeline)
    sigs = minhash_signatures(docs, num_hashes=16, shingle_n=3)
    pairs = lsh_candidate_pairs(sigs, num_bands=4, num_hashes=16)
    verified = jaccard_verify(docs, pairs, shingle_n=3, threshold=0.2)
    comp = duplicate_components(verified)

    # 2. SOFT dedup: every doc keeps a weight |component|^-1 — dup
    #    groups carry unit total mass; nothing is deleted yet
    weighted = repetition_weights(docs, comp)
    dup_rows = weighted.where(F.col("rep_weight") < 1.0).count()

    # 3. realize the weights as a reproducible keep/drop (for trainers
    #    without weighted-loss support); same hash contract as
    #    sample_hash, so re-runs keep the same docs
    realized = bernoulli_keep(weighted, "rep_weight", seed=11)
    n_realized = realized.count()

    # 4. adaptive per-source cutoff: each source keeps its own
    #    top-60% by length instead of one global threshold
    filtered = filter_by_group_quantile(
        realized, "source", "n_chars", q=0.4, keep="above")
    n_filtered = filtered.count()

    # 5. leakage-safe split: the label hashes on the duplicate
    #    COMPONENT, so surviving near-dup copies co-travel
    split = split_assign(
        filtered, {"train": 0.8, "val": 0.1, "test": 0.1},
        components=comp, seed=9)
    split_counts = {
        r["split"]: r["n"]
        for r in split.groupBy("split").agg(
            F.count(F.lit(1)).alias("n")).collect()
    }
    # the weighted frame already carries each doc's component
    # (singletons = own id), so the leakage check is one groupBy
    straddlers = (
        split.groupBy("component")
        .agg(F.countDistinct("split").alias("k"))
        .where("k > 1").count()
    )

    # 6. embedding side: OPQ — learned rotation in front of PQ; the
    #    model round-trips through the checksummed sidecar
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    model = train_opq(emb, m=8, k_sub=16, n_iter=2, pq_iter=3, seed=1)
    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "opq_model")
        write_opq_model(spark, model, path)
        model = read_opq_model(spark, path)
    encoded = opq_encode(emb, model)
    queries = emb.limit(3)
    topk = opq_topk(encoded, model, queries, k=5, n_queries=3)
    topk_rows = topk.count()

    return {
        "input_docs": n_input,
        "weighted_dup_docs": dup_rows,
        "realized_docs": n_realized,
        "filtered_docs": n_filtered,
        "split_counts": split_counts,
        "component_straddlers": straddlers,
        "opq_topk_rows": topk_rows,
    }


if __name__ == "__main__":
    session = (
        SparkSession.builder.master("local[8]")
        .appName("curation-round9")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    try:
        print(main(session))
    finally:
        session.stop()
