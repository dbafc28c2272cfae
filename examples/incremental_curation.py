"""Incremental curation loop: deltas against a living corpus.

The production shape for a growing training corpus: crawls land as
scheduled drops, each delta is deduped against everything accepted so
far (exact store + near-dup signature store), accepted docs update
both stores, and a drift audit compares the newly accepted slice to
the standing corpus before it is admitted to the mix.

Run: python examples/incremental_curation.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def main(spark, sf_dir):
    from generalized_kmeans_clustering_spark.operators.dedup import (
        minhash_signatures,
    )
    from generalized_kmeans_clustering_spark.operators.drift import (
        corpus_drift,
    )
    from generalized_kmeans_clustering_spark.operators.incremental import (
        fingerprint_store,
        incremental_exact_dedup,
        incremental_lsh_pairs,
        updated_fingerprint_store,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", F.substring("text", 1, 64).alias("text")
    )

    # day 0: the standing corpus seeds both stores
    day0 = docs.where(F.col("doc_id") % 3 == 0)
    store = fingerprint_store(day0)
    sig_store = minhash_signatures(day0, num_hashes=16)

    accepted_per_delta = []
    corpus = day0
    for day in (1, 2):
        delta = docs.where(F.col("doc_id") % 3 == day)
        verdicts = incremental_exact_dedup(delta, store)
        accepted_ids = verdicts.where("is_canonical").select(
            F.col("id").alias("doc_id"))
        accepted = delta.join(accepted_ids, on="doc_id")

        # near-dup candidates of the delta vs the signature store —
        # store x store is never re-paid
        delta_sigs = minhash_signatures(accepted, num_hashes=16)
        near = incremental_lsh_pairs(delta_sigs, sig_store, num_bands=4)

        # drift gate: how different is what we are about to admit?
        gauges = corpus_drift(accepted, corpus).collect()[0]

        store = updated_fingerprint_store(store, verdicts)
        sig_store = sig_store.unionByName(delta_sigs)
        corpus = corpus.unionByName(accepted)
        accepted_per_delta.append({
            "day": day,
            "delta_rows": delta.count(),
            "accepted": accepted.count(),
            "near_dup_candidates": near.count(),
            "js_vs_corpus": float(gauges["js"]),
        })

    # loop invariant: the store equals the from-scratch fingerprint
    # store of everything accepted so far
    direct = fingerprint_store(corpus)
    invariant_holds = (
        store.count() == direct.count()
        and store.join(direct, on=["fingerprint", "keep_id"]).count()
        == direct.count()
    )
    return {
        "deltas": accepted_per_delta,
        "final_store_rows": store.count(),
        "store_invariant_holds": invariant_holds,
    }


if __name__ == "__main__":
    from pyspark.sql import SparkSession

    sfd = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    sp = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    sp.sparkContext.setLogLevel("ERROR")
    print(main(sp, sfd))
    sp.stop()
