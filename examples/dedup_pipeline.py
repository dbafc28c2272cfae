"""Executable documentation: layered dedup of a document corpus.

exact fingerprints → MinHash-LSH candidates → exact Jaccard verify —
the standard three-stage near-dup pipeline, all shuffle-on-key.
"""

import sys
import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from generalized_kmeans_clustering_spark.operators.dedup import (
        exact_dedup, minhash_signatures, lsh_candidate_pairs, jaccard_verify,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n0 = docs.count()

    # stage 1: drop byte-identical duplicates (hash groupBy)
    deduped = exact_dedup(docs)
    n1 = deduped.count()

    # stage 2: MinHash signatures + LSH banding → candidate pairs
    sigs = minhash_signatures(deduped, num_hashes=32, shingle_n=3)
    cands = lsh_candidate_pairs(sigs, num_bands=8)
    n_cand = cands.count()

    # stage 3: exact shingle-Jaccard only on the candidates
    near = jaccard_verify(deduped, cands, threshold=0.8)
    n_near = near.count()

    return {
        "input_docs": n0,
        "after_exact_dedup": n1,
        "lsh_candidates": n_cand,
        "near_dups_verified": n_near,
    }


if __name__ == "__main__":
    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.ui.enabled", "false").getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    print(main(spark, sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))
    spark.stop()
