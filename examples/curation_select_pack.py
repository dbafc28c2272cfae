"""Executable documentation: the round-6 data-curation additions as
one pipeline — score quality → relaxed filter → DSIR selection →
temperature mix → pack → content-addressed shards — plus the ANN
serving side (PQ codes, recall gauge) over the embeddings table.

Every stage is deterministic (hash draws, pinned seeds): re-running
produces byte-identical shards, which the manifest check proves.
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
    from generalized_kmeans_clustering_spark.functions import text as Tx
    from generalized_kmeans_clustering_spark.operators.classifier import (
        pareto_quality_filter, score_hashed_lr, train_hashed_lr,
    )
    from generalized_kmeans_clustering_spark.operators.dsir import (
        dsir_select, dsir_weights,
    )
    from generalized_kmeans_clustering_spark.operators.packing import (
        materialize_packs, pack_concat,
    )
    from generalized_kmeans_clustering_spark.operators.quantization import (
        ivf_pq_index, ivf_pq_topk,
    )
    from generalized_kmeans_clustering_spark.operators.sampling import (
        temperature_sample,
    )
    from generalized_kmeans_clustering_spark.operators.similarity import (
        ann_recall, cosine_topk,
    )
    from generalized_kmeans_clustering_spark.sources.shards import (
        verify_training_shards, write_training_shards,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_input = docs.count()

    # 1. quality model: English docs as the reference class (stand-in
    # for "looks like Wikipedia"), hashed-tf logistic regression
    labeled = docs.select(
        "doc_id", "text", "lang",
        (F.col("lang") == "en").cast("int").alias("_y"))
    model = train_hashed_lr(
        labeled, "_y", n_buckets=1024, max_iter=10,
        learning_rate=300.0, bias_learning_rate=1.0)
    scored = score_hashed_lr(labeled, model)

    # 2. GPT-3-style relaxed keep rule UNIONed with DSIR top-m:
    # stochastic high-score keeps + importance-resampled docs
    kept_pareto = pareto_quality_filter(scored, alpha=9.0)
    weighted = dsir_weights(
        docs, docs.where(F.col("lang") == "en"), n_buckets=1024)
    kept_dsir = dsir_select(weighted, m=n_input // 3, seed=2)
    selected = (
        kept_pareto.select("doc_id")
        .union(kept_dsir.select("doc_id"))
        .distinct()
        .join(docs, "doc_id")
    )
    n_selected = selected.count()

    # 3. temperature mix over languages (alpha<1 up-weights the tail)
    with_tok = selected.select(
        "doc_id", "lang", "text",
        Tx.token_count(F.col("text")).cast("bigint").alias("n_tokens"))
    mixed = temperature_sample(
        with_tok, alpha=0.5,
        total_budget=int(
            with_tok.agg(F.sum("n_tokens")).first()[0] * 0.6),
    )
    n_mixed = mixed.count()

    # 4. pack into fixed-length sequences and ship verified shards
    spans = pack_concat(
        mixed.select("doc_id", "n_tokens"), seq_len=128, num_shards=8,
        seed=0)
    packs = materialize_packs(mixed.select("doc_id", "text"), spans)
    out_dir = tempfile.mkdtemp(prefix="curation_shards_")
    write_training_shards(packs, out_dir)
    mismatches = verify_training_shards(spark, out_dir).count()

    # 5. serving side: residual IVF-PQ over the embeddings, recall
    # measured in-engine against the exact baseline. The synthetic
    # embeddings are near-random (pairwise distances concentrate), so
    # coarse 12-bit codes rank them weakly — the point is that
    # ann_recall MEASURES this, which is how you'd size m/k_sub/nprobe
    # on real, clustered embeddings.
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    enc, cm, pm = ivf_pq_index(emb, n_lists=8, m=4, k_sub=8, seed=3,
                               coarse_max_iter=5, pq_max_iter=3)
    queries = emb.where(F.col("vec_id") < 10)
    approx = ivf_pq_topk(enc, cm, pm, queries, k=5, nprobe=8)
    recall = (
        ann_recall(approx, cosine_topk(emb, queries, k=5), k=5)
        .agg(F.avg("recall")).first()[0]
    )

    return {
        "input_docs": n_input,
        "selected_docs": n_selected,
        "mixed_docs": n_mixed,
        "training_sequences": packs.count(),
        "shard_mismatches": mismatches,
        "ivfpq_recall_at_5": recall,
    }


if __name__ == "__main__":
    s = (SparkSession.builder.master("local[8]")
         .config("spark.sql.shuffle.partitions", "8").getOrCreate())
    print(main(s))
