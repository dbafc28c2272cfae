"""Executable documentation: the round-7 curation additions as one
pipeline — Gopher repetition screen → ExactSubstr span cut →
embedding-space benchmark decontamination → trained-BPE token counts →
packing under REAL model tokens — with the skew-hardened semantic
dedup telemetry on the embedding side.

Every stage is deterministic (hash draws, pinned seeds, fixed
centroids): re-running reproduces the same kept set and spans.
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from generalized_kmeans_clustering_spark.operators.decontamination \
        import semantic_decontaminate
    from generalized_kmeans_clustering_spark.operators.dedup import (
        drop_repeated_spans,
    )
    from generalized_kmeans_clustering_spark.operators.packing import (
        pack_concat,
    )
    from generalized_kmeans_clustering_spark.operators.semantic import (
        semantic_list_stats,
    )
    from generalized_kmeans_clustering_spark.operators.similarity import (
        ivf_index,
    )
    from generalized_kmeans_clustering_spark.operators.text_features \
        import gopher_repetition_signals
    from generalized_kmeans_clustering_spark.operators.tokenizer import (
        bpe_token_count, train_bpe,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    n_input = docs.count()

    # 1. Gopher repetition screen: drop "spammy" docs dominated by one
    # phrase or covered by duplicated n-grams (paper thresholds)
    rep = gopher_repetition_signals(docs)
    clean_ids = rep.where(
        (F.col("top_2gram_char_frac") <= 0.20)
        & (F.col("dup_5gram_char_frac") <= 0.15)
    ).select("doc_id")
    kept = docs.join(clean_ids, "doc_id")
    n_after_gopher = kept.count()

    # 2. ExactSubstr cut: corpus-repeated 6-token spans removed from
    # every surviving document (sub-line boilerplate)
    cut = drop_repeated_spans(kept, n=6)
    tokens_dropped = cut.agg(
        F.sum("n_tokens_dropped")).collect()[0][0] or 0

    # 3. embedding-side: decontaminate against a benchmark sample and
    # audit the semantic-dedup candidate volume (skew telemetry)
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    bench = emb.where(F.col("vec_id") < 10)
    corpus_emb = emb.where(F.col("vec_id") >= 10)
    decon = semantic_decontaminate(corpus_emb, bench, threshold=0.35)
    n_contaminated = decon.where("contaminated").count()
    indexed, _ = ivf_index(emb, n_lists=4, seed=7, max_iter=2)
    stats = semantic_list_stats(indexed, list_size_cap=64).collect()
    candidate_pairs = sum(r["candidate_pairs"] for r in stats)

    # 4. trained tokenizer: learn merges from the CLEANED corpus, then
    # pack under real BPE token counts (not whitespace tokens)
    bpe = train_bpe(cut, num_merges=32)
    counted = bpe_token_count(cut.select("doc_id", "text"), bpe)
    spans = pack_concat(counted, seq_len=128, num_shards=4, seed=3)
    n_packs = spans.select("shard", "pack").distinct().count()
    total_bpe_tokens = counted.agg(F.sum("n_tokens")).collect()[0][0]

    # 5. second trained tokenizer (r12): the unigram-LM sibling —
    # same corpus, same drop-in n_tokens contract, different inductive
    # bias (global Viterbi best-split vs greedy local merges). Both
    # counts land between characters and whitespace words, so either
    # feeds the packing/budget layer as "real model tokens".
    from generalized_kmeans_clustering_spark.operators.unigram import (
        train_unigram_lm, unigram_token_count,
    )

    uni = train_unigram_lm(cut, vocab_size=96, seed_size=512,
                           max_piece_len=4, em_rounds=2)
    uni_counted = unigram_token_count(cut.select("doc_id", "text"), uni)
    total_unigram_tokens = uni_counted.agg(
        F.sum("n_tokens")).collect()[0][0]

    return {
        "input_docs": n_input,
        "after_gopher": n_after_gopher,
        "span_tokens_dropped": int(tokens_dropped),
        "contaminated": n_contaminated,
        "semantic_candidate_pairs": int(candidate_pairs),
        "bpe_merges": len(bpe.merges),
        "total_bpe_tokens": int(total_bpe_tokens),
        "unigram_vocab": len(uni.pieces),
        "total_unigram_tokens": int(total_unigram_tokens),
        "packs": n_packs,
    }


if __name__ == "__main__":
    session = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "8")
        .appName("curation-round7").getOrCreate()
    )
    print(main(session, os.environ.get("SPARK_GRAFT_SF_DIR",
                                       "/root/testdata/sf0.001")))
    session.stop()
