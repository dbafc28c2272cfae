"""Executable documentation: hybrid lexical + semantic search.

The classic retrieval stack for training-data curation and RAG-style
eval-set mining, end to end on the real testdata tables:

1. materialize the BM25 inverted index once (``bm25_postings`` — the
   artifact you'd persist term-bucketed at 100 TB) and search it by
   example with ``bm25_topk``;
2. run the dense side with ``cosine_topk`` over the embeddings table;
3. fuse both rankings with reciprocal-rank fusion (``rrf_fuse``) and
   read the per-document system-agreement counts;
4. re-run the lexical search under the engine-wide ``where=``
   predicate contract (English sub-collection: collection statistics
   follow the filter, every query still fills k).
"""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from generalized_kmeans_clustering_spark import (
        bm25_postings, bm25_topk, rrf_fuse,
    )
    from generalized_kmeans_clustering_spark.operators.similarity import (
        cosine_topk,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    # probes: every 50th document queries with its own text / vector
    queries = docs.where(F.col("doc_id") % 50 == 7).select(
        F.col("doc_id").alias("query_id"),
        F.col("text").alias("query_text"))

    # 1. lexical: materialized postings + query-by-example search
    postings = bm25_postings(docs).persist()
    n_postings = postings.count()
    lexical = bm25_topk(docs, queries, k=10, postings=postings)

    # 2. semantic: dense cosine over the aligned embedding ids
    semantic = cosine_topk(
        emb, emb.where(F.col("vec_id") % 50 == 7), k=10,
        exclude_self=False,
    ).select("query_id", F.col("neighbor_id").alias("doc_id"), "rank")

    # 3. hybrid: reciprocal-rank fusion + agreement diagnostics
    fused = rrf_fuse([lexical, semantic], k0=60, k=5).persist()
    n_queries = queries.count()
    top1 = fused.where(F.col("rank") == 1)
    agree = {int(r["n_systems"]): int(r["n"]) for r in
             fused.groupBy("n_systems").agg(F.count("*").alias("n")).collect()}

    # parity invariant: fusing can only surface docs one of the two
    # systems ranked, and every query fills its k
    both = lexical.select("query_id", "doc_id").unionByName(
        semantic.select("query_id", "doc_id")).distinct()
    orphans = fused.join(both, ["query_id", "doc_id"], "left_anti").count()
    per_query = fused.groupBy("query_id").count().agg(
        F.min("count"), F.max("count")).first()

    # 4. predicate-filtered lexical search (stats follow the filter)
    filtered = bm25_topk(docs, queries, k=5, where="lang = 'en'")
    en_ids = docs.where("lang = 'en'").select("doc_id")
    leaked = filtered.join(en_ids, "doc_id", "left_anti").count()

    postings.unpersist()
    out = {
        "n_queries": int(n_queries),
        "n_postings": int(n_postings),
        "fused_rows": int(fused.count()),
        "fused_orphans": int(orphans),
        "top1_in_both_systems": int(
            top1.where(F.col("n_systems") == 2).count()),
        "agreement_histogram": agree,
        "min_per_query": int(per_query[0]),
        "max_per_query": int(per_query[1]),
        "filtered_rows": int(filtered.count()),
        "filtered_non_english_leaks": int(leaked),
    }
    fused.unpersist()
    return out


if __name__ == "__main__":
    s = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false").getOrCreate())
    print(main(s))
    s.stop()
