"""Executable documentation: one-call training-corpus preparation.

Signals → rule filters → duplicate-group resolution → per-row
verdicts, then the audit rollup and the typed training-event log from
a clustering fit over the surviving documents' quality signals.
"""

import sys
import os

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main(spark: SparkSession, sf_dir: str = "/root/testdata/sf0.001") -> dict:
    from generalized_kmeans_clustering_spark import GeneralizedKMeans, SummarySink
    from generalized_kmeans_clustering_spark.operators.corpus import (
        corpus_stats, prepare_corpus,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

    # one declarative pass: signals + filters + near-dup groups + verdicts
    prepared = prepare_corpus(
        docs,
        min_tokens=10,
        languages=["en"],
        min_quality=0.05,
        dedup="minhash", minhash_threshold=0.6,
    )
    audit = {r["outcome"]: int(r["n_docs"])
             for r in corpus_stats(prepared).collect()}
    kept = prepared.where("keep")

    # benchmark decontamination: drop docs leaking eval content
    # (here: the first 20 docs stand in for an eval set)
    from generalized_kmeans_clustering_spark.operators.decontamination import (
        decontaminate,
    )

    bench = docs.where(F.col("doc_id") < 20)
    clean = decontaminate(kept, bench, method="ngram", n=5, mode="drop")
    n_clean = clean.count()

    # shape the training mix: sample the clean corpus down to a token
    # budget (deterministic hash filter — same rows every run), then
    # pack the survivors into fixed-length training sequences
    from generalized_kmeans_clustering_spark.operators.packing import (
        pack_concat,
    )
    from generalized_kmeans_clustering_spark.operators.sampling import (
        token_budget_sample,
    )

    total_tokens = int(clean.agg(F.sum("n_tokens")).first()[0] or 0)
    mixed = token_budget_sample(
        clean, {"en": max(total_tokens // 2, 1)}, strata_col="lang",
        token_col="n_tokens", seed=7,
    )
    spans = pack_concat(mixed, seq_len=256, num_shards=4, seed=7)
    n_sequences = spans.select("shard", "pack").distinct().count()

    # cluster the kept docs by their quality signals, watching the
    # typed event log live through a caller-owned sink
    feats = kept.select(
        F.array(
            F.col("quality"),
            F.col("n_tokens").cast("double") / 100.0,
        ).alias("features")
    )
    sink = SummarySink()
    model = GeneralizedKMeans(k=3, max_iter=5, seed=11,
                              event_sink=sink).fit(feats)
    report = sink.summary().report()

    return {
        "input_docs": int(docs.count()),
        "kept_docs": int(audit.get("kept", 0)),
        "decontaminated_docs": n_clean,
        "sampled_tokens": int(
            mixed.agg(F.sum("n_tokens")).first()[0] or 0),
        "training_sequences": n_sequences,
        "audit": audit,
        "fit_iterations": model.summary.iterations,
        "event_count": sink.size,
        "report_lines": len(report.splitlines()),
    }


if __name__ == "__main__":
    s = (SparkSession.builder.master("local[4]")
         .config("spark.ui.enabled", "false").getOrCreate())
    print(main(s))
    s.stop()
