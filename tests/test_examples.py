"""Examples are executable documentation — assert they run
(reference ``examples/ExamplesSuite.scala`` pattern)."""

import os
import sys

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "examples")
)


def test_quickstart_example(spark, sf_dir):
    import quickstart_clustering

    out = quickstart_clustering.main(spark, sf_dir)
    assert out["k"] == 5
    assert out["rows_scored"] > 0
    assert out["wcss"] > 0


def test_dedup_example(spark, sf_dir):
    import dedup_pipeline

    out = dedup_pipeline.main(spark, sf_dir)
    assert out["after_exact_dedup"] <= out["input_docs"]
    assert out["lsh_candidates"] >= out["near_dups_verified"]


def test_streaming_example(spark, sf_dir):
    import streaming_clustering

    out = streaming_clustering.main(spark, sf_dir)
    assert out["batches"] >= 1
    assert out["recovered_matches"] is True


def test_transforms_and_pruning_example(spark, sf_dir):
    import transforms_and_pruning

    out = transforms_and_pruning.main(spark, sf_dir)
    assert out["kl_caps"]["requires_positive"] is True
    assert "log1p" in out["kl_caps"]["recommended_transform"]
    assert 0.0 < out["pruning_rate"] < 1.0


def test_corpus_prep_example(spark, sf_dir):
    import corpus_prep

    out = corpus_prep.main(spark, sf_dir)
    assert out["kept_docs"] <= out["input_docs"]
    assert out["decontaminated_docs"] <= out["kept_docs"]
    assert out["training_sequences"] >= 1
    assert out["sampled_tokens"] >= 1
    assert sum(out["audit"].values()) == out["input_docs"]
    assert out["fit_iterations"] >= 1
    assert out["event_count"] >= out["fit_iterations"] * 2 + 2
    assert out["report_lines"] > 3


def test_streaming_near_dup_example(spark, sf_dir):
    import streaming_near_dup

    out = streaming_near_dup.main(spark, sf_dir)
    assert out["signatures_in_state"] == out["docs"]
    assert out["micro_batches"] >= 2  # the cross-batch state path ran
    assert out["near_dup_pairs"] >= 0


def test_curation_select_pack_example(spark, sf_dir):
    import curation_select_pack

    out = curation_select_pack.main(spark, sf_dir)
    assert 0 < out["selected_docs"] <= out["input_docs"]
    assert 0 < out["mixed_docs"] <= out["selected_docs"]
    assert out["training_sequences"] >= 1
    assert out["shard_mismatches"] == 0
    assert 0.0 <= out["ivfpq_recall_at_5"] <= 1.0


def test_curation_round7_example(spark, sf_dir):
    import curation_round7

    out = curation_round7.main(spark, sf_dir)
    assert out["after_gopher"] <= out["input_docs"]
    assert out["span_tokens_dropped"] >= 0
    assert out["bpe_merges"] == 32
    assert out["total_bpe_tokens"] > 0 and out["packs"] > 0
    assert out["semantic_candidate_pairs"] >= 0
    # both trained tokenizers subword-split the same cleaned corpus:
    # counts land above word count (splits happen) and stay within a
    # small factor of each other — real parity, not >= 0
    assert 0 < out["unigram_vocab"] <= 96
    assert out["total_unigram_tokens"] > 0
    ratio = out["total_unigram_tokens"] / out["total_bpe_tokens"]
    assert 0.2 < ratio < 5.0, ratio


def test_incremental_curation_example(spark, sf_dir):
    import incremental_curation

    out = incremental_curation.main(spark, sf_dir)
    assert out["store_invariant_holds"] is True
    assert len(out["deltas"]) == 2
    for d in out["deltas"]:
        assert d["accepted"] <= d["delta_rows"]
        assert 0.0 <= d["js_vs_corpus"] <= 0.6932


def test_event_analytics_example(spark, sf_dir):
    import event_analytics

    out = event_analytics.main(spark, sf_dir)
    assert 0 < out["events_kept"] <= out["events_in"]
    assert out["funnel"]["view"] >= out["funnel"]["click"] >= \
        out["funnel"]["purchase"]
    assert out["cohort_cells"] >= 1
    assert set(out["grain_buckets"]) == {"hour", "day"}
    assert out["grain_buckets"]["hour"] >= out["grain_buckets"]["day"]
    # the completions set IS the final funnel stage, row for row
    assert out["converters"] == out["funnel"]["purchase"]
    # segmented retention drill-down: every converter is active in its
    # own cohort week, so the offset-0 column sums to the converters
    assert out["segment_retention_cells"] >= 1
    assert out["segment_offset0_total"] == out["converters"]


def test_streaming_temporal_example(spark, sf_dir, tmp_path):
    import streaming_temporal

    out = streaming_temporal.main(spark, sf_dir, workdir=str(tmp_path))
    assert out["clicks"] > 0
    assert 0 <= out["clicks_with_error_context"] <= out["clicks"]
    assert out["conversions"] >= 0
    assert out["retention_cells"] >= 1
    # streamed + flushed = every error row exactly once (batch parity)
    assert out["errors_in"] == (
        out["errors_streamed"] + out["errors_held_then_flushed"])
    # held rows are exactly the unmatched trailing lefts: NULL payload
    assert out["errors_held_null_payload"] == out["errors_held_then_flushed"]
    # native session_window replay: streamed + flushed == batch, and a
    # bounded replay ALWAYS holds its trailing sessions (end > max ts)
    assert out["sessions_held_then_flushed"] >= 1
    assert out["sessions_batch"] == (
        out["sessions_streamed"] + out["sessions_held_then_flushed"])
    # native windowed-min_by throttle: streamed + flushed == batch
    assert out["throttle_kept_batch"] == (
        out["throttle_kept_streamed"]
        + out["throttle_kept_held_then_flushed"])
    assert out["throttle_kept_held_then_flushed"] >= 1


def test_curation_round9_example(spark, sf_dir):
    import curation_round9

    out = curation_round9.main(spark, sf_dir)
    assert 0 < out["realized_docs"] <= out["input_docs"]
    assert 0 < out["filtered_docs"] <= out["realized_docs"]
    assert sum(out["split_counts"].values()) == out["filtered_docs"]
    assert out["component_straddlers"] == 0
    assert out["opq_topk_rows"] == 15


def test_hybrid_search_example(spark, sf_dir):
    import hybrid_search

    out = hybrid_search.main(spark, sf_dir)
    assert out["n_queries"] == 10
    assert out["n_postings"] > out["n_queries"]
    # every fused doc came from one of the two systems, every query
    # fills exactly k=5, and fusion found cross-system agreement
    assert out["fused_orphans"] == 0
    assert out["min_per_query"] == 5 and out["max_per_query"] == 5
    assert out["fused_rows"] == 5 * out["n_queries"]
    assert out["agreement_histogram"].get(2, 0) >= 1
    # predicate contract: k survives the filter, nothing non-English
    assert out["filtered_rows"] == 5 * out["n_queries"]
    assert out["filtered_non_english_leaks"] == 0
