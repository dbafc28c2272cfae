"""Session-pins gate (r12 verdict item 8): every entry builder whose
operator persists a shared intermediate registers it on the
module-level session pins, the NEXT pins-using builder drains the
previous one's, and release_pins() empties the registry — so repeated
driver/oracle sweeps in one long-lived session never accumulate
cached frames.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

# Every declared query whose operator takes pins= (the evaluate-once
# persists of r12 opts #8/#10 plus the cascade partials).
PINS_QUERIES = [
    "dedup_simhash_near_dups",
    "doc_collocations",
    "corpus_drift_gauges",
    "corpus_drift_top_terms",
    "corpus_source_overlap",
    "multimodal_audio_near_dups",
    "multimodal_video_near_dups",
    "dedup_flag_propagation",
    "events_rollup_cascade",
    "semantic_dedup_groups",
    "dedup_components",
    "dedup_components_star",
    "dedup_soft_weights",
    "dedup_jaccard_verify",
]

# propagate_flags at rounds=2 pins the most: sym + flagged + 1 reused
# frontier = 3; collocations pins 2; everything else 1-2. A whole
# query in flight should never hold more than this many new persists.
MAX_PINS_IN_FLIGHT = 6


def _persistent_ids(spark):
    return set(spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray())


def test_pins_queries_declared(spark):
    qs = entrymod.queries()
    for name in PINS_QUERIES:
        assert name in qs, name


def test_session_pins_bound_cache_accumulation(spark, sf_dir):
    qs = entrymod.queries()
    entrymod.release_pins()
    base = _persistent_ids(spark)
    for name in PINS_QUERIES:
        df = qs[name](spark, sf_dir)
        df.count()  # materialize the operator's persists
        new = _persistent_ids(spark) - base
        # bounded while in flight: the previous builder's pins were
        # drained when this builder ran
        assert len(new) <= MAX_PINS_IN_FLIGHT, (name, len(new))
    entrymod.release_pins()
    leaked = _persistent_ids(spark) - base
    assert not leaked, f"unreleased operator persists: {leaked}"
    assert len(entrymod._SESSION_PINS) == 0


def test_release_pins_idempotent(spark, sf_dir):
    entrymod.release_pins()
    entrymod.release_pins()
    assert len(entrymod._SESSION_PINS) == 0
