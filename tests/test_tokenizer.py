"""Trained BPE tokenizer (operators/tokenizer.py): merge learning,
application, replace-chain equivalence (the oracle-twin contract),
persistence, and the token-column integration with packing."""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.tokenizer import (
    BPEModel,
    _segment,
    bpe_token_count,
    bpe_tokens,
    learn_merges_from_counts,
    read_bpe_model,
    train_bpe,
    write_bpe_model,
)


def test_merge_learning_classic_example():
    """Sennrich-style word table (no end-of-word marker): pair mass
    (e,s)=9 ties (s,t)=9 → lexicographic tie-break picks (e,s), then
    the created symbol participates in the next merge (es,t)=9."""
    counts = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = learn_merges_from_counts(counts, 3)
    assert merges[0] == ["e", "s"]
    assert merges[1] == ["es", "t"]
    # third: remaining top pair is (l,o) 7 vs (w,est) 9? (w,est):
    # newest 6 + widest 0 (w i d est) = 6; (l,o)=7 wins
    assert merges[2] == ["l", "o"]


def test_segment_applies_merges_in_order():
    merges = [("e", "s"), ("es", "t"), ("l", "o")]
    assert _segment("newest", merges) == ["n", "e", "w", "est"]
    assert _segment("lowest", merges) == ["lo", "w", "est"]
    assert _segment("a", merges) == ["a"]
    assert _segment("", merges) == []


def test_train_bpe_matches_pure_python_on_manual_counts(spark):
    rows = ([("low",)] * 5 + [("lower",)] * 2 + [("newest",)] * 6
            + [("widest",)] * 3)
    df = spark.createDataFrame(rows, "text string")
    model = train_bpe(df, num_merges=3)
    assert model.merges == learn_merges_from_counts(
        [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)], 3)
    # multi-word rows count words, not rows
    df2 = spark.createDataFrame([("low low newest",)] * 2, "text string")
    m2 = train_bpe(df2, num_merges=1)
    # pairs: low x4 -> (l,o)=4, (o,w)=4; newest x2 -> (e,s)=(s,t)=2
    # tie (l,o) vs (o,w) -> lexicographic (l,o)
    assert m2.merges == [["l", "o"]]


def test_token_count_and_tokens_with_memo_and_nulls(spark):
    model = BPEModel(merges=[["e", "s"], ["es", "t"]])
    df = spark.createDataFrame(
        [(0, "newest newest widest"), (1, None), (2, "")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"]
           for r in bpe_token_count(df, model).collect()}
    # newest -> n e w est (4), widest -> w i d est (4)
    assert got[0] == 12 and got[1] is None and got[2] == 0
    toks = {r["doc_id"]: r["tokens"] for r in bpe_tokens(df, model).collect()}
    assert toks[0][:4] == ["n", "e", "w", "est"]
    assert toks[1] is None and toks[2] == []


def _replace_chain(word: str, merges) -> list:
    """The oracle twin's application: each symbol carries its OWN
    delimiters (\\x01 sym \\x02), so symbol-disjoint pair occurrences
    are string-disjoint and ONE non-overlapping replace per merge is
    exactly canonical greedy left-to-right BPE (a shared-delimiter
    encoding like ' a b ' makes replace skip boundary-sharing
    occurrences and diverge)."""
    s = "".join(f"\x01{c}\x02" for c in word)
    for a, b in merges:
        s = s.replace(f"\x01{a}\x02\x01{b}\x02", f"\x01{a}{b}\x02")
    return [t[:-1] for t in s.split("\x01") if t]


def test_replace_chain_equals_segment_on_adversarial_words():
    """The DuckDB twin is a replace chain — it must equal the real
    application even on boundary-sharing runs like 'ababab'."""
    merges = [("a", "b"), ("a", "a"), ("ab", "ab"), ("b", "a")]
    words = ["ababab", "aaaa", "aaab", "abab", "baba", "abba",
             "aabbaabb", "ababababab", "b", "", "xyz"]
    for w in words:
        assert _replace_chain(w, merges) == _segment(w, merges), w


def test_replace_chain_equals_segment_on_corpus_words(spark, sf_dir):
    """Same equivalence over every distinct word in the real documents
    table with corpus-learned merges — the exact contract the oracle
    row depends on."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    model = train_bpe(docs, num_merges=24)
    words = [r["w"] for r in docs.select(
        F.explode(F.split("text", r"\s+")).alias("w"))
        .where(F.col("w") != "").distinct().collect()]
    merges = [tuple(m) for m in model.merges]
    for w in words:
        assert _replace_chain(w, merges) == _segment(w, merges), w


def test_bpe_model_roundtrips_through_shared_sidecar(spark, tmp_path):
    model = BPEModel(merges=[["t", "h"], ["th", "e"]])
    write_bpe_model(spark, model, str(tmp_path / "bpe"))
    got = read_bpe_model(spark, str(tmp_path / "bpe"))
    assert got.merges == [["t", "h"], ["th", "e"]]
    raw = spark.read.json(str(tmp_path / "bpe")).first()
    assert raw["kind"] == "bpe_merges" and raw["sha256"]


def test_bpe_counts_drive_pack_concat(spark):
    """The n_tokens contract: pack_concat over BPE counts conserves
    the corpus token total across spans."""
    from generalized_kmeans_clustering_spark.operators.packing import (
        pack_concat,
    )

    model = BPEModel(merges=[["e", "s"], ["es", "t"]])
    df = spark.createDataFrame(
        [(i, "newest widest " * (i + 1)) for i in range(20)],
        "doc_id long, text string")
    toks = bpe_token_count(df, model)
    total = toks.agg(F.sum("n_tokens")).collect()[0][0]
    spans = pack_concat(toks, seq_len=16, num_shards=2, seed=1)
    assert spans.agg(F.sum("length")).collect()[0][0] == total


def test_bpe_encode_ids_consistent_with_counts_and_decodable(spark):
    """size(token_ids) == bpe_token_count by construction, char ids
    are codepoints, merge ids are MERGE_ID_BASE + rank, and ids decode
    back to the original text."""
    from generalized_kmeans_clustering_spark.operators.tokenizer import (
        MERGE_ID_BASE, bpe_encode, bpe_symbol_ids,
    )

    model = BPEModel(merges=[["e", "s"], ["es", "t"], ["t", "h"]])
    df = spark.createDataFrame(
        [(0, "newest the widest"), (1, None), (2, "")],
        "doc_id long, text string")
    enc = {r["doc_id"]: r["token_ids"] for r in
           bpe_encode(df, model).collect()}
    cnt = {r["doc_id"]: r["n_tokens"] for r in
           bpe_token_count(df, model).collect()}
    assert enc[1] is None and enc[2] == []
    assert len(enc[0]) == cnt[0]
    inv = {v: k for k, v in bpe_symbol_ids(model).items()}

    def decode(ids):
        return "".join(inv[i] if i >= MERGE_ID_BASE else chr(i)
                       for i in ids)

    # word boundaries are not marked; per-word segments concatenate
    assert decode(enc[0]) == "newestthewidest"
    assert MERGE_ID_BASE + 1 in enc[0]  # 'est' merge output used


def test_materialize_packs_ids_reassembles_exactly(spark):
    """Packed ID sequences conserve and reorder nothing: flattening
    all packs in (shard, pack, offset) order reproduces every
    document's ID sequence, and every non-final pack per shard is
    exactly seq_len ids."""
    from collections import defaultdict

    from generalized_kmeans_clustering_spark.operators.packing import (
        materialize_packs_ids, pack_concat,
    )
    from generalized_kmeans_clustering_spark.operators.tokenizer import (
        bpe_encode,
    )

    model = BPEModel(merges=[["e", "s"], ["es", "t"]])
    df = spark.createDataFrame(
        [(i, "newest widest " * (i % 5 + 1)) for i in range(40)],
        "doc_id long, text string")
    enc = bpe_encode(df, model)
    counted = enc.select(
        "doc_id", F.size("token_ids").cast("bigint").alias("n_tokens"))
    spans = pack_concat(counted, seq_len=32, num_shards=2, seed=5)
    packs = materialize_packs_ids(enc, spans).collect()
    total_ids = sum(len(r["token_ids"]) for r in packs)
    assert total_ids == sum(
        len(r["token_ids"]) for r in enc.select("token_ids").collect())
    by_shard = defaultdict(list)
    for r in packs:
        by_shard[r["shard"]].append(r)
        assert len(r["token_ids"]) == r["n_tokens"]
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["pack"])
        for r in rows[:-1]:
            assert r["n_tokens"] == 32
