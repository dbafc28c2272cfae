"""Unigram-LM tokenizer (operators/unigram.py): Viterbi segmentation
contract, hard-EM training shape, application columns, sidecar
round-trip. The application path is additionally value-verified against
the DuckDB recursive-CTE twin by tests/test_entry_oracle.py
(corpus_unigram_stats)."""

import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.operators.unigram import (
    UnigramModel, read_unigram_model, train_unigram_lm, unigram_doc_stats,
    unigram_token_count, unigram_tokens, viterbi_segment,
    write_unigram_model,
)


def test_viterbi_maximizes_score_then_fewest_tokens():
    pieces = {"ab": 2.0, "bc": 2.0, "abc": 2.0}
    # 'abc' via single piece scores 2 with 1 token; 'ab'+'c' scores
    # 2+1=3 — higher score wins even with more tokens
    toks, score, n = viterbi_segment("abc", pieces, 1.0, 3)
    assert (score, n) == (3.0, 2) and toks == ["ab", "c"]
    # equal score, fewer tokens wins: 'ab' (2.0, 1 tok) vs 'a'+'b'
    # (1+1=2.0, 2 toks)
    toks, score, n = viterbi_segment("ab", pieces, 1.0, 3)
    assert toks == ["ab"] and (score, n) == (2.0, 1)


def test_viterbi_unknown_chars_always_segmentable():
    toks, score, n = viterbi_segment("xyz", {}, -5.0, 4)
    assert toks == ["x", "y", "z"] and n == 3 and score == -15.0
    assert viterbi_segment("", {}, 1.0, 4) == ([], 0.0, 0)


def test_viterbi_matches_brute_force():
    """Exhaustive check on every word up to length 7 over a small
    alphabet: the DP equals brute-force max over all segmentations."""
    import itertools

    pieces = {"aa": 3.0, "ab": 2.0, "ba": 2.0, "aab": 5.0, "b": 1.5}
    unk = 1.0

    def brute(word):
        n = len(word)
        best = None
        for cuts in itertools.product([0, 1], repeat=max(n - 1, 0)):
            segs, lo = [], 0
            for i, c in enumerate(cuts, start=1):
                if c:
                    segs.append(word[lo:i])
                    lo = i
            segs.append(word[lo:])
            if any(len(s) > 3 for s in segs):
                continue
            ok, sc = True, 0.0
            for s in segs:
                if len(s) == 1:
                    sc += pieces.get(s, unk)
                elif s in pieces:
                    sc += pieces[s]
                else:
                    ok = False
                    break
            if ok:
                cand = (sc, -len(segs))
                if best is None or cand > best:
                    best = cand
        return best

    for n in range(1, 8):
        for w in itertools.product("ab", repeat=n):
            word = "".join(w)
            _, score, ntok = viterbi_segment(word, pieces, unk, 3)
            assert (score, -ntok) == brute(word), word


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [("low low low lower lowest newer newest wider",),
            ("low lower newer newer wider widest low",),
            ("newest lowest low newer wide wide wider",)] * 4
    return spark.createDataFrame(rows, "text string")


def test_train_is_deterministic_and_bounded(spark, corpus):
    m1 = train_unigram_lm(corpus, vocab_size=12, seed_size=64,
                          max_piece_len=4, em_rounds=2)
    m2 = train_unigram_lm(corpus, vocab_size=12, seed_size=64,
                          max_piece_len=4, em_rounds=2)
    assert m1.pieces == m2.pieces and m1.unk_score == m2.unk_score
    assert len(m1.pieces) <= 12
    chars = {c for r in corpus.collect() for c in r["text"]
             if not c.isspace()}
    # single-character coverage never pruned
    assert chars <= set(m1.pieces)
    # the corpus is built from lo/ne/wi-stem words: training keeps at
    # least one multi-char piece and uses it on the most frequent word
    multi = [p for p in m1.pieces if len(p) > 1]
    assert multi
    toks, _, n = viterbi_segment("low", m1.pieces, m1.unk_score,
                                 m1.max_piece_len)
    assert n < 3  # not character-exploded


def test_application_columns_and_null_text(spark, corpus):
    model = train_unigram_lm(corpus, vocab_size=12, seed_size=64,
                             max_piece_len=4, em_rounds=1)
    df = spark.createDataFrame(
        [(0, "low lower"), (1, None), (2, "")],
        "doc_id long, text string")
    cnt = {r["doc_id"]: r["n_tokens"]
           for r in unigram_token_count(df, model).collect()}
    toks = {r["doc_id"]: r["tokens"]
            for r in unigram_tokens(df, model).collect()}
    stats = {r["doc_id"]: (r["n_tokens"], r["score"])
             for r in unigram_doc_stats(df, model).collect()}
    assert cnt[1] is None and toks[1] is None and stats[1] == (None, None)
    assert cnt[2] == 0 and toks[2] == [] and stats[2] == (0, 0.0)
    assert cnt[0] == len(toks[0]) == stats[0][0] > 0
    # the reported score IS the sum of the emitted pieces' scores
    expect = sum(model.pieces.get(t, model.unk_score) for t in toks[0])
    assert abs(stats[0][1] - expect) < 1e-9


def test_sidecar_roundtrip(spark, corpus, tmp_path):
    model = train_unigram_lm(corpus, vocab_size=12, seed_size=64,
                             max_piece_len=4, em_rounds=1)
    path = str(tmp_path / "uni_model")
    write_unigram_model(spark, model, path)
    back = read_unigram_model(spark, path)
    assert back.pieces == model.pieces
    assert back.unk_score == model.unk_score


def test_fixed_model_matches_entry_oracle_contract(spark):
    """The integer-weight encoding the oracle relies on: with integer
    piece scores, max(score, -ntok) == max(1024*score - ntok); the
    UnigramModel path reports both halves of that objective."""
    import __spark_entry__ as em

    model = UnigramModel(
        pieces={k: float(v)
                for k, v in em._UNIGRAM_FIXED_PIECES.items()},
        unk_score=1.0)
    df = spark.createDataFrame(
        [(0, "window scan the table customer")], "doc_id long, text string")
    r = unigram_doc_stats(df, model).first()
    # window->win+dow(10,2) scan->scan(9,1) the->the(7,1)
    # table->tab+le(10,2) customer->c,u,st,o,m,er(12,6)
    assert (r["n_tokens"], r["score"]) == (12, 48.0)


def test_unigram_counts_feed_the_packing_layer(spark, corpus):
    """unigram_token_count satisfies the same n_tokens contract as
    bpe_token_count: its output feeds pack_concat directly, spans
    conserve every token exactly once, and no span exceeds seq_len."""
    from generalized_kmeans_clustering_spark.operators.packing import (
        pack_concat,
    )

    model = train_unigram_lm(corpus, vocab_size=12, seed_size=64,
                             max_piece_len=4, em_rounds=1)
    docs = spark.createDataFrame(
        [(i, r["text"]) for i, r in enumerate(corpus.collect())],
        "doc_id long, text string")
    counted = unigram_token_count(docs, model).select("doc_id", "n_tokens")
    spans = pack_concat(counted, seq_len=16, num_shards=2, seed=1)
    rows = spans.collect()
    total = {r["doc_id"]: r["n_tokens"] for r in counted.collect()}
    got = {}
    for r in rows:
        got[r["doc_id"]] = got.get(r["doc_id"], 0) + r["length"]
        assert 0 < r["length"] <= 16
        assert 0 <= r["pack_offset"] < 16
    assert got == {d: n for d, n in total.items() if n > 0}


def test_unigram_encode_id_scheme(spark):
    """Token IDs: codepoint for single chars, 0x110000 + lexicographic
    rank for multi-char pieces — reproducible from the vocab alone and
    collision-free between the two spaces; NULL text stays NULL."""
    from generalized_kmeans_clustering_spark.operators.unigram import (
        unigram_encode, unigram_symbol_ids,
    )

    model = UnigramModel(pieces={"ab": 2.0, "abc": 9.0, "zz": 2.0},
                         unk_score=1.0)
    ids = unigram_symbol_ids(model)
    assert ids == {"ab": 0x110000, "abc": 0x110001, "zz": 0x110002}
    df = spark.createDataFrame(
        [(0, "abc zzq"), (1, None)], "doc_id long, text string")
    out = {r["doc_id"]: r["token_ids"]
           for r in unigram_encode(df, model).collect()}
    assert out[0] == [0x110001, 0x110002, ord("q")]
    assert out[1] is None


def test_apply_rejects_reserved_column_clash(spark):
    """Applying a unigram surface to a frame that already has the
    output column (the natural tokenizer-comparison mistake: BPE
    n_tokens then unigram n_tokens) raises instead of silently
    clobbering and emitting a duplicate-name schema (r12 advisor)."""
    model = UnigramModel(pieces={"ab": 2.0}, unk_score=1.0)
    df = spark.createDataFrame(
        [(0, "ab", 7)], "doc_id long, text string, n_tokens long")
    with pytest.raises(ValueError, match="n_tokens"):
        unigram_token_count(df, model)


def test_seed_excludes_single_char_words_from_substrings(spark):
    """1-char words must not fabricate multi-char seed candidates:
    sequence(1, 0) evaluates DESCENDING in Spark, which triple-counted
    the character into the substring aggregation (r12 advisor). The
    single char still enters the vocabulary via the char aggregation
    with its true count."""
    df = spark.createDataFrame(
        [(0, "a a a a a a bc bc")], "doc_id long, text string")
    model = train_unigram_lm(df, vocab_size=8, seed_size=8,
                             max_piece_len=4, em_rounds=1)
    assert "a" in model.pieces          # via the char path
    assert "bc" in model.pieces         # real multi-char piece
    # no phantom multi-char piece equal to a 1-char word's char
    assert all(len(p) >= 2 or p in {"a", "b", "c", " "}
               for p in model.pieces)
