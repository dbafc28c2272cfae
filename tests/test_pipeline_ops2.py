"""Tests for language-ID, regex tokens, near-dup embeddings, multimodal stubs."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.functions import text as T
from generalized_kmeans_clustering_spark.operators.similarity import (
    embedding_near_dup_pairs, embedding_near_dups_ivf,
)
from generalized_kmeans_clustering_spark.sources.multimodal import (
    attach_media_metadata, decode_image_meta, image_embedding,
    sample_video_frames,
)


def test_language_id(spark):
    df = spark.createDataFrame(
        [("the cat and the dog is of to",),
         ("der hund und die katze ist nicht",),
         ("le chat et la maison est les",),
         ("el perro es una casa que los",),
         ("xyzzy qwerty",)],
        "text string",
    )
    out = [r["lang"] for r in
           df.select(T.language_id(F.col("text")).alias("lang")).collect()]
    assert out == ["en", "de", "fr", "es", "unknown"]


def test_token_count_regex(spark):
    df = spark.createDataFrame([("hello world42 foo-bar!",)], "text string")
    n = df.select(T.token_count_regex(F.col("text")).alias("n")).collect()[0]["n"]
    # hello | world | 42 | foo | - | bar | !
    assert n == 7


def test_min_shingle_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [("a b c d e",), ("a b c d e",), ("z y x w v",)], "text string"
    )
    fps = [r["fp"] for r in df.select(
        T.min_shingle_fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]
    assert fps[0] != fps[2]
    assert len(fps[0]) == 32  # md5 hex


def test_embedding_near_dup_exact_and_ivf(spark):
    rng = np.random.default_rng(111)
    base = rng.normal(0, 1, (30, 16))
    rows = []
    for i, v in enumerate(base):
        rows.append((i, (v / np.linalg.norm(v)).tolist()))
    # add 5 near-duplicates of vectors 0..4
    for j in range(5):
        v = base[j] + rng.normal(0, 0.01, 16)
        rows.append((100 + j, (v / np.linalg.norm(v)).tolist()))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = embedding_near_dup_pairs(df, threshold=0.99).collect()
    found = {(r["i"], r["j"]) for r in exact}
    assert {(j, 100 + j) for j in range(5)} <= found
    # bucketed variant finds the same dups (tiny corpus → few lists)
    ivf = embedding_near_dups_ivf(df, threshold=0.99, n_lists=4).collect()
    found_ivf = {(r["i"], r["j"]) for r in ivf}
    assert {(j, 100 + j) for j in range(5)} <= found_ivf


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", bytes(range(64))),
        (2, "image", b"\xff" * 100),
        (3, "video", bytes(range(250))),
    ]
    return spark.createDataFrame(
        rows, "media_id long, media_type string, content binary"
    )


def test_media_metadata(spark, media):
    out = attach_media_metadata(media).collect()
    assert out[0]["meta"]["n_bytes"] == 64
    assert len(out[0]["meta"]["sha256"]) == 64


def test_decode_image_meta_fake(spark, media):
    out = decode_image_meta(media.where("media_type='image'")).collect()
    assert all(r["width"] >= 64 and r["height"] >= 64 for r in out)
    assert all(r["channels"] == 3 for r in out)
    # deterministic: same bytes → same dims
    again = decode_image_meta(media.where("media_type='image'")).collect()
    assert [(r["width"], r["height"]) for r in out] == \
           [(r["width"], r["height"]) for r in again]


def test_decode_real_probes_pil(spark, media):
    """decoder='real' uses Pillow when importable; otherwise fails fast
    (at call time, before any Spark job) naming the missing package."""
    try:
        import PIL  # noqa: F401

        has_pil = True
    except ImportError:
        has_pil = False
    if not has_pil:
        with pytest.raises(NotImplementedError, match="Pillow"):
            decode_image_meta(media, decoder="real")
        with pytest.raises(NotImplementedError, match="Pillow"):
            image_embedding(media, decoder="real")
        return
    # Pillow present: decode a real PNG end-to-end
    import io

    from PIL import Image

    buf = io.BytesIO()
    Image.new("RGB", (20, 10)).save(buf, format="PNG")
    df = spark.createDataFrame([(1, bytearray(buf.getvalue()))],
                               "media_id long, content binary")
    row = decode_image_meta(df, decoder="real").collect()[0]
    assert (row["width"], row["height"], row["channels"]) == (20, 10, 3)
    emb = image_embedding(df, dim=16, decoder="real").collect()[0]
    assert len(emb["embedding"]) == 16
    assert abs(np.linalg.norm(emb["embedding"]) - 1.0) < 1e-5


def test_video_real_names_ffmpeg(spark, media):
    """Without a video binding, decoder='real' fails fast on the driver
    naming what to install (the Pillow-gate pattern); with one
    installed the probe resolves and this test does not apply."""
    from generalized_kmeans_clustering_spark.sources import multimodal as M

    if M._try_video_decoder() is not None:
        pytest.skip("a real video binding is installed")
    with pytest.raises(NotImplementedError, match="ffmpeg"):
        sample_video_frames(media, decoder="real")


def test_video_real_path_plumbing_with_injected_decoder(
        spark, media, monkeypatch):
    """The decoder='real' Spark plumbing (driver probe → captured
    decode callable → mapInPandas explode → NULL-on-poison row) runs
    end-to-end with a deterministic injected binding — only the codec
    call is faked, exactly the seam a PyAV/imageio install fills."""
    from generalized_kmeans_clustering_spark.sources import multimodal as M

    def fake_decode(buf, every_n, max_frames):
        if buf[:1] == b"\xff":           # poisoned container
            raise ValueError("bad container")
        # one 'frame' per 100 source bytes, capped — deterministic
        n = min(max_frames, max(len(buf) // 100, 1))
        return [bytes([i]) * 12 for i in range(n)]

    monkeypatch.setattr(M, "_try_video_decoder", lambda: "fakebind")
    monkeypatch.setitem(M._REAL_FRAME_DECODERS, "fakebind", fake_decode)

    df = spark.createDataFrame(
        [(0, bytearray(bytes(250))),             # 2 frames
         (1, bytearray(b"\xff" + bytes(300))),   # poisoned -> NULL row
         (2, bytearray(bytes(1000)))],           # capped at max_frames=3
        "media_id long, content binary")
    out = M.sample_video_frames(
        df, every_n=5, max_frames=3, decoder="real").collect()
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
    assert [r["frame_no"] for r in
            sorted(by_id[0], key=lambda r: r["frame_no"])] == [0, 1]
    assert by_id[0][0]["frame_bytes"] is not None
    assert len(by_id[1]) == 1
    assert by_id[1][0]["frame_no"] is None         # NULL-on-poison
    assert by_id[1][0]["frame_bytes"] is None
    assert sorted(r["frame_no"] for r in by_id[2]) == [0, 1, 2]
    # frame bytes come from the injected decoder verbatim
    assert {bytes(r["frame_bytes"]) for r in by_id[2]} == {
        b"\x00" * 12, b"\x01" * 12, b"\x02" * 12}


def test_image_embedding_plumbing(spark, media):
    out = image_embedding(media, dim=8).collect()
    assert all(len(r["embedding"]) == 8 for r in out)
    norms = [np.linalg.norm(r["embedding"]) for r in out]
    assert all(abs(n - 1.0) < 1e-5 for n in norms)


def test_sample_video_frames_fanout(spark, media):
    out = sample_video_frames(
        media.where("media_type='video'"), every_n=50, max_frames=4
    ).collect()
    assert len(out) == 4  # 250 bytes / 50 = 5 → capped at 4
    assert [r["frame_no"] for r in out] == [0, 1, 2, 3]
    assert all(r["media_id"] == 3 for r in out)


def test_winnow_fingerprints_robust_to_local_edit(spark):
    from generalized_kmeans_clustering_spark.functions.text import (
        winnow_fingerprints,
    )

    base = "the quick brown fox jumps over the lazy dog again and again"
    edited = base.replace("lazy", "hazy")
    df = spark.createDataFrame([(0, base), (1, edited), (2, base)],
                               "doc_id long, text string")
    out = {r["doc_id"]: set(r["fingerprints"]) for r in
           winnow_fingerprints(df).collect()}
    # identical docs → identical fingerprints
    assert out[0] == out[2]
    # one-word edit → most fingerprints shared (local change, local effect)
    shared = len(out[0] & out[1]) / len(out[0] | out[1])
    assert shared > 0.5
    assert all(0 <= fp < 1_000_003 for fp in out[0])


def test_decode_audio_meta_fake_deterministic(spark, media):
    from generalized_kmeans_clustering_spark.sources.multimodal import (
        _FAKE_RATES, decode_audio_meta,
    )

    out = {r["media_id"]: r for r in decode_audio_meta(media).collect()}
    assert len(out) == 3
    for mid, content in [(1, bytes(range(64))), (2, b"\xff" * 100),
                         (3, bytes(range(250)))]:
        h = int.from_bytes(content[:8].ljust(8, b"\0"), "little")
        rate = _FAKE_RATES[h % 5]
        n = rate + (h >> 16) % (60 * rate)
        r = out[mid]
        assert r["sample_rate"] == rate
        assert r["channels"] == 1 + (h >> 3) % 2
        assert r["n_samples"] == n
        assert r["duration_sec"] == pytest.approx(n / rate)


def test_decode_audio_meta_real_wav_and_poison(spark):
    """The real audio decoder is stdlib-backed (wave) so it genuinely
    runs: a synthesized WAV parses; garbage bytes yield NULLs instead
    of failing the batch."""
    import io
    import wave as wave_mod

    buf = io.BytesIO()
    with wave_mod.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(16000)
        wf.writeframes(b"\x00\x01" * 2 * 8000)  # 8000 frames, 0.5 s
    wav_bytes = buf.getvalue()

    from generalized_kmeans_clustering_spark.sources.multimodal import (
        decode_audio_meta,
    )

    df = spark.createDataFrame(
        [(1, "audio", wav_bytes), (2, "audio", b"not a wav at all")],
        "media_id long, media_type string, content binary",
    )
    out = {r["media_id"]: r for r in
           decode_audio_meta(df, decoder="real").collect()}
    good = out[1]
    assert good["sample_rate"] == 16000
    assert good["channels"] == 2
    assert good["n_samples"] == 8000
    assert good["duration_sec"] == pytest.approx(0.5)
    bad = out[2]
    assert bad["sample_rate"] is None and bad["duration_sec"] is None


def test_duplicate_components_merges_chains(spark):
    from generalized_kmeans_clustering_spark.operators.dedup import (
        duplicate_components,
    )

    # chain 1-2-3-4 (diameter 3), clique 10-11-12, isolated pair 20-21
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        "i long, j long",
    )
    out = {r["id"]: r["component"]
           for r in duplicate_components(pairs).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1,
                   10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_duplicate_components_long_path_converges(spark):
    from generalized_kmeans_clustering_spark.operators.dedup import (
        duplicate_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "i long, j long")
    out = {r["id"]: r["component"]
           for r in duplicate_components(pairs).collect()}
    assert set(out.values()) == {0}
    assert len(out) == 13


def test_canonical_selection_and_dedup(spark):
    from generalized_kmeans_clustering_spark.operators.dedup import (
        canonical_duplicates, deduplicate, duplicate_components,
    )

    docs = spark.createDataFrame(
        [(1, "short"), (2, "the longest text wins"), (3, "medium text"),
         (7, "untouched singleton")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "i long, j long")
    comp = duplicate_components(pairs)
    out = {r["doc_id"]: (r["component"], r["is_canonical"])
           for r in canonical_duplicates(docs, comp).collect()}
    assert out[2] == (1, True)          # longest text is canonical
    assert out[1] == (1, False) and out[3] == (1, False)
    assert out[7] == (7, True)          # singleton: own component, kept
    kept = {r["doc_id"] for r in deduplicate(docs, comp).collect()}
    assert kept == {2, 7}
    # a custom-named components frame paired with a matching
    # component_col resolves through that column (the pre-refactor
    # canonical_duplicates contract, kept by with_components)
    comp_custom = comp.withColumnRenamed("component", "grp")
    out2 = {r["doc_id"]: (r["grp"], r["is_canonical"])
            for r in canonical_duplicates(
                docs, comp_custom, component_col="grp").collect()}
    assert out2 == out
    # default-named frame + custom OUTPUT name (the r9 contract)
    out3 = {r["doc_id"]: (r["grp"], r["is_canonical"])
            for r in canonical_duplicates(
                docs, comp, component_col="grp").collect()}
    assert out3 == out
    # a frame carrying BOTH 'component' and the custom name is an
    # ambiguous label source and must raise (r11: an unrelated column
    # that merely shares the output name used to win silently)
    from generalized_kmeans_clustering_spark.operators.dedup import (
        with_components,
    )

    comp_both = comp.withColumn("grp", F.lit(999).cast("long"))
    with pytest.raises(ValueError, match="ambiguous"):
        with_components(docs, comp_both, component_col="grp")


def test_ivf_index_persist_and_partition_pruning(spark, tmp_path):
    """Round-trip the IVF index through partitioned parquet; probing a
    literal _list set must prune partitions at the scan (the 100 TB
    serving contract), and results must equal the in-memory index."""
    import numpy as np

    from generalized_kmeans_clustering_spark.operators.similarity import (
        ivf_index, ivf_topk, read_ivf_index, write_ivf_index,
    )

    rng = np.random.default_rng(17)
    V = rng.normal(size=(300, 8))
    df = spark.createDataFrame(
        [(int(i), V[i].tolist()) for i in range(len(V))],
        "vec_id long, embedding array<double>",
    )
    indexed, model = ivf_index(df, n_lists=8, seed=3, max_iter=5)
    path = str(tmp_path / "ivf")
    write_ivf_index(indexed, model, path)

    indexed2, model2 = read_ivf_index(spark, path)
    assert np.allclose(model2.centers, model.centers)
    queries = df.where("vec_id < 5")
    want = {(r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ivf_topk(indexed, model, queries, k=3, nprobe=3).collect()}
    got = {(r["query_id"], r["rank"]): r["neighbor_id"]
           for r in ivf_topk(indexed2, model2, queries, k=3, nprobe=3).collect()}
    assert got == want

    # partition pruning: filtering on the partition column reads only
    # the matching partition directories
    pruned = indexed2.where(F.col("_list") == 0)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [isnotnull(_list" in plan.replace("#", " #") or \
        "_list" in plan.split("PartitionFilters")[1][:120]
    n_parts = indexed2.select("_list").distinct().count()
    assert n_parts <= 8


def test_redact_pii_and_counts(spark):
    from generalized_kmeans_clustering_spark.functions.text import (
        pii_counts, redact_pii,
    )

    df = spark.createDataFrame(
        [(1, "mail me at jane.doe+x@corp.example.com or call "
             "+1 (555) 123-4567; server 192.168.0.17, card 4111111111111111"),
         (2, "no pii here at all")],
        "id long, text string")
    out = {r["id"]: r for r in df.select(
        "id", redact_pii(F.col("text")).alias("red"),
        pii_counts(F.col("text")).alias("c")).collect()}
    red = out[1]["red"]
    assert "<EMAIL>" in red and "jane.doe" not in red
    assert "<PHONE>" in red and "123-4567" not in red
    assert "<IP>" in red and "192.168.0.17" not in red
    assert "<CARD>" in red and "4111111111111111" not in red
    c = out[1]["c"]
    assert c["email"] == 1 and c["ipv4"] == 1 and c["card"] == 1
    assert c["phone"] >= 1
    assert out[2]["red"] == "no pii here at all"
    assert sum(out[2]["c"]) == 0


def test_repetition_score(spark):
    from generalized_kmeans_clustering_spark.functions.text import (
        repetition_score,
    )

    df = spark.createDataFrame(
        [(1, "a b c " * 20),              # one trigram looped
         (2, " ".join(f"w{i}" for i in range(60)))],  # all distinct
        "id long, text string")
    out = {r["id"]: r["rep"] for r in df.select(
        "id", repetition_score(F.col("text"), 3).alias("rep")).collect()}
    assert out[1] > 0.9
    assert out[2] == 0.0


def test_components_star_matches_label_and_union_find(spark):
    """method='star' (large/small-star contraction) must produce the
    exact same components as min-label propagation on mixed shapes."""
    import random

    from generalized_kmeans_clustering_spark.operators.dedup import (
        duplicate_components,
    )

    rng = random.Random(7)
    edges = [(i, i + 1) for i in range(30)]                    # chain
    edges += [(100 + rng.randrange(8), 100 + rng.randrange(8))
              for _ in range(20)]                              # dense blob
    edges += [(200, 201), (202, 203), (201, 203)]              # merged pairs
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "i long, j long")
    # the 30-chain has diameter 29, so label propagation needs > the
    # default 25 rounds — exactly the regime method='star' exists for
    lab = {r["id"]: r["component"]
           for r in duplicate_components(pairs, method="label",
                                         max_iter=40).collect()}
    star = {r["id"]: r["component"]
            for r in duplicate_components(pairs, method="star").collect()}
    assert star == lab


def test_components_star_path_graph_logarithmic_rounds(spark):
    """A 10k-node PATH graph (diameter 9999): label propagation would
    need ~10k rounds; star contraction must converge in O(log n) —
    assert ≤ ceil(log2 n) + 4 rounds and correct components."""
    import math

    from generalized_kmeans_clustering_spark.operators.dedup import (
        duplicate_components,
    )

    n = 10_000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "i long, j long")
    tel = {}
    out = duplicate_components(pairs, method="star", telemetry=tel)
    assert tel["converged"]
    assert tel["rounds"] <= math.ceil(math.log2(n)) + 4, tel
    rows = out.collect()
    assert len(rows) == n
    assert all(r["component"] == 0 for r in rows)


def test_components_auto_default_converges_on_path_graph(spark):
    """The DEFAULT API (method='auto') on a 10k path graph: label
    propagation alone would need ~10k rounds and emit the over-split
    warning; auto must hand off to star contraction, converge, and
    stay silent."""
    import warnings

    from generalized_kmeans_clustering_spark.operators.dedup import (
        AUTO_LABEL_ROUNDS, duplicate_components,
    )

    n = 10_000
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "i long, j long")
    tel = {}
    with warnings.catch_warnings():
        warnings.simplefilter("error", RuntimeWarning)  # warning = fail
        out = duplicate_components(pairs, telemetry=tel)
        rows = out.collect()
    assert tel["converged"] and tel["method"] == "star"
    assert tel["rounds"] > AUTO_LABEL_ROUNDS  # label tried, then star
    assert len(rows) == n
    assert all(r["component"] == 0 for r in rows)


def test_components_auto_stays_on_label_for_cliques(spark):
    """Near-clique dup graphs (the LSH-banding common case) must stay
    on the cheap label path under method='auto'."""
    from generalized_kmeans_clustering_spark.operators.dedup import (
        duplicate_components,
    )

    edges = [(a, b) for g in range(5)
             for a in range(g * 10, g * 10 + 4)
             for b in range(a + 1, g * 10 + 4)]
    pairs = spark.createDataFrame(edges, "i long, j long")
    tel = {}
    out = {r["id"]: r["component"]
           for r in duplicate_components(pairs, telemetry=tel).collect()}
    assert tel["converged"] and tel["method"] == "label"
    for g in range(5):
        for a in range(g * 10, g * 10 + 4):
            assert out[a] == g * 10


def test_components_string_ids(spark):
    """Arbitrary orderable id types: string/UUID ids propagate without
    the silent null-cast degeneration (r4 advice)."""
    from generalized_kmeans_clustering_spark.operators.dedup import (
        duplicate_components,
    )

    pairs = spark.createDataFrame(
        [("doc-b", "doc-c"), ("doc-a", "doc-b"), ("doc-x", "doc-y")],
        "i string, j string")
    for method in ("label", "star"):
        out = {r["id"]: r["component"]
               for r in duplicate_components(pairs, method=method).collect()}
        assert out == {"doc-a": "doc-a", "doc-b": "doc-a",
                       "doc-c": "doc-a", "doc-x": "doc-x",
                       "doc-y": "doc-x"}, method


def test_components_mismatched_id_types_raise(spark):
    from generalized_kmeans_clustering_spark.errors import DataError
    from generalized_kmeans_clustering_spark.operators.dedup import (
        duplicate_components,
    )

    pairs = spark.createDataFrame([(1, "a")], "i long, j string")
    with pytest.raises(DataError):
        duplicate_components(pairs)


def test_components_unconverged_warns(spark):
    import warnings

    from generalized_kmeans_clustering_spark.operators.dedup import (
        duplicate_components,
    )

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(20)], "i long, j long")
    tel = {}
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        duplicate_components(pairs, max_iter=3, telemetry=tel).collect()
    assert not tel["converged"]
    assert any("fixpoint" in str(x.message) for x in w)


def test_prepare_corpus_minhash_string_ids(spark):
    """End-to-end: minhash dedup with STRING doc ids (r4 advice: the
    long-cast used to null out propagation and silently mark zero
    duplicates)."""
    from generalized_kmeans_clustering_spark.operators.corpus import (
        prepare_corpus,
    )

    long_en = ("the quick brown fox jumps over the lazy dog and then "
               "the dog chases the fox around the big green field") * 2
    docs = spark.createDataFrame(
        [("a1", long_en), ("a2", long_en),
         ("b9", "the and is of to a completely different short doc that "
          "still has enough english tokens to pass the simple rules")],
        "doc_id string, text string")
    out = {r["doc_id"]: r["reject_reason"] for r in prepare_corpus(
        docs, min_tokens=5, languages=["en"], dedup="minhash",
        minhash_threshold=0.8).collect()}
    assert out["a1"] is None
    assert out["a2"] == "duplicate"
    assert out["b9"] is None


def test_ivf_read_prefers_current_sidecar_over_stale_legacy(spark, tmp_path,
                                                            sf_dir):
    """A pre-0.3 index re-written in place leaves its driver-local
    centroids.json behind; read_ivf_index must load the CURRENT
    Spark-written sidecar, not silently pair stale centers with new
    vectors."""
    import json

    from generalized_kmeans_clustering_spark.operators.similarity import (
        ivf_index, read_ivf_index, write_ivf_index,
    )

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    indexed, model = ivf_index(emb, n_lists=3, seed=4)
    path = str(tmp_path / "ivf")
    write_ivf_index(indexed, model, path)
    # plant a stale legacy sidecar with recognizably wrong state
    with open(f"{path}/centroids.json", "w") as f:
        json.dump({"centers": [[0.0]], "kernel": "l1"}, f)
    _, m2 = read_ivf_index(spark, path)
    assert m2.kernel_name == model.kernel_name != "l1"
    assert m2.centers.shape == model.centers.shape


def test_drop_repeated_lines_boilerplate(spark):
    """The C4/RefinedWeb rule: a line repeated across the corpus is
    boilerplate — ALL its occurrences drop; unique lines survive in
    original order; short lines are exempt."""
    from generalized_kmeans_clustering_spark.operators.dedup import (
        drop_repeated_lines, line_occurrences,
    )

    boiler = "subscribe to our newsletter today"
    docs = spark.createDataFrame(
        [(1, f"unique opening line\n{boiler}\nmore unique content"),
         (2, f"{boiler}\nanother document body"),
         (3, f"third document text\n{boiler}"),
         (4, "ok\ncompletely original document\nok")],  # 'ok' is short
        "doc_id long, text string")

    occ = {r["line_hash"]: r["n"] for r in line_occurrences(docs).collect()}
    assert max(occ.values()) == 3  # the boilerplate line

    out = {r["doc_id"]: r for r in drop_repeated_lines(
        docs, max_occurrences=1, min_line_chars=3).collect()}
    assert out[1]["text"] == "unique opening line\nmore unique content"
    assert out[1]["n_lines_dropped"] == 1
    assert out[2]["text"] == "another document body"
    assert out[3]["text"] == "third document text"
    # 'ok' repeats but is under min_line_chars -> kept, order preserved
    assert out[4]["text"] == "ok\ncompletely original document\nok"
    assert out[4]["n_lines_dropped"] == 0


def test_drop_repeated_lines_all_dropped_and_empty(spark):
    from generalized_kmeans_clustering_spark.operators.dedup import (
        drop_repeated_lines,
    )

    docs = spark.createDataFrame(
        [(1, "same line here"), (2, "same line here"), (3, ""),
         (4, None)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in drop_repeated_lines(docs).collect()}
    assert out[1]["text"] == "" and out[1]["n_lines_kept"] == 0
    assert out[2]["text"] == ""
    # empty text row survives untouched
    assert out[3]["n_lines_dropped"] == 0
    # NULL text must SURVIVE (posexplode_outer), not vanish from the
    # output, with NULL text and zero line counts
    assert 4 in out and out[4]["text"] is None
    assert out[4]["n_lines_kept"] == 0 and out[4]["n_lines_dropped"] == 0


def test_drop_repeated_lines_regex_separator(spark):
    """line_sep is literal, not a Java regex: '|' must split on pipes
    and round-trip through the array_join reassembly."""
    from generalized_kmeans_clustering_spark.operators.dedup import (
        drop_repeated_lines, line_occurrences,
    )

    docs = spark.createDataFrame(
        [(1, "boilerplate line|unique alpha"),
         (2, "boilerplate line|unique beta")],
        "doc_id long, text string")
    occ = line_occurrences(docs, line_sep="|").collect()
    assert sorted(r["n"] for r in occ) == [1, 1, 2]
    out = {r["doc_id"]: r for r in drop_repeated_lines(
        docs, line_sep="|", min_line_chars=3).collect()}
    assert out[1]["text"] == "unique alpha"
    assert out[2]["text"] == "unique beta"
    assert out[1]["n_lines_dropped"] == 1


def test_canonical_duplicates_prefer_col_keeps_best(spark):
    from generalized_kmeans_clustering_spark.operators.dedup import (
        canonical_duplicates,
    )

    docs = spark.createDataFrame(
        [(0, "short but great", 0.9), (1, "much longer duplicate text", 0.2),
         (2, "unrelated", 0.5)],
        "doc_id long, text string, quality double")
    comp = spark.createDataFrame([(0, 0), (1, 0)], "id long, component long")
    # default: longest text wins
    by_len = {r["doc_id"]: r["is_canonical"]
              for r in canonical_duplicates(docs, comp).collect()}
    assert by_len == {0: False, 1: True, 2: True}
    # prefer_col: highest quality wins
    by_q = {r["doc_id"]: r["is_canonical"]
            for r in canonical_duplicates(
                docs, comp, prefer_col="quality").collect()}
    assert by_q == {0: True, 1: False, 2: True}


def test_image_phash_fake_deterministic_and_blocking(spark):
    import hashlib

    from generalized_kmeans_clustering_spark.sources.multimodal import (
        image_phash, image_phash_near_dups,
    )

    rows = [
        (0, bytearray(b"same image bytes")),
        (1, bytearray(b"same image bytes")),    # exact dup of 0
        (2, bytearray(b"different content")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {r["media_id"]: r["phash"] for r in image_phash(df).collect()}
    # md5 60-bit convention, computable in pure python
    want = int(hashlib.md5(b"same image bytes").hexdigest()[:15], 16)
    assert out[0] == want and out[1] == want
    assert out[2] != want
    assert out[3] == int(hashlib.md5(b"").hexdigest()[:15], 16)
    pairs = {(r["i"], r["j"]): r["hamming"]
             for r in image_phash_near_dups(df, max_hamming=3).collect()}
    assert pairs.get((0, 1)) == 0
    assert (0, 2) not in pairs


def test_image_phash_real_requires_pil_or_skips(spark):
    import pytest as _pt

    from generalized_kmeans_clustering_spark.sources.multimodal import (
        _try_pil, image_phash,
    )

    df = spark.createDataFrame(
        [(0, bytearray(b"x"))], "media_id long, content binary")
    if _try_pil() is None:
        with _pt.raises(NotImplementedError, match="Pillow"):
            image_phash(df, decoder="real")
    else:
        # real path: identical images hash identically; DCT pHash of a
        # synthetic gradient image is stable
        import io

        image_mod = _try_pil()
        buf = io.BytesIO()
        image_mod.new("L", (40, 40), color=128).save(buf, format="PNG")
        b = buf.getvalue()
        d2 = spark.createDataFrame(
            [(0, bytearray(b)), (1, bytearray(b))],
            "media_id long, content binary")
        got = {r["media_id"]: r["phash"]
               for r in image_phash(d2, decoder="real").collect()}
        assert got[0] == got[1]


def test_video_near_dups_shared_frames(spark):
    from generalized_kmeans_clustering_spark.sources.multimodal import (
        video_near_dups,
    )

    base = bytes(range(256)) * 2   # 512 bytes -> 8 frames of 30 bytes
    rows = [
        (0, bytearray(base)),
        (1, bytearray(base[:480] + b"tail-differs-here-in-last-frame")),
        (2, bytearray(b"completely different video bytes " * 20)),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    pairs = {(r["i"], r["j"]): r["jaccard"]
             for r in video_near_dups(df, threshold=0.4).collect()}
    # videos 0 and 1 share 7 of 8 sampled frames
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.6
    assert (0, 2) not in pairs and (1, 2) not in pairs
    # determinism
    again = {(r["i"], r["j"]): r["jaccard"]
             for r in video_near_dups(df, threshold=0.4).collect()}
    assert pairs == again


def test_video_near_dups_caches_frame_hash_sets_once(spark):
    """r12 optimization pin: the per-video frame-hash SET frame is
    persisted — its four evaluation paths (LSH banding self-join ×2 +
    both exact-verify sides) read one InMemoryRelation, so one action
    samples and hashes every video's frames exactly once instead of
    four times."""
    from generalized_kmeans_clustering_spark.operators.pins import Pins
    from generalized_kmeans_clustering_spark.sources.multimodal import (
        video_near_dups,
    )

    base = bytes(range(256)) * 2
    df = spark.createDataFrame(
        [(0, bytearray(base)), (1, bytearray(base))],
        "media_id long, content binary",
    )
    pins = Pins()
    out = video_near_dups(df, threshold=0.4, pins=pins)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 4, plan
    assert len(pins) == 1
    assert {(r["i"], r["j"]) for r in out.collect()} == {(0, 1)}
    pins.release()


def test_minhash_from_hashes_matches_set_jaccard_behavior(spark):
    from generalized_kmeans_clustering_spark.operators.dedup import (
        lsh_candidate_pairs, minhash_from_hashes,
    )

    rows = [
        (0, [1, 2, 3, 4, 5, 6, 7, 8]),
        (1, [1, 2, 3, 4, 5, 6, 7, 9]),   # 7/9 jaccard with 0
        (2, [100, 200, 300, 400, 500, 600, 700, 800]),
    ]
    df = spark.createDataFrame(rows, "doc_id long, hs array<bigint>")
    sigs = minhash_from_hashes(df, "hs", num_hashes=32)
    row = sigs.collect()
    assert all(len(r["signature"]) == 32 for r in row)
    pairs = {(r["i"], r["j"])
             for r in lsh_candidate_pairs(sigs, num_bands=8).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs


def test_real_image_decode_poisoned_blob_yields_null_row(spark):
    """ADVICE r6: a corrupt blob must NULL its row, not kill the scan
    (the audio-path convention). PIL-gated; the fake path has no
    decode to poison."""
    from generalized_kmeans_clustering_spark.sources.multimodal import (
        _try_pil, decode_image_meta, image_embedding, image_phash,
    )

    if _try_pil() is None:
        pytest.skip("Pillow not installed")
    import io as _io

    image_mod = _try_pil()
    buf = _io.BytesIO()
    image_mod.new("RGB", (8, 8)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(0, bytearray(buf.getvalue())),
         (1, bytearray(b"\x89PNG garbage that will not decode"))],
        "media_id long, content binary")
    meta = {r["media_id"]: r for r in
            decode_image_meta(df, decoder="real").collect()}
    assert meta[0]["width"] == 8 and meta[1]["width"] is None
    ph = {r["media_id"]: r["phash"] for r in
          image_phash(df, decoder="real").collect()}
    assert ph[0] is not None and ph[1] is None
    emb = {r["media_id"]: r["embedding"] for r in
           image_embedding(df, dim=8, decoder="real").collect()}
    assert emb[0] is not None and emb[1] is None


def test_video_near_dups_rejects_real_decoder(spark):
    """ADVICE r6: byte-slice 'frames' are not decodable images, so
    forwarding decoder='real' to the per-frame pHash would NULL every
    hash — reject it loudly until a real frame sampler exists."""
    from generalized_kmeans_clustering_spark.sources.multimodal import (
        video_near_dups,
    )

    df = spark.createDataFrame(
        [(0, bytearray(bytes(range(250))))], "media_id long, content binary")
    with pytest.raises(NotImplementedError, match="fake"):
        video_near_dups(df, decoder="real")


def test_drop_repeated_spans_cuts_cross_doc_boilerplate(spark):
    """ExactSubstr-style token-span dedup: an 8-token sequence shared
    by two documents is cut from BOTH, even though it never aligns
    with a line boundary; unique text survives untouched."""
    from generalized_kmeans_clustering_spark.operators.dedup import (
        drop_repeated_spans,
    )

    boiler = "this content is provided as is without any warranty"
    rows = [
        (0, f"intro words {boiler} tail zero"),
        (1, f"{boiler} completely different continuation"),
        (2, "totally unrelated document text with enough words here"),
        (3, None),
        (4, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           drop_repeated_spans(df, n=9).orderBy("doc_id").collect()}
    assert out[0]["text"] == "intro words tail zero"
    assert out[0]["n_tokens_dropped"] == 9
    assert out[1]["text"] == "completely different continuation"
    assert out[2]["n_tokens_dropped"] == 0
    assert out[3]["text"] is None and out[3]["n_tokens_kept"] == 0
    assert out[4]["text"] == "tiny"  # shorter than n: never cut


def test_drop_repeated_spans_overlaps_merge_and_within_doc_counts(spark):
    """Overlapping repeated n-grams merge into one maximal cut, and
    within-document repeats count toward the occurrence threshold
    (the paper's accounting)."""
    from generalized_kmeans_clustering_spark.operators.dedup import (
        drop_repeated_spans,
    )

    # "a b c d" appears twice INSIDE doc 0 (positions 1 and 6) — the
    # corpus-wide count is 2 > 1, so both occurrences are cut
    df = spark.createDataFrame(
        [(0, "a b c d x a b c d y"), (1, "p q r s t u v w")],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           drop_repeated_spans(df, n=4).collect()}
    assert out[0]["text"] == "x y"
    assert out[0]["n_tokens_dropped"] == 8
    assert out[1]["n_tokens_dropped"] == 0
    # overlap merge: "a b c a b c a b c" (n=3): grams at 1..7; the
    # 3x-repeated "a b c" gram (positions 1,4,7) covers everything
    df2 = spark.createDataFrame(
        [(0, "a b c a b c a b c")], "doc_id long, text string")
    got = drop_repeated_spans(df2, n=3).collect()[0]
    assert got["text"] == "" and got["n_tokens_dropped"] == 9


def test_gopher_repetition_signals_hand_computed(spark):
    """Gopher Table-A1 repetition signals: hand-checked top-gram mass
    and duplicated-gram union coverage, NULL/empty-safe."""
    from generalized_kmeans_clustering_spark.operators.text_features \
        import gopher_repetition_signals

    rows = [
        (0, "a b c d e f g h a b c d e f g h tail"),
        (1, "all tokens here are unique words now"),
        (2, None),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r.asDict()
           for r in gopher_repetition_signals(df).collect()}
    # doc 0: 17 1-char tokens + 'tail' => chars = 16 + 4 = 20
    # top 2-gram by char mass is 'h tail' (1 occurrence x 5 chars = 5,
    # beating 'a b' at 2 x 2 = 4) => 5/20
    assert abs(out[0]["top_2gram_char_frac"] - 5 / 20) < 1e-12
    # dup 8-gram covers tokens 1..16 (16 chars) => 0.8
    assert abs(out[0]["dup_8gram_char_frac"] - 16 / 20) < 1e-12
    assert out[0]["dup_9gram_char_frac"] == 0.0
    # doc 1: no repeats -> dup fracs 0; top mass = longest 2-gram
    assert out[1]["dup_5gram_char_frac"] == 0.0
    assert out[1]["top_2gram_char_frac"] > 0
    for vid in (2, 3):  # NULL/empty text scores 0 everywhere
        assert all(v == 0.0 for k, v in out[vid].items() if k != "doc_id")


def test_semantic_decontaminate_flags_and_drops(spark):
    """Embedding-space decontamination: a corpus row near a benchmark
    vector is flagged; drop mode removes it and keeps original
    columns; rows are never lost in flag mode."""
    from generalized_kmeans_clustering_spark.operators.decontamination \
        import semantic_decontaminate

    bench = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0])], "vec_id long, embedding array<double>")
    corpus = spark.createDataFrame(
        [(0, [0.99, 0.1, 0.0]),   # ~benchmark direction -> contaminated
         (1, [0.0, 1.0, 0.0]),    # orthogonal -> clean
         (2, [-1.0, 0.0, 0.0])],  # opposite -> clean
        "vec_id long, embedding array<double>")
    out = {r["vec_id"]: r.asDict()
           for r in semantic_decontaminate(corpus, bench, 0.95).collect()}
    assert len(out) == 3
    assert out[0]["contaminated"] and not out[1]["contaminated"]
    assert not out[2]["contaminated"]
    assert out[0]["max_benchmark_sim"] > 0.99
    dropped = semantic_decontaminate(corpus, bench, 0.95, mode="drop")
    assert {r["vec_id"] for r in dropped.collect()} == {1, 2}
    assert dropped.columns == corpus.columns
    import pytest as _pt

    with _pt.raises(ValueError, match="mode"):
        semantic_decontaminate(corpus, bench, 0.95, mode="purge")


def test_knn_graph_modes_and_self_probe(spark):
    """Corpus-scale kNN graph: directed gives per-query rankings;
    union keeps an edge when either side names the other; mutual is a
    subset of union requiring both; planted twin vectors always
    connect."""
    import numpy as np

    from generalized_kmeans_clustering_spark.operators.similarity import (
        knn_graph,
    )

    rng = np.random.default_rng(4)
    rows = []
    for i in range(40):
        v = rng.normal(0, 1, 8)
        rows.append((i, [float(x) for x in v / np.linalg.norm(v)]))
    rows.append((100, list(rows[0][1])))  # exact twin of 0
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    directed = knn_graph(df, k=3, n_lists=2, nprobe=2, seed=1,
                         mode="directed")
    per_q = directed.groupBy("query_id").count().collect()
    assert all(r["count"] <= 3 for r in per_q)
    union = {(r["i"], r["j"]) for r in
             knn_graph(df, k=3, n_lists=2, nprobe=2, seed=1,
                       mode="union").collect()}
    mutual = {(r["i"], r["j"]) for r in
              knn_graph(df, k=3, n_lists=2, nprobe=2, seed=1,
                        mode="mutual").collect()}
    assert mutual <= union
    assert (0, 100) in mutual  # identical vectors are mutual top-1
    assert all(i < j for i, j in union)
    import pytest as _pt

    with _pt.raises(ValueError, match="mode"):
        knn_graph(df, mode="both")
