"""Real audio fingerprinting (stdlib WAV + numpy DSP) and near-dup.

Test signals are BROADBAND (fixed-seed amplitude-modulated noise):
the Haitsma bits are signs of band-energy derivatives, so a pure
tone — energy in one band, the other 15 differences ≈ 0 — gives
quantization coin flips by construction. Real audio is broadband.
"""

import io
import wave

import numpy as np
import pytest

from generalized_kmeans_clustering_spark.sources.multimodal import (
    audio_fingerprint,
    audio_fp_band_edges,
    audio_fp_bits,
    audio_near_dups,
)

RATE = 8000


def _pcm_wav(x, rate=RATE):
    pcm = (np.clip(x, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(pcm.tobytes())
    return buf.getvalue()


def _broadband(seed, seconds=4.0, amp=0.5):
    n = int(RATE * seconds)
    env = np.sin(2 * np.pi * np.arange(n) / 4000)
    return amp * np.random.RandomState(seed).randn(n) * env


def _df(spark, rows):
    return spark.createDataFrame(
        [(i, bytearray(b)) for i, b in rows],
        "media_id long, content binary")


def test_fingerprints_are_nearly_volume_invariant(spark):
    x = _broadband(1)
    a, b = _pcm_wav(x), _pcm_wav(0.25 * x)  # same content, quieter
    out = {r["media_id"]: list(r["fingerprints"])
           for r in audio_fingerprint(_df(spark, [(0, a), (1, b)])).collect()}
    assert len(out[0]) > 20 and len(out[0]) == len(out[1])
    # aligned bit-error rate (Haitsma's match metric): gain changes
    # only matter through 16-bit PCM quantization — far below the
    # ~0.35 no-match threshold
    bits = sum(bin(p ^ q).count("1") for p, q in zip(out[0], out[1]))
    ber = bits / (len(out[0]) * audio_fp_bits())
    assert ber < 0.1, ber


def test_different_content_different_fingerprints(spark):
    a = _pcm_wav(_broadband(1))
    b = _pcm_wav(_broadband(9))
    out = {r["media_id"]: set(r["fingerprints"])
           for r in audio_fingerprint(_df(spark, [(0, a), (1, b)])).collect()}
    inter, union = out[0] & out[1], out[0] | out[1]
    assert len(inter) / len(union) < 0.2


def test_unparseable_bytes_yield_empty_not_crash(spark):
    rows = [(0, b"not a wav at all"), (1, b""),
            (2, _pcm_wav(_broadband(1)))]
    out = {r["media_id"]: list(r["fingerprints"])
           for r in audio_fingerprint(_df(spark, rows)).collect()}
    assert out[0] == [] and out[1] == []
    assert len(out[2]) > 0


def test_audio_near_dups_finds_noisy_and_rescaled_copies(spark):
    rows, gid = [], 0
    for g in range(3):
        x = _broadband(g)
        rows.append((gid, _pcm_wav(x))); gid += 1
        noisy = 0.4 * x + 0.002 * np.random.RandomState(50 + g).randn(len(x))
        rows.append((gid, _pcm_wav(noisy))); gid += 1
    for s in range(4):  # singletons
        rows.append((gid, _pcm_wav(_broadband(100 + s)))); gid += 1
    df = _df(spark, rows)
    pairs = {(r["i"], r["j"]): r["ber"]
             for r in audio_near_dups(df, max_ber=0.25).collect()}
    # every degraded copy matches its original; nothing else pairs up
    assert set(pairs) == {(0, 1), (2, 3), (4, 5)}, pairs
    assert all(v < 0.15 for v in pairs.values()), pairs


def test_audio_near_dups_caches_decode_once(spark):
    """r12 optimization pin: the exploded (id, window, subfingerprint)
    frame is persisted — all four consumers (both candidate-join
    sides + both aligned-verify sides) read one InMemoryRelation, so
    one action decodes/fingerprints every clip exactly once instead
    of four times."""
    from generalized_kmeans_clustering_spark.operators.pins import Pins

    x = _broadband(0)
    df = _df(spark, [(0, _pcm_wav(x)), (1, _pcm_wav(0.4 * x))])
    pins = Pins()
    out = audio_near_dups(df, max_ber=0.25, pins=pins)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("InMemoryTableScan") >= 4, plan
    assert len(pins) == 1
    assert {(r["i"], r["j"]) for r in out.collect()} == {(0, 1)}
    pins.release()


def test_stereo_downmix_and_fake_decoder(spark):
    x = _broadband(5, seconds=2.0)
    stereo = np.stack([x, x], axis=1).ravel()
    pcm = (np.clip(stereo, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(RATE)
        wf.writeframes(pcm.tobytes())
    mono, dup = _pcm_wav(x), buf.getvalue()
    out = {r["media_id"]: set(r["fingerprints"])
           for r in audio_fingerprint(
               _df(spark, [(0, mono), (1, dup)])).collect()}
    # identical-channel stereo downmixes to the same signal
    j = len(out[0] & out[1]) / len(out[0] | out[1])
    assert j > 0.8, j
    # fake decoder: deterministic, content-addressed
    rows = [(0, b"x" * 200), (1, b"x" * 200), (2, b"y" * 200)]
    a = {r["media_id"]: list(r["fingerprints"])
         for r in audio_fingerprint(_df(spark, rows),
                                    decoder="fake").collect()}
    assert a[0] == a[1] and a[0] != a[2]
    with pytest.raises(ValueError):
        audio_fingerprint(_df(spark, rows), decoder="bogus")


def test_fp_bits_derive_from_surviving_band_edges():
    """ADVICE r6: integer-cast geomspace edges collapse at the low end,
    so subfingerprints carry len(edges)-2 bits, not n_bands-1. The
    helper is the single source of truth both for packing and for the
    BER denominator."""
    edges = audio_fp_band_edges(2048, 17)
    assert audio_fp_bits(2048, 17) == len(edges) - 2 == 15  # NOT 16
    # a non-collapsing layout keeps the requested width
    wide = audio_fp_band_edges(4096, 8)
    assert len(wide) == 9 and audio_fp_bits(4096, 8) == 7


def test_real_fingerprints_fit_declared_bit_width(spark):
    """Every real-path subfingerprint must fit in audio_fp_bits() bits
    — the packed value and the BER denominator must agree."""
    x = _broadband(3)
    out = audio_fingerprint(_df(spark, [(0, _pcm_wav(x))])).collect()[0]
    fps = list(out["fingerprints"])
    assert fps, "broadband signal must fingerprint"
    assert max(fps) < (1 << audio_fp_bits()), max(fps)


def test_ber_calibrated_identical_audio_is_zero(spark):
    """BER uses the ACTUAL width for both paths: identical audio gives
    ber == 0.0 on the real path, and the fake path's 60-bit md5
    pseudo-subfingerprints are divided by 60, not n_bands-1."""
    x = _broadband(7)
    a = _pcm_wav(x)
    pairs = audio_near_dups(
        _df(spark, [(0, a), (1, bytes(a))]), max_ber=0.05).collect()
    assert len(pairs) == 1 and pairs[0]["ber"] == 0.0
    fake = audio_near_dups(
        _df(spark, [(0, b"z" * 300), (1, b"z" * 300)]),
        decoder="fake", max_ber=0.01).collect()
    assert len(fake) == 1 and fake[0]["ber"] == 0.0
