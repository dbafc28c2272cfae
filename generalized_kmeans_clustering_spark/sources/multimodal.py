"""Multimodal (image/audio/video) column plumbing for 100 TB pipelines.

Engine extension (driver mandate): media rides as opaque ``binary``
columns with typed metadata structs; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages so
each executor touches only its partitions' bytes — no collect, no
shuffle, schema known up front.

Codec access is feature-probed at call time: ``decoder='real'`` uses
Pillow (PIL) for images — and PyAV/imageio for video frame sampling —
when importable, and otherwise raises ``NotImplementedError`` naming
the missing dependency; ``decoder='fake'`` is the deterministic
hash-based decode used by tests and benchmarks in codec-less
environments. Everything Spark-side — schemas, batching, partitioning,
UDF signatures — is identical between the two, so pipelines built on
the fake decode run unchanged once the binding is installed (the
video real path's Spark plumbing is additionally exercised in CI via
an injected deterministic decoder in ``_REAL_FRAME_DECODERS``).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "MEDIA_SCHEMA",
    "attach_media_metadata",
    "decode_audio_meta",
    "decode_image_meta",
    "image_embedding",
    "image_phash",
    "image_phash_near_dups",
    "sample_video_frames",
    "video_near_dups",
    "audio_fingerprint",
    "audio_near_dups",
]

#: canonical media-table layout: opaque bytes + typed metadata
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("media_type", T.StringType()),   # image | audio | video
    T.StructField("content", T.BinaryType()),
    T.StructField("meta", T.StructType([
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ])),
])


def attach_media_metadata(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Typed metadata struct from the raw bytes (pure expressions)."""
    c = F.col(content_col)
    return df.withColumn(
        "meta",
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(c).cast("long").alias("n_bytes"),
            F.sha2(c, 256).alias("sha256"),
        ),
    )


def _try_pil():
    """Feature probe: the Pillow Image module, or None when absent."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def _require_pil(what: str):
    image_mod = _try_pil()
    if image_mod is None:
        raise NotImplementedError(
            f"{what} with decoder='real' requires the Pillow (PIL) "
            "package, which is not installed in this environment — "
            "`pip install Pillow`, or use decoder='fake' for the "
            "deterministic test decode"
        )
    return image_mod


#: exceptions a corrupt/undecodable blob can raise inside Pillow —
#: caught PER ROW so a poisoned blob yields NULL instead of killing
#: the whole 100 TB scan (UnidentifiedImageError and truncated-file
#: errors are OSError subclasses; some format parsers raise
#: ValueError/SyntaxError on malformed headers).
_PIL_DECODE_ERRORS = (OSError, ValueError, SyntaxError)


def _fake_dims(buf: bytes) -> tuple[int, int]:
    """Deterministic pseudo-decode: dims derived from content bytes."""
    h = int.from_bytes(buf[:8].ljust(8, b"\0"), "little")
    return 64 + h % 1920, 64 + (h >> 16) % 1080


def decode_image_meta(
    df: DataFrame,
    content_col: str = "content",
    decoder: str = "fake",
) -> DataFrame:
    """binary → (width, height, channels) via Arrow-batched mapInPandas.

    ``decoder='real'`` decodes with Pillow when it is importable
    (probed on the driver for a fast failure, and again in each worker
    in case executor environments differ); otherwise raises
    ``NotImplementedError`` naming the missing dependency. A blob
    Pillow cannot decode yields NULL width/height/channels for that
    row — the batch keeps flowing (the audio-path convention: a
    poisoned blob must not kill a 100 TB scan).
    """
    if decoder == "real":
        _require_pil("image decode")
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["width int", "height int", "channels int"]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        image_mod = _require_pil("image decode") if decoder == "real" else None
        for pdf in batches:
            pdf = pdf.copy()
            if decoder == "real":
                dims, chans = [], []
                for b in pdf[content_col]:
                    try:
                        with image_mod.open(
                                io.BytesIO(bytes(b or b""))) as im:
                            dims.append(im.size)
                            chans.append(len(im.getbands()))
                    except _PIL_DECODE_ERRORS:
                        dims.append((None, None))
                        chans.append(None)
                pdf["channels"] = pd.array(chans, dtype="Int32")
            else:
                dims = [_fake_dims(bytes(b or b"")) for b in pdf[content_col]]
                pdf["channels"] = pd.array([3] * len(dims), dtype="Int32")
            pdf["width"] = pd.array([d[0] for d in dims], dtype="Int32")
            pdf["height"] = pd.array([d[1] for d in dims], dtype="Int32")
            yield pdf

    return df.mapInPandas(_decode, out_schema)


#: fake-decode sample-rate palette (indexed by content hash)
_FAKE_RATES = (8000, 16000, 22050, 44100, 48000)


def decode_audio_meta(
    df: DataFrame,
    content_col: str = "content",
    decoder: str = "fake",
) -> DataFrame:
    """binary audio → (sample_rate, channels, n_samples, duration_sec)
    via Arrow-batched ``mapInPandas``.

    ``decoder='real'`` parses RIFF/WAVE headers with the stdlib
    ``wave`` module — no external dependency, so unlike the image path
    the real decoder works in every environment; bytes that are not a
    readable WAV yield NULL metadata for that row (the batch keeps
    flowing — a poisoned blob must not kill a 100 TB scan).
    ``decoder='fake'`` derives deterministic metadata from the content
    hash (same convention as ``_fake_dims``): rate from a 5-entry
    palette, 1-2 channels, 1-61 s of samples.
    """
    if decoder not in ("real", "fake"):
        raise ValueError("decoder: real | fake")
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["sample_rate int", "channels int", "n_samples bigint",
           "duration_sec double"]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io
        import wave

        for pdf in batches:
            pdf = pdf.copy()
            rates, chans, nsamp, durs = [], [], [], []
            for b in pdf[content_col]:
                buf = bytes(b or b"")
                if decoder == "real":
                    try:
                        with wave.open(io.BytesIO(buf)) as wf:
                            r = wf.getframerate()
                            c = wf.getnchannels()
                            n = wf.getnframes()
                        rates.append(r)
                        chans.append(c)
                        nsamp.append(n)
                        durs.append(n / r if r else None)
                    except (wave.Error, EOFError):
                        rates.append(None)
                        chans.append(None)
                        nsamp.append(None)
                        durs.append(None)
                else:
                    h = int.from_bytes(buf[:8].ljust(8, b"\0"), "little")
                    r = _FAKE_RATES[h % len(_FAKE_RATES)]
                    n = r + (h >> 16) % (60 * r)
                    rates.append(r)
                    chans.append(1 + (h >> 3) % 2)
                    nsamp.append(n)
                    durs.append(n / r)
            pdf["sample_rate"] = pd.array(rates, dtype="Int32")
            pdf["channels"] = pd.array(chans, dtype="Int32")
            pdf["n_samples"] = pd.array(nsamp, dtype="Int64")
            pdf["duration_sec"] = pd.array(durs, dtype="Float64")
            yield pdf

    return df.mapInPandas(_decode, out_schema)


def image_embedding(
    df: DataFrame,
    content_col: str = "content",
    dim: int = 32,
    decoder: str = "fake",
) -> DataFrame:
    """binary → feature vector (array<float>) via mapInPandas.

    ``decoder='real'`` (Pillow, probed at call time) emits a classical
    pixel feature: grayscale → resize to a √dim×√dim grid → flatten →
    L2-normalize. Not a learned embedding, but a real decode whose
    nearest-neighbor structure tracks visual similarity, and the
    output contract (unit-norm ``array<float>[dim]``) is identical to
    the fake path, so ivf_index / cosine_topk / near-dup pipelines run
    unchanged. The fake path seeds a deterministic unit-norm vector
    from a 64-bit content hash.
    """
    if decoder == "real":
        _require_pil("image embedding")
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["embedding array<float>"]
    )

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        image_mod = _require_pil("image embedding") if decoder == "real" else None
        side = max(int(round(dim ** 0.5)), 1)
        for pdf in batches:
            vecs = []
            for b in pdf[content_col]:
                buf = bytes(b or b"")
                if decoder == "real":
                    try:
                        with image_mod.open(io.BytesIO(buf)) as im:
                            px = np.asarray(
                                im.convert("L").resize((side, side)),
                                dtype=np.float64,
                            ).ravel()
                    except _PIL_DECODE_ERRORS:
                        vecs.append(None)  # poisoned blob → NULL row
                        continue
                    v = np.zeros(dim)
                    v[: px.size] = px[:dim]
                    v -= v.mean()
                    nrm = np.linalg.norm(v)
                    v = v / nrm if nrm > 0 else v + 1.0 / np.sqrt(dim)
                else:
                    seed = int.from_bytes(
                        buf[:8].ljust(8, b"\0"), "little"
                    ) % (2 ** 32)
                    v = np.random.RandomState(seed).randn(dim)
                    v = v / np.linalg.norm(v)
                vecs.append(v.astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf["embedding"] = vecs
            yield pdf

    return df.mapInPandas(_embed, out_schema)


def image_phash(
    df: DataFrame,
    content_col: str = "content",
    decoder: str = "fake",
    out_col: str = "phash",
) -> DataFrame:
    """64-bit perceptual hash (pHash) per image — the image-dedup
    fingerprint: near-identical images (recompression, resize, small
    edits) land within a few Hamming bits of each other, so the text
    dedup layer's pigeonhole blocking applies unchanged.

    ``decoder='real'`` (Pillow, probed at call time) computes the
    classic DCT pHash: grayscale → 32×32 → 2-D DCT-II (numpy matmul,
    no scipy) → top-left 8×8 low-frequency block → bit = coefficient
    > block median. ``decoder='fake'`` emits the engine's md5 60-bit
    content hash (exact-content fingerprint — no perceptual
    robustness, but bit-identical in the DuckDB oracle and exercising
    the same mapInPandas plumbing and downstream blocking). A blob
    Pillow cannot decode yields a NULL hash for that row.
    """
    if decoder == "real":
        _require_pil("image phash")
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} bigint"]
    )

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io

        image_mod = _require_pil("image phash") if decoder == "real" else None
        if decoder == "real":
            n = 32
            i_idx = np.arange(n)
            dct_m = np.sqrt(2.0 / n) * np.cos(
                np.pi * (2 * i_idx[None, :] + 1) * i_idx[:, None] / (2 * n))
            dct_m[0] /= np.sqrt(2.0)
        for pdf in batches:
            vals = []
            for b in pdf[content_col]:
                buf = bytes(b or b"")
                if decoder == "real":
                    try:
                        with image_mod.open(io.BytesIO(buf)) as im:
                            px = np.asarray(
                                im.convert("L").resize((32, 32)),
                                dtype=np.float64)
                    except _PIL_DECODE_ERRORS:
                        vals.append(None)  # poisoned blob → NULL row
                        continue
                    coeffs = (dct_m @ px @ dct_m.T)[:8, :8].ravel()
                    med = np.median(coeffs)
                    bits = coeffs > med
                    v = 0
                    for i, bit in enumerate(bits):
                        if bit:
                            v |= 1 << i
                    if v >= 1 << 63:
                        v -= 1 << 64
                else:
                    # cross-engine md5 60-bit convention (dedup._hash64
                    # md5 mode): top 15 hex digits as an integer
                    v = int(hashlib.md5(buf).hexdigest()[:15], 16)
                vals.append(v)
            pdf = pdf.copy()
            pdf[out_col] = pd.array(vals, dtype="Int64")
            yield pdf

    return df.mapInPandas(_hash, out_schema)


def image_phash_near_dups(
    df: DataFrame,
    max_hamming: int = 3,
    id_col: str = "media_id",
    content_col: str = "content",
    decoder: str = "fake",
) -> DataFrame:
    """(i, j, hamming) image near-dup pairs: :func:`image_phash`
    composed with the dedup layer's 16-bit pigeonhole blocked join
    (sound for max_hamming ≤ 3) — per-bucket candidates, never
    all-pairs, exactly the text-SimHash scale path. Undecodable blobs
    (NULL hash) are excluded from the pair search rather than bucketed
    together."""
    from ..operators.dedup import simhash_near_dups

    sigs = image_phash(df, content_col=content_col, decoder=decoder)
    return simhash_near_dups(
        sigs.select(id_col, F.col("phash").alias("simhash"))
        .where(F.col("simhash").isNotNull()),
        id_col=id_col, max_hamming=max_hamming)


def _try_video_decoder():
    """Feature probe: the name of a usable video-decode binding, or
    None when absent — the video analog of :func:`_try_pil`. Preference
    order: PyAV (direct ffmpeg bindings, zero-copy frame planes), then
    ``imageio.v3`` (whose own ffmpeg-capable plugin does the work)."""
    try:
        import av  # noqa: F401

        return "av"
    except ImportError:
        pass
    try:
        import imageio.v3  # noqa: F401

        return "imageio"
    except ImportError:
        return None


def _decode_frames_av(buf: bytes, every_n: int, max_frames: int):
    """Every ``every_n``-th decoded frame as raw RGB24 bytes (PyAV)."""
    import io

    import av

    frames = []
    with av.open(io.BytesIO(buf)) as container:
        stream = container.streams.video[0]
        for i, frame in enumerate(container.decode(stream)):
            if i % max(every_n, 1) == 0:
                frames.append(frame.to_ndarray(format="rgb24").tobytes())
                if len(frames) >= max_frames:
                    break
    return frames


def _decode_frames_imageio(buf: bytes, every_n: int, max_frames: int):
    """Every ``every_n``-th decoded frame as raw RGB bytes (imageio)."""
    import imageio.v3 as iio
    import numpy as np

    frames = []
    for i, frame in enumerate(iio.imiter(buf)):
        if i % max(every_n, 1) == 0:
            frames.append(np.ascontiguousarray(frame).tobytes())
            if len(frames) >= max_frames:
                break
    return frames


#: binding name → frame-extraction callable. Resolved on the DRIVER
#: (the chosen callable is captured in the mapInPandas closure), so a
#: test can exercise the full Spark-side real path by registering a
#: deterministic decoder here — the codec call is the only faked part.
_REAL_FRAME_DECODERS = {
    "av": _decode_frames_av,
    "imageio": _decode_frames_imageio,
}

#: exceptions a corrupt/undecodable container can raise inside the
#: bindings — caught PER ROW so a poisoned blob yields one NULL-frame
#: row instead of killing the whole scan (mirrors _PIL_DECODE_ERRORS).
#: ImportError is deliberately NOT here: a worker missing the binding
#: must fail the job loudly, not emit silent NULLs.
_VIDEO_DECODE_ERRORS = (OSError, ValueError, IndexError, EOFError,
                        KeyError, RuntimeError)


def sample_video_frames(
    df: DataFrame,
    content_col: str = "content",
    every_n: int = 30,
    max_frames: int = 8,
    decoder: str = "fake",
) -> DataFrame:
    """binary video → exploded (frame_no, frame_bytes) rows.

    Fan-out stage: one input row becomes ≤ max_frames rows; the fake
    path slices the source bytes deterministically so row counts and
    schemas behave exactly like a real ffmpeg frame sampler.

    ``decoder='real'`` decodes with PyAV or imageio when one is
    importable (probed on the driver for a fast failure;
    :func:`_try_video_decoder`) and emits every ``every_n``-th frame's
    raw RGB24 bytes, up to ``max_frames``; a blob the binding cannot
    decode yields ONE row with NULL frame_no/frame_bytes (the same
    NULL-on-poison convention as the image decoders). Neither binding
    ships in this environment, so the real path fails fast with the
    probe's message until one is installed — no hard dependency.
    """
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
         if f.name != content_col]
        + ["frame_no int", "frame_bytes binary"]
    )
    keep_cols = [f.name for f in df.schema.fields if f.name != content_col]

    if decoder == "real":
        binding = _try_video_decoder()
        if binding is None:
            raise NotImplementedError(
                "video frame sampling with decoder='real' requires ffmpeg "
                "bindings (PyAV or imageio), which are not installed "
                "— use decoder='fake' for the deterministic byte-slice "
                "sampler"
            )
        decode = _REAL_FRAME_DECODERS[binding]

        def _sample_real(
            batches: Iterator[pd.DataFrame],
        ) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                rows = []
                for _, r in pdf.iterrows():
                    buf = bytes(r[content_col] or b"")
                    try:
                        frames = decode(buf, every_n, max_frames)
                    except _VIDEO_DECODE_ERRORS:
                        frames = None
                    if not frames:
                        rec = {c: r[c] for c in keep_cols}
                        rec["frame_no"] = None
                        rec["frame_bytes"] = None
                        rows.append(rec)
                        continue
                    for fno, fb in enumerate(frames):
                        rec = {c: r[c] for c in keep_cols}
                        rec["frame_no"] = fno
                        rec["frame_bytes"] = fb
                        rows.append(rec)
                yield pd.DataFrame(
                    rows, columns=keep_cols + ["frame_no", "frame_bytes"]
                )

        return df.mapInPandas(_sample_real, out_schema)

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                buf = bytes(r[content_col] or b"")
                n = min(max_frames, max(len(buf) // max(every_n, 1), 1))
                for fno in range(n):
                    rec = {c: r[c] for c in keep_cols}
                    rec["frame_no"] = fno
                    lo = fno * every_n
                    rec["frame_bytes"] = buf[lo:lo + every_n] or b"\0"
                    rows.append(rec)
            yield pd.DataFrame(
                rows, columns=keep_cols + ["frame_no", "frame_bytes"]
            )

    return df.mapInPandas(_sample, out_schema)


def video_near_dups(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    threshold: float = 0.5,
    num_hashes: int = 32,
    num_bands: int = 8,
    every_n: int = 30,
    max_frames: int = 8,
    seed: int = 42,
    decoder: str = "fake",
    bucket_mode: str = "hash",
    pins=None,
) -> DataFrame:
    """(i, j, jaccard) near-duplicate video pairs — the video analog of
    MinHash text dedup, composed from existing stages: sample frames →
    perceptual-hash each frame → each video becomes its SET of frame
    hashes → MinHash signature over the set → LSH band buckets →
    exact frame-set Jaccard on candidates only.

    Shared frames (re-encodes, trims, overlay edits at frame
    granularity) put two videos in the same band bucket; candidate
    work is per-bucket, never all-pairs, and the verify joins touch
    only candidate videos' hash sets.

    Only ``decoder='fake'`` is accepted today: the frame sampler is
    the deterministic byte-slicer until an ffmpeg binding exists, and
    its byte-slice "frames" are not decodable images — forwarding
    ``decoder='real'`` to the per-frame pHash would NULL every frame
    hash. When a real frame sampler lands, this gate lifts with it.
    """
    from ..operators.dedup import lsh_candidate_pairs, minhash_from_hashes

    if decoder != "fake":
        raise NotImplementedError(
            "video_near_dups: only decoder='fake' is supported while "
            "frame sampling is the deterministic byte-slicer (no "
            "ffmpeg binding installed) — byte-slice frames are not "
            "decodable images, so a real per-frame pHash cannot apply"
        )

    frames = sample_video_frames(
        df.select(id_col, content_col), content_col=content_col,
        every_n=every_n, max_frames=max_frames)
    hashed = image_phash(frames, content_col="frame_bytes",
                         decoder=decoder, out_col="_fh")
    sets = hashed.groupBy(id_col).agg(
        F.collect_set("_fh").alias("_fhs")).persist()
    if pins is not None:
        pins.add(sets)
    sigs = minhash_from_hashes(sets, "_fhs", id_col=id_col,
                               num_hashes=num_hashes, seed=seed)
    pairs = lsh_candidate_pairs(sigs, id_col=id_col, num_bands=num_bands,
                                bucket_mode=bucket_mode)
    a = sets.select(F.col(id_col).alias("i"), F.col("_fhs").alias("_hi"))
    b = sets.select(F.col(id_col).alias("j"), F.col("_fhs").alias("_hj"))
    return (
        pairs.join(a, "i").join(b, "j")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_hi", "_hj"))
            / F.size(F.array_union("_hi", "_hj")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("i", "j", "jaccard")
    )


def audio_fp_band_edges(window: int = 2048, n_bands: int = 17):
    """The log-spaced FFT-bin band edges :func:`audio_fingerprint`
    actually uses: integer-cast ``geomspace`` edges collapse at the
    low-frequency end, so fewer than ``n_bands`` bands can survive —
    this is the single source of truth for the surviving layout."""
    nbins = window // 2
    return np.unique(np.geomspace(1, nbins, n_bands + 1).astype(int))


def audio_fp_bits(window: int = 2048, n_bands: int = 17) -> int:
    """ACTUAL bit width of a real-decoder subfingerprint:
    ``len(edges) - 1`` bands survive edge collapse, band differences
    give one fewer value, so each subfingerprint carries
    ``len(edges) - 2`` bits — 15 at the defaults (window=2048,
    n_bands=17), NOT ``n_bands - 1``. Both the fingerprint packing and
    :func:`audio_near_dups`'s BER denominator derive from this, so
    BER is never systematically understated."""
    return max(len(audio_fp_band_edges(window, n_bands)) - 2, 1)


def audio_fingerprint(
    df: DataFrame,
    content_col: str = "content",
    decoder: str = "real",
    n_bands: int = 17,
    window: int = 2048,
    hop: int = 1024,
    max_windows: int = 256,
    out_col: str = "fingerprints",
) -> DataFrame:
    """Content-based audio fingerprints (Haitsma & Kalker, "A Highly
    Robust Audio Fingerprinting System", ISMIR 2002 — simplified):
    per analysis window, split the FFT magnitudes into log-spaced
    energy bands (``n_bands`` requested; integer edge collapse can
    leave fewer — :func:`audio_fp_bits` reports the surviving width)
    and emit one ``audio_fp_bits(window, n_bands)``-bit
    subfingerprint whose bit b is the sign of the band-energy
    difference's TIME derivative — invariant to global volume and
    robust to mild re-encoding. Output: ``array<bigint>`` of
    subfingerprints (≤ max_windows).

    Unlike the image path this ``decoder='real'`` is REAL in every
    environment: WAV parsing is the stdlib ``wave`` module and the
    DSP is numpy — no external codec. Bytes that are not readable WAV
    yield an empty array (a poisoned blob must not kill a 100 TB
    scan). ``decoder='fake'`` derives deterministic pseudo
    subfingerprints from content byte slices (md5 60-bit, the video
    frame convention) for codec-free oracle replays.

    Matching: treat each clip as the SET of its subfingerprints —
    :func:`audio_near_dups` runs them through
    :func:`~..operators.dedup.minhash_from_hashes` + LSH exactly like
    video frames; for Hamming-tolerant matching feed the individual
    subfingerprints to :func:`~..operators.dedup.simhash_near_dups`.
    """
    if decoder not in ("real", "fake"):
        raise ValueError("decoder: real | fake")
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + [f"{out_col} array<bigint>"]
    )

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib
        import io
        import wave

        for pdf in batches:
            outs = []
            for b in pdf[content_col]:
                buf = bytes(b or b"")
                if decoder == "fake":
                    n = min(max_windows, max(len(buf) // 64, 1))
                    outs.append([
                        int(hashlib.md5(
                            buf[i * 64:(i + 1) * 64]).hexdigest()[:15], 16)
                        for i in range(n)
                    ])
                    continue
                try:
                    with wave.open(io.BytesIO(buf)) as wf:
                        nch = wf.getnchannels()
                        width = wf.getsampwidth()
                        raw = wf.readframes(wf.getnframes())
                    if width != 2:
                        outs.append([])
                        continue
                    x = np.frombuffer(raw, dtype="<i2").astype(np.float64)
                    if nch > 1:
                        x = x[: len(x) // nch * nch] \
                            .reshape(-1, nch).mean(axis=1)
                except (wave.Error, EOFError, ValueError):
                    outs.append([])
                    continue
                n_win = min((len(x) - window) // hop + 1 if len(x) >= window
                            else 0, max_windows + 1)
                if n_win < 2:
                    outs.append([])
                    continue
                hann = np.hanning(window)
                nbins = window // 2
                edges = audio_fp_band_edges(window, n_bands)
                prev = None
                fps = []
                for w in range(n_win):
                    seg = x[w * hop: w * hop + window] * hann
                    mag = np.abs(np.fft.rfft(seg))[1: nbins + 1]
                    e = np.array([
                        float(np.sum(mag[edges[i]-1:edges[i+1]-1] ** 2))
                        for i in range(len(edges) - 1)
                    ])
                    d = e[:-1] - e[1:]
                    if prev is not None:
                        bits = (d - prev) > 0
                        v = 0
                        for i, bit in enumerate(bits):
                            if bit:
                                v |= 1 << i
                        fps.append(v)
                    prev = d
                outs.append(fps[:max_windows])
            pdf = pdf.copy()
            pdf[out_col] = outs
            yield pdf

    return df.mapInPandas(_fp, out_schema)


def audio_near_dups(
    df: DataFrame,
    id_col: str = "media_id",
    content_col: str = "content",
    max_ber: float = 0.25,
    n_bands: int = 17,
    window: int = 2048,
    decoder: str = "real",
    pins=None,
) -> DataFrame:
    """(i, j, ber) near-duplicate audio pairs, Haitsma-style: a pair
    becomes a CANDIDATE when any window's subfingerprint matches
    exactly (with ~30 windows/clip even a 5% bit-error rate leaves
    many exact windows, so recall is high), and is VERIFIED by the
    aligned bit-error rate — mean Hamming distance over same-position
    subfingerprints — which is the paper's match metric (ber ≈ 0 for
    re-encodes/gain changes, ≈ 0.5 for unrelated audio). Exact-set
    Jaccard is deliberately NOT used here: P(whole window unchanged)
    = (1−ber)^bits collapses steeply with ber, while aligned BER
    degrades linearly.

    Scale shape: candidates come from ONE equi-join keyed on the
    subfingerprint value (no all-pairs); verification joins only
    candidate pairs' aligned windows. Widen ``n_bands`` for a larger
    fingerprint space (bits = :func:`audio_fp_bits`, 15 at the
    defaults) when corpus size makes per-window collisions a
    candidate-volume concern. The BER denominator is the ACTUAL
    subfingerprint width — :func:`audio_fp_bits` for the real DSP
    path, 60 for the fake md5 path's 60-bit pseudo subfingerprints —
    so BER is calibrated either way.

    The exploded (id, window, subfingerprint) frame is persisted: it
    feeds FOUR branches (both candidate-join sides + both aligned
    verification sides), and with lazy lineage one action DECODED and
    fingerprinted every clip four times — for real audio the decode IS
    the dominant cost. Cached, each clip is decoded exactly once; the
    cache holds 3 narrow columns × ≤ max_windows rows per clip. Pass a
    :class:`~..operators.pins.Pins` to release it."""
    fps = audio_fingerprint(
        df.select(id_col, content_col), content_col=content_col,
        decoder=decoder, n_bands=n_bands, window=window)
    pos = fps.select(
        F.col(id_col),
        F.posexplode("fingerprints").alias("_win", "_fp"),
    ).persist()
    if pins is not None:
        pins.add(pos)
    a = pos.select(F.col(id_col).alias("i"), F.col("_fp"))
    b = pos.select(F.col(id_col).alias("j"), F.col("_fp"))
    cand = (
        a.join(b, "_fp")
        .where(F.col("i") < F.col("j"))
        .select("i", "j")
        .distinct()
    )
    li = pos.select(F.col(id_col).alias("i"),
                    F.col("_win"), F.col("_fp").alias("_fi"))
    rj = pos.select(F.col(id_col).alias("j"),
                    F.col("_win"), F.col("_fp").alias("_fj"))
    bits = 60.0 if decoder == "fake" else float(
        audio_fp_bits(window, n_bands))
    aligned = (
        cand.join(li, "i")
        .join(rj, ["j", "_win"])
        .groupBy("i", "j")
        .agg((F.avg(F.bit_count(
            F.col("_fi").bitwiseXOR(F.col("_fj"))))
            / F.lit(bits)).alias("ber"))
    )
    return aligned.where(F.col("ber") <= max_ber).select("i", "j", "ber")
