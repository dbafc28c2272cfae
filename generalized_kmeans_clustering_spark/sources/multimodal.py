"""Multimodal (image/audio/video) column plumbing for 100 TB pipelines.

Engine extension (driver mandate): media rides as opaque ``binary``
columns with typed metadata structs; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages so
each executor touches only its partitions' bytes — no collect, no
shuffle, schema known up front.

The image/audio codec libraries are NOT present in this environment,
so the codec kernels are STUBS behind ``decoder='fake'`` (a
deterministic hash-based decode used by tests and benchmarks) or
``decoder='real'`` (raises ``NotImplementedError`` at the exact point
a PIL/ffmpeg call would go). Everything Spark-side — schemas,
batching, partitioning, UDF signatures — is real and tested.
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
    "decode_image_meta",
    "image_embedding",
    "sample_video_frames",
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

    ``decoder='real'`` is the PIL/libvips integration point — stubbed
    with ``NotImplementedError`` in this environment.
    """
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["width int", "height int", "channels int"]
    )

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image decode requires PIL/libvips — not available "
                    "in this environment; use decoder='fake'"
                )
            dims = [_fake_dims(bytes(b or b"")) for b in pdf[content_col]]
            pdf = pdf.copy()
            pdf["width"] = [d[0] for d in dims]
            pdf["height"] = [d[1] for d in dims]
            pdf["channels"] = 3
            yield pdf

    return df.mapInPandas(_decode, out_schema)


def image_embedding(
    df: DataFrame,
    content_col: str = "content",
    dim: int = 32,
    decoder: str = "fake",
) -> DataFrame:
    """binary → feature vector (array<float>) via mapInPandas.

    The fake path emits a deterministic unit-norm vector seeded from a
    64-bit content hash, so the downstream join/cluster plumbing
    (ivf_index, cosine_topk, near-dup) is exercisable end-to-end.
    """
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields]
        + ["embedding array<float>"]
    )

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real image embedding requires a vision model runtime"
                )
            vecs = []
            for b in pdf[content_col]:
                seed = int.from_bytes(
                    bytes(b or b"")[:8].ljust(8, b"\0"), "little"
                ) % (2 ** 32)
                v = np.random.RandomState(seed).randn(dim)
                vecs.append((v / np.linalg.norm(v)).astype(np.float32).tolist())
            pdf = pdf.copy()
            pdf["embedding"] = vecs
            yield pdf

    return df.mapInPandas(_embed, out_schema)


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
    """
    out_schema = ", ".join(
        [f"{f.name} {f.dataType.simpleString()}" for f in df.schema.fields
         if f.name != content_col]
        + ["frame_no int", "frame_bytes binary"]
    )
    keep_cols = [f.name for f in df.schema.fields if f.name != content_col]

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if decoder == "real":
                raise NotImplementedError(
                    "real frame sampling requires ffmpeg bindings"
                )
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
