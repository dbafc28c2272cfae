"""Shared checksummed model-sidecar persistence.

Engine extension. Small model state (IVF coarse centroids, PQ
codebooks, hashed-LR weights, BPE merge tables, ...) travels as a
"sidecar" next to the data it serves. Before round 7 each operator
hand-rolled its own 1-row JSON layout with no integrity guarantees,
while the k-means persistence layer (``kmeans.py:430``) already had a
checksummed metadata contract — this module closes that gap with ONE
layout every sidecar shares:

- a 1-row JSON dataset written THROUGH Spark (HDFS/S3/local alike —
  a driver-local ``open()`` would split a model directory across
  filesystems on any non-local deployment);
- ``layout_version`` + ``kind`` so readers can dispatch and refuse
  foreign payloads loudly;
- the model payload as ONE canonical JSON string (sorted keys), and
  its sha256 — a truncated/bit-flipped sidecar fails the checksum
  instead of silently serving wrong model state.

Writers that previously used bespoke layouts keep reading them
(legacy fallback in each operator's reader), but write only this one.
"""

from __future__ import annotations

import hashlib
import json

__all__ = ["write_model_sidecar", "read_model_sidecar", "SIDECAR_VERSION"]

SIDECAR_VERSION = 1


def _canonical(payload: dict) -> str:
    return json.dumps(payload, sort_keys=True, separators=(",", ":"))


def write_model_sidecar(spark, path: str, kind: str, payload: dict,
                        mode: str = "overwrite") -> None:
    """Persist ``payload`` (a JSON-serializable dict of model state)
    as a checksummed 1-row JSON dataset of ``kind`` at ``path``."""
    body = _canonical(payload)
    row = (
        int(SIDECAR_VERSION),
        str(kind),
        body,
        hashlib.sha256(body.encode()).hexdigest(),
    )
    spark.createDataFrame(
        [row],
        "layout_version int, kind string, payload string, sha256 string",
    ).coalesce(1).write.mode(mode).json(path)


def read_model_sidecar(spark, path: str, kind: str) -> dict:
    """Load and verify a :func:`write_model_sidecar` dataset; returns
    the parsed payload dict. Raises ``ValueError`` on a missing or
    foreign sidecar and ``IOError`` on a checksum mismatch.

    Readers with a pre-unification bespoke layout catch the
    "not a shared-layout sidecar" ``ValueError`` and fall back to
    their legacy parse — legacy rows simply lack the ``payload``
    column, which is the discriminator.
    """
    row = spark.read.json(path).first()
    if row is None:
        raise ValueError(f"read_model_sidecar: no sidecar at {path}")
    fields = set(row.__fields__)
    if not {"payload", "sha256", "kind"} <= fields:
        raise ValueError(
            f"read_model_sidecar: not a shared-layout sidecar at {path} "
            f"(columns {sorted(fields)})")
    if row["kind"] != kind:
        raise ValueError(
            f"read_model_sidecar: expected kind={kind!r} at {path}, "
            f"found {row['kind']!r}")
    body = row["payload"]
    digest = hashlib.sha256(body.encode()).hexdigest()
    if digest != row["sha256"]:
        raise IOError(
            f"read_model_sidecar: payload checksum mismatch at {path} "
            "(sidecar truncated or corrupted)")
    return json.loads(body)
