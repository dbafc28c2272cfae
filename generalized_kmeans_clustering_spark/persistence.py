"""Model persistence dispatch: one ``load_model(spark, path)`` for any
saved model class.

Layout contract (reference ``SPECIFICATION.md:227-256``,
``df/persistence/PersistenceLayout.scala:82-177``):
``<path>/metadata.json`` (+ ``modelClass`` discriminator + ``extra``
subclass state) and ``centers/*.parquet`` with
``(center_id, weight, vector)`` — component/streaming weights ride in
the ``weight`` column. Unknown metadata keys are ignored and missing
ones default, mirroring the reference's cross-version guarantee
(``README.md:554-557``).
"""

from __future__ import annotations

import json
import os

from .kmeans import GeneralizedKMeansModel
from .soft_kmeans import SoftKMeansModel
from .mixture import BregmanMixtureModel
from .robust import RobustKMeansModel
from .sparse import SparseKMeansModel
from .streaming.streaming_kmeans import StreamingKMeansModel

__all__ = ["load_model", "MODEL_REGISTRY"]

MODEL_REGISTRY: dict[str, type] = {
    cls.__name__: cls
    for cls in (
        GeneralizedKMeansModel, SoftKMeansModel, BregmanMixtureModel,
        RobustKMeansModel, SparseKMeansModel, StreamingKMeansModel,
    )
}


def load_model(spark, path: str):
    """Read metadata, dispatch to the saved model class, verify checksums."""
    with open(os.path.join(path, "metadata.json")) as f:
        meta = json.load(f)
    cls = MODEL_REGISTRY.get(
        meta.get("modelClass", "GeneralizedKMeansModel"),
        GeneralizedKMeansModel,
    )
    return cls.load(spark, path)
