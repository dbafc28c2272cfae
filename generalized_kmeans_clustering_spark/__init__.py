"""PySpark-native generalized (Bregman) k-means clustering engine.

Brand-new implementation with the capabilities of
``derrickburns/generalized-kmeans-clustering`` (see SURVEY.md), built
Spark-first: divergences compile to Catalyst column expressions over
``array<double>`` features, one pluggable Lloyd iterator drives all
variants, initialization is truly distributed (k-means||), and
large-scale data-pipeline operators (dedup, similarity search, text
analysis) share the same kernel layer.
"""

from .functions.kernels import get_kernel, KERNELS  # noqa: F401
from .kmeans import GeneralizedKMeans, GeneralizedKMeansModel  # noqa: F401
from .summary import TrainingSummary  # noqa: F401

__version__ = "0.1.0"
