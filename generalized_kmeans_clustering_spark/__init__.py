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
from .functions.capabilities import (  # noqa: F401
    KernelCapabilities, capabilities_for, all_capabilities,
)
from .functions import transforms as feature_transforms  # noqa: F401
from .kmeans import GeneralizedKMeans, GeneralizedKMeansModel  # noqa: F401
from .summary import TrainingSummary  # noqa: F401
from .errors import (  # noqa: F401
    AllClustersEmpty, AssertionFailed, ConfigurationError,
    ConvergenceError, ConvergenceFailure, CostIncreased, DataError,
    DimensionMismatch, EmptyDataset, ErrorCategory, GKMError,
    IncompatibleTransform, InternalError, InvalidFeatures, InvalidK,
    InvalidMaxIterations, InvalidSeed, InvalidState, InvalidTolerance,
    InvalidWeight, MissingColumn, UnexpectedNull, UnknownInitMethod,
    UnknownKernel, ValidationError,
)
from .events import (  # noqa: F401
    ClusteringEvent, ClusteringSummary, ConvergenceDetected,
    EmptyClustersDetected, InitializationCompleted, IterationCompleted,
    IterationStarted, IterationTracker, SummarySink, TrainingCompleted,
    WarningEvent, event_from_dict,
)

# variant estimators on the shared Lloyd engine (SURVEY.md §2.5)
from .soft_kmeans import SoftKMeans, SoftKMeansModel  # noqa: F401
from .bisecting import BisectingKMeans  # noqa: F401
from .xmeans import XMeans  # noqa: F401
from .dpmeans import DPMeans  # noqa: F401
from .mixture import BregmanMixture, BregmanMixtureModel  # noqa: F401
from .minibatch import MiniBatchKMeans  # noqa: F401
from .coreset import CoresetKMeans  # noqa: F401
from .robust import RobustKMeans, RobustKMeansModel  # noqa: F401
from .balanced import BalancedKMeans  # noqa: F401
from .constrained import ConstrainedKMeans, ConstraintSet  # noqa: F401
from .multiview import MultiViewKMeans, MultiViewKMeansModel, View  # noqa: F401
from .sparse import SparseKMeans  # noqa: F401

# bounded-scale specialists
from .kmedoids import KMedoids, CLARA  # noqa: F401
from .kernel_kmeans import KernelKMeans, KernelKMeansModel  # noqa: F401
from .agglomerative import AgglomerativeBregman  # noqa: F401
from .spectral import SpectralClustering  # noqa: F401
from .timeseries import TimeSeriesKMeans, TimeSeriesKMeansModel  # noqa: F401
from .info_bottleneck import InformationBottleneck  # noqa: F401
from .coclustering import CoClustering, CoClusteringModel  # noqa: F401

# streaming
from .streaming.streaming_kmeans import (  # noqa: F401
    StreamingKMeans, StreamingKMeansModel, StreamingUpdater,
)

from .gmeans import GMeans  # noqa: F401

# evaluation
from .evaluation import ClusteringEvaluator, evaluate  # noqa: F401
from .agreement import agreement_metrics, contingency_table  # noqa: F401
from . import validation  # noqa: F401
from .config import GKMConfig  # noqa: F401

# event-table rollups (batch/streaming-parity plans)
from .operators.rollup import (  # noqa: F401
    funnel_completions, funnel_rollup, json_prop, retention_cohorts,
    retention_pairs, session_rollup, sessionize, throttle_events,
    top_k_by_count, tumbling_rollup,
)

# temporal joins / cascades and audit primitives
from .operators.temporal import (  # noqa: F401
    asof_join, range_interval_join, rollup_cascade,
)

# watermarked streaming twins of the temporal layer
from .streaming.asof import (  # noqa: F401
    asof_replay_flush, streaming_asof_join,
)
from .streaming.funnel import (  # noqa: F401
    funnel_replay_flush, streaming_funnel,
)
from .streaming.retention import (  # noqa: F401
    retention_replay_flush, streaming_retention,
)
from .streaming.sessions import (  # noqa: F401
    session_replay_flush, streaming_session_rollup,
)
from .streaming.throttle import (  # noqa: F401
    streaming_throttle, throttle_replay_flush,
)
from .operators.stats import quantiles_by_key  # noqa: F401
from .operators.graph import propagate_flags  # noqa: F401
from .operators.pins import Pins  # noqa: F401
from .operators.text_features import chunk_documents  # noqa: F401
from .operators.retrieval import (  # noqa: F401
    bm25_postings, bm25_topk, rrf_fuse,
)
from .operators.blocklist import (  # noqa: F401
    blocklist_hits, blocklist_rule,
)

__version__ = "0.3.0"
