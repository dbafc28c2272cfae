"""Center initialization: deterministic random init and true k-means||.

The reference's "k-means||" collects ALL points to the driver and runs
serial k-means++ (``df/CenterInitializer.scala:145-231``, collect at
:156 — SURVEY.md §4 anti-pattern #1). This module implements the real
distributed Bahmani k-means|| (arXiv:1203.6402) so initialization
scales with the data:

  1. pick 1 seed center (seed-stable hash order),
  2. ``init_steps`` rounds: each point joins the candidate set with
     probability min(1, l · d²(x, C) / Σ d²), evaluated executor-side
     with a seed-stable ``rand``; d²(x, C) is maintained
     *incrementally* — each round only computes distances to the
     round's NEW candidates and folds them into a cached running
     minimum, so round cost is O(n · new) not O(n · total),
  3. weight each candidate by the number of points it covers (one
     assignment aggregation), and run weighted k-means++ on the
     candidates on the driver (numpy, tiny).

Determinism: sampling uses ``xxhash64(features, seed)`` ordering and
``rand(seed)`` columns only — stable across runs on the same files
(SURVEY.md §7.3.2).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import Kernel
from .assignment import distances_column

__all__ = ["random_init", "kmeans_parallel_init", "initialize"]

# above this many candidate centers, one Arrow pass (numpy X@C.T) beats
# per-center higher-order-function expressions (measured at sf0.1: the
# 29-candidate weight pass dropped 8.1s → Arrow-bound)
_PANDAS_CAND_LIMIT = 12


def _nearest_cand_col(kernel: Kernel, fcol: str, centers: list, offset: int):
    """struct(d: min_c D(x,c), i: offset + argmin) — expression for few
    centers, Arrow/numpy beyond."""
    if len(centers) <= _PANDAS_CAND_LIMIT:
        dists = distances_column(kernel, F.col(fcol), centers)
        d = F.array_min(dists)
        i = (F.array_position(dists, F.array_min(dists)) - 1 + offset).cast("int")
        return F.struct(d.alias("d"), i.alias("i"))
    from pyspark.sql.functions import pandas_udf

    C = np.asarray(centers, dtype=np.float64)
    k = kernel

    @pandas_udf("struct<d:double,i:int>")
    def _near(feats: pd.Series) -> pd.DataFrame:
        if len(feats) == 0:
            return pd.DataFrame({"d": [], "i": []})
        X = np.asarray(feats.tolist(), dtype=np.float64)
        D = k.div_np(X, C)
        idx = D.argmin(axis=1)
        return pd.DataFrame(
            {"d": D[np.arange(len(idx)), idx],
             "i": (idx + offset).astype(np.int32)}
        )

    return _near(F.col(fcol))


def random_init(df: DataFrame, k: int, features_col: str, seed: int) -> np.ndarray:
    """k distinct seed-stable rows. Hash-order + limit compiles to a
    distributed TakeOrdered (top-k per partition + driver merge), no
    full sort — cheaper and partition-stable vs the reference's
    sample+limit (``CenterInitializer.scala:104-116``)."""
    rows = (
        df.select(F.col(features_col).alias("f"))
        .withColumn("_h", F.xxhash64(F.col("f"), F.lit(seed)))
        .orderBy("_h")
        .limit(max(k * 4, k))
        .collect()
    )
    seen, centers = set(), []
    for r in rows:
        key = tuple(r["f"])
        if key not in seen:
            seen.add(key)
            centers.append(list(key))
        if len(centers) == k:
            break
    if len(centers) < k:
        # fall back: allow duplicates rather than failing on low-cardinality data
        centers = [list(r["f"]) for r in rows[:k]]
    if len(centers) < k:
        raise ValueError(f"k={k} but only {len(centers)} rows available")
    return np.asarray(centers, dtype=np.float64)


def _kmeanspp_weighted(cand: np.ndarray, wts: np.ndarray, k: int,
                       kernel: Kernel, seed: int) -> np.ndarray:
    """Classic weighted k-means++ on the (small) candidate set, driver-side."""
    rng = np.random.RandomState(seed)
    n = len(cand)
    if n <= k:
        return cand
    first = int(rng.choice(n, p=wts / wts.sum()))
    chosen = [first]
    d2 = kernel.div_np(cand, cand[[first]])[:, 0]
    for _ in range(1, k):
        probs = np.maximum(d2, 0) * wts
        total = probs.sum()
        idx = int(rng.choice(n)) if total <= 0 else int(rng.choice(n, p=probs / total))
        chosen.append(idx)
        d2 = np.minimum(d2, kernel.div_np(cand, cand[[idx]])[:, 0])
    return cand[chosen]


def kmeans_parallel_init(
    df: DataFrame,
    k: int,
    kernel: Kernel,
    features_col: str,
    seed: int,
    init_steps: int = 2,
    oversampling: float = 2.0,
) -> np.ndarray:
    """Distributed Bahmani k-means|| with incremental nearest-candidate
    state.

    The cached frame carries (f, _d2, _ni): distance to AND index of
    the current nearest candidate, folded incrementally — each round
    touches only that round's new candidates, and the final candidate
    weights are a plain groupBy(_ni).count() on the cached state
    instead of a full |candidates|-distance re-scan.
    """
    l = oversampling * k
    cand_cap = max(50 * k, 2000)
    feats = df.select(F.col(features_col).alias("f"))
    centers = random_init(feats, 1, "f", seed).tolist()
    work = feats.withColumn(
        "_nc", _nearest_cand_col(kernel, "f", centers, 0)
    ).select("f", F.col("_nc.d").alias("_d2"), F.col("_nc.i").alias("_ni")) \
        .cache()
    try:
        # Σd² is folded into the pass that materializes each round's
        # cached state, so a round costs 2 jobs (sample + fold) instead
        # of 3 (agg + sample + fold-count).
        total = float(work.agg(F.sum("_d2").alias("s")).collect()[0]["s"] or 0.0)
        for step in range(init_steps):
            if total <= 0:
                break
            sampled = work.where(
                F.rand(seed + 17 * step + 1)
                < F.least(F.lit(1.0), F.lit(l) * F.col("_d2") / F.lit(total))
            ).select("f").collect()
            new = [list(r["f"]) for r in sampled]
            # respect the candidate cap BEFORE extending, so every kept
            # candidate is folded into the (_d2, _ni) state and gets a
            # real coverage weight in the final pass
            if len(centers) + len(new) > cand_cap:
                new = new[: cand_cap - len(centers)]
            if not new:
                if len(centers) >= cand_cap:
                    break
                continue
            offset = len(centers)
            centers.extend(new)
            nxt = work.withColumn(
                "_nn", _nearest_cand_col(kernel, "f", new, offset)
            ).select(
                "f",
                F.when(F.col("_nn.d") < F.col("_d2"), F.col("_nn.d"))
                .otherwise(F.col("_d2")).alias("_d2"),
                F.when(F.col("_nn.d") < F.col("_d2"), F.col("_nn.i"))
                .otherwise(F.col("_ni")).alias("_ni"),
            ).cache()
            # one job: materializes the cache AND returns next Σd²
            total = float(
                nxt.agg(F.sum("_d2").alias("s")).collect()[0]["s"] or 0.0
            )
            work.unpersist()
            work = nxt
            if len(centers) >= cand_cap:
                break

        cand = np.asarray(centers, dtype=np.float64)
        if len(cand) <= k:
            extra = random_init(feats, k, "f", seed + 99)
            cand = np.unique(np.vstack([cand, extra]), axis=0)
            if len(cand) < k:
                raise ValueError(
                    f"could not find {k} distinct candidate centers"
                )
            return cand[:k]
        # candidate weights from the already-materialized nearest index
        counts = {
            int(r["_ni"]): r["n"]
            for r in work.groupBy("_ni").agg(
                F.count(F.lit(1)).alias("n")).collect()
        }
    finally:
        work.unpersist()
    wts = np.array([counts.get(i, 0) for i in range(len(cand))], dtype=np.float64)
    wts = np.maximum(wts, 1e-9)
    return _kmeanspp_weighted(cand, wts, k, kernel, seed)


def initialize(
    df: DataFrame,
    k: int,
    kernel: Kernel,
    features_col: str,
    seed: int,
    init_mode: str = "k-means||",
    init_steps: int = 2,
) -> np.ndarray:
    mode = init_mode.lower().replace("-", "").replace("_", "").replace("||", "parallel")
    if mode in ("random",):
        return random_init(df, k, features_col, seed)
    if mode in ("kmeansparallel", "parallel", "kmeanspp", "kmeans++"):
        return kmeans_parallel_init(df, k, kernel, features_col, seed, init_steps)
    from ..errors import UnknownInitMethod

    raise UnknownInitMethod(init_mode, ["random", "k-means||", "k-means++"])
