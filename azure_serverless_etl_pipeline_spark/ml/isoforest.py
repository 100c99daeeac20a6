"""Deterministic isolation-forest scorer with an exact cross-engine oracle.

The reference's M-2 scores a feature matrix with a PRE-TRAINED pickled
sklearn IsolationForest (``ml_forecast_anomaly.py:214-222``) — the model
is a fixed artifact loaded at cold start, never refit per request. This
container cannot unpickle sklearn, so previous rounds covered M-2 with a
rows-only z-score stand-in (ml/scoring.py). This module closes the
evidence gap: a real isolation-tree ensemble whose structure is derived
from a seeded PRNG over fixed per-feature integer ranges (the "trained
artifact"), scored two independent ways that must agree bit for bit:

- Spark: the tree table broadcasts once per executor and an Arrow-batched
  pandas UDF traverses all trees vectorized in numpy — the exact
  reference deployment shape (broadcast model + vectorized batch
  scoring, zero per-row Python);
- Oracle: the SAME tree table compiles to nested SQL CASE expressions
  (one per tree, summed), exact integer arithmetic end to end.

Isolation-forest semantics are standard (Liu et al., ICDM 2008): each
tree is grown on a subsample of TRAINING points — split feature chosen
uniformly among those still varying in the node's subsample, threshold
uniform over the subsample's value range — and a scored point's path
depth is how many splits it survives before reaching a leaf. Points in
the training distribution's bulk track the subsample deep; points
outside it fall off the populated side of an early split, so a LOW
summed depth flags an outlier. The training sample here is SYNTHETIC
and seeded (a profile of normal per-user daily activity embedded in the
artifact, the way the reference's pickle embeds its training) — integer
features and integer thresholds, so scoring is exact on any engine. The
leaf-size c(n) average-path adjustment of the paper is intentionally
omitted: depth alone preserves the anomaly ordering and keeps the score
integer-exact.

At 100 TB the scoring pass is embarrassingly parallel (map-only over
Arrow batches, ~KB of broadcast state); only the upstream feature
aggregation shuffles.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_SEED = 42
N_TREES = 24
MAX_DEPTH = 8
_TRAIN_N = 256
_SUBSAMPLE = 64

# feature names, in scoring-matrix column order
FEATURES: list[str] = ["n_events", "n_types", "max_hour", "dow"]

# sum-of-depths cutoff: <= CUTOFF -> anomaly. A fixed model constant (the
# sklearn analog is the contamination-derived offset_ baked into the
# pickle); calibrated once so roughly the sparsest few percent of
# (user, day) cells flag at the driver's scales.
CUTOFF = 85


def training_sample(seed: int = _SEED, n: int = _TRAIN_N) -> list[tuple[int, ...]]:
    """The artifact's embedded training profile: ``n`` synthetic
    normal-activity points (per-user daily event count, distinct types,
    latest active hour, weekday). Bulk activity is 1-5 events of 1-3
    types ending in the evening; the forest learns THIS as normal, so
    heavy event bursts or odd-hour-only days isolate early."""
    rng = random.Random(seed)
    pts = []
    for _ in range(n):
        n_events = min(1 + int(rng.expovariate(0.55)), 9)
        n_types = max(1, min(n_events, 1 + int(rng.expovariate(0.9))))
        max_hour = min(23, max(0, int(rng.gauss(16.5, 4.0))))
        dow = rng.randrange(7)
        pts.append((n_events, n_types, max_hour, dow))
    return pts


def build_trees(
    seed: int = _SEED, n_trees: int = N_TREES, max_depth: int = MAX_DEPTH
) -> list[tuple]:
    """The model artifact: ``n_trees`` isolation trees fit on seeded
    subsamples of the embedded training profile, reproducible from the
    seed alone. Node = ("n", feat_idx, thr, left, right) with the split
    x[feat] <= thr (threshold uniform over the node subsample's integer
    range); leaf = ("l", depth) when the subsample is isolated or
    ``max_depth`` is hit."""
    rng = random.Random(seed)
    train = training_sample(seed)

    def grow(sample: list[tuple[int, ...]], depth: int):
        if depth >= max_depth or len(sample) <= 1:
            return ("l", depth)
        varying = [
            i
            for i in range(len(FEATURES))
            if max(p[i] for p in sample) > min(p[i] for p in sample)
        ]
        if not varying:
            return ("l", depth)
        f = rng.choice(varying)
        lo = min(p[f] for p in sample)
        hi = max(p[f] for p in sample)
        thr = rng.randint(lo, hi - 1)  # left: x <= thr, right: x > thr
        left = grow([p for p in sample if p[f] <= thr], depth + 1)
        right = grow([p for p in sample if p[f] > thr], depth + 1)
        return ("n", f, thr, left, right)

    trees = []
    for _ in range(n_trees):
        sub = [train[rng.randrange(len(train))] for _ in range(_SUBSAMPLE)]
        trees.append(grow(sub, 0))
    return trees


def _flatten(tree: tuple) -> tuple[np.ndarray, ...]:
    """Array form for vectorized traversal: per node (feat, thr, left
    child, right child, leaf depth); feat == -1 marks a leaf."""
    feat, thr, left, right, depth = [], [], [], [], []

    def add(node) -> int:
        i = len(feat)
        feat.append(-1), thr.append(0), left.append(i), right.append(i), depth.append(0)
        if node[0] == "l":
            depth[i] = node[1]
        else:
            feat[i], thr[i] = node[1], node[2]
            left[i] = add(node[3])
            right[i] = add(node[4])
        return i

    add(tree)
    return tuple(np.array(a, dtype=np.int64) for a in (feat, thr, left, right, depth))


def score_paths(x: np.ndarray, trees: list[tuple]) -> np.ndarray:
    """Summed leaf depth per row across the ensemble (lower = more
    anomalous). ``x``: (n_rows, n_features) int array in FEATURES order.
    Vectorized per level: every active row advances one node per step."""
    total = np.zeros(len(x), dtype=np.int64)
    for tree in trees:
        feat, thr, left, right, depth = _flatten(tree)
        node = np.zeros(len(x), dtype=np.int64)
        for _ in range(MAX_DEPTH):
            f = feat[node]
            live = f >= 0
            if not live.any():
                break
            vals = x[np.arange(len(x)), np.maximum(f, 0)]
            node = np.where(
                live, np.where(vals <= thr[node], left[node], right[node]), node
            )
        total += depth[node]
    return total


def score_df(feats: DataFrame, trees_bc=None) -> DataFrame:
    """Append (sum_depth, avg_path, anomaly) to an integer feature frame
    with the FEATURES columns. The tree table broadcasts once per
    executor (reference X-5 artifact-cache analog); scoring is one
    Arrow-batched pandas UDF, map-only."""
    spark = feats.sparkSession
    bc = trees_bc or spark.sparkContext.broadcast(build_trees())
    cols = list(FEATURES)

    @F.pandas_udf(T.LongType())
    def _depth(*series: pd.Series) -> pd.Series:
        x = np.column_stack([s.to_numpy(dtype=np.int64) for s in series])
        return pd.Series(score_paths(x, bc.value))

    scored = feats.withColumn("sum_depth", _depth(*[F.col(c) for c in cols]))
    return scored.select(
        *feats.columns,
        "sum_depth",
        (F.col("sum_depth").cast("double") / F.lit(float(N_TREES))).alias("avg_path"),
        (F.col("sum_depth") <= F.lit(CUTOFF)).alias("anomaly"),
    )


def tree_sum_sql(col_names: dict[str, str] | None = None) -> str:
    """The ensemble compiled to ANSI SQL: one nested CASE per tree,
    summed — the independent scoring path the oracle runs. Integer
    comparisons and additions only, so it is bit-identical to
    score_paths on any engine."""
    names = {name: (col_names or {}).get(name, name) for name in FEATURES}
    order = list(FEATURES)

    def emit(node) -> str:
        if node[0] == "l":
            return str(node[1])
        _, f, thr, left, right = node
        return (
            f"CASE WHEN {names[order[f]]} <= {thr} THEN {emit(left)} "
            f"ELSE {emit(right)} END"
        )

    return "(" + " + ".join(emit(t) for t in build_trees()) + ")"


__all__ = [
    "FEATURES",
    "N_TREES",
    "MAX_DEPTH",
    "CUTOFF",
    "build_trees",
    "score_paths",
    "score_df",
    "tree_sum_sql",
]
