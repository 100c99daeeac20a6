"""Anomaly scoring over the rolling-feature frame (reference M-2).

The reference loads a pre-trained sklearn IsolationForest pipeline and
scores a pandas feature matrix [total_kwh, unique_appliances,
rolling_7_mean, dow] (``ml_forecast_anomaly.py:214-222``). Spark-first
re-expression:

- model artifact: loaded once on the driver, broadcast to executors
  (reference X-5 cold-start cache analog);
- scoring: a vectorized Arrow-batched pandas UDF — per-batch numpy, no
  per-row Python;
- when sklearn/the artifact is unavailable (this container), a
  deterministic robust z-score model stands in: per-dow dispersion stats
  are computed distributively (one tiny agg, broadcast back), and the
  pandas UDF scores |value - rolling_mean| / sigma_dow. The Spark
  plumbing (broadcast + pandas UDF + schema) is identical either way.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # pragma: no cover - not installed in this container
    from sklearn.ensemble import IsolationForest  # noqa: F401

    HAVE_SKLEARN = True
except ImportError:
    HAVE_SKLEARN = False

_SCORE_SCHEMA = T.StructType(
    [
        T.StructField("score", T.DoubleType()),
        T.StructField("anomaly", T.BooleanType()),
    ]
)


def score_anomalies(
    feats: DataFrame,
    value_col: str = "total_value",
    rolling_col: str = "rolling_7_mean",
    dow_col: str = "dow",
    z_threshold: float = 3.0,
) -> DataFrame:
    """Append (score, anomaly) to a feature frame.

    score follows the IsolationForest decision_function convention
    (higher = more normal): score = -|z|. anomaly = |z| > z_threshold,
    mirroring predict() == -1 (``ml_forecast_anomaly.py:218-222``).
    """
    # per-dow dispersion model: tiny aggregate (<= 7 rows), broadcast join
    stats = feats.groupBy(dow_col).agg(
        F.avg(F.col(value_col) - F.col(rolling_col)).alias("mu_resid"),
        F.stddev_pop(F.col(value_col) - F.col(rolling_col)).alias("sigma_resid"),
    )
    with_stats = feats.join(F.broadcast(stats), dow_col, "left")

    @F.pandas_udf(_SCORE_SCHEMA)
    def _score(
        value: pd.Series, rolling: pd.Series, mu: pd.Series, sigma: pd.Series
    ) -> pd.DataFrame:
        resid = value - rolling
        sig = sigma.where(sigma > 0, 1.0)
        z = (resid - mu) / sig
        score = -z.abs()
        return pd.DataFrame({"score": score, "anomaly": z.abs() > z_threshold})

    scored = with_stats.withColumn(
        "_s", _score(F.col(value_col), F.col(rolling_col), "mu_resid", "sigma_resid")
    )
    return scored.select(
        *[c for c in feats.columns],
        F.round(F.col("_s.score"), 6).alias("score"),
        F.col("_s.anomaly").alias("anomaly"),
    )


def score_anomalies_with_model(
    feats: DataFrame,
    model_bc,
    value_col: str = "total_value",
    rolling_col: str = "rolling_7_mean",
    dow_col: str = "dow",
) -> DataFrame:
    """Score with a PRE-TRAINED broadcast artifact — the reference's exact
    pattern (load once at cold start, score every request;
    ``ml_forecast_anomaly.py:52-71,218-222``). ``model_bc`` is a
    broadcast of ml.artifacts.ZScoreModel; executors read ``bc.value``
    inside the Arrow batch loop, so the artifact ships once per executor
    rather than per task. Identical output to score_anomalies when the
    model was fit on the same frame.
    """

    @F.pandas_udf(_SCORE_SCHEMA)
    def _score(value: pd.Series, rolling: pd.Series, dow: pd.Series) -> pd.DataFrame:
        m = model_bc.value
        mu = dow.astype(str).map(m.mu).astype(float)
        sigma = dow.astype(str).map(m.sigma).astype(float)
        sigma = sigma.where(sigma > 0, 1.0)
        z = (value - rolling - mu) / sigma
        return pd.DataFrame({"score": -z.abs(), "anomaly": z.abs() > m.threshold})

    scored = feats.withColumn(
        "_s", _score(F.col(value_col), F.col(rolling_col), F.col(dow_col))
    )
    return scored.select(
        *[c for c in feats.columns],
        F.round(F.col("_s.score"), 6).alias("score"),
        F.col("_s.anomaly").alias("anomaly"),
    )
