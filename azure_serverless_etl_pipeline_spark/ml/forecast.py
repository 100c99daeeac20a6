"""Daily-series forecasting (reference M-1).

The reference runs a pre-trained global Prophet model and returns the
last ``days`` rows of (ds, yhat, yhat_lower, yhat_upper)
(``ml_forecast_anomaly.py:133-138``). Spark-first re-expression:

- the input daily series is aggregated/densified distributively (G7);
- forecasting runs per group via ``applyInPandas`` — one pandas model fit
  per key, parallel across keys (the reference's global forecast is the
  single-group case). This is the standard Spark pattern for
  embarrassingly-parallel per-entity model fitting at scale.
- Prophet is used when importable; otherwise a deterministic
  trend + day-of-week seasonal-naive model (numpy closed-form) stands in
  with the same output contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    from prophet import Prophet  # noqa: F401

    HAVE_PROPHET = True
except ImportError:
    HAVE_PROPHET = False

_OUT_SCHEMA = "group_key int, ds date, yhat double, yhat_lower double, yhat_upper double"


def _fit_predict_fallback(pdf: pd.DataFrame, periods: int) -> pd.DataFrame:
    """Linear trend + additive day-of-week seasonality, closed form."""
    pdf = pdf.sort_values("ds").reset_index(drop=True)
    y = pdf["y"].to_numpy(dtype=float)
    t = np.arange(len(y), dtype=float)
    if len(y) >= 2:
        slope, intercept = np.polyfit(t, y, 1)
    else:
        slope, intercept = 0.0, float(y[0]) if len(y) else 0.0
    trend = intercept + slope * t
    resid = y - trend
    dow = pd.to_datetime(pdf["ds"]).dt.dayofweek.to_numpy()
    seasonal = np.zeros(7)
    for d in range(7):
        m = dow == d
        if m.any():
            seasonal[d] = resid[m].mean()
    sigma = float(np.std(resid - seasonal[dow])) if len(y) else 0.0

    future_t = np.arange(len(y), len(y) + periods, dtype=float)
    last = pd.to_datetime(pdf["ds"].iloc[-1])
    future_ds = pd.date_range(last + pd.Timedelta(days=1), periods=periods, freq="D")
    yhat = intercept + slope * future_t + seasonal[future_ds.dayofweek.to_numpy()]
    return pd.DataFrame(
        {
            "ds": future_ds.date,
            "yhat": yhat,
            "yhat_lower": yhat - 1.96 * sigma,
            "yhat_upper": yhat + 1.96 * sigma,
        }
    )


def _fit_predict_prophet(pdf: pd.DataFrame, periods: int) -> pd.DataFrame:
    from prophet import Prophet

    m = Prophet()
    m.fit(pdf[["ds", "y"]])
    future = m.make_future_dataframe(periods=periods)
    fc = m.predict(future)[["ds", "yhat", "yhat_lower", "yhat_upper"]].tail(periods)
    fc["ds"] = fc["ds"].dt.date
    return fc


def forecast_daily(
    dense_daily: DataFrame,
    periods: int = 14,
    date_col: str = "date",
    value_col: str = "total_value",
    key_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Forecast ``periods`` days past the end of each key's daily series.

    With no keys this is the reference's global forecast; with keys it is
    the per-home generalization (SURVEY.md §3.3).
    """
    keyed = dense_daily.select(
        *key_cols,
        F.col(date_col).alias("ds"),
        F.col(value_col).cast("double").alias("y"),
    )
    if not key_cols:
        keyed = keyed.withColumn("group_key", F.lit(1).cast("int"))
        group_cols = ["group_key"]
        out_schema = _OUT_SCHEMA
    else:
        group_cols = list(key_cols)
        key_fields = ", ".join(
            f"{f.name} {f.dataType.simpleString()}"
            for f in keyed.schema
            if f.name in key_cols
        )
        out_schema = f"{key_fields}, ds date, yhat double, yhat_lower double, yhat_upper double"

    def _per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        keys = {c: pdf[c].iloc[0] for c in group_cols}
        fit = _fit_predict_prophet if HAVE_PROPHET else _fit_predict_fallback
        out = fit(pdf, periods)
        for c, v in keys.items():
            out[c] = v
        return out[group_cols + ["ds", "yhat", "yhat_lower", "yhat_upper"]]

    return keyed.groupBy(*group_cols).applyInPandas(_per_group, out_schema)
