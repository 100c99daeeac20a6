"""Time-series operators: date-spine densification + rolling features.

Re-expresses the reference's per-home calendar densification loop
(``function-app/ml_forecast_anomaly.py:199-206`` — a Python loop over
``agg['HomeID'].unique()`` doing pandas ``reindex`` per home) and the
rolling-7/day-of-week feature block (``:211-212``) as single distributed
plans (SURVEY.md W-1..W-4).

Scale notes (100 TB):
- The spine is generated per group key with ``sequence`` + ``explode`` —
  no driver-side loop, no collect; output partitioning follows the group
  key so the subsequent left join co-partitions with the aggregate side.
- The rolling window reuses the groupBy's hash partitioning
  (``Window.partitionBy(keys)``), so densify -> window is ONE shuffle
  total (the groupBy's), not two.
- ``min_periods=1`` pandas semantics == Spark's shrinking ROWS frame; no
  adjustment needed (SURVEY.md §4.4.3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions import weekday_mon0


def date_spine(
    df: DataFrame,
    date_col: str,
    keys: Sequence[str] = (),
) -> DataFrame:
    """One row per (keys..., day) for every day in [min(date), max(date)]
    per key group (global spine when ``keys`` is empty).

    Replaces ``pd.date_range(...).reindex`` (``ml_forecast_anomaly.py:129,
    202``) with ``sequence`` + ``explode``: the per-group bounds aggregate is
    a partial-aggregated shuffle, the explode is pipelined map-side.
    """
    bounds = df.groupBy(*keys).agg(
        F.min(date_col).alias("__lo"), F.max(date_col).alias("__hi")
    )
    return bounds.select(
        *keys,
        F.explode(F.sequence("__lo", "__hi")).alias(date_col),
    )


def densify_daily(
    agg: DataFrame,
    date_col: str,
    keys: Sequence[str],
    fill_zero: Sequence[str],
) -> DataFrame:
    """Left-join a per-key daily spine onto a sparse per-key daily aggregate,
    zero-filling missing days (reference zero-fill semantics,
    ``ml_forecast_anomaly.py:130,203`` — NULL would poison the model
    features; SURVEY.md §4.4.4).
    """
    spine = date_spine(agg, date_col, keys)
    joined = spine.join(agg, [*keys, date_col], "left")
    out_cols: list[Column] = [F.col(c) for c in (*keys, date_col)]
    for c in fill_zero:
        out_cols.append(F.coalesce(F.col(c), F.lit(0).cast(agg.schema[c].dataType)).alias(c))
    return joined.select(*out_cols)


def rolling_features(
    daily: DataFrame,
    date_col: str,
    value_col: str,
    keys: Sequence[str],
    window_days: int = 7,
    rolling_col: str = "rolling_7_mean",
    dow_col: str = "dow",
) -> DataFrame:
    """Trailing ``window_days``-row mean per key + Monday=0 day-of-week.

    Mirrors ``ml_forecast_anomaly.py:211-212``. ROWS frame over a densified
    daily series == a day-based frame; the shrinking frame at the series
    head matches pandas ``min_periods=1``.
    """
    w = (
        W.partitionBy(*keys)
        .orderBy(date_col)
        .rowsBetween(-(window_days - 1), W.currentRow)
    )
    return daily.withColumn(rolling_col, F.avg(value_col).over(w)).withColumn(
        dow_col, weekday_mon0(date_col)
    )
