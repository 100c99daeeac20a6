"""Model artifact lifecycle (reference S-11/M-3/X-5).

The reference downloads serialized models from blob storage once per
worker (skip-if-cached, ``ml_forecast_anomaly.py:43-49``) and
deserializes at module import (``:52-71``); ``checkmodels.py`` is its
smoke test. Spark-first: the driver loads the artifact once and
``sc.broadcast``s the deserialized object; executors score through the
broadcast handle inside pandas UDFs — no per-task reload, no artifact
re-fetch per invocation.

Formats: Prophet-JSON and joblib-pickle load paths are gated behind
import-try (libraries absent in this container); the engine's own
fallback models serialize as plain JSON dicts so the full
save -> load -> broadcast -> score path is exercised end-to-end here.
"""

from __future__ import annotations

import json
from dataclasses import asdict, dataclass
from pathlib import Path

from pyspark.sql import SparkSession

try:  # pragma: no cover
    import joblib  # noqa: F401

    HAVE_JOBLIB = True
except ImportError:
    HAVE_JOBLIB = False


@dataclass
class ZScoreModel:
    """The fallback anomaly model's parameters: per-dow residual stats.

    Stands in for the pickled IsolationForest pipeline ("{'model': ...}"
    dict convention, ``ml_forecast_anomaly.py:59-71``): same lifecycle,
    JSON-serializable, deterministic.
    """

    mu: dict[str, float]
    sigma: dict[str, float]
    threshold: float = 3.0

    def save(self, path: str | Path) -> None:
        Path(path).write_text(json.dumps({"model": asdict(self)}))

    @classmethod
    def load(cls, path: str | Path) -> "ZScoreModel":
        obj = json.loads(Path(path).read_text())
        # dict-unwrap convention as in the reference loader
        inner = obj.get("model", obj) if isinstance(obj, dict) else obj
        return cls(**inner)


def fit_zscore_model(feats, value_col="total_value", rolling_col="rolling_7_mean",
                     dow_col="dow", threshold: float = 3.0) -> ZScoreModel:
    """Fit the per-dow residual stats distributively (tiny agg -> driver)."""
    from pyspark.sql import functions as F

    rows = (
        feats.groupBy(dow_col)
        .agg(
            F.avg(F.col(value_col) - F.col(rolling_col)).alias("mu"),
            F.stddev_pop(F.col(value_col) - F.col(rolling_col)).alias("sigma"),
        )
        .collect()
    )
    return ZScoreModel(
        mu={str(r[dow_col]): r["mu"] for r in rows},
        sigma={str(r[dow_col]): r["sigma"] for r in rows},
        threshold=threshold,
    )


def broadcast_model(spark: SparkSession, model):
    """Driver-side deserialize -> cluster-wide broadcast (X-5 analog).

    Executors access ``bc.value`` inside pandas UDFs; the object ships
    once per executor, not once per task (a driver-global would be
    re-pickled into every task closure).
    """
    return spark.sparkContext.broadcast(model)


def check_artifacts(paths: dict[str, str]) -> dict[str, bool]:
    """checkmodels.py analog: verify each artifact deserializes.

    Returns {name: ok}; unknown formats and missing files are False, not
    exceptions — the smoke gate reports, it doesn't crash.
    """
    results: dict[str, bool] = {}
    for name, p in paths.items():
        try:
            path = Path(p)
            if not path.exists():
                results[name] = False
            elif path.suffix == ".json":
                json.loads(path.read_text())
                results[name] = True
            elif path.suffix in (".pkl", ".joblib") and HAVE_JOBLIB:  # pragma: no cover
                joblib.load(path)
                results[name] = True
            else:
                results[name] = False
        except Exception:
            results[name] = False
    return results
