"""Local experiment-tracking / model-registry analog (MLflow shape, no
MLflow dependency).

The reference logs every training run to MLflow (params, 5 metrics, the
fitted model artifact — `04_MLflow_Fraud_Detection.py:131-193`) and
registers the F1 champion in the model registry with a run-URI fallback
(`04:253-289`). mlflow isn't importable in this environment, so this module
persists the same lifecycle state on disk:

  <root>/runs.jsonl       one JSON line per run: run_id, model name,
                          params, metrics, model_path, wall timestamp
  <root>/champion.json    registry pointer: {run_id, model, model_path}

Model artifacts are saved via ``PipelineModel.write().save`` (Spark-native,
distributed) under ``<root>/models/<run_id>``; loading one back is
``PipelineModel.load`` — the registry "stage transition" is just the
champion pointer swap, atomic via os.replace.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class RunLog:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _runs_path(self) -> str:
        return os.path.join(self.root, "runs.jsonl")

    @property
    def _champion_path(self) -> str:
        return os.path.join(self.root, "champion.json")

    # -- tracking -----------------------------------------------------------

    def log_run(
        self,
        model_name: str,
        params: dict,
        metrics: dict,
        model=None,
    ) -> str:
        """Record one training run; returns its run_id. ``model`` (a fitted
        pyspark.ml PipelineModel) is saved as the run's artifact."""
        n = sum(1 for _ in self._iter_runs())
        run_id = f"run-{n:04d}"
        model_path = None
        if model is not None:
            model_path = os.path.join(self.root, "models", run_id)
            model.write().overwrite().save(model_path)
        entry = {
            "run_id": run_id,
            "model": model_name,
            "params": params,
            "metrics": metrics,
            "model_path": model_path,
            "timestamp": time.time(),
        }
        with open(self._runs_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        return run_id

    def _iter_runs(self):
        if not os.path.exists(self._runs_path):
            return
        with open(self._runs_path) as f:
            for line in f:
                if line.strip():
                    yield json.loads(line)

    def runs(self, spark: SparkSession) -> DataFrame:
        """Run history as a DataFrame (params/metrics flattened to JSON
        strings so the schema is stable across param sets)."""
        rows = [
            (
                r["run_id"],
                r["model"],
                json.dumps(r["params"], sort_keys=True),
                json.dumps(r["metrics"], sort_keys=True),
                r.get("model_path"),
            )
            for r in self._iter_runs()
        ]
        return spark.createDataFrame(
            rows,
            "run_id string, model string, params string, metrics string, "
            "model_path string",
        )

    # -- registry -----------------------------------------------------------

    def set_champion(self, run_id: str) -> None:
        by_id = {r["run_id"]: r for r in self._iter_runs()}
        if run_id not in by_id:
            raise KeyError(f"unknown run_id {run_id}")
        r = by_id[run_id]
        tmp = self._champion_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(
                {
                    "run_id": run_id,
                    "model": r["model"],
                    "model_path": r["model_path"],
                },
                f,
            )
        os.replace(tmp, self._champion_path)

    def champion(self) -> dict | None:
        if not os.path.exists(self._champion_path):
            return None
        with open(self._champion_path) as f:
            return json.load(f)

    def load_champion_model(self):
        """Registry fetch: the champion's fitted PipelineModel."""
        from pyspark.ml import PipelineModel

        c = self.champion()
        if c is None or not c.get("model_path"):
            raise FileNotFoundError("no champion registered with a model artifact")
        return PipelineModel.load(c["model_path"])
