"""ML Pipeline API: Estimator / Transformer / Model / Pipeline.

Reference: flink-ml-parent/flink-ml-api —
`org/apache/flink/ml/api/core/PipelineStage.java` (a stage carries Params
and json round-trips through them), `Transformer.java` /
`Estimator.java` / `Model.java`, and `Pipeline.java:57` — a pipeline is
itself an Estimator AND a Transformer AND a Model:

- `fit` walks the stages up to the LAST estimator inclusive; estimators
  fit on the running table and are replaced by their fitted models, every
  stage's transform output feeds the next stage (Pipeline.java:163-183);
  stages after the last estimator are carried over untrained.
- `transform` applies all stages in order and REFUSES to run when an
  unfitted estimator remains ("Pipeline contains Estimator, need to fit
  first", Pipeline.java:195).
- json persistence stores each stage as (class name, stage json) so a new
  empty instance can be re-instantiated and re-loaded
  (Pipeline.java:205-240).

Tables are Spark DataFrames (the engine's Table equivalent); the
`t_env` parameter is carried for signature parity with
`fit(TableEnvironment, Table)` and may be None.
"""

from __future__ import annotations

import importlib
import json

from flink_parent_spark.ml.params import WithParams


class PipelineStage(WithParams):
    """Base stage (PipelineStage.java): params + json via params. Concrete
    stages must be constructible with no arguments so `from_json` can
    re-instantiate them by class name."""

    def to_json(self) -> str:
        return self.get_params().to_json()

    def load_json(self, s: str) -> "PipelineStage":
        self.get_params().load_json(s)
        return self


class Transformer(PipelineStage):
    def transform(self, t_env, table):  # pragma: no cover - abstract
        raise NotImplementedError


class Model(Transformer):
    """A Transformer produced by fitting an Estimator (Model.java)."""


class Estimator(PipelineStage):
    def fit(self, t_env, table) -> Model:  # pragma: no cover - abstract
        raise NotImplementedError


def _needs_fit(stage: PipelineStage) -> bool:
    # Pipeline.isStageNeedFit: a nested pipeline needs fit iff it still
    # contains an estimator; a plain stage needs fit iff it IS an estimator
    if isinstance(stage, Pipeline):
        return stage.need_fit()
    return isinstance(stage, Estimator)


class Pipeline(Estimator, Model):
    """Pipeline.java: a linear chain of stages, usable as estimator,
    transformer or model depending on its contents."""

    def __init__(self, stages: "list[PipelineStage] | None" = None):
        super().__init__()
        self._stages: list[PipelineStage] = []
        self._last_estimator_idx = -1
        for s in stages or []:
            self.append_stage(s)

    def append_stage(self, stage: PipelineStage) -> "Pipeline":
        if _needs_fit(stage):
            self._last_estimator_idx = len(self._stages)
        elif not isinstance(stage, Transformer):
            raise TypeError(
                "All PipelineStages should be Estimator or Transformer, "
                f"got: {type(stage).__name__}"
            )
        self._stages.append(stage)
        return self

    def get_stages(self) -> tuple:
        return tuple(self._stages)

    def need_fit(self) -> bool:
        return self._last_estimator_idx >= 0

    def fit(self, t_env, table) -> "Pipeline":
        out: list[PipelineStage] = []
        for i, s in enumerate(self._stages):
            if i <= self._last_estimator_idx:
                t = s.fit(t_env, table) if _needs_fit(s) else s
                out.append(t)
                table = t.transform(t_env, table)
            else:
                out.append(s)
        return Pipeline(out)

    def transform(self, t_env, table):
        if self.need_fit():
            raise RuntimeError("Pipeline contains Estimator, need to fit first.")
        for s in self._stages:
            table = s.transform(t_env, table)
        return table

    # -- persistence (Pipeline.java toJson/loadJson) -------------------------

    def to_json(self) -> str:
        return json.dumps(
            [
                {
                    "stageClassName": f"{type(s).__module__}.{type(s).__qualname__}",
                    "stageJson": s.to_json(),
                }
                for s in self._stages
            ]
        )

    def load_json(self, s: str) -> "Pipeline":
        self._stages, self._last_estimator_idx = [], -1
        for entry in json.loads(s):
            mod, _, cls = entry["stageClassName"].rpartition(".")
            stage: PipelineStage = getattr(importlib.import_module(mod), cls)()
            stage.load_json(entry["stageJson"])
            self.append_stage(stage)
        return self

    @classmethod
    def from_json(cls, s: str) -> "Pipeline":
        return cls().load_json(s)
