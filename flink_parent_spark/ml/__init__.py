"""ML pipeline API (flink-ml-parent parity): Params, the
Estimator/Transformer/Model/Pipeline contract, vector string codecs and
column-level BLAS verbs, concrete stages, and the multivariate Gaussian."""

from flink_parent_spark.ml.params import ParamInfo, Params, WithParams
from flink_parent_spark.ml.pipeline import (
    Estimator,
    Model,
    Pipeline,
    PipelineStage,
    Transformer,
)

__all__ = [
    "Estimator",
    "Model",
    "ParamInfo",
    "Params",
    "Pipeline",
    "PipelineStage",
    "Transformer",
    "WithParams",
]
