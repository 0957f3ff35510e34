"""Multinomial Naive Bayes text classifier — a real distributed trainer on
the ml Pipeline contract.

The reference's flink-ml-lib at this snapshot ships the model-serving
scaffolding (`common/model/RowsModelSource.java`: a model is a table of
rows streamed into the serving operator) without public trainers; this
stage supplies the classic counts-based trainer in exactly that shape —
the fitted model IS two DataFrames (per-(label, word) log-probabilities
and per-label priors), never a driver-side structure, so fit is a pair of
map-side-combined aggregates and predict is an equi-join.

Cross-engine determinism: every log-probability is quantized through
DECIMAL(30,12) at the model level and the per-document sums are
decimal-accumulated (the engine's float contract, queries/registry.py),
so scores — and therefore argmax predictions — are bit-identical on an
independent engine recomputing the same math.

Scale shape: fit = explode + two hash aggregates (bounded by |labels| x
vocab); only two scalars (corpus size, vocab size) ever reach the driver.
Predict = one crossJoin with the |labels|-row prior table (broadcast by
construction) and one equi-join with the model on (label, word) —
broadcast while the model fits, shuffle join on the same key when it
doesn't — then a per-document aggregate and a rank-1 window. Nothing is
quadratic in the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from flink_parent_spark.datapipe.text import tokens
from flink_parent_spark.ml.params import ParamInfo
from flink_parent_spark.ml.pipeline import Estimator, Model


def _quant(c):
    return c.cast("decimal(30,12)").cast("double")


def naive_bayes_fit(
    train: DataFrame, text_col: str, label_col: str, alpha: float = 1.0
) -> tuple[DataFrame, DataFrame]:
    """Fit add-`alpha` multinomial NB. Returns (word_logp, labels):
    word_logp = (label, word, logp); labels = (label, prior_logp,
    default_logp) where default_logp is the smoothed log-prob of a word
    unseen for that label."""
    words = train.select(
        F.col(label_col).alias("label"), F.explode(tokens(text_col)).alias("word")
    )
    cw = words.groupBy("label", "word").agg(F.count("*").alias("__c"))
    tot = cw.groupBy("label").agg(F.sum("__c").alias("__tot"))
    # two bounded scalars (not model data): train size + vocab size
    v = float(words.select("word").distinct().count())
    n = float(train.count())
    word_logp = cw.join(tot, "label").select(
        "label",
        "word",
        _quant(
            F.log(
                (F.col("__c") + alpha).cast("double")
                / (F.col("__tot") + alpha * v).cast("double")
            )
        ).alias("logp"),
    )
    nd = train.groupBy(F.col(label_col).alias("label")).agg(
        F.count("*").alias("__nd")
    )
    labels = nd.join(tot, "label").select(
        "label",
        _quant(F.log(F.col("__nd").cast("double") / n)).alias("prior_logp"),
        _quant(
            F.log(alpha / (F.col("__tot") + alpha * v).cast("double"))
        ).alias("default_logp"),
    )
    return word_logp, labels


def naive_bayes_predict(
    word_logp: DataFrame,
    labels: DataFrame,
    df: DataFrame,
    text_col: str,
    id_col: str,
) -> DataFrame:
    """Score every document against every label and keep the argmax
    (ties broken by label asc — total order, deterministic). Returns
    (id, pred_label, score)."""
    dw = (
        df.select(F.col(id_col).alias("__id"), F.explode(tokens(text_col)).alias("word"))
        .groupBy("__id", "word")
        .agg(F.count("*").alias("__c"))
    )
    scored = (
        dw.crossJoin(F.broadcast(labels))
        .join(word_logp, ["label", "word"], "left")
        .select(
            "__id",
            "label",
            "prior_logp",
            _quant(
                F.col("__c").cast("double")
                * F.coalesce(F.col("logp"), F.col("default_logp"))
            ).alias("__term"),
        )
        .groupBy("__id", "label", "prior_logp")
        .agg(
            (
                F.col("prior_logp")
                + F.sum(F.col("__term").cast("decimal(30,12)")).cast("double")
            ).alias("score")
        )
    )
    w = Window.partitionBy("__id").orderBy(F.desc("score"), F.asc("label"))
    return (
        scored.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col("__id").alias(id_col),
            F.col("label").alias("pred_label"),
            "score",
        )
    )


class NaiveBayesModel(Model):
    """Fitted NB: model data held as DataFrames (the RowsModelSource
    shape), applied by equi-join.

    Persistence contract (PipelineStage json round-trip): the model data
    is two TABLES, not literals, so unlike StandardScalerModel it cannot
    ride in params directly. `save_model(path)` writes both tables as
    parquet under `path` and records the location in the `model_path`
    param — which IS captured by to_json — and `transform` lazily reloads
    them from that path after a from_json round-trip. A model that has
    neither in-memory tables nor a `model_path` fails fast with a clear
    error instead of an AttributeError deep in the join."""

    TEXT_COL = ParamInfo("text_col", "input text column", has_default=True, default="text")
    PRED_COL = ParamInfo("prediction_col", "output column", has_default=True, default="prediction")
    ID_COL = ParamInfo("id_col", "document id column", has_default=True, default="doc_id")
    MODEL_PATH = ParamInfo(
        "model_path",
        "directory holding the persisted model tables (word_logp/, labels/)",
        has_default=True,
        default=None,
    )

    def __init__(self, word_logp: DataFrame | None = None, labels: DataFrame | None = None):
        super().__init__()
        self.word_logp = word_logp
        self.labels = labels

    def save_model(self, path: str) -> "NaiveBayesModel":
        """Write the model tables to `path` (parquet) and record it in
        params so a json round-trip reloads them."""
        if self.word_logp is None or self.labels is None:
            raise RuntimeError("NaiveBayesModel has no model data to save; fit first.")
        self.word_logp.write.mode("overwrite").parquet(f"{path}/word_logp")
        self.labels.write.mode("overwrite").parquet(f"{path}/labels")
        self.set(self.MODEL_PATH, path)
        return self

    def _ensure_model(self, spark) -> None:
        if self.word_logp is not None and self.labels is not None:
            return
        path = self.get(self.MODEL_PATH)
        if not path:
            raise RuntimeError(
                "NaiveBayesModel is unfitted: no in-memory model tables and "
                "no model_path param. Fit a NaiveBayes estimator, or persist "
                "a fitted model with save_model(path) before to_json()."
            )
        self.word_logp = spark.read.parquet(f"{path}/word_logp")
        self.labels = spark.read.parquet(f"{path}/labels")

    def transform(self, t_env, table):
        self._ensure_model(table.sparkSession)
        preds = naive_bayes_predict(
            self.word_logp,
            self.labels,
            table,
            self.get(self.TEXT_COL),
            self.get(self.ID_COL),
        )
        out = self.get(self.PRED_COL)
        preds = preds.select(
            F.col(self.get(self.ID_COL)),
            F.col("pred_label").alias(out),
            F.col("score").alias(f"{out}_score"),
        )
        return table.join(preds, self.get(self.ID_COL), "left")


class NaiveBayes(Estimator):
    """Add-alpha multinomial Naive Bayes estimator over a text + label
    column pair."""

    TEXT_COL = NaiveBayesModel.TEXT_COL
    LABEL_COL = ParamInfo("label_col", "label column", has_default=True, default="label")
    ALPHA = ParamInfo("alpha", "additive smoothing", has_default=True, default=1.0)

    def fit(self, t_env, table) -> NaiveBayesModel:
        word_logp, labels = naive_bayes_fit(
            table,
            self.get(self.TEXT_COL),
            self.get(self.LABEL_COL),
            float(self.get(self.ALPHA)),
        )
        model = NaiveBayesModel(word_logp, labels)
        model.set(NaiveBayesModel.TEXT_COL, self.get(self.TEXT_COL))
        return model
