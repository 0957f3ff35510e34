"""Concrete pipeline stages bridging the ML API onto the engine's
distributed operators.

The reference's flink-ml-lib at this snapshot ships the API + math
scaffolding (mapper/model-source plumbing, `common/mapper/Mapper.java`,
`common/model/RowsModelSource.java`) without public trainers; these
stages are the engine's library counterparts, written against the same
Estimator/Transformer/Model contract so a Pipeline composes them exactly
as `Pipeline.java` describes.

All transforms are declarative DataFrame expressions; the only driver
work is model fitting's final reduce (means / centroids), bounded by the
model size, never the corpus.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from flink_parent_spark.ml.params import ParamInfo
from flink_parent_spark.ml.pipeline import Estimator, Model, Transformer

VEC_COL = ParamInfo("vec_col", "input vector column", has_default=True, default="features")
OUT_COL = ParamInfo("out_col", "output column", has_default=True, default="out")


class VectorAssembler(Transformer):
    """Stateless transformer: numeric columns -> one array<double> vector
    column (the standard feature-assembly stage)."""

    INPUT_COLS = ParamInfo("input_cols", "numeric columns to assemble")

    def transform(self, t_env, table):
        cols = self.get(self.INPUT_COLS)
        out = self.get(OUT_COL)
        return table.withColumn(
            out, F.array(*[F.col(c).cast("double") for c in cols])
        )


class StandardScalerModel(Model):
    """Fitted scaler: (x - mean) / std per coordinate, the means/stds held
    as literal arrays (model broadcast by construction)."""

    MEANS = ParamInfo("means", "per-coordinate means")
    STDS = ParamInfo("stds", "per-coordinate stds (0 -> passthrough)")

    def transform(self, t_env, table):
        from flink_parent_spark.datapipe.similarity import _lit_d1  # noqa: PLC0415

        means = self.get(self.MEANS)
        stds = [s if s > 0 else 1.0 for s in self.get(self.STDS)]
        vec, out = self.get(VEC_COL), self.get(OUT_COL)
        # one parsed literal per array, not one py4j round-trip per element
        # (same driver-latency fix as the ANN centroid literals; repr()
        # digits round-trip so the doubles are bit-identical)
        m = _lit_d1([float(x) for x in means])
        s = _lit_d1([float(x) for x in stds])
        idx = F.sequence(F.lit(0), F.size(F.col(vec)) - 1)
        return table.withColumn(
            out,
            F.transform(
                idx,
                lambda i: (F.col(vec)[i] - F.element_at(m, i + 1))
                / F.element_at(s, i + 1),
            ),
        )


class StandardScaler(Estimator):
    """Fit per-coordinate mean/std over a vector column with one
    aggregate (posexplode -> avg/stddev_pop per position)."""

    def fit(self, t_env, table) -> StandardScalerModel:
        vec = self.get(VEC_COL)
        stats = (
            table.select(F.posexplode(F.col(vec)).alias("__i", "__x"))
            .groupBy("__i")
            .agg(F.avg("__x").alias("m"), F.stddev_pop("__x").alias("s"))
            .orderBy("__i")
            .collect()
        )
        model = StandardScalerModel()
        model.set(VEC_COL, vec).set(OUT_COL, self.get(OUT_COL))
        model.set(StandardScalerModel.MEANS, [r.m for r in stats])
        model.set(StandardScalerModel.STDS, [r.s or 0.0 for r in stats])
        return model


class KMeansModel(Model):
    """Fitted k-means: assigns each vector its nearest centroid (cell id +
    cosine-free euclidean distance), centroids as a literal array —
    the same broadcast-centroid search shape the IVF ANN operator uses."""

    CENTROIDS = ParamInfo("centroids", "list of centroid vectors")

    def transform(self, t_env, table):
        cents = self.get(self.CENTROIDS)
        vec, out = self.get(VEC_COL), self.get(OUT_COL)
        from flink_parent_spark.datapipe.similarity import (  # noqa: PLC0415
            _lit_d2,
            sqdist,
        )

        cent_arr = _lit_d2([[float(x) for x in c] for c in cents])
        dists = F.transform(
            cent_arr, lambda c: sqdist(c, F.col(vec))
        )
        best = F.array_position(dists, F.array_min(dists)) - 1
        return table.withColumn(out, best.cast("int")).withColumn(
            f"{out}_dist", F.sqrt(F.array_min(dists))
        )


class KMeans(Estimator):
    """Lloyd-trained k-means over a vector column, reusing the ANN
    module's deterministic sampled trainer (train_kmeans_centroids:
    md5-bucket seeded init, bounded training sample)."""

    K = ParamInfo("k", "number of centroids", has_default=True, default=4)
    N_ITERS = ParamInfo("n_iters", "Lloyd iterations", has_default=True, default=2)
    ID_COL = ParamInfo("id_col", "row id column for deterministic init")
    SAMPLE_PCT = ParamInfo(
        "sample_pct", "training sample percent (None = full)",
        has_default=True, default=None,
    )

    def fit(self, t_env, table) -> KMeansModel:
        from flink_parent_spark.datapipe.similarity import (  # noqa: PLC0415
            train_kmeans_centroids,
        )

        cents = train_kmeans_centroids(
            table,
            self.get(self.K),
            self.get(self.N_ITERS),
            self.get(self.ID_COL),
            self.get(VEC_COL),
            sample_pct=self.get(self.SAMPLE_PCT),
        )
        model = KMeansModel()
        model.set(VEC_COL, self.get(VEC_COL)).set(OUT_COL, self.get(OUT_COL))
        model.set(KMeansModel.CENTROIDS, [list(map(float, c)) for c in cents])
        return model
