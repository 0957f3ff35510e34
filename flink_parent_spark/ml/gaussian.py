"""Multivariate Gaussian density as a column expression.

Reference: flink-ml-parent/flink-ml-lib —
`org/apache/flink/ml/common/statistics/basicstatistic/MultivariateGaussian.java:65`
(constructed from a mean vector and covariance matrix; `pdf`/`logpdf`
evaluate the density, with the covariance constants — the pseudo-inverse
root and the log-pseudo-determinant — precomputed once).

Here the constants precompute on the driver with numpy (eigen
decomposition, pseudo-inverse handling of the singular directions exactly
like the reference's `calculateCovarianceConstants`), and `logpdf`/`pdf`
evaluate per row as a codegen quadratic form over literal arrays — the
model is O(d^2) literals, the data never leaves the JVM.
"""

from __future__ import annotations

import math

import numpy as np

from pyspark.sql import Column, functions as F


class MultivariateGaussian:
    def __init__(self, mean: "list[float]", cov: "list[list[float]]"):
        self.mean = np.asarray(mean, dtype=float)
        c = np.asarray(cov, dtype=float)
        d = len(self.mean)
        if c.shape != (d, d):
            raise ValueError(f"covariance must be {d}x{d}, got {c.shape}")
        # pseudo-inverse via eigen decomposition: singular directions drop
        # out (the reference's tolerance-based pseudo-determinant)
        vals, vecs = np.linalg.eigh(c)
        tol = max(vals.max(), 0.0) * d * np.finfo(float).eps
        keep = vals > tol
        if not keep.any():
            raise ValueError("covariance matrix has no positive eigenvalues")
        inv_vals = np.where(keep, 1.0 / np.where(keep, vals, 1.0), 0.0)
        # precision matrix Sigma^+ = V diag(1/lambda) V^T
        self.precision = (vecs * inv_vals) @ vecs.T
        self.log_pseudo_det = float(np.log(vals[keep]).sum())
        self.rank = int(keep.sum())
        self._log_const = -0.5 * (
            self.rank * math.log(2.0 * math.pi) + self.log_pseudo_det
        )

    def logpdf(self, vec: Column) -> Column:
        """log density of each row's vector column: -0.5 * (x-mu)^T P
        (x-mu) + const, as one codegen expression.

        The mean/precision literals are parsed SQL expressions (one parser
        call, not one py4j round-trip per element — the ANN centroid-literal
        fix), and the delta vector is BOUND once as a lambda variable:
        referencing the raw zip_with subtree inside the aggregate lambdas
        makes Catalyst re-evaluate it per index (O(d) extra folds per row,
        each O(d)). Fold order is unchanged, so values are bit-identical."""
        from flink_parent_spark.datapipe.similarity import (  # noqa: PLC0415
            _lit_d1,
            _lit_d2,
        )

        d = len(self.mean)
        mu = _lit_d1([float(m) for m in self.mean])
        prec_rows = _lit_d2(
            [[float(x) for x in self.precision[i]] for i in range(d)]
        )
        idx = F.sequence(F.lit(1), F.lit(d))

        def quad_form(delta: Column) -> Column:
            # quadratic form: sum_i delta_i * (P row_i . delta)
            quad = F.aggregate(
                idx,
                F.lit(0.0),
                lambda acc, i: acc
                + F.element_at(delta, i)
                * F.aggregate(
                    F.zip_with(
                        F.element_at(prec_rows, i), delta, lambda p, dd: p * dd
                    ),
                    F.lit(0.0),
                    lambda a, x: a + x,
                ),
            )
            return F.lit(self._log_const) - 0.5 * quad

        return F.element_at(
            F.transform(
                F.array(F.zip_with(vec, mu, lambda x, m: x.cast("double") - m)),
                quad_form,
            ),
            1,
        )

    def pdf(self, vec: Column) -> Column:
        return F.exp(self.logpdf(vec))
