"""Vector string formats and dense column-level linear algebra.

Reference: flink-ml-parent/flink-ml-lib —
`org/apache/flink/ml/common/linalg/VectorUtil.java:27-49` (dense vectors
serialize as space-separated values "1 2 3 4"; sparse vectors as
index:value pairs "0:1 2:3 3:4" with an optional "$size$" header, and a
string parses as sparse iff it is blank or contains ':' or '$'),
`DenseVector.java` / `SparseVector.java` (the two concrete types), and
`BLAS.java` (dot/scal/axpy/norm over them).

In the Spark engine a dense vector IS an `array<double>` column;
sparse vectors materialize dense on parse (Spark has no sparse array
type and every downstream operator here consumes dense). The string
codec round-trips both reference formats; the BLAS verbs are codegen
column expressions shared with the similarity operators.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

from flink_parent_spark.datapipe.similarity import cosine, dot, norm  # noqa: F401


def parse_vector(s: str) -> list[float]:
    """Driver-side VectorUtil.parse: dense ("1 2 3") or sparse
    ("$4$0:1 2:3") string to a dense python list."""
    s = s.strip()
    if not s or ":" in s or "$" in s:
        size = None
        body = s
        if body.startswith("$"):
            _, size_s, body = body.split("$", 2)
            size = int(size_s)
        pairs = [p for p in body.split() if p]
        idx_val = [(int(p.split(":")[0]), float(p.split(":")[1])) for p in pairs]
        n = size if size is not None else (max(i for i, _ in idx_val) + 1 if idx_val else 0)
        out = [0.0] * n
        for i, v in idx_val:
            out[i] = v
        return out
    return [float(x) for x in s.split()]


def format_dense(vec: list[float]) -> str:
    """VectorUtil.toString for a dense vector: space-separated values."""
    return " ".join(repr(v) if v != int(v) else str(int(v)) for v in vec)


def format_sparse(vec: list[float]) -> str:
    """VectorUtil.toString for a sparse view: $size$ header + index:value
    pairs of the non-zeros."""
    nz = [(i, v) for i, v in enumerate(vec) if v != 0.0]
    body = " ".join(
        f"{i}:{repr(v) if v != int(v) else str(int(v))}" for i, v in nz
    )
    return f"${len(vec)}${body}"


def parse_vector_col(col: Column | str) -> Column:
    """Column-level parse of the DENSE string format into array<double>
    (the common file-ingest path; sparse strings go through the driver
    helper or a mapInPandas when they appear in data)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.transform(
        F.split(F.trim(c), r"\s+"), lambda x: x.cast("double")
    )


def scal(a: float, x: Column) -> Column:
    """BLAS.scal: a * x elementwise."""
    return F.transform(x, lambda v: v * F.lit(float(a)))


def axpy(a: float, x: Column, y: Column) -> Column:
    """BLAS.axpy: a * x + y elementwise."""
    return F.zip_with(x, y, lambda xv, yv: F.lit(float(a)) * xv + yv)


def norm2(x: Column) -> Column:
    """BLAS norm2 (the similarity module's norm, re-exported by its
    reference name)."""
    return norm(x)
