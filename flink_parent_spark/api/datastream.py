"""DataStream API veneer: the PyFlink-shaped programming surface mapped
onto Spark DataFrames / Structured Streaming.

Reference surface:
- `StreamExecutionEnvironment` — flink-streaming-java/.../environment/
  StreamExecutionEnvironment.java (fromCollection:919, addSource:1502,
  execute:1643); PyFlink pyflink/datastream/stream_execution_environment.py.
- `DataStream` verbs — .../datastream/DataStream.java (map:578, flatMap:614,
  filter:708, union:217, keyBy:289, print:939).
- `KeyedStream` — .../datastream/KeyedStream.java (reduce:372, sum/min/max
  :404-474, window:440, process:530).
- `WindowedStream` — .../datastream/WindowedStream.java (reduce/aggregate).

Mapping decisions (Spark-first, not a runtime port):
- A bounded `from_collection` stream is a DataFrame with an `__arrival`
  ordinal so order-sensitive verbs (running reduce) replay Flink's
  arrival-order semantics deterministically.
- `map`/`filter`/`flat_map` accept either SQL expression strings (the fast
  path — stays in whole-stage codegen) or Python callables (Arrow-batched
  mapInPandas over row dicts — the UDF path, same trade the reference's
  Python DataStream API makes via its Beam runners).
- Keyed running reduce emits one output PER INPUT ELEMENT (Flink's
  KeyedStream.reduce contract), computed per key in arrival order inside
  one applyInPandas task per key group.
- Windows delegate to `window()`/`session_window` like the Table layer.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Sequence
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

ARRIVAL = "__arrival"


class StreamExecutionEnvironment:
    """Bounded-mode execution environment (the DataSet-style replay of the
    DataStream API — every verb also works on a real readStream DataFrame
    wrapped via `from_data_frame`)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    @staticmethod
    def get_execution_environment(
        spark: SparkSession | None = None,
    ) -> "StreamExecutionEnvironment":
        from flink_parent_spark.session import get_spark  # noqa: PLC0415

        return StreamExecutionEnvironment(spark or get_spark("datastream"))

    def set_parallelism(self, n: int) -> "StreamExecutionEnvironment":
        self.spark.conf.set("spark.sql.shuffle.partitions", str(n))
        return self

    def from_collection(self, data: Sequence, schema: str) -> "DataStream":
        rows = [(i, *r) if isinstance(r, tuple) else (i, r) for i, r in enumerate(data)]
        df = self.spark.createDataFrame(rows, f"{ARRIVAL} long, {schema}")
        return DataStream(df, self)

    def from_data_frame(self, df: DataFrame) -> "DataStream":
        if ARRIVAL not in df.columns:
            df = df.withColumn(ARRIVAL, F.monotonically_increasing_id())
        return DataStream(df, self)

    def read_text_file(self, path: str) -> "DataStream":
        df = self.spark.read.text(path).withColumn(
            ARRIVAL, F.monotonically_increasing_id()
        )
        return DataStream(df, self)


def _user_cols(df: DataFrame) -> list[str]:
    return [c for c in df.columns if c != ARRIVAL]


class DataStream:
    def __init__(self, df: DataFrame, env: StreamExecutionEnvironment):
        self._df = df
        self._env = env
        # replayable lineage (set by _wrap) for IterativeStream.close_with
        self._parent: DataStream | None = None
        self._builder: Callable[[DataFrame], DataFrame] | None = None

    # -- conversions --------------------------------------------------------
    def to_df(self) -> DataFrame:
        return self._df.drop(ARRIVAL)

    def execute_and_collect(self) -> list:
        """execute + collect in arrival order (DataStream.executeAndCollect)."""
        cols = _user_cols(self._df)
        rows = self._df.orderBy(ARRIVAL).select(*cols).collect()
        return [tuple(r) if len(cols) > 1 else r[0] for r in rows]

    def print(self) -> None:  # noqa: A003 - Flink verb name
        for r in self.execute_and_collect():
            print(r)

    # -- stateless verbs ----------------------------------------------------
    def _wrap(
        self,
        df: DataFrame,
        builder: "Callable[[DataFrame], DataFrame] | None" = None,
    ) -> "DataStream":
        """Wrap a derived DataFrame; `builder` (src_df -> derived_df) records
        replayable lineage so `IterativeStream.close_with` can re-apply the
        same transformation chain to each feedback frontier."""
        ds = DataStream(df, self._env)
        ds._parent, ds._builder = self, builder
        return ds

    def map(self, fn: "str | Callable", output_type: str | None = None) -> "DataStream":
        """map(expr) stays JVM-side — PREFER IT: the expression compiles
        into whole-stage codegen. map(callable, output_type) is the
        PyFlink-parity per-row path (Flink's Python UDF is also per-row):
        the function sees one row dict at a time via Arrow-batched
        mapInPandas. For real pipelines use `map_pandas`, which hands the
        callable the whole Arrow batch as a pandas DataFrame (vectorized,
        10-100x the per-row path)."""
        if isinstance(fn, str):
            def build_expr(src: DataFrame) -> DataFrame:
                return src.select(ARRIVAL, F.expr(fn))

            return self._wrap(build_expr(self._df), build_expr)
        if output_type is None:
            raise ValueError("map(callable) needs output_type (DDL schema)")
        cols = _user_cols(self._df)
        out_names = [f.split()[0].strip("`") for f in output_type.split(",")]

        def run(batches):
            for pdf in batches:
                recs = []
                for rec in pdf.to_dict("records"):
                    arr = rec.pop(ARRIVAL)
                    out = fn({c: rec[c] for c in cols})
                    if not isinstance(out, dict):
                        out = dict(zip(out_names, out if isinstance(out, tuple) else (out,)))
                    recs.append({ARRIVAL: arr, **out})
                yield pd.DataFrame(recs, columns=[ARRIVAL, *out_names])

        def build(src: DataFrame) -> DataFrame:
            return src.mapInPandas(run, f"{ARRIVAL} long, {output_type}")

        return self._wrap(build(self._df), build)

    def map_pandas(self, fn: Callable, output_type: str) -> "DataStream":
        """Vectorized map: `fn(pdf: pandas.DataFrame) -> pandas.DataFrame`
        transforms a whole Arrow batch at once (the batch-at-a-time default
        a real pipeline should use instead of map(callable)'s per-row
        loop). The returned frame must carry the `output_type` columns;
        row count may differ (it also subsumes vectorized flat_map)."""
        cols = _user_cols(self._df)
        out_names = [f.split()[0].strip("`") for f in output_type.split(",")]

        def run(batches):
            for pdf in batches:
                arr = pdf[ARRIVAL]
                out = fn(pdf[cols])
                # ALL outputs rescale to flat_map's sub-ordinal id space
                # (arrival * 1e6 + j): scaling only the cardinality-
                # changing batches would mix two id scales inside one
                # stream — a preserved batch after a changed one would
                # sort BEFORE it and raw/synthesized ids could collide
                if len(out) == len(pdf):
                    out = out.assign(**{ARRIVAL: arr.to_numpy() * 1_000_000})
                else:
                    base = (0 if len(arr) == 0 else int(arr.min())) * 1_000_000
                    out = out.assign(
                        **{ARRIVAL: [base + j for j in range(len(out))]}
                    )
                yield out[[ARRIVAL, *out_names]]

        def build(src: DataFrame) -> DataFrame:
            return src.mapInPandas(run, f"{ARRIVAL} long, {output_type}")

        return self._wrap(build(self._df), build)

    def filter(self, fn: "str | Callable") -> "DataStream":
        if isinstance(fn, str):
            def build_expr(src: DataFrame) -> DataFrame:
                return src.filter(fn)

            return self._wrap(build_expr(self._df), build_expr)
        cols = _user_cols(self._df)

        def run(batches):
            for pdf in batches:
                keep = [fn({c: rec[c] for c in cols}) for rec in pdf.to_dict("records")]
                yield pdf[pd.Series(keep, index=pdf.index)]

        def build(src: DataFrame) -> DataFrame:
            return src.mapInPandas(run, src.schema)

        return self._wrap(build(self._df), build)

    def flat_map(self, fn: Callable, output_type: str) -> "DataStream":
        cols = _user_cols(self._df)
        out_names = [f.split()[0].strip("`") for f in output_type.split(",")]

        def run(batches):
            for pdf in batches:
                recs = []
                for rec in pdf.to_dict("records"):
                    arr = rec.pop(ARRIVAL)
                    for j, out in enumerate(fn({c: rec[c] for c in cols})):
                        if not isinstance(out, dict):
                            out = dict(
                                zip(out_names, out if isinstance(out, tuple) else (out,))
                            )
                        # sub-ordinal keeps flat-mapped rows in emit order
                        recs.append({ARRIVAL: arr * 1_000_000 + j, **out})
                yield pd.DataFrame(recs, columns=[ARRIVAL, *out_names])

        def build(src: DataFrame) -> DataFrame:
            return src.mapInPandas(run, f"{ARRIVAL} long, {output_type}")

        return self._wrap(build(self._df), build)

    def iterate(self, max_iterations: int = 100) -> "IterativeStream":
        """DataStream.iterate (DataStream.java:536): open an iterative part
        of the program whose feedback edge is closed by
        `IterativeStream.close_with`. See IterativeStream for the Spark
        mapping (driver-side frontier loop — Spark's DAG is acyclic, so the
        feedback edge becomes iteration, exactly like Flink's own batch
        iterations and this repo's graph supersteps)."""
        return IterativeStream(self._df, self._env, max_iterations)

    def union(self, *others: "DataStream") -> "DataStream":
        df = self._df
        for o in others:
            df = df.unionByName(o._df)
        return self._wrap(df)

    def key_by(self, *keys: str) -> "KeyedStream":
        return KeyedStream(self._df, list(keys), self._env)

    def connect(self, other: "DataStream") -> "ConnectedStreams":
        """DataStream.connect (ConnectedStreams.java): co-process two
        differently-typed streams with one function per side."""
        return ConnectedStreams(self, other)


class IterativeStream(DataStream):
    """Streaming iterations (IterativeStream.java:37, closeWith:65).

    Flink wires a physical feedback edge: records selected into the feedback
    stream re-enter the iteration head alongside new inputs, forever (or
    until `maxWaitTime` sees no data). Spark's execution graph is acyclic,
    so the feedback edge is expressed as a driver-side frontier loop — the
    same translation Flink itself applies to bounded/DataSet iterations and
    the one this repo's graph algorithms use for supersteps:

        frontier_0 = head input
        frontier_i = feedback-chain(frontier_{i-1})   # recorded lineage
        closed     = union of all frontiers

    `close_with(feedback)` requires `feedback` to be derived from this head
    through replayable verbs (map/filter/flat_map); it re-applies that chain
    until the feedback is empty or `max_iterations` is reached (the bounded
    analog of maxWaitTime termination). The returned stream is everything
    that ever entered the head — deriving the body/output from it replays
    Flink's semantics where the head's downstream sees originals + all
    feedback. Each frontier is localCheckpoint()ed: lineage would otherwise
    double per iteration.
    """

    _ITER_OFFSET = 1 << 40  # arrival-order offset per iteration round

    def __init__(self, df: DataFrame, env: StreamExecutionEnvironment, max_iterations: int):
        super().__init__(df, env)
        self._max_iterations = max_iterations

    def close_with(self, feedback: DataStream) -> DataStream:
        chain: list[Callable[[DataFrame], DataFrame]] = []
        node: DataStream | None = feedback
        while node is not self:
            if node is None or node._builder is None:
                raise ValueError(
                    "close_with: feedback must derive from the iteration head "
                    "via map/filter/flat_map (replayable lineage)"
                )
            chain.append(node._builder)
            node = node._parent
        chain.reverse()

        frontier = self._df
        acc = self._df
        for i in range(1, self._max_iterations + 1):
            nxt = frontier
            for build in chain:
                nxt = build(nxt)
            # later-iteration rows order after earlier ones; truncate lineage
            nxt = nxt.withColumn(
                ARRIVAL, F.col(ARRIVAL) + F.lit(self._ITER_OFFSET)
            ).localCheckpoint(eager=True)
            if nxt.isEmpty():
                break
            acc = acc.unionByName(nxt)
            frontier = nxt
        return DataStream(acc, self._env)


class ConnectedStreams:
    """CoMapFunction/CoFlatMapFunction surface: the two sides union under a
    side tag and each row routes to its side's function — the same
    two-input operator the reference builds, expressed as one map over the
    tagged union."""

    def __init__(self, first: DataStream, second: DataStream):
        self._first, self._second = first, second

    def map(self, f1: Callable, f2: Callable, output_type: str) -> DataStream:
        a = self._first.map(f1, output_type)
        b = self._second.map(f2, output_type)
        return a.union(b)

    def flat_map(self, f1: Callable, f2: Callable, output_type: str) -> DataStream:
        a = self._first.flat_map(f1, output_type)
        b = self._second.flat_map(f2, output_type)
        return a.union(b)


class KeyedStream:
    def __init__(self, df: DataFrame, keys: list[str], env: StreamExecutionEnvironment):
        self._df, self._keys, self._env = df, keys, env

    def _dtypes(self) -> dict[str, str]:
        return dict(self._df.dtypes)

    def reduce(self, fn: Callable[[dict, dict], dict]) -> DataStream:
        """Running reduce per key: one output per input element, folding in
        arrival order (KeyedStream.reduce:372 contract)."""
        cols = _user_cols(self._df)
        dt = self._dtypes()
        schema = f"{ARRIVAL} long, " + ", ".join(f"`{c}` {dt[c]}" for c in cols)

        def per_key(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ARRIVAL)
            acc: dict | None = None
            out = []
            for rec in pdf.to_dict("records"):
                arr = rec.pop(ARRIVAL)
                acc = rec if acc is None else fn(dict(acc), rec)
                out.append({ARRIVAL: arr, **{c: acc[c] for c in cols}})
            return pd.DataFrame(out, columns=[ARRIVAL, *cols])

        return DataStream(
            self._df.groupBy(*self._keys).applyInPandas(per_key, schema), self._env
        )

    def _agg_field(self, field: str, how: str) -> DataStream:
        def fn(acc: dict, cur: dict) -> dict:
            out = dict(cur)
            if how == "sum":
                out[field] = acc[field] + cur[field]
            elif how == "min":
                out[field] = min(acc[field], cur[field])
            else:
                out[field] = max(acc[field], cur[field])
            return out

        return self.reduce(fn)

    def sum(self, field: str) -> DataStream:  # noqa: A003
        return self._agg_field(field, "sum")

    def min(self, field: str) -> DataStream:  # noqa: A003
        return self._agg_field(field, "min")

    def max(self, field: str) -> DataStream:  # noqa: A003
        return self._agg_field(field, "max")

    def process(self, fn: Callable[[tuple, pd.DataFrame], pd.DataFrame],
                output_type: str) -> DataStream:
        """KeyedProcessFunction (bounded replay): fn(key, rows-in-arrival-
        order) -> output rows. Timers/live state need the streaming ops in
        flink_parent_spark.streaming.stateful instead."""
        def per_key(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            out = fn(key, pdf.sort_values(ARRIVAL).drop(columns=[ARRIVAL]))
            out = out.copy()
            out[ARRIVAL] = range(len(out))
            return out

        return DataStream(
            self._df.groupBy(*self._keys).applyInPandas(
                per_key, f"{output_type}, {ARRIVAL} long"
            ),
            self._env,
        )

    def window(self, ts_col: str, size: str, slide: str | None = None) -> "WindowedStream":
        return WindowedStream(self._df, self._keys, ts_col, size, slide, self._env)

    def count_window(self, n: int, slide: int | None = None) -> "CountWindowedStream":
        return CountWindowedStream(self._df, self._keys, n, self._env, slide)


class WindowedStream:
    """Tumbling/sliding event-time windows (WindowedStream.java → Spark
    `window()`)."""

    def __init__(self, df, keys, ts_col, size, slide, env):
        self._df, self._keys, self._env = df, keys, env
        self._win = (
            F.window(ts_col, size, slide) if slide else F.window(ts_col, size)
        )

    def aggregate(self, *agg_exprs: str) -> DataStream:
        out = (
            self._df.groupBy(self._win.alias("w"), *self._keys)
            .agg(*[F.expr(e) for e in agg_exprs])
            .select(
                F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"),
                "*",
            )
            .drop("w")
            .withColumn(ARRIVAL, F.monotonically_increasing_id())
        )
        return DataStream(out, self._env)


class CountWindowedStream:
    """Count windows: tumbling (CountTumblingWindowAssigner — every `n`
    elements per key form a window, numbered in arrival order) or, with a
    `slide`, sliding (KeyedStream.countWindow(size, slide) →
    CountSlidingWindowAssigner: GlobalWindows + CountEvictor(size) +
    CountTrigger(slide) — a fire every `slide` elements over the LAST
    `size` elements, fewer while the key warms up)."""

    def __init__(self, df, keys, n, env, slide=None):
        self._df, self._keys, self._n, self._env = df, keys, n, env
        self._slide = slide

    def aggregate(self, *agg_exprs: str) -> DataStream:
        import re  # noqa: PLC0415

        from pyspark.sql import Window  # noqa: PLC0415

        if self._slide:
            # sliding: each agg expr evaluates over a trailing ROWS frame
            # of `size`, emitted at every slide-th row per key — one
            # Catalyst window pass, one shuffle on the keys
            frame = (
                f"OVER (PARTITION BY {', '.join(self._keys)} "
                f"ORDER BY {ARRIVAL} "
                f"ROWS BETWEEN {self._n - 1} PRECEDING AND CURRENT ROW)"
            )
            framed = []
            for e in agg_exprs:
                em = re.match(r"^(?P<e>.+?)\s+AS\s+(?P<a>\w+)\s*$", e, re.IGNORECASE)
                expr, alias = (em.group("e"), em.group("a")) if em else (e, None)
                framed.append(
                    F.expr(f"{expr} {frame}").alias(alias)
                    if alias
                    else F.expr(f"{expr} {frame}")
                )
            w = Window.partitionBy(*self._keys).orderBy(ARRIVAL)
            df = self._df.withColumn("__rn", F.row_number().over(w))
            out = (
                df.select(
                    *self._keys,
                    (F.col("__rn") / self._slide - 1).cast("long").alias("window_id"),
                    F.col("__rn").alias("__rn"),
                    *framed,
                )
                .where(F.col("__rn") % self._slide == 0)
                .drop("__rn")
                .withColumn(ARRIVAL, F.monotonically_increasing_id())
            )
            return DataStream(out, self._env)
        w = Window.partitionBy(*self._keys).orderBy(ARRIVAL)
        df = self._df.withColumn(
            "window_id", ((F.row_number().over(w) - 1) / self._n).cast("long")
        )
        out = (
            df.groupBy(*self._keys, "window_id")
            .agg(*[F.expr(e) for e in agg_exprs])
            .withColumn(ARRIVAL, F.monotonically_increasing_id())
        )
        return DataStream(out, self._env)
