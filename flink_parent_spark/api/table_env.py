"""Flink-shaped TableEnvironment + Table API veneer over Spark.

Reference surface:
- TableEnvironment: flink-table/flink-table-api-java/.../internal/
  TableEnvironmentImpl.java (sqlQuery:666, executeSql:686) and PyFlink's
  pyflink/table/table_environment.py.
- Table fluent API: flink-table-api-java/.../Table.java; PyFlink
  pyflink/table/table.py:70-801.
- DDL: flink-sql-parser/.../ddl/SqlCreateTable.java + SqlWatermark.java —
  `CREATE TABLE t (cols...[, WATERMARK FOR c AS c - INTERVAL ...])
   WITH ('connector'='filesystem', 'path'=..., 'format'='parquet')`.

Everything delegates to Catalyst: `sql_query` is `spark.sql`; the fluent
verbs build the same DataFrame plans; DDL becomes a catalog entry holding a
reader recipe + watermark spec. Streaming tables (`in_streaming_mode` scans)
come back as readStream with the declared watermark applied — that is the
whole Flink time-attribute story mapped onto Spark (SURVEY §1.5, §4 "custom"
rows)."""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, functions as F

from flink_parent_spark.functions.registry import register_flink_functions
from flink_parent_spark.session import apply_runtime_confs, get_spark

_CREATE_RE = re.compile(
    r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)\s*"
    r"\((?P<cols>.*)\)\s*WITH\s*\((?P<props>.*)\)\s*$",
    re.IGNORECASE | re.DOTALL,
)
_WATERMARK_RE = re.compile(
    r"WATERMARK\s+FOR\s+(?P<col>\w+)\s+AS\s+\1\s*-\s*INTERVAL\s+'(?P<n>[\d.]+)'\s+(?P<unit>\w+)",
    re.IGNORECASE,
)
_PROP_RE = re.compile(r"'(?P<k>[^']+)'\s*=\s*'(?P<v>[^']*)'")
_CREATE_LIKE_RE = re.compile(
    r"CREATE\s+(?:TEMPORARY\s+)?TABLE\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)\s*"
    r"(?:\((?P<cols>.*?)\)\s*)?"
    r"(?:WITH\s*\((?P<props>.*?)\)\s*)?"
    r"LIKE\s+(?P<base>\w+)\s*(?:\((?P<opts>[^)]*)\))?\s*$",
    re.IGNORECASE | re.DOTALL,
)
_SYSTIME_RE = re.compile(
    r"FROM\s+(?P<lt>\w+)(?:\s+AS)?\s+(?P<la>\w+)\s+"
    r"JOIN\s+(?P<rt>\w+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
    r"(?P<lq>\w+)\.(?P<lts>\w+)(?:\s+(?:AS\s+)?(?P<ra>\w+))?\s+"
    r"ON\s+(?P<c1>\w+)\.(?P<k1>\w+)\s*=\s*(?P<c2>\w+)\.(?P<k2>\w+)",
    re.IGNORECASE,
)


def normalize_flink_types(col_ddl: str) -> str:
    """Map Flink-only LogicalTypes in DDL column definitions onto Spark
    types (SURVEY §1.2 / LogicalTypeRoot.java:54-138):
    - TIME [WITHOUT TIME ZONE] -> INT (millis-of-day convention, documented);
    - TIMESTAMP(p) [WITHOUT TIME ZONE] -> TIMESTAMP (precision collapses to
      micros, Spark's native resolution);
    - TIMESTAMP_LTZ / TIMESTAMP(p) WITH LOCAL TIME ZONE -> TIMESTAMP;
    - MULTISET<t> -> MAP<t, INT> (element -> multiplicity);
    - RAW / BYTES -> BINARY;
    - numeric synonyms NUMERIC/DEC -> DECIMAL.
    Types Spark already understands (VARCHAR(n), CHAR(n), DECIMAL(p,s),
    ARRAY/MAP/ROW...) pass through untouched."""
    s = col_ddl
    s = re.sub(
        r"\bTIMESTAMP(?:\s*\(\s*\d+\s*\))?\s+WITH\s+LOCAL\s+TIME\s+ZONE\b",
        "TIMESTAMP", s, flags=re.IGNORECASE,
    )
    s = re.sub(r"\bTIMESTAMP_LTZ(?:\s*\(\s*\d+\s*\))?\b", "TIMESTAMP", s,
               flags=re.IGNORECASE)
    s = re.sub(
        r"\bTIMESTAMP\s*\(\s*\d+\s*\)(?:\s+WITHOUT\s+TIME\s+ZONE)?",
        "TIMESTAMP", s, flags=re.IGNORECASE,
    )
    s = re.sub(r"\bTIMESTAMP\s+WITHOUT\s+TIME\s+ZONE\b", "TIMESTAMP", s,
               flags=re.IGNORECASE)
    s = re.sub(
        r"\bTIME\b(?:\s*\(\s*\d+\s*\))?(?:\s+WITHOUT\s+TIME\s+ZONE)?"
        r"(?!\s*ZONE|STAMP)",
        "INT", s, flags=re.IGNORECASE,
    )
    s = re.sub(r"\bMULTISET\s*<\s*([^>]+?)\s*>", r"MAP<\1, INT>", s,
               flags=re.IGNORECASE)
    s = re.sub(r"\bRAW\b|\bBYTES\b", "BINARY", s, flags=re.IGNORECASE)
    s = re.sub(r"\bNUMERIC\b|\bDEC\b(?!IMAL)", "DECIMAL", s, flags=re.IGNORECASE)
    return s


@dataclass
class CatalogTable:
    name: str
    fmt: str
    path: str
    schema_ddl: str | None
    watermark: tuple[str, str] | None = None  # (col, "10 seconds")
    computed: list[tuple[str, str]] = field(default_factory=list)  # (name, expr)
    props: dict = field(default_factory=dict)  # full WITH (...) options
    partitions: list[str] = field(default_factory=list)  # PARTITIONED BY cols


class Table:
    """Thin fluent wrapper: every verb returns a new Table over a DataFrame.
    Accepts either SQL expression strings or pyspark Columns."""

    def __init__(self, df: DataFrame, env: "TableEnvironment"):
        self._df = df
        self._env = env

    # -- conversions ---------------------------------------------------------
    def to_df(self) -> DataFrame:
        return self._df

    def to_pandas(self):
        return self._df.toPandas()

    def execute(self):
        return self  # Spark is lazy; collect() below materializes

    def collect(self):
        return self._df.collect()

    def print_schema(self) -> None:
        self._df.printSchema()

    def explain(self, mode: str = "formatted") -> None:
        self._df.explain(mode)

    # -- relational verbs (Table.java names) --------------------------------
    def _wrap(self, df: DataFrame) -> "Table":
        return Table(df, self._env)

    def select(self, *exprs) -> "Table":
        cols = [F.expr(e) if isinstance(e, str) else e for e in exprs]
        return self._wrap(self._df.select(*cols))

    def add_columns(self, **named_exprs) -> "Table":
        df = self._df
        for name, e in named_exprs.items():
            df = df.withColumn(name, F.expr(e) if isinstance(e, str) else e)
        return self._wrap(df)

    def rename_columns(self, **renames) -> "Table":
        df = self._df
        for old, new in renames.items():
            df = df.withColumnRenamed(old, new)
        return self._wrap(df)

    def drop_columns(self, *names) -> "Table":
        return self._wrap(self._df.drop(*names))

    def filter(self, predicate) -> "Table":
        p = F.expr(predicate) if isinstance(predicate, str) else predicate
        return self._wrap(self._df.filter(p))

    where = filter

    def group_by(self, *keys) -> "GroupedTable":
        return GroupedTable(self._df, [k if isinstance(k, str) else k for k in keys], self._env)

    def order_by(self, *exprs) -> "Table":
        cols = [F.expr(e) if isinstance(e, str) else e for e in exprs]
        return self._wrap(self._df.orderBy(*cols))

    def fetch(self, n: int) -> "Table":
        return self._wrap(self._df.limit(n))

    limit = fetch

    def offset(self, n: int) -> "Table":
        return self._wrap(self._df.offset(n))

    def distinct(self) -> "Table":
        return self._wrap(self._df.distinct())

    def _join(self, right: "Table", on: str | None, how: str) -> "Table":
        if on is None:
            return self._wrap(self._df.crossJoin(right._df))
        return self._wrap(self._df.join(right._df, F.expr(on) if isinstance(on, str) else on, how))

    def join(self, right, on=None, how: str = "inner") -> "Table":
        if isinstance(right, _AppliedTemporalTableFunction):
            return self._temporal_join(right, on)
        return self._join(right, on, how)

    def left_outer_join(self, right: "Table", on=None) -> "Table":
        return self._join(right, on, "left")

    def right_outer_join(self, right: "Table", on=None) -> "Table":
        return self._join(right, on, "right")

    def full_outer_join(self, right: "Table", on=None) -> "Table":
        return self._join(right, on, "full")

    def union(self, other: "Table") -> "Table":
        return self._wrap(self._df.unionByName(other._df).distinct())

    def union_all(self, other: "Table") -> "Table":
        return self._wrap(self._df.unionByName(other._df))

    def intersect(self, other: "Table") -> "Table":
        return self._wrap(self._df.intersect(other._df))

    def intersect_all(self, other: "Table") -> "Table":
        return self._wrap(self._df.intersectAll(other._df))

    def minus(self, other: "Table") -> "Table":
        return self._wrap(self._df.exceptAll(other._df).distinct())

    def minus_all(self, other: "Table") -> "Table":
        return self._wrap(self._df.exceptAll(other._df))

    # -- row-level function verbs (PyFlink Table.map/flat_map) --------------
    def map(self, fn, output_type: str | None = None) -> "Table":  # noqa: A003
        """Table.map: a SQL projection string (fast path) or a Python
        callable over row dicts via Arrow-batched mapInPandas
        (PyFlink Table.map with a general/vectorized function)."""
        if isinstance(fn, str):
            return self.select(*[e.strip() for e in fn.split(",")])
        if output_type is None:
            raise ValueError("map(callable) needs output_type (DDL schema)")
        import pandas as pd  # noqa: PLC0415

        cols = list(self._df.columns)
        out_names = [f.split()[0].strip("`") for f in output_type.split(",")]

        def run(batches):
            for pdf in batches:
                recs = []
                for rec in pdf.to_dict("records"):
                    out = fn({c: rec[c] for c in cols})
                    if not isinstance(out, dict):
                        out = dict(
                            zip(out_names, out if isinstance(out, tuple) else (out,))
                        )
                    recs.append(out)
                yield pd.DataFrame(recs, columns=out_names)

        return self._wrap(self._df.mapInPandas(run, output_type))

    def flat_map(self, fn, output_type: str) -> "Table":
        """Table.flatMap: callable yields 0..n output rows per input row."""
        import pandas as pd  # noqa: PLC0415

        cols = list(self._df.columns)
        out_names = [f.split()[0].strip("`") for f in output_type.split(",")]

        def run(batches):
            for pdf in batches:
                recs = []
                for rec in pdf.to_dict("records"):
                    for out in fn({c: rec[c] for c in cols}):
                        if not isinstance(out, dict):
                            out = dict(
                                zip(out_names, out if isinstance(out, tuple) else (out,))
                            )
                        recs.append(out)
                yield pd.DataFrame(recs, columns=out_names)

        return self._wrap(self._df.mapInPandas(run, output_type))

    # -- windows (Table.window / Table.over_window, PyFlink table.py) -------
    def window(self, group_window: "GroupWindow") -> "GroupWindowedTable":
        """table.window(Tumble.over('1 hour').on('ts').alias('w'))
        (Table.java window(GroupWindow), PyFlink Table.window)."""
        return GroupWindowedTable(self, group_window)

    def over_window(self, over: "OverWindow") -> "OverWindowedTable":
        """table.over_window(Over.partition_by('k').order_by('ts')
        .preceding('unbounded_row').alias('w')) (Table.java
        window(OverWindow...), PyFlink Table.over_window)."""
        return OverWindowedTable(self, over)

    # -- temporal table function (Table.java:133) ---------------------------
    def create_temporal_table_function(
        self, time_attr: str, primary_key: str
    ) -> "TemporalTableFunction":
        """Table.createTemporalTableFunction parity: this table becomes a
        versioned table keyed by `primary_key` with version time
        `time_attr`; applying the returned function to the probe side's
        time attribute inside `join` runs the event-time as-of join
        (TemporalRowTimeJoinOperator semantics via `asof_join`)."""
        return TemporalTableFunction(self, time_attr, primary_key)

    def join_lateral(self, applied: "_AppliedTemporalTableFunction", on: str) -> "Table":
        """Flink's `orders.joinLateral(rates(o_rowtime), "o_cur = r_cur")`
        verb for temporal table functions (also reachable via join())."""
        return self._temporal_join(applied, on)

    def _temporal_join(self, applied: "_AppliedTemporalTableFunction", on: str) -> "Table":
        from flink_parent_spark.operators.joins import asof_join  # noqa: PLC0415

        em = re.match(r"\s*(\w+)\s*=\s*(\w+)\s*$", on or "")
        if not em:
            raise ValueError(
                "temporal table function join needs a single equality "
                "condition 'left_key = right_key'"
            )
        a, b = em.group(1), em.group(2)
        right = applied.fn.table._df
        # accept the condition in either order
        lkey, rkey = (a, b) if b in right.columns else (b, a)
        payload = [
            c for c in right.columns
            if c not in (rkey, applied.fn.time_attr)
        ]
        out = asof_join(
            self._df,
            right,
            keys=[(lkey, rkey)],
            left_ts=applied.left_time_attr,
            right_ts=applied.fn.time_attr,
            right_payload=payload,
        )
        return self._wrap(out)


class StatementSet:
    """Collected INSERT statements executed together (StatementSetImpl —
    on Spark each insert is an independent batch write, so 'one unit'
    means sequential execution with a single call site; a failed statement
    stops the set)."""

    def __init__(self, env: "TableEnvironment"):
        self._env = env
        self._stmts: list[str] = []

    def add_insert_sql(self, stmt: str) -> "StatementSet":
        if not re.match(r"\s*INSERT\s+(INTO|OVERWRITE)\b", stmt, re.IGNORECASE):
            raise ValueError("StatementSet accepts INSERT statements only")
        self._stmts.append(stmt)
        return self

    def execute(self) -> None:
        for stmt in self._stmts:
            self._env.execute_sql(stmt)
        self._stmts = []


class TemporalTableFunction:
    """The value returned by create_temporal_table_function: call it with
    the probe side's time attribute to apply it in a join."""

    def __init__(self, table: Table, time_attr: str, primary_key: str):
        self.table, self.time_attr, self.primary_key = table, time_attr, primary_key

    def __call__(self, left_time_attr: str) -> "_AppliedTemporalTableFunction":
        return _AppliedTemporalTableFunction(self, left_time_attr)


class _AppliedTemporalTableFunction:
    def __init__(self, fn: TemporalTableFunction, left_time_attr: str):
        self.fn, self.left_time_attr = fn, left_time_attr


class GroupedTable:
    def __init__(self, df: DataFrame, keys, env):
        self._df, self._keys, self._env = df, keys, env

    def select(self, *agg_exprs) -> Table:
        # grouping keys come back automatically from groupBy().agg();
        # tolerate Flink-style selects that re-list them.
        keys = {k for k in self._keys if isinstance(k, str)}
        cols = [
            F.expr(e) if isinstance(e, str) else e
            for e in agg_exprs
            if not (isinstance(e, str) and e.strip() in keys)
        ]
        return Table(self._df.groupBy(*self._keys).agg(*cols), self._env)

    def aggregate(self, fn, output_type: str) -> Table:
        """GroupedTable.aggregate (PyFlink AggregateFunction path): the
        callable maps (key tuple, group pandas frame) -> ONE output row
        dict; key columns are prepended automatically."""
        return self._apply(fn, output_type, single_row=True)

    def flat_aggregate(self, fn, output_type: str) -> Table:
        """GroupedTable.flat_aggregate (TableAggregateFunction /
        FlatAggregateTable.java): the callable emits 0..n output rows per
        group as a pandas frame or list of dicts."""
        return self._apply(fn, output_type, single_row=False)

    def _apply(self, fn, output_type: str, single_row: bool) -> Table:
        import pandas as pd  # noqa: PLC0415

        dt = dict(self._df.dtypes)
        key_ddl = ", ".join(f"`{k}` {dt[k]}" for k in self._keys)
        schema = f"{key_ddl}, {output_type}" if key_ddl else output_type
        keys = list(self._keys)

        def per_key(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            out = fn(key, pdf)
            if isinstance(out, dict):
                out = [out]
            out = pd.DataFrame(out) if not isinstance(out, pd.DataFrame) else out
            if single_row and len(out) != 1:
                raise ValueError(
                    f"aggregate() must emit exactly one row, got {len(out)}"
                )
            out = out.copy()
            for i, k in enumerate(keys):
                out.insert(i, k, key[i])
            return out

        return Table(
            self._df.groupBy(*keys).applyInPandas(per_key, schema), self._env
        )


class GroupWindow:
    """Fluent group-window descriptors (PyFlink pyflink/table/window.py:
    Tumble/Slide/Session .over/.every/.with_gap/.on/.alias) lowered onto
    Spark's window()/session_window()."""

    def __init__(self, kind: str):
        self.kind = kind
        self.size: str | None = None
        self.slide: str | None = None
        self.time_col: str | None = None
        self.name = "w"

    def on(self, time_col: str) -> "GroupWindow":
        self.time_col = time_col
        return self

    def alias(self, name: str) -> "GroupWindow":
        self.name = name
        return self

    def _spark_window(self) -> "F.Column":
        if self.kind == "session":
            return F.session_window(self.time_col, self.size)
        if self.kind == "slide":
            return F.window(self.time_col, self.size, self.slide)
        return F.window(self.time_col, self.size)


class Tumble:
    @staticmethod
    def over(size: str) -> GroupWindow:
        w = GroupWindow("tumble")
        w.size = size
        return w


class Slide:
    @staticmethod
    def over(size: str) -> GroupWindow:
        w = GroupWindow("slide")
        w.size = size
        return w


# PyFlink's Slide.over(...).every(...): attach as a method on GroupWindow
def _every(self: GroupWindow, slide: str) -> GroupWindow:
    self.slide = slide
    return self


GroupWindow.every = _every  # type: ignore[attr-defined]


class Session:
    @staticmethod
    def with_gap(gap: str) -> GroupWindow:
        w = GroupWindow("session")
        w.size = gap
        return w


class GroupWindowedTable:
    """table.window(Tumble.over(...).on(...).alias("w")) result — group_by
    must include the window alias (PyFlink GroupWindowedTable.group_by)."""

    def __init__(self, table: Table, window: GroupWindow):
        self._table, self._window = table, window

    def group_by(self, *keys: str) -> "WindowGroupedTable":
        names = [k.strip() for k in keys]
        if self._window.name not in names:
            raise ValueError(
                f"group_by must include the window alias '{self._window.name}'"
            )
        keys_wo_window = [k for k in names if k != self._window.name]
        return WindowGroupedTable(self._table, self._window, keys_wo_window)


class WindowGroupedTable:
    def __init__(self, table: Table, window: GroupWindow, keys: list[str]):
        self._table, self._window, self._keys = table, window, keys

    def select(self, *exprs: str) -> Table:
        """Aggregate select; `<alias>.start` / `<alias>.end` /
        `<alias>.rowtime` project the window bounds (rowtime = end - 1ms,
        Flink's window rowtime attribute)."""
        w = self._window
        grouped = self._table._df.groupBy(
            w._spark_window().alias("__gw"), *self._keys
        )
        keyset = set(self._keys)
        aggs, posts = [], []
        for e in exprs:
            s = e.strip()
            low = s.lower()
            if low == f"{w.name}.start":
                posts.append(F.col("__gw.start").alias(f"{w.name}_start"))
            elif low == f"{w.name}.end":
                posts.append(F.col("__gw.end").alias(f"{w.name}_end"))
            elif low == f"{w.name}.rowtime":
                posts.append(
                    (F.col("__gw.end") - F.expr("INTERVAL 1 MILLISECOND")).alias(
                        f"{w.name}_rowtime"
                    )
                )
            elif s in keyset:
                posts.append(F.col(s))
            else:
                aggs.append(F.expr(s))
        out = grouped.agg(*aggs) if aggs else grouped.count().drop("count")
        agg_names = [
            c for c in out.columns if c != "__gw" and c not in self._keys
        ]
        return Table(
            out.select(*posts, *[F.col(c) for c in agg_names]),
            self._table._env,
        )

    def flat_aggregate(self, fn, output_type: str) -> Table:
        """Windowed TableAggregateFunction (flink-table-planner-blink
        StreamExecGroupWindowTableAggregate.scala: a table aggregate
        evaluated per GROUP WINDOW, emitting 0..n rows per window group).

        `fn(key_tuple, pdf) -> DataFrame | list[dict]` receives the
        non-window grouping keys and the window's rows; the window bounds
        are prepended to every emitted row as `<alias>_start` /
        `<alias>_end`. Runs as one Arrow-batched applyInPandas over
        groupBy(window, keys) — the window expression shares the group
        shuffle exactly like the scalar select() path."""
        import pandas as pd  # noqa: PLC0415

        w = self._window
        df = self._table._df
        dt = dict(df.dtypes)
        key_ddl = ", ".join(f"`{k}` {dt[k]}" for k in self._keys)
        schema = f"`{w.name}_start` timestamp, `{w.name}_end` timestamp"
        if key_ddl:
            schema += f", {key_ddl}"
        schema += f", {output_type}"
        keys = list(self._keys)

        def per_key(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
            out = fn(key[1:], pdf)
            if isinstance(out, dict):
                out = [out]
            out = (
                pd.DataFrame(out) if not isinstance(out, pd.DataFrame) else out
            )
            out = out.copy()
            win = key[0]  # the window struct: a {'start','end'} mapping
            ws, we = (
                (win["start"], win["end"])
                if isinstance(win, dict)
                else (win[0], win[1])
            )
            out.insert(0, f"{w.name}_start", ws)
            out.insert(1, f"{w.name}_end", we)
            for i, k in enumerate(keys):
                out.insert(2 + i, k, key[1 + i])
            return out

        grouped = df.groupBy(w._spark_window().alias("__gw"), *keys)
        return Table(grouped.applyInPandas(per_key, schema), self._table._env)


class Over:
    """Fluent OVER-window descriptor (PyFlink Over.partition_by(...)
    .order_by(...).preceding(...).alias("w")); select() compiles to one
    SQL WINDOW clause so Catalyst plans the frames."""

    @staticmethod
    def partition_by(*cols: str) -> "OverWindow":
        w = OverWindow()
        w.parts = list(cols)
        return w

    @staticmethod
    def order_by(col: str) -> "OverWindow":
        return OverWindow().order_by(col)


class OverWindow:
    def __init__(self):
        self.parts: list[str] = []
        self.order: str | None = None
        self.frame: str = (
            "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        )
        self.name = "w"

    def order_by(self, col: str) -> "OverWindow":
        self.order = col
        return self

    def preceding(self, spec: str) -> "OverWindow":
        # 'unbounded_range' | 'unbounded_row' | '<n> rows' | 'interval ...'
        s = spec.strip().lower()
        if s == "unbounded_range":
            self.frame = "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        elif s == "unbounded_row":
            self.frame = "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
        elif s.endswith("rows"):
            n = s.split()[0]
            self.frame = f"ROWS BETWEEN {n} PRECEDING AND CURRENT ROW"
        else:
            self.frame = f"RANGE BETWEEN {spec} PRECEDING AND CURRENT ROW"
        return self

    def alias(self, name: str) -> "OverWindow":
        self.name = name
        return self


class OverWindowedTable:
    def __init__(self, table: Table, window: OverWindow):
        self._table, self._window = table, window

    def select(self, *exprs: str) -> Table:
        """Each expr may use `OVER <alias>` (e.g. 'SUM(v) OVER w AS s');
        plain columns pass through."""
        import uuid as _uuid  # noqa: PLC0415

        w = self._window
        view = f"__over_{_uuid.uuid4().hex[:8]}"
        self._table._df.createOrReplaceTempView(view)
        spec = []
        if w.parts:
            spec.append("PARTITION BY " + ", ".join(w.parts))
        if w.order:
            spec.append(f"ORDER BY {w.order}")
        spec.append(w.frame)
        sql = (
            f"SELECT {', '.join(exprs)} FROM {view} "
            f"WINDOW {w.name} AS ({' '.join(spec)})"
        )
        return Table(self._table._env.spark.sql(sql), self._table._env)


class _PassthroughCatalog:
    """USE-able marker catalog for CREATE CATALOG types whose tables
    already live in Spark's session catalog (hive / generic_in_memory):
    register_all is a no-op because there is nothing to materialize."""

    def __init__(self, name: str):
        self.name = name

    def register_all(self):
        return []


class CoreModule:
    """Flink's core module (table/module/CoreModule.java, the instance
    ModuleManager.java:53 pre-loads): on Spark its function set IS the
    session registry — Spark built-ins plus the registered Flink-residue
    SQL UDFs (functions/registry.py). There is no second resolution path
    to merge, which is exactly why the reference's core+hive module split
    collapses to one module here (Spark's built-ins are HiveQL's)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark

    def list_functions(self) -> "list[str]":
        return [f.name for f in self.spark.catalog.listFunctions()]


class TableEnvironment:
    """create() -> execute_sql DDL -> sql_query / from_path, batch or
    streaming mode (Flink's EnvironmentSettings split)."""

    def __init__(self, spark: SparkSession, streaming: bool = False):
        self.spark = apply_runtime_confs(spark)
        self.streaming = streaming
        self.catalog: dict[str, CatalogTable] = {}
        # FLIP-68 module registry: load-ordered, 'core' pre-loaded
        # (ModuleManager.java:50-55)
        self._modules: dict[str, object] = {"core": CoreModule(spark)}
        # TableConfig subset (TableConfigOptions.java) — reference defaults
        self.config: dict[str, str] = {
            "table.dynamic-table-options.enabled": "false",
        }
        self._functions: dict[str, str] = {}   # SQL-registered UDF name -> ref
        # registerFunction() registry for MATCH_RECOGNIZE expressions:
        # name -> (kind, callable, result_dtype)
        self._mr_udfs: dict[str, tuple] = {}
        self._view_props: dict[str, dict] = {}  # ALTER VIEW SET metadata
        self._catalogs: dict[str, object] = {}  # registerCatalog objects
        self.current_catalog = "default_catalog"
        register_flink_functions(spark)

    def get_config(self) -> dict[str, str]:
        """TableEnvironment.getConfig parity (mutate entries to configure)."""
        return self.config

    def window_emit_strategy(self, is_session_window: bool = False):
        """The group-window emit strategy configured through this
        environment's table.exec.emit.* keys (WindowEmitStrategy.scala;
        see flink_parent_spark.streaming.emit for the Spark mapping)."""
        from flink_parent_spark.streaming.emit import (  # noqa: PLC0415
            WindowEmitStrategy,
        )

        return WindowEmitStrategy.from_config(
            self.config, is_session_window=is_session_window
        )

    @staticmethod
    def create(streaming: bool = False, spark: SparkSession | None = None) -> "TableEnvironment":
        return TableEnvironment(spark or get_spark(), streaming)

    # -- DDL -----------------------------------------------------------------
    def execute_sql(self, stmt: str):
        """Statement dispatcher (TableEnvironmentImpl.executeSql:686
        dispatches ~20 Operation kinds; the ones meaningful on Spark are
        handled here, the rest pass through to spark.sql)."""
        s = stmt.strip().rstrip(";")
        lm = _CREATE_LIKE_RE.match(s)
        if lm:
            return self._create_table_like(lm)
        # CREATE TABLE ... PARTITIONED BY (c, ...) WITH (...): lift the
        # partition clause out first — _CREATE_RE's greedy cols group
        # would otherwise swallow it (SqlCreateTable.java's partitionKeyList
        # sits between the column block and the property list).
        pb = re.search(
            r"\)\s*PARTITIONED\s+BY\s*\((?P<parts>[^)]*)\)\s*(?=WITH\s*\()",
            s,
            re.IGNORECASE,
        )
        partitions: list[str] = []
        if pb and re.match(r"CREATE\s", s, re.IGNORECASE):
            partitions = [
                c.strip().strip("`")
                for c in pb.group("parts").split(",")
                if c.strip()
            ]
            s = s[: pb.start() + 1] + " " + s[pb.end():]
        m = _CREATE_RE.match(s)
        if m:
            return self._create_table(m, partitions=partitions)
        vm = re.match(
            r"CREATE\s+(?P<orr>OR\s+REPLACE\s+)?(?P<tmp>TEMPORARY\s+)?VIEW\s+(?P<rest>.+)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if vm:
            # Flink's CREATE VIEW registers into the session's catalog
            # (CreateViewOperation); our DDL tables ARE temp views, and
            # Spark's persistent CREATE VIEW refuses to reference
            # temporary objects — so the session-faithful mapping is a
            # TEMPORARY view either way.
            return self.spark.sql(
                "CREATE "
                + ("OR REPLACE " if vm.group("orr") else "")
                + "TEMPORARY VIEW "
                + vm.group("rest")
            )
        dfm = re.match(
            r"DROP\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+"
            r"(?P<ife>IF\s+EXISTS\s+)?(?P<name>[\w.]+)$",
            s,
            re.IGNORECASE,
        )
        if dfm:
            # SqlDropFunction: env-registered (temporary) functions drop
            # via Spark's DROP TEMPORARY FUNCTION; persistent names pass
            # through unchanged
            name = dfm.group("name")
            if name in self._functions:
                self.spark.sql(f"DROP TEMPORARY FUNCTION IF EXISTS {name}")
                del self._functions[name]
                return None
            # Spark's parser has no SYSTEM keyword — strip it so the
            # pass-through actually drops (a DROP TEMPORARY SYSTEM
            # FUNCTION IF EXISTS must not silently skip the drop)
            passthrough = re.sub(r"\bSYSTEM\s+", "", s, flags=re.IGNORECASE)
            try:
                return Table(self.spark.sql(passthrough), self)
            except Exception:
                if dfm.group("ife"):
                    return None
                # a TEMPORARY function created through Spark directly
                return Table(
                    self.spark.sql(f"DROP TEMPORARY FUNCTION {name}"), self
                )
        if re.match(r"INSERT\s+(INTO|OVERWRITE)\b", s, re.IGNORECASE):
            # the INSERT's query part speaks the full dialect: MR
            # fragments splice out first (RichSqlInsert wraps an ordinary
            # query operation in the reference), the rest of the dialect
            # (TUMBLE/HOP/SESSION, rank idioms) rewrites inside
            # _insert_into via sql_query
            masked_ins = _mask_quotes_comments(s)
            while re.search(r"\bMATCH_RECOGNIZE\s*\(", masked_ins, re.IGNORECASE):
                from flink_parent_spark.streaming.match_recognize_sql import (  # noqa: PLC0415
                    find_match_recognize_fragment,
                )

                frag = find_match_recognize_fragment(s, masked_ins)
                if frag is None:
                    break
                s = self._splice_match_recognize(s, frag)
                masked_ins = _mask_quotes_comments(s)
            return self._insert_into(s)
        if re.match(r"SHOW\s+TABLES$", s, re.IGNORECASE):
            return self._show_tables()
        em = re.match(r"EXPLAIN\s+PLAN\s+FOR\s+(?P<q>.+)$", s, re.IGNORECASE | re.DOTALL)
        if em:
            # Flink's EXPLAIN PLAN FOR syntax -> the Spark plan string
            plan = self.explain_sql(em.group("q"))
            return Table(
                self.spark.createDataFrame([(plan,)], "plan string"), self
            )
        sc = re.match(r"SHOW\s+CREATE\s+TABLE\s+(\w+)$", s, re.IGNORECASE)
        if sc and sc.group(1) in self.catalog:
            entry = self.catalog[sc.group(1)]
            props = ", ".join(
                f"'{k}' = '{v}'" for k, v in entry.props.items()
                if not k.startswith("__")
            )
            parts = [entry.schema_ddl or ""]
            parts += [f"{n} AS {e}" for n, e in entry.computed]
            if entry.watermark:
                col, spec = entry.watermark
                n_, unit = spec.split()
                parts.append(
                    f"WATERMARK FOR {col} AS {col} - INTERVAL '{n_}' {unit.upper()}"
                )
            pb = (
                f" PARTITIONED BY ({', '.join(entry.partitions)})"
                if entry.partitions
                else ""
            )
            ddl = (
                f"CREATE TABLE {entry.name} ("
                + ", ".join(p for p in parts if p)
                + f"){pb} WITH ({props})"
            )
            return Table(
                self.spark.createDataFrame([(ddl,)], "`create table` string"),
                self,
            )
        dm = re.match(r"(?:DESCRIBE|DESC)\s+(?:TABLE\s+)?(\w+)$", s, re.IGNORECASE)
        if dm:
            return self._describe(dm.group(1))
        dr = re.match(
            r"DROP\s+(?:TEMPORARY\s+)?TABLE\s+(?P<ife>IF\s+EXISTS\s+)?(?P<t>\w+)$",
            s,
            re.IGNORECASE,
        )
        if dr:
            # ValidationException on a missing name without IF EXISTS
            # (TableEnvironmentImpl dropTemporaryTable / Catalog.dropTable)
            name = dr.group("t")
            in_ddl = name in self.catalog
            in_spark = self.spark.catalog.tableExists(name)
            if not in_ddl and not in_spark and not dr.group("ife"):
                raise ValueError(f"DROP TABLE: table {name} does not exist")
            if in_ddl:
                self.catalog.pop(name, None)
                self.spark.catalog.dropTempView(name)
                return None
            if in_spark:
                # a table created directly through Spark (metastore/managed
                # or temp-view): actually drop it rather than no-op — temp
                # views via dropTempView, catalog tables via pass-through
                if not self.spark.catalog.dropTempView(name):
                    ife = "IF EXISTS " if dr.group("ife") else ""
                    self.spark.sql(f"DROP TABLE {ife}{name}")
            return None
        fm = re.match(
            r"CREATE\s+(?P<orr>OR\s+REPLACE\s+)?(?:TEMPORARY\s+)?(?:SYSTEM\s+)?"
            r"FUNCTION\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?(?P<name>[\w.]+)\s+"
            r"AS\s+'(?P<ref>[^']+)'"
            r"(?:\s+LANGUAGE\s+(?P<lang>\w+))?$",
            s,
            re.IGNORECASE,
        )
        if fm:
            # duplicate function names: no-op under IF NOT EXISTS,
            # replace under OR REPLACE, error otherwise
            # (FunctionAlreadyExistException parity)
            if fm.group("name") in self._functions:
                if fm.group("ine"):
                    return None
                if not fm.group("orr"):
                    raise ValueError(
                        f"function {fm.group('name')} already exists "
                        "(use IF NOT EXISTS or OR REPLACE)"
                    )
            return self._create_function(
                fm.group("name"), fm.group("ref"), (fm.group("lang") or "").upper()
            )
        afm = re.match(
            r"ALTER\s+(?:TEMPORARY\s+)?(?:SYSTEM\s+)?FUNCTION\s+"
            r"(?P<ife>IF\s+EXISTS\s+)?(?P<name>[\w.]+)\s+AS\s+'(?P<ref>[^']+)'"
            r"(?:\s+LANGUAGE\s+(?P<lang>\w+))?$",
            s,
            re.IGNORECASE,
        )
        if afm:
            # ALTER FUNCTION (SqlAlterFunction.java:82-101 unparse shape;
            # TableEnvironmentImpl's AlterCatalogFunctionOperation): the
            # function must already exist, then the new ref replaces it —
            # same registration path as CREATE FUNCTION.
            name = afm.group("name")
            known = name in self._functions or self.spark.catalog.functionExists(name)
            if not known:
                if afm.group("ife"):
                    return None
                raise ValueError(f"ALTER FUNCTION: unknown function {name}")
            return self._create_function(
                name, afm.group("ref"), (afm.group("lang") or "").upper()
            )
        am = re.match(
            r"ALTER\s+TABLE\s+(\w+)\s+(.+)$", s, re.IGNORECASE | re.DOTALL
        )
        if am:
            return self._alter_table(am.group(1), am.group(2).strip())
        spm = re.match(
            r"SHOW\s+PARTITIONS\s+(\w+)(?:\s+PARTITION\s*\((?P<spec>[^)]*)\))?$",
            s,
            re.IGNORECASE,
        )
        if spm and spm.group(1) in self.catalog:
            return self._show_partitions(spm.group(1), spm.group("spec"))
        ccm = re.match(
            r"CREATE\s+CATALOG\s+(?:IF\s+NOT\s+EXISTS\s+)?(?P<name>\w+)\s+"
            r"WITH\s*\((?P<props>.*)\)$",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if ccm:
            return self._create_catalog(
                ccm.group("name"),
                {
                    p.group("k"): p.group("v")
                    for p in _PROP_RE.finditer(ccm.group("props"))
                },
            )
        dcm = re.match(
            r"DROP\s+CATALOG\s+(?P<ife>IF\s+EXISTS\s+)?(?P<name>\w+)$",
            s,
            re.IGNORECASE,
        )
        if dcm:
            return self._drop_catalog(
                dcm.group("name"), if_exists=bool(dcm.group("ife"))
            )
        dct = re.match(r"(?:DESCRIBE|DESC)\s+CATALOG\s+(\w+)$", s, re.IGNORECASE)
        if dct:
            # SqlDescribeCatalog.java (dql/): info rows about a registered
            # catalog — name and implementation type
            name = dct.group(1)
            if name == "default_catalog" and name not in self._catalogs:
                rows = [("name", name), ("type", "generic_in_memory")]
            elif name in self._catalogs:
                cat = self._catalogs[name]
                ctype = {
                    "JdbcCatalog": "jdbc",
                    "_PassthroughCatalog": "session",
                }.get(type(cat).__name__, type(cat).__name__)
                rows = [("name", name), ("type", ctype)]
            else:
                raise ValueError(f"unknown catalog: {name}")
            return Table(
                self.spark.createDataFrame(
                    rows, "info_name string, info_value string"
                ),
                self,
            )
        avm = re.match(
            r"ALTER\s+VIEW\s+(\w+)\s+(.+)$", s, re.IGNORECASE | re.DOTALL
        )
        if avm:
            return self._alter_view(avm.group(1), avm.group(2).strip())
        # ALTER DATABASE passes through (Spark's SET DBPROPERTIES matches
        # Flink's AlterDatabaseOperation semantics)
        um = re.match(r"USE\s+CATALOG\s+(\w+)$", s, re.IGNORECASE)
        if um:
            return self._use_catalog(um.group(1))
        if re.match(r"SHOW\s+CATALOGS$", s, re.IGNORECASE):
            names = sorted({"default_catalog", *self._catalogs})
            return Table(
                self.spark.createDataFrame(
                    [(n,) for n in names], "catalog_name string"
                ),
                self,
            )
        # CREATE/DROP DATABASE, USE <db>, SHOW DATABASES pass straight
        # through to Spark's session catalog (identical semantics)
        if re.search(
            r"\bMATCH_RECOGNIZE\s*\(", _mask_quotes_comments(s), re.IGNORECASE
        ):
            # executeSql("SELECT ... MATCH_RECOGNIZE ...") takes the same
            # dialect route as sqlQuery (TableEnvironmentImpl.executeSql's
            # QueryOperation branch)
            return self.sql_query(s)
        # plain SQL (SELECT, SHOW VIEWS/FUNCTIONS, DROP VIEW, ...) passes
        # straight through
        return Table(self.spark.sql(s), self)

    def _create_function(self, name: str, ref: str, lang: str):
        """CREATE [TEMPORARY] FUNCTION f AS '<ref>' [LANGUAGE PYTHON]
        (TableEnvironmentImpl.java:686 createFunction dispatch; PyFlink
        registers wrapped python functions, pyflink/table/udf.py:322).

        LANGUAGE PYTHON (or an importable dotted ref): `module.attr` or
        `module:attr` resolves to a pyspark UDF object (pandas_udf/udf —
        the PyFlink wrapped-function shape) or a plain callable, and is
        registered into the session so `sql_query` can call it by name.
        A JVM classpath ref (LANGUAGE JAVA/SCALA or non-importable) passes
        through to Spark's own CREATE FUNCTION."""
        import importlib  # noqa: PLC0415

        if lang in ("JAVA", "SCALA"):
            return self.spark.sql(f"CREATE TEMPORARY FUNCTION {name} AS '{ref}'")
        if ":" in ref:
            mod_name, attr = ref.split(":", 1)
        else:
            mod_name, _, attr = ref.rpartition(".")
        try:
            obj = getattr(importlib.import_module(mod_name), attr)
        except (ImportError, AttributeError, ValueError) as e:
            if lang == "PYTHON":
                raise ValueError(
                    f"CREATE FUNCTION {name}: cannot import python ref "
                    f"{ref!r}: {e}"
                ) from e
            # not importable as python -> treat as a JVM classpath ref
            return self.spark.sql(f"CREATE TEMPORARY FUNCTION {name} AS '{ref}'")
        if not (hasattr(obj, "returnType") or hasattr(obj, "evalType")):
            # a bare callable would silently register with the StringType
            # default and stringify every result — PyFlink makes the result
            # type mandatory for SQL-registered Python UDFs, so do the same
            raise ValueError(
                f"CREATE FUNCTION {name}: {ref!r} resolves to a plain "
                "callable with no declared result type; wrap it with "
                "pyspark.sql.functions.udf/pandas_udf(returnType=...) so "
                "results are not silently stringified"
            )
        self.spark.udf.register(name, obj)
        self._functions[name] = ref
        return None

    def _use_catalog(self, name: str):
        """USE CATALOG c (Flink's catalog switch): the registered catalog
        object (JdbcCatalog / a Hive catalog wrapper) materializes its
        tables into the session — the register_all() workflow."""
        if name == "default_catalog" and name not in self._catalogs:
            # the built-in default catalog is always usable (Flink's
            # GenericInMemoryCatalog registered at startup) — switching
            # back to it must not require register_catalog
            self.current_catalog = name
            return None
        cat = self._catalogs.get(name)
        if cat is None:
            raise ValueError(f"unknown catalog: {name} (register_catalog first)")
        if hasattr(cat, "register_all"):
            cat.register_all()
        self.current_catalog = name
        return None

    def register_catalog(self, name: str, catalog) -> None:
        """TableEnvironment.registerCatalog parity."""
        self._catalogs[name] = catalog

    def _create_catalog(self, name: str, props: "dict[str, str]"):
        """CREATE CATALOG c WITH ('type'='...', ...) (SqlCreateCatalog.java
        :72-86 unparse shape; TableEnvironmentImpl's CreateCatalogOperation
        resolves the 'type' through the CatalogFactory SPI). Supported
        types map onto the existing register_catalog machinery:

        - 'jdbc': the JdbcCatalog (flink-connector-jdbc JdbcCatalogFactory
          options 'base-url', 'username', 'password' + our 'driver');
        - 'generic_in_memory': Flink's default GenericInMemoryCatalog — on
          Spark the session catalog already provides it, so this registers
          a no-op wrapper that simply makes the name USE-able;
        - 'hive': same no-op wrapper IF the session is Hive-enabled
          (Spark's Hive catalog is fixed at session creation and IS the
          session catalog; there is nothing to materialize at USE time)."""
        if name in self._catalogs:
            raise ValueError(f"catalog {name} already exists")
        ctype = props.get("type")
        if ctype == "jdbc":
            from flink_parent_spark.sources.connectors import (  # noqa: PLC0415
                JdbcCatalog,
            )

            url = props.get("base-url") or props.get("url")
            if not url:
                raise ValueError("CREATE CATALOG type=jdbc needs 'base-url'")
            driver = props.get("driver")
            if not driver:
                driver = {
                    "jdbc:derby": "org.apache.derby.jdbc.EmbeddedDriver",
                    "jdbc:postgresql": "org.postgresql.Driver",
                    "jdbc:mysql": "com.mysql.cj.jdbc.Driver",
                }.get(url.split(":", 2)[0] + ":" + url.split(":", 2)[1], "")
            if not driver:
                raise ValueError(
                    "CREATE CATALOG type=jdbc: cannot infer 'driver' from "
                    f"{url!r}; pass it explicitly"
                )
            cat = JdbcCatalog(
                self.spark, name, url, driver,
                username=props.get("username"),
                password=props.get("password"),
            )
        elif ctype in ("generic_in_memory", "hive"):
            if ctype == "hive" and "hive" not in str(
                self.spark.conf.get("spark.sql.catalogImplementation", "in-memory")
            ):
                raise ValueError(
                    "CREATE CATALOG type=hive needs a Hive-enabled session "
                    "(enableHiveSupport at session creation)"
                )
            cat = _PassthroughCatalog(name)
        else:
            raise ValueError(
                f"CREATE CATALOG: unsupported type {ctype!r} "
                "(jdbc, hive, generic_in_memory)"
            )
        self.register_catalog(name, cat)
        return None

    def _drop_catalog(self, name: str, if_exists: bool):
        """DROP CATALOG c (SqlDropCatalog.java): the current catalog cannot
        be dropped (CatalogManager.unregisterCatalog parity)."""
        if name == self.current_catalog:
            raise ValueError(f"cannot drop the current catalog {name}")
        if name not in self._catalogs:
            if if_exists:
                return None
            raise ValueError(f"unknown catalog: {name}")
        del self._catalogs[name]
        return None

    # -- modules (FLIP-68) ---------------------------------------------------
    def load_module(self, name: str, module=None) -> None:
        """TableEnvironment.loadModule (ModuleManager.java:64-77): modules
        are kept in load order; a duplicate name is an error. On Spark the
        function namespace is a single registry whose built-ins subsume
        both the reference's core and hive modules, so a loaded module
        contributes metadata (its name and function listing) rather than a
        second resolution path — `module` may be any object with a
        `list_functions()` -> iterable, or None for a marker-only module
        (the 'hive' case: Spark's built-ins ARE HiveQL's)."""
        if name in self._modules:
            raise ValueError(f"A module with name {name} already exists")
        self._modules[name] = module

    def unload_module(self, name: str) -> None:
        """TableEnvironment.unloadModule (ModuleManager.java:85-92)."""
        if name not in self._modules:
            raise ValueError(f"No module with name {name} exists")
        del self._modules[name]

    def list_modules(self) -> "list[str]":
        """TableEnvironment.listModules (ModuleManager.java:100-102):
        names in load order, 'core' first by construction."""
        return list(self._modules)

    def list_module_functions(self) -> "set[str]":
        """ModuleManager.listFunctions: the union of every loaded module's
        functions. The core module's set is the machine-checked builtin
        registry (functions/registry.py vs BuiltInFunctionDefinitions)."""
        out: set[str] = set()
        for mod in self._modules.values():
            if mod is not None and hasattr(mod, "list_functions"):
                out.update(mod.list_functions())
        return out

    def _show_tables(self) -> Table:
        """SHOW TABLES: DDL catalog entries (including sink-only tables not
        yet materialized) merged with Spark temp views."""
        names = set(self.catalog)
        names.update(r.viewName for r in self.spark.sql("SHOW VIEWS").collect())
        df = self.spark.createDataFrame(
            [(n,) for n in sorted(names)], "table_name string"
        )
        return Table(df, self)

    def _describe(self, name: str) -> Table:
        """DESCRIBE: Flink-style rows (name, type, null, key, extras,
        watermark) — computed columns and the WATERMARK FOR annotation come
        from the DDL catalog entry; physical types from the scan schema."""
        entry = self.catalog.get(name)
        if entry is None:
            return Table(self.spark.sql(f"DESCRIBE {name}"), self)
        dtypes = dict(self.spark.table(name).dtypes)
        computed = dict(entry.computed)
        wm_col, wm_spec = entry.watermark if entry.watermark else (None, None)
        rows = [
            (
                col,
                typ,
                True,
                "",
                f"AS {computed[col]}" if col in computed else "",
                f"`{col}` - INTERVAL '{wm_spec}'" if col == wm_col else "",
            )
            for col, typ in dtypes.items()
        ]
        df = self.spark.createDataFrame(
            rows,
            "name string, type string, `null` boolean, key string, "
            "extras string, watermark string",
        )
        return Table(df, self)

    @staticmethod
    def _parse_cols_block(cols_block: str):
        """Parse a DDL column block into (physical col defs, computed cols,
        watermark, primary key)."""
        watermark = None
        wm = _WATERMARK_RE.search(cols_block)
        if wm:
            unit = wm.group("unit").lower().rstrip("s") + "s"
            watermark = (wm.group("col"), f"{wm.group('n')} {unit}")
        col_defs, computed = [], []
        primary_key: list[str] = []
        for part in _split_top_level(cols_block):
            p = part.strip()
            if not p or p.upper().startswith("WATERMARK"):
                continue
            pkm = re.match(
                r"PRIMARY\s+KEY\s*\(([^)]*)\)", p, re.IGNORECASE
            )
            if pkm:
                primary_key = [c.strip() for c in pkm.group(1).split(",")]
                continue
            cm = re.match(r"(?P<n>\w+)\s+AS\s+(?P<e>.+)", p, re.IGNORECASE)
            if cm and not re.match(r"\w+\s+(AS\s+)?(ROW|MAP|ARRAY)\b", p, re.IGNORECASE):
                computed.append((cm.group("n"), cm.group("e")))
            else:
                # normalize Flink-only types in the TYPE part only (never
                # the column name, which may legitimately be 'time' etc.)
                nm = re.match(r"(?P<n>`?\w+`?)\s+(?P<t>.+)$", p, re.DOTALL)
                if nm:
                    p = f"{nm.group('n')} {normalize_flink_types(nm.group('t'))}"
                col_defs.append(p)
        return col_defs, computed, watermark, primary_key

    def _create_table(self, m: re.Match, partitions: "list[str] | None" = None):
        name = m.group("name")
        if name in self.catalog:
            # TableEnvironmentImpl createTable: an existing table is a
            # no-op under IF NOT EXISTS and TableAlreadyExistException
            # without it — never a silent replace
            if m.groupdict().get("ine"):
                return None
            raise ValueError(f"table {name} already exists (use IF NOT EXISTS)")
        props = {p.group("k"): p.group("v") for p in _PROP_RE.finditer(m.group("props"))}
        col_defs, computed, watermark, primary_key = self._parse_cols_block(
            m.group("cols")
        )
        if primary_key:
            props["__primary_key"] = ",".join(primary_key)
        fmt = props.get("format", props.get("connector", "parquet"))
        if props.get("connector") in ("kafka", "upsert-kafka"):
            fmt = "kafka"
        declared = {d.split()[0].strip("`").lower() for d in col_defs}
        for p in partitions or []:
            # SqlCreateTable.validate: every partition key must be a
            # declared column
            if p.lower() not in declared:
                raise ValueError(
                    f"PARTITIONED BY column {p!r} is not in the table schema"
                )
        entry = CatalogTable(
            name=name,
            fmt=fmt,
            path=props.get("path", ""),
            schema_ddl=", ".join(col_defs) if col_defs else None,
            watermark=watermark,
            computed=computed,
            props=props,
            partitions=list(partitions or []),
        )
        self.catalog[name] = entry
        # register the view immediately so sql_query sees it — in streaming
        # mode the view IS the streaming scan (with the DDL watermark
        # applied), so `sql_query("... GROUP BY TUMBLE(...)")` compiles to a
        # real streaming aggregation, matching the reference where the DDL
        # table is a streaming source by default; sink-only tables (path not
        # materialized yet) stay catalog-only until the first INSERT INTO
        # creates data.
        try:
            self._scan(entry, streaming=self.streaming).createOrReplaceTempView(name)
        except Exception:
            pass
        return None

    def _refresh_view(self, entry: CatalogTable, strict: bool = True) -> None:
        """Re-register a DDL table's temp view from its (possibly altered)
        catalog entry so the next scan honors the change. strict=True
        (the ALTER paths) re-raises scan failures — otherwise an ALTER
        SET to a bad path would 'succeed' while queries silently keep
        reading the stale old view; strict=False tolerates sink-only
        tables with no data yet."""
        try:
            self._scan(entry, streaming=self.streaming).createOrReplaceTempView(
                entry.name
            )
        except Exception:
            if strict:
                raise
            # sink-only tables: no data yet, stay catalog-only

    def _alter_table(self, name: str, rest: str):
        """ALTER TABLE dispatch (TableEnvironmentImpl.java:686
        AlterTableOperation kinds: RENAME, SET properties, ADD schema
        parts). DDL-catalog tables are temp views backed by a CatalogTable
        entry, so plain spark.sql would error AND miss the catalog — the
        entry mutates here and the view re-registers. Non-catalog names
        pass through to Spark's own ALTER TABLE."""
        entry = self.catalog.get(name)
        if entry is None:
            return Table(self.spark.sql(f"ALTER TABLE {name} {rest}"), self)
        # sink-only tables (no data yet -> no view) stay catalog-only after
        # an ALTER; for tables with a live view a failed re-scan must raise
        had_view = self.spark.catalog.tableExists(name)
        rm = re.match(r"RENAME\s+TO\s+(\w+)$", rest, re.IGNORECASE)
        if rm:
            new = rm.group(1)
            if new in self.catalog:
                raise ValueError(f"ALTER TABLE RENAME: {new} already exists")
            self.catalog.pop(name)
            entry.name = new
            self.catalog[new] = entry
            self.spark.catalog.dropTempView(name)
            self._refresh_view(entry, strict=had_view)
            return None
        sm = re.match(r"SET\s*\((.*)\)$", rest, re.IGNORECASE | re.DOTALL)
        if sm:
            props = {
                p.group("k"): p.group("v")
                for p in _PROP_RE.finditer(sm.group(1))
            }
            entry.props.update(props)
            if "path" in props:
                entry.path = props["path"]
            if "format" in props or "connector" in props:
                entry.fmt = entry.props.get(
                    "format", entry.props.get("connector", "parquet")
                )
            self._refresh_view(entry, strict=had_view)
            return None
        ad = re.match(
            r"ADD\s+(?:COLUMNS?\s*)?\((.*)\)$", rest, re.IGNORECASE | re.DOTALL
        ) or re.match(r"ADD\s+COLUMN\s+(.+)$", rest, re.IGNORECASE | re.DOTALL)
        if ad:
            col_defs, computed, watermark, _pk = self._parse_cols_block(
                ad.group(1)
            )
            entry.schema_ddl = ", ".join(
                ([entry.schema_ddl] if entry.schema_ddl else []) + col_defs
            )
            entry.computed = [*entry.computed, *computed]
            if watermark:
                entry.watermark = watermark
            self._refresh_view(entry, strict=had_view)
            return None
        rpm = re.match(
            r"REPLACE\s+COLUMNS\s*\((?P<cols>.*)\)$",
            rest,
            re.IGNORECASE | re.DOTALL,
        )
        if rpm:
            # SqlAddReplaceColumns.java:39,76 (replace=true): the new list
            # REPLACES the existing physical columns wholesale (the
            # Hive-dialect ALTER shape); computed columns and the
            # watermark must keep resolving against the new schema
            col_defs, computed, watermark, _pk = self._parse_cols_block(
                rpm.group("cols")
            )
            if computed or watermark:
                raise ValueError(
                    "REPLACE COLUMNS takes physical columns only"
                )
            new_names = {d.split()[0].strip("`").lower() for d in col_defs}
            if entry.watermark and entry.watermark[0].lower() not in new_names:
                raise ValueError(
                    f"REPLACE COLUMNS drops {entry.watermark[0]!r}, which "
                    "anchors the table watermark"
                )
            for cname, cexpr in entry.computed:
                refs = {
                    w.lower() for w in re.findall(r"\b\w+\b", cexpr)
                }
                missing = {
                    d.split()[0].strip("`").lower()
                    for d in _split_top_level(entry.schema_ddl or "")
                    if d.strip()
                } & refs - new_names
                if missing:
                    raise ValueError(
                        f"REPLACE COLUMNS drops {sorted(missing)}, referenced "
                        f"by computed column {cname!r}"
                    )
            entry.schema_ddl = ", ".join(col_defs)
            self._refresh_view(entry, strict=had_view)
            return None
        apm = re.match(
            r"ADD\s+(?P<ine>IF\s+NOT\s+EXISTS\s+)?"
            r"(?P<specs>(?:PARTITION\s*\([^)]*\)\s*)+)$",
            rest,
            re.IGNORECASE,
        )
        if apm:
            return self._add_partitions(
                entry, apm.group("specs"), bool(apm.group("ine"))
            )
        dpm = re.match(
            r"DROP\s+(?P<ife>IF\s+EXISTS\s+)?"
            r"(?P<specs>(?:PARTITION\s*\([^)]*\)\s*,?\s*)+)$",
            rest,
            re.IGNORECASE,
        )
        if dpm:
            return self._drop_partitions(
                entry, dpm.group("specs"), bool(dpm.group("ife"))
            )
        cm = re.match(
            r"CHANGE\s+(?:COLUMN\s+)?(?P<old>\w+)\s+(?P<def>\w+\s+[^;]+?)"
            r"(?:\s+(?P<first>FIRST)|\s+AFTER\s+(?P<after>\w+))?$",
            rest,
            re.IGNORECASE | re.DOTALL,
        )
        if cm:
            return self._change_column(
                entry,
                cm.group("old"),
                cm.group("def").strip(),
                first=bool(cm.group("first")),
                after=cm.group("after"),
                had_view=had_view,
            )
        acm = re.match(
            r"ADD\s+CONSTRAINT\s+(?P<cname>\w+)\s+PRIMARY\s+KEY\s*"
            r"\((?P<cols>[^)]*)\)\s*(?P<enf>NOT\s+ENFORCED)?$",
            rest,
            re.IGNORECASE,
        )
        if acm:
            # SqlAlterTableAddConstraint: metadata-only, and like the
            # reference (UniqueConstraint.java) only NOT ENFORCED keys are
            # accepted — neither engine enforces uniqueness on write.
            if not acm.group("enf"):
                raise ValueError(
                    "ALTER TABLE ADD CONSTRAINT: only PRIMARY KEY ... NOT "
                    "ENFORCED is supported (the reference rejects enforced "
                    "constraints the same way)"
                )
            if "__primary_key" in entry.props:
                raise ValueError(
                    f"table {name} already has a primary key constraint"
                )
            cols = [c.strip().strip("`") for c in acm.group("cols").split(",")]
            declared = {
                d.split()[0].strip("`").lower()
                for d in _split_top_level(entry.schema_ddl or "")
                if d.strip()
            }
            for c in cols:
                if c.lower() not in declared:
                    raise ValueError(
                        f"ADD CONSTRAINT: column {c!r} not in table schema"
                    )
            entry.props["__primary_key"] = ",".join(cols)
            entry.props["__pk_constraint"] = acm.group("cname")
            return None
        dcm = re.match(
            r"DROP\s+CONSTRAINT\s+(?P<cname>\w+)$", rest, re.IGNORECASE
        )
        if dcm:
            # SqlAlterTableDropConstraint: the named constraint must exist
            have = entry.props.get("__pk_constraint")
            if have != dcm.group("cname"):
                raise ValueError(
                    f"DROP CONSTRAINT: table {name} has no constraint named "
                    f"{dcm.group('cname')!r}"
                    + (f" (its primary key constraint is {have!r})" if have else "")
                )
            entry.props.pop("__pk_constraint", None)
            entry.props.pop("__primary_key", None)
            return None
        raise ValueError(f"unsupported ALTER TABLE clause: {rest!r}")

    _PART_SPEC_RE = re.compile(
        r"(?P<k>\w+)\s*=\s*(?:'(?P<q>[^']*)'|(?P<u>[\w.-]+))"
    )

    def _parse_partition_specs(
        self, entry: CatalogTable, specs_text: str, allow_partial: bool = False
    ) -> "list[dict[str, str]]":
        """Parse one or more PARTITION (k='v', ...) specs and validate
        every key against the table's PARTITIONED BY list (the reference
        validates against the catalog partition keys,
        SqlAddPartitions.java / HiveCatalog partition spec checks).
        allow_partial permits binding a subset of the keys (the INSERT
        static-spec case, where unbound keys stay dynamic)."""
        if not entry.partitions:
            raise ValueError(
                f"table {entry.name} is not partitioned (no PARTITIONED BY)"
            )
        out: list[dict[str, str]] = []
        for block in re.finditer(
            r"PARTITION\s*\(([^)]*)\)", specs_text, re.IGNORECASE
        ):
            spec: dict[str, str] = {}
            for pm in self._PART_SPEC_RE.finditer(block.group(1)):
                k = pm.group("k")
                if k.lower() not in {p.lower() for p in entry.partitions}:
                    raise ValueError(
                        f"{k!r} is not a partition key of {entry.name} "
                        f"(keys: {entry.partitions})"
                    )
                spec[k] = pm.group("q") if pm.group("q") is not None else pm.group("u")
            if not allow_partial and len(spec) != len(entry.partitions):
                raise ValueError(
                    f"partition spec {spec} must bind every partition key "
                    f"{entry.partitions}"
                )
            out.append(spec)
        return out

    def _partition_dir(self, entry: CatalogTable, spec: "dict[str, str]") -> str:
        # hive-style layout in DDL-declared key order, the same layout
        # df.write.partitionBy produces and spark.read partition-discovers
        by_lower = {k.lower(): v for k, v in spec.items()}
        return os.path.join(
            entry.path, *[f"{p}={by_lower[p.lower()]}" for p in entry.partitions]
        )

    def _add_partitions(
        self, entry: CatalogTable, specs_text: str, if_not_exists: bool
    ):
        """ALTER TABLE t ADD [IF NOT EXISTS] PARTITION (spec) [PARTITION
        (spec)]* (SqlAddPartitions.java:81-99 unparse shape). Filesystem
        tables gain the hive-layout directory; an existing partition is an
        error without IF NOT EXISTS (PartitionAlreadyExistsException
        parity)."""
        for spec in self._parse_partition_specs(entry, specs_text):
            d = self._partition_dir(entry, spec)
            if os.path.isdir(d):
                if if_not_exists:
                    continue
                raise ValueError(f"partition already exists: {spec}")
            os.makedirs(d)
        self._refresh_view(entry, strict=False)
        return None

    def _drop_partitions(
        self, entry: CatalogTable, specs_text: str, if_exists: bool
    ):
        """ALTER TABLE t DROP [IF EXISTS] PARTITION (spec)[, PARTITION
        (spec)]* (SqlDropPartitions.java). Drops the partition directory
        AND its data (the reference's drop is data-destructive for managed
        tables too); missing partition is an error without IF EXISTS
        (PartitionNotExistException parity)."""
        import shutil  # noqa: PLC0415

        for spec in self._parse_partition_specs(entry, specs_text):
            d = self._partition_dir(entry, spec)
            if not os.path.isdir(d):
                if if_exists:
                    continue
                raise ValueError(f"partition does not exist: {spec}")
            shutil.rmtree(d)
        self._refresh_view(entry, strict=False)
        return None

    def _show_partitions(self, name: str, spec_text: "str | None" = None) -> "Table":
        """SHOW PARTITIONS t [PARTITION (k=v, ...)] for DDL-catalog
        filesystem tables: list the hive-layout partition directories,
        one row per leaf partition in Spark's `k1=v1/k2=v2` output format
        (ShowPartitionsOperation); a partial spec filters the listing to
        partitions binding those keys to those values."""
        entry = self.catalog[name]
        if not entry.partitions:
            raise ValueError(f"SHOW PARTITIONS: table {name} is not partitioned")
        want: dict[str, str] = {}
        if spec_text:
            keys_lower = {p.lower() for p in entry.partitions}
            for pm in self._PART_SPEC_RE.finditer(spec_text):
                k = pm.group("k")
                if k.lower() not in keys_lower:
                    raise ValueError(
                        f"{k!r} is not a partition key of {name} "
                        f"(keys: {entry.partitions})"
                    )
                want[k.lower()] = (
                    pm.group("q") if pm.group("q") is not None else pm.group("u")
                )
        leaves: list[str] = []

        def walk(base: str, keys: "list[str]", prefix: "list[str]") -> None:
            if not keys:
                leaves.append("/".join(prefix))
                return
            key = keys[0]
            if not os.path.isdir(base):
                return
            for d in sorted(os.listdir(base)):
                if d.startswith(f"{key}="):
                    walk(os.path.join(base, d), keys[1:], [*prefix, d])

        walk(entry.path, entry.partitions, [])
        if want:
            def keeps(leaf: str) -> bool:
                binds = dict(
                    part.split("=", 1) for part in leaf.split("/")
                )
                binds = {k.lower(): v for k, v in binds.items()}
                return all(binds.get(k) == v for k, v in want.items())

            leaves = [p for p in leaves if keeps(p)]
        return Table(
            self.spark.createDataFrame(
                [(p,) for p in leaves], "partition string"
            ),
            self,
        )

    def _change_column(
        self,
        entry: CatalogTable,
        old: str,
        new_def: str,
        first: bool,
        after: "str | None",
        had_view: bool,
    ):
        """ALTER TABLE t CHANGE [COLUMN] old new_name new_type [COMMENT c]
        [FIRST | AFTER col] (SqlChangeColumn.java:95-107): the old column's
        definition is replaced wholesale; FIRST/AFTER reorder. Renames are
        rejected while the column anchors the watermark or a computed
        column (the reference re-validates the schema the same way)."""
        cols = [c.strip() for c in _split_top_level(entry.schema_ddl or "") if c.strip()]
        names = [c.split()[0].strip("`") for c in cols]
        if old not in names:
            raise ValueError(f"CHANGE COLUMN: no column {old!r} in {entry.name}")
        new_name = new_def.split()[0].strip("`")
        if new_name != old:
            if entry.watermark and entry.watermark[0] == old:
                raise ValueError(
                    f"CHANGE COLUMN: {old!r} anchors the table watermark; "
                    "rename is not allowed"
                )
            for cname, cexpr in entry.computed:
                if re.search(rf"\b{re.escape(old)}\b", cexpr):
                    raise ValueError(
                        f"CHANGE COLUMN: {old!r} is referenced by computed "
                        f"column {cname!r}; rename is not allowed"
                    )
        idx = names.index(old)
        cols.pop(idx)
        if first:
            cols.insert(0, new_def)
        elif after is not None:
            rest_names = [c.split()[0].strip("`") for c in cols]
            if after not in rest_names:
                raise ValueError(f"CHANGE COLUMN: AFTER column {after!r} not found")
            cols.insert(rest_names.index(after) + 1, new_def)
        else:
            cols.insert(idx, new_def)
        entry.schema_ddl = ", ".join(cols)
        self._refresh_view(entry, strict=had_view)
        return None

    def _alter_view(self, name: str, rest: str):
        """ALTER VIEW (AlterViewOperation kinds): AS re-defines the view;
        RENAME TO re-registers under the new name; SET (props) records
        view properties as catalog metadata (AlterViewPropertiesOperation
        — properties carry no execution semantics for a view, matching
        the reference). Spark's own ALTER VIEW rejects temp views, so all
        three are handled here."""
        sm = re.match(r"SET\s*\((.*)\)$", rest, re.IGNORECASE | re.DOTALL)
        if sm:
            if name in self.catalog:
                # DDL tables are temp-view-backed so tableExists() is true
                # for them too; the reference rejects ALTER VIEW against a
                # non-view object (ValidationException)
                raise ValueError(f"ALTER VIEW SET: {name} is a table, not a view")
            if not self.spark.catalog.tableExists(name):
                raise ValueError(f"ALTER VIEW SET: unknown view {name}")
            props = {
                p.group("k"): p.group("v") for p in _PROP_RE.finditer(sm.group(1))
            }
            self._view_props.setdefault(name, {}).update(props)
            return None
        qm = re.match(r"AS\s+(.+)$", rest, re.IGNORECASE | re.DOTALL)
        if qm:
            self.spark.sql(qm.group(1)).createOrReplaceTempView(name)
            return None
        rm = re.match(r"RENAME\s+TO\s+(\w+)$", rest, re.IGNORECASE)
        if rm:
            new = rm.group(1)
            if self.spark.catalog.tableExists(new):
                raise ValueError(f"ALTER VIEW RENAME: {new} already exists")
            df = self.spark.table(name)
            df.createOrReplaceTempView(new)
            self.spark.catalog.dropTempView(name)
            if name in self._view_props:
                self._view_props[new] = self._view_props.pop(name)
            return None
        return Table(self.spark.sql(f"ALTER VIEW {name} {rest}"), self)

    def _create_table_like(self, m: re.Match):
        """CREATE TABLE ... LIKE (Flink 1.11, SqlTableLike.java:70-110):
        derive a table from a registered base, merging features per the
        strategies in the LIKE option list. Defaults to INCLUDING ALL;
        per-feature overrides: OPTIONS (INCLUDING fails on conflicting
        duplicate keys, OVERWRITING lets the new table win, EXCLUDING drops
        base options), WATERMARKS / GENERATED (computed columns) /
        CONSTRAINTS (primary key) support INCLUDING/EXCLUDING. New physical
        columns append to the base schema; a new watermark/computed column
        overrides the inherited one."""
        if m.group("name") in self.catalog:
            if m.groupdict().get("ine"):
                return None
            raise ValueError(
                f"table {m.group('name')} already exists (use IF NOT EXISTS)"
            )
        base_name = m.group("base")
        if base_name not in self.catalog:
            raise ValueError(f"LIKE base table not in catalog: {base_name}")
        base = self.catalog[base_name]
        strategies: dict[str, str] = {}
        default = "INCLUDING"
        for part in (m.group("opts") or "").split(","):
            p = part.strip().upper()
            if not p:
                continue
            om = re.match(r"(INCLUDING|EXCLUDING|OVERWRITING)\s+(\w+)", p)
            if not om:
                raise ValueError(f"bad LIKE option: {part.strip()}")
            strat, feature = om.groups()
            if feature == "ALL":
                if strat == "OVERWRITING":
                    # SqlTableLike invalidCombinations:191
                    raise ValueError("LIKE OVERWRITING ALL is not valid")
                default = strat
            else:
                strategies[feature] = strat

        def strat(feature: str) -> str:
            return strategies.get(feature, default)

        # invalid combinations are parse-time validation in the reference
        # (SqlTableLike.validate(), invalidCombinations:191-195) — reject
        # BEFORE any feature merging so they beat e.g. OPTIONS conflicts
        for bad_feature in ("PARTITIONS", "CONSTRAINTS"):
            if strategies.get(bad_feature) == "OVERWRITING":
                raise ValueError(
                    f"LIKE OVERWRITING {bad_feature} is not a valid "
                    "combination (SqlTableLike invalidCombinations)"
                )

        new_props = {
            p.group("k"): p.group("v")
            for p in _PROP_RE.finditer(m.group("props") or "")
        }
        opt_strat = strat("OPTIONS")
        base_props = {
            k: v for k, v in base.props.items() if not k.startswith("__")
        }
        if opt_strat == "EXCLUDING":
            props = dict(new_props)
        elif opt_strat == "OVERWRITING":
            props = {**base_props, **new_props}
        else:  # INCLUDING: duplicate keys with different values are errors
            dup = {
                k for k in base_props.keys() & new_props.keys()
                if base_props[k] != new_props[k]
            }
            if dup:
                raise ValueError(
                    f"LIKE INCLUDING OPTIONS: conflicting keys {sorted(dup)}"
                )
            props = {**base_props, **new_props}

        col_defs, computed, watermark, primary_key = self._parse_cols_block(
            m.group("cols") or ""
        )
        base_cols = _split_top_level(base.schema_ddl) if base.schema_ddl else []
        schema_ddl = ", ".join([*(c.strip() for c in base_cols), *col_defs]) or None
        if watermark is None and strat("WATERMARKS") != "EXCLUDING":
            watermark = base.watermark
        if strat("GENERATED") != "EXCLUDING":
            mine = {n for n, _ in computed}
            computed = [(n, e) for n, e in base.computed if n not in mine] + computed
        if not primary_key and strat("CONSTRAINTS") != "EXCLUDING":
            primary_key = [
                c for c in base.props.get("__primary_key", "").split(",") if c
            ]
        if primary_key:
            props["__primary_key"] = ",".join(primary_key)
        # PARTITIONS feature (SqlTableLike.java:120,150): INCLUDING
        # inherits the base's PARTITIONED BY keys, EXCLUDING drops them;
        # OVERWRITING is an invalid combination in the reference
        # (invalidCombinations:193) and rejected the same way here.
        if strat("PARTITIONS") == "OVERWRITING":
            raise ValueError(
                "LIKE OVERWRITING PARTITIONS is not a valid combination "
                "(SqlTableLike invalidCombinations)"
            )
        # CONSTRAINTS is the third invalid OVERWRITING feature
        # (SqlTableLike invalidCombinations:194-195)
        if strat("CONSTRAINTS") == "OVERWRITING":
            raise ValueError(
                "LIKE OVERWRITING CONSTRAINTS is not a valid combination "
                "(SqlTableLike invalidCombinations)"
            )
        partitions = (
            list(base.partitions) if strat("PARTITIONS") != "EXCLUDING" else []
        )
        fmt = props.get("format", props.get("connector", "parquet"))
        if props.get("connector") in ("kafka", "upsert-kafka"):
            fmt = "kafka"
        entry = CatalogTable(
            name=m.group("name"),
            fmt=fmt,
            path=props.get("path", ""),
            schema_ddl=schema_ddl,
            watermark=watermark,
            computed=computed,
            props=props,
            partitions=partitions,
        )
        self.catalog[entry.name] = entry
        try:
            self._scan(entry, streaming=self.streaming).createOrReplaceTempView(
                entry.name
            )
        except Exception:
            pass
        return None

    def _scan(self, entry: CatalogTable, streaming: bool) -> DataFrame:
        self.spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        if entry.fmt == "kafka":
            return self._scan_kafka(entry, streaming)
        if entry.props.get("connector") == "kinesis":
            # scan half of the kinesis connector (the sink half is the
            # PutRecords path in _insert_into): batch SELECT drains every
            # shard TRIM_HORIZON -> tip over the Kinesis_20131202 JSON
            # API; streaming SELECT uses the checkpoint-offset source
            from flink_parent_spark.sources.kinesis_wire import (  # noqa: PLC0415
                KinesisStreamDataSource,
                kinesis_bounded_read,
            )

            endpoint = entry.props.get("aws.endpoint")
            if not endpoint:
                raise ValueError(
                    "kinesis scan needs 'aws.endpoint' (a localhost stub "
                    "or a sigv4 proxy)"
                )
            stream_name = entry.props.get("stream", entry.name)
            if not entry.schema_ddl:
                raise ValueError("kinesis scan needs a declared schema")
            if streaming:
                self.spark.dataSource.register(KinesisStreamDataSource)
                df = (
                    self.spark.readStream.format("kinesis-stream")
                    .option("endpoint", endpoint)
                    .option("stream", stream_name)
                    .option("schema", entry.schema_ddl)
                    .load()
                )
            else:
                df = kinesis_bounded_read(
                    self.spark, endpoint, stream_name, entry.schema_ddl
                )
            for name_, expr_ in entry.computed:
                df = df.withColumn(name_, F.expr(expr_))
            if streaming and entry.watermark:
                df = df.withWatermark(*entry.watermark)
            return df
        if entry.props.get("connector") == "jdbc":
            # Flink JDBC table options -> Spark JDBC reader (exercised
            # against embedded Derby in tests/test_connectors.py)
            reader = (
                self.spark.read.format("jdbc")
                .option("url", entry.props["url"])
                .option("dbtable", entry.props["table-name"])
            )
            for opt in ("driver", "username", "password"):
                if opt in entry.props:
                    reader = reader.option(
                        {"username": "user"}.get(opt, opt), entry.props[opt]
                    )
            df = reader.load()
            for name_, expr_ in entry.computed:
                df = df.withColumn(name_, F.expr(expr_))
            return df
        fmt = "parquet" if entry.fmt in ("filesystem", "parquet") else entry.fmt
        if streaming:
            from flink_parent_spark.streaming.core import stream_table  # noqa: PLC0415
            import os  # noqa: PLC0415

            df = stream_table(
                self.spark,
                os.path.dirname(entry.path),
                os.path.basename(entry.path).replace(".parquet", ""),
            )
        else:
            reader = self.spark.read
            if entry.schema_ddl and fmt in ("csv", "json"):
                reader = reader.schema(entry.schema_ddl)
            if entry.schema_ddl and fmt == "parquet":
                # schema-evolved tables (ADD/CHANGE/REPLACE COLUMNS) have
                # files with differing footers; without merging, the scan
                # would adopt ONE footer and null out the others' columns.
                # Footer merging is a metadata pass (per-file footers, not
                # data); at warehouse scale the catalog schema itself is
                # authoritative and files are rewritten on evolution.
                reader = reader.option("mergeSchema", "true")
            df = getattr(reader, fmt)(entry.path)
            if entry.schema_ddl:
                # declared columns absent from the files (ALTER TABLE ADD
                # COLUMN after data was written) surface as typed nulls —
                # the reference's catalog schema wins over the file footer
                from pyspark.sql.types import StructType  # noqa: PLC0415

                have = {c.lower() for c in df.columns}
                for fdef in StructType.fromDDL(entry.schema_ddl).fields:
                    if fdef.name.lower() not in have:
                        df = df.withColumn(
                            fdef.name, F.lit(None).cast(fdef.dataType)
                        )
        from flink_parent_spark.tables import normalize_timestamps  # noqa: PLC0415

        base = entry.path.rsplit("/", 1)[-1].replace(".parquet", "")
        df = normalize_timestamps(df, base)
        if entry.schema_ddl:
            # the catalog schema WINS over the file footer in both
            # directions: declared-but-absent columns were added as typed
            # nulls above, and file columns no longer declared (REPLACE
            # COLUMNS / CHANGE away) are projected out here, in declared
            # order
            declared = [
                c.strip().split()[0].strip("`")
                for c in _split_top_level(entry.schema_ddl)
                if c.strip()
            ]
            have = {c.lower(): c for c in df.columns}
            keep = [have[c.lower()] for c in declared if c.lower() in have]
            if keep:
                df = df.select(*keep)
        for name_, expr_ in entry.computed:
            df = df.withColumn(name_, F.expr(expr_))
        if streaming and entry.watermark:
            df = df.withWatermark(*entry.watermark)
        return df

    def _scan_kafka(self, entry: CatalogTable, streaming: bool) -> DataFrame:
        """connector=kafka DDL path (Flink kafka table options → Spark).

        With 'properties.bootstrap.servers' set and no 'path', the real
        `format("kafka")` source is used; with 'path' the file-backed fake
        honors the same (topic, starting offsets) contract, so the full
        DDL → options translation → value decode → watermark chain runs
        end-to-end without a broker (tests/test_connectors.py)."""
        import json  # noqa: PLC0415

        from flink_parent_spark.sources.connectors import (  # noqa: PLC0415
            decode_kafka_json_value,
            kafka_file_source,
            kafka_source,
        )

        topic = entry.props.get("topic", entry.name)
        mode = entry.props.get("scan.startup.mode", "earliest-offset")
        so = {"earliest-offset": "earliest", "latest-offset": "latest"}.get(
            mode, "earliest"
        )
        if mode == "specific-offsets":
            pairs = re.findall(
                r"partition:\s*(\d+)\s*,\s*offset:\s*(\d+)",
                entry.props.get("scan.startup.specific-offsets", ""),
            )
            so = json.dumps({topic: {p: int(o) for p, o in pairs}})
        if entry.props.get("properties.bootstrap.servers") and not entry.path:
            if entry.props.get("fps.transport") == "wire":
                # speak the Kafka wire protocol directly (v0 APIs) — the
                # in-container honesty path; bounded batch drain
                from flink_parent_spark.sources.kafka_wire import (  # noqa: PLC0415
                    kafka_wire_read,
                )

                host, _, port = entry.props[
                    "properties.bootstrap.servers"
                ].partition(":")
                start = 0
                if so not in ("earliest", "latest") and so.startswith("{"):
                    start = int(json.loads(so).get(topic, {}).get("0", 0))
                df = kafka_wire_read(self.spark, host, int(port), topic, start)
                if so == "latest":
                    df = df.filter(F.lit(False))
            else:
                df = kafka_source(
                    self.spark,
                    entry.props["properties.bootstrap.servers"],
                    topic,
                    so,
                    streaming=streaming,
                )
        else:
            df = kafka_file_source(
                self.spark, entry.path, topic, so, streaming=streaming
            )
        if entry.props.get("connector") == "upsert-kafka" and entry.schema_ddl:
            from flink_parent_spark.sources.connectors import (  # noqa: PLC0415
                upsert_kafka_normalize,
            )

            if streaming:
                raise ValueError(
                    "upsert-kafka streaming reads need the changelog ops "
                    "(streaming/changelog.py changelog_keep_last); the DDL "
                    "path materializes the batch-normalized latest rows"
                )
            pk = [
                c for c in entry.props.get("__primary_key", "").split(",") if c
            ]
            if not pk:
                raise ValueError("upsert-kafka requires PRIMARY KEY (...) in DDL")
            df = upsert_kafka_normalize(df, entry.schema_ddl, pk)
        elif entry.props.get("format") in ("debezium-json", "canal-json") and entry.schema_ddl:
            # CDC changelog formats (flink-formats/flink-json debezium/canal
            # factories): the kafka value column parses into a
            # __rowkind-tagged relation
            from flink_parent_spark.sources.changelog_formats import (  # noqa: PLC0415
                canal_json_to_changelog,
                debezium_json_to_changelog,
            )

            ignore = entry.props.get(
                f"{entry.props['format'].split('-')[0]}-json.ignore-parse-errors",
                "false",
            ).lower() == "true"
            if entry.props["format"] == "debezium-json":
                include = entry.props.get(
                    "debezium-json.schema-include", "false"
                ).lower() == "true"
                df = debezium_json_to_changelog(
                    df, "value", entry.schema_ddl,
                    schema_include=include, ignore_parse_errors=ignore,
                )
            else:
                df = canal_json_to_changelog(
                    df, "value", entry.schema_ddl, ignore_parse_errors=ignore
                )
        elif entry.props.get("format") == "json" and entry.schema_ddl:
            df = decode_kafka_json_value(df, entry.schema_ddl)
        for name_, expr_ in entry.computed:
            df = df.withColumn(name_, F.expr(expr_))
        if streaming and entry.watermark:
            df = df.withWatermark(*entry.watermark)
        return df

    def _insert_into(self, s: str):
        m = re.match(
            r"INSERT\s+(?P<mode>INTO|OVERWRITE)\s+(?:TABLE\s+)?(?P<t>\w+)\s+"
            r"(?:PARTITION\s*\((?P<pspec>[^)]*)\)\s+)?(?P<q>.*)",
            s,
            re.IGNORECASE | re.DOTALL,
        )
        if m.group("t") not in self.catalog:
            # Hive/managed tables live in Spark's own catalog — identical
            # INSERT semantics (incl. static PARTITION specs); group-window
            # dialect tokens in the query part still rewrite (identity
            # otherwise)
            return Table(self.spark.sql(rewrite_group_windows(s)), self)
        target = self.catalog[m.group("t")]
        # the query part takes the full sql_query dialect route
        # (TUMBLE/HOP/SESSION rewrite, rank-idiom recognition)
        df = self.sql_query(m.group("q")).to_df()
        static_spec: "dict[str, str]" = {}
        if m.group("pspec"):
            # static partition spec (RichSqlInsert's staticPartitions):
            # the spec columns are constants appended to the query's
            # columns; a PARTIAL spec is allowed — unbound partition keys
            # stay dynamic, fed by the query (Hive/Flink mixed
            # static+dynamic INSERT)
            static_spec = self._parse_partition_specs(
                target, f"PARTITION ({m.group('pspec')})", allow_partial=True
            )[0]
        if target.schema_ddl and target.fmt in (
            "filesystem", "parquet", "csv", "json", "orc", "avro"
        ):
            # INSERT matches the declared schema POSITIONALLY (Flink's
            # SqlInsert / SQL standard), so unaliased SELECT literals
            # land on the right columns; a static partition spec removes
            # its keys from the expected positional list
            declared = [
                c.strip().split()[0].strip("`")
                for c in _split_top_level(target.schema_ddl)
                if c.strip()
            ]
            spec_lower = {k.lower() for k in static_spec}
            expected = [c for c in declared if c.lower() not in spec_lower]
            if len(df.columns) != len(expected):
                # the reference raises a validation error on arity mismatch
                # (SqlInsert column-count check) — never silently write
                # unmapped columns that surface as nulls after projection
                raise ValueError(
                    f"INSERT into {target.name}: query produces "
                    f"{len(df.columns)} columns but {len(expected)} are "
                    "expected"
                )
            df = df.toDF(*expected)
        for k, v in static_spec.items():
            df = df.withColumn(k, F.lit(v))
        mode = "overwrite" if m.group("mode").upper() == "OVERWRITE" else "append"
        if target.fmt == "kafka":
            # kafka table sink: rows serialize per the declared format
            # (json value; PRIMARY KEY column -> message key when present)
            # into the file-backed topic — the producer half of the fake
            # (FlinkKafkaProducer / kafka DynamicTableSink role). Broker
            # option sets would route to format("kafka") writeStream; the
            # file-backed path appends with monotone offsets like the
            # reader expects.
            from flink_parent_spark.sources.connectors import (  # noqa: PLC0415
                write_kafka_file_topic_df,
            )

            wire = (
                not target.path
                and target.props.get("fps.transport") == "wire"
                and target.props.get("properties.bootstrap.servers")
            )
            if not target.path and not wire:
                raise ValueError(
                    "kafka sink without 'path' needs a live broker "
                    "(properties.bootstrap.servers)"
                )
            pk = [c for c in target.props.get("__primary_key", "").split(",") if c]
            if not pk:
                key_col = F.lit(None).cast("string")
            elif len(pk) == 1:
                key_col = F.col(pk[0]).cast("string")
            else:
                # composite PRIMARY KEY: serialize ALL key columns (json
                # struct, matching the upsert-kafka reader's key decode)
                key_col = F.to_json(F.struct(*[F.col(c) for c in pk]))
            kv = df.select(
                key_col.alias("k"),
                F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("v"),
            )
            if wire:
                # real Kafka framing to the configured broker (v0 Produce,
                # acks=-1), executor-side — same rows, true wire transport
                from flink_parent_spark.sources.kafka_wire import (  # noqa: PLC0415
                    kafka_wire_sink,
                )

                host, _, port = target.props[
                    "properties.bootstrap.servers"
                ].partition(":")
                kafka_wire_sink(
                    kv, host, int(port), target.props.get("topic", target.name)
                )
            else:
                write_kafka_file_topic_df(
                    kv,
                    target.path,
                    target.props.get("topic", target.name),
                )
            # refresh the reader view so subsequent queries see the rows
            self._scan(target, streaming=self.streaming).createOrReplaceTempView(
                target.name
            )
            return None
        if target.props.get("connector") == "kinesis":
            # kinesis table sink: PutRecords JSON API per partition;
            # PRIMARY KEY (first column) -> PartitionKey (per-key shard
            # order, the reference's partitionKeyGenerator)
            from flink_parent_spark.sources.connectors import (  # noqa: PLC0415
                kinesis_putrecords_sink,
            )

            endpoint = target.props.get("aws.endpoint")
            if not endpoint:
                raise ValueError(
                    "kinesis sink needs 'aws.endpoint' (a localhost stub "
                    "or a sigv4 proxy; no AWS SDK in this engine)"
                )
            pk = [c for c in target.props.get("__primary_key", "").split(",") if c]
            kinesis_putrecords_sink(
                df,
                endpoint,
                target.props.get("stream", target.name),
                partition_key_col=(pk[0] if pk else df.columns[0]),
                batch_records=int(target.props.get("sink.batch.max-size", "500")),
            )
            # refresh the reader view so subsequent queries see the rows
            # (the scan half drains the shards again — same as kafka)
            self._refresh_view(target, strict=False)
            return None
        if target.props.get("connector") == "pubsub":
            # gcp pub/sub table sink: REST :publish per partition (the
            # emulator's HTTP surface), flink-connector-gcp-pubsub's
            # PubSubSink role
            from flink_parent_spark.sources.connectors import (  # noqa: PLC0415
                pubsub_publish_sink,
            )

            endpoint = target.props.get("gcp.endpoint")
            if not endpoint:
                raise ValueError(
                    "pubsub sink needs 'gcp.endpoint' (the emulator or a "
                    "localhost stub; no SDK in this engine)"
                )
            pubsub_publish_sink(
                df,
                endpoint,
                target.props.get("project", "local"),
                target.props.get("topic", target.name),
                batch_messages=int(
                    target.props.get("sink.batch.max-size", "100")
                ),
            )
            return None
        if target.props.get("connector") == "rabbitmq":
            # rabbitmq table sink: AMQP 0-9-1 Basic.Publish per row with
            # publisher confirms, flink-connector-rabbitmq's RMQSink role
            from flink_parent_spark.sources.rabbitmq_amqp import (  # noqa: PLC0415
                rabbitmq_sink,
            )

            if "host" not in target.props:
                raise ValueError(
                    "rabbitmq sink needs 'host'/'port' (a localhost stub "
                    "or live broker; no client library in this engine)"
                )
            rabbitmq_sink(
                df,
                target.props["host"],
                int(target.props.get("port", "5672")),
                target.props.get("queue", target.name),
                batch_confirm=int(target.props.get("sink.confirm.max-size", "100")),
            )
            return None
        if target.props.get("connector") == "cassandra":
            # cassandra table sink: CQL native-protocol writes per
            # partition (positionally-bound INSERT upserts; UNLOGGED
            # batches), flink-connector-cassandra's CassandraSink role
            from flink_parent_spark.sources.cassandra_cql import (  # noqa: PLC0415
                cassandra_cql_sink,
            )

            if "host" not in target.props:
                raise ValueError(
                    "cassandra sink needs 'host'/'port' (a localhost stub "
                    "or live node; no client library in this engine)"
                )
            cassandra_cql_sink(
                df,
                target.props["host"],
                int(target.props.get("port", "9042")),
                target.props.get("keyspace", "ks"),
                target.props.get("table", target.name),
                batch_size=int(target.props.get("sink.batch.max-size", "50")),
            )
            return None
        if target.props.get("connector") == "nifi":
            # nifi table sink: HTTP site-to-site transactions per
            # partition (flink-connector-nifi's NiFiSink role; the
            # content column + attribute columns are the DDL-level
            # NiFiDataPacketBuilder)
            from flink_parent_spark.sources.nifi_s2s import (  # noqa: PLC0415
                nifi_s2s_sink,
            )

            if "url" not in target.props or "port-id" not in target.props:
                raise ValueError(
                    "nifi sink needs 'url' and 'port-id' (a localhost "
                    "stub or live NiFi; no client library in this engine)"
                )
            content_col = target.props.get("content.column", df.columns[-1])
            nifi_s2s_sink(
                df,
                target.props["url"],
                target.props["port-id"],
                content_col,
                attr_cols=[c for c in df.columns if c != content_col],
                batch_flowfiles=int(
                    target.props.get("sink.batch.max-flowfiles", "500")
                ),
            )
            return None
        if target.props.get("connector", "").startswith("elasticsearch"):
            # elasticsearch-7 table sink: bulk-API POSTs per partition,
            # PRIMARY KEY -> document _id (idempotent upserts)
            from flink_parent_spark.sources.connectors import (  # noqa: PLC0415
                elasticsearch_bulk_sink,
            )

            pk = [c for c in target.props.get("__primary_key", "").split(",") if c]
            elasticsearch_bulk_sink(
                df,
                target.props["hosts"],
                target.props.get("index", target.name),
                id_cols=pk or None,
                batch_actions=int(
                    target.props.get("sink.bulk-flush.max-actions", "1000")
                ),
            )
            return None
        fmt = "parquet" if target.fmt in ("filesystem", "parquet") else target.fmt
        writer = df.write.mode(mode)
        if target.partitions:
            # PARTITIONED BY tables write hive-layout partition dirs
            # (FileSystemTableSink's partition grouping); dynamic partition
            # overwrite replaces only the partitions present in the data,
            # matching the reference's filesystem sink overwrite semantics
            writer = writer.partitionBy(*target.partitions)
            if mode == "overwrite":
                writer = writer.option("partitionOverwriteMode", "dynamic")
        getattr(writer, fmt)(target.path)
        # re-register the reader view: the previous view's analyzed plan
        # pins a file index snapshot, so rows written by this INSERT (and
        # any partition dirs it created) would be invisible to subsequent
        # queries without a re-scan. Sink-only-until-now tables gain their
        # first readable view here.
        self._refresh_view(target, strict=False)
        return None

    def create_statement_set(self) -> "StatementSet":
        """TableEnvironment.createStatementSet (TableEnvironmentImpl.java /
        StatementSetImpl): batch several INSERT statements and execute them
        as one unit."""
        return StatementSet(self)

    # -- queries -------------------------------------------------------------
    _OPTIONS_HINT_RE = re.compile(
        r"(?P<t>\b\w+)\s*/\*\+\s*OPTIONS\s*\((?P<kv>[^)]*)\)\s*\*/",
        re.IGNORECASE,
    )

    def _apply_options_hints(self, sql: str) -> str:
        """FLIP-113 dynamic table options: `t /*+ OPTIONS('k'='v') */`
        overrides the table's catalog options for this query only
        (FlinkHints.java HINT_NAME_OPTIONS / mergeTableOptions; gated by
        table.dynamic-table-options.enabled, default false, exception when
        disabled — TableConfigOptions.java:38). The hinted scan resolves
        into a per-query temp view substituted for the reference+hint."""
        import uuid as _uuid  # noqa: PLC0415

        def sub(hm: re.Match) -> str:
            tname = hm.group("t")
            if self.config.get("table.dynamic-table-options.enabled") != "true":
                raise ValueError(
                    "OPTIONS hint on table '%s' but dynamic table options are "
                    "disabled; set table.dynamic-table-options.enabled=true"
                    % tname
                )
            if tname not in self.catalog:
                raise ValueError(f"OPTIONS hint on unknown table: {tname}")
            base = self.catalog[tname]
            overrides = {
                p.group("k"): p.group("v")
                for p in _PROP_RE.finditer(hm.group("kv"))
            }
            merged = {**base.props, **overrides}
            entry = CatalogTable(
                name=base.name,
                fmt=merged.get("format", merged.get("connector", base.fmt)),
                path=merged.get("path", base.path),
                schema_ddl=base.schema_ddl,
                watermark=base.watermark,
                computed=base.computed,
                props=merged,
            )
            if entry.props.get("connector") in ("kafka", "upsert-kafka"):
                entry.fmt = "kafka"
            view = f"__hinted_{tname}_{_uuid.uuid4().hex[:8]}"
            self._scan(entry, streaming=self.streaming).createOrReplaceTempView(view)
            return view

        return self._OPTIONS_HINT_RE.sub(sub, sql)

    def sql_query(self, sql: str) -> Table:
        if "OPTIONS" in sql.upper() and self._OPTIONS_HINT_RE.search(sql):
            sql = self._apply_options_hints(sql)
        masked = _mask_quotes_comments(sql)
        m = _SYSTIME_RE.search(masked)
        if m:
            return Table(self._system_time_join(sql, m), self)
        if re.search(r"\bMATCH_RECOGNIZE\s*\(", masked, re.IGNORECASE):
            # the reference's primary MATCH_RECOGNIZE entry point is the
            # full SQL statement (ParserImpl.parse -> StreamExecMatch.scala
            # :68) — route it to the clause engine the same way this layer
            # already routes TUMBLE/HOP/SESSION and rank-idiom queries.
            # The fragment may sit anywhere (top level, derived table,
            # CTE body, join operand): it is executed to a view, spliced
            # out, and the reduced statement recurses through sql_query.
            from flink_parent_spark.streaming.match_recognize_sql import (  # noqa: PLC0415
                find_match_recognize_fragment,
            )

            frag = find_match_recognize_fragment(sql, masked)
            if frag is not None:
                return Table(self._match_recognize_fragment(sql, frag), self)
        if self.streaming:
            # FlinkLogicalRankRule / StreamExecDeduplicateRule parity: the
            # ROW_NUMBER-subquery idiom on a streaming scan routes to the
            # stateful Top-N / Deduplicate operators (a plain row-number
            # window over an unbounded stream is rejected by both engines).
            from flink_parent_spark.streaming.rank_recognition import (  # noqa: PLC0415
                apply_rank_spec,
                recognize_rank_query,
            )

            spec = recognize_rank_query(sql)
            if spec is not None:
                try:
                    src = self.spark.table(spec.source)
                except Exception:
                    src = None
                if src is not None and src.isStreaming:
                    return Table(apply_rank_spec(src, spec), self)
        return Table(self.spark.sql(rewrite_group_windows(sql)), self)

    def _match_recognize_fragment(self, sql: str, frag) -> DataFrame:
        """Execute one `<source> MATCH_RECOGNIZE (...) [AS alias]`
        fragment (StreamExecMatch.scala:68 deployment) and evaluate the
        reduced statement — recursion through sql_query gives an outer
        TUMBLE grouping over MATCH_ROWTIME(), further MR fragments, or
        any other dialect shape its own rewrite."""
        return self.sql_query(self._splice_match_recognize(sql, frag)).to_df()

    def _splice_match_recognize(self, sql: str, frag) -> str:
        """Run the fragment's clause body through the match engine over
        its source (table or derived-table subquery; streaming or batch,
        auto-detected), register the match output as a temp view, and
        return the statement with the view reference spliced in where the
        fragment stood. TableEnvironment-registered functions
        (register_function) flow into the clause's expression engine."""
        import uuid as _uuid  # noqa: PLC0415

        from flink_parent_spark.streaming.match_recognize_sql import (  # noqa: PLC0415
            match_recognize_sql,
        )

        if frag.source_is_subquery:
            # `FROM ( <subquery> ) MATCH_RECOGNIZE (...)` — evaluate the
            # derived table through sql_query first (its own TUMBLE/rank
            # dialect shapes get rewritten on the way)
            src = self.sql_query(frag.source).to_df()
        else:
            src = self.spark.table(frag.source)
        out = match_recognize_sql(
            src,
            frag.body,
            streaming=src.isStreaming,
            udfs=self._mr_udfs or None,
        )
        if "match_id" in out.columns and re.search(
            r"\bMEASURES\b", frag.body, re.IGNORECASE
        ):
            # statement output = partition columns + measures (Calcite's
            # ONE ROW PER MATCH row type); the engine's match ordinal is
            # an internal column at this surface
            out = out.drop("match_id")
        view = f"__mr_stmt_{_uuid.uuid4().hex[:8]}"
        out.createOrReplaceTempView(view)
        repl = view + (f" AS {frag.alias}" if frag.alias else "")
        return sql[: frag.start] + repl + sql[frag.end :]

    def register_function(
        self, name: str, fn, result_type: str = "double", kind: str = "scalar"
    ) -> None:
        """tEnv.registerFunction parity (TableEnvironment.registerFunction
        — the MatchRecognizeITCase idiom `tEnv.registerFunction(
        "weightedAvg", new WeightedAvg)`): register a Python function for
        use inside MATCH_RECOGNIZE MEASURES/DEFINE expressions. kind
        "scalar" = row-at-a-time callable (ScalarFunction.eval contract);
        kind "agg" = fn(list[arg_tuples]) over a pattern variable's rows
        (AggregateFunction over the match). For general SQL use register
        a vectorized UDF via CREATE FUNCTION instead (this surface is the
        matcher-side expression registry)."""
        if kind not in ("scalar", "agg"):
            raise ValueError(f"unknown function kind {kind!r}")
        self._mr_udfs[name] = (kind, fn, result_type)

    def _system_time_join(self, sql: str, m: re.Match) -> DataFrame:
        """SQL temporal join: `FROM L l JOIN R FOR SYSTEM_TIME AS OF l.ts
        [AS] r ON l.k = r.k` (Flink's versioned-table join syntax —
        LogicalCorrelateToJoinFromTemporalTableRule.scala /
        TemporalRowTimeJoinOperator.java) lowered onto the `asof_join`
        verb. The right side's version time is its DDL WATERMARK column
        when declared, else the probe's time column name. One temporal
        join per statement; alias-qualified right columns that collide
        with left columns are exposed as `<alias>_<col>`."""
        import uuid as _uuid  # noqa: PLC0415

        from flink_parent_spark.operators.joins import asof_join  # noqa: PLC0415

        lt, la = m.group("lt"), m.group("la")
        rt = m.group("rt")
        ra = m.group("ra") or rt
        left = self.spark.table(lt)
        right = self.spark.table(rt)
        if m.group("c1") == la:
            lkey, rkey = m.group("k1"), m.group("k2")
        else:
            lkey, rkey = m.group("k2"), m.group("k1")
        entry = self.catalog.get(rt)
        rts = entry.watermark[0] if entry and entry.watermark else m.group("lts")
        payload = {
            (f"{ra}_{c}" if c in left.columns else c): c
            for c in right.columns
            if c != rkey
        }
        out = asof_join(
            left, right, [(lkey, rkey)], m.group("lts"), rts, payload
        )
        view = f"__systime_{_uuid.uuid4().hex[:8]}"
        out.createOrReplaceTempView(view)
        reduced = sql[: m.start()] + f"FROM {view}" + sql[m.end():]
        # left refs drop their qualifier; right refs become the exposed
        # (possibly collision-prefixed) names
        for c in right.columns:
            exposed = f"{ra}_{c}" if c in left.columns else c
            reduced = re.sub(rf"\b{ra}\.{c}\b", exposed, reduced)
        reduced = re.sub(rf"\b{la}\.(\w+)\b", r"\1", reduced)
        return self.spark.sql(rewrite_group_windows(reduced))

    # -- catalog verbs -------------------------------------------------------
    # TableEnvironment.java surface: createTemporaryView, from/fromPath,
    # listTables, listFunctions, dropTemporaryView.

    def create_temporary_view(self, name: str, table: "Table | DataFrame") -> None:
        df = table.to_df() if isinstance(table, Table) else table
        df.createOrReplaceTempView(name)

    def from_path(self, name: str) -> Table:
        """TableEnvironment.from(path): a Table over a registered table."""
        return Table(self.spark.table(name), self)

    def list_tables(self) -> list[str]:
        return [r["table_name"] for r in self._show_tables().collect()]

    def list_functions(self) -> list[str]:
        return [
            r["function"].split(".")[-1]
            for r in self.spark.sql("SHOW FUNCTIONS").collect()
        ]

    def drop_temporary_view(self, name: str) -> bool:
        return self.spark.catalog.dropTempView(name)

    # -- Table <-> DataStream bridge -----------------------------------------
    # StreamTableEnvironment bridge verbs (flink-table-api-java-bridge/.../
    # bridge/java/StreamTableEnvironment.java: fromDataStream,
    # toAppendStream, toRetractStream:560).

    def from_data_stream(self, ds, *field_names: str) -> Table:
        """fromDataStream(stream[, fields...]): interpret a DataStream as a
        Table; optional field names rename positionally."""
        df = ds.to_df()
        if field_names:
            df = df.toDF(*field_names)
        return Table(df, self)

    def to_append_stream(self, table: Table):
        """toAppendStream: only valid for insert-only tables — the
        reference throws TableException when the table is updating
        (carries retractions); same contract here via the `__rowkind`
        changelog marker."""
        from flink_parent_spark.api.datastream import (  # noqa: PLC0415
            StreamExecutionEnvironment,
        )
        from flink_parent_spark.streaming.changelog import ROWKIND_COL  # noqa: PLC0415

        df = table.to_df()
        if ROWKIND_COL in df.columns:
            raise ValueError(
                "toAppendStream doesn't support consuming update changes "
                f"(table carries {ROWKIND_COL}); use to_retract_stream"
            )
        return StreamExecutionEnvironment(self.spark).from_data_frame(df)

    def to_retract_stream(self, table: Table):
        """toRetractStream: (flag, row) pairs — True = add, False = retract
        (RowKind.java: +I/+U add, -U/-D retract). Insert-only tables emit
        all-True; changelog tables map their `__rowkind` tag."""
        from flink_parent_spark.api.datastream import (  # noqa: PLC0415
            StreamExecutionEnvironment,
        )
        from flink_parent_spark.streaming.changelog import ROWKIND_COL  # noqa: PLC0415

        df = table.to_df()
        if ROWKIND_COL in df.columns:
            df = df.withColumn(
                "accumulate", F.col(ROWKIND_COL).isin("+I", "+U")
            ).drop(ROWKIND_COL)
        else:
            df = df.withColumn("accumulate", F.lit(True))
        return StreamExecutionEnvironment(self.spark).from_data_frame(df)

    def explain_sql(self, sql: str, mode: str = "formatted") -> str:
        """TableEnvironment.explainSql parity (TableEnvironment.java /
        TableEnvironmentImpl.explainInternal): return the optimizer's plan
        for a query as a string. Modes follow Spark's explain
        ('simple' | 'extended' | 'codegen' | 'cost' | 'formatted') — the
        reference's ExplainDetail flags map onto 'cost'/'codegen'."""
        df = self.spark.sql(sql)
        jdf = df._jdf
        return df._sc._jvm.PythonSQLUtils.explainString(jdf.queryExecution(), mode)

    def from_path(self, name: str) -> Table:
        entry = self.catalog.get(name)
        if entry and self.streaming:
            return Table(self._scan(entry, streaming=True), self)
        return Table(self.spark.table(name), self)


# -- Flink-SQL group-window dialect -----------------------------------------
# `GROUP BY TUMBLE(ts, INTERVAL '1' HOUR)` + TUMBLE_START/_END/_ROWTIME (and
# HOP/SESSION) — the reference's FlinkSqlOperatorTable TUMBLE..SESSION_PROCTIME
# block, executed by WindowOperator (flink-table-runtime-blink/.../window/
# WindowOperator.java). Here they rewrite onto Spark SQL's native
# window()/session_window() grouping (Catalyst TimeWindowing), so the
# physical plan is the stock tumbling/sliding/session aggregation:
#   TUMBLE(ts, size)        -> window(ts, size)
#   HOP(ts, slide, size)    -> window(ts, size, slide)   (argument order flips)
#   SESSION(ts, gap)        -> session_window(ts, gap)
#   X_START/X_END           -> window.start / window.end (struct field of the
#                              grouping column Spark emits)
#   X_ROWTIME               -> window.end - 1ms (Flink's rowtime attribute,
#                              GroupWindowAggregateBase semantics)
#   X_PROCTIME              -> window.end (no processing-time in batch replay)

_GW_CALL = re.compile(
    r"\b(TUMBLE|HOP|SESSION)(_START|_END|_ROWTIME|_PROCTIME)?\s*\(",
    re.IGNORECASE,
)
_INTERVAL_RE = re.compile(
    r"INTERVAL\s+'(?P<n>[\d.]+)'\s+(?P<unit>SECOND|MINUTE|HOUR|DAY)S?",
    re.IGNORECASE,
)


def _gw_interval(tok: str) -> str:
    m = _INTERVAL_RE.match(tok.strip())
    if not m:
        raise ValueError(f"unsupported group-window interval: {tok!r}")
    return f"'{m.group('n')} {m.group('unit').lower()}'"


def _mask_quotes_comments(sql: str) -> str:
    """Same-length copy of `sql` with the contents of string literals
    (single/double/backtick, with '' escape) and comments (-- and /* */)
    blanked, so token scans and paren matching never fire inside them."""
    out = list(sql)
    i, n = 0, len(sql)
    while i < n:
        two = sql[i : i + 2]
        if two == "--":
            j = sql.find("\n", i)
            j = n if j < 0 else j
            out[i:j] = " " * (j - i)
            i = j
        elif two == "/*":
            j = sql.find("*/", i + 2)
            j = n if j < 0 else j + 2
            out[i:j] = " " * (j - i)
            i = j
        elif sql[i] in "'\"`":
            q = sql[i]
            j = i + 1
            while j < n:
                if sql[j] == q:
                    if q == "'" and sql[j : j + 2] == "''":
                        j += 2
                        continue
                    break
                j += 1
            end = min(j, n)
            out[i + 1 : end] = " " * (end - i - 1)
            i = end + 1
        else:
            i += 1
    return "".join(out)


def rewrite_group_windows(sql: str) -> str:
    """Rewrite Flink group-window SQL into Spark SQL (identity when the
    dialect is absent). Scans a literal/comment-masked shadow of the text
    so TUMBLE/HOP/SESSION tokens inside strings or comments are left alone."""
    masked = _mask_quotes_comments(sql)
    out: list[str] = []
    i = 0
    while True:
        m = _GW_CALL.search(masked, i)
        if not m:
            out.append(sql[i:])
            return "".join(out)
        out.append(sql[i : m.start()])
        depth, j = 1, m.end()
        while depth and j < len(sql):
            if masked[j] == "(":
                depth += 1
            elif masked[j] == ")":
                depth -= 1
            j += 1
        args = [a.strip() for a in _split_top_level(sql[m.end() : j - 1])]
        kind = m.group(1).upper()
        suffix = (m.group(2) or "").upper()
        col = "session_window" if kind == "SESSION" else "window"
        if suffix:
            field = {
                "_START": f"{col}.start",
                "_END": f"{col}.end",
                "_ROWTIME": f"{col}.end - INTERVAL 1 MILLISECOND",
                "_PROCTIME": f"{col}.end",
            }[suffix]
            out.append(field)
        elif kind == "TUMBLE":
            out.append(f"window({args[0]}, {_gw_interval(args[1])})")
        elif kind == "HOP":
            out.append(
                f"window({args[0]}, {_gw_interval(args[2])}, {_gw_interval(args[1])})"
            )
        else:
            out.append(f"session_window({args[0]}, {_gw_interval(args[1])})")
        i = j


def _split_top_level(s: str) -> list[str]:
    """Split a column-definition block on commas not inside parens/quotes."""
    out, depth, cur, q = [], 0, [], None
    for ch in s:
        if q:
            cur.append(ch)
            if ch == q:
                q = None
            continue
        if ch in "'\"":
            q = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            out.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        out.append("".join(cur))
    return out
