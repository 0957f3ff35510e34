"""Expression DSL — `org.apache.flink.table.api.Expressions` parity.

Reference: flink-table/flink-table-api-java/.../api/Expressions.java
($:75, lit:95, and:147, or:153, UNBOUNDED_ROW/RANGE:163-185, currentDate
:189-209, temporalOverlaps:233, dateFormat:257, timestampDiff:272,
array/row/map:282-305, pi/e:320-325, call for user functions further
down). The fluent Table API accepts these wherever it accepts a SQL
string.

Spark-first: an ApiExpression IS a pyspark Column — every verb on the
fluent Table already consumes Columns, so the whole DSL is a naming
veneer over `pyspark.sql.functions` with Flink's spellings (including
`$("col")` as `col`) and zero evaluation cost of its own.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F


def _c(v) -> Column:
    return v if isinstance(v, Column) else F.lit(v)


def col(name: str) -> Column:
    """$(name) — a column reference."""
    return F.col(name)


# Flink spells it `$`; Python identifiers can't, so both names are exported.
dollar = col


def lit(v) -> Column:
    return F.lit(v)


def and_(p0, p1, *more) -> Column:
    out = _c(p0) & _c(p1)
    for p in more:
        out = out & _c(p)
    return out


def or_(p0, p1, *more) -> Column:
    out = _c(p0) | _c(p1)
    for p in more:
        out = out | _c(p)
    return out


def not_(p) -> Column:
    return ~_c(p)


def if_then_else(cond, if_true, if_false) -> Column:
    return F.when(_c(cond), _c(if_true)).otherwise(_c(if_false))


def current_date() -> Column:
    return F.current_date()


def current_timestamp() -> Column:
    return F.current_timestamp()


def local_timestamp() -> Column:
    return F.localtimestamp()


def temporal_overlaps(s1, e1, s2, e2) -> Column:
    return (_c(s1) <= _c(e2)) & (_c(s2) <= _c(e1))


def date_format(timestamp, fmt) -> Column:
    return F.date_format(_c(timestamp), fmt)


def array(head, *tail) -> Column:
    return F.array(*[_c(x) for x in (head, *tail)])


def row(head, *tail) -> Column:
    return F.struct(*[_c(x) for x in (head, *tail)])


def map_(key, value, *tail) -> Column:
    return F.create_map(*[_c(x) for x in (key, value, *tail)])


def pi() -> Column:
    return F.lit(3.141592653589793)


def e() -> Column:
    return F.exp(F.lit(1.0))


def rand(seed: int | None = None) -> Column:
    return F.rand(seed) if seed is not None else F.rand()


def uuid() -> Column:
    return F.expr("uuid()")


def call(function_name: str, *args) -> Column:
    """call(name, args...) — invoke a registered (SQL/residue) function by
    name, the Expressions.call escape hatch."""
    return F.call_function(function_name, *[_c(a) for a in args])


def concat(first, *more) -> Column:
    return F.concat(*[_c(x) for x in (first, *more)])


def coalesce(*args) -> Column:
    return F.coalesce(*[_c(a) for a in args])


def null_of(ddl_type: str) -> Column:
    return F.lit(None).cast(ddl_type)


# OVER-window frame markers (Expressions.java:163-185): the fluent
# Over window accepts these sentinels.
UNBOUNDED_ROW = "unbounded_row"
UNBOUNDED_RANGE = "unbounded_range"
CURRENT_ROW = "current_row"
CURRENT_RANGE = "current_range"
