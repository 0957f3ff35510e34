"""CDC changelog formats: debezium-json and canal-json.

Reference semantics (Flink 1.11's headline CDC feature):
- `DebeziumJsonDeserializationSchema.java`
  (flink-formats/flink-json/.../debezium/, deserialize:110-160): message is
  `{before, after, op}` (under `payload` when schemas are enabled);
  op c/r -> INSERT(after); u -> UPDATE_BEFORE(before) + UPDATE_AFTER(after),
  null `before` is the REPLICA IDENTITY error; d -> DELETE(before);
  null/empty messages are tombstones and are skipped; unknown op raises
  unless ignore-parse-errors.
- `CanalJsonDeserializationSchema.java` (.../canal/, deserialize:92-150):
  message is `{data: [row...], old: [row...], type}`; INSERT -> +I per
  element of data; UPDATE -> per element, `old` holds only the CHANGED
  fields (nulls mean unchanged -> copied from the new row), emitting
  -U(merged old) and +U(new); DELETE -> -D per element of data.

Spark-first: both parsers are pure Catalyst expressions — `from_json` into
the envelope struct, a CASE-built array of (rowkind, payload) pairs,
explode — so CDC ingestion runs inside whole-stage codegen with zero
Python. Error contracts use `assert_true` (fails the task with the
reference's message) instead of per-row exception handling. The output is
a `__rowkind`-tagged relation that feeds the changelog layer
(`streaming/changelog.py` — changelog_normalize / retract_aggregate), the
same wiring the reference has between format and ChangelogNormalize.

Works identically on batch DataFrames and streaming micro-batches (the
expressions are stateless row-local transforms).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from flink_parent_spark.streaming.changelog import ROWKIND_COL


def _field_names(payload_ddl: str) -> list[str]:
    """Top-level field names of a DDL fragment like 'id BIGINT, name STRING'
    (nested struct/map/array types stay balanced behind <>)."""
    names, depth, cur = [], 0, []
    for ch in payload_ddl:
        if ch == "<":
            depth += 1
        elif ch == ">":
            depth -= 1
        if ch == "," and depth == 0:
            names.append("".join(cur).strip().split()[0].strip("`"))
            cur = []
        else:
            cur.append(ch)
    if "".join(cur).strip():
        names.append("".join(cur).strip().split()[0].strip("`"))
    return names


def _emit(kind: str, payload: Column) -> Column:
    return F.struct(F.lit(kind).alias("k"), payload.alias("r"))


def debezium_json_to_changelog(
    df: DataFrame,
    value_col: str,
    payload_ddl: str,
    schema_include: bool = False,
    ignore_parse_errors: bool = False,
) -> DataFrame:
    """Parse a column of Debezium JSON messages into a __rowkind-tagged
    relation with the payload's columns."""
    row_t = f"struct<before: struct<{payload_ddl}>, after: struct<{payload_ddl}>, op: string>"
    if schema_include:
        # schemas enabled: real payload nests under "payload"; "schema" is
        # ignored exactly like the reference (schemaInclude flag)
        parsed = F.from_json(F.col(value_col).cast("string"), f"struct<payload: {row_t}>")["payload"]
    else:
        parsed = F.from_json(F.col(value_col).cast("string"), row_t)
    # kafka-shaped sources carry value as BINARY; accept both
    v = F.col(value_col).cast("string")
    # tombstones (null/empty) are skipped before any validation.
    # The envelope fields are extracted to TOP-LEVEL columns here (not
    # accessed as nested fields of one struct column downstream): Spark's
    # GeneratorNestedColumnAliasing mis-prunes nested from_json fields
    # referenced only inside a generator when a downstream projection
    # needs none of them (e.g. a bare count()), failing with
    # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND; a plain Project over from_json
    # takes the well-trodden pruning path.
    out = df.where(v.isNotNull() & (F.length(F.trim(v)) > 0)).select(
        parsed["op"].alias("__op"),
        parsed["before"].alias("__before"),
        parsed["after"].alias("__after"),
        v.alias("__raw"),
    )
    m = {
        "op": F.col("__op"),
        "before": F.col("__before"),
        "after": F.col("__after"),
    }
    known = m["op"].isin("c", "r", "u", "d")
    checks = [
        F.assert_true(
            known | F.lit(ignore_parse_errors),
            F.concat(F.lit('Unknown "op" value in Debezium JSON message: '), F.col("__raw")),
        ),
        F.assert_true(
            ~m["op"].isin("u", "d") | m["before"].isNotNull() | F.lit(ignore_parse_errors),
            F.lit(
                'The "before" field of UPDATE/DELETE message is null; if you are '
                "using Debezium Postgres Connector, please check the Postgres "
                "table has been set REPLICA IDENTITY to FULL level."
            ),
        ),
    ]
    pairs = (
        F.when(m["op"].isin("c", "r"), F.array(_emit("+I", m["after"])))
        .when(
            m["op"] == "u",
            F.when(
                m["before"].isNotNull(),
                F.array(_emit("-U", m["before"]), _emit("+U", m["after"])),
            ).otherwise(F.array().cast(f"array<struct<k: string, r: struct<{payload_ddl}>>>")),
        )
        .when(
            m["op"] == "d",
            F.when(m["before"].isNotNull(), F.array(_emit("-D", m["before"])))
            .otherwise(F.array().cast(f"array<struct<k: string, r: struct<{payload_ddl}>>>")),
        )
        .otherwise(F.array().cast(f"array<struct<k: string, r: struct<{payload_ddl}>>>"))
    )
    # the checks must fire per INPUT message, including ones whose pair
    # array is empty (explode would never evaluate a sibling column) — so
    # they gate the pairs expression itself: assert_true yields NULL when
    # the condition holds and throws otherwise
    guarded = F.when(checks[0].isNull() & checks[1].isNull(), pairs)
    exploded = out.select(F.explode(guarded).alias("e"))
    return exploded.select("e.r.*", F.col("e.k").alias(ROWKIND_COL))


def canal_json_to_changelog(
    df: DataFrame,
    value_col: str,
    payload_ddl: str,
    ignore_parse_errors: bool = False,
) -> DataFrame:
    """Parse a column of Canal JSON messages into a __rowkind-tagged
    relation; UPDATE merges unchanged (null) fields of `old` from the new
    row, per the reference."""
    fields = _field_names(payload_ddl)
    row_t = (
        f"struct<data: array<struct<{payload_ddl}>>, "
        f"old: array<struct<{payload_ddl}>>, type: string>"
    )
    parsed = F.from_json(F.col(value_col).cast("string"), row_t)
    # top-level extraction: same GeneratorNestedColumnAliasing workaround
    # as debezium_json_to_changelog (nested from_json fields referenced
    # only inside a generator mis-prune under a bare count())
    out = df.where(F.col(value_col).isNotNull()).select(
        parsed["type"].alias("__type"),
        parsed["data"].alias("__data"),
        parsed["old"].alias("__old"),
        F.col(value_col).cast("string").alias("__raw"),
    )
    m = {
        "type": F.col("__type"),
        "data": F.col("__data"),
        "old": F.col("__old"),
    }
    known = m["type"].isin("INSERT", "UPDATE", "DELETE")
    check = F.assert_true(
        known | F.lit(ignore_parse_errors),
        F.concat(F.lit('Unknown "type" value in Canal JSON message: '), F.col("__raw")),
    )

    def merged_before(x: Column) -> Column:
        # null field in "old" = unchanged -> take the new row's value
        return F.struct(
            *[F.coalesce(x["old"][f], x["data"][f]).alias(f) for f in fields]
        )

    pair_t = f"array<struct<k: string, r: struct<{payload_ddl}>>>"
    pairs = (
        F.when(
            m["type"] == "INSERT",
            F.transform(m["data"], lambda r: _emit("+I", r)),
        )
        .when(
            m["type"] == "UPDATE",
            F.flatten(
                F.transform(
                    F.arrays_zip(m["data"].alias("data"), m["old"].alias("old")),
                    lambda x: F.array(
                        _emit("-U", merged_before(x)), _emit("+U", x["data"])
                    ),
                )
            ),
        )
        .when(
            m["type"] == "DELETE",
            F.transform(m["data"], lambda r: _emit("-D", r)),
        )
        .otherwise(F.array().cast(pair_t))
    )
    guarded = F.when(check.isNull(), pairs)
    exploded = out.select(F.explode(guarded).alias("e"))
    return exploded.select("e.r.*", F.col("e.k").alias(ROWKIND_COL))
