"""debezium-json / canal-json CDC format tests — semantics mirrored from
DebeziumJsonDeserializationSchemaTest / CanalJsonDeserializationSchemaTest
(flink-formats/flink-json), message shapes per the public Debezium/Canal
wire formats."""

from __future__ import annotations

import json

import pytest

from flink_parent_spark.sources.changelog_formats import (
    canal_json_to_changelog,
    debezium_json_to_changelog,
)
from flink_parent_spark.streaming.changelog import ROWKIND_COL

PAYLOAD = "id BIGINT, name STRING, weight DOUBLE"


def _df(spark, messages):
    return spark.createDataFrame([(m,) for m in messages], "value string")


def dbz(op, before=None, after=None):
    return json.dumps({"before": before, "after": after, "op": op})


def test_debezium_insert_update_delete(spark):
    msgs = [
        dbz("c", after={"id": 1, "name": "scooter", "weight": 3.14}),
        dbz("r", after={"id": 2, "name": "car", "weight": 8.1}),
        dbz(
            "u",
            before={"id": 1, "name": "scooter", "weight": 3.14},
            after={"id": 1, "name": "scooter", "weight": 5.18},
        ),
        dbz("d", before={"id": 2, "name": "car", "weight": 8.1}),
        None,  # tombstone -> skipped
        "",  # empty -> skipped
    ]
    out = debezium_json_to_changelog(_df(spark, msgs), "value", PAYLOAD)
    rows = [(r["id"], r["weight"], r[ROWKIND_COL]) for r in out.collect()]
    assert sorted(rows) == sorted(
        [
            (1, 3.14, "+I"),
            (2, 8.1, "+I"),
            (1, 3.14, "-U"),
            (1, 5.18, "+U"),
            (2, 8.1, "-D"),
        ]
    )


def test_debezium_schema_include_unwraps_payload(spark):
    msg = json.dumps(
        {
            "schema": {"type": "struct"},
            "payload": {
                "before": None,
                "after": {"id": 7, "name": "x", "weight": 1.0},
                "op": "c",
            },
        }
    )
    out = debezium_json_to_changelog(
        _df(spark, [msg]), "value", PAYLOAD, schema_include=True
    )
    r = out.collect()
    assert len(r) == 1 and r[0]["id"] == 7 and r[0][ROWKIND_COL] == "+I"


def test_debezium_null_before_on_update_raises(spark):
    msg = dbz("u", before=None, after={"id": 1, "name": "a", "weight": 1.0})
    out = debezium_json_to_changelog(_df(spark, [msg]), "value", PAYLOAD)
    with pytest.raises(Exception, match="REPLICA IDENTITY"):
        out.collect()


def test_debezium_unknown_op_raises_unless_ignored(spark):
    msg = dbz("z", after={"id": 1, "name": "a", "weight": 1.0})
    strict = debezium_json_to_changelog(_df(spark, [msg]), "value", PAYLOAD)
    with pytest.raises(Exception, match="Unknown"):
        strict.collect()
    lax = debezium_json_to_changelog(
        _df(spark, [msg]), "value", PAYLOAD, ignore_parse_errors=True
    )
    assert lax.collect() == []


def canal(type_, data, old=None):
    return json.dumps({"data": data, "old": old, "type": type_})


def test_canal_insert_update_delete_with_partial_old(spark):
    msgs = [
        canal(
            "INSERT",
            [
                {"id": 1, "name": "scooter", "weight": 3.14},
                {"id": 2, "name": "car", "weight": 8.1},
            ],
        ),
        # old carries ONLY changed fields; null name/id mean "unchanged"
        canal(
            "UPDATE",
            [{"id": 1, "name": "scooter", "weight": 5.18}],
            old=[{"id": None, "name": None, "weight": 3.14}],
        ),
        canal("DELETE", [{"id": 2, "name": "car", "weight": 8.1}]),
    ]
    out = canal_json_to_changelog(_df(spark, msgs), "value", PAYLOAD)
    rows = [(r["id"], r["name"], r["weight"], r[ROWKIND_COL]) for r in out.collect()]
    assert sorted(rows) == sorted(
        [
            (1, "scooter", 3.14, "+I"),
            (2, "car", 8.1, "+I"),
            (1, "scooter", 3.14, "-U"),  # merged: unchanged fields from new row
            (1, "scooter", 5.18, "+U"),
            (2, "car", 8.1, "-D"),
        ]
    )


def test_canal_unknown_type_raises_unless_ignored(spark):
    msg = canal("TRUNCATE", [{"id": 1, "name": "a", "weight": 1.0}])
    with pytest.raises(Exception, match="Unknown"):
        canal_json_to_changelog(_df(spark, [msg]), "value", PAYLOAD).collect()
    lax = canal_json_to_changelog(
        _df(spark, [msg]), "value", PAYLOAD, ignore_parse_errors=True
    )
    assert lax.collect() == []


def test_debezium_feeds_changelog_normalize(spark):
    """End-to-end: CDC messages -> RowKind relation -> latest-value
    normalization (the reference's format -> ChangelogNormalize wiring)."""

    msgs = [
        dbz("c", after={"id": 1, "name": "a", "weight": 1.0}),
        dbz(
            "u",
            before={"id": 1, "name": "a", "weight": 1.0},
            after={"id": 1, "name": "a", "weight": 2.0},
        ),
        dbz("c", after={"id": 2, "name": "b", "weight": 9.0}),
        dbz("d", before={"id": 2, "name": "b", "weight": 9.0}),
    ]
    tagged = debezium_json_to_changelog(_df(spark, msgs), "value", PAYLOAD)
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    # batch materialization of the live table: last event per key wins,
    # key survives only if that event accumulates (+I/+U)
    ordered = tagged.withColumn("seq", F.monotonically_increasing_id())
    w = Window.partitionBy("id").orderBy(F.desc("seq"))
    live = (
        ordered.withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & F.col(ROWKIND_COL).isin("+I", "+U"))
    )
    rows = [(r["id"], r["weight"]) for r in live.collect()]
    assert rows == [(1, 2.0)]


def test_cdc_parsers_survive_bare_count(spark):
    """Regression: a bare count() over the CDC parse plan prunes every
    output column; Spark's GeneratorNestedColumnAliasing mis-prunes nested
    from_json fields referenced only inside the generator
    (INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND) unless the envelope fields are
    extracted to top-level columns first."""
    from flink_parent_spark.sources.changelog_formats import (
        canal_json_to_changelog,
        debezium_json_to_changelog,
    )

    dbz = spark.createDataFrame(
        [('{"before": null, "after": {"id": 1}, "op": "c"}',),
         ('{"before": {"id": 1}, "after": {"id": 1}, "op": "u"}',)],
        "value string",
    )
    assert debezium_json_to_changelog(dbz, "value", "id BIGINT").count() == 3

    canal = spark.createDataFrame(
        [('{"data": [{"id": 1}], "old": null, "type": "INSERT"}',),
         ('{"data": [{"id": 1}], "old": [{"id": null}], "type": "UPDATE"}',)],
        "value string",
    )
    assert canal_json_to_changelog(canal, "value", "id BIGINT").count() == 3
