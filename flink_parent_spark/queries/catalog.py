"""Assembles the full query catalog (imports register into the registry)."""

from __future__ import annotations

import flink_parent_spark.queries.datapipe  # noqa: F401
import flink_parent_spark.queries.functions_gallery  # noqa: F401
import flink_parent_spark.queries.graph_queries  # noqa: F401
import flink_parent_spark.queries.operators_batch  # noqa: F401
import flink_parent_spark.queries.streaming_queries  # noqa: F401
import flink_parent_spark.queries.surface_extras  # noqa: F401
import flink_parent_spark.queries.tpcds_style  # noqa: F401
import flink_parent_spark.queries.tpch  # noqa: F401
import flink_parent_spark.queries.windows_time  # noqa: F401

from flink_parent_spark.queries.registry import ORACLES, QUERIES


def all_queries():
    return dict(QUERIES)


def all_oracles():
    return dict(ORACLES)
