"""Assembles the full query catalog (imports register into the registry)."""

from __future__ import annotations

import flink_parent_spark.queries.datapipe  # noqa: F401
import flink_parent_spark.queries.differential_gate  # noqa: F401
import flink_parent_spark.queries.functions_gallery  # noqa: F401
import flink_parent_spark.queries.graph_queries  # noqa: F401
import flink_parent_spark.queries.operators_batch  # noqa: F401
import flink_parent_spark.queries.stream_fuzz  # noqa: F401
import flink_parent_spark.queries.streaming_queries  # noqa: F401
import flink_parent_spark.queries.surface_extras  # noqa: F401
import flink_parent_spark.queries.tpcds_real  # noqa: F401
import flink_parent_spark.queries.tpcds_style  # noqa: F401
import flink_parent_spark.queries.tpch  # noqa: F401
import flink_parent_spark.queries.windows_time  # noqa: F401

from flink_parent_spark.queries.registry import ORACLES, QUERIES

# The driver's correctness gate verifies a prefix (first 50) of the
# registration order. Emit these first so that prefix holds at least one
# representative of every SURVEY §2 operator family (tpch, stream windows,
# stateful streaming, cep, match_recognize, topn/dedup, setops, over,
# joins, aggs, batch windows, graph, datapipe, functions, udf, tpcds,
# sinks) PLUS a rotating 10-text differential-fuzz sample (see
# differential_gate.ROTATION); everything not listed follows in
# module-import order. `_ROTATED_OUT` below names the 10 entries the fuzz
# sample displaced from the 50-slot prefix this round — they stay in
# PRIORITY right after slot 50 (each family keeps >=1 in-gate
# representative) and remain value-oracle-checked in pytest.
_GATE_CORE: tuple[str, ...] = (
    # tpch
    "tpch_q1",
    "tpch_q3",
    "tpch_q18",
    # stream group windows (r12: the session window rotates out for the
    # new count-SLIDING window operator's gate debut; session stays
    # oracle-checked in pytest/_ROTATED_OUT and via window_session_*)
    "stream_tumble_agg",
    "stream_count_window_sliding",
    # stateful streaming
    "stream_retract_topn",
    "stream_topn_updatable",
    "changelog_latest_value_by_type",
    "stream_dedup_first",
    # rank-pattern recognition: same Top-N state op as stream_topn_per_type
    # but planned from the ROW_NUMBER SQL idiom (FlinkLogicalRankRule parity)
    "sql_stream_topn_rank",
    # streaming joins
    "stream_interval_join",
    "stream_asof_join",
    "stream_retract_join",
    # cep (r12: the negative pattern rotates out for the new three-stage
    # retraction-chain fuzz shape's gate slot)
    "cep_signup_then_purchase",
    "streamfuzz_chain_0",
    # match_recognize (r14: the SQL-TEXT STATEMENT entry point debuts in
    # the gate — `SELECT ... FROM t MATCH_RECOGNIZE (...) AS T` through
    # TableEnvironment.sql_query, the reference's primary MR entry; the
    # clause-body surface query rotates to _ROTATED_OUT, still exercised
    # underneath this one and oracle-checked in pytest)
    "match_recognize_statement_sql",
    "match_recognize_agg_measures",
    # Flink-SQL group-window dialect
    "sql_tumble_hourly",
    # batch topn
    "topn_orders_per_customer",
    # set operations
    "setop_union_distinct",
    # over windows (r12: the sum+count fuzz draw rotated out for the
    # MIXED-aggregate streaming OVER; late-r12 the mixed-agg entry itself
    # rotates for the COMPLETED declarative set — VAR/STDDEV + COUNT
    # DISTINCT + LAG over the unbounded frame's persistent accumulators;
    # mixed_aggs stays oracle-checked in pytest and _ROTATED_OUT)
    "over_running_agg",
    "stream_over_var_distinct",
    # batch joins
    "semi_join_customers_with_orders",
    "anti_join_customers_without_orders",
    # aggregations
    "grouping_sets_lineitem",
    "agg_distinct_mixed",
    # batch time windows
    "window_session_dynamic_gap",
    # graph (r14: pagerank rotates to _ROTATED_OUT to free the windowed-
    # flatAggregate slot; connected components keeps the family's gate
    # representative)
    "graph_connected_components",
    # windowed TableAggregateFunction (r13's operator, promoted r14 per
    # the verdict's suggestion — arbitrary per-(window, key) emission)
    "window_flat_aggregate_top2",
    # datapipe (r13: exact-digest dedup rotates out for the MR-aggregate
    # gate slot; stays oracle-checked in pytest and _ROTATED_OUT)
    "text_repetition_stats",
    "dedup_minhash_lsh_pairs",
    "ann_cosine_topk_ivf_kmeans",
    "multimodal_frame_sample",
    # scalar-function gallery
    "fn_math",
    "fn_collections",
    # CDC changelog format (round-5)
    "format_debezium_json",
    # udf surface
    "udf_scalar_pandas",
    # REAL TPC-DS query texts on the real schema (round 6; the shape
    # battery stays oracle-checked outside the prefix; r11: q36 rotates
    # out to make room for the 11th diff family's gate slot)
    "tpcds_q3",
    # sinks/sources
    "sink_partitioned_roundtrip",
)

from flink_parent_spark.queries.differential_gate import GATE_NAMES  # noqa: E402

# Displaced from the 50-slot gate prefix by this round's fuzz rotation;
# immediately follow the prefix so they re-enter whenever the rotation
# frees slots. All remain pytest-oracle-checked every round.
_ROTATED_OUT: tuple[str, ...] = (
    # r14 displacements
    "match_recognize_sql_clause",
    "graph_pagerank",
    # r13 displacement
    "dedup_exact_digest",
    # r12 displacements
    "stream_session_window",
    "cep_not_followed_by",
    "streamfuzz_over_0",
    "stream_over_mixed_aggs",
    # carried from earlier rotations
    "tpcds_q36",
    "over_rank_functions",
    "stream_hop_window",
    "changelog_source_normalize",
    "stream_semi_join",
    "stream_cep_watermark_held",
    "match_recognize_within",
    "match_recognize_skip_to_var",
    "dedup_simhash",
    "ann_ivf_pq_topk",
    "embedding_neardup_pairs",
    "tpcds_q51",
)

PRIORITY: tuple[str, ...] = _GATE_CORE + tuple(GATE_NAMES) + _ROTATED_OUT
if len(_GATE_CORE) + len(GATE_NAMES) != 50:
    # explicit raise (not assert): must survive `python -O`
    raise RuntimeError(
        f"gate prefix must be exactly 50, got {len(_GATE_CORE) + len(GATE_NAMES)}"
    )


def _prioritized(mapping: dict) -> dict:
    head = {k: mapping[k] for k in PRIORITY if k in mapping}
    return head | {k: v for k, v in mapping.items() if k not in head}


def all_queries():
    missing = [k for k in PRIORITY if k not in QUERIES]
    assert not missing, f"PRIORITY names unknown queries: {missing}"
    return _prioritized(QUERIES)


def all_oracles():
    return _prioritized(ORACLES)
