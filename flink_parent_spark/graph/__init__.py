from flink_parent_spark.graph.algorithms import (
    connected_components,
    label_propagation,
    pagerank,
    sssp_hops,
    triangle_count,
)

__all__ = [
    "connected_components",
    "pagerank",
    "sssp_hops",
    "label_propagation",
    "triangle_count",
]
