"""Gelly Graph API surface (flink-gelly/.../graph/Graph.java re-expressed
over DataFrames): construction, degree views, transformations (map/filter/
subgraph), and binary set operations. Algorithms stay in
`graph.algorithms`; this class is the fluent surface a Gelly user touches
first (Graph.fromDataSet, getDegrees, subgraph, union, difference, ...).

Every verb returns DataFrames/Graphs built from declarative plans — one
partial-aggregated shuffle for the degree views, broadcast-free joins
keyed on vertex id for validation/filtering — so the surface carries no
scale cost beyond the underlying relational ops.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, functions as F


class Graph:
    """vertices: (id [, value]); edges: (src, dst [, weight])."""

    def __init__(self, vertices: DataFrame, edges: DataFrame):
        self.vertices = vertices
        self.edges = edges

    # -- construction (Graph.fromDataSet / fromCollection parity) ------------
    @staticmethod
    def from_edges(edges: DataFrame) -> "Graph":
        """Vertices induced from edge endpoints (Graph.fromDataSet with
        vertex auto-creation)."""
        v = (
            edges.select(F.col("src").alias("id"))
            .unionByName(edges.select(F.col("dst").alias("id")))
            .distinct()
        )
        return Graph(v, edges)

    # -- accessors -----------------------------------------------------------
    def get_vertices(self) -> DataFrame:
        return self.vertices

    def get_edges(self) -> DataFrame:
        return self.edges

    def num_vertices(self) -> int:
        return self.vertices.count()

    def num_edges(self) -> int:
        return self.edges.count()

    # -- degree views (Graph.inDegrees/outDegrees/getDegrees) ---------------
    def in_degrees(self) -> DataFrame:
        return (
            self.vertices.join(
                self.edges.groupBy(F.col("dst").alias("id")).agg(
                    F.count("*").alias("in_deg")
                ),
                "id",
                "left",
            ).select("id", F.coalesce("in_deg", F.lit(0)).alias("in_deg"))
        )

    def out_degrees(self) -> DataFrame:
        return (
            self.vertices.join(
                self.edges.groupBy(F.col("src").alias("id")).agg(
                    F.count("*").alias("out_deg")
                ),
                "id",
                "left",
            ).select("id", F.coalesce("out_deg", F.lit(0)).alias("out_deg"))
        )

    def get_degrees(self) -> DataFrame:
        return (
            self.in_degrees()
            .join(self.out_degrees(), "id")
            .select("id", (F.col("in_deg") + F.col("out_deg")).alias("degree"))
        )

    # -- transformations -----------------------------------------------------
    def map_vertices(self, fn: Callable[[Column], Column], out: str = "value") -> "Graph":
        """Graph.mapVertices: recompute the vertex value column."""
        return Graph(
            self.vertices.withColumn(out, fn(F.col("id"))), self.edges
        )

    def map_edges(self, fn: Callable[[DataFrame], Column], out: str = "weight") -> "Graph":
        """Graph.mapEdges: recompute the edge value column (fn receives the
        edge DataFrame and returns the new value column)."""
        return Graph(self.vertices, self.edges.withColumn(out, fn(self.edges)))

    def reverse(self) -> "Graph":
        """Graph.reverse: flip every edge."""
        flipped = self.edges.withColumnRenamed("src", "__t").withColumnRenamed(
            "dst", "src"
        ).withColumnRenamed("__t", "dst")
        return Graph(self.vertices, flipped.select(self.edges.columns))

    def undirected(self) -> "Graph":
        """Graph.getUndirected: add the reverse of every edge."""
        return Graph(
            self.vertices,
            self.edges.unionByName(self.reverse().edges).distinct(),
        )

    def filter_on_vertices(self, pred: Column) -> "Graph":
        """Graph.filterOnVertices: keep matching vertices and the edges
        whose BOTH endpoints survive."""
        v = self.vertices.filter(pred)
        ids = v.select("id")
        e = (
            self.edges.join(ids.withColumnRenamed("id", "src"), "src")
            .join(ids.withColumnRenamed("id", "dst"), "dst")
            .select(self.edges.columns)
        )
        return Graph(v, e)

    def filter_on_edges(self, pred: Column) -> "Graph":
        """Graph.filterOnEdges: keep matching edges, all vertices."""
        return Graph(self.vertices, self.edges.filter(pred))

    def subgraph(self, vertex_pred: Column, edge_pred: Column) -> "Graph":
        """Graph.subgraph: both filters at once."""
        return self.filter_on_vertices(vertex_pred).filter_on_edges(edge_pred)

    # -- binary ops ----------------------------------------------------------
    def union(self, other: "Graph") -> "Graph":
        """Graph.union: vertex/edge union (dedup on id / full edge row)."""
        return Graph(
            self.vertices.unionByName(other.vertices).distinct(),
            self.edges.unionByName(other.edges).distinct(),
        )

    def difference(self, other: "Graph") -> "Graph":
        """Graph.difference: remove the other graph's vertices and every
        edge touching them."""
        v = self.vertices.join(
            other.vertices.select("id"), "id", "left_anti"
        )
        ids = v.select("id")
        e = (
            self.edges.join(ids.withColumnRenamed("id", "src"), "src")
            .join(ids.withColumnRenamed("id", "dst"), "dst")
            .select(self.edges.columns)
        )
        return Graph(v, e)

    def intersect(self, other: "Graph") -> "Graph":
        """Graph.intersect: edges present in both graphs (distinct
        semantics), vertices induced."""
        e = self.edges.select("src", "dst").intersect(
            other.edges.select("src", "dst")
        )
        return Graph.from_edges(e)

    def validate(self) -> bool:
        """InvalidVertexIdsValidator parity: every edge endpoint exists in
        the vertex set."""
        ids = self.vertices.select("id")
        dangling = (
            self.edges.select(F.col("src").alias("id"))
            .unionByName(self.edges.select(F.col("dst").alias("id")))
            .distinct()
            .join(ids, "id", "left_anti")
        )
        return dangling.isEmpty()
