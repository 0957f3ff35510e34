from flink_parent_spark.sources.formats import read_table, write_table

__all__ = ["read_table", "write_table"]
