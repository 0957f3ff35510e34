from flink_parent_spark.api.table_env import TableEnvironment, Table

__all__ = ["TableEnvironment", "Table"]
