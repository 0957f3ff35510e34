from flink_parent_spark.functions.registry import register_flink_functions

__all__ = ["register_flink_functions"]
