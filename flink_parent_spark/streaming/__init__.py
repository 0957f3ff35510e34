from flink_parent_spark.streaming.core import stream_table, run_stream_to_df

__all__ = ["stream_table", "run_stream_to_df"]
