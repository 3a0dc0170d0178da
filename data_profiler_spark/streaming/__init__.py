from data_profiler_spark.streaming.stream_validate import validate_stream

__all__ = ["validate_stream"]
