from tabular_to_parquet_spark.streaming.streams import (
    stream_convert_directory,
    windowed_event_stats,
)

__all__ = ["stream_convert_directory", "windowed_event_stats"]
