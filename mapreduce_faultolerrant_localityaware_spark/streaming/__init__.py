from .enrich_stream import (
    dedup_stream,
    enrich_stream,
    fuzzy_dedup_stream,
    incremental_dedup_stream,
    interval_join_streams,
    sliding_event_counts,
)
from .materialize import run_to_batch, stream_table
from .sessionize_stream import sessionize_stream
from .wordcount_stream import (
    ohlc_stream,
    quality_filter_stream,
    streaming_wordcount,
    windowed_event_counts,
)

__all__ = [
    "dedup_stream",
    "enrich_stream",
    "fuzzy_dedup_stream",
    "incremental_dedup_stream",
    "interval_join_streams",
    "ohlc_stream",
    "quality_filter_stream",
    "run_to_batch",
    "sessionize_stream",
    "sliding_event_counts",
    "stream_table",
    "streaming_wordcount",
    "windowed_event_counts",
]
