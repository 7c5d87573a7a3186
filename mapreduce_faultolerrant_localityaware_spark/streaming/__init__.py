from .enrich_stream import dedup_stream, enrich_stream, sliding_event_counts
from .sessionize_stream import sessionize_stream
from .wordcount_stream import streaming_wordcount, windowed_event_counts

__all__ = [
    "dedup_stream",
    "enrich_stream",
    "sessionize_stream",
    "sliding_event_counts",
    "streaming_wordcount",
    "windowed_event_counts",
]
