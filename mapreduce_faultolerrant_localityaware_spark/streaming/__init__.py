from .sessionize_stream import sessionize_stream
from .wordcount_stream import streaming_wordcount, windowed_event_counts

__all__ = ["sessionize_stream", "streaming_wordcount", "windowed_event_counts"]
