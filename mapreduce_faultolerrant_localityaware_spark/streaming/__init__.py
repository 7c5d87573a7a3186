from .wordcount_stream import streaming_wordcount, windowed_event_counts

__all__ = ["streaming_wordcount", "windowed_event_counts"]
