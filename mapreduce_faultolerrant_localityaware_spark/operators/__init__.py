from . import dedup, events, multimodal, relational, similarity, textstats, wordcount

__all__ = ["dedup", "events", "multimodal", "relational", "similarity", "textstats", "wordcount"]
