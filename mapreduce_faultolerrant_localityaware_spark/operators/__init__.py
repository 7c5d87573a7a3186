from . import dedup, multimodal, relational, similarity, textstats, wordcount

__all__ = ["dedup", "multimodal", "relational", "similarity", "textstats", "wordcount"]
