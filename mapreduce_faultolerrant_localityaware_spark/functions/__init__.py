from .text import (
    EN_STOPWORDS,
    IT_STOPWORDS,
    TOKEN_SPLIT_RE,
    normalized_text,
    shingles,
    stopword_hits,
    tokens,
)
from .vectors import cosine_similarity, dot, l2_norm

__all__ = [
    "EN_STOPWORDS",
    "IT_STOPWORDS",
    "TOKEN_SPLIT_RE",
    "normalized_text",
    "shingles",
    "stopword_hits",
    "tokens",
    "cosine_similarity",
    "dot",
    "l2_norm",
]
