"""Property-based tests (hypothesis): the tokenizer against the pure-
Python regex oracle on arbitrary unicode, and asof_join against a
brute-force per-row oracle on random event sets.

Few examples, batched rows per example — each hypothesis example costs
a Spark job, so the budget goes to input diversity, not example count.
"""

from __future__ import annotations

from collections import Counter
from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

import unicodedata

from mapreduce_faultolerrant_localityaware_spark.operators.temporal import asof_join
from mapreduce_faultolerrant_localityaware_spark.operators.wordcount import wordcount_from_text


def _py_tokens(text: str) -> list[str]:
    """EXACT reference semantics: runs of category-L* characters
    (Go unicode.IsLetter, core/map_reduce.go:543-546).  NOT the regex
    ``[^\\W\\d_]`` — Python's \\w over-matches No/Nl number-letters
    ('²', '𐳺') that Go and Java \\p{L} correctly reject."""
    out, cur = [], []
    for ch in text:
        if unicodedata.category(ch).startswith("L"):
            cur.append(ch)
        elif cur:
            out.append("".join(cur))
            cur = []
    if cur:
        out.append("".join(cur))
    return out


# Alphabet bounded to Unicode-version-STABLE ranges.  Python 3.11
# carries Unicode 14 tables, Java 17 carries Unicode 13: any letter
# assigned between the two (e.g. U+0870 Arabic Ext-B, added in 14)
# is a letter to the oracle but unassigned (non-letter) to the JVM —
# table-version skew, not tokenizer logic.  These blocks have had
# stable Letter assignments for 20+ years.
_char_ranges = [
    (0x0020, 0x02FF),  # ASCII, Latin-1, Latin Ext-A/B, IPA
    (0x0370, 0x03FF),  # Greek
    (0x0400, 0x04FF),  # Cyrillic
    (0x0590, 0x05EA),  # Hebrew
    (0x0620, 0x064A),  # Arabic core letters
    (0x1E00, 0x1EFF),  # Latin Extended Additional
    (0x2000, 0x206F),  # general punctuation
    (0x4E00, 0x4FFF),  # CJK unified (subset)
]
_texts = st.lists(
    st.text(
        alphabet=st.one_of(*[st.characters(min_codepoint=lo, max_codepoint=hi) for lo, hi in _char_ranges]),
        max_size=60,
    ),
    min_size=1,
    max_size=15,
)

_slow = settings(
    max_examples=5, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture]
)


@_slow
@given(texts=_texts)
def test_tokenizer_matches_python_oracle(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], ["value"])
    got = {r["word"]: r["count"] for r in wordcount_from_text(df, sort=False).collect()}
    want = Counter()
    for t in texts:
        want.update(_py_tokens(t))
    assert got == dict(want)


_events = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 100)),  # (key, minutes offset)
    min_size=1,
    max_size=25,
)


@_slow
@given(left=_events, right=_events)
def test_asof_join_matches_bruteforce(spark, left, right):
    base = datetime(2024, 1, 1)
    lrows = [(i, k, base + timedelta(minutes=m)) for i, (k, m) in enumerate(left)]
    rrows = [(k, base + timedelta(minutes=m), 1000 + i) for i, (k, m) in enumerate(right)]
    ldf = spark.createDataFrame(lrows, ["id", "key", "ts"])
    rdf = spark.createDataFrame(rrows, ["key", "ts", "payload"])
    got = {
        r["id"]: r["payload"]
        for r in asof_join(ldf, rdf, on=["key"], payload=["payload"]).collect()
    }
    want = {}
    for lid, lk, lts in lrows:
        cands = [(rts, p) for rk, rts, p in rrows if rk == lk and rts <= lts]
        if cands:
            # greatest ts; ties → greatest payload (operator's documented tiebreak)
            want[lid] = max(cands)[1]
    assert got == want
