"""Word-count slice tests — the reference's end-to-end query, checked
against a pure-Python Counter oracle that replicates the reference's
sequential oracle (test/genSequentiallyTokens.go:107-135) with the
exact tokenizer semantics of SURVEY Q2 (core/map_reduce.go:543-546:
split on non-letter runs, case-sensitive, empties dropped).
"""

from __future__ import annotations

import glob
import os
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mapreduce_faultolerrant_localityaware_spark.operators.wordcount import (
    wordcount,
    wordcount_from_text,
)
from mapreduce_faultolerrant_localityaware_spark.sources.scans import scan
from mapreduce_faultolerrant_localityaware_spark.sources.sinks import format_tokens

# runs of unicode letters: [^\W\d_] ≈ \p{L} ≈ Go unicode.IsLetter
_SPLIT = re.compile(r"[^\W\d_]+", re.UNICODE)


def _py_wordcount(texts):
    c = Counter()
    for t in texts:
        c.update(m.group(0) for m in _SPLIT.finditer(t))
    return c


def test_wordcount_matches_counter_oracle(spark, sf_dir):
    docs = scan(spark, sf_dir, "documents")
    got = {r["word"]: r["count"] for r in wordcount_from_text(docs, "text").collect()}
    texts = [r["text"] for r in docs.select("text").collect()]
    want = _py_wordcount(texts)
    assert got == dict(want)


def test_wordcount_q2_semantics(spark):
    # SURVEY Q2: don't → don,t; digits separate; case-sensitive; unicode kept
    df = spark.createDataFrame(
        [("He said don't, 2nd time — più sì è He he",)], ["value"]
    )
    got = {r["word"]: r["count"] for r in wordcount_from_text(df, "value").collect()}
    assert got == {
        "He": 2, "said": 1, "don": 1, "t": 1, "nd": 1, "time": 1,
        "più": 1, "sì": 1, "è": 1, "he": 1,
    }


def test_wordcount_sort_is_deterministic(spark):
    # Q4: count DESC then word ASC tiebreak
    df = spark.createDataFrame([("b b a a c",)], ["value"])
    rows = wordcount_from_text(df, "value").collect()
    assert [(r["word"], r["count"]) for r in rows] == [("a", 2), ("b", 2), ("c", 1)]


@pytest.mark.skipif(
    not glob.glob("/root/reference/txtSrc/*.txt"),
    reason="reference corpus not present",
)
def test_wordcount_reference_corpus(spark):
    """Reference-workload reproduction (BASELINE.md): word count of the
    actual ~2 MB Gutenberg corpus, checked vs the Counter oracle."""
    paths = sorted(glob.glob("/root/reference/txtSrc/*.txt"))
    got = {r["word"]: r["count"] for r in wordcount(spark, paths).collect()}
    texts = []
    for p in paths:
        with open(p, encoding="utf-8", errors="replace") as fh:
            texts.append(fh.read())
    # tokens never span newlines, so line-based reading agrees exactly
    want = _py_wordcount(texts)
    assert got == dict(want)


def test_token_sink_format():
    # Q5: K->V joined by CRLF (core/utils.go:720)
    assert format_tokens([("the", 3), ("a", 1)]) == "the->3\r\na->1"


def test_wordcount_plan_has_partial_agg(spark, sf_dir):
    """The reference's two combiner levels (core/map_reduce.go:548-550,
    core/workerStruct.go:254-293) must appear as partial aggregation
    before the exchange."""
    docs = scan(spark, sf_dir, "documents")
    plan = wordcount_from_text(docs, "text")._jdf.queryExecution().executedPlan().toString()
    assert "HashAggregate" in plan
