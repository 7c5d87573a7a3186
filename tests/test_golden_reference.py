"""Structural diff against the reference's COMMITTED golden outputs —
the O14 analog (SURVEY §2.1).

The reference generates goldens with test/genSequentiallyTokens.go:
  * outTokensSingleAggreagation.list — single-pass Map_parse_builtin
    over txtSrc/1012-0.txt (core/utils.go:107 FILENAMES_LOCL), i.e.
    the CLEAN tokenization: runs of unicode.IsLetter, case-sensitive
    (core/map_reduce.go:543-546).  Our engine must match it EXACTLY.
  * outTokens.list — chunked concurrentMap over the concatenated
    corpus (txtSrc/ALL.txt): CHUNK_SIZE=32768 byte slices cut words at
    chunk boundaries, so the reference's own test tolerates
    ≈3×chunk-count value mismatches and 2×chunk-count missing keys
    (test/map_red_test.go:52-58, SURVEY Q3).  We apply the same
    tolerance against our clean aggregation.

Golden format: ``K->V`` lines (test/genSequentiallyTokens.go:93-106;
parsed here by sources.scans.scan_tokens).
"""

from __future__ import annotations

import math
import os

import pytest

from mapreduce_faultolerrant_localityaware_spark.operators.wordcount import wordcount
from mapreduce_faultolerrant_localityaware_spark.sources.scans import scan_tokens

REF = "/root/reference"
TXT = os.path.join(REF, "txtSrc")
CHUNK_SIZE = 32768  # configurations/config.json:14

needs_reference = pytest.mark.skipif(
    not os.path.isdir(TXT), reason="reference corpus not available"
)


def _golden(spark, name):
    return {
        r["word"]: r["count"]
        for r in scan_tokens(spark, os.path.join(REF, name)).collect()
    }


@needs_reference
def test_golden_single_aggregation_exact(spark):
    """Engine wordcount of 1012-0.txt == committed single-pass golden,
    key for key, count for count (no tolerance needed: line-based
    reading never splits words, matching the unchunked reference run)."""
    got = {
        r["word"]: r["count"]
        for r in wordcount(spark, os.path.join(TXT, "1012-0.txt"), sort=False).collect()
    }
    want = _golden(spark, "outTokensSingleAggreagation.list")
    assert got == want


@needs_reference
def test_golden_chunked_run_within_reference_tolerance(spark):
    """Committed chunked-run golden (outTokens.list) vs our clean
    aggregation of the same corpus, under the reference's OWN noise
    budget: ≤3×chunks value mismatches, ≤2×chunks keys absent either
    way (test/map_red_test.go:52-58)."""
    files = sorted(
        os.path.join(TXT, f) for f in os.listdir(TXT) if f.endswith(".txt")
    )
    total_bytes = sum(os.path.getsize(f) for f in files)
    n_chunks = math.ceil(total_bytes / CHUNK_SIZE)

    got = {
        r["word"]: r["count"] for r in wordcount(spark, files, sort=False).collect()
    }
    want = _golden(spark, "outTokens.list")

    value_mismatches = sum(1 for k, v in want.items() if k in got and got[k] != v)
    not_found = sum(1 for k in want if k not in got) + sum(
        1 for k in got if k not in want
    )
    assert value_mismatches <= 3 * n_chunks, (value_mismatches, n_chunks)
    assert not_found <= 2 * n_chunks, (not_found, n_chunks)
    # and the overwhelming majority of tokens agree exactly
    agree = sum(1 for k, v in want.items() if got.get(k) == v)
    assert agree / len(want) > 0.99
