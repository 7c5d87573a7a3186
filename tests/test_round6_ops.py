"""Round-6 operators: end-to-end dedup pipeline, PQ-ANN, bucketed
mixture sampling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_faultolerrant_localityaware_spark.operators import dedup


def test_dedup_pipeline_clusters_and_representatives(spark):
    base = "the quick brown fox jumps over the lazy dog and runs far away today"
    rows = [
        (1, base),
        (2, base),                        # exact dup of 1
        (3, base + " with a tiny tail"),  # near-dup of 1/2
        (4, "completely unrelated legal boilerplate about contracts and parties"),
        (5, "another totally distinct document on astronomy stars and planets"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r for r in dedup.dedup_pipeline(df, threshold=0.5).collect()}
    assert set(out) == {1, 2, 3, 4, 5}
    # 1,2 verified duplicates clustered under min id 1; rep keeps
    assert out[1]["cluster_id"] == 1 and out[1]["keep"]
    assert out[2]["cluster_id"] == 1 and not out[2]["keep"]
    # singletons are their own cluster and kept
    for d in (4, 5):
        assert out[d]["cluster_id"] == d and out[d]["keep"] and out[d]["n_cluster"] == 1
    # near-dup 3: either joins the cluster (if jaccard>=0.5) or stands alone,
    # but n_cluster must be consistent with membership
    sizes = {}
    for r in out.values():
        sizes.setdefault(r["cluster_id"], 0)
        sizes[r["cluster_id"]] += 1
    for r in out.values():
        assert r["n_cluster"] == sizes[r["cluster_id"]]


def test_dedup_pipeline_verify_gate_blocks_spurious_candidates(spark):
    # two docs engineered to share an LSH band only if truly similar:
    # unrelated docs must never end up in one cluster even when LSH
    # emits a spurious candidate, because the Jaccard verify gates it
    # letters-only variation — the tokenizer strips digits, so numeric
    # suffixes would collapse every doc to the same token stream
    words = ["alpha", "bravo", "charlie", "delta", "echo", "foxtrot", "golf",
             "hotel", "india", "juliet", "kilo", "lima", "mike", "november",
             "oscar", "papa", "quebec", "romeo", "sierra", "tango"]
    rows = [
        (i, f"document {w} about {w}ish {w}ology {w}ness {w}ism topic {w}like")
        for i, w in enumerate(words)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = dedup.dedup_pipeline(df, threshold=0.8).collect()
    assert all(r["n_cluster"] == 1 and r["keep"] for r in out)
