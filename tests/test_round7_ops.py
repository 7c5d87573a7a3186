"""Round-7 additions: edit-distance empty-text guard, serialized
query-surface outputs, and the merge-upsert tie-break contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_faultolerrant_localityaware_spark.operators import dedup


def test_dedup_editdist_empty_texts_sim_one(spark):
    """Two docs whose normalized text is empty SimHash identically and
    band-match; edit_sim must be 1.0 (identical empties), not NULL or
    an ANSI divide-by-zero (round-6 advice)."""
    df = spark.createDataFrame(
        [(1, "   "), (2, "\t  \n"), (3, "real words here")],
        ["doc_id", "text"],
    )
    out = dedup.dedup_editdist(df, max_dist=64, max_hamming=3).collect()
    pairs = {(r["doc_a"], r["doc_b"]): r for r in out}
    assert (1, 2) in pairs
    r = pairs[(1, 2)]
    assert r["dist"] == 0
    assert r["edit_sim"] == 1.0
    assert all(p["edit_sim"] is not None for p in out)


def test_merge_upsert_delta_wins_version_tie(spark):
    """The engine's documented contract: on a version tie the delta row
    wins.  Pinned here (the entry query never ties, so only this test
    exercises the branch)."""
    from mapreduce_faultolerrant_localityaware_spark.operators.relational import merge_upsert

    base = spark.createDataFrame([(1, "old", 5)], ["doc_id", "text", "version"])
    delta = spark.createDataFrame([(1, "new", 5)], ["doc_id", "text", "version"])
    out = merge_upsert(base, delta, key="doc_id", version_col="version").collect()
    assert len(out) == 1
    assert out[0]["text"] == "new"
