"""Shared one-evaluation materialization for multi-consumer frames.

AQE does NOT reuse a shared aggregate stage across plan branches — a
frame consumed by k sibling branches (a scalar min/max attach, a cell
totals aggregate, a join-back) compiles into k copies of its subtree,
and the base table is SCANNED k times per execution (measured in round
11 with a minimal probe; tools/scan_multiplicity.py audits the whole
surface).  At 100 TB every duplicated branch is a full corpus read.

``materialize_once`` is the engine-wide discipline for those frames
(the js_divergence round-11 fix, generalized): an EAGER checkpoint —
the frame computes EXACTLY ONCE at construction and persists its
blocks, and every consumer (same action or later jobs) reads the
blocks instead of re-deriving them.  Eager, not lazy (round-11
optimization pass, interleaved A/B at sf0.1): with ``eager=False``
the RDD is only MARKED for persistence, and AQE submits independent
downstream query stages CONCURRENTLY — two consumers racing before
any block exists each compute the full lineage (duplicate work, then
a double-caching race); measured on the rank family the eager form is
20–25 % faster end-to-end (roc_auc 1.88→1.47 s, kruskal_wallis
1.78→1.31 s, lift_table 3.02→2.24 s warm) at identical semantics.
Under AQE the lazy form already ran the frame's shuffle stages at
construction (resolving the checkpoint RDD finalizes the adaptive
plan), so eager only moves the small final stage earlier: builders
(bench, slopes) that time ``query_fn(spark, sf)`` inside the
stopwatch still charge all the work to the query; plan-only tools
(pin_exchanges, dump_plans) execute these small subtrees at the test
SF, a deliberate trade for the N× scan savings at run time.  Reliable
checkpoint when the session has a checkpoint dir (chaos/loss tests:
blocks survive executor death), localCheckpoint otherwise; blocks and
reliable files age out via the ContextCleaner
(``spark.cleaner.referenceTracking.cleanCheckpoints`` in session.py).

Use it ONLY on bounded or collapsed frames (domain tables, per-entity
aggregates, codebooks) — never on raw document/text frames, where the
materialization itself would be the PB-scale cost (the dedup.py
lesson).  For iterative loops that need an EAGER per-round barrier,
keep :func:`..operators.graph._truncate_lineage`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def materialize_once(df: DataFrame) -> DataFrame:
    """Return ``df`` backed by an eagerly-checkpointed RDD: computed
    exactly once across ALL consumers, with lineage severed."""
    try:
        reliable = (
            df.sparkSession.sparkContext._jsc.sc().getCheckpointDir().isDefined()
        )
    except Exception:  # noqa: BLE001
        reliable = False
    return df.checkpoint(eager=True) if reliable else df.localCheckpoint(eager=True)
