"""Executor-loss chaos test — the Spark analog of the reference's
crash loop (scripts/testFaultTollerance.sh:5-8, which SIGKILLs worker
processes 100 times mid-job and diffs the output).

A real multi-process cluster (``local-cluster[2,2,1024]``) runs the
iterative ``connected_components`` loop with a RELIABLE checkpoint
directory while a killer thread SIGKILLs one executor backend
mid-loop.  The job must recover (standalone worker relaunches the
executor; lost tasks re-run; lost checkpoint blocks re-read from
files) and produce labels identical to the analytically-known
components.  Runs in a subprocess: it needs its own SparkContext with
a different master than the shared test session.
"""

from __future__ import annotations

import subprocess
import sys
import textwrap

import pytest

pytestmark = [pytest.mark.slow, pytest.mark.chaos]

SCRIPT = textwrap.dedent(
    """
    import os, signal, subprocess, sys, tempfile, threading, time
    sys.path.insert(0, ".")
    from pyspark.sql import SparkSession, functions as F
    from mapreduce_faultolerrant_localityaware_spark.operators.graph import connected_components

    spark = (
        SparkSession.builder.master("local-cluster[2,2,1024]").appName("executor-chaos")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    ckpt = tempfile.mkdtemp(prefix="sparkgraft_chaos_ckpt_")
    spark.sparkContext.setCheckpointDir(ckpt)

    # blocks of 8 chained nodes: component min = id - id % 8, diameter 7
    # (enough propagation rounds that the kill lands mid-loop).
    N = 40000
    edges = (
        spark.range(N).filter("id % 8 != 7")
        .select(F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b"))
    )

    killed = []

    def killer():
        time.sleep(6)
        out = subprocess.run(
            ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
            capture_output=True, text=True,
        ).stdout.split()
        for p in out:
            # pgrep -f also matches this very script (the class name is
            # in our own argv); a real executor backend is a java proc.
            if int(p) == os.getpid():
                continue
            try:
                comm = open(f"/proc/{p}/comm").read().strip()
            except OSError:
                continue
            if comm == "java":
                os.kill(int(p), signal.SIGKILL)
                killed.append(int(p))
                break

    t = threading.Thread(target=killer)
    t.start()
    labels = connected_components(edges, max_iter=15).collect()
    t.join()

    assert killed, "chaos kill never fired (no executor backend found)"
    assert len(labels) == N, f"row count {len(labels)} != {N}"
    bad = [r for r in labels if r["cluster_id"] != r["doc_id"] - r["doc_id"] % 8]
    assert not bad, f"wrong labels after executor loss, e.g. {bad[:3]}"
    print("EXECUTOR_CHAOS_OK", len(labels), "killed_pid", killed[0])
    """
)


def test_executor_loss_mid_cc_recovers():
    proc = subprocess.run(
        [sys.executable, "-c", SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
    )
    assert "EXECUTOR_CHAOS_OK" in proc.stdout, (
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-3000:]}"
    )


ANN_SCRIPT = textwrap.dedent(
    """
    import os, signal, subprocess, sys, threading, time
    sys.path.insert(0, ".")
    from pyspark.sql import SparkSession, functions as F
    from mapreduce_faultolerrant_localityaware_spark.operators.similarity import (
        assign_cells, kmeans_fit,
    )

    spark = (
        SparkSession.builder.master("local-cluster[2,2,1024]").appName("ann-chaos")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    # deterministic synthetic embeddings: 3 integer clusters in 4-d
    def vecs(n, name):
        return spark.range(n).select(
            F.col("id").alias("vec_id"),
            F.array(
                (F.col("id") % 3 * 10 + F.col("id") % 5 / 10.0).cast("float"),
                (F.col("id") % 3 * -7 + F.col("id") % 7 / 10.0).cast("float"),
                ((F.col("id") % 3 + 1) * 4 + F.col("id") % 2 / 10.0).cast("float"),
                F.lit(1.0).cast("float"),
            ).alias("embedding"),
        )

    base, batch = vecs(4000, "base"), vecs(1500, "batch")
    # the PERSISTED quantizer: fitted once on the base corpus (its own
    # driver-side loop; run quietly, before chaos)
    centroids = kmeans_fit(base, k=3, max_iter=6)
    # quiet reference: the batch's assign-only ingest
    expected = sorted(
        (r["vec_id"], r["cell"])
        for r in assign_cells(batch, centroids).select("vec_id", "cell").collect()
    )

    killed = []

    def killer():
        time.sleep(2)
        out = subprocess.run(
            ["pgrep", "-f", "CoarseGrainedExecutorBackend"],
            capture_output=True, text=True,
        ).stdout.split()
        for p in out:
            if int(p) == os.getpid():
                continue
            try:
                comm = open(f"/proc/{p}/comm").read().strip()
            except OSError:
                continue
            if comm == "java":
                os.kill(int(p), signal.SIGKILL)
                killed.append(int(p))
                break

    # chaos run: same assign-only ingest (a broadcast codebook map —
    # lineage-recomputable, no checkpoint needed) with an executor
    # SIGKILLed mid-job; repartition + a shuffling count keep the job
    # long enough that the kill lands mid-flight
    t = threading.Thread(target=killer)
    t.start()
    got = sorted(
        (r["vec_id"], r["cell"])
        for r in assign_cells(batch.repartition(64, "vec_id"), centroids)
        .select("vec_id", "cell").collect()
    )
    t.join()

    assert killed, "chaos kill never fired (no executor backend found)"
    assert got == expected, (
        f"assignments diverged under executor loss: "
        f"{[x for x, y in zip(got, expected) if x != y][:3]}"
    )
    print("ANN_CHAOS_OK", len(got), "killed_pid", killed[0])
    """
)


def test_executor_loss_mid_ann_incremental_assign():
    """Round-11 chaos coverage (VERDICT r10 item 8): the assign-only
    incremental-ingest path must produce IDENTICAL cell assignments
    when an executor dies mid-job — the broadcast-codebook map is
    lineage-recomputable, so task retry alone must recover it."""
    proc = subprocess.run(
        [sys.executable, "-c", ANN_SCRIPT],
        capture_output=True,
        text=True,
        timeout=420,
        cwd="/root/repo",
    )
    assert "ANN_CHAOS_OK" in proc.stdout, (
        f"stdout={proc.stdout[-2000:]}\nstderr={proc.stderr[-3000:]}"
    )
