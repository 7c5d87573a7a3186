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
