"""Cross-process concurrent-writer proof for the commit CAS.

Round-2 covered writer conflicts with an in-process monkeypatched racer;
this drives TWO real OS processes (separate JVMs, separate SparkSessions)
merging different epochs into ONE table through the real filesystem: the
``os.link`` create-exclusive commit file is the only arbiter. Both batches
must land exactly once, the loser must replan+retry (not corrupt or drop
its fences/lineage), and HEAD must end at the sum of commits."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap
import time

from pyspark.sql.types import LongType, StringType, StructField, StructType

from etl_spark.table import LakeTable

SCHEMA = StructType(
    [
        StructField("doc_id", StringType(), False),
        StructField("value_cents", LongType(), True),
        StructField("source", StringType(), True),
    ]
)

_WRITER = textwrap.dedent(
    """
    import os, sys, time
    sys.path.insert(0, {repo!r})
    table_dir, epoch, barrier = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    from etl_spark.session import build_session
    from etl_spark.operators.merge import merge_batch
    from etl_spark.table import LakeTable

    spark = build_session(
        app_name=f"writer-{{epoch}}",
        master="local[2]",
        shuffle_partitions=4,
        extra_conf={{"spark.ui.enabled": "false"}},
    )
    rows = [(f"e{{epoch}}-k{{i:03d}}", epoch * 1000 + i, 0, "U", i, f"w{{epoch}}") for i in range(50)]
    batch = spark.createDataFrame(
        rows, "doc_id string, commit_lsn long, op_seq int, op string, value_cents long, source string"
    )
    table = LakeTable(spark, table_dir)
    # rendezvous: both writers signal readiness, then merge simultaneously
    open(f"{{barrier}}.ready{{epoch}}", "w").close()
    while not os.path.exists(barrier):
        time.sleep(0.05)
    r = merge_batch(table, batch, epoch=epoch)
    print(f"RESULT epoch={{epoch}} applied={{r.applied}} ups={{r.rows_upserted}} sid={{r.snapshot_id}}")
    spark.stop()
    """
)


def test_two_os_processes_commit_exactly_once(spark, tmp_table_dir, tmp_path):
    table = LakeTable.create_if_absent(spark, tmp_table_dir, SCHEMA)
    script = tmp_path / "writer.py"
    script.write_text(_WRITER.format(repo=os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    barrier = str(tmp_path / "go")

    env = {**os.environ, "PYTHONUNBUFFERED": "1"}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), tmp_table_dir, str(e), barrier],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            env=env,
            text=True,
        )
        for e in (1, 2)
    ]
    # wait until both sessions are up and at the rendezvous, then release
    deadline = time.time() + 300
    while time.time() < deadline and not all(
        os.path.exists(f"{barrier}.ready{e}") for e in (1, 2)
    ):
        time.sleep(0.2)
        if any(p.poll() is not None for p in procs):
            break  # a writer died before the barrier — fail below with output
    open(barrier, "w").close()
    outs = [p.communicate(timeout=300)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "applied=True" in out, out[-3000:]

    # fresh handle: read final state through the real commit log
    t2 = LakeTable(spark, tmp_table_dir)
    rows = t2.read().collect()
    by_writer = {"w1": 0, "w2": 0}
    for r in rows:
        by_writer[r["source"]] += 1
    assert by_writer == {"w1": 50, "w2": 50}
    # both epochs fenced exactly once; no lineage lost or duplicated
    epochs = [rec["checkpoint_epoch"] for rec in t2.lineage()]
    assert sorted(set(epochs)) == [1, 2]
    ups = {e: sum(r["rows_upserted"] for r in t2.lineage() if r["checkpoint_epoch"] == e) for e in (1, 2)}
    assert ups == {1: 50, 2: 50}
    assert t2.head_id() == 2  # two commits beyond the created snapshot 0
    assert t2.is_fenced(1) and t2.is_fenced(2)
