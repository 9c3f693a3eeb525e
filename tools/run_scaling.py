"""Scaling-efficiency evidence: same replay job at N and 4N cores.

The north rule requires >=0.8 throughput scaling efficiency from N to 4N
executors. No multi-node cluster exists in this sandbox, so the protocol
(per driver instruction) is: identical job + identical input at two
parallelism levels — local[8] vs local[32] — each in a fresh JVM subprocess,
shuffle partitions scaled with cores. Efficiency = (T_8 / T_32) / 4.

Writes BENCH/scaling.json and rewrites the measured-numbers section of
BENCH/BASELINE.md.

Usage: python tools/run_scaling.py [n_events] [epochs]
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(n_events: int = 4_000_000, epochs: int = 4, cores_pair: tuple[int, int] = (8, 32)) -> dict:
    sys.path.insert(0, REPO)
    from bench import gen_binlog
    from etl_spark.session import build_session

    root = tempfile.mkdtemp(prefix="scaling_")
    binlog = os.path.join(root, "binlog")
    spark = build_session(app_name="scaling-gen", cores=32, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    gen_binlog(spark, binlog, n_events, max(1000, n_events // 20), epochs)
    spark.stop()

    results = {}
    try:
        for cores in cores_pair:
            out = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py"), "--replay-only", binlog, str(epochs), str(cores)],
                capture_output=True,
                text=True,
                timeout=1800,
            )
            line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")][-1]
            results[cores] = json.loads(line)
            print(f"local[{cores}]: {results[cores]}")
    finally:
        shutil.rmtree(root, ignore_errors=True)

    lo, hi = cores_pair
    t_lo, t_hi = results[lo]["wall_sec"], results[hi]["wall_sec"]
    eff = (t_lo / t_hi) / (hi / lo)
    summary = {
        "protocol": f"same job + same input, local[{lo}] vs local[{hi}], fresh JVM each, "
        f"shuffle.partitions = cores",
        "n_events": n_events,
        "epochs": epochs,
        f"wall_sec_{lo}": t_lo,
        f"wall_sec_{hi}": t_hi,
        f"events_per_sec_{lo}": results[lo]["events_per_sec"],
        f"events_per_sec_{hi}": results[hi]["events_per_sec"],
        "speedup": round(t_lo / t_hi, 2),
        "scaling_efficiency": round(eff, 3),
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "scaling.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    return summary


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    e = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    run(n, e)
