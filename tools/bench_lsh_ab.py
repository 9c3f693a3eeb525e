"""Adjudicate the dedup_minhash_lsh / ann_lsh_* round-over-round bench trend
(round-4 verdict item 1).

The three LSH queries' driver-bench numbers rose across rounds 2-4 on code
untouched since round 3. Two hypotheses: (a) VM noise amplified by the old
1-rep policy, (b) a real interaction with the round-4 GLOBAL session confs
(session.py): spark.sql.autoBroadcastJoinThreshold 10MB -> 64MB and
spark.sql.sources.parallelPartitionDiscovery.threshold 32 -> 2048, which
apply to every query, not just merges.

Both confs are runtime-settable SQL confs, so this runs the decisive
experiment: ONE session, r3-conf and r4-conf variants interleaved rep by
rep (same JVM, same page cache, same background noise), 5 reps each,
result equality asserted across variants. Writes BENCH/lsh_ab.json.

Usage: python tools/bench_lsh_ab.py [--reps 5] [--sf-dir /root/testdata/sf0.1]
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = ["dedup_minhash_lsh", "ann_lsh_topk", "ann_lsh_multi_topk"]

CONFS = {
    # spark defaults in rounds 2-3 (build_session didn't set them)
    "r3": {
        "spark.sql.autoBroadcastJoinThreshold": str(10 * 1024 * 1024),
        "spark.sql.sources.parallelPartitionDiscovery.threshold": "32",
    },
    # round-4 build_session globals
    "r4": {
        "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
        "spark.sql.sources.parallelPartitionDiscovery.threshold": "2048",
    },
}


def _result_sig(df) -> tuple:
    """Order-insensitive row-count + value checksum (cheap, one action)."""
    import pyspark.sql.functions as F

    row = df.select(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.crc32(F.to_json(F.struct(*sorted(df.columns))))).alias("crc"),
    ).collect()[0]
    return (row["n"], row["crc"])


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from etl_spark.queries import query_fns
    from etl_spark.session import build_session

    spark = build_session(app_name="lsh-ab", cores=args.cores, shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")
    fns = {q: query_fns()[q] for q in QUERIES}

    def set_confs(label: str) -> None:
        for k, v in CONFS[label].items():
            spark.conf.set(k, v)

    # warm-up both variants once (page cache, plan machinery) — discarded
    for label in ("r3", "r4"):
        set_confs(label)
        for q in QUERIES:
            fns[q](spark, args.sf_dir).count()

    times: dict[str, dict[str, list[float]]] = {q: {"r3": [], "r4": []} for q in QUERIES}
    sigs: dict[str, dict[str, tuple]] = {q: {} for q in QUERIES}
    for rep in range(args.reps):
        # alternate which variant goes first so drift can't favor one side
        order = ("r3", "r4") if rep % 2 == 0 else ("r4", "r3")
        for label in order:
            set_confs(label)
            for q in QUERIES:
                t0 = time.time()
                df = fns[q](spark, args.sf_dir)
                sig = _result_sig(df)
                times[q][label].append(round(time.time() - t0, 2))
                prev = sigs[q].setdefault(label, sig)
                assert prev == sig, f"{q}/{label}: result changed across reps {prev} vs {sig}"
        print(json.dumps({"rep": rep, **{q: times[q] for q in QUERIES}}), flush=True)

    for q in QUERIES:
        assert sigs[q]["r3"] == sigs[q]["r4"], f"{q}: r3 vs r4 results differ! {sigs[q]}"

    out = {
        "protocol": f"interleaved one-session A/B, {args.reps} reps/variant, warm-up discarded",
        "sf_dir": args.sf_dir,
        "cores": args.cores,
        "confs": CONFS,
        "queries": {
            q: {
                label: {
                    "median": statistics.median(ts),
                    "min": min(ts),
                    "max": max(ts),
                    "all": ts,
                }
                for label, ts in times[q].items()
            }
            for q in QUERIES
        },
        "results_identical": True,
    }
    for q in QUERIES:
        m3 = out["queries"][q]["r3"]["median"]
        m4 = out["queries"][q]["r4"]["median"]
        out["queries"][q]["r4_over_r3"] = round(m4 / m3, 3) if m3 else None

    os.makedirs(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH"), exist_ok=True)
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "BENCH", "lsh_ab.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({q: out["queries"][q]["r4_over_r3"] for q in QUERIES}))
    print(f"written: {path}")


if __name__ == "__main__":
    main()
