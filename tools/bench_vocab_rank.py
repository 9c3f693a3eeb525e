"""A/B: single-partition window rank vs distributed_sorted_rank (round-3
verdict item 2 — quantify the one r3 plan change with a worse driver number).

Two measurements, interleaved arms within one session:
1. End-to-end tok_vocab_encode at $SPARK_GRAFT_SF_DIR with the vocab-id rank
   swapped between the old ``row_number() OVER (ORDER BY w)`` single-partition
   window and the two-phase distributed rank.
2. Rank-only microbench over synthetic distinct sets (10^5..10^7 values) —
   locates the crossover where the two-phase exchanges are amortized.

Usage: python tools/bench_vocab_rank.py [--reps N] [--out BENCH/vocab_rank_ab.json]
Prints one JSON line and (optionally) writes it to --out.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def window_rank(df, col, out_col="rank"):
    """The round-2 formulation: global sort window over the distinct set —
    one data-bearing SinglePartition task (the reason it was replaced)."""
    from pyspark.sql import Window

    w = Window.orderBy(col)
    return (
        df.select(col)
        .distinct()
        .withColumn(out_col, (F.row_number().over(w) - 1).cast("int"))
    )


def encode_with(spark, sf_dir, rank_fn):
    from etl_spark.functions import text as T

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    words = docs.select(F.col("doc_id"), F.posexplode(T.tokenize_ws("text")).alias("pos", "w"))
    vocab = rank_fn(words, "w", out_col="tid") if rank_fn is not window_rank else window_rank(words, "w", "tid")
    return (
        words.join(vocab, "w")
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "tid"))).alias("pt"))
        .select("doc_id", F.transform("pt", lambda x: x["tid"]).alias("tokens"))
    )


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from etl_spark.functions.tokens import distributed_sorted_rank
    from etl_spark.session import build_session

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = build_session(app_name="bench-vocab-rank", cores=args.cores, shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    # --- end-to-end encode, interleaved arms
    e2e = {"window": [], "two_phase": []}
    checks = set()
    for _rep in range(args.reps):
        for arm, fn in (("window", window_rank), ("two_phase", distributed_sorted_rank)):
            t0 = time.time()
            out = encode_with(spark, sf_dir, fn)
            agg = out.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(F.crc32(F.concat_ws(",", F.col("tokens").cast("array<string>")))).alias("h"),
            ).collect()[0]
            e2e[arm].append(round(time.time() - t0, 2))
            checks.add((agg["n"], agg["h"]))
    assert len(checks) == 1, f"arms disagree: {checks}"

    # --- rank-only scaling: synthetic distinct sets
    rank_only = []
    for n in (100_000, 1_000_000, 10_000_000):
        src = spark.range(n).select(F.md5(F.col("id").cast("string")).alias("w"))
        times = {}
        sums = set()
        for arm, build in (
            ("window", lambda: window_rank(src, "w", "rank")),
            ("two_phase", lambda: distributed_sorted_rank(src, "w", "rank")),
        ):
            reps = []
            for _rep in range(2):
                t0 = time.time()
                # pmod before summing: raw crc32*rank overflows long under ANSI
                got = build().agg(
                    F.sum(F.pmod(F.crc32("w") * F.col("rank"), F.lit(1_000_000_007))).alias("s")
                ).collect()[0]["s"]
                reps.append(round(time.time() - t0, 2))
                sums.add(got)
            times[arm] = min(reps)
        assert len(sums) == 1, f"rank-only arms disagree at n={n}: {sums}"
        rank_only.append({"n_distinct": n, **times})

    def med(v):
        return sorted(v)[len(v) // 2]

    out = {
        "metric": "vocab_rank_ab",
        "sf_dir": sf_dir,
        "cores": args.cores,
        "e2e_encode_sec": {
            arm: {"reps": v, "median": med(v)} for arm, v in e2e.items()
        },
        "e2e_two_phase_over_window": round(med(e2e["two_phase"]) / med(e2e["window"]), 3),
        "rank_only": rank_only,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
