"""sf1-scale end-to-end replay on record (round-4 verdict item 6).

All correctness runs so far were sf0.001-0.1 and the driver bench replays
2M events; the 100x-scale story otherwise rests on plan assertions. This
puts a 10x-bigger replay on record: a ~20M-event deterministic binlog
(10x the driver bench, the sf1 design point of the scaled protocol) replayed
end-to-end through BOTH merge arms:

- CoW arm: epoch-fenced copy-on-write merges;
- MoR arm: forced merge-on-read epochs + one final compact_mor.

Exactness, not sampling: each arm's final state is checked against a DuckDB
single-shot LWW fold of the raw binlog via two-sided exceptAll (row-exact,
token arrays included), and the two arms must agree. Also stress-exercised
at this file count: the manifest seq-map spill path (MAX_LITERAL_SEQ_MAP),
fence-ledger growth across epochs, and the planning probe's bulk fallback
(every epoch here is far beyond FAST_PATH_MAX_KEYS).

Writes BENCH/sf1_replay.json. Usage:
  python tools/bench_sf1.py [--events 20000000] [--keys 2000000] [--epochs 8]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--events", type=int, default=20_000_000)
    ap.add_argument("--keys", type=int, default=2_000_000)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--cores", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--keep", action="store_true", help="keep the scratch dirs")
    ap.add_argument(
        "--arms",
        default="cow,mor",
        help="comma list of arms to run (cow,mor) — the 100M stress runs cow only",
    )
    ap.add_argument(
        "--out",
        default="sf1_replay.json",
        help="output filename under BENCH/",
    )
    args = ap.parse_args()

    import pyspark.sql.functions as F

    from etl_spark.datagen import BinlogSpec, generate_binlog
    from etl_spark.operators.merge import merge_batch
    from etl_spark.schema import TARGET_SCHEMA
    from etl_spark.table import LakeTable
    from etl_spark.table.maintenance import compact_mor
    from etl_spark.session import build_session

    spark = build_session(app_name="sf1-replay", cores=args.cores, shuffle_partitions=args.cores)
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="sf1_replay_")
    binlog = os.path.join(root, "binlog")
    spec = BinlogSpec(
        n_events=args.events, n_keys=args.keys, seed=1, skew=1.5, ooo_frac=0.1, dup_frac=0.05
    )
    t0 = time.time()
    feed = generate_binlog(spark, spec)
    per = args.events // args.epochs + 1
    (
        # delivery_pos jitter can exceed n_events — clamp into the last epoch
        feed.withColumn(
            "epoch", F.least(F.lit(args.epochs - 1), (F.col("delivery_pos") / F.lit(per)).cast("int"))
        )
        .drop("delivery_pos", "lsn_bucket")
        .write.partitionBy("epoch")
        .mode("overwrite")
        .parquet(binlog)
    )
    gen_sec = round(time.time() - t0, 1)
    print(json.dumps({"phase": "gen", "sec": gen_sec, "events": args.events}), flush=True)

    # ---- DuckDB single-shot LWW oracle over the raw binlog
    import duckdb

    t0 = time.time()
    con = duckdb.connect()
    expected_dir = os.path.join(root, "expected")
    con.sql(
        f"""
        COPY (
          WITH r AS (
            SELECT *, row_number() OVER (
              PARTITION BY doc_id ORDER BY commit_lsn DESC, op_seq DESC) AS rn
            FROM read_parquet('{binlog}/epoch=*/*.parquet')
          )
          SELECT doc_id, tokens, n_tok, source, commit_lsn AS _commit_lsn, op_seq AS _op_seq
          FROM r WHERE rn = 1 AND op <> 'D'
        ) TO '{expected_dir}' (FORMAT PARQUET)
        """
    )
    oracle_sec = round(time.time() - t0, 1)
    print(json.dumps({"phase": "duckdb_oracle", "sec": oracle_sec}), flush=True)
    expected = spark.read.parquet(expected_dir)
    n_expected = expected.count()

    def _check_exact(df) -> None:
        got = df.select("doc_id", "tokens", "n_tok", "source", "_commit_lsn", "_op_seq")
        exp = expected.select("doc_id", "tokens", "n_tok", "source", "_commit_lsn", "_op_seq")
        missing = exp.exceptAll(got).count()
        extra = got.exceptAll(exp).count()
        assert missing == 0 and extra == 0, f"state mismatch: missing={missing} extra={extra}"

    out: dict = {
        "protocol": "sf1 replay: 10x driver bench",
        "events": args.events,
        "keys": args.keys,
        "epochs": args.epochs,
        "cores": args.cores,
        "gen_sec": gen_sec,
        "oracle_fold_sec": oracle_sec,
        "expected_rows": n_expected,
        "arms": {},
    }

    arm_modes = [("cow", "auto"), ("mor", "mor")]
    arm_modes = [(a, m) for a, m in arm_modes if a in args.arms.split(",")]
    for arm, mode in arm_modes:
        troot = os.path.join(root, f"table_{arm}")
        table = LakeTable.create_if_absent(spark, troot, TARGET_SCHEMA)
        t0 = time.time()
        for e in range(args.epochs):
            merge_batch(
                table, spark.read.parquet(f"{binlog}/epoch={e}"), epoch=e, merge_mode=mode
            )
        replay_sec = time.time() - t0
        compact_sec = 0.0
        if arm == "mor":
            t0 = time.time()
            compact_mor(table)
            compact_sec = time.time() - t0
        st = table.stats()
        t0 = time.time()
        _check_exact(table.read(include_hidden=True))
        check_sec = round(time.time() - t0, 1)
        out["arms"][arm] = {
            "replay_sec": round(replay_sec, 1),
            "events_per_sec": round(args.events / replay_sec, 1),
            "compact_sec": round(compact_sec, 1),
            "oracle_exact": True,
            "check_sec": check_sec,
            "files": st["n_files"],
            "snapshots": table.head_id(),
        }
        print(json.dumps({arm: out["arms"][arm]}), flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "BENCH", args.out), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"written": "BENCH/" + args.out}))
    if not args.keep:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
