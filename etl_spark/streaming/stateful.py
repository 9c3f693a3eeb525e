"""Streaming-native stateful LWW dedup via applyInPandasWithState.

The batch engine dedups per microbatch and resolves cross-batch order against
the table's hidden columns (operators/merge.py). This module is the
streaming-native alternative: per-key LWW state lives in the streaming state
store, so each incoming event is resolved against the key's running winner
without touching the table — emitting a *changelog of winners* (only keys
whose winner changed this batch). Downstream, the changelog can feed the
table MERGE directly; the state store replaces the resolve join for feeds
where the working set of keys fits state-store budgets.

Trade-off vs foreachBatch-MERGE (documented for the 10^10 design point):
state-store size grows with live key count — at 10^9+ keys prefer the
table-resolved path; at bounded key cardinality (device/session feeds) the
stateful path avoids re-reading table files entirely.

The kernel is an Arrow-batched applyInPandasWithState function (grouped
pandas DataFrames in, pandas DataFrames out — no per-row Python in the
Spark-to-Python boundary, per the input_hint discipline).
"""

from __future__ import annotations

from collections.abc import Iterable

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# state per doc_id: running winner
STATE_SCHEMA = StructType(
    [
        StructField("commit_lsn", LongType()),
        StructField("op_seq", IntegerType()),
        StructField("op", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ]
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("doc_id", StringType()),
        StructField("commit_lsn", LongType()),
        StructField("op_seq", IntegerType()),
        StructField("op", StringType()),
        StructField("tokens", ArrayType(IntegerType())),
        StructField("n_tok", IntegerType()),
        StructField("source", StringType()),
    ]
)


def _lww_state_fn(
    key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Fold this batch's events for one doc_id into the stored winner;
    emit one row iff the winner changed (changelog semantics)."""
    if state.exists:
        cur_lsn, cur_seq, cur_op, cur_tokens, cur_ntok, cur_source = state.get
    else:
        cur_lsn, cur_seq = -1, -1
        cur_op = cur_tokens = cur_ntok = cur_source = None

    changed = False
    for pdf in pdfs:
        if len(pdf) == 0:
            continue
        # vectorized within the Arrow batch: pick the batch's max (lsn, seq)
        idx = pdf.sort_values(["commit_lsn", "op_seq"]).index[-1]
        lsn = int(pdf.at[idx, "commit_lsn"])
        seq = int(pdf.at[idx, "op_seq"])
        if (lsn, seq) > (cur_lsn, cur_seq):
            cur_lsn, cur_seq = lsn, seq
            cur_op = pdf.at[idx, "op"]
            toks = pdf.at[idx, "tokens"]
            cur_tokens = None if toks is None else [int(t) for t in toks]
            nt = pdf.at[idx, "n_tok"]
            cur_ntok = None if pd.isna(nt) else int(nt)
            src = pdf.at[idx, "source"]
            cur_source = None if src is None else str(src)
            changed = True

    state.update((cur_lsn, cur_seq, cur_op, cur_tokens, cur_ntok, cur_source))
    if changed:
        yield pd.DataFrame(
            {
                "doc_id": [key[0]],
                "commit_lsn": [cur_lsn],
                "op_seq": [cur_seq],
                "op": [cur_op],
                "tokens": [cur_tokens],
                "n_tok": [cur_ntok],
                "source": [cur_source],
            }
        )


def stateful_lww_changelog(events: DataFrame) -> DataFrame:
    """events (streaming, BINLOG_SCHEMA shape) -> changelog of per-key LWW
    winners. Works on a streaming DataFrame inside writeStream; each
    microbatch emits only the keys whose winner advanced."""
    return events.groupBy("doc_id").applyInPandasWithState(
        _lww_state_fn,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
