"""Hypothesis property tests for the replay oracle itself (SURVEY.md §5.4).

The oracle is the trusted side of every equality gate, so its own invariants
get property coverage: the final state must be invariant to delivery order
(LWW is a max over a total order) and to duplicate deliveries, and
tombstone-then-reinsert must resurrect keys. Pure pandas — no Spark — so
hundreds of generated cases run in seconds.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from etl_spark.oracle import replay_oracle

# one event: (key 0-4, lsn 1-30, seq 0-1, op, payload int)
_event = st.tuples(
    st.integers(0, 4),
    st.integers(1, 30),
    st.integers(0, 1),
    st.sampled_from(["I", "U", "D"]),
    st.integers(0, 1000),
)


def _frame(events):
    # dedupe (lsn, seq) collisions across DIFFERENT keys is fine; the total
    # order must be unique per event, so keep the last occurrence of each
    # (lsn, seq) pair like a real log would never emit twice
    seen = {}
    for k, lsn, seq, op, v in events:
        seen[(lsn, seq)] = (k, lsn, seq, op, v)
    rows = list(seen.values())
    return pd.DataFrame(
        {
            "doc_id": [f"k{r[0]}" for r in rows],
            "commit_lsn": [r[1] for r in rows],
            "op_seq": [r[2] for r in rows],
            "op": [r[3] for r in rows],
            "tokens": [None if r[3] == "D" else [r[4]] for r in rows],
            "n_tok": [None if r[3] == "D" else 1 for r in rows],
            "source": [None if r[3] == "D" else "s" for r in rows],
        }
    )


def _canon(df: pd.DataFrame):
    return [
        (r["doc_id"], r["_commit_lsn"], r["_op_seq"], tuple(r["tokens"]))
        for _, r in df.iterrows()
    ]


@settings(max_examples=200, deadline=None)
@given(st.lists(_event, min_size=1, max_size=40), st.randoms())
def test_oracle_invariant_to_delivery_order(events, rnd):
    base = _frame(events)
    shuffled = base.sample(frac=1, random_state=rnd.randint(0, 10**9)).reset_index(drop=True)
    assert _canon(replay_oracle(base)) == _canon(replay_oracle(shuffled))


@settings(max_examples=200, deadline=None)
@given(st.lists(_event, min_size=1, max_size=40))
def test_oracle_invariant_to_duplicate_delivery(events):
    base = _frame(events)
    doubled = pd.concat([base, base.head(max(1, len(base) // 2))], ignore_index=True)
    assert _canon(replay_oracle(base)) == _canon(replay_oracle(doubled))


def test_oracle_delete_then_reinsert_resurrects():
    df = _frame([(1, 5, 0, "U", 7), (1, 6, 0, "D", 0), (1, 7, 0, "I", 9)])
    out = replay_oracle(df)
    assert len(out) == 1
    assert list(out.iloc[0]["tokens"]) == [9]


def test_oracle_equal_lsn_tie_broken_by_op_seq():
    df = _frame([(1, 5, 0, "U", 7), (1, 5, 1, "U", 8)])
    out = replay_oracle(df)
    assert list(out.iloc[0]["tokens"]) == [8]
    assert out.iloc[0]["_op_seq"] == 1
