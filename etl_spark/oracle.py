"""Single-threaded pandas oracle for replay equality (SURVEY.md §5 item 1).

Trivially correct by construction: sort every change event by the total order
``(commit_lsn, op_seq)``, fold insert/update/delete per ``doc_id``, drop
tombstoned keys. The engine's distributed dedup+MERGE must reproduce this
final state under per-row token-array equality (BASELINE.json correctness
gate). Duplicate deliveries are exact re-emits of the same ``(commit_lsn,
op_seq)`` event, so last-wins folding makes them no-ops automatically.
"""

from __future__ import annotations

import pandas as pd


def replay_oracle(events: pd.DataFrame, payload_cols: list[str] | None = None) -> pd.DataFrame:
    """Compute the expected final table state from a change-event frame.

    ``events`` needs columns ``doc_id, commit_lsn, op_seq, op`` plus payload
    columns (default: ``tokens, n_tok, source``). Returns one row per live
    key, sorted by doc_id, with ``_commit_lsn/_op_seq`` of the winning event.
    """
    if payload_cols is None:
        payload_cols = ["tokens", "n_tok", "source"]
    ev = events.sort_values(["commit_lsn", "op_seq"], kind="mergesort")
    # last event per key in total order wins
    last = ev.groupby("doc_id", sort=True).tail(1)
    live = last[last["op"] != "D"]
    out = live[["doc_id", *payload_cols, "commit_lsn", "op_seq"]].rename(
        columns={"commit_lsn": "_commit_lsn", "op_seq": "_op_seq"}
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def assert_state_equal(actual: pd.DataFrame, expected: pd.DataFrame, check_hidden: bool = True) -> None:
    """Per-row token-array equality assertion between engine state and oracle."""
    cols = list(expected.columns)
    if not check_hidden:
        cols = [c for c in cols if not c.startswith("_")]
    a = actual.sort_values("doc_id").reset_index(drop=True)
    e = expected.sort_values("doc_id").reset_index(drop=True)
    assert len(a) == len(e), f"row count mismatch: engine={len(a)} oracle={len(e)}"
    for c in cols:
        assert c in a.columns, f"missing column {c} in engine output"
    for i in range(len(e)):
        for c in cols:
            av, evv = a.iloc[i][c], e.iloc[i][c]
            if c == "tokens":
                av = list(av) if av is not None else None
                evv = list(evv) if evv is not None else None
            assert av == evv, (
                f"mismatch at row {i} ({e.iloc[i]['doc_id']}), column {c}: engine={av!r} oracle={evv!r}"
            )
