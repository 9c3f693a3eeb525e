"""Vectorized token-array transforms (input_hint: "no per-row Python").

Successor to the reference's two fixed kernels — the lazy schema-widening
enrichment decorator (``src/worldclim/.../WorldClimHistoricalTemperatureTransformationService.scala:60-112``,
a narrow projection) and the JAI average-downsample
(``src/common/transform/ResolutionReducerService.scala:13-32``, a vectorized
bulk-shrink) — generalized into a library over ``tokens: array<int32>``.

Discipline (BASELINE.md "UDF discipline" gate): pure Catalyst expressions
first — ``slice/concat/size/transform/filter/aggregate`` are whole-stage
codegen'd JVM-side, zero Python. Where group-wise or genuinely imperative
logic is needed, Arrow-batched pandas UDFs (``mapInPandas`` /
``applyInPandas``), NEVER row-at-a-time Python UDFs.
``assert_vectorized_plan`` enforces this mechanically in tests: a
``BatchEvalPython`` node (pickled row loop) in the physical plan fails;
``ArrowEvalPython`` / ``MapInPandas`` / ``FlatMapGroupsInPandas`` pass.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

# ------------------------------------------------------------ Catalyst-only


def truncate_tokens(tokens: Column | str, max_len: int) -> Column:
    """Truncate a sequence to max_len (JVM-side slice)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.slice(c, 1, max_len)


def append_eos(tokens: Column | str, eos_id: int, max_len: int | None = None) -> Column:
    """Append an EOS token; optionally truncate first so EOS always fits."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    if max_len is not None:
        c = F.slice(c, 1, max_len - 1)
    return F.concat(c, F.array(F.lit(eos_id).cast("int")))


def recount(tokens: Column | str) -> Column:
    """Recompute n_tok = size(tokens) (invariant from FIXTURES.md §1)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.size(c).cast("int")


def drop_token(tokens: Column | str, token_id: int) -> Column:
    """Remove all occurrences of one id (e.g. strip padding)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.filter(c, lambda t: t != F.lit(token_id))


def clamp_vocab(tokens: Column | str, vocab: int, unk_id: int) -> Column:
    """Map out-of-vocab ids to unk (element-wise transform, codegen'd)."""
    c = F.col(tokens) if isinstance(tokens, str) else tokens
    return F.transform(c, lambda t: F.when((t >= 0) & (t < vocab), t).otherwise(F.lit(unk_id)).cast("int"))


def token_stats(df: DataFrame, tokens: str = "tokens") -> DataFrame:
    """Corpus stats in one JVM-side aggregate: sequences, total/min/max/avg tokens."""
    return df.agg(
        F.count(F.lit(1)).alias("n_seq"),
        F.sum(F.size(tokens)).alias("total_tokens"),
        F.min(F.size(tokens)).alias("min_tokens"),
        F.max(F.size(tokens)).alias("max_tokens"),
        F.avg(F.size(tokens)).alias("avg_tokens"),
    )


# -------------------------------------------------- Arrow/pandas (batched)


def chunk_for_training(
    df: DataFrame,
    seq_len: int,
    stride: int | None = None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Split long documents into fixed-length training windows (with optional
    overlap) — group-wise array surgery Catalyst can't express, so a
    mapInPandas Arrow kernel: each batch of documents explodes into chunk
    rows via numpy slicing, never per-row Python.

    Output: (doc_id, chunk_id, tokens, n_tok). Rows shorter than seq_len pass
    through as one chunk. Structural heir of the reference's downsample
    (bulk payload reshape before the expensive stage)."""
    stride = stride or seq_len
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, chunk_id int, {tokens_col} array<int>, n_tok int"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[str] = []
            chunk_ids: list[int] = []
            chunks: list[list[int]] = []
            for doc_id, toks in zip(pdf[id_col], pdf[tokens_col]):
                toks = list(toks)
                n = len(toks)
                if n <= seq_len:
                    ids.append(doc_id)
                    chunk_ids.append(0)
                    chunks.append(toks)
                    continue
                cid = 0
                for start in range(0, n, stride):
                    piece = toks[start : start + seq_len]
                    if len(piece) == 0:
                        break
                    ids.append(doc_id)
                    chunk_ids.append(cid)
                    chunks.append(piece)
                    cid += 1
                    if start + seq_len >= n:
                        break
            yield pd.DataFrame(
                {id_col: ids, "chunk_id": chunk_ids, tokens_col: chunks, "n_tok": [len(c) for c in chunks]}
            )

    return df.select(id_col, tokens_col).mapInPandas(gen, schema=out_schema)


def pack_sequences(
    df: DataFrame,
    budget: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Greedy sequence packing: assign documents (in deterministic id order)
    to consecutive packs of at most ``budget`` total tokens — the classic
    fill-the-context-window step before training.

    Deterministic streaming formulation (no Python): running token cumsum
    over id order; a document starts a new pack when the budget would
    overflow. Exact greedy first-fit-in-order is not a prefix-sum (pack
    boundaries depend on earlier breaks), so the engine uses the standard
    scalable approximation ``pack_id = floor((cumsum - n_tok) / budget)``:
    packs can exceed budget by at most one document's tokens, boundaries are
    identical across engines, and the whole thing is one window over one
    range shuffle. Documents longer than the budget should be chunked first
    (chunk_for_training).

    Output: (pack_id, n_docs, total_tokens, doc_ids).
    """
    from pyspark.sql import Window

    w = Window.orderBy(id_col).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized = df.select(F.col(id_col), F.size(tokens_col).alias("_n"))
    packed = sized.withColumn("_cum", F.sum("_n").over(w)).withColumn(
        "pack_id", F.floor((F.col("_cum") - F.col("_n")) / budget).cast("int")
    )
    return packed.groupBy("pack_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_n").alias("total_tokens"),
        F.sort_array(F.collect_list(id_col)).alias("doc_ids"),
    )


# ------------------------------------------------------------ plan police


def assert_vectorized_plan(df: DataFrame) -> None:
    """Fail if the physical plan contains a row-at-a-time Python eval node.

    ``BatchEvalPython`` = pickled per-row UDF (forbidden);
    ``ArrowEvalPython``/``MapInPandas``/``FlatMapGroupsInPandas`` = Arrow
    vectorized (allowed)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "BatchEvalPython" in plan:
        raise AssertionError("row-at-a-time Python UDF (BatchEvalPython) found in plan:\n" + plan)
