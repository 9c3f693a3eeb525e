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
    overlap) — pure Catalyst: ``explode(sequence(0, last_chunk))`` + a
    ``slice`` at ``chunk_id * stride``, all whole-stage codegen'd JVM-side
    (no Python at all; the Arrow variant below is the parity reference).

    Chunk starts are ``k * stride`` for ``k = 0..last``; for docs longer than
    ``seq_len``, ``last = min(ceil((n - seq_len)/stride), ceil(n/stride)-1)``
    — the first term ends chunking at the first window reaching the tail, the
    second guards stride > seq_len (no empty windows). Shorter docs pass
    through as one chunk; zero-length docs emit ZERO rows (matching the SQL
    oracle's ``range(ceil(n/stride))``, which is empty at n=0 — the Arrow
    variant and the property tests encode the same contract).

    Output: (doc_id, chunk_id, tokens, n_tok). Structural heir of the
    reference's downsample (bulk payload reshape before the expensive
    stage)."""
    stride = stride or seq_len
    n = F.size(F.col(tokens_col))
    k_tail = F.expr(f"(size({tokens_col}) - {seq_len} + {stride - 1}) div {stride}")
    k_last_nonempty = F.expr(f"(size({tokens_col}) + {stride - 1}) div {stride} - 1")
    last = F.when(n <= seq_len, F.lit(0)).otherwise(F.least(k_tail, k_last_nonempty)).cast("int")
    return (
        df.select(id_col, tokens_col)
        .where(n > 0)
        .withColumn("chunk_id", F.explode(F.sequence(F.lit(0), last)))
        .select(
            id_col,
            F.col("chunk_id").cast("int").alias("chunk_id"),
            F.slice(F.col(tokens_col), F.col("chunk_id") * stride + 1, seq_len).alias(tokens_col),
        )
        .withColumn("n_tok", F.size(F.col(tokens_col)).cast("int"))
    )


def chunk_for_training_arrow(
    df: DataFrame,
    seq_len: int,
    stride: int | None = None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Arrow mapInPandas formulation of chunk_for_training — kept as the
    parity reference for the Catalyst kernel (tested equal) and as the
    template for chunkers whose logic genuinely can't be expressed
    relationally (e.g. sentence-boundary-aware splitting)."""
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
                if n == 0:
                    continue  # zero rows for empty docs (oracle contract)
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
            # explicit dtypes: an all-filtered batch (every doc zero-length)
            # yields an EMPTY frame, and pandas' default float64 for empty
            # columns breaks the Arrow list<int32> conversion
            yield pd.DataFrame(
                {
                    id_col: pd.Series(ids, dtype=object),
                    "chunk_id": pd.Series(chunk_ids, dtype="int64"),
                    tokens_col: pd.Series(chunks, dtype=object),
                    "n_tok": pd.Series([len(c) for c in chunks], dtype="int64"),
                }
            )

    return df.select(id_col, tokens_col).mapInPandas(gen, schema=out_schema)


def distributed_sorted_rank(
    df: DataFrame,
    col: str,
    out_col: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """0-based rank of the DISTINCT values of ``col`` in global sort order —
    bit-identical to ``row_number() OVER (ORDER BY col) - 1`` on the distinct
    set, but never a single-partition sort.

    TWO-PHASE distributed prefix count (same shape as ``pack_sequences``):
    range-partition the distinct values (partition i holds a contiguous
    sorted range strictly below partition i+1's), rank locally per
    partition, then add each partition's prefix offset — a window over the
    <=num_partitions per-partition counts (metadata, not data) broadcast
    back. Every data-bearing step is partition-parallel; at web scale
    (whitespace tokens over 100 TB of text -> effectively unbounded distinct
    strings) the old global window would serialize the entire vocabulary
    through one task. The two branches share the range exchange, which
    Catalyst dedupes via ReusedExchange — the distinct set is shuffled once.

    Returns ``(col, out_col:int)`` — one row per distinct value."""
    from pyspark.sql import Window

    spark = df.sparkSession
    num_partitions = num_partitions or max(2, spark.sparkContext.defaultParallelism)
    # eager localCheckpoint PINS the sampled range boundaries: the local-rank
    # branch and the counts branch below must observe the IDENTICAL
    # partitioning, and relying on Catalyst ReusedExchange to dedupe the
    # repartitionByRange leaves a correctness hole — were the exchange ever
    # evaluated twice (e.g. reuse disabled under AQE replanning), each
    # evaluation re-samples its own boundaries and the _part-keyed offsets
    # would no longer match the ranked partitions, yielding wrong/duplicate
    # ids. Materializing once makes both branches read the same frozen RDD.
    # Cost: one job over the distinct set (vocab-sized, tiny vs the corpus).
    # On a cluster swap for reliable checkpoint(dir), as elsewhere.
    distinct = (
        df.select(col)
        .distinct()
        .repartitionByRange(num_partitions, col)
        .withColumn("_part", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    local = distinct.withColumn(
        "_lrank", F.row_number().over(Window.partitionBy("_part").orderBy(col))
    )
    counts = distinct.groupBy("_part").agg(F.count(F.lit(1)).alias("_cnt"))
    w_off = Window.orderBy("_part").rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select("_part", F.coalesce(F.sum("_cnt").over(w_off), F.lit(0)).alias("_off"))
    return local.join(F.broadcast(offsets), "_part").select(
        col, (F.col("_lrank") - 1 + F.col("_off")).cast("int").alias(out_col)
    )


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
    packs can exceed budget by at most one document's tokens and boundaries
    are identical across engines. Documents longer than the budget should be
    chunked first (chunk_for_training).

    The global cumsum is a TWO-PHASE distributed prefix sum, never a
    single-partition window: range-partition by id, local per-partition
    cumsum, then add each partition's prefix offset (a window over the
    ≤num_partitions per-partition totals — metadata, not data — broadcast
    back). Every data-bearing step is partition-parallel; at 10^9 docs the
    old ``Window.orderBy(id)`` formulation would serialize the whole corpus
    through one task (guarded by a plan assertion in tests/test_plans.py).

    Output: (pack_id, n_docs, total_tokens, doc_ids).
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    num_partitions = max(2, spark.sparkContext.defaultParallelism)
    # narrow (id, n_tok) projection, persisted BELOW the range exchange:
    # repartitionByRange's boundary sampler evaluates the exchange child
    # once before the map stage does, so an un-cached arbitrarily-expensive
    # upstream (e.g. the vocab-encode chain) would run twice — measured 3x
    # slower on tok_pack_sequences. The eager localCheckpoint ABOVE the
    # exchange then pins the sampled boundaries so the two consumers (local
    # cumsum, per-partition totals) provably see the identical partitioning
    # (same hole as distributed_sorted_rank: ReusedExchange is an
    # optimization, not a guarantee) — and, once materialized, the narrow
    # persist can be released immediately instead of leaking to the
    # ContextCleaner.
    narrow = df.select(F.col(id_col), F.size(tokens_col).alias("_n")).persist()
    sized = (
        narrow
        .repartitionByRange(num_partitions, id_col)
        .withColumn("_part", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    narrow.unpersist()
    w_local = Window.partitionBy("_part").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    local = sized.withColumn("_lcum", F.sum("_n").over(w_local))
    totals = sized.groupBy("_part").agg(F.sum("_n").alias("_tot"))
    w_off = Window.orderBy("_part").rowsBetween(Window.unboundedPreceding, -1)
    offsets = totals.select(
        "_part", F.coalesce(F.sum("_tot").over(w_off), F.lit(0)).alias("_off")
    )
    packed = (
        local.join(F.broadcast(offsets), "_part")
        .withColumn("_cum", F.col("_lcum") + F.col("_off"))
        .withColumn("pack_id", F.floor((F.col("_cum") - F.col("_n")) / budget).cast("int"))
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
