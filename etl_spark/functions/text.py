"""Text-analysis functions for the training-data pipeline, all JVM-side.

The reference's transform stage enriches rows with derived metadata columns via
a lazy decorator (``src/worldclim/.../WorldClimHistoricalTemperatureTransformationService.scala:60-112``);
this module generalizes that into the derived-column library a 100 TB
training-data pipeline needs over a ``documents(doc_id, text, ...)`` corpus:
tokenization, language identification, quality scoring, fingerprinting and
shingling.

Scale discipline: every function here is a pure Catalyst expression
(whole-stage codegen, zero Python, columnar in-scan evaluation). Each is a
narrow transformation — no shuffle — so they pipeline into the scan and cost
one pass regardless of corpus size.

Cross-engine determinism: hashes are built from ``md5`` (identical hex output
in any engine) rather than engine-private hash functions, so results are
oracle-checkable bit-for-bit against DuckDB/ANSI SQL.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

# A tiny embedded stopword table per language. This is a deterministic
# heuristic (the corpus is synthetic); a production language-ID would be a
# fastText-style model behind the same column contract.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to"),
    "es": ("el", "la", "de", "y", "que"),
    "de": ("der", "die", "das", "und", "zu"),
    "fr": ("le", "la", "et", "les", "des"),
}

STOPWORDS: tuple[str, ...] = tuple(sorted({w for ws in LANG_MARKERS.values() for w in ws}))


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def normalize_text(text: Column | str) -> Column:
    """Lowercase, trim, collapse runs of whitespace to single spaces."""
    return F.regexp_replace(F.trim(F.lower(_c(text))), r"\s+", " ")


def tokenize_ws(text: Column | str) -> Column:
    """Whitespace tokenizer: text -> array<string> of words (split on single
    space after normalization — exact-parity with ANSI ``string_split``)."""
    return F.split(normalize_text(text), " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokenize_ws(text)).cast("int")


def md5_int(col: Column | str, hex_chars: int = 15) -> Column:
    """First ``hex_chars`` hex digits of md5 as a non-negative bigint.

    15 hex chars = 60 bits, always fits a signed int64. The cross-engine
    portable 64-bit hash primitive (DuckDB: ``('0x'||substr(md5(x),1,15))::bigint``).
    """
    return F.conv(F.substring(F.md5(_c(col)), 1, hex_chars), 16, 10).cast("long")


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 hex of the normalized text. Exact-dup key."""
    return F.md5(normalize_text(text))


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles as strings ("w1 w2 w3"), the MinHash/Jaccard unit.

    Built with sequence+transform (codegen'd); docs shorter than n yield the
    whole doc as one shingle so no document is unshingleable.
    """
    toks = tokenize_ws(text)
    k = F.greatest(F.size(toks) - (n - 1), F.lit(1))
    return F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )


def count_in_set(words: Column, vocab: tuple[str, ...]) -> Column:
    """How many elements of ``words`` are in a small fixed vocabulary."""
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w))).cast("int")


def lang_id(text: Column | str) -> Column:
    """Heuristic language ID: the language whose marker-word count is highest
    (ties broken by language code order, 'und' if no marker hits).

    Deterministic and SQL-expressible; swap in a model UDF for production.
    """
    toks = tokenize_ws(text)
    scored = None
    for code in sorted(LANG_MARKERS):
        cnt = count_in_set(toks, LANG_MARKERS[code])
        pair = F.struct(cnt.alias("score"), F.lit(code).alias("code"))
        scored = pair if scored is None else F.when(cnt > scored["score"], pair).otherwise(scored)
    return F.when(scored["score"] > 0, scored["code"]).otherwise(F.lit("und"))


def quality_score_milli(text: Column | str) -> Column:
    """Document quality score in [0, 1000] as an exact integer (milli-units).

    Components (classic heuristic filters a la C4/Gopher, integer arithmetic
    for cross-engine exactness):
      +400 * [5 <= n_words <= 10000]
      +300 * [mean word length in [3, 12]]   (len*1 exact via integer div)
      +300 * [stopword fraction >= 1/100]
    """
    toks = tokenize_ws(text)
    n_words = F.size(toks)
    total_chars = F.aggregate(toks, F.lit(0), lambda acc, w: acc + F.length(w))
    # mean word length bounds via cross-multiplication (no division)
    mean_ok = (total_chars >= n_words * 3) & (total_chars <= n_words * 12)
    stop_cnt = count_in_set(toks, STOPWORDS)
    stop_ok = stop_cnt * 100 >= n_words
    len_ok = (n_words >= 5) & (n_words <= 10000)
    return (
        F.when(len_ok, 400).otherwise(0)
        + F.when(mean_ok, 300).otherwise(0)
        + F.when(stop_ok, 300).otherwise(0)
    ).cast("int")


def repetition_stats(df, text_col: str = "text", id_col: str = "doc_id", n: int = 2):
    """Gopher/MassiveText-style within-document repetition signals — the
    classic pretraining filter for boilerplate/spam (Rae et al. 2021 §A1.1
    "repetition removal"): documents dominated by a few repeated n-grams are
    low-quality training data.

    Per document, over word ``n``-grams (shingles):
      - ``n_grams``           total n-gram occurrences
      - ``dup_gram_milli``    1000 x fraction of occurrences belonging to an
                              n-gram that appears more than once (exact
                              integer division — cross-engine hashable)
      - ``top_gram_milli``    1000 x fraction covered by the single most
                              frequent n-gram (ties irrelevant: max count)

    Plan shape (scale-first): explode -> two-phase hash aggregate on
    (doc_id, gram) -> re-aggregate per doc. Both aggregates partial-combine
    map-side, so a hot document collapses before the shuffle; nothing is
    O(doc_len^2) (the per-doc array formulation would be) and no Python
    touches the row path."""
    grams = df.select(F.col(id_col), F.explode(shingles(F.col(text_col), n)).alias("g"))
    per_gram = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return (
        per_gram.groupBy(id_col)
        .agg(
            F.sum("c").alias("_n"),
            F.max("c").alias("_maxc"),
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(0)).alias("_dup"),
        )
        .select(
            F.col(id_col),
            F.col("_n").cast("int").alias("n_grams"),
            F.expr("CAST(1000 * _dup AS BIGINT) div _n").cast("int").alias("dup_gram_milli"),
            F.expr("CAST(1000 * _maxc AS BIGINT) div _n").cast("int").alias("top_gram_milli"),
        )
    )
