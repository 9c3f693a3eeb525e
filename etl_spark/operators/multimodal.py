"""Multimodal payload plumbing: opaque binary columns + typed metadata.

A 100 TB training corpus mixes text with image/audio/video payloads. The
engine treats those as ``binary`` columns with typed metadata beside them —
the same pattern as the reference's raster payloads (opaque grid blob +
typed metadata record threaded per slice,
``src/worldclim/.../common/WorldClimHistoricalTemperatureMetadata.scala:7-23``).

Real parts (tested): schema, partition-friendly layout, Arrow-batched UDF
plumbing (mapInPandas over binary columns, batch-shaped), deterministic
metadata extraction (size, content hash, magic-byte sniffing).

Stubbed parts (clearly marked): actual image/audio decode — the codec
libraries (Pillow, torchaudio, ffmpeg) are not in this container. The decode
kernel raises NotImplementedError unless ``fake=True``, which substitutes a
deterministic fake "decoder" so the Spark-side contract (signature, schema,
batching) is fully exercised by tests.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

MAGIC_PREFIXES = {
    "png": b"\x89PNG",
    "jpeg": b"\xff\xd8\xff",
    "gif": b"GIF8",
    "riff": b"RIFF",  # wav/avi containers
}


def to_binary_payload(text: Column | str) -> Column:
    """Encode a string column as a binary payload (utf-8) — the test stand-in
    for real media bytes; identical to ANSI ``encode()``."""
    c = F.col(text) if isinstance(text, str) else text
    return F.encode(c, "utf-8")


def binary_meta(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id") -> DataFrame:
    """Typed metadata for a binary column, computed JVM-side: byte length,
    sha256 content address, sniffed container format ('unknown' when no magic
    matches)."""
    sniff = F.lit("unknown")
    for name, magic in MAGIC_PREFIXES.items():
        hexpat = magic.hex()
        sniff = F.when(F.hex(F.substring(F.col(payload_col), 1, len(magic))) == hexpat.upper(), F.lit(name)).otherwise(sniff)
    return df.select(
        F.col(id_col),
        F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
        F.sha2(F.col(payload_col), 256).alias("sha256"),
        sniff.alias("format"),
    )


def decode_and_featurize(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    fake: bool = False,
) -> DataFrame:
    """Decode binary media and emit fixed-size feature vectors via an
    Arrow-batched mapInPandas kernel (never per-row Python).

    STUB: the real decoder needs codec libraries absent from this container;
    ``fake=True`` swaps in a deterministic byte-histogram "feature extractor"
    so the batching/schema/partitioning contract is real and tested. Swap
    ``_decode_real`` for a Pillow/torchvision kernel in production — the
    Spark plumbing does not change.
    """
    out_schema = f"{id_col} long, width int, height int, features array<double>"

    def _decode_real(payload: bytes) -> tuple[int, int, list[float]]:
        raise NotImplementedError(
            "media decode requires codec libraries not present in this environment; "
            "use fake=True for the deterministic test kernel"
        )

    def _decode_fake(payload: bytes) -> tuple[int, int, list[float]]:
        # deterministic 8-bin byte histogram, normalized by length
        n = max(len(payload), 1)
        hist = [0] * 8
        for by in payload:
            hist[by >> 5] += 1
        return (n % 640, n % 480, [h / n for h in hist])

    decode = _decode_fake if fake else _decode_real

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ws, hs, feats = [], [], [], []
            for doc_id, payload in zip(pdf[id_col], pdf[payload_col]):
                w, h, f = decode(bytes(payload))
                ids.append(doc_id)
                ws.append(w)
                hs.append(h)
                feats.append(f)
            yield pd.DataFrame({id_col: ids, "width": ws, "height": hs, "features": feats})

    return df.select(id_col, payload_col).mapInPandas(kernel, schema=out_schema)


def frame_sample_plan(df: DataFrame, payload_col: str = "payload", id_col: str = "doc_id", every_n: int = 10) -> DataFrame:
    """Plan rows for video frame sampling: one output row per frame index to
    decode, computed from metadata only (JVM-side; the decode itself is the
    stubbed kernel above). Demonstrates the explode-then-decode layout that
    keeps each frame an independent task at scale."""
    n_frames = (F.length(F.col(payload_col)) / F.lit(256)).cast("int") + 1  # fake container: 256 B/frame
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))).alias("frame_idx"),
    )
