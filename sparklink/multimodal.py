"""Multimodal (binary) column plumbing for training-data pipelines.

Image/audio/video payloads travel as opaque ``binary`` columns with typed
metadata structs. The Spark-side plumbing — schema, partition sizing,
mapInPandas batch shape, metadata extraction — is real and tested; the
actual codec step is stubbed (decode libraries are not in this container)
behind ``decode_stub``: a deterministic fake keyed on the payload hash, or
``NotImplementedError`` in strict mode. Swapping in a real decoder is a
one-function change; the plan shape does not move.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("mime", StringType()),
        StructField("payload", BinaryType()),
        StructField("meta", StructType([
            StructField("width", IntegerType()),
            StructField("height", IntegerType()),
            StructField("duration_ms", IntegerType()),
        ])),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("n_bytes", LongType()),
        StructField("payload_sha", StringType()),
        StructField("feature", ArrayType(FloatType())),
        # integer per-chunk byte sums: the engine-portable face of `feature`
        # (exact arithmetic, no float parity risk) used by the oracle check
        StructField("chunk_sums", ArrayType(LongType())),
    ]
)


def synth_media(spark, n: int = 64, seed: int = 3) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rng = np.random.default_rng(seed)
    rows = []
    kinds = ["image", "audio", "video"]
    for i in range(n):
        kind = kinds[i % 3]
        payload = rng.integers(0, 256, size=int(rng.integers(64, 512)), dtype=np.uint8).tobytes()
        meta = (int(rng.integers(16, 256)), int(rng.integers(16, 256)), int(rng.integers(100, 10_000)))
        rows.append((i, kind, f"{kind}/fake", bytearray(payload), meta))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def decode_stub(payload: bytes, kind: str, dim: int = 8, strict: bool = False) -> tuple[np.ndarray, list[int]]:
    """STUB for the real decode/feature-extract step (image decode, audio
    resample, video frame-sample). Deterministic fake keyed on content:
    chunk j covers bytes [floor(j*n/dim), floor((j+1)*n/dim)) — floor
    boundaries chosen so a SQL oracle replicates them exactly. Returns
    (normalized chunk means float32[dim], integer chunk byte-sums[dim]).
    strict=True raises NotImplementedError (the posture a production
    deploy without codecs should take)."""
    if strict:
        raise NotImplementedError("media decoding requires codec libraries not present in this environment")
    arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
    n = len(arr)
    sums, means = [], []
    for j in range(dim):
        lo, hi = j * n // dim, (j + 1) * n // dim
        chunk = arr[lo:hi]
        s = int(chunk.sum()) if hi > lo else 0
        sums.append(s)
        means.append(float(s) / (hi - lo) / 255.0 if hi > lo else 0.0)
    return np.array(means, dtype=np.float32), sums


def extract_features(media: DataFrame, dim: int = 8, batch_hint: int = 256) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches of (payload, kind) ->
    FEATURE_SCHEMA rows. Column pruning: only the needed columns are
    selected before the UDF so the binary payload is the only heavy column
    shipped; at 100 TB, set spark.sql.files.maxPartitionBytes so ~one batch
    of payloads fits executor memory."""
    pruned = media.select("media_id", "kind", "payload")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            decoded = [decode_stub(p, k, dim=dim) for p, k in zip(pdf["payload"], pdf["kind"])]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "payload_sha": [hashlib.sha256(p).hexdigest() for p in pdf["payload"]],
                    "feature": [f.tolist() for f, _ in decoded],
                    "chunk_sums": [s for _, s in decoded],
                }
            )

    return pruned.mapInPandas(run, FEATURE_SCHEMA)


def media_from_documents(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic media table derived from a parquet corpus: payload =
    UTF-8 bytes of the text (an oracle can recompute every byte), kind
    cycles image/audio/video. This is the oracle-checkable twin of
    synth_media (whose payloads are driver-side RNG bytes)."""
    kind = (
        F.when(F.col(id_col) % 3 == 0, "image").when(F.col(id_col) % 3 == 1, "audio").otherwise("video")
    )
    return docs.select(
        F.col(id_col).cast("bigint").alias("media_id"),
        kind.alias("kind"),
        F.concat(kind, F.lit("/fake")).alias("mime"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
        ).alias("meta"),
    )


def media_summary(media: DataFrame) -> DataFrame:
    """Pure-Column metadata pass (no decode): sizes + hash for exact dedup
    of payloads."""
    return media.select(
        "media_id",
        "kind",
        F.length("payload").alias("n_bytes"),
        F.sha2("payload", 256).alias("payload_sha"),
        F.col("meta.width").alias("width"),
        F.col("meta.height").alias("height"),
        F.col("meta.duration_ms").alias("duration_ms"),
    )
