"""Multimodal column conventions + processing plumbing.

Convention: a media asset is an opaque ``binary`` payload column plus
typed metadata columns (mime, width/height/duration, source uri) —
optionally wrapped as one variant column carrying the metadata next to
a content hash. The heavy decode/transform steps run as Arrow-batched
``mapInPandas`` so payload bytes never round-trip through Python row
objects.

The actual decoders (PIL/librosa/av) are NOT in this container, so the
decode step is stubbed behind ``NotImplementedError`` with a
deterministic fake used in tests — but the Spark-side plumbing
(schemas, batch iteration, partition sizing) is real and tested.

Scale notes: payload columns dominate bytes — always
``spark.sql.files.maxPartitionBytes``-bound scans, project metadata
WITHOUT the payload column when only metadata is needed (column
pruning keeps the payload out of IO entirely), and repartition by
content-hash prefix before decode so batches are uniform.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

#: Metadata schema produced by featurize_binary.
MEDIA_META_SCHEMA = StructType(
    [
        StructField("asset_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("content_md5", StringType()),
        StructField("magic_hex", StringType()),
    ]
)


def decode_image(payload: bytes) -> "object":
    """Decode an image payload. The image libs are not available in
    this environment — call sites must go through the deterministic
    fake in featurize_binary or catch this."""
    raise NotImplementedError(
        "image decoding requires PIL/libvips, not present in this container"
    )


def featurize_binary(df: DataFrame, payload_col: str, id_col: str) -> DataFrame:
    """Extract metadata features from a binary payload column via
    Arrow-batched mapInPandas (no per-row Python objects for the
    payload — pandas keeps them as bytes).

    Uses hashlib (deterministic) in place of a real decoder; the
    decode hook is ``decode_image`` above.
    """

    def _featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            payloads = pdf[payload_col]
            yield pd.DataFrame(
                {
                    "asset_id": pdf[id_col],
                    "mime": [
                        "image/png" if p[:4] == b"\x89PNG" else "application/octet-stream"
                        for p in payloads
                    ],
                    "n_bytes": [len(p) for p in payloads],
                    "content_md5": [hashlib.md5(p).hexdigest() for p in payloads],
                    "magic_hex": [p[:4].hex() for p in payloads],
                }
            )

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(
        _featurize, MEDIA_META_SCHEMA
    )


def frame_sample_plan(df: DataFrame, payload_col: str, id_col: str, every_n: int = 30) -> DataFrame:
    """Plumbing for video frame sampling: emits one row per sampled
    frame index with the parent asset id. The actual frame decode is
    stubbed (no av/ffmpeg here); frame count is derived
    deterministically from payload length so the fan-out shape — the
    part that matters for partitioning — is real."""
    schema = StructType(
        [
            StructField("asset_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_md5", StringType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            ids, idxs, hashes = [], [], []
            for aid, p in zip(pdf[id_col], pdf[payload_col]):
                n_frames = max(1, len(p) // 64)  # fake: 1 frame per 64 bytes
                for fi in range(0, n_frames, every_n):
                    ids.append(aid)
                    idxs.append(fi)
                    hashes.append(hashlib.md5(p + fi.to_bytes(4, "little")).hexdigest())
            yield pd.DataFrame({"asset_id": ids, "frame_idx": idxs, "frame_md5": hashes})

    return df.select(F.col(id_col), F.col(payload_col)).mapInPandas(_sample, schema)
