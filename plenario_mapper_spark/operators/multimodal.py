"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB:

- payloads are BINARY columns (or pointers into object storage) with a typed
  metadata struct (modality, mime, width/height/duration, sha256);
- cheap metadata ops (length, digest, filtering, routing) stay JVM-side;
- decode / feature-extraction / resize / frame-sampling run as Arrow-batched
  mapInPandas — one Python worker per partition, whole Arrow batches in flight,
  never row-at-a-time.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this container, so the decode
body is stubbed: a clearly-marked deterministic fake (byte histogram moments)
keeps the Spark-side plumbing — schema, batch shape, partitioning — real and
tested; `decode_real` raises NotImplementedError until a codec is present.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

META_SCHEMA = (
    "modality string, mime string, width int, height int, n_bytes long, sha256 string"
)

FEATURE_SCHEMA = (
    "doc_id long, n_bytes long, mean_byte double, std_byte double, "
    "entropy double, feature_version string"
)


def attach_binary_meta(
    df: DataFrame, id_col: str, payload_col: str, modality: str = "image", mime: str = "application/octet-stream"
) -> DataFrame:
    """Wrap a binary payload with its typed metadata struct (JVM-side only)."""
    p = F.col(payload_col)
    return df.select(
        F.col(id_col),
        p.alias("payload"),
        F.struct(
            F.lit(modality).alias("modality"),
            F.lit(mime).alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.octet_length(p).cast("long").alias("n_bytes"),
            F.sha2(p, 256).alias("sha256"),
        ).alias("meta"),
    )


def _decode_stub_batches(
    batches: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """STUB decoder: deterministic byte-level statistics standing in for real
    image decode. Arrow-batched; the per-batch loop is vectorized numpy."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            arr = np.frombuffer(payload, dtype=np.uint8)
            if arr.size == 0:
                rows.append((doc_id, 0, 0.0, 0.0, 0.0, "stub-v1"))
                continue
            counts = np.bincount(arr, minlength=256).astype(np.float64)
            probs = counts[counts > 0] / arr.size
            entropy = float(-(probs * np.log2(probs)).sum())
            rows.append(
                (
                    int(doc_id),
                    int(arr.size),
                    float(arr.mean()),
                    float(arr.std()),
                    entropy,
                    "stub-v1",
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_bytes",
                "mean_byte",
                "std_byte",
                "entropy",
                "feature_version",
            ],
        )


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Feature extraction over binary payloads via Arrow-batched mapInPandas.

    Input needs (doc_id, payload). Scale shape: embarrassingly parallel, no
    shuffle; batch size governed by spark.sql.execution.arrow.maxRecordsPerBatch
    (payload-size-aware repartitioning is the caller's lever for huge blobs)."""
    return binary_df.select("doc_id", "payload").mapInPandas(
        _decode_stub_batches, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = (
    "doc_id long, payload binary, width int, height int, resize_version string"
)

FRAME_SCHEMA = "doc_id long, frame_idx int, ts_ms long, frame binary"


def resize_images(binary_df: DataFrame, width: int, height: int) -> DataFrame:
    """Resize via Arrow-batched mapInPandas. STUB transform (truncate/pad bytes to
    width*height — a real PIL `Image.resize` slots into the same batch loop);
    the schema/partitioning contract is the real one: one output row per input,
    payload replaced, target dims recorded."""
    target = width * height

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)[:target]
                b = b + b"\x00" * (target - len(b))
                out.append((int(doc_id), b, width, height, "stub-v1"))
            yield pd.DataFrame(
                out, columns=["doc_id", "payload", "width", "height", "resize_version"]
            )

    return binary_df.select("doc_id", "payload").mapInPandas(
        batches, schema=RESIZE_SCHEMA
    )


def sample_frames(
    binary_df: DataFrame, n_frames: int = 4, frame_ms: int = 1000
) -> DataFrame:
    """Frame sampling: one input video/audio payload -> n_frames output rows
    (UDTF shape — mapInPandas yields more rows than it receives). STUB frames
    are contiguous byte slices; a real ffmpeg/librosa extractor keeps the exact
    same schema and fan-out. No shuffle: fan-out happens inside the scan stage."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                b = bytes(payload)
                step = max(1, len(b) // n_frames)
                for i in range(n_frames):
                    start = min(i * step, len(b))
                    end = len(b) if i == n_frames - 1 else min((i + 1) * step, len(b))
                    out.append((int(doc_id), i, i * frame_ms, b[start:end]))
            yield pd.DataFrame(out, columns=["doc_id", "frame_idx", "ts_ms", "frame"])

    return binary_df.select("doc_id", "payload").mapInPandas(
        batches, schema=FRAME_SCHEMA
    )


def decode_real(binary_df: DataFrame) -> DataFrame:
    """Real codec path — unavailable in this container by design."""
    try:
        import PIL  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "image codec not present in this environment; use extract_features "
            "(stub) — the Spark plumbing is identical"
        ) from e
    raise NotImplementedError("wire PIL decode here when codecs are available")
