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
