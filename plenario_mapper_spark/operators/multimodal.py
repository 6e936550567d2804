"""Multimodal column handling: opaque binary payloads + typed metadata.

Pattern for image/audio/video at 100 TB:

- payloads are BINARY columns (or pointers into object storage) with a typed
  metadata struct (modality, mime, width/height/duration, sha256);
- cheap metadata ops (length, digest, filtering, routing) stay JVM-side;
- decode / feature-extraction / resize / frame-sampling run as Arrow-batched
  mapInPandas — one Python worker per partition, whole Arrow batches in flight,
  never row-at-a-time.

Decode is REAL for uncompressed formats: functions/codecs.py implements
pure-numpy PNM (P5/P6), 24-bit BMP, and PCM16 WAV decoders from their public
byte layouts, and `decode_features` runs them inside Arrow-batched mapInPandas
(header parse + pixel/sample statistics). Compressed formats (JPEG/MP3/H.264)
would need PIL/librosa/ffmpeg, absent in this container — those payloads fall
back to the byte-histogram path with modality 'unknown', same schema, so the
pipeline is total over arbitrary blobs. `extract_features` (pure byte stats)
remains as the codec-free fast path.
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
    """REAL image resize via Arrow-batched mapInPandas: decode (pure-numpy
    PNM/BMP codecs), bilinear-resample to (height, width) with half-pixel
    centers (functions/codecs.bilinear_resize), re-encode in the source format.
    One output row per input row. Non-image or undecodable payloads keep the
    operator total: payload comes back NULL with resize_version 'unsupported'
    (a Spark stage must never die on one bad blob — same policy as
    decode_features). Scale shape: embarrassingly parallel, no shuffle; the
    per-row cost is the decode+resample, all numpy inside one Arrow batch."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from plenario_mapper_spark.functions import codecs

        encoders = {
            "image/x-portable-graymap": codecs.encode_pnm,
            "image/x-portable-pixmap": codecs.encode_pnm,
            "image/bmp": codecs.encode_bmp,
        }
        for pdf in it:
            out = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                dec = codecs.decode(payload) if payload is not None else None
                if dec is None or dec.modality != "image":
                    out.append((int(doc_id), None, width, height, "unsupported"))
                    continue
                try:
                    # a structurally-valid header can still carry degenerate
                    # geometry (e.g. a 0x0 PNM) — resample/encode must degrade
                    # like decode does, never kill the stage
                    px = codecs.bilinear_resize(dec.data, height, width)
                    b = encoders[dec.mime](px)
                except Exception:
                    out.append((int(doc_id), None, width, height, "unsupported"))
                    continue
                out.append((int(doc_id), b, width, height, "bilinear-v1"))
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


DECODE_SCHEMA = (
    "doc_id long, modality string, mime string, width int, height int, "
    "channels int, sample_rate int, n_units long, val_mean double, "
    "val_std double, feature_version string"
)


def _decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """REAL decode: sniff + header-parse + pixel/sample stats via the pure-numpy
    codecs (functions/codecs.py). Unrecognized payloads fall back to byte stats
    with modality 'unknown' (same row shape) so the operator is total.

    n_units / val_mean / val_std are over the DECODED domain: pixels (uint8,
    all channels) for images, samples (int16) for audio, raw bytes for unknown.
    """
    import numpy as np

    from plenario_mapper_spark.functions import codecs

    cols = [
        "doc_id", "modality", "mime", "width", "height", "channels",
        "sample_rate", "n_units", "val_mean", "val_std", "feature_version",
    ]
    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            d = codecs.decode(bytes(payload))
            if d is None:
                arr = np.frombuffer(payload, dtype=np.uint8)
                rows.append(
                    (int(doc_id), "unknown", "application/octet-stream",
                     None, None, None, None, int(arr.size),
                     float(arr.mean()) if arr.size else 0.0,
                     float(arr.std()) if arr.size else 0.0, "codec-v1")
                )
                continue
            a = d.data.astype(np.float64)
            rows.append(
                (int(doc_id), d.modality, d.mime, d.width, d.height,
                 d.channels, d.sample_rate, int(a.size),
                 float(a.mean()) if a.size else 0.0,
                 float(a.std()) if a.size else 0.0, "codec-v1")
            )
        yield pd.DataFrame(rows, columns=cols)


def decode_features(binary_df: DataFrame) -> DataFrame:
    """Real-decode feature extraction (PNM/BMP/WAV via pure-numpy codecs) over
    Arrow-batched mapInPandas. Input needs (doc_id, payload); embarrassingly
    parallel, no shuffle — identical scale shape to extract_features."""
    return binary_df.select("doc_id", "payload").mapInPandas(
        _decode_batches, schema=DECODE_SCHEMA
    )
