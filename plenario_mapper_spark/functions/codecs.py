"""Pure-numpy codecs for the multimodal decode path (no PIL/librosa/ffmpeg in
this container — three uncompressed formats plus PNG via stdlib zlib are
fully decodable from their public byte layouts, which is enough to make
operators/multimodal's feature extraction REAL instead of a byte-histogram
stub).

Formats (all public specs):
- PNG: 8-byte magic + chunked container (IHDR/IDAT/IEND, big-endian lengths,
  CRC32), DEFLATE-compressed scanlines, per-line filters 0-4 reconstructed
  per spec (gray / RGB / gray+alpha / RGBA at bit depth 8, non-interlaced).
- PNM (P5 grayscale / P6 RGB, binary variants): ASCII header
  "P5|P6 <width> <height> <maxval>" with #-comments, then raw samples.
- BMP: BITMAPFILEHEADER ('BM', pixel-array offset at byte 10) +
  BITMAPINFOHEADER (width i32@18, height i32@22, bpp u16@28, BI_RGB only),
  rows padded to 4 bytes, bottom-up when height > 0.
- WAV: RIFF/WAVE chunk stream; 'fmt ' (PCM=1, channels u16, sample_rate u32,
  bits u16) + 'data' (PCM16 little-endian samples).

Encoders exist so tests and oracle-checked queries can synthesize payloads with
analytically predictable decoded statistics; decoders are what
multimodal.decode_features runs inside Arrow-batched mapInPandas.

Reference parity note: the reference (app/mapper.js) has no multimodal surface
at all — this module serves SURVEY §2.H4 (driver-mandated extension).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass

import numpy as np


@dataclass
class Decoded:
    """Uniform decode result across modalities."""

    modality: str  # 'image' | 'audio'
    mime: str
    width: int | None = None
    height: int | None = None
    channels: int | None = None
    sample_rate: int | None = None
    # pixels: uint8 array (h, w, c) or (h, w); samples: int16 array (n,) or (n, c)
    data: np.ndarray | None = None


# ---------------------------------------------------------------------------
# PNM (P5/P6 binary)
# ---------------------------------------------------------------------------

def encode_pnm(pixels: np.ndarray) -> bytes:
    """uint8 array (h, w) -> P5, (h, w, 3) -> P6."""
    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        magic, (h, w) = b"P5", a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        magic, (h, w, _) = b"P6", a.shape
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {a.shape}")
    return magic + f"\n{w} {h}\n255\n".encode() + a.tobytes()


def _pnm_header_tokens(b: bytes, n: int) -> tuple[list[int], int]:
    """Read n whitespace-separated integer tokens after the magic, skipping
    #-comments; returns (tokens, offset of first raw byte)."""
    toks: list[int] = []
    i = 2  # past magic
    while len(toks) < n:
        while i < len(b) and b[i : i + 1].isspace():
            i += 1
        if i < len(b) and b[i : i + 1] == b"#":
            while i < len(b) and b[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(b) and not b[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        toks.append(int(b[i:j]))
        i = j
    return toks, i + 1  # single whitespace byte after maxval


def decode_pnm(b: bytes) -> Decoded:
    magic = b[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError("not a binary PNM payload")
    (w, h, maxval), off = _pnm_header_tokens(b, 3)
    if maxval > 255:
        raise ValueError("16-bit PNM not supported")
    ch = 1 if magic == b"P5" else 3
    need = w * h * ch
    raw = np.frombuffer(b, dtype=np.uint8, count=need, offset=off)
    shape = (h, w) if ch == 1 else (h, w, 3)
    return Decoded(
        modality="image",
        mime="image/x-portable-graymap" if ch == 1 else "image/x-portable-pixmap",
        width=w,
        height=h,
        channels=ch,
        data=raw.reshape(shape),
    )


# ---------------------------------------------------------------------------
# BMP (24-bit BI_RGB)
# ---------------------------------------------------------------------------

def encode_bmp(bgr: np.ndarray) -> bytes:
    """uint8 array (h, w, 3) in BGR order -> 24-bit bottom-up BI_RGB BMP."""
    a = np.asarray(bgr, dtype=np.uint8)
    h, w, ch = a.shape
    if ch != 3:
        raise ValueError("24-bit BMP needs (h, w, 3)")
    row = w * 3
    pad = (-row) % 4
    body = b"".join(
        a[r].tobytes() + b"\x00" * pad for r in range(h - 1, -1, -1)
    )
    pixel_off = 14 + 40
    file_size = pixel_off + len(body)
    file_hdr = struct.pack("<2sIHHI", b"BM", file_size, 0, 0, pixel_off)
    info_hdr = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0
    )
    return file_hdr + info_hdr + body


def decode_bmp(b: bytes) -> Decoded:
    if b[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pixel_off = struct.unpack_from("<I", b, 10)[0]
    w, h_signed = struct.unpack_from("<ii", b, 18)
    bpp = struct.unpack_from("<H", b, 28)[0]
    compression = struct.unpack_from("<I", b, 30)[0]
    # 24-bit BI_RGB only: lower bit depths are palette-indexed (the pixel
    # array holds palette indices, not intensities), which would need the
    # color table to produce honest statistics.
    if compression != 0 or bpp != 24:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h, bottom_up = abs(h_signed), h_signed > 0
    stride = ((bpp * w + 31) // 32) * 4
    rows = [
        np.frombuffer(b, np.uint8, count=w * 3, offset=pixel_off + r * stride)
        for r in range(h)
    ]
    if bottom_up:
        rows.reverse()
    return Decoded(
        modality="image",
        mime="image/bmp",
        width=w,
        height=h,
        channels=3,
        data=np.stack(rows).reshape(h, w, 3),
    )


# ---------------------------------------------------------------------------
# WAV (PCM16)
# ---------------------------------------------------------------------------

def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """int16 array (n,) mono or (n, c) -> RIFF/WAVE PCM16."""
    a = np.asarray(samples, dtype="<i2")
    n_ch = 1 if a.ndim == 1 else a.shape[1]
    body = a.tobytes()
    block = 2 * n_ch
    fmt = struct.pack(
        "<HHIIHH", 1, n_ch, sample_rate, sample_rate * block, block, 16
    )
    chunks = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(body)) + body
    )
    return b"RIFF" + struct.pack("<I", len(chunks)) + chunks


def decode_wav(b: bytes) -> Decoded:
    if b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    i, n = 12, len(b)
    sample_rate = n_ch = bits = None
    data = None
    while i + 8 <= n:
        cid, size = b[i : i + 4], struct.unpack_from("<I", b, i + 4)[0]
        if cid == b"fmt ":
            audio_fmt, n_ch, sample_rate = struct.unpack_from("<HHI", b, i + 8)
            bits = struct.unpack_from("<H", b, i + 22)[0]
            if audio_fmt != 1 or bits != 16:
                raise ValueError(f"unsupported WAV (fmt={audio_fmt}, bits={bits})")
        elif cid == b"data":
            data = np.frombuffer(b, dtype="<i2", count=size // 2, offset=i + 8)
        i += 8 + size + (size & 1)  # chunks are word-aligned
    if data is None or sample_rate is None:
        raise ValueError("WAV missing fmt/data chunk")
    if n_ch and n_ch > 1:
        data = data[: (len(data) // n_ch) * n_ch].reshape(-1, n_ch)
    return Decoded(
        modality="audio",
        mime="audio/wav",
        channels=n_ch,
        sample_rate=sample_rate,
        data=data,
    )


# ---------------------------------------------------------------------------
# PNG (stdlib zlib — the one COMPRESSED image format fully decodable without
# PIL: the container layout, DEFLATE stream, and scanline filters are all
# public spec; closes the r4 "compressed codecs degrade to byte stats" gap)
# ---------------------------------------------------------------------------

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """uint8 (h, w) -> grayscale PNG (color type 0); (h, w, 3) -> RGB (type 2).
    Bit depth 8, non-interlaced, every scanline filter 0 (None) — the minimal
    spec-conformant encoding any PNG reader accepts."""
    import zlib

    a = np.asarray(pixels, dtype=np.uint8)
    if a.ndim == 2:
        color_type, ch, (h, w) = 0, 1, a.shape
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, ch, (h, w, _) = 2, 3, a.shape
    else:
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {a.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = b"".join(b"\x00" + a[r].tobytes() for r in range(h))
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _png_defilter(raw: bytes, h: int, w: int, ch: int) -> np.ndarray:
    """Undo per-scanline filtering (types 0-4: None/Sub/Up/Average/Paeth).
    bpp = ch bytes at bit depth 8; `a` is the byte bpp to the left, `b` the
    byte above, `c` above-left — the spec's reconstruction functions."""
    stride = w * ch
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    for r in range(h):
        ftype = raw[pos]
        line = np.frombuffer(raw, np.uint8, count=stride, offset=pos + 1).copy()
        pos += 1 + stride
        prev = out[r - 1] if r > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[r] = line
        elif ftype == 1:  # Sub
            for i in range(stride):
                left = out[r, i - ch] if i >= ch else 0
                out[r, i] = (int(line[i]) + int(left)) & 0xFF
        elif ftype == 2:  # Up
            out[r] = (line.astype(np.int32) + prev.astype(np.int32)).astype(np.uint8)
        elif ftype == 3:  # Average
            for i in range(stride):
                left = out[r, i - ch] if i >= ch else 0
                out[r, i] = (int(line[i]) + (int(left) + int(prev[i])) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = int(out[r, i - ch]) if i >= ch else 0
                up = int(prev[i])
                ul = int(prev[i - ch]) if i >= ch else 0
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc else ul)
                out[r, i] = (int(line[i]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
    return out.reshape((h, w) if ch == 1 else (h, w, ch))


def decode_png(b: bytes) -> Decoded:
    import zlib

    if b[: len(_PNG_MAGIC)] != _PNG_MAGIC:
        raise ValueError("not a PNG payload")
    i, n = len(_PNG_MAGIC), len(b)
    w = h = None
    ch = 1
    idat: list[bytes] = []
    while i + 8 <= n:
        (length,) = struct.unpack_from(">I", b, i)
        tag = b[i + 4 : i + 8]
        body = b[i + 8 : i + 8 + length]
        if tag == b"IHDR":
            w, h, depth, color_type, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or interlace != 0:
                raise ValueError(f"unsupported PNG (depth={depth}, interlace={interlace})")
            # 0 gray, 2 RGB, 4 gray+alpha, 6 RGBA; palette (3) needs PLTE
            ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
            if ch is None:
                raise ValueError(f"unsupported PNG color type {color_type}")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
        i += 12 + length  # length + tag + body + crc
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(b"".join(idat))
    if len(raw) != h * (1 + w * ch):
        raise ValueError("PNG pixel data length mismatch")
    return Decoded(
        modality="image",
        mime="image/png",
        width=w,
        height=h,
        channels=ch,
        data=_png_defilter(raw, h, w, ch),
    )


# ---------------------------------------------------------------------------
# Resampling (pure numpy — the container has no PIL)
# ---------------------------------------------------------------------------

def bilinear_resize(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Bilinear resample of a uint8 image (h, w) or (h, w, c) to (out_h, out_w).

    Half-pixel-center sampling (the PIL/OpenCV convention): source coordinate
    for output x is (x + 0.5) * w/out_w - 0.5, edges clamped. Rounding is
    HALF-UP (floor(v + 0.5)), chosen over numpy's half-to-even so the result
    is exactly mirrorable in integer SQL: at an exact 2x downsample every
    weight is 0.25 and each output pixel is precisely
    (a + b + c + d + 2) // 4 of its 2x2 source block — the closed form
    q_binary_resize's DuckDB oracle recomputes. The 0.25-weighted float sum is
    exact in IEEE double (integer sums <= 1020 scaled by a power of two), so
    the SQL and numpy paths agree bit-for-bit."""
    a = np.asarray(img, dtype=np.float64)
    h, w = a.shape[:2]
    if out_h <= 0 or out_w <= 0:
        raise ValueError("target dims must be positive")
    ys = (np.arange(out_h) + 0.5) * (h / out_h) - 0.5
    xs = (np.arange(out_w) + 0.5) * (w / out_w) - 0.5
    y0f, x0f = np.floor(ys), np.floor(xs)
    wy, wx = ys - y0f, xs - x0f
    y0 = np.clip(y0f.astype(np.int64), 0, h - 1)
    x0 = np.clip(x0f.astype(np.int64), 0, w - 1)
    y1 = np.clip(y0f.astype(np.int64) + 1, 0, h - 1)
    x1 = np.clip(x0f.astype(np.int64) + 1, 0, w - 1)
    if a.ndim == 3:
        wy = wy[:, None, None]
        wx = wx[None, :, None]
    else:
        wy = wy[:, None]
        wx = wx[None, :]
    top = (1.0 - wx) * a[y0][:, x0] + wx * a[y0][:, x1]
    bot = (1.0 - wx) * a[y1][:, x0] + wx * a[y1][:, x1]
    res = (1.0 - wy) * top + wy * bot
    return np.clip(np.floor(res + 0.5), 0, 255).astype(np.uint8)


# ---------------------------------------------------------------------------
# Dispatch
# ---------------------------------------------------------------------------

def sniff(b: bytes) -> str | None:
    """Magic-byte format detection; None for unrecognized payloads."""
    if b[:2] in (b"P5", b"P6"):
        return "pnm"
    if b[:2] == b"BM":
        return "bmp"
    if b[:4] == b"RIFF" and b[8:12] == b"WAVE":
        return "wav"
    if b[: len(_PNG_MAGIC)] == _PNG_MAGIC:
        return "png"
    return None


_DECODERS = {
    "pnm": decode_pnm,
    "bmp": decode_bmp,
    "wav": decode_wav,
    "png": decode_png,
}


def decode(b: bytes) -> Decoded | None:
    """Decode a recognized payload; None when the format is unknown OR the
    payload is corrupt/truncated/unsupported despite matching a magic (callers
    fall back to byte-level statistics either way — a Spark operator must be
    total over arbitrary blobs, never fail the task on one bad payload)."""
    raw = bytes(b)
    kind = sniff(raw)
    if kind is None:
        return None
    try:
        return _DECODERS[kind](raw)
    except Exception:
        return None
