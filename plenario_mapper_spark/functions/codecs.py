"""Pure-numpy codecs for the multimodal decode path (no PIL/librosa/ffmpeg in
this container — three uncompressed formats plus PNG via stdlib zlib are
fully decodable from their public byte layouts, which is enough to make
operators/multimodal's feature extraction REAL instead of a byte-histogram
stub).

Formats (all public specs):
- JPEG: baseline sequential DCT (ITU T.81 + JFIF) — marker parse, DQT/DHT
  (multi-table, 8/16-bit quantizers), SOF0/SOF1, DRI/RSTn restarts, Huffman
  entropy decode with FF00 un-stuffing, dequantize + dezigzag + 8x8 IDCT
  (orthonormal basis matmul), chroma upsampling, JFIF YCbCr->RGB.
  Progressive/arithmetic/12-bit raise (callers degrade to byte stats).
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
# JPEG (baseline sequential DCT, ITU T.81 + JFIF — pure numpy + stdlib)
#
# The one codec a real multimodal corpus is mostly made of. Scope: baseline
# sequential (SOF0; SOF1 accepted — identical entropy coding at 8-bit),
# grayscale and YCbCr 3-component, arbitrary h/v sampling factors up to 2
# (so 4:4:4 / 4:2:2 / 4:2:0 all decode), restart intervals (DRI/RSTn),
# multi-table DQT/DHT markers, 8- and 16-bit quantizer precision, APPn/COM
# skip. Out of scope (raise -> callers degrade to byte stats per the decode()
# contract): progressive (SOF2), arithmetic coding, 12-bit precision, CMYK.
#
# The encoder exists so tests and oracle-checked queries can synthesize
# payloads with predictable decoded content: an 8x8-block-constant image with
# even sample values round-trips EXACTLY (the only nonzero coefficient is the
# DC term 8*(v-128), which the Annex-K luminance quantizer q00=16 divides,
# and gray RGB keeps both chroma planes at exactly 128), so closed-form
# DuckDB oracles can predict post-decode statistics bit-for-bit while the
# bytes still traverse real Huffman coding, real DCT/IDCT, and real color
# conversion.
# ---------------------------------------------------------------------------

# Annex K.1/K.2 quantization tables (in natural row-major order).
_JPEG_QL = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
_JPEG_QC = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)


def _zigzag_order() -> np.ndarray:
    """Natural index for each zigzag position: walk the anti-diagonals,
    alternating direction (even diagonal: row decreasing)."""
    out = []
    for d in range(15):
        rng = range(d, -1, -1) if d % 2 == 0 else range(d + 1)
        for r in rng:
            c = d - r
            if r < 8 and c < 8:
                out.append(r * 8 + c)
    return np.array(out, dtype=np.int64)


_ZIGZAG = _zigzag_order()  # _ZIGZAG[k] = natural index of k-th zigzag coeff

# Annex K.3 typical Huffman tables: (BITS[1..16], HUFFVAL). Both encoder and
# decoder work from the tables serialized in the file, so interop only needs
# these to be VALID canonical specs.
_DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis. A @ s @ A.T IS the T.81 A.3.3 FDCT
    (the c_u c_v / 4 scaling falls out of orthonormality); A.T @ S @ A is
    the IDCT."""
    k = np.arange(8)
    a = np.cos(np.pi * (2 * k[None, :] + 1) * k[:, None] / 16.0) / 2.0
    a[0, :] = np.sqrt(1.0 / 8.0)
    return a


_DCT_A = _dct_matrix()


def _huff_canonical(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) via the T.81 C.2 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _huff_decode_map(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol, the decode-side view of the same canon."""
    return {(l, c): s for s, (c, l) in _huff_canonical(bits, vals).items()}


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._n += 1
            if self._n == 8:
                self.buf.append(self._acc)
                if self._acc == 0xFF:  # byte stuffing
                    self.buf.append(0x00)
                self._acc, self._n = 0, 0

    def byte_align(self) -> None:
        if self._n:
            self.write((1 << (8 - self._n)) - 1, 8 - self._n)  # pad with 1s


def _magnitude_category(v: int) -> int:
    return int(abs(v)).bit_length()


def _encode_coeff_bits(v: int, ssss: int) -> int:
    return v if v >= 0 else v + (1 << ssss) - 1


def _encode_block(
    w: _BitWriter,
    coeffs_zz: np.ndarray,
    pred: int,
    dc_tab: dict[int, tuple[int, int]],
    ac_tab: dict[int, tuple[int, int]],
) -> int:
    """Huffman-encode one quantized block (zigzag order); returns new DC pred."""
    dc = int(coeffs_zz[0])
    diff = dc - pred
    ssss = _magnitude_category(diff)
    code, ln = dc_tab[ssss]
    w.write(code, ln)
    if ssss:
        w.write(_encode_coeff_bits(diff, ssss), ssss)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coeffs_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coeffs_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_tab[0xF0]  # ZRL
            w.write(code, ln)
            run -= 16
        ssss = _magnitude_category(v)
        code, ln = ac_tab[(run << 4) | ssss]
        w.write(code, ln)
        w.write(_encode_coeff_bits(v, ssss), ssss)
        run = 0
    if last_nz < 63:
        code, ln = ac_tab[0x00]  # EOB
        w.write(code, ln)
    return dc


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 -> Annex K verbatim."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _plane_blocks_fdct(plane: np.ndarray, qt_nat: np.ndarray) -> np.ndarray:
    """float plane (H8, W8) -> quantized zigzag coeffs (H8/8, W8/8, 64)."""
    h8, w8 = plane.shape
    shifted = plane - 128.0
    out = np.empty((h8 // 8, w8 // 8, 64), dtype=np.int64)
    for by in range(h8 // 8):
        for bx in range(w8 // 8):
            s = shifted[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
            coeff = _DCT_A @ s @ _DCT_A.T
            qz = np.round(coeff.reshape(64)[_ZIGZAG] / qt_nat[_ZIGZAG])
            out[by, bx] = qz.astype(np.int64)
    return out


def _pad_to(plane: np.ndarray, h8: int, w8: int) -> np.ndarray:
    """Edge-replicate a plane to (h8, w8) — the spec's recommended fill."""
    h, w = plane.shape
    return np.pad(plane, ((0, h8 - h), (0, w8 - w)), mode="edge")


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 90,
    subsampling: tuple[int, int] = (1, 1),
    restart_interval: int = 0,
) -> bytes:
    """uint8 (h, w) -> grayscale baseline JPEG; (h, w, 3) RGB -> YCbCr.

    `subsampling` is the luma (h, v) sampling-factor pair — (1, 1) is 4:4:4,
    (2, 1) 4:2:2, (2, 2) 4:2:0; chroma is box-averaged accordingly.
    `restart_interval` > 0 emits DRI + RSTn markers every that many MCUs
    (predictor reset + byte alignment), exercising the decoder's restart path.
    """
    a = np.asarray(pixels, dtype=np.uint8)
    gray = a.ndim == 2
    if not gray and (a.ndim != 3 or a.shape[2] != 3):
        raise ValueError(f"expected (h,w) or (h,w,3) uint8, got {a.shape}")
    h, w = a.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    sh, sv = (1, 1) if gray else subsampling
    if sh not in (1, 2) or sv not in (1, 2):
        raise ValueError("luma sampling factors must be 1 or 2")
    ql = _quality_scale(_JPEG_QL, quality)
    qc = _quality_scale(_JPEG_QC, quality)

    if gray:
        planes = [a.astype(np.float64)]
        comps = [(1, 1, 1, 0)]  # (id, h, v, tq)
        qts = [ql]
    else:
        r, g, b = (a[..., i].astype(np.float64) for i in range(3))
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if sh > 1 or sv > 1:
            ph, pw = -(-h // sv) * sv, -(-w // sh) * sh
            cb = _pad_to(cb, ph, pw).reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
            cr = _pad_to(cr, ph, pw).reshape(ph // sv, sv, pw // sh, sh).mean(axis=(1, 3))
        planes = [y, cb, cr]
        comps = [(1, sh, sv, 0), (2, 1, 1, 1), (3, 1, 1, 1)]
        qts = [ql, qc, qc]

    mcus_x = -(-w // (8 * sh))
    mcus_y = -(-h // (8 * sv))
    blocks = []  # per component: (grid of zigzag coeffs, hi, vi)
    for plane, (_cid, hi, vi, _tq), qt in zip(planes, comps, qts):
        grid = _plane_blocks_fdct(
            _pad_to(plane, mcus_y * vi * 8, mcus_x * hi * 8), qt
        )
        blocks.append((grid, hi, vi))

    dc_tabs = [_huff_canonical(_DC_L_BITS, _DC_L_VALS)] + (
        [] if gray else [_huff_canonical(_DC_C_BITS, _DC_C_VALS)] * 2
    )
    ac_tabs = [_huff_canonical(_AC_L_BITS, _AC_L_VALS)] + (
        [] if gray else [_huff_canonical(_AC_C_BITS, _AC_C_VALS)] * 2
    )

    bw = _BitWriter()
    preds = [0] * len(comps)
    mcu_i = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                bw.byte_align()
                bw.buf += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                preds = [0] * len(comps)
            for ci, (grid, hi, vi) in enumerate(blocks):
                for by in range(vi):
                    for bx in range(hi):
                        preds[ci] = _encode_block(
                            bw,
                            grid[my * vi + by, mx * hi + bx],
                            preds[ci],
                            dc_tabs[ci],
                            ac_tabs[ci],
                        )
            mcu_i += 1
    bw.byte_align()

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 1, 1) + b"\x00\x00")
    out += seg(0xDB, b"\x00" + bytes(ql[_ZIGZAG].astype(np.uint8)))
    if not gray:
        out += seg(0xDB, b"\x01" + bytes(qc[_ZIGZAG].astype(np.uint8)))
    sof = struct.pack(">BHHB", 8, h, w, len(comps))
    for cid, hi, vi, tq in comps:
        sof += bytes([cid, (hi << 4) | vi, tq])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00] + _DC_L_BITS + _DC_L_VALS))
    out += seg(0xC4, bytes([0x10] + _AC_L_BITS + _AC_L_VALS))
    if not gray:
        out += seg(0xC4, bytes([0x01] + _DC_C_BITS + _DC_C_VALS))
        out += seg(0xC4, bytes([0x11] + _AC_C_BITS + _AC_C_VALS))
    if restart_interval:
        out += seg(0xDD, struct.pack(">H", restart_interval))
    sos = bytes([len(comps)])
    for ci, (cid, _hi, _vi, _tq) in enumerate(comps):
        td_ta = 0x00 if ci == 0 else 0x11
        sos += bytes([cid, td_ta])
    sos += b"\x00\x3f\x00"  # Ss=0 Se=63 AhAl=0
    out += seg(0xDA, sos)
    out += bw.buf
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """MSB-first bit reader over an entropy-coded segment: un-stuffs FF00,
    stops (pending marker) at any other FFxx."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self._acc = 0
        self._n = 0
        self.marker: int | None = None

    def _fill(self) -> None:
        if self.marker is not None:
            raise ValueError("read past marker in entropy data")
        if self.pos >= len(self.data):
            raise ValueError("truncated entropy data")
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1] if self.pos + 1 < len(self.data) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                self.marker = nxt
                raise ValueError("read past marker in entropy data")
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def read_bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def restart(self) -> None:
        """Byte-align, consume the expected RSTn marker, resume."""
        self._acc, self._n = 0, 0
        if self.marker is None:
            # align forward to the marker (we stopped mid-byte on pad bits).
            # A pad byte that happens to be 0xFF was byte-STUFFED by the
            # encoder (FF 00) — that pair is data padding, not the marker;
            # skip it rather than misreading 0x00 as the restart marker.
            while self.pos < len(self.data):
                if self.data[self.pos] != 0xFF:
                    self.pos += 1
                elif (
                    self.pos + 1 < len(self.data)
                    and self.data[self.pos + 1] == 0x00
                ):
                    self.pos += 2  # stuffed pad byte
                else:
                    break
            if self.pos + 1 >= len(self.data):
                raise ValueError("missing restart marker")
            self.marker = self.data[self.pos + 1]
            self.pos += 2
        else:
            self.pos += 2
        if not (0xD0 <= self.marker <= 0xD7):
            raise ValueError(f"expected RSTn, got {self.marker:#x}")
        self.marker = None


def _huff_read(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.read_bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _receive_extend(br: _BitReader, ssss: int) -> int:
    v = br.read_bits(ssss)
    if v < (1 << (ssss - 1)):
        v -= (1 << ssss) - 1
    return v


def decode_jpeg(b: bytes) -> Decoded:
    if b[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload")
    qtables: dict[int, np.ndarray] = {}  # id -> natural-order 64 int
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}  # (class,id)
    comps: list[tuple[int, int, int, int]] = []  # (id, h, v, tq)
    w = h = None
    restart_interval = 0
    i = 2
    scan = None
    while i + 4 <= len(b):
        if b[i] != 0xFF:
            raise ValueError("marker expected")
        marker = b[i + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            break
        (seglen,) = struct.unpack_from(">H", b, i + 2)
        body = b[i + 4 : i + 2 + seglen]
        if marker == 0xDB:  # DQT, possibly several tables
            j = 0
            while j < len(body):
                pq, tq = body[j] >> 4, body[j] & 15
                n = 64 * (2 if pq else 1)
                raw = body[j + 1 : j + 1 + n]
                vals = (
                    np.frombuffer(raw, dtype=">u2").astype(np.int64)
                    if pq
                    else np.frombuffer(raw, dtype=np.uint8).astype(np.int64)
                )
                nat = np.empty(64, dtype=np.int64)
                nat[_ZIGZAG] = vals
                qtables[tq] = nat
                j += 1 + n
        elif marker in (0xC0, 0xC1):  # baseline / extended sequential
            prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
            if prec != 8:
                raise ValueError(f"unsupported JPEG precision {prec}")
            if nf not in (1, 3):
                raise ValueError(f"unsupported JPEG component count {nf}")
            comps = [
                (body[6 + 3 * c], body[7 + 3 * c] >> 4, body[7 + 3 * c] & 15,
                 body[8 + 3 * c])
                for c in range(nf)
            ]
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(f"unsupported JPEG SOF type {marker:#x}")
        elif marker == 0xC4:  # DHT, possibly several tables
            j = 0
            while j < len(body):
                tc, th = body[j] >> 4, body[j] & 15
                bits = list(body[j + 1 : j + 17])
                n = sum(bits)
                vals = list(body[j + 17 : j + 17 + n])
                htables[(tc, th)] = _huff_decode_map(bits, vals)
                j += 17 + n
        elif marker == 0xDD:
            (restart_interval,) = struct.unpack_from(">H", body, 0)
        elif marker == 0xDA:  # SOS — entropy data follows the header
            ns = body[0]
            scan = [(body[1 + 2 * c], body[2 + 2 * c] >> 4, body[2 + 2 * c] & 15)
                    for c in range(ns)]
            i += 2 + seglen
            break
        # APPn / COM / others: skip
        i += 2 + seglen
    if scan is None or not comps or w is None:
        raise ValueError("JPEG missing SOF/SOS")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    order = {cid: k for k, (cid, _h, _v, _tq) in enumerate(comps)}
    tabs = [None] * len(comps)
    for cid, td, ta in scan:
        k = order[cid]
        tabs[k] = (htables[(0, td)], htables[(1, ta)])
    grids = [
        np.zeros((mcus_y * vi * 8, mcus_x * hi * 8), dtype=np.float64)
        for (_cid, hi, vi, _tq) in comps
    ]
    br = _BitReader(b, i)
    preds = [0] * len(comps)
    mcu_i = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_i and mcu_i % restart_interval == 0:
                br.restart()
                preds = [0] * len(comps)
            for ci, (cid, hi, vi, tq) in enumerate(comps):
                dc_tab, ac_tab = tabs[ci]
                qt = qtables[tq]
                for by in range(vi):
                    for bx in range(hi):
                        zz = np.zeros(64, dtype=np.int64)
                        t = _huff_read(br, dc_tab)
                        diff = _receive_extend(br, t) if t else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = _huff_read(br, ac_tab)
                            r, s = rs >> 4, rs & 15
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC coefficient overrun")
                            zz[k] = _receive_extend(br, s)
                            k += 1
                        nat = np.zeros(64, dtype=np.float64)
                        nat[_ZIGZAG] = zz * qt[_ZIGZAG]
                        blk = _DCT_A.T @ nat.reshape(8, 8) @ _DCT_A + 128.0
                        gy = (my * vi + by) * 8
                        gx = (mx * hi + bx) * 8
                        grids[ci][gy : gy + 8, gx : gx + 8] = blk
            mcu_i += 1

    planes = []
    for (cid, hi, vi, _tq), grid in zip(comps, grids):
        ch = -(-h * vi // vmax)
        cw = -(-w * hi // hmax)
        p = grid[:ch, :cw]
        if hi != hmax or vi != vmax:
            p = np.repeat(np.repeat(p, vmax // vi, axis=0), hmax // hi, axis=1)
        planes.append(p[:h, :w])
    if len(planes) == 1:
        data = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        channels = 1
    else:
        y, cb, cr = planes
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
        bl = y + 1.772 * (cb - 128.0)
        data = np.clip(np.round(np.stack([r, g, bl], axis=-1)), 0, 255).astype(
            np.uint8
        )
        channels = 3
    return Decoded(
        modality="image",
        mime="image/jpeg",
        width=w,
        height=h,
        channels=channels,
        data=data,
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
    if b[:2] == b"\xff\xd8":
        return "jpeg"
    return None


_DECODERS = {
    "pnm": decode_pnm,
    "bmp": decode_bmp,
    "wav": decode_wav,
    "png": decode_png,
    "jpeg": decode_jpeg,
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
