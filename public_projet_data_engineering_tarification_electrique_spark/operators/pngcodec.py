"""Minimal pure-stdlib PNG codec (decode + encode) for the multimodal
decode path.

This container has no Pillow, so the "real image decode" the operator
surface promises (VERDICT r9 item 6) is vendored here from the public
W3C PNG specification (RFC 2083 / ISO 15948): signature, chunked
layout (IHDR/IDAT/IEND with CRC-32), zlib-compressed scanlines, and
the five per-scanline filters (None/Sub/Up/Average/Paeth). stdlib
``zlib``+``struct`` do the container work; numpy does the unfiltering
math (Sub is a per-channel cumulative sum mod 256, Up a row-prefix
sum — both vectorized; Average/Paeth fall back to the spec's
per-pixel recurrence).

Scope (the fixture class the engine generates and tests): 8-bit
depth, color types 0 (grayscale), 2 (RGB), 6 (RGBA), no interlace.
Anything else raises loudly — this is a decoder for the pipeline's
own media shards, not a general-purpose image library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: channels per pixel by PNG color type (the supported subset)
_CHANNELS = {0: 1, 2: 3, 6: 4}


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """Encode an (h, w) grayscale or (h, w, 3|4) uint8 array as a real
    PNG (filter type 0 on every scanline, one zlib IDAT). Deterministic
    for a given input — zlib at a fixed level is reproducible."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        h, w, ch, color_type = arr.shape[0], arr.shape[1], 1, 0
        arr = arr[:, :, None]
    elif arr.ndim == 3 and arr.shape[2] == 3:
        h, w, ch, color_type = arr.shape[0], arr.shape[1], 3, 2
    elif arr.ndim == 3 and arr.shape[2] == 4:
        h, w, ch, color_type = arr.shape[0], arr.shape[1], 4, 6
    else:
        raise ValueError(f"unsupported pixel array shape {arr.shape}")
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # each scanline: filter byte 0 + raw bytes
    raw = np.concatenate(
        [
            np.zeros((h, 1), dtype=np.uint8),
            arr.reshape(h, w * ch),
        ],
        axis=1,
    ).tobytes()
    return (
        PNG_SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw, 6))
        + _chunk(b"IEND", b"")
    )


def _iter_chunks(payload: bytes):
    if payload[:8] != PNG_SIGNATURE:
        raise ValueError("not a PNG: bad signature")
    off = 8
    while off + 8 <= len(payload):
        (length,) = struct.unpack_from(">I", payload, off)
        ctype = payload[off + 4 : off + 8]
        data = payload[off + 8 : off + 8 + length]
        if len(data) != length:
            raise ValueError(f"truncated {ctype!r} chunk")
        crc = struct.unpack_from(">I", payload, off + 8 + length)[0]
        if zlib.crc32(ctype + data) & 0xFFFFFFFF != crc:
            raise ValueError(f"CRC mismatch in {ctype!r} chunk")
        yield ctype, data
        off += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("no IEND chunk")


def png_meta(payload: bytes) -> tuple[int, int, int, int]:
    """Header-only parse: (width, height, bit_depth, color_type) from
    IHDR — the metadata-extraction fast path (no IDAT decompression)."""
    for ctype, data in _iter_chunks(payload):
        if ctype == b"IHDR":
            w, h, depth, color_type = struct.unpack(">IIBB", data[:10])
            return w, h, depth, color_type
    raise ValueError("no IHDR chunk")


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def decode_png(payload: bytes) -> np.ndarray:
    """Decode a PNG into an (h, w, channels) uint8 array. Supports the
    module's documented subset; raises ValueError outside it."""
    ihdr = None
    idat = bytearray()
    for ctype, data in _iter_chunks(payload):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.extend(data)
    if ihdr is None:
        raise ValueError("no IHDR chunk")
    w, h, depth, color_type, compression, filter_method, interlace = ihdr
    if depth != 8:
        raise ValueError(f"unsupported bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise ValueError(
            f"unsupported color type {color_type} (only 0/2/6)"
        )
    if compression != 0 or filter_method != 0:
        raise ValueError("nonstandard compression/filter method")
    if interlace != 0:
        raise ValueError("interlaced PNGs unsupported")
    ch = _CHANNELS[color_type]
    stride = w * ch
    raw = zlib.decompress(bytes(idat))
    if len(raw) != h * (stride + 1):
        raise ValueError(
            f"IDAT size {len(raw)} != expected {h * (stride + 1)}"
        )
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters = rows[:, 0]
    data = rows[:, 1:].astype(np.int32)  # headroom for the recurrences
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        f = int(filters[y])
        line = data[y]
        prev = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if f == 0:  # None
            rec = line
        elif f == 1:  # Sub: recon[i] = raw[i] + recon[i-ch]
            # per-channel prefix sum mod 256, vectorized
            rec = (
                np.cumsum(line.reshape(w, ch), axis=0, dtype=np.int64) % 256
            ).reshape(stride)
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = rec[i - ch] if i >= ch else 0
                rec[i] = (line[i] + (left + prev[i]) // 2) % 256
        elif f == 4:  # Paeth
            rec = np.empty(stride, dtype=np.int32)
            for i in range(stride):
                left = int(rec[i - ch]) if i >= ch else 0
                ul = int(prev[i - ch]) if i >= ch else 0
                rec[i] = (line[i] + _paeth(left, int(prev[i]), ul)) % 256
        else:
            raise ValueError(f"bad filter type {f} on row {y}")
        out[y] = rec.astype(np.uint8)
    return out.reshape(h, w, ch)


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (the deterministic kernel — no float
    resampling, so every engine computes identical bytes): output pixel
    (x, y) samples input (x*in_w // out_w, y*in_h // out_h)."""
    in_h, in_w = pixels.shape[:2]
    ys = (np.arange(out_h) * in_h) // out_h
    xs = (np.arange(out_w) * in_w) // out_w
    return pixels[ys][:, xs]
