"""Vendored PNG codec: spec-conformance against an independent
per-pixel reference, plus the decode-path operators' Spark contract.

The round-trip tests pin the encoder; the all-filters test builds raw
FILTERED scanlines directly (the encoder only emits filter 0) and
checks the vectorized unfilterers against a straight-from-the-spec
per-pixel recurrence, for every supported color type."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from public_projet_data_engineering_tarification_electrique_spark.operators.pngcodec import (
    PNG_SIGNATURE,
    _chunk,
    decode_png,
    encode_png,
    png_meta,
    resize_nearest,
)


def _rng():
    return np.random.RandomState(7)


def test_roundtrip_shapes():
    rng = _rng()
    for shape in [(5, 7), (8, 8, 3), (3, 4, 4), (1, 1), (16, 2, 3)]:
        a = rng.randint(0, 256, size=shape).astype(np.uint8)
        b = encode_png(a)
        d = decode_png(b)
        exp = a[:, :, None] if a.ndim == 2 else a
        assert (d == exp).all(), shape
        w, h, depth, _ct = png_meta(b)
        assert (w, h, depth) == (shape[1], shape[0], 8)


def _ref_decode(filters, filt_rows, w, ch):
    """Independent reference: the PNG spec's per-pixel recurrences,
    written as plain loops (no sharing with the vectorized decoder)."""
    h = len(filt_rows)
    stride = w * ch
    out = [[0] * stride for _ in range(h)]

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if pa <= pb and pa <= pc else (b if pb <= pc else c)

    for y in range(h):
        for i in range(stride):
            x = filt_rows[y][i]
            left = out[y][i - ch] if i >= ch else 0
            up = out[y - 1][i] if y else 0
            ul = out[y - 1][i - ch] if (y and i >= ch) else 0
            f = filters[y]
            if f == 0:
                r = x
            elif f == 1:
                r = x + left
            elif f == 2:
                r = x + up
            elif f == 3:
                r = x + (left + up) // 2
            else:
                r = x + paeth(left, up, ul)
            out[y][i] = r % 256
    return np.array(out, dtype=np.uint8)


def test_all_five_filters_all_color_types():
    rng = _rng()
    for ch, ct in [(1, 0), (3, 2), (4, 6)]:
        w, h = 6, 9
        stride = w * ch
        filters = [0, 1, 2, 3, 4, 1, 4, 3, 2][:h]
        filt = [list(rng.randint(0, 256, stride)) for _ in range(h)]
        raw = b"".join(
            bytes([filters[y]]) + bytes(filt[y]) for y in range(h)
        )
        ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
        png = (
            PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(raw))
            + _chunk(b"IEND", b"")
        )
        got = decode_png(png)
        expect = _ref_decode(filters, filt, w, ch).reshape(h, w, ch)
        assert (got == expect).all(), (ch, ct)


def test_corrupt_inputs_raise():
    a = _rng().randint(0, 256, size=(4, 4)).astype(np.uint8)
    good = encode_png(a)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x00" * 20)
    # flip one IDAT byte -> CRC must catch it
    bad = bytearray(good)
    bad[40] ^= 0xFF
    with pytest.raises(ValueError):
        decode_png(bytes(bad))


def test_resize_nearest_law():
    a = _rng().randint(0, 256, size=(10, 14, 3)).astype(np.uint8)
    r = resize_nearest(a, 7, 5)
    assert r.shape == (5, 7, 3)
    for y in range(5):
        for x in range(7):
            assert (r[y, x] == a[(y * 10) // 5, (x * 14) // 7]).all()


def test_decode_image_falls_back_to_pngcodec():
    from public_projet_data_engineering_tarification_electrique_spark.operators.multimodal import (
        decode_image,
    )

    a = _rng().randint(0, 256, size=(6, 5)).astype(np.uint8)
    img = np.asarray(decode_image(encode_png(a)))
    assert img.reshape(6, 5).tolist() == a.tolist()
    try:
        import PIL  # noqa: F401

        have_pil = True
    except ImportError:
        have_pil = False
    if have_pil:
        # Pillow sniffs the payload itself; a truncated fake GIF is an
        # unidentifiable image (UnidentifiedImageError is an OSError)
        with pytest.raises(OSError):
            decode_image(b"GIF89a notapng")
    else:
        # Pillow absent: the vendored codec only speaks PNG and must
        # refuse loudly, with exactly NotImplementedError
        with pytest.raises(NotImplementedError, match="not a PNG"):
            decode_image(b"GIF89a notapng")


def test_synth_decode_spark_round_trip(spark):
    """End-to-end on Spark: synth corpus -> decode stats must match the
    closed-form law for a handful of ids (the oracle does this at scale;
    this pins it in-process)."""
    from public_projet_data_engineering_tarification_electrique_spark.operators.multimodal import (
        decode_image_stats,
        synth_png_corpus,
    )

    docs = spark.createDataFrame(
        [(i,) for i in (0, 7, 13, 145, 499)], "doc_id long"
    )
    rows = {
        r["doc_id"]: r
        for r in decode_image_stats(synth_png_corpus(docs)).collect()
    }
    for d in (0, 7, 13, 145, 499):
        w, h = 4 + d % 13, 4 + (d // 13) % 11
        exp = sum((3 * x + 7 * y + d) % 256 for x in range(w) for y in range(h))
        r = rows[d]
        assert (r["width"], r["height"]) == (w, h)
        assert r["pixel_sum"] == exp
        rw, rh = max(1, w // 2), max(1, h // 2)
        exp_rs = sum(
            (3 * ((x * w) // rw) + 7 * ((y * h) // rh) + d) % 256
            for x in range(rw)
            for y in range(rh)
        )
        assert (r["rs_width"], r["rs_height"]) == (rw, rh)
        assert r["pixel_sum_resized"] == exp_rs
