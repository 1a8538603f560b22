"""Real-bytes tests for the native BMP decode/encode kernels and the
mapInPandas decode/resize paths (operators/multimodal.py)."""

from __future__ import annotations

import hashlib
import struct

import pytest
from pyspark.sql import functions as F

from advanced_elb_logs_etl_spark.operators import multimodal
from advanced_elb_logs_etl_spark.operators.multimodal import (
    ImageDecodeError,
    decode_bmp,
    decode_image,
    encode_bmp,
)


def _gradient(width: int, height: int) -> bytes:
    """Deterministic RGB test pattern."""
    return bytes(
        v
        for r in range(height)
        for c in range(width)
        for v in ((r * 7 + c) % 256, (r + c * 13) % 256, (r * c) % 256)
    )


def test_bmp_roundtrip_exact():
    for w, h in [(5, 3), (4, 4), (1, 1), (7, 2)]:  # incl. non-4-multiple rows
        px = _gradient(w, h)
        img = decode_bmp(encode_bmp(w, h, px))
        assert (img["width"], img["height"], img["mode"]) == (w, h, "RGB")
        assert img["pixels"] == px


def test_bmp_32bpp_and_topdown():
    """decode_bmp handles 32-bpp pixels and negative-height (top-down) rows
    — build those variants by hand since encode_bmp emits 24-bpp."""
    w, h = 2, 2
    # BGRA pixels, top-down (height = -2): rows in natural order
    pix = bytes(
        [10, 20, 30, 0, 40, 50, 60, 0,      # row 0: (30,20,10) (60,50,40)
         70, 80, 90, 0, 100, 110, 120, 0])  # row 1: (90,80,70) (120,110,100)
    header = struct.pack("<2sIHHI", b"BM", 54 + len(pix), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, -h, 1, 32, 0, len(pix), 0, 0, 0, 0)
    img = decode_bmp(header + dib + pix)
    assert (img["width"], img["height"]) == (w, h)
    assert img["pixels"] == bytes([30, 20, 10, 60, 50, 40, 90, 80, 70, 120, 110, 100])


def test_bmp_malformed_raises():
    with pytest.raises(ImageDecodeError):
        decode_bmp(b"NOTABMP" * 20)
    good = encode_bmp(4, 4, _gradient(4, 4))
    with pytest.raises(ImageDecodeError, match="truncated"):
        decode_bmp(good[:-5])
    with pytest.raises(ImageDecodeError):
        decode_image(b"\x89PNG\r\n\x1a\n garbage")  # no PIL in container


def test_decode_image_meta_mixed_payloads(spark):
    """Real BMP payloads decode with exact dimensions + pixel hash; garbage
    payloads produce null metadata + an error string, never a crash."""
    px = _gradient(6, 4)
    rows = [
        (1, bytearray(encode_bmp(6, 4, px))),
        (2, bytearray(b"not an image at all")),
        (3, None),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = {r.asset_id: r for r in multimodal.decode_image_meta(df).collect()}
    assert (out[1].width, out[1].height, out[1].mode) == (6, 4, "RGB")
    assert out[1].pixel_md5 == hashlib.md5(px).hexdigest()
    assert out[1].decode_error is None
    assert out[2].width is None and out[2].decode_error
    assert out[3].decode_error == "null payload"


def test_resize_images_real_resample(spark):
    """Decodable payloads get a genuine nearest-neighbor resample: the
    resized payload is itself a valid BMP whose pixels match the NumPy
    index-sampling reference."""
    import numpy as np

    w, h = 8, 6
    px = _gradient(w, h)
    df = spark.createDataFrame(
        [(1, bytearray(encode_bmp(w, h, px))), (2, bytearray(b"garbage bytes"))],
        "asset_id long, payload binary",
    )
    out = {r.asset_id: r for r in multimodal.resize_images(df, 4, 3).collect()}
    resized = decode_bmp(bytes(out[1].resized_payload))
    assert (resized["width"], resized["height"]) == (4, 3)
    src = np.frombuffer(px, dtype=np.uint8).reshape(h, w, 3)
    expect = src[(np.arange(3) * h) // 3][:, (np.arange(4) * w) // 4]
    assert resized["pixels"] == expect.tobytes()
    # undecodable payload falls back to the deterministic fake
    assert bytes(out[2].resized_payload)[:16] == hashlib.md5(b"garbage bytes").digest()


def test_decode_ppm_roundtrip_and_comments():
    from advanced_elb_logs_etl_spark.operators.multimodal import decode_image, decode_ppm

    pixels = bytes(
        [10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120, 130, 140, 150, 160, 170, 180]
    )  # 3x2 RGB
    ppm = b"P6\n# a comment\n3 2\n255\n" + pixels
    out = decode_ppm(ppm)
    assert (out["width"], out["height"], out["mode"]) == (3, 2, "RGB")
    assert out["pixels"] == pixels
    # dispatch through decode_image
    assert decode_image(ppm)["pixels"] == pixels


def test_decode_ppm_rejects_bad_payloads():
    import pytest as _pytest

    from advanced_elb_logs_etl_spark.operators.multimodal import (
        ImageDecodeError,
        decode_ppm,
    )

    good = b"P6\n3 2\n255\n" + bytes(18)
    for bad in [
        b"P5\n3 2\n255\n" + bytes(18),          # wrong magic (PGM)
        b"P6\n3 2\n65535\n" + bytes(36),        # 16-bit maxval
        b"P6\n3 2\n255\n" + bytes(17),          # truncated raster
        b"P6\n3 x\n255\n" + bytes(18),          # malformed field
    ]:
        with _pytest.raises(ImageDecodeError):
            decode_ppm(bad)
    assert decode_ppm(good)["width"] == 3


# ---------------------------------------------------------------------------
# PNG: stdlib encoder used ONLY by these tests — applies each of the five
# scanline filters forward so decode_png's unfilter paths are all exercised.
# ---------------------------------------------------------------------------


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib as _z

    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + _z.crc32(ctype + data).to_bytes(4, "big")
    )


def _encode_png(width, height, pixels, colortype=2, filters=None, palette=None):
    """Minimal PNG writer for tests: 8-bit depth, no interlace, explicit
    per-row filter types (default all 0)."""
    import zlib as _z

    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}[colortype]
    stride = width * channels
    filters = filters or [0] * height
    raw = bytearray()
    prev = bytes(stride)
    for r in range(height):
        line = pixels[r * stride : (r + 1) * stride]
        f = filters[r]
        raw.append(f)
        for i in range(stride):
            a = line[i - channels] if i >= channels else 0
            b = prev[i]
            c = prev[i - channels] if i >= channels else 0
            if f == 0:
                enc = line[i]
            elif f == 1:
                enc = (line[i] - a) & 0xFF
            elif f == 2:
                enc = (line[i] - b) & 0xFF
            elif f == 3:
                enc = (line[i] - ((a + b) >> 1)) & 0xFF
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                enc = (line[i] - pred) & 0xFF
            raw.append(enc)
        prev = line
    ihdr = (
        width.to_bytes(4, "big") + height.to_bytes(4, "big")
        + bytes([8, colortype, 0, 0, 0])
    )
    out = multimodal._PNG_SIG + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette)
    out += _png_chunk(b"IDAT", _z.compress(bytes(raw)))
    out += _png_chunk(b"IEND", b"")
    return out


def test_png_rgb_all_filter_types():
    w, h = 6, 5
    px = _gradient(w, h)
    for filters in ([0] * h, [1] * h, [2] * h, [3] * h, [4] * h, [0, 1, 2, 3, 4]):
        img = multimodal.decode_png(_encode_png(w, h, px, filters=list(filters)))
        assert (img["width"], img["height"], img["mode"]) == (w, h, "RGB")
        assert img["pixels"] == px, f"filters={filters}"


def test_png_color_types_expand_to_rgb():
    w, h = 4, 3
    grey = bytes((r * 31 + c * 7) % 256 for r in range(h) for c in range(w))
    img = multimodal.decode_png(_encode_png(w, h, grey, colortype=0, filters=[4] * h))
    assert img["pixels"] == bytes(v for g in grey for v in (g, g, g))

    ga = bytes(v for g in grey for v in (g, 128))  # grey + alpha
    img = multimodal.decode_png(_encode_png(w, h, ga, colortype=4, filters=[2] * h))
    assert img["pixels"] == bytes(v for g in grey for v in (g, g, g))

    rgb = _gradient(w, h)
    rgba = bytes(
        v
        for i in range(w * h)
        for v in (rgb[3 * i], rgb[3 * i + 1], rgb[3 * i + 2], 200)
    )
    img = multimodal.decode_png(_encode_png(w, h, rgba, colortype=6, filters=[1] * h))
    assert img["pixels"] == rgb

    palette = bytes(range(48))  # 16 RGB entries
    idx = bytes((r + c) % 16 for r in range(h) for c in range(w))
    img = multimodal.decode_png(
        _encode_png(w, h, idx, colortype=3, palette=palette, filters=[3] * h)
    )
    expect = bytes(
        v for i in idx for v in (palette[3 * i], palette[3 * i + 1], palette[3 * i + 2])
    )
    assert img["pixels"] == expect


def test_png_rejections():
    w, h = 4, 3
    px = _gradient(w, h)
    good = _encode_png(w, h, px)
    with pytest.raises(ImageDecodeError, match="not a PNG"):
        multimodal.decode_png(b"X" + good)
    # 16-bit depth
    bad = bytearray(good)
    bad[8 + 4 + 4 + 8] = 16  # bitdepth byte inside IHDR
    with pytest.raises(ImageDecodeError, match="bit depth"):
        multimodal.decode_png(bytes(bad))
    # interlaced
    bad = bytearray(good)
    bad[8 + 4 + 4 + 12] = 1  # interlace byte
    with pytest.raises(ImageDecodeError, match="interlaced"):
        multimodal.decode_png(bytes(bad))
    # truncated IDAT payload: drop the IEND and half the IDAT chunk
    with pytest.raises(ImageDecodeError):
        idat_at = good.index(b"IDAT") - 4
        multimodal.decode_png(good[: idat_at + 10])
    # palette index out of range
    small_palette = bytes(range(6))  # 2 entries
    idx = bytes([0, 1, 1, 0, 0, 1, 5, 0, 1, 0, 1, 0])  # index 5 invalid
    with pytest.raises(ImageDecodeError, match="palette index"):
        multimodal.decode_png(
            _encode_png(4, 3, idx, colortype=3, palette=small_palette)
        )


def test_decode_image_routes_png():
    w, h = 3, 3
    px = _gradient(w, h)
    img = decode_image(_encode_png(w, h, px, filters=[4, 2, 1]))
    assert (img["width"], img["height"], img["pixels"]) == (w, h, px)
