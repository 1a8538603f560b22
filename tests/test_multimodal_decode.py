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
