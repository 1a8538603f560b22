"""Native AVI demux: golden fixtures built by an independent hand-rolled
RIFF writer, round-tripped through demux_avi and the demux_avi_frames
mapInPandas operator (frame pixels verified against the BMP decoder)."""

from __future__ import annotations

import hashlib
import struct

import numpy as np
import pytest

from advanced_elb_logs_etl_spark.operators import multimodal


def _chunk(cid: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return cid + struct.pack("<I", len(body)) + body + pad


def _list(ltype: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", ltype + body)


def _avi_bytes(frames: list[np.ndarray], us_per_frame: int = 40000) -> bytes:
    """frames: list of (h, w, 3) uint8 RGB arrays (equal shapes)."""
    h, w, _ = frames[0].shape
    stride = (w * 3 + 3) & ~3
    dibs = []
    for f in frames:
        bgr = f[:, :, ::-1]                      # RGB -> BGR
        rows = []
        for r in bgr[::-1]:                      # bottom-up row order
            row = r.tobytes()
            rows.append(row + b"\x00" * (stride - len(row)))
        dibs.append(b"".join(rows))
    avih = struct.pack(
        "<IIIIIIIIII4I",
        us_per_frame, 0, 0, 0, len(frames), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack("<4s4sIHHIIIIIIII4H", b"vids", b"DIB ", 0, 0, 0, 0,
                       1, 25, 0, len(frames), 0, 0, 0, 0, 0, 0, 0)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00db", d) for d in dibs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _rgb(w, h, seed):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 255, size=(h, w, 3)).astype(np.uint8)


def test_demux_avi_roundtrip():
    frames = [_rgb(6, 4, i) for i in range(3)]
    v = multimodal.demux_avi(_avi_bytes(frames, us_per_frame=33333))
    assert (v["width"], v["height"], v["n_frames"]) == (6, 4, 3)
    assert v["us_per_frame"] == 33333
    # each demuxed frame decodes through the BMP path to the original RGB
    for raw, want in zip(v["frames"], frames):
        img = multimodal.decode_bmp(multimodal.avi_frame_to_bmp(raw, 6, 4))
        got = np.frombuffer(img["pixels"], dtype=np.uint8).reshape(4, 6, 3)
        np.testing.assert_array_equal(got, want)


def test_demux_avi_rejections():
    with pytest.raises(multimodal.VideoDecodeError):
        multimodal.demux_avi(b"RIFF\x00\x00\x00\x00WAVE")  # wrong RIFF type
    # compressed stream: a '00dc' chunk
    good = bytearray(_avi_bytes([_rgb(4, 2, 0)]))
    comp = bytes(good).replace(b"00db", b"00dc")
    with pytest.raises(multimodal.VideoDecodeError, match="compressed"):
        multimodal.demux_avi(comp)
    # frame-count mismatch between avih and movi
    lying = bytearray(_avi_bytes([_rgb(4, 2, 0), _rgb(4, 2, 1)]))
    at = bytes(lying).find(b"avih") + 8 + 16  # total_frames field
    struct.pack_into("<I", lying, at, 9)
    with pytest.raises(multimodal.VideoDecodeError, match="declares"):
        multimodal.demux_avi(bytes(lying))


def test_demux_avi_deep_list_nesting_is_typed_not_recursion():
    # thousands of nested 12-byte LIST headers must not blow the Python
    # stack: the walk is iterative, so the payload just yields "no frames"
    depth = 5000
    inner = b""
    for _ in range(depth):
        inner = _list(b"JUNK", inner)
    payload = b"RIFF" + struct.pack("<I", len(inner) + 4) + b"AVI " + inner
    with pytest.raises(multimodal.VideoDecodeError):
        multimodal.demux_avi(payload)


def _avi_bytes_bpp(frames_bgrx: list[bytes], w: int, h: int, bpp: int) -> bytes:
    """AVI writer with an explicit strf bit depth (raw DIB rows supplied)."""
    stride = (w * (bpp // 8) + 3) & ~3
    avih = struct.pack(
        "<IIIIIIIIII4I",
        40000, 0, 0, 0, len(frames_bgrx), 0, 1, 0, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack("<4s4sIHHIIIIIIII4H", b"vids", b"DIB ", 0, 0, 0, 0,
                       1, 25, 0, len(frames_bgrx), 0, 0, 0, 0, 0, 0, 0)
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, stride * h, 0, 0, 0, 0)
    hdrl = _list(b"hdrl", _chunk(b"avih", avih)
                 + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)))
    movi = _list(b"movi", b"".join(_chunk(b"00db", d) for d in frames_bgrx))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_demux_avi_32bpp_strf_decodes_with_right_stride():
    # one 2x2 32-bpp frame: BGRX pixels, bottom-up rows, stride = 8 (no pad)
    want = _rgb(2, 2, 7)
    rows = []
    for r in want[::-1]:
        rows.append(b"".join(bytes([p[2], p[1], p[0], 0]) for p in r))
    dib = b"".join(rows)
    v = multimodal.demux_avi(_avi_bytes_bpp([dib], 2, 2, 32))
    assert v["bpp"] == 32
    img = multimodal.decode_bmp(multimodal.avi_frame_to_bmp(dib, 2, 2, v["bpp"]))
    got = np.frombuffer(img["pixels"], dtype=np.uint8).reshape(2, 2, 3)
    np.testing.assert_array_equal(got, want)


def test_demux_avi_unsupported_bpp_is_typed_error():
    with pytest.raises(multimodal.VideoDecodeError, match="bit depth"):
        multimodal.demux_avi(_avi_bytes_bpp([b"\x00" * 8], 2, 2, 16))


def test_demux_avi_frames_operator(spark):
    f_a = [_rgb(6, 4, i) for i in range(5)]
    f_b = [_rgb(3, 3, 10 + i) for i in range(2)]
    rows = [
        (1, _avi_bytes(f_a)),
        (2, _avi_bytes(f_b)),
        (3, b"not a video"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    out = multimodal.demux_avi_frames(df, every_n=2, max_frames=2).collect()
    by_asset: dict = {}
    for r in out:
        by_asset.setdefault(r.asset_id, []).append(r)
    # asset 1: frames 0 and 2 (every 2nd, capped at 2)
    assert [r.frame_index for r in by_asset[1]] == [0, 2]
    want_md5 = hashlib.md5(f_a[2].tobytes()).hexdigest()
    assert by_asset[1][1].pixel_md5 == want_md5
    assert all(r.width == 6 and r.height == 4 for r in by_asset[1])
    # asset 2: only frame 0 sampled at stride 2 of 2 frames
    assert [r.frame_index for r in by_asset[2]] == [0]
    assert by_asset[3][0].decode_error and "RIFF" in by_asset[3][0].decode_error
    assert by_asset[4][0].decode_error == "null payload"
