"""Native WAV/PCM audio decode: golden fixtures generated with the stdlib
`wave` module (an independent RIFF writer), round-tripped through
decode_audio and the decode_audio_meta mapInPandas operator."""

from __future__ import annotations

import io
import math
import struct
import wave

import numpy as np
import pytest

from advanced_elb_logs_etl_spark.operators import multimodal


def _wav_bytes(rate: int, channels: int, sampwidth: int, frames: np.ndarray) -> bytes:
    """frames: (n, channels) int array in the target width's range."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        if sampwidth == 1:
            data = (frames.astype(np.int16) + 128).astype(np.uint8).tobytes()
        elif sampwidth == 2:
            data = frames.astype("<i2").tobytes()
        else:
            data = frames.astype("<i4").tobytes()
        w.writeframes(data)
    return buf.getvalue()


def test_decode_wav_16bit_stereo_roundtrip():
    t = np.arange(480)
    left = (10000 * np.sin(2 * math.pi * 440 * t / 48000)).astype(np.int64)
    right = (5000 * np.cos(2 * math.pi * 220 * t / 48000)).astype(np.int64)
    frames = np.stack([left, right], axis=1)
    a = multimodal.decode_audio(_wav_bytes(48000, 2, 2, frames))
    assert (a["n_channels"], a["sample_rate"], a["bit_depth"]) == (2, 48000, 16)
    assert a["n_frames"] == 480
    assert math.isclose(a["duration_s"], 0.01)
    np.testing.assert_allclose(a["samples"] * 32768.0, frames, atol=0)


@pytest.mark.parametrize("width,bits", [(1, 8), (2, 16), (4, 32)])
def test_decode_wav_bit_depths(width, bits):
    frames = np.array([[0], [1], [-2], [100], [-100]], dtype=np.int64)
    if width == 4:
        frames = frames * 1_000_000
    a = multimodal.decode_audio(_wav_bytes(8000, 1, width, frames))
    assert a["bit_depth"] == bits and a["n_frames"] == 5
    scale = {8: 128.0, 16: 32768.0, 32: 2147483648.0}[bits]
    np.testing.assert_allclose(a["samples"][:, 0] * scale, frames[:, 0], atol=0)


def test_decode_wav_rejections():
    with pytest.raises(multimodal.AudioDecodeError):
        multimodal.decode_audio(b"ID3\x03" + b"\x00" * 64)  # mp3
    with pytest.raises(multimodal.AudioDecodeError):
        multimodal.decode_audio(b"RIFF" + b"\x00" * 64)  # RIFF but not WAVE
    # float WAV (format tag 3) rejected with a typed error
    payload = bytearray(_wav_bytes(8000, 1, 2, np.zeros((4, 1), dtype=np.int64)))
    fmt_at = payload.find(b"fmt ") + 8
    struct.pack_into("<H", payload, fmt_at, 3)
    with pytest.raises(multimodal.AudioDecodeError, match="format tag 3"):
        multimodal.decode_audio(bytes(payload))


def test_decode_wav_truncated_data_chunk_is_typed_error():
    # a data chunk whose length is not a multiple of the sample width must
    # raise the TYPED error (not np.frombuffer's plain ValueError), so the
    # one-bad-row contract holds through decode_audio_meta
    good = _wav_bytes(8000, 1, 2, np.array([[1], [2], [3]], dtype=np.int64))
    at = good.find(b"data")
    size = struct.unpack_from("<I", good, at + 4)[0]
    truncated = bytearray(good[:-1])  # drop one byte of sample data
    struct.pack_into("<I", truncated, at + 4, size - 1)
    with pytest.raises(multimodal.AudioDecodeError, match="multiple"):
        multimodal.decode_audio(bytes(truncated))


def test_decode_audio_meta_survives_truncated_payload(spark):
    good = _wav_bytes(8000, 1, 2, np.array([[1], [2], [3]], dtype=np.int64))
    at = good.find(b"data")
    size = struct.unpack_from("<I", good, at + 4)[0]
    truncated = bytearray(good[:-1])
    struct.pack_into("<I", truncated, at + 4, size - 1)
    df = spark.createDataFrame(
        [(1, good), (2, bytes(truncated))], "asset_id long, payload binary"
    )
    rows = {r.asset_id: r for r in multimodal.decode_audio_meta(df).collect()}
    assert rows[1].decode_error is None and rows[1].n_frames == 3
    assert rows[2].decode_error and "multiple" in rows[2].decode_error


def test_decode_audio_meta_operator(spark):
    rows = [
        (1, _wav_bytes(16000, 1, 2, (np.ones((160, 1)) * 16384).astype(np.int64))),
        (2, _wav_bytes(8000, 2, 1, np.zeros((80, 2), dtype=np.int64))),
        (3, b"not audio at all"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "asset_id long, payload binary")
    got = {r.asset_id: r for r in multimodal.decode_audio_meta(df).collect()}
    assert got[1].sample_rate == 16000 and got[1].n_frames == 160
    assert math.isclose(got[1].rms, 0.5) and math.isclose(got[1].peak, 0.5)
    assert got[2].n_channels == 2 and got[2].bit_depth == 8 and got[2].rms == 0.0
    assert got[3].sample_rate is None and "RIFF" in got[3].decode_error
    assert got[4].decode_error == "null payload"
