"""Stdlib media codecs (opensanctions_spark.codecs): real container
round-trips through the register_codec seam."""

from __future__ import annotations

import pytest

from opensanctions_spark.codecs import (
    decode_ppm,
    decode_wav,
    encode_ppm,
    encode_wav,
    ppm_info,
    wav_info,
)


def test_wav_round_trip():
    pcm = bytes(range(256)) * 3
    wav = encode_wav(pcm, sample_rate=8000)
    assert wav.startswith(b"RIFF") and b"WAVE" in wav[:16]
    assert decode_wav(wav) == pcm
    assert wav_info(wav) == (1, 1, 8000, len(pcm))


def test_wav_16bit_stereo():
    pcm = b"\x01\x02\x03\x04" * 50  # 50 stereo 16-bit frames
    wav = encode_wav(pcm, sample_rate=44100, sampwidth=2, channels=2)
    assert decode_wav(wav) == pcm
    assert wav_info(wav) == (2, 2, 44100, 50)


def test_ppm_round_trip():
    pixels = bytes(range(4 * 3 * 3)) # 4x3 RGB
    ppm = encode_ppm(pixels, 4, 3)
    assert ppm.startswith(b"P6\n4 3\n255\n")
    assert decode_ppm(ppm) == pixels
    assert ppm_info(ppm) == (4, 3)


def test_ppm_comments_and_errors():
    pixels = b"\x00" * 3
    ppm = b"P6\n# a comment\n1 1\n255\n" + pixels
    assert decode_ppm(ppm) == pixels
    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"P3\n1 1\n255\n...")
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(b"P6\n2 2\n255\n\x00\x00")
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_ppm(b"\x00", 2, 2)


def test_register_codec_end_to_end(spark):
    """A real codec registered through the seam decodes inside the
    Arrow stage; metadata passthrough (keep=) rides the same batch."""
    from opensanctions_spark.multimodal import decode_media

    rows = [(1, "wav", "pcm_u8", encode_wav(b"hello"), None, None, 8000, 5),
            (2, "wav", "pcm_u8", encode_wav(b"world!"), None, None, 8000, 6)]
    media = spark.createDataFrame(
        rows,
        "media_id LONG, kind STRING, fmt STRING, content BINARY, "
        "width INT, height INT, sample_rate INT, n_frames INT",
    )
    out = {
        r["media_id"]: r
        for r in decode_media(
            media, codecs={"wav": decode_wav}, keep=("sample_rate",)
        ).collect()
    }
    assert bytes(out[1]["buf"]) == b"hello"
    assert bytes(out[2]["buf"]) == b"world!"
    assert out[1]["sample_rate"] == 8000


def test_unregistered_kind_raises(spark):
    from py4j.protocol import Py4JJavaError

    from opensanctions_spark.multimodal import decode_media

    media = spark.createDataFrame(
        [(1, "h264", "mp4", b"\x00", None, None, None, 1)],
        "media_id LONG, kind STRING, fmt STRING, content BINARY, "
        "width INT, height INT, sample_rate INT, n_frames INT",
    )
    with pytest.raises(Exception, match="no codec registered"):
        decode_media(media).collect()


def test_bmp_round_trip():
    """BMP (24-bit BI_RGB): encode writes bottom-up padded BGR, decode
    recovers the exact top-down RGB buffer — including widths whose rows
    need 4-byte padding (w=3 → 9-byte rows, 3 pad bytes)."""
    import os

    from opensanctions_spark.codecs import bmp_info, decode_bmp, encode_bmp

    for w, h in [(4, 3), (1, 1), (3, 7), (5, 2)]:
        px = os.urandom(w * h * 3)
        b = encode_bmp(px, w, h)
        assert b[:2] == b"BM"
        assert bmp_info(b) == (w, h)
        assert decode_bmp(b) == px


def test_bmp_layout_and_errors():
    import struct

    import pytest

    from opensanctions_spark.codecs import decode_bmp, encode_bmp

    # one red pixel top-left on a 2x1 image: stored as BGR in the file
    px = bytes([255, 0, 0, 0, 0, 255])  # red, blue (RGB)
    b = encode_bmp(px, 2, 1)
    offset = struct.unpack_from("<I", b, 10)[0]
    assert offset == 54
    assert b[offset:offset + 6] == bytes([0, 0, 255, 255, 0, 0])  # BGR
    assert len(b) == 54 + 8  # 6-byte row padded to 8

    with pytest.raises(ValueError, match="not a BMP"):
        decode_bmp(b"nope")
    with pytest.raises(ValueError, match="unsupported BMP"):
        # flip bpp to 8
        broken = bytearray(b)
        struct.pack_into("<H", broken, 28, 8)
        decode_bmp(bytes(broken))
    with pytest.raises(ValueError, match="top-down"):
        negative = bytearray(b)
        struct.pack_into("<i", negative, 22, -1)
        decode_bmp(bytes(negative))
    with pytest.raises(ValueError, match="pixel buffer"):
        encode_bmp(b"123", 2, 2)
