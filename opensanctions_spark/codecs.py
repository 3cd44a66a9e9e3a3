"""Real (stdlib) media codecs for the ``register_codec`` seam.

The ``multimodal`` module's decode stage is codec-agnostic: decoders are
injected per media ``kind`` (``register_codec``) and run inside the
Arrow-batched ``mapInPandas`` stage. A production cluster registers
PIL/soundfile/pyav there; this module provides REAL container codecs
built only on the standard library — WAV (RIFF, via ``wave``) and binary
PPM (P6, parsed by hand) — proving the seam's contract end-to-end:
encode a genuine container format, ship it as an opaque binary column,
decode it back executor-side, feature-extract the decoded buffer.

All functions are module-level and argument-pure so they pickle into
executor closures.
"""

from __future__ import annotations

import io
import wave

# --------------------------------------------------------------------------
# WAV (RIFF) — stdlib ``wave``


def encode_wav(
    pcm: bytes,
    sample_rate: int = 8000,
    sampwidth: int = 1,
    channels: int = 1,
) -> bytes:
    """PCM buffer → a complete RIFF/WAVE file (header + data chunk)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(sample_rate)
        w.writeframes(pcm)
    return buf.getvalue()


def decode_wav(content: bytes, fmt: str = "pcm") -> bytes:
    """RIFF/WAVE file → raw PCM frame bytes (the decoded buffer). The
    ``register_codec`` signature: (content, fmt) -> bytes."""
    with wave.open(io.BytesIO(content), "rb") as w:
        return w.readframes(w.getnframes())


def wav_info(content: bytes) -> tuple[int, int, int, int]:
    """(channels, sampwidth, sample_rate, n_frames) from the header —
    the typed-metadata extraction half of ingestion."""
    with wave.open(io.BytesIO(content), "rb") as w:
        return (w.getnchannels(), w.getsampwidth(), w.getframerate(),
                w.getnframes())


# --------------------------------------------------------------------------
# PPM (P6 binary) — parsed by hand


def encode_ppm(pixels: bytes, width: int, height: int) -> bytes:
    """RGB pixel buffer (3 bytes/pixel, row-major) → binary PPM (P6)."""
    if len(pixels) != width * height * 3:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * 3}"
        )
    return b"P6\n%d %d\n255\n" % (width, height) + pixels


def decode_ppm(content: bytes, fmt: str = "rgb") -> bytes:
    """Binary PPM (P6) → raw RGB pixel bytes. Parses the three
    whitespace-separated header tokens (magic, dimensions, maxval),
    tolerating ``#`` comment lines like the spec allows."""
    if not content.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        # skip whitespace and comments
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval, then raster
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM not supported by this decoder")
    n = width * height * 3
    pixels = content[pos : pos + n]
    if len(pixels) != n:
        raise ValueError(f"raster truncated: {len(pixels)} of {n} bytes")
    return pixels


def ppm_info(content: bytes) -> tuple[int, int]:
    """(width, height) from the P6 header."""
    if not content.startswith(b"P6"):
        raise ValueError("not a binary PPM (P6) payload")
    pos, tokens = 2, []
    while len(tokens) < 2:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(content[start:pos]))
    return tokens[0], tokens[1]


# --------------------------------------------------------------------------
# BMP (Windows DIB, 24-bit uncompressed BI_RGB) — parsed by hand


def encode_bmp(pixels: bytes, width: int, height: int) -> bytes:
    """RGB pixel buffer (3 bytes/pixel, row-major top-down) → BMP file
    bytes: 14-byte file header + 40-byte BITMAPINFOHEADER, raster stored
    bottom-up in BGR with rows padded to 4 bytes (the format's rules)."""
    import struct

    if len(pixels) != width * height * 3:
        raise ValueError(
            f"pixel buffer is {len(pixels)} bytes, want {width * height * 3}"
        )
    row = width * 3
    pad = (-row) % 4
    image_size = (row + pad) * height
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + image_size, 0, 0, 14 + 40
    ) + struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, image_size,
        2835, 2835, 0, 0,
    )
    rows = []
    for y in range(height - 1, -1, -1):  # bottom-up
        line = pixels[y * row : (y + 1) * row]
        # RGB → BGR per pixel
        bgr = bytearray(line)
        bgr[0::3], bgr[2::3] = line[2::3], line[0::3]
        rows.append(bytes(bgr) + b"\x00" * pad)
    return header + b"".join(rows)


def decode_bmp(content: bytes, fmt: str = "rgb") -> bytes:
    """BMP file bytes → raw RGB pixels (row-major top-down). Supports
    the encoder's profile: BITMAPINFOHEADER, 24-bit, BI_RGB, bottom-up
    (positive height) — anything else raises rather than mis-decoding."""
    import struct

    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    offset = struct.unpack_from("<I", content, 10)[0]
    hdr_size, width, height, _planes, bpp, compression = struct.unpack_from(
        "<IiiHHI", content, 14
    )
    if hdr_size < 40 or bpp != 24 or compression != 0:
        raise ValueError(
            f"unsupported BMP (header {hdr_size}, {bpp}bpp, "
            f"compression {compression}): this decoder reads 24-bit BI_RGB"
        )
    if height <= 0:
        raise ValueError("top-down BMP (negative height) not supported")
    row = width * 3
    pad = (-row) % 4
    out = bytearray(row * height)
    for y in range(height):
        src = offset + (height - 1 - y) * (row + pad)
        line = content[src : src + row]
        if len(line) != row:
            raise ValueError("raster truncated")
        rgb = bytearray(line)
        rgb[0::3], rgb[2::3] = line[2::3], line[0::3]
        out[y * row : (y + 1) * row] = rgb
    return bytes(out)


def bmp_info(content: bytes) -> tuple[int, int]:
    """(width, height) from the BITMAPINFOHEADER."""
    import struct

    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    _hdr, width, height = struct.unpack_from("<Iii", content, 14)
    return width, abs(height)
