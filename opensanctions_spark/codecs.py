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
