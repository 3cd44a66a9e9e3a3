"""Multimodal columns: image/audio/video as opaque binary + typed metadata.

A large-scale training-data pipeline carries media as ``binary`` columns
with a typed metadata struct; decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas iterators (``mapInPandas``) so
each task processes columnar batches, never Python-per-row.

The actual codec step is STUBBED: the image/audio libraries are not in
this container, so ``decode_media`` raises ``NotImplementedError`` unless
given the deterministic fake codec (kind='raw'), which treats the payload
bytes as the decoded buffer. Everything around the codec — schemas, batch
iteration, partitioning, output shapes — is real and oracle-tested
(catalog mm_* queries).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MEDIA_SCHEMA = (
    "media_id BIGINT, kind STRING, fmt STRING, content BINARY, "
    "width INT, height INT, sample_rate INT, n_frames INT"
)

FEATURE_SCHEMA = "media_id BIGINT, n_bytes BIGINT, n_distinct BIGINT, modal_byte INT"
FRAME_SCHEMA = "media_id BIGINT, frame_idx INT, frame_md5 STRING"
DECODED_SCHEMA = "media_id BIGINT, buf BINARY"


def pack_media(df: DataFrame, id_col: str, payload_col: str, kind: str = "raw",
               fmt: str = "raw", frame_bytes: int = 16) -> DataFrame:
    """Wrap a payload column into the typed media shape. With kind='raw'
    the payload bytes double as the decoded buffer (the deterministic
    fake codec); real ingestion would carry JPEG/FLAC/H264 bytes here."""
    content = F.col(payload_col).cast("binary")
    n = F.octet_length(content)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.lit(fmt).alias("fmt"),
        content.alias("content"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("int").alias("sample_rate"),
        F.ceil(n / F.lit(frame_bytes)).cast("int").alias("n_frames"),
    )


#: kind → decoder(content: bytes, fmt: str) -> bytes. 'raw' (identity) is
#: the deterministic fake codec; a real cluster registers PIL/soundfile/
#: pyav decoders here (``register_codec``) without touching any plan —
#: the same injection seam as ``sources/pdf.py``'s ``ocr_pages``.
_CODECS: dict[str, "object"] = {"raw": lambda content, fmt: content}


def register_codec(kind: str, decode_fn) -> None:
    """Register a media decoder for ``decode_media``: ``decode_fn(content
    bytes, fmt str) -> decoded bytes``. Must be picklable — it ships to
    executors inside the Arrow stage closure (e.g. a module-level
    function wrapping ``PIL.Image.open``/``soundfile.read``/``av.open``).
    """
    _CODECS[kind] = decode_fn


def decode_media(
    media: DataFrame, codecs: dict | None = None, keep: tuple = ()
) -> DataFrame:
    """Codec boundary: decode content → raw buffer, Arrow-batched.

    The decoder per ``kind`` comes from the registry (``register_codec``;
    per-call override via ``codecs``). kind='raw' is the pre-registered
    deterministic fake (identity); ``opensanctions_spark.codecs`` ships
    REAL stdlib container codecs (WAV via ``wave``, binary PPM by hand)
    that prove the seam end-to-end without any media library. Heavier
    codecs (PIL / soundfile / pyav) are not installed in this container —
    an unregistered kind raises inside the task, naming the injection
    point, which is the clearly-marked stub required here.

    ``keep`` names metadata columns to carry through alongside the
    decoded buffer (real pipelines keep sample_rate/width/... next to
    the pixels) — passthrough inside the same Arrow batch, no join.
    """
    table = dict(_CODECS)
    if codecs:
        table.update(codecs)
    kept = [f for f in media.schema.fields if f.name in set(keep)]
    out_schema = DECODED_SCHEMA + "".join(
        f", {f.name} {f.dataType.simpleString()}" for f in kept
    )
    kept_names = [f.name for f in kept]

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            bad = pdf.loc[~pdf["kind"].isin(list(table)), "kind"]
            if len(bad):
                raise NotImplementedError(
                    f"no codec registered for kind={bad.iloc[0]!r}: media "
                    "libraries are not available in this environment — "
                    "wire one with register_codec(kind, fn)"
                )
            out = {
                "media_id": pdf["media_id"],
                "buf": [
                    table[k](bytes(c), f)
                    for k, c, f in zip(
                        pdf["kind"], pdf["content"], pdf["fmt"]
                    )
                ],
            }
            for name in kept_names:
                out[name] = pdf[name]
            yield pd.DataFrame(out)

    return media.mapInPandas(run, schema=out_schema)


def extract_byte_features(media: DataFrame) -> DataFrame:
    """Per-media byte statistics (size, distinct bytes, modal byte with
    smallest-value tie-break) — a real feature extractor over the binary
    payload, vectorized with numpy inside Arrow batches."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            bufs = [bytes(b) for b in pdf["content"]]
            lens = np.fromiter((len(b) for b in bufs), dtype=np.int64, count=len(bufs))
            # one flat bincount for the WHOLE batch: byte values offset by
            # 256*row index → a (rows, 256) histogram in a single C pass,
            # no Python loop over rows
            flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            rows = np.repeat(np.arange(len(bufs), dtype=np.int64), lens)
            hist = np.bincount(
                rows * 256 + flat, minlength=len(bufs) * 256
            ).reshape(len(bufs), 256)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(),
                    "n_bytes": lens,
                    "n_distinct": (hist > 0).sum(axis=1),
                    "modal_byte": hist.argmax(axis=1),  # argmax → smallest on ties
                }
            )

    # prune to the two consumed columns before the Arrow exchange — the
    # media metadata never crosses into Python
    return media.select("media_id", "content").mapInPandas(run, schema=FEATURE_SCHEMA)


def sample_frames(media: DataFrame, every: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Frame sampling: slice the decoded buffer into fixed-size frames and
    keep every k-th (the video keyframe-sampling shape). Emits one row per
    kept frame with a content digest."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            rows = []
            for mid, buf, n_frames in zip(
                pdf["media_id"], pdf["content"], pdf["n_frames"]
            ):
                for idx in range(0, int(n_frames), every):
                    chunk = bytes(buf)[idx * frame_bytes:(idx + 1) * frame_bytes]
                    rows.append((mid, idx, hashlib.md5(chunk).hexdigest()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_md5"])

    return media.mapInPandas(run, schema=FRAME_SCHEMA)


def resize_buffer(decoded: DataFrame, target_bytes: int) -> DataFrame:
    """Deterministic fake of the resize step: truncate/zero-pad the decoded
    buffer to a fixed size (a real implementation would interpolate pixel
    grids; the plumbing — fixed-size binary out, Arrow batches — is what
    downstream featurizers depend on)."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            bufs = [
                bytes(b)[:target_bytes].ljust(target_bytes, b"\x00")
                for b in pdf["buf"]
            ]
            yield pd.DataFrame({"media_id": pdf["media_id"], "buf": bufs})

    return decoded.mapInPandas(run, schema=DECODED_SCHEMA)


def audio_frame_energy(media: DataFrame, frame_samples: int = 160,
                       threshold: int = 900) -> DataFrame:
    """Per-frame audio energy over 8-bit PCM payloads — the
    voice-activity-detection plumbing (frame → energy → voiced flag) a
    speech-data pipeline runs before transcription. kind='raw' treats the
    payload bytes as unsigned 8-bit samples centered at 128; a real
    ingestion decodes FLAC/WAV first (``decode_media``'s declared codec
    boundary).

    Vectorized like ``extract_byte_features``: ONE flat numpy pass per
    Arrow batch (global frame ids via cumulative offsets + two
    bincounts), no Python loop over rows or frames. Energies are integer
    sums of squared deviations (≤ frame_samples·127² ≪ 2⁵³, so the
    float bincount accumulator is exact) — cross-engine exact.

    Emits (media_id, frame_idx, n_samples, energy, voiced) where voiced
    is the frame's energy exceeding ``threshold`` per sample."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in batches:
            bufs = [bytes(b) for b in pdf["content"]]
            lens = np.fromiter((len(b) for b in bufs), dtype=np.int64,
                               count=len(bufs))
            if lens.sum() == 0:
                continue
            flat = np.frombuffer(b"".join(bufs), dtype=np.uint8)
            starts = np.cumsum(lens) - lens
            pos = np.arange(lens.sum(), dtype=np.int64) - np.repeat(starts, lens)
            frame = pos // frame_samples
            n_frames = -(-lens // frame_samples)  # ceil
            frame_off = np.cumsum(n_frames) - n_frames
            gid = np.repeat(frame_off, lens) + frame
            total = int(n_frames.sum())
            sq = (flat.astype(np.int64) - 128) ** 2
            energy = np.bincount(gid, weights=sq, minlength=total).astype(np.int64)
            count = np.bincount(gid, minlength=total).astype(np.int64)
            yield pd.DataFrame(
                {
                    "media_id": np.repeat(pdf["media_id"].to_numpy(), n_frames),
                    "frame_idx": (
                        np.arange(total, dtype=np.int64)
                        - np.repeat(frame_off, n_frames)
                    ).astype(np.int32),
                    "n_samples": count,
                    "energy": energy,
                    "voiced": energy > threshold * count,
                }
            )

    return media.select("media_id", "content").mapInPandas(
        run,
        "media_id LONG, frame_idx INT, n_samples LONG, energy LONG, "
        "voiced BOOLEAN",
    )
