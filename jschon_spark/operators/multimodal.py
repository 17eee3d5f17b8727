"""Multimodal columns: opaque binary payloads + typed metadata.

Images/audio/video travel as ``binary`` columns with a metadata struct
(media_type, width/height/duration, byte length, content hash). The
Spark-side plumbing — schemas, Arrow batch shapes, partition-friendly
UDF signatures — is real and tested; the codec step itself is STUBBED
(``decode_stub=True`` produces deterministic fake features, else
``NotImplementedError``) because no image/audio libraries exist in
this container. Swapping in a real decoder changes only the inner
function of ``media_features``.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sha256", T.StringType()),
    ]
)

FEATURE_SCHEMA = (
    "media_sha256 string, n_bytes long, media_type string, "
    "feature array<float>, decode_ok boolean"
)

N_FEATURES = 16


def with_media_meta(
    df: DataFrame, binary_col: str = "payload", media_type_col: str | None = None
) -> DataFrame:
    """Attach the metadata struct (pure Column algebra, no Python)."""
    mt = (
        F.col(media_type_col)
        if media_type_col
        else F.lit("application/octet-stream")
    )
    return df.withColumn(
        "media_meta",
        F.struct(
            mt.alias("media_type"),
            F.length(F.col(binary_col)).cast("long").alias("n_bytes"),
            F.sha2(F.col(binary_col), 256).alias("sha256"),
        ),
    )


def _fake_decode(data: bytes) -> list[float]:
    """Deterministic stand-in for a codec: 16 floats from the content
    hash. Replace with a real decoder (PIL/librosa/ffmpeg) off-sandbox."""
    h = hashlib.sha256(data).digest()
    return [b / 255.0 for b in h[:N_FEATURES]]


def media_features(
    df: DataFrame,
    binary_col: str = "payload",
    media_type_col: str | None = None,
    decode_stub: bool = True,
    batch_size_hint: int = 256,
) -> DataFrame:
    """Decode/feature-extract via ``mapInPandas`` (Arrow batches).

    The UDF signature is the production one: an iterator of pandas
    batches in, an iterator of feature batches out, so a real decoder
    can stream without materializing a partition.
    """
    mt_col = media_type_col

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[binary_col]
            feats, oks, hashes, sizes = [], [], [], []
            for data in payloads:
                if data is None:
                    feats.append(None)
                    oks.append(False)
                    hashes.append(None)
                    sizes.append(None)
                    continue
                data = bytes(data)
                hashes.append(hashlib.sha256(data).hexdigest())
                sizes.append(len(data))
                if decode_stub:
                    feats.append(_fake_decode(data))
                    oks.append(True)
                else:
                    raise NotImplementedError(
                        "real media decoding requires codec libraries not "
                        "present in this container; use decode_stub=True"
                    )
            yield pd.DataFrame(
                {
                    "media_sha256": hashes,
                    "n_bytes": sizes,
                    "media_type": (
                        pdf[mt_col]
                        if mt_col
                        else ["application/octet-stream"] * len(pdf)
                    ),
                    "feature": feats,
                    "decode_ok": oks,
                }
            )

    cols = [binary_col] + ([mt_col] if mt_col else [])
    return df.select(*cols).mapInPandas(extract, schema=FEATURE_SCHEMA)


def frame_sample_plan(
    df: DataFrame, duration_col: str, every_sec: float = 1.0
) -> DataFrame:
    """Frame-sampling *plan*: one row per (media, frame_ts) — the
    shuffle-free explode that precedes per-frame decoding. Decoding the
    frame is the stubbed step above."""
    n = (F.col(duration_col) / F.lit(every_sec)).cast("int")
    return df.withColumn(
        "frame_ts",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(n - 1, F.lit(0))),
                lambda i: i.cast("double") * every_sec,
            )
        ),
    )


# ---- REAL container probing (no codec libraries needed) ---------------
#
# Magic-byte sniffing + header parsing are pure byte arithmetic, so this
# part of "decode" is NOT stubbed: PNG/GIF/JPEG dimensions and WAV
# duration come from the actual payload. Only pixel/sample decoding
# (media_features above) remains a stub in this container.

def sniff_media_type(data: bytes) -> str | None:
    if data.startswith(b"\x89PNG\r\n\x1a\n"):
        return "image/png"
    if data.startswith(b"\xff\xd8\xff"):
        return "image/jpeg"
    if data.startswith((b"GIF87a", b"GIF89a")):
        return "image/gif"
    if data.startswith(b"RIFF") and data[8:12] == b"WAVE":
        return "audio/wav"
    return None


def _png_dims(data: bytes) -> tuple[int, int] | None:
    # 8-byte signature, 4-byte length, b"IHDR", then width/height (BE)
    if len(data) >= 24 and data[12:16] == b"IHDR":
        return (
            int.from_bytes(data[16:20], "big"),
            int.from_bytes(data[20:24], "big"),
        )
    return None


def _gif_dims(data: bytes) -> tuple[int, int] | None:
    if len(data) >= 10:
        return (
            int.from_bytes(data[6:8], "little"),
            int.from_bytes(data[8:10], "little"),
        )
    return None


def _jpeg_dims(data: bytes) -> tuple[int, int] | None:
    # walk the marker stream to the first SOFn frame header
    i, n = 2, len(data)
    while i + 9 < n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = int.from_bytes(data[i + 2:i + 4], "big")
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 <= n:
                h = int.from_bytes(data[i + 5:i + 7], "big")
                w = int.from_bytes(data[i + 7:i + 9], "big")
                return (w, h)
            return None
        i += 2 + seg_len
    return None


def _wav_duration(data: bytes) -> float | None:
    # RIFF/WAVE: find fmt (byte rate at +8) and data chunk size
    i, n = 12, len(data)
    byte_rate = None
    data_size = None
    while i + 8 <= n:
        cid = data[i:i + 4]
        size = int.from_bytes(data[i + 4:i + 8], "little")
        if cid == b"fmt " and i + 20 <= n:
            byte_rate = int.from_bytes(data[i + 16:i + 20], "little")
        elif cid == b"data":
            data_size = size
        i += 8 + size + (size % 2)
    if byte_rate and data_size is not None:
        return data_size / byte_rate
    return None


PROBE_SCHEMA = (
    "media_sha256 string, media_type string, width int, height int, "
    "duration_sec double, probe_ok boolean"
)


def media_probe(df: DataFrame, binary_col: str = "payload") -> DataFrame:
    """Real metadata decode over ``mapInPandas``: sniff the container
    from magic bytes and parse dimensions/duration from the header —
    per Arrow batch, never per-row Spark ``udf``."""

    def probe(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: list[tuple] = []
            for data in pdf[binary_col]:
                if data is None:
                    out.append((None, None, None, None, None, False))
                    continue
                data = bytes(data)
                sha = hashlib.sha256(data).hexdigest()
                mt = sniff_media_type(data)
                w = h = None
                dur = None
                if mt == "image/png":
                    dims = _png_dims(data)
                    w, h = dims if dims else (None, None)
                elif mt == "image/gif":
                    dims = _gif_dims(data)
                    w, h = dims if dims else (None, None)
                elif mt == "image/jpeg":
                    dims = _jpeg_dims(data)
                    w, h = dims if dims else (None, None)
                elif mt == "audio/wav":
                    dur = _wav_duration(data)
                ok = mt is not None and (w is not None or dur is not None)
                out.append((sha, mt, w, h, dur, ok))
            yield pd.DataFrame(
                out,
                columns=[
                    "media_sha256", "media_type", "width", "height",
                    "duration_sec", "probe_ok",
                ],
            )

    return df.select(binary_col).mapInPandas(probe, schema=PROBE_SCHEMA)
