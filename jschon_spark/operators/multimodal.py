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
