"""Real media decode over binary columns — no codec libraries.

PNG pixels are zlib-inflated and unfiltered scanline-by-scanline; GIF
pixels are LZW-decoded with palette lookup (round 5); baseline JPEG is
huffman-decoded, dequantized and IDCT'd straight from the T.81 spec
(round 5); WAV PCM is struct-parsed. ``media_features`` runs the same
decoders distributed through ``mapInPandas`` (Arrow batches), and
containers outside the decodable subset (e.g. a truncated JPEG) come
back ``decode_ok=False`` rather than a fabricated feature.
"""

import base64
import struct
import zlib

from jschon_spark import get_spark
from jschon_spark.operators.multimodal import (
    decode_gif_stats,
    decode_jpeg_stats,
    decode_png_stats,
    decode_wav_stats,
    media_features,
)


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def tiny_png(w: int, h: int, rgb: tuple[int, int, int]) -> bytes:
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    row = b"\x00" + bytes(rgb) * w
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(row * h)) + _chunk(b"IEND", b""))


def tiny_wav(seconds: float, rate: int = 8000, amp: int = 2000) -> bytes:
    n = int(seconds * rate)
    pcm = struct.pack(f"<{n}h", *((amp if i % 2 == 0 else -amp) for i in range(n)))
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + body


png = tiny_png(8, 4, (200, 100, 0))
wav = tiny_wav(1.5)
# hand-verified 1x1 white GIF (2-entry global palette, LZW min code 2)
gif = (b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
       b",\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;")
# flat (180,60,20) 8x8 RGB baseline JPEG at quant=1, produced by the
# test suite's independent encoder (tests/test_multimodal_pipeline.py
# _encode_jpeg) — flat blocks with a unit quant table decode exactly
jpg = base64.b64decode(
    "/9j/2wCEAAEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEB"
    "AQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEB"
    "AQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEBAQEB"
    "Af/AABEIAAgACAMBEQACEQEDEQH/xAAfAAAAAAAAAAAMAAAAAAAAAAAAAQID"
    "BAUGBwgJCgv/xAAUEAAAAAAAAAABAAAAAAAAAAAA/8QAHwEAAAAAAAAADAAA"
    "AAAAAAAAAAECAwQFBgcICQoL/8QAFBEAAAAAAAAAAQAAAAAAAAAAAP/aAAwD"
    "AQACEQMRAD8ACW0ABK9AAn9AH//Z"
)

s = decode_png_stats(png)
print("png", s["width"], s["height"], s["channels"],
      [round(m, 1) for m in s["mean"]], [round(d, 1) for d in s["std"]])
g = decode_gif_stats(gif)
print("gif", g["width"], g["height"], g["channels"],
      [round(m, 1) for m in g["mean"]], g["px_min"], g["px_max"])
a = decode_wav_stats(wav)
print("wav", a["rate"], a["channels"], round(a["duration_sec"], 3),
      round(a["rms"], 6), round(a["peak"], 6))
j = decode_jpeg_stats(jpg)
print("jpg", j["width"], j["height"], j["channels"],
      [round(m, 1) for m in j["mean"]], j["px_min"], j["px_max"])

spark = get_spark(cores=4)
df = spark.createDataFrame(
    [(1, png), (2, wav), (3, b"\xff\xd8\xffnot-decodable-jpeg"), (4, gif),
     (5, jpg)],
    "id long, payload binary",
)
for r in sorted(media_features(df, "payload", decode_stub=False).collect(),
                key=lambda r: r.n_bytes):
    feat = None if r.feature is None else [round(x, 3) for x in r.feature[:5]]
    print(r.decode_ok, feat)
