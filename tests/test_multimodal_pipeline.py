"""Multimodal plumbing + end-to-end corpus pipeline tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from jschon_spark.operators.multimodal import (
    frame_sample_plan,
    media_features,
    with_media_meta,
)
from jschon_spark.pipeline import validate_corpus, validate_corpus_checkpointed
from jschon_spark.sources.webpages import generate_webpages


def test_media_meta_and_features(spark):
    rows = [(1, b"payload-one", "image/png"), (2, b"x" * 100, "audio/wav"), (3, None, "image/png")]
    df = spark.createDataFrame(rows, "id long, payload binary, mt string")
    meta = with_media_meta(df, "payload", "mt").collect()
    by_id = {r.id: r.media_meta for r in meta}
    assert by_id[1].n_bytes == 11 and by_id[1].media_type == "image/png"
    assert by_id[3].n_bytes is None

    # DEFAULT path is the real decoders (round 6): neither payload is
    # a decodable container, so both are honestly decode_ok=False
    feats = media_features(df, "payload", "mt").collect()
    assert all(not r.decode_ok for r in feats)
    assert all(r.feature is None for r in feats if r.media_sha256)

    # stub path is opt-in, deterministic, and NEVER claims decode_ok
    stub = media_features(df, "payload", "mt", decode_stub=True).collect()
    with_feat = [r for r in stub if r.feature is not None]
    assert len(with_feat) == 2
    assert all(len(r.feature) == 16 and not r.decode_ok for r in with_feat)
    stub2 = media_features(df, "payload", "mt", decode_stub=True).collect()
    assert sorted(str(r.feature) for r in stub) == sorted(str(r.feature) for r in stub2)


def test_media_decode_unknown_container_flagged(spark):
    """decode_stub=False no longer raises: PNG/WAV decode for real
    (round 4); containers outside the stdlib-decodable subset come
    back decode_ok=False with no fabricated feature."""
    df = spark.createDataFrame(
        [(1, b"data"), (2, _tiny_jpeg(8, 8)), (3, _tiny_gif(4, 4))],
        "id long, payload binary",
    )
    rows = media_features(df, "payload", decode_stub=False).collect()
    assert all(r.decode_ok is False and r.feature is None for r in rows)


def _encode_png(pixels, w, h, nchan, filters):
    """Minimal stdlib PNG encoder applying a CHOSEN filter per row —
    exercises every unfilter branch of the decoder."""
    import struct, zlib

    def paeth(a, b, c):
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)

    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[nchan]
    stride = w * nchan
    raw = bytearray()
    prev = bytes(stride)
    for y in range(h):
        row = bytes(pixels[y * stride:(y + 1) * stride])
        ft = filters[y % len(filters)]
        raw.append(ft)
        for i in range(stride):
            a = row[i - nchan] if i >= nchan else 0
            b = prev[i]
            c = prev[i - nchan] if i >= nchan else 0
            if ft == 0:
                enc = row[i]
            elif ft == 1:
                enc = row[i] - a
            elif ft == 2:
                enc = row[i] - b
            elif ft == 3:
                enc = row[i] - ((a + b) >> 1)
            else:
                enc = row[i] - paeth(a, b, c)
            raw.append(enc & 0xFF)
        prev = row

    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))

    ihdr = struct.pack(">II5B", w, h, 8, ctype, 0, 0, 0)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(bytes(raw)))
            + chunk(b"IEND", b""))


def test_png_decode_golden_all_filters():
    """Pixel-exact golden: a known RGB image encoded with every filter
    type (None/Sub/Up/Average/Paeth) must decode to the exact
    per-channel mean/std of the source pixels."""
    import random
    from jschon_spark.operators.multimodal import decode_png_stats

    rng = random.Random(7)
    w, h, nchan = 9, 10, 3
    pixels = [rng.randrange(256) for _ in range(w * h * nchan)]
    for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
        data = _encode_png(pixels, w, h, nchan, filters)
        s = decode_png_stats(data)
        assert (s["width"], s["height"], s["channels"]) == (w, h, nchan)
        n = w * h
        for c in range(nchan):
            ch = pixels[c::nchan]
            mean = sum(ch) / n
            var = sum(x * x for x in ch) / n - mean * mean
            assert abs(s["mean"][c] - mean) < 1e-9, filters
            assert abs(s["std"][c] - var ** 0.5) < 1e-9, filters
    # grayscale+alpha path
    ga = [10, 255, 20, 255, 30, 255, 40, 255]
    s = decode_png_stats(_encode_png(ga, 2, 2, 2, [4]))
    assert s["channels"] == 2 and abs(s["mean"][0] - 25.0) < 1e-9
    assert s["mean"][1] == 255.0 and s["std"][1] == 0.0


def test_png_decode_unsupported_variants():
    import struct, zlib
    from jschon_spark.operators.multimodal import (
        UnsupportedMedia, decode_png_stats,
    )

    def build(depth, ctype, interlace):
        def chunk(tag, body):
            return (struct.pack(">I", len(body)) + tag + body
                    + struct.pack(">I", zlib.crc32(tag + body)))
        ihdr = struct.pack(">II5B", 2, 1, depth, ctype, 0, 0, interlace)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(b"\x00\x00\x00"))
                + chunk(b"IEND", b""))

    for depth, ctype, inter in ((16, 0, 0), (8, 3, 0), (8, 0, 1), (1, 0, 0)):
        with pytest.raises(UnsupportedMedia):
            decode_png_stats(build(depth, ctype, inter))


def test_wav_decode_golden_square_wave():
    """Sample-exact golden: a 16-bit square wave's RMS equals its
    amplitude/32768 and the duration is n_frames/rate."""
    import struct
    from jschon_spark.operators.multimodal import (
        UnsupportedMedia, decode_wav_stats,
    )

    rate, amp, n = 8000, 1000, 4000
    samples = [amp if i % 2 == 0 else -amp for i in range(n)]
    pcm = struct.pack(f"<{n}h", *samples)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(pcm)) + pcm)
    wav = b"RIFF" + struct.pack("<I", 4 + len(body)) + body
    s = decode_wav_stats(wav)
    assert s["channels"] == 1 and s["rate"] == rate
    assert abs(s["duration_sec"] - n / rate) < 1e-12
    assert abs(s["rms"] - amp / 32768.0) < 1e-12
    assert abs(s["peak"] - amp / 32768.0) < 1e-12
    # 8-bit silence: rms 0, peak 0 (the _tiny_wav fixture shape)
    s8 = decode_wav_stats(_tiny_wav(1.0))
    assert s8["rms"] == 0.0 and s8["peak"] == 0.0 and s8["duration_sec"] == 1.0
    # non-PCM (format 3 = IEEE float) must be flagged, not mis-decoded
    fmt3 = struct.pack("<HHIIHH", 3, 1, rate, rate * 4, 4, 32)
    body3 = (b"WAVEfmt " + struct.pack("<I", len(fmt3)) + fmt3
             + b"data" + struct.pack("<I", 8) + b"\x00" * 8)
    with pytest.raises(UnsupportedMedia):
        decode_wav_stats(b"RIFF" + struct.pack("<I", 4 + len(body3)) + body3)


def test_media_features_real_decode_distributed(spark):
    """media_features(decode_stub=False) over a mixed batch: PNG/GIF/
    JPEG/WAV rows carry real stats in the feature vector; header-only
    (undecodable) JPEG and None rows are decode_ok=False — same
    mapInPandas plumbing as the stub path."""
    import numpy as np

    gif = _encode_gif([1] * 6, 3, 2, [(0, 0, 0), (40, 80, 120)])
    jpg_real = _encode_jpeg(np.full((8, 8), 64, dtype=np.uint8), quant=1)
    rows = [
        (1, _encode_png([100] * (4 * 3 * 3), 4, 3, 3, [0, 1, 2, 3, 4])),
        (2, _tiny_wav(2.0)),
        (3, _tiny_jpeg(8, 8)),
        (4, None),
        (5, gif),
        (6, jpg_real),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    import hashlib as _hl

    def key(payload):  # n_bytes collides (the GIF and JPEG are both 35)
        return _hl.sha256(payload).hexdigest()

    got = {r.media_sha256: r for r in
           media_features(df, "payload", decode_stub=False).collect()}
    png = got[key(rows[0][1])]
    assert png.decode_ok and len(png.feature) == 16
    assert png.feature[:3] == [4.0, 3.0, 3.0]          # w, h, channels
    assert abs(png.feature[3] - 100 / 255.0) < 1e-6    # mean ch0
    assert abs(png.feature[7]) < 1e-6                  # std ch0 (flat)
    wav = got[key(rows[1][1])]
    assert wav.decode_ok
    assert abs(wav.feature[0] - 2.0) < 1e-6            # duration
    assert wav.feature[1] == 8000.0 and wav.feature[2] == 1.0
    jpg = got[key(rows[2][1])]
    assert jpg.decode_ok is False and jpg.feature is None
    jr = got[key(jpg_real)]
    assert jr.decode_ok and jr.feature[:3] == [8.0, 8.0, 1.0]
    assert abs(jr.feature[3] - 64 / 255.0) < 1e-6      # mean (flat, q=1)
    g = got[key(gif)]
    assert g.decode_ok and g.feature[:3] == [3.0, 2.0, 3.0]
    assert abs(g.feature[3] - 40 / 255.0) < 1e-6       # mean R (flat)
    assert abs(g.feature[4] - 80 / 255.0) < 1e-6       # mean G


def test_real_decode_survives_corrupt_payloads():
    """Round-6 ADVICE fix: truncated/corrupt payloads that sniff as a
    known container must degrade to None (-> decode_ok=False), never
    leak a raw IndexError/ValueError/zlib.error out of the task."""
    import struct, zlib
    from jschon_spark.operators.multimodal import _real_decode

    corrupt = [
        # JPEG: SOI then a DQT segment whose declared length runs past
        # the end of the stream (raw IndexError pre-fix)
        b"\xff\xd8\xff\xdb\x00\x84\x00",
        # JPEG: truncated SOF0 header (length says 17 bytes, stream ends)
        b"\xff\xd8\xff\xc0\x00\x11\x08\x00",
        # JPEG: DHT with a counts table but no symbols
        b"\xff\xd8\xff\xc4\x00\x1f\x00" + bytes([1] * 4),
        # JPEG: zero-length segment length field (would loop/index)
        b"\xff\xd8\xff\xe0\x00\x00",
        # PNG: valid IHDR but garbage (non-zlib) IDAT -> zlib.error
        (b"\x89PNG\r\n\x1a\n"
         + struct.pack(">I", 13) + b"IHDR"
         + struct.pack(">II5B", 2, 2, 8, 0, 0, 0, 0) + b"\x00" * 4
         + struct.pack(">I", 5) + b"IDAT" + b"not-z" + b"\x00" * 4
         + struct.pack(">I", 0) + b"IEND" + b"\x00" * 4),
        # WAV: fmt chunk shorter than its declared size
        b"RIFF" + struct.pack("<I", 20) + b"WAVEfmt " + struct.pack("<I", 16)
        + b"\x01\x00",
    ]
    for payload in corrupt:
        assert _real_decode(payload) is None, payload[:8]


def test_jpeg_non_divisor_sampling_rejected():
    """T.81 allows sampling factor 3 in a 4-max frame, but the
    replication upsampler needs integer ratios — such frames must be
    UnsupportedMedia, not a numpy shape error (round-6 ADVICE fix)."""
    import struct
    from jschon_spark.operators.multimodal import (
        UnsupportedMedia, decode_jpeg_stats,
    )

    def seg(marker, body):
        return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body

    qt = seg(0xDB, b"\x00" + bytes([1] * 64))
    # one DC + one AC huffman table (trivial: single symbol 0)
    dht = (seg(0xC4, b"\x00" + bytes([1] + [0] * 15) + b"\x00")
           + seg(0xC4, b"\x10" + bytes([1] + [0] * 15) + b"\x00"))
    # SOF0: 3 components, Y at (4,4), Cb at (3,1) -> 4 % 3 != 0
    sof = seg(0xC0, struct.pack(">BHHB", 8, 16, 16, 3)
              + bytes([1, 0x44, 0]) + bytes([2, 0x31, 0]) + bytes([3, 0x11, 0]))
    sos = seg(0xDA, b"\x03" + bytes([1, 0, 2, 0, 3, 0]) + b"\x00\x3f\x00")
    jpg = b"\xff\xd8" + qt + dht + sof + sos + b"\x00" * 32 + b"\xff\xd9"
    with pytest.raises(UnsupportedMedia, match="non-divisor"):
        decode_jpeg_stats(jpg)


def test_frame_sample_plan(spark):
    df = spark.createDataFrame([(1, 3.0), (2, 0.5)], "id long, dur double")
    rows = frame_sample_plan(df, "dur", every_sec=1.0).collect()
    frames = {(r.id, r.frame_ts) for r in rows}
    assert {(1, 0.0), (1, 1.0), (1, 2.0), (2, 0.0)} == frames


def test_validate_corpus_end_to_end(spark):
    docs = generate_webpages(spark, 4000)
    rep = validate_corpus(spark, docs)
    m = rep.metrics
    assert m["n_docs"] == 4000
    assert 0 < m["n_failed"] < 4000
    assert m["n_duplicate_url_groups"] > 0
    assert m["n_lang_violations"] > 0
    assert rep.violations.count() > 0
    # every failing verdict has at least one violation row
    n_failed_docs = rep.verdicts.filter("NOT passed").count()
    n_viol_docs = rep.violations.select("url").distinct().count()
    # NULL urls collapse in the distinct; allow that slack
    assert n_viol_docs >= n_failed_docs - rep.verdicts.filter(
        F.col("url").isNull()
    ).count()


def test_validate_corpus_checkpointed(spark, tmp_path):
    docs = generate_webpages(spark, 2000)
    days = [
        r.day
        for r in docs.select(F.date_format("warc_ts", "yyyy-MM-dd").alias("day"))
        .distinct()
        .collect()
    ]
    snaps = {d: "s1" for d in days}
    out1 = validate_corpus_checkpointed(spark, docs, str(tmp_path), snaps)
    assert len(out1) == len(days)
    assert sum(m["metrics"]["n_docs"] for m in out1.values()) == 2000
    out2 = validate_corpus_checkpointed(spark, docs, str(tmp_path), snaps)
    assert out2 == {}


def test_iceberg_fallback_roundtrip(spark, tmp_path):
    from jschon_spark.sources.iceberg import (
        iceberg_available,
        partition_snapshots,
        read_webpages_table,
        write_webpages_table,
    )

    assert iceberg_available(spark) is False  # no jars in this image
    docs = generate_webpages(spark, 1000)
    target = str(tmp_path / "pages_tbl")
    assert write_webpages_table(spark, docs, target) == "parquet"
    back = read_webpages_table(spark, target)
    # the physical day partition column rides along on the parquet
    # fallback (day-jobs filter on it for directory-level pruning)
    assert set(back.columns) == {"url", "warc_ts", "html", "text", "lang", "day"}
    assert back.count() == 1000
    snaps = partition_snapshots(spark, target)
    assert len(snaps) == 30  # 30 distinct days
    assert all(len(s) == 16 for s in snaps.values())
    # fingerprints are stable across calls
    assert snaps == partition_snapshots(spark, target)


def _tiny_png(w: int, h: int) -> bytes:
    import struct, zlib
    ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
    def chunk(tag, body):
        return (struct.pack(">I", len(body)) + tag + body
                + struct.pack(">I", zlib.crc32(tag + body)))
    raw = b"\x00" + b"\x00\x00\x00" * w
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw * h)) + chunk(b"IEND", b""))


def _tiny_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + w.to_bytes(2, "little") + h.to_bytes(2, "little") + b"\x00" * 20


def _tiny_jpeg(w: int, h: int) -> bytes:
    import struct
    sof0 = struct.pack(">BBHBHHB", 0xFF, 0xC0, 11, 8, h, w, 1) + b"\x01\x11\x00"
    return b"\xff\xd8" + b"\xff\xe0\x00\x10" + b"JFIF\x00" + b"\x00" * 9 + sof0 + b"\xff\xd9"


def _tiny_wav(seconds: float, rate: int = 8000) -> bytes:
    import struct
    n = int(seconds * rate)  # 1 byte/sample (8-bit mono)
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate, 1, 8)
    data = b"\x80" * n
    body = (b"WAVEfmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + body


def test_media_probe_real_headers(spark):
    """Container probing is REAL decode (pure byte arithmetic): PNG/GIF/
    JPEG dimensions and WAV duration parsed from actual payloads."""
    from jschon_spark.operators.multimodal import media_probe

    rows = [
        (1, _tiny_png(17, 9)),
        (2, _tiny_gif(300, 200)),
        (3, _tiny_jpeg(64, 48)),
        (4, _tiny_wav(2.5)),
        (5, b"not media at all"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "id long, payload binary")
    by_type = {}
    for r in media_probe(df).collect():
        by_type.setdefault(r.media_type, []).append(r)
    png = by_type["image/png"][0]
    assert (png.width, png.height, png.probe_ok) == (17, 9, True)
    gif = by_type["image/gif"][0]
    assert (gif.width, gif.height) == (300, 200)
    jpg = by_type["image/jpeg"][0]
    assert (jpg.width, jpg.height) == (64, 48)
    wav = by_type["audio/wav"][0]
    assert abs(wav.duration_sec - 2.5) < 1e-9 and wav.probe_ok
    unknown = by_type[None]
    assert any(r.probe_ok is False for r in unknown)


def _encode_gif(indices, w, h, palette, interlace=False):
    """Minimal stdlib GIF89a encoder with its own variable-width LZW
    encoder (dict-based string table — independent of the decoder's
    list-based table building). ``palette`` is [(r,g,b), ...]."""
    import struct

    bits = max(1, (max(2, len(palette)) - 1).bit_length())
    size = 1 << bits
    mcs = max(2, bits)
    clear = 1 << mcs
    end = clear + 1

    bitstream = bytearray()
    acc = 0
    nacc = 0
    code_size = mcs + 1

    def emit(code):
        nonlocal acc, nacc
        acc |= code << nacc
        nacc += code_size
        while nacc >= 8:
            bitstream.append(acc & 0xFF)
            acc >>= 8
            nacc -= 8

    emit(clear)
    table = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    # mirror the decoder's width growth: its table length after the
    # k-th emitted code (k>=2) is clear+2+(k-1); width grows when that
    # hits 2^code_size
    decoder_len = clear + 2
    emitted = 0
    prev = b""
    for i in indices:
        cur = prev + bytes([i])
        if cur in table:
            prev = cur
            continue
        emit(table[prev])
        emitted += 1
        if emitted >= 2:
            decoder_len += 1
            if decoder_len == (1 << code_size) and code_size < 12:
                code_size += 1
        table[cur] = next_code
        next_code += 1
        prev = bytes([i])
    if prev:
        emit(table[prev])
        emitted += 1
        if emitted >= 2:
            decoder_len += 1
            if decoder_len == (1 << code_size) and code_size < 12:
                code_size += 1
    emit(end)
    if nacc:
        bitstream.append(acc & 0xFF)

    pal = b"".join(bytes(c) for c in palette) + b"\x00\x00\x00" * (
        size - len(palette)
    )
    out = bytearray()
    out += b"GIF89a" + struct.pack("<HH", w, h)
    out.append(0x80 | (bits - 1))  # global color table, 2^bits entries
    out += b"\x00\x00" + pal
    out += b"," + struct.pack("<HHHH", 0, 0, w, h)
    out.append(0x40 if interlace else 0)
    out.append(mcs)
    for off in range(0, len(bitstream), 255):
        chunk = bitstream[off:off + 255]
        out.append(len(chunk))
        out += chunk
    out += b"\x00;"
    return bytes(out)


def test_gif_decode_golden_roundtrip():
    """Pixel-exact golden (round 5): random palette images through the
    test encoder's independent LZW must decode to the exact per-channel
    RGB stats of the source pixels, across palette sizes that force
    code-width growth and multi-sub-block streams."""
    import random
    from jschon_spark.operators.multimodal import decode_gif_stats

    for n_colors, w, h in ((4, 7, 5), (16, 23, 19), (200, 40, 33)):
        rng = random.Random(n_colors)
        palette = [
            (rng.randrange(256), rng.randrange(256), rng.randrange(256))
            for _ in range(n_colors)
        ]
        idx = [rng.randrange(n_colors) for _ in range(w * h)]
        s = decode_gif_stats(_encode_gif(idx, w, h, palette))
        assert (s["width"], s["height"], s["channels"]) == (w, h, 3)
        n = w * h
        for c in range(3):
            chan = [palette[i][c] for i in idx]
            mean = sum(chan) / n
            var = sum(x * x for x in chan) / n - mean * mean
            assert abs(s["mean"][c] - mean) < 1e-9, (n_colors, c)
            assert abs(s["std"][c] - var ** 0.5) < 1e-9, (n_colors, c)
        assert s["px_min"] == min(min(palette[i]) for i in idx)
        assert s["px_max"] == max(max(palette[i]) for i in idx)


def test_gif_decode_known_bytes_and_variants():
    """A hand-verified 1x1 white GIF literal decodes exactly; the
    interlace flag is tolerated (stats are order-invariant); corrupt
    LZW and missing color tables raise UnsupportedMedia."""
    import pytest as _pytest

    from jschon_spark.operators.multimodal import (
        UnsupportedMedia, decode_gif_stats,
    )

    white_1x1 = (
        b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
        b",\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x02D\x01\x00;"
    )
    s = decode_gif_stats(white_1x1)
    assert (s["width"], s["height"]) == (1, 1)
    assert s["mean"] == [255.0, 255.0, 255.0] and s["px_min"] == 255

    inter = _encode_gif([0, 1, 2, 3] * 4, 4, 4,
                        [(0, 0, 0), (50, 60, 70), (100, 110, 120),
                         (200, 210, 220)], interlace=True)
    s2 = decode_gif_stats(inter)
    assert s2["width"] == 4 and abs(s2["mean"][0] - 87.5) < 1e-9

    with _pytest.raises(UnsupportedMedia):
        decode_gif_stats(b"GIF89a\x01\x00\x01\x00\x00\x00\x00"
                         b",\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02"
                         b"\x02D\x01\x00;")  # no color table anywhere
    # first code after CLEAR beyond the table (code 7 with 6 entries):
    # min_code=2, bits LSB-first: 100 (clear=4) then 111 -> byte 0x3C
    bad_code = (
        b"GIF89a\x01\x00\x01\x00\x80\x00\x00\xff\xff\xff\x00\x00\x00"
        b",\x00\x00\x00\x00\x01\x00\x01\x00\x00\x02\x01\x3c\x00;"
    )
    with _pytest.raises(UnsupportedMedia):
        decode_gif_stats(bad_code)
    # stream ends before w*h pixels: widen the descriptor to 2x1 but
    # keep the single-pixel LZW data
    short = bytearray(white_1x1)
    short[6] = 2   # logical screen width
    short[24] = 2  # image descriptor width
    with _pytest.raises(UnsupportedMedia):
        decode_gif_stats(bytes(short))


# ---- baseline JPEG test encoder (independent of the decoder) ----
# Forward path only: RGB->YCbCr, optional 4:2:0 downsample, FDCT +
# quantize, DPCM/run-length symbols, fixed-length-8 huffman tables
# (a valid prefix set the decoder must handle like any DHT).

_JZZ = (
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
)


class _JBitWriter:
    def __init__(self):
        self.out, self.acc, self.n = bytearray(), 0, 0

    def write(self, val, nbits):
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((val >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc, self.n = 0, 0

    def flush(self):
        while self.n:
            self.write(1, 1)


def _jcat(v):
    return abs(int(v)).bit_length()


def _encode_jpeg(img, quant=16, subsample=False, restart=0):
    """img: HxW (grayscale) or HxWx3 uint8 RGB numpy array."""
    import numpy as np

    xs = np.arange(8, dtype=np.float64)
    m = np.cos((2 * xs[:, None] + 1) * xs[None, :] * np.pi / 16) / 2.0
    m[:, 0] *= 1 / np.sqrt(2)
    img = np.asarray(img, dtype=np.float64)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    q = np.full((8, 8), float(quant))

    if gray:
        comps = [(img, 1, 1, 0)]
        hmax = vmax = 1
    else:
        r, g, b = img[..., 0], img[..., 1], img[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            def ds(p):
                hh = (p.shape[0] + 1) // 2 * 2
                ww = (p.shape[1] + 1) // 2 * 2
                pp = np.pad(p, ((0, hh - p.shape[0]), (0, ww - p.shape[1])),
                            mode="edge")
                return (pp[0::2, 0::2] + pp[1::2, 0::2] + pp[0::2, 1::2]
                        + pp[1::2, 1::2]) / 4.0
            comps = [(y, 2, 2, 0), (ds(cb), 1, 1, 1), (ds(cr), 1, 1, 1)]
            hmax = vmax = 2
        else:
            comps = [(y, 1, 1, 0), (cb, 1, 1, 1), (cr, 1, 1, 1)]
            hmax = vmax = 1

    mcux, mcuy = -(-w // (8 * hmax)), -(-h // (8 * vmax))
    comp_blocks = []
    for plane, hs, vs, _tq in comps:
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        p = np.pad(plane, ((0, ph - plane.shape[0]),
                           (0, pw - plane.shape[1])), mode="edge")
        blocks = []
        for my in range(mcuy):
            for mx in range(mcux):
                for bv in range(vs):
                    for bh in range(hs):
                        y0, x0 = (my * vs + bv) * 8, (mx * hs + bh) * 8
                        f = m.T @ (p[y0:y0 + 8, x0:x0 + 8] - 128.0) @ m
                        blocks.append(np.rint(f / q).astype(np.int64))
        comp_blocks.append(blocks)

    classes = [[0]] if gray else [[0], [1, 2]]
    tables = []
    for cls in classes:
        ac_s = {0x00}
        for ci in cls:
            for b in comp_blocks[ci]:
                zz = [int(b.flat[_JZZ[k]]) for k in range(64)]
                last = 63
                while last > 0 and zz[last] == 0:
                    last -= 1
                run = 0
                for k in range(1, last + 1):
                    if zz[k] == 0:
                        run += 1
                        if run == 16:
                            ac_s.add(0xF0)
                            run = 0
                    else:
                        ac_s.add((run << 4) | _jcat(zz[k]))
                        run = 0
        # all 12 DC categories: restart markers reset the DPCM pred,
        # which a collection pass would not model
        def tab(syms):
            vals = sorted(syms)
            bits = [0] * 16
            bits[7] = len(vals)
            return bits, vals, {v: (8, i) for i, v in enumerate(vals)}
        tables.append((tab(range(12)), tab(ac_s)))

    out = bytearray(b"\xff\xd8")
    qz = bytes(int(q.flat[_JZZ[k]]) for k in range(64))
    seg = b"".join(bytes([tq]) + qz for tq in sorted({c[3] for c in comps}))
    out += b"\xff\xdb" + (len(seg) + 2).to_bytes(2, "big") + seg
    ncomp = len(comps)
    sof = bytes([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big") + \
        bytes([ncomp])
    for i, (_p, hs, vs, tq) in enumerate(comps):
        sof += bytes([i + 1, (hs << 4) | vs, tq])
    out += b"\xff\xc0" + (len(sof) + 2).to_bytes(2, "big") + sof
    for ti, ((dbits, dvals, _de), (abits, avals, _ae)) in enumerate(tables):
        seg = bytes([0x00 | ti]) + bytes(dbits) + bytes(dvals)
        out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg
        seg = bytes([0x10 | ti]) + bytes(abits) + bytes(avals)
        out += b"\xff\xc4" + (len(seg) + 2).to_bytes(2, "big") + seg
    if restart:
        out += b"\xff\xdd\x00\x04" + restart.to_bytes(2, "big")
    sos = bytes([ncomp])
    for i in range(ncomp):
        ti = 0 if (gray or i == 0) else 1
        sos += bytes([i + 1, (ti << 4) | ti])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + (len(sos) + 2).to_bytes(2, "big") + sos

    bw = _JBitWriter()
    preds = [0] * ncomp
    nblk = [hs * vs for _p, hs, vs, _t in comps]
    done = [0] * ncomp
    mcu_count = rst_n = 0
    for _my in range(mcuy):
        for _mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                bw.flush()
                out += bw.out
                bw = _JBitWriter()
                out += bytes([0xFF, 0xD0 + (rst_n & 7)])
                rst_n += 1
                preds = [0] * ncomp
            for ci in range(ncomp):
                ti = 0 if (gray or ci == 0) else 1
                (_db, _dv, denc), (_ab, _av, aenc) = tables[ti]
                for _ in range(nblk[ci]):
                    b = comp_blocks[ci][done[ci]]
                    done[ci] += 1
                    zz = [int(b.flat[_JZZ[k]]) for k in range(64)]
                    diff = zz[0] - preds[ci]
                    preds[ci] = zz[0]
                    s = _jcat(diff)
                    ln, code = denc[s]
                    bw.write(code, ln)
                    if s:
                        bw.write(diff + (1 << s) - 1 if diff < 0 else diff, s)
                    last = 63
                    while last > 0 and zz[last] == 0:
                        last -= 1
                    run = 0
                    for k in range(1, last + 1):
                        if zz[k] == 0:
                            run += 1
                            if run == 16:
                                ln, code = aenc[0xF0]
                                bw.write(code, ln)
                                run = 0
                        else:
                            s = _jcat(zz[k])
                            ln, code = aenc[(run << 4) | s]
                            bw.write(code, ln)
                            v = zz[k]
                            bw.write(v + (1 << s) - 1 if v < 0 else v, s)
                            run = 0
                    if last < 63:
                        ln, code = aenc[0x00]
                        bw.write(code, ln)
            mcu_count += 1
    bw.flush()
    out += bw.out + b"\xff\xd9"
    return bytes(out)


def test_jpeg_decode_exact_flat_and_gradient():
    """With a unit quant table the DCT roundtrip is exact to rounding:
    a flat gray block decodes to exactly its value (std 0), a gradient
    to its exact mean; flat RGB survives the YCbCr roundtrip within
    +-2 of each channel."""
    import numpy as np

    from jschon_spark.operators.multimodal import (
        _jpeg_dims, decode_jpeg_stats, sniff_media_type,
    )

    img = np.full((8, 8), 77, dtype=np.uint8)
    data = _encode_jpeg(img, quant=1)
    assert sniff_media_type(data) == "image/jpeg"
    assert _jpeg_dims(data) == (8, 8)
    s = decode_jpeg_stats(data)
    assert (s["width"], s["height"], s["channels"]) == (8, 8, 1)
    assert s["mean"] == [77.0] and s["std"] == [0.0]
    assert s["px_min"] == 77 and s["px_max"] == 77

    gx = np.tile(np.arange(16) * 16, (16, 1)).astype(np.uint8)
    s = decode_jpeg_stats(_encode_jpeg(gx, quant=1))
    assert abs(s["mean"][0] - gx.mean()) < 1.0

    rgb = np.zeros((8, 8, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 200, 50, 100
    s = decode_jpeg_stats(_encode_jpeg(rgb, quant=1))
    assert s["channels"] == 3
    for got, want in zip(s["mean"], (200, 50, 100)):
        assert abs(got - want) <= 2.0


def test_jpeg_decode_subsampled_restart_and_lossy():
    """4:2:0 MCU geometry with odd dimensions, restart-marker streams
    decoding identically to the unsegmented stream, and default-quant
    lossy decode staying near the source means."""
    import numpy as np

    from jschon_spark.operators.multimodal import decode_jpeg_stats

    rgb = np.zeros((13, 11, 3), dtype=np.uint8)
    rgb[..., 0], rgb[..., 1], rgb[..., 2] = 30, 180, 90
    s = decode_jpeg_stats(_encode_jpeg(rgb, quant=1, subsample=True))
    assert (s["width"], s["height"], s["channels"]) == (11, 13, 3)
    for got, want in zip(s["mean"], (30, 180, 90)):
        assert abs(got - want) <= 2.0

    img = np.tile(np.arange(48) * 5 % 256, (24, 1)).astype(np.uint8)
    d0 = decode_jpeg_stats(_encode_jpeg(img, quant=2))
    d1 = decode_jpeg_stats(_encode_jpeg(img, quant=2, restart=2))
    assert d0 == d1

    rng = np.random.default_rng(7)
    noise = rng.integers(0, 256, (32, 32, 3)).astype(np.uint8)
    s = decode_jpeg_stats(_encode_jpeg(noise))
    for c in range(3):
        assert abs(s["mean"][c] - noise[..., c].mean()) < 6.0


def test_jpeg_decode_unsupported_variants():
    """Progressive (SOF2), 12-bit precision, header-only, and
    truncated entropy streams raise UnsupportedMedia instead of
    returning fabricated stats."""
    import numpy as np
    import pytest as _pytest

    from jschon_spark.operators.multimodal import (
        UnsupportedMedia, decode_jpeg_stats,
    )

    good = bytearray(_encode_jpeg(np.full((8, 8), 1, dtype=np.uint8)))
    i = good.find(b"\xff\xc0")
    prog = bytearray(good)
    prog[i + 1] = 0xC2
    with _pytest.raises(UnsupportedMedia):
        decode_jpeg_stats(bytes(prog))
    deep = bytearray(good)
    deep[i + 4] = 12  # precision byte
    with _pytest.raises(UnsupportedMedia):
        decode_jpeg_stats(bytes(deep))
    with _pytest.raises(UnsupportedMedia):
        decode_jpeg_stats(_tiny_jpeg(8, 8))  # SOF but no SOS
    with _pytest.raises(UnsupportedMedia):
        decode_jpeg_stats(bytes(good[:len(good) - 12]))  # cut entropy
