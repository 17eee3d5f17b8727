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

    feats = media_features(df, "payload", "mt").collect()
    ok = [r for r in feats if r.decode_ok]
    assert len(ok) == 2
    assert all(len(r.feature) == 16 for r in ok)
    # deterministic: same payload -> same feature
    feats2 = media_features(df, "payload", "mt").collect()
    assert sorted(str(r.feature) for r in feats) == sorted(str(r.feature) for r in feats2)


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
    WAV rows carry real stats in the feature vector, JPEG/None rows are
    decode_ok=False — same mapInPandas plumbing as the stub path."""
    gif = _encode_gif([1] * 6, 3, 2, [(0, 0, 0), (40, 80, 120)])
    rows = [
        (1, _encode_png([100] * (4 * 3 * 3), 4, 3, 3, [0, 1, 2, 3, 4])),
        (2, _tiny_wav(2.0)),
        (3, _tiny_jpeg(8, 8)),
        (4, None),
        (5, gif),
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
    g = got[key(gif)]
    assert g.decode_ok and g.feature[:3] == [3.0, 2.0, 3.0]
    assert abs(g.feature[3] - 40 / 255.0) < 1e-6       # mean R (flat)
    assert abs(g.feature[4] - 80 / 255.0) < 1e-6       # mean G


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
