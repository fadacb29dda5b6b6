"""Multimodal binary-column plumbing: schema, determinism, codec stub."""

from __future__ import annotations

import pytest

from projet_meteo_etl_spark.operators import multimodal as mm

SF = "/root/testdata/sf0.001"


def test_payload_schema_and_magic(spark):
    from projet_meteo_etl_spark.catalog import load_table

    m = mm.with_media_payload(load_table(spark, SF, "documents"))
    dt = dict(m.dtypes)
    assert dt["payload"] == "binary"
    assert dt["kind"] == "string"
    assert dt["meta"].startswith("struct<width:int,height:int,sample_rate:int")
    rows = m.limit(30).collect()
    for r in rows:
        magic = bytes.fromhex(mm.MAGIC_HEX[r.kind])
        assert bytes(r.payload)[: len(magic)] == magic
        assert r.meta.sample_rate == (16000 if r.kind == "audio" else 0)


def test_decode_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\x89PNG", "image")


def test_fake_decoder_deterministic():
    payload = bytes(range(256)) * 3
    f1 = mm.decode_media(payload, "image", fake=True)
    f2 = mm.decode_media(payload, "image", fake=True)
    assert f1 == f2
    assert len(f1) == 16
    assert sum(f1) == len(payload)


def test_features_shape_and_determinism(spark):
    a = mm.multimodal_features(spark, SF).collect()
    b = mm.multimodal_features(spark, SF).collect()
    assert a == b
    assert len(a) > 0
    # long form: 16 dims per doc, each normalized histogram sums to ~1
    by_doc: dict[int, list] = {}
    for r in a:
        assert r.n_bytes > 0
        by_doc.setdefault(r.doc_id, []).append(r)
    for doc_id, rows in list(by_doc.items())[:20]:
        assert sorted(r.dim for r in rows) == list(range(16))
        assert abs(sum(r.feature for r in rows) - 1.0) < 1e-9


def test_frame_sample_counts(spark):
    rows = mm.multimodal_frame_sample(spark, SF).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.frame_idx % 4 == 0
        assert 1 <= r.frame_bytes <= 256


def test_resize_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        mm.resize_media(b"\x89PNG", "image")


def test_thumbnails_deterministic(spark):
    a = mm.multimodal_thumbnails(spark, SF).collect()
    b = mm.multimodal_thumbnails(spark, SF).collect()
    assert a == b
    assert len(a) > 0
    for r in a:
        assert r.thumb_side == 8
        assert r.thumb_bytes == 64
        assert 0 <= r.thumb_checksum <= 64 * 255


def test_parse_media_header_golden_bytes():
    """Pin the header layouts against hand-written golden bytes, so the
    query's build+parse round trip cannot hide a consistent-but-wrong
    offset (both sides of the round trip would share the bug; these
    fixtures don't)."""
    import struct

    # 3x2 24-bit BMP, hand-assembled: BITMAPFILEHEADER (14) +
    # BITMAPINFOHEADER (40); row stride 3*3=9 padded to 12, 2 rows
    bmp = (
        b"BM" + struct.pack("<IHHI", 14 + 40 + 24, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 24, 0, 24, 2835, 2835, 0, 0)
        + bytes(24)
    )
    h = mm.parse_media_header(bmp)
    assert h == {
        "format": "bmp", "width": 3, "height": 2,
        "sample_rate": None, "channels": None, "bits": 24,
    }
    # top-down BMP stores negative height — parser reports magnitude
    bmp_td = bytearray(bmp)
    bmp_td[22:26] = struct.pack("<i", -2)
    assert mm.parse_media_header(bytes(bmp_td))["height"] == 2

    # canonical 8kHz stereo PCM16 WAV with 4 data bytes
    wav = (
        b"RIFF" + struct.pack("<I", 40) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 2, 8000, 32000, 4, 16)
        + b"data" + struct.pack("<I", 4) + bytes(4)
    )
    h = mm.parse_media_header(wav)
    assert h == {
        "format": "wav", "width": None, "height": None,
        "sample_rate": 8000, "channels": 2, "bits": 16,
    }
    # non-canonical WAV: a LIST chunk before fmt must still parse
    wav_list = (
        b"RIFF" + struct.pack("<I", 52) + b"WAVE"
        + b"LIST" + struct.pack("<I", 4) + b"INFO"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 44100, 88200, 2, 16)
        + b"data" + struct.pack("<I", 0)
    )
    assert mm.parse_media_header(wav_list)["sample_rate"] == 44100

    # binary PPM with a comment between tokens
    ppm = b"P6\n# a comment\n640 480\n255\n" + bytes(3)
    h = mm.parse_media_header(ppm)
    assert (h["format"], h["width"], h["height"], h["bits"]) == (
        "ppm", 640, 480, 8,
    )
    # 16-bit PPM: maxval >= 256 means 2 bytes per sample
    assert mm.parse_media_header(b"P6 4 2 65535 " + bytes(48))["bits"] == 16

    # undecodable: PNG magic, truncated BMP, garbage, magic not
    # followed by whitespace, maxval out of the spec range
    assert mm.parse_media_header(b"\x89PNG\r\n\x1a\n....") is None
    assert mm.parse_media_header(b"BM\x00\x00") is None
    assert mm.parse_media_header(b"garbage") is None
    assert mm.parse_media_header(b"P6123 456 255 ") is None
    assert mm.parse_media_header(b"P6 4 2 0 ") is None
    assert mm.parse_media_header(b"P6 4 2 70000 ") is None


def test_decode_media_real_header_path():
    """decode_media now REALLY decodes header-parsable containers and
    still raises (honest stub) for codec-requiring formats."""
    import struct

    wav = (
        b"RIFF" + struct.pack("<I", 36) + b"WAVE"
        + b"fmt " + struct.pack("<I", 16)
        + struct.pack("<HHIIHH", 1, 1, 16000, 32000, 2, 16)
        + b"data" + struct.pack("<I", 0)
    )
    assert mm.decode_media(wav, "audio")["sample_rate"] == 16000
    # PNG: real decode of a valid file, LOUD ValueError on a corrupt
    # one (data error, not env gate); JPEG stays honestly env-gated
    build, _ = mm._png_codec()
    png = build(2, 1, [[1, 2, 3, 4, 5, 6]], [0])
    dec = mm.decode_media(png, "image")
    assert dec["format"] == "png" and (dec["width"], dec["height"]) == (2, 1)
    assert dec["pixels"] == bytes([1, 2, 3, 4, 5, 6])
    with pytest.raises(ValueError):
        mm.decode_media(b"\x89PNG\r\n\x1a\n" + b"junk", "image")
    with pytest.raises(NotImplementedError):
        mm.decode_media(b"\xff\xd8\xff\xe0jfif", "image")


def test_header_decode_rollup(spark):
    """Every image/audio asset header-decodes and matches its metadata;
    video is honestly reported undecoded."""
    rows = {r["kind"]: r for r in mm.multimodal_header_decode(spark, SF).collect()}
    assert rows["image"]["n_decoded"] == rows["image"]["n_assets"]
    assert rows["image"]["n_meta_match"] == rows["image"]["n_assets"]
    assert rows["audio"]["n_meta_match"] == rows["audio"]["n_assets"]
    assert rows["audio"]["max_sample_rate"] == 16000
    assert rows["video"]["n_decoded"] == 0


# --------------------------------------------- PNG codec (round 11)


def test_png_decoder_spec_unfiltering():
    """Decode a PNG whose filtered scanlines are written BY HAND from
    the published filter definitions (PNG spec §9 / RFC 2083) — the
    decoder is tested independently of the builder's encode path."""
    import struct
    import zlib

    build, decode = mm._png_codec()

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # 2x2 RGB image, raw rows:
    #   row0: (10,20,30) (40,50,60)
    #   row1: (11,22,33) (44,55,66)
    # row0 uses Sub (filt = x - left):  10,20,30, 30,30,30
    # row1 uses Up  (filt = x - up):     1, 2, 3, 4, 5, 6
    raw = bytes([1, 10, 20, 30, 30, 30, 30, 2, 1, 2, 3, 4, 5, 6])
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    w, h, px = decode(png)
    assert (w, h) == (2, 2)
    assert px == bytes([10, 20, 30, 40, 50, 60, 11, 22, 33, 44, 55, 66])


def test_png_decoder_paeth_and_average():
    """Average and Paeth filters against hand-computed predictions."""
    import struct
    import zlib

    _b, decode = mm._png_codec()

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    # 2x2 RGB; row0 Average with no prior (pred = left//2):
    #   raw (8,10,12)(20,30,40) -> filt 8,10,12, 20-4,30-5,40-6
    # row1 Paeth: pred = paeth(left, up, upleft); first pixel pred=up
    #   raw (9,11,13)(25,35,45); paeth for 2nd px: a=9/11/13 (left),
    #   b=20/30/40 (up), c=8/10/12 (upleft) -> p=a+b-c=21/31/41,
    #   |p-a|=12/20/28, |p-b|=1/1/1, |p-c|=13/21/29 -> pred=b=20/30/40
    raw = bytes(
        [3, 8, 10, 12, 16, 25, 34]
        + [4, 9 - 8, 11 - 10, 13 - 12, 25 - 20, 35 - 30, 45 - 40]
    )
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    _w, _h, px = decode(png)
    assert px == bytes([8, 10, 12, 20, 30, 40, 9, 11, 13, 25, 35, 45])


def test_png_builder_golden_bytes_and_roundtrip():
    """Pin the builder's full output for a fixed image (keeps the
    encode path honest) and round-trip every filter type."""
    build, decode = mm._png_codec()
    w, h = 3, 5
    rows = [
        [(x * 7 + y * 13 + c * 5) % 256 for x in range(w) for c in range(3)]
        for y in range(h)
    ]
    png = build(w, h, rows, [0, 1, 2, 3, 4])
    assert png[:8] == b"\x89PNG\r\n\x1a\n"
    # IHDR golden: 3x5, depth 8, color type 2, non-interlaced + CRC
    # len=13, "IHDR", w=3, h=5, depth 8, type 2, 0/0/0, then CRC32
    assert png[8:33].hex() == (
        "0000000d49484452000000030000000508020000000f13c1f5"
    )
    dw, dh, px = decode(png)
    assert (dw, dh) == (w, h)
    assert px == b"".join(bytes(r) for r in rows)


def test_png_decoder_rejects_loudly():
    """Bad CRC, unsupported variants, truncation: ValueError, never a
    silent wrong answer."""
    build, decode = mm._png_codec()
    png = bytearray(build(2, 2, [[0] * 6, [0] * 6], [0, 0]))
    bad = bytearray(png)
    bad[20] ^= 0x01  # flip a bit inside IHDR body -> CRC mismatch
    with pytest.raises(ValueError, match="CRC"):
        decode(bytes(bad))
    with pytest.raises(ValueError, match="signature"):
        decode(b"not a png at all")
    with pytest.raises(ValueError, match="truncated|missing"):
        decode(bytes(png[: len(png) - 8]))
    # cut INSIDE a trailing CRC word (1-7 bytes short): still ValueError,
    # never a leaking struct.error
    with pytest.raises(ValueError, match="truncated"):
        decode(bytes(png[: len(png) - 2]))
    # 16-bit / interlaced variants must be rejected, not mis-decoded
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr16 = struct.pack(">IIBBBBB", 1, 1, 16, 2, 0, 0, 0)
    png16 = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr16)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 7)) + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="unsupported"):
        decode(png16)


def test_png_pixel_stats_rollup(spark):
    """Every image asset decodes; pixel totals match the arithmetic
    ground truth recomputed here in plain Python."""
    rows = mm.png_pixel_stats(spark, SF).collect()
    assert rows, "no image assets"
    got = {r["w"]: r for r in rows}
    import duckdb

    docs = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{SF}/documents.parquet')"
        " WHERE doc_id % 3 = 0"
    ).fetchall()
    exp: dict[int, list[int]] = {}
    for (did,) in docs:
        w = mm.PNG_W_BASE + did % mm.PNG_W_MOD
        h = mm.PNG_H_BASE + did % mm.PNG_H_MOD
        s = sum(
            (did * 31 + x * 7 + y * 13 + c * 5) % 256
            for x in range(w)
            for y in range(h)
            for c in range(3)
        )
        e = exp.setdefault(w, [0, 0, 0])
        e[0] += 1
        e[1] += w * h * 3
        e[2] += s
    for w, (n, npx, psum) in exp.items():
        r = got[w]
        assert r["n_images"] == n
        assert r["n_decoded"] == n  # every PNG must really decode
        assert r["n_px_total"] == npx
        assert r["pixel_sum"] == psum


def test_jpeg_block_constant_round_trip_exact():
    """DC-exact construction: per-8x8-block-constant gray images with
    DC quant step 8 must round-trip bit-exactly (the property the
    jpeg_pixel_stats oracle depends on)."""
    build, decode = mm._jpeg_codec()
    for did in (0, 1, 7, 23, 255):
        bw = 1 + (did // 3) % mm.JPEG_BW_MOD
        bh = 1 + (did // 3) % mm.JPEG_BH_MOD
        w, h = bw * 8, bh * 8
        pixels = [
            (did * 31 + (x // 8) * 7 + (y // 8) * 13) % 256
            for y in range(h)
            for x in range(w)
        ]
        dw, dh, px = decode(build(w, h, pixels, mm.JPEG_QTABLE))
        assert (dw, dh) == (w, h)
        assert px == bytes(pixels)


def test_jpeg_gradient_ac_path_pinned():
    """Non-constant image: exercises magnitude categories, run/size AC
    codes, EOB, DC prediction with sign changes.  Decoded pixels are
    pinned (determinism) and bounded by the quantization error."""
    build, decode = mm._jpeg_codec()
    w = h = 16
    grad = [(3 * x + 5 * y + (x * y) // 4) % 256 for y in range(h) for x in range(w)]
    dw, dh, px = decode(build(w, h, grad, mm.JPEG_QTABLE))
    assert (dw, dh) == (w, h)
    err = max(abs(a - b) for a, b in zip(px, grad))
    assert err <= 8  # AC step 16 -> per-coefficient error <= 8
    assert sum(px) == 18959  # golden: any codec change must re-derive


def test_jpeg_zrl_long_zero_runs():
    """A single hot pixel per block yields >15-zero AC runs — the ZRL
    (0xF0) encode/decode path must agree with itself."""
    build, decode = mm._jpeg_codec()
    w = h = 8
    img = [0] * 64
    img[63] = 255  # bottom-right: last zigzag positions, max run
    dw, dh, px = decode(build(w, h, img, mm.JPEG_QTABLE))
    assert (dw, dh) == (w, h)
    # lossy, but the hot corner must stay the brightest pixel
    assert max(px) == px[63] or px[63] >= 128


def test_jpeg_error_contracts():
    """Truncation / garbage / non-baseline input is a loud ValueError,
    never a silent wrong answer (the decode_media discipline)."""
    import pytest

    build, decode = mm._jpeg_codec()
    data = build(8, 8, list(range(64)), mm.JPEG_QTABLE)
    with pytest.raises(ValueError):
        decode(b"\x00\x01\x02")
    with pytest.raises(ValueError):
        decode(data[:40])
    with pytest.raises(ValueError):
        decode(data[:-2])  # EOI stripped
    with pytest.raises(ValueError):
        build(9, 8, [0] * 72, mm.JPEG_QTABLE)  # non-multiple-of-8
