"""Real stdlib media codecs (BMP / PPM / PNG / WAV): golden-byte
parses, writer↔parser independence, cross-format agreement, and the
scoped NotImplementedError for formats that genuinely need external
libs."""

from __future__ import annotations

import struct

import pytest

from spark_streaming_with_debezium_spark.llm.multimodal import (
    _make_bmp,
    _make_png,
    _make_ppm,
    _make_wav,
    _parse_bmp,
    _parse_png,
    _parse_ppm,
    _parse_wav,
    decode_media,
    synthesize_media,
)


def _golden_bmp() -> bytes:
    """Hand-assembled 2×2 24-bit BMP with hand-computed channel sums:
    pixels (x,y)→RGB: (0,0)=(255,0,0) (1,0)=(0,255,0)
                      (0,1)=(0,0,255) (1,1)=(10,20,30).
    Bottom-up storage ⇒ row y=1 first; row size 6 pads to 8."""
    row_y1 = bytes((255, 0, 0)) + bytes((30, 20, 10)) + b"\x00\x00"  # BGR!
    row_y0 = bytes((0, 0, 255)) + bytes((0, 255, 0)) + b"\x00\x00"
    data = row_y1 + row_y0
    header = struct.pack("<2sIHHI", b"BM", 54 + len(data), 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, 2, 2, 1, 24, 0, len(data), 0, 0, 0, 0)
    return header + info + data


def test_bmp_golden_bytes():
    w, h, sr, sg, sb = _parse_bmp(_golden_bmp())
    assert (w, h) == (2, 2)
    assert (sr, sg, sb) == (255 + 10, 255 + 20, 255 + 30)


def test_wav_stdlib_writer_vs_manual_parser():
    """The stdlib ``wave`` writer and our manual RIFF-chunk parser are
    independent implementations — round-tripping through both checks
    each against the other, including a stereo layout."""
    import io
    import wave as wavemod

    samples = [0, 1000, -1000, 32767, -32768, 7]
    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as wf:
        wf.setnchannels(2)
        wf.setsampwidth(2)
        wf.setframerate(44100)
        wf.writeframes(struct.pack("<6h", *samples))
    n_ch, rate, n_frames, sum_abs = _parse_wav(buf.getvalue())
    assert (n_ch, rate, n_frames) == (2, 44100, 3)
    assert sum_abs == sum(abs(s) for s in samples)


def test_ppm_comment_and_header_tokenizer():
    ppm = b"P6\n# a comment line\n2 1\n255\n" + bytes((1, 2, 3, 4, 5, 6))
    assert _parse_ppm(ppm) == (2, 1, 1 + 4, 2 + 5, 3 + 6)


@pytest.mark.parametrize("doc_id", [0, 7, 123, 4567])
def test_bmp_and_ppm_decoders_agree(doc_id):
    """Same deterministic pixels through two different containers (and
    two different parsers — padding/bottom-up vs raw/top-down) must
    produce identical statistics."""
    assert _parse_bmp(_make_bmp(doc_id)) == _parse_ppm(_make_ppm(doc_id))


@pytest.mark.parametrize("doc_id", [0, 8, 9999])
def test_wav_maker_closed_form(doc_id):
    n = 8 + doc_id % 9
    expected = sum(
        abs(((doc_id * 17 + i * 29) % 65536) - 32768) for i in range(n)
    )
    assert _parse_wav(_make_wav(doc_id)) == (1, 8000, n, expected)


def test_decode_media_real_mixed_formats(spark):
    """decode_media(fake=False) — the production path — sniffs and
    decodes a MIXED corpus of real BMP/PPM/WAV payloads in one pass."""
    rows = [
        (1, bytearray(_make_bmp(1))),
        (2, bytearray(_make_ppm(2))),
        (3, bytearray(_make_wav(3))),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r.asDict() for r in decode_media(df, fake=False).collect()}
    assert got[1]["mime"] == "image/bmp" and got[1]["width"] == 4 + 1 % 5
    assert got[2]["mime"] == "image/x-portable-pixmap"
    assert (got[1]["sum_r"] is not None) and (got[1]["sum_abs_amp"] is None)
    assert got[3]["mime"] == "audio/wav" and got[3]["sample_rate"] == 8000
    assert got[3]["width"] is None and got[3]["sum_abs_amp"] is not None


def test_decode_media_unknown_format_scoped_error(spark):
    """Formats needing external codecs still raise — but ONLY those
    (PNG moved OUT of this class when the zlib decoder landed, so the
    probe payload is now a JPEG SOI marker)."""
    jpeg_magic = bytearray(b"\xff\xd8\xff\xe0" + b"\x00" * 16)
    df = spark.createDataFrame(
        [(1, jpeg_magic)], "doc_id bigint, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|not decodable"):
        decode_media(df, fake=False).collect()


def test_synthesize_media_is_deterministic(spark):
    docs = spark.createDataFrame([(5,), (6,)], "doc_id bigint")
    a = {r["doc_id"]: bytes(r["payload"])
         for r in synthesize_media(docs, "bmp").collect()}
    assert a[5] == _make_bmp(5) and a[6] == _make_bmp(6)


@pytest.mark.parametrize("doc_id", [0, 7, 123, 4567])
def test_png_agrees_with_bmp_and_ppm(doc_id):
    """The compressed container must decode to the same statistics as
    the two uncompressed ones — through zlib, CRC checks, and filter
    reconstruction."""
    assert _parse_png(_make_png(doc_id)) == _parse_bmp(_make_bmp(doc_id))


def test_png_all_filter_types_exercised_and_reversed():
    """doc_id % 4 == 3 gives height 6 ⇒ scanline filters 0,1,2,3,4,0 —
    every PNG filter type applied at encode and reconstructed at
    decode. Closed-form sums double-check the reconstruction."""
    doc_id = 3  # w=7, h=6
    w, h = 4 + doc_id % 5, 3 + doc_id % 4
    assert h == 6
    exp_r = sum((doc_id * 7 + 13 * x + 31 * y) % 256
                for x in range(w) for y in range(h))
    got = _parse_png(_make_png(doc_id))
    assert got[0] == w and got[1] == h and got[2] == exp_r


def test_png_crc_corruption_rejected():
    b = bytearray(_make_png(11))
    b[-5] ^= 0xFF  # flip a bit inside IEND's CRC
    with pytest.raises(ValueError, match="CRC mismatch"):
        _parse_png(bytes(b))


def test_png_golden_bytes():
    """Hand-assembled 2×1 PNG (filter type 0, stored pixels
    (1,2,3),(4,5,6)) parsed to hand-computed sums — independent of the
    synthesizer."""
    import zlib as z

    ihdr = struct.pack(">IIBBBBB", 2, 1, 8, 2, 0, 0, 0)
    raw = bytes([0, 1, 2, 3, 4, 5, 6])  # filter byte + 2 RGB pixels

    def chunk(typ, data):
        return (len(data).to_bytes(4, "big") + typ + data
                + (z.crc32(typ + data) & 0xFFFFFFFF).to_bytes(4, "big"))

    png = (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
           + chunk(b"IDAT", z.compress(raw)) + chunk(b"IEND", b""))
    assert _parse_png(png) == (2, 1, 1 + 4, 2 + 5, 3 + 6)


def test_decode_media_png_mixed_in(spark):
    """PNG payloads route through the real decoder inside the Arrow
    batch path alongside the other formats."""
    rows = [(1, bytearray(_make_png(1))), (2, bytearray(_make_bmp(1)))]
    df = spark.createDataFrame(rows, "doc_id bigint, payload binary")
    got = {r["doc_id"]: r.asDict() for r in decode_media(df, fake=False).collect()}
    assert got[1]["mime"] == "image/png"
    assert got[2]["mime"] == "image/bmp"
    for k in ("width", "height", "sum_r", "sum_g", "sum_b"):
        assert got[1][k] == got[2][k]


def test_wav_sample_list_matches_closed_form():
    """The raw-sample RIFF walk behind audio_features must reproduce
    the synthesizer's closed-form samples exactly, including for
    doc_ids whose samples straddle the sign boundary (zero-crossing
    territory)."""
    from spark_streaming_with_debezium_spark.llm.multimodal import (
        _make_wav,
        _wav_sample_list,
    )

    for d in (3, 1928, 7777):
        n = 8 + d % 9
        expected = [((d * 17 + i * 29) % 65536) - 32768 for i in range(n)]
        n_ch, rate, samples = _wav_sample_list(_make_wav(d))
        assert (n_ch, rate) == (1, 8000)
        assert samples == expected


def test_bmp_pixel_grid_matches_closed_form():
    """The top-down grid parser behind image_features must reproduce
    the synthesizer's closed-form pixels exactly (bottom-up storage,
    row padding, BGR order all reversed correctly)."""
    from spark_streaming_with_debezium_spark.llm.multimodal import (
        _bmp_pixel_grid,
        _make_bmp,
    )

    for d in (0, 7, 123, 4567):
        w, h, grid = _bmp_pixel_grid(_make_bmp(d))
        assert (w, h) == (4 + d % 5, 3 + d % 4)
        for y in range(h):
            for x in range(w):
                assert grid[y][x] == (
                    (d * 7 + 13 * x + 31 * y) % 256,
                    (d * 11 + 17 * x + 5 * y) % 256,
                    (d * 3 + 7 * x + 19 * y) % 256,
                )
