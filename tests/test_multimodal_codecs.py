"""Real stdlib media codecs (BMP / PPM / WAV): golden-byte parses,
writer↔parser independence, cross-format agreement, and the scoped
NotImplementedError for formats that genuinely need external libs."""

from __future__ import annotations

import struct

import pytest

from spark_streaming_with_debezium_spark.llm.multimodal import (
    _make_bmp,
    _make_ppm,
    _make_wav,
    _parse_bmp,
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
    """Formats needing external codecs still raise — but ONLY those."""
    png_magic = bytearray(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)
    df = spark.createDataFrame(
        [(1, png_magic)], "doc_id bigint, payload binary"
    )
    with pytest.raises(Exception, match="NotImplementedError|not decodable"):
        decode_media(df, fake=False).collect()


def test_synthesize_media_is_deterministic(spark):
    docs = spark.createDataFrame([(5,), (6,)], "doc_id bigint")
    a = {r["doc_id"]: bytes(r["payload"])
         for r in synthesize_media(docs, "bmp").collect()}
    assert a[5] == _make_bmp(5) and a[6] == _make_bmp(6)
