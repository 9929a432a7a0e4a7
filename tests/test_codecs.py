"""Pure-stdlib image codec tests (functions/codecs.py) + the k13
multimodal decode contract over the real fixture."""

from __future__ import annotations

import random

import pytest

from glonassdatamining_spark.functions import codecs as C


def test_ppm_roundtrip_exact():
    rng = random.Random(5)
    for w, h in [(1, 1), (8, 4), (13, 7)]:
        px = bytes(rng.randrange(256) for _ in range(3 * w * h))
        f = C.decode_ppm(C.encode_ppm(w, h, px))
        assert f["width"] == w and f["height"] == h and f["maxval"] == 255
        assert f["mean_r"] == pytest.approx(sum(px[0::3]) / (w * h))
        assert f["mean_g"] == pytest.approx(sum(px[1::3]) / (w * h))
        assert f["mean_b"] == pytest.approx(sum(px[2::3]) / (w * h))


def test_ppm_header_grammar():
    # comments + arbitrary whitespace are legal netpbm headers
    px = bytes(range(12))
    data = b"P6 # a comment\n# another\n 2\t2 \n255\n" + px
    f = C.decode_ppm(data)
    assert f and f["width"] == 2 and f["height"] == 2


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"P5\n1 1\n255\n\x00",             # wrong magic
        b"P6\n2 2\n255\n\x00\x00",          # truncated body
        b"P6\n0 2\n255\n",                  # zero width
        b"P6\n2 2\n70000\n" + b"\x00" * 12,  # 2-byte maxval unsupported
        b"P6\nx y\n255\n" + b"\x00" * 12,    # non-numeric
    ],
)
def test_ppm_malformed_returns_none(bad):
    assert C.decode_ppm(bad) is None


def test_bmp_roundtrip_channel_means():
    rng = random.Random(9)
    for w, h in [(1, 1), (5, 3), (4, 4)]:  # 5 → stride padding path
        px = bytes(rng.randrange(256) for _ in range(3 * w * h))
        f = C.decode_bmp(C.encode_bmp(w, h, px))
        assert f["width"] == w and f["height"] == h
        # encode takes BGR rows: channel 0 is blue
        assert f["mean_b"] == pytest.approx(sum(px[0::3]) / (w * h))
        assert f["mean_r"] == pytest.approx(sum(px[2::3]) / (w * h))


def test_bmp_malformed_returns_none():
    assert C.decode_bmp(b"") is None
    assert C.decode_bmp(b"BM" + b"\x00" * 60) is None  # bpp 0
    ok = C.encode_bmp(2, 2, bytes(12))
    assert C.decode_bmp(ok[:30]) is None  # truncated


def test_k13_decodes_genuine_ppm_bytes(spark):
    """Driver-shaped run of k13: every fixture document becomes a real
    P6 image whose decoded features must match a python-side re-read
    of the same payload construction."""
    from glonassdatamining_spark import registry
    from glonassdatamining_spark.operators.llm_ops import _PPM_H, _PPM_W
    from glonassdatamining_spark.sources import load
    from tests.conftest import SF_DIR

    out = {
        r.doc_id: r
        for r in registry.get("k13_multimodal_decode")
        .builder(spark, SF_DIR)
        .collect()
    }
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text").collect()
    assert len(out) == len(docs) > 0
    px = 3 * _PPM_W * _PPM_H
    for d in docs[:50]:
        body = (d.text.encode("utf-8") + b" " * px)[:px]
        exp = C.decode_ppm(C.encode_ppm(_PPM_W, _PPM_H, body))
        got = out[d.doc_id]
        assert (got.width, got.height, got.maxval) == (_PPM_W, _PPM_H, 255)
        assert got.mean_r == pytest.approx(exp["mean_r"])
        assert got.mean_g == pytest.approx(exp["mean_g"])
        assert got.mean_b == pytest.approx(exp["mean_b"])


def test_ppm_magic_requires_separator():
    """Code-review r4 finding: 'P63 4…' must NOT parse as a 3-wide
    image — the magic must be exactly P6 + whitespace/comment."""
    assert C.decode_ppm(b"P63 4\n255\n" + b"\x00" * 36) is None
    assert C.decode_ppm(b"P6#c\n3 4 255\n" + b"\x00" * 36) is not None


def test_wav_roundtrip_exact():
    """encode_wav → decode_wav is exact for 16-bit mono PCM, and the
    decoded features match hand-computed values."""
    samples = [1200, -1200] * 500 + [300]
    feats = C.decode_wav(C.encode_wav(samples, framerate=16000))
    assert feats == {
        "n_samples": 1001,
        "sample_rate": 16000,
        "duration_ms": 1001 * 1000 // 16000,
        "peak": 1200,
        "mean_abs": (1200 * 1000 + 300) / 1001,
    }


def test_wav_is_a_real_riff_file():
    """The payload is a genuine RIFF/WAVE container, not a pickled
    fake: magic, chunk ids, and the fmt fields are all in place."""
    b = C.encode_wav([0, 1, -1], framerate=8000)
    assert b[:4] == b"RIFF" and b[8:12] == b"WAVE"
    assert b"fmt " in b and b"data" in b
    import struct

    # fmt chunk: PCM (1), mono (1), 8000 Hz, 16-bit
    i = b.index(b"fmt ") + 8
    fmt, ch, rate = struct.unpack_from("<HHI", b, i)
    assert (fmt, ch, rate) == (1, 1, 8000)


def test_wav_malformed_degrades_to_none():
    b = C.encode_wav([5, -5] * 10)
    assert C.decode_wav(b"") is None
    assert C.decode_wav(b"RIFFjunk") is None
    assert C.decode_wav(b[: len(b) // 2]) is None  # truncated frames → short read
    # stereo / wrong width rejected (the import-try seam's contract)
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(8000)
        w.writeframes(b"\x00" * 8)
    assert C.decode_wav(buf.getvalue()) is None


def test_y4m_roundtrip_and_header_grammar():
    """encode_y4m → decode_y4m is exact; the parser honors the real
    tag grammar (order-independent tags, fps ratio) and rejects
    non-4:4:4 chroma (the import-try seam's contract)."""
    fr = [bytes(range(36)) + bytes([128] * 72), bytes([7] * 108)]
    v = C.decode_y4m(C.encode_y4m(6, 6, fr, fps=30))
    assert (v["width"], v["height"], v["fps"], v["n_frames"]) == (6, 6, 30, 2)
    assert v["luma_means"][0] == sum(range(36)) / 36
    assert v["luma_means"][1] == 7.0
    # reordered tags still parse; C420 refused
    assert C.decode_y4m(b"YUV4MPEG2 C444 H1 W2 F25:1\nFRAME\n" + b"\x05" * 6)[
        "luma_means"
    ] == [5.0]
    assert C.decode_y4m(b"YUV4MPEG2 W2 H1 F25:1 C420jpeg\nFRAME\n" + b"\x05" * 3) is None


def test_y4m_malformed_degrades_to_none():
    b = C.encode_y4m(4, 3, [bytes([9] * 36)])
    assert C.decode_y4m(b[:-1]) is None          # truncated frame
    assert C.decode_y4m(b"YUV4MPEG2 W0 H3 C444\n") is None
    assert C.decode_y4m(b.replace(b"FRAME", b"FRAMX")) is None
    assert C.decode_y4m(b"MPEG") is None
