"""Real stdlib media decoding in the multimodal plumbing: handcrafted
PNG/GIF/JPEG/PPM headers and a genuine WAV (written by the `wave`
module) must decode to their true dimensions/frames; unknown payloads
keep the clearly-marked deterministic fake; stub=False raises for
codec-requiring payloads."""

import io
import struct
import wave

import pytest

from zentity_spark.extras import decode_media_batches, sniff_decode


def png(w, h):
    return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
            + struct.pack(">II", w, h) + b"\x08\x02\x00\x00\x00" + b"\x00" * 16)


def gif(w, h):
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 16


def jpeg(w, h):
    # SOI, APP0 (len 16), SOF0 (len 11: precision + h + w + 1 component)
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
    sof0 = b"\xff\xc0" + struct.pack(">H", 11) + b"\x08" + struct.pack(">HH", h, w) + b"\x01\x11\x00"
    return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"


def ppm(w, h):
    return (f"P6\n# comment\n{w} {h}\n255\n".encode()
            + bytes(range(min(w * h * 3, 32))))


def wav(rate, channels, frames):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(channels)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(b"\x10\x00" * frames * channels)
    return buf.getvalue()


def test_sniff_decode_real_formats():
    assert sniff_decode(png(640, 480))[:3] == (640, 480, 1)
    assert sniff_decode(gif(320, 200))[:3] == (320, 200, 1)
    assert sniff_decode(jpeg(800, 600))[:3] == (800, 600, 1)
    assert sniff_decode(ppm(12, 7))[:3] == (12, 7, 1)
    w, c, nf, feats = sniff_decode(wav(16000, 2, 100))
    assert (w, c, nf) == (16000, 2, 100)
    assert len(feats) == 8 and all(-1.0 <= f <= 1.0 for f in feats)
    assert sniff_decode(b"just some text payload") is None
    assert sniff_decode(b"P6 garbage") is None  # non-integer dims -> not PPM


def test_decode_media_batches_mixed(spark):
    rows = [
        (0, "image", png(640, 480), "{}"),
        (1, "image", gif(320, 200), "{}"),
        (2, "image", jpeg(800, 600), "{}"),
        (3, "image", ppm(12, 7), "{}"),
        (4, "audio", wav(16000, 2, 100), "{}"),
        (5, "image", b"opaque-needs-codec", "{}"),
        (6, "image", None, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta string"
    )
    got = {r["media_id"]: r for r in decode_media_batches(df).collect()}
    assert (got[0]["width"], got[0]["height"]) == (640, 480)
    assert (got[1]["width"], got[1]["height"]) == (320, 200)
    assert (got[2]["width"], got[2]["height"]) == (800, 600)
    assert (got[3]["width"], got[3]["height"]) == (12, 7)
    assert (got[4]["width"], got[4]["height"], got[4]["n_frames"]) == (16000, 2, 100)
    # unknown format: deterministic fake dims from payload length
    n = len(b"opaque-needs-codec")
    assert (got[5]["width"], got[5]["height"]) == ((n % 64) * 16 + 16, (n % 48) * 16 + 16)
    assert (got[6]["width"], got[6]["height"]) == (0, 0)
    # honesty flag: stdlib-decoded payloads are decoded_real; the
    # codec-fallback fake and the null payload are not
    assert all(got[i]["decoded_real"] for i in range(5))
    assert not got[5]["decoded_real"] and not got[6]["decoded_real"]


def test_stub_false_raises_for_codec_payloads(spark):
    df = spark.createDataFrame(
        [(0, "video", b"\x00\x00\x00 ftypisom-needs-ffmpeg", "{}")],
        "media_id long, kind string, payload binary, meta string",
    )
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import PythonException

    with pytest.raises((PythonException, Py4JJavaError)):
        decode_media_batches(df, stub=False).collect()


# ---------------------------------------------------------------------
# resize_media: real nearest-neighbor over PNM rasters, byte-sampled
# deterministic fake otherwise

def pgm_raster(w, h, maxval=255):
    """P5 with a full raster: pixel (y, x) = (y * w + x) % (maxval+1)."""
    raster = bytes((y * w + x) % (maxval + 1) for y in range(h) for x in range(w))
    return f"P5\n{w} {h}\n{maxval}\n".encode() + raster, raster


def ppm_raster(w, h):
    """P6 with a full RGB raster: channel c of (y, x) = (y*w + x + c) % 256."""
    raster = bytes(
        (y * w + x + c) % 256 for y in range(h) for x in range(w) for c in range(3)
    )
    return b"P6\n" + f"{w} {h}\n255\n".encode() + raster, raster


def test_resize_media_real_pnm(spark):
    import numpy as np

    from zentity_spark.extras import resize_media

    w, h, ow, oh = 10, 6, 4, 4
    p5, ras5 = pgm_raster(w, h)
    p6, ras6 = ppm_raster(w, h)
    df = spark.createDataFrame(
        [(0, "image", p5, "{}"), (1, "image", p6, "{}")],
        "media_id long, kind string, payload binary, meta string",
    )
    got = {r["media_id"]: r for r in resize_media(df, ow, oh).collect()}

    # numpy reference: nearest-neighbor with floor index mapping
    g5 = np.frombuffer(ras5, dtype=np.uint8).reshape(h, w)
    g6 = np.frombuffer(ras6, dtype=np.uint8).reshape(h, w, 3).mean(axis=2)
    for mid, ref in ((0, g5), (1, g6)):
        r = got[mid]
        assert r["resized_real"] and (r["src_width"], r["src_height"]) == (w, h)
        assert (r["width"], r["height"]) == (ow, oh)
        exp = [
            ref[(y * h) // oh, (x * w) // ow] / 255.0
            for y in range(oh) for x in range(ow)
        ]
        assert r["pixels"] == pytest.approx(exp, abs=1e-12)


def test_resize_media_fake_and_edges(spark):
    from zentity_spark.extras import resize_media

    payload = b"opaque bytes that need a codec to resize properly"
    df = spark.createDataFrame(
        [
            (0, "image", png(640, 480), "{}"),   # header-only: real dims, fake pixels
            (1, "image", payload, "{}"),          # unknown: fake dims + pixels
            (2, "image", None, "{}"),             # null payload
            (3, "image", b"P5\n4 4\n255\n\x01", "{}"),  # truncated raster -> fake
            (4, "image", b"", "{}"),               # empty payload: fake dims
            (5, "image", b"P5\n2 2\n65535\n" + b"\x00" * 8, "{}"),  # 16-bit PNM
        ],
        "media_id long, kind string, payload binary, meta string",
    )
    got = {r["media_id"]: r for r in resize_media(df, 4, 4).collect()}
    assert (got[0]["src_width"], got[0]["src_height"]) == (640, 480)
    assert not got[0]["resized_real"]
    n = len(payload)
    assert (got[1]["src_width"], got[1]["src_height"]) == (
        (n % 64) * 16 + 16, (n % 48) * 16 + 16)
    exp = [payload[(k * n) // 16] / 255.0 for k in range(16)]
    assert got[1]["pixels"] == pytest.approx(exp)
    assert got[2]["pixels"] == [0.0] * 16 and (got[2]["src_width"], got[2]["src_height"]) == (0, 0)
    assert not got[3]["resized_real"]  # raster shorter than w*h -> fallback
    # empty payload mirrors decode_media_batches' fake dims, not 0x0
    assert (got[4]["src_width"], got[4]["src_height"]) == (16, 16)
    assert got[4]["pixels"] == [0.0] * 16
    # 2-byte-sample PNM: header parses (sniff dims) but raster isn't
    # byte-per-sample -> must NOT claim a real resize
    assert not got[5]["resized_real"]
    assert all(len(r["pixels"]) == 16 for r in got.values())


def test_sample_frames_real_wav(spark):
    from zentity_spark.extras import sample_frames

    # 2-channel 16-bit WAV where frame f's first-channel sample = f
    nf, nch = 100, 2
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(nch)
        wf.setsampwidth(2)
        wf.setframerate(8000)
        wf.writeframes(b"".join(
            struct.pack("<hh", f, -f) for f in range(nf)))
    df = spark.createDataFrame(
        [(0, "audio", buf.getvalue(), "{}")],
        "media_id long, kind string, payload binary, meta string",
    )
    r = sample_frames(df, n_samples=8).collect()[0]
    assert r["sampled_real"] and r["n_frames"] == nf
    idxs = [(k * nf) // 8 for k in range(8)]
    assert list(r["frame_idx"]) == idxs
    assert r["samples"] == pytest.approx([f / 32768.0 for f in idxs])


def test_sample_frames_fake_byte_axis(spark):
    from zentity_spark.extras import sample_frames

    payload = bytes(range(200, 256)) * 2  # 112 "frames"
    df = spark.createDataFrame(
        [(0, "video", payload, "{}"), (1, "video", None, "{}")],
        "media_id long, kind string, payload binary, meta string",
    )
    got = {r["media_id"]: r for r in sample_frames(df, 8).collect()}
    n = len(payload)
    assert got[0]["n_frames"] == n and not got[0]["sampled_real"]
    idxs = [(k * n) // 8 for k in range(8)]
    assert list(got[0]["frame_idx"]) == idxs
    assert got[0]["samples"] == pytest.approx([payload[i] / 255.0 for i in idxs])
    assert got[1]["n_frames"] == 0 and list(got[1]["frame_idx"]) == []


def test_sample_frames_8bit_wav_unsigned(spark):
    from zentity_spark.extras import sample_frames, sniff_decode

    # 8-bit PCM stores UNSIGNED bytes with silence at 0x80: digital
    # silence must normalize to 0.0, full-scale 0xFF to ~+0.996
    nf = 16
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(1)
        wf.setframerate(8000)
        wf.writeframes(b"\x80" * (nf - 1) + b"\xff")
    payload = buf.getvalue()
    df = spark.createDataFrame(
        [(0, "audio", payload, "{}")],
        "media_id long, kind string, payload binary, meta string",
    )
    r = sample_frames(df, n_samples=4).collect()[0]
    assert r["sampled_real"] and r["n_frames"] == nf
    assert r["samples"][:3] == pytest.approx([0.0, 0.0, 0.0])
    # decode feature path uses the same recentering
    *_, feats = sniff_decode(payload)
    assert feats[0] == pytest.approx(0.0)
