"""Golden-byte tests for the dependency-free REAL media decode path
(``operators/multimodal.py`` backend='builtin'): hand-constructed PPM /
PGM images and a stdlib-generated WAV with known contents must decode
to exact features through the full Spark mapInPandas plumbing.
"""

import io
import math
import struct
import wave

from broadway_spark.operators.multimodal import (
    _builtin_feature,
    attach_media,
    featurize,
)


def _ppm(w, h, rgb_rows):
    header = f"P6\n# golden fixture\n{w} {h}\n255\n".encode()
    body = bytes(v for row in rgb_rows for px in row for v in px)
    return header + body


def _pgm(w, h, gray_rows):
    header = f"P5\n{w} {h}\n255\n".encode()
    body = bytes(v for row in gray_rows for v in row)
    return header + body


def _wav(rate=8000, freq=440.0, seconds=0.25, amp=12000):
    n = int(rate * seconds)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wf:
        wf.setnchannels(1)
        wf.setsampwidth(2)
        wf.setframerate(rate)
        wf.writeframes(
            b"".join(
                struct.pack(
                    "<h", int(amp * math.sin(2 * math.pi * freq * i / rate))
                )
                for i in range(n)
            )
        )
    return buf.getvalue()


def test_builtin_ppm_decode_exact():
    # 2x2 RGB: red, green / blue, white
    data = _ppm(
        2,
        2,
        [
            [(255, 0, 0), (0, 255, 0)],
            [(0, 0, 255), (255, 255, 255)],
        ],
    )
    feat = _builtin_feature(data)
    # kind=1 (image), w=2, h=2, ch=3, means per channel, maxval
    assert feat == [1.0, 2.0, 2.0, 3.0, 127.5, 127.5, 127.5, 255.0]


def test_builtin_pgm_decode_exact():
    data = _pgm(3, 1, [[0, 128, 255]])
    feat = _builtin_feature(data)
    assert feat == [1.0, 3.0, 1.0, 1.0, round((0 + 128 + 255) / 3, 4), 0.0, 0.0, 255.0]


def test_builtin_wav_decode():
    data = _wav()
    feat = _builtin_feature(data)
    assert feat is not None
    kind, nch, rate, nframes, duration, rms = feat[:6]
    assert (kind, nch, rate, nframes) == (2.0, 1.0, 8000.0, 2000.0)
    assert duration == 0.25
    # sine RMS = amp/sqrt(2) ± quantization
    assert abs(rms - 12000 / math.sqrt(2)) < 60


def test_builtin_rejects_garbage():
    assert _builtin_feature(b"\x00\x01\x02 not media") is None
    assert _builtin_feature(b"P6\n2 2\n255\n\x00") is None  # truncated


def test_featurize_builtin_through_spark(spark):
    rows = [
        ("img1", _ppm(2, 2, [[(255, 0, 0), (0, 255, 0)], [(0, 0, 255), (255, 255, 255)]])),
        ("img2", _pgm(3, 1, [[0, 128, 255]])),
        ("aud1", _wav()),
        ("junk", b"not media at all"),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    df = attach_media(df, "content", "mixed")
    out = featurize(df, "content", backend="builtin")
    got = {r["media_id"]: r["feature"] for r in out.collect()}
    assert got["img1"][:4] == [1.0, 2.0, 2.0, 3.0]
    assert got["img2"][:4] == [1.0, 3.0, 1.0, 1.0]
    assert got["aud1"][0] == 2.0
    assert got["junk"] is None
    # metadata computed JVM-side regardless of backend
    meta = {r["media_id"]: r["byte_len"] for r in out.collect()}
    assert meta["img2"] == len(_pgm(3, 1, [[0, 128, 255]]))


def test_resize_nearest_neighbor_exact():
    from broadway_spark.operators.multimodal import _resize_netpbm, _parse_netpbm

    # 2x2 → 4x4: each source pixel becomes a 2x2 block
    src = _ppm(2, 2, [[(10, 0, 0), (0, 20, 0)], [(0, 0, 30), (40, 40, 40)]])
    out = _resize_netpbm(src, 4, 4)
    w, h, ch, maxval, px = _parse_netpbm(out)
    assert (w, h, ch) == (4, 4, 3)
    def pix(x, y):
        off = (y * 4 + x) * 3
        return tuple(px[off : off + 3])
    assert pix(0, 0) == pix(1, 1) == (10, 0, 0)
    assert pix(2, 0) == pix(3, 1) == (0, 20, 0)
    assert pix(0, 2) == pix(1, 3) == (0, 0, 30)
    assert pix(2, 2) == pix(3, 3) == (40, 40, 40)
    # downscale back 4x4 → 2x2 reproduces the original pixels
    back = _resize_netpbm(out, 2, 2)
    assert _parse_netpbm(back)[4] == _parse_netpbm(src)[4]
    assert _resize_netpbm(b"garbage", 2, 2) is None


def test_resize_composes_with_featurize_in_spark(spark):
    from broadway_spark.operators.multimodal import resize

    rows = [
        ("img1", _ppm(4, 4, [[(100, 0, 0)] * 4] * 4)),
        ("junk", b"not an image"),
    ]
    df = spark.createDataFrame(rows, "media_id string, content binary")
    resized = resize(df, "content", 2, 2)
    out = featurize(resized, "content_resized", backend="builtin")
    got = {r["media_id"]: r["feature"] for r in out.collect()}
    # resized 2x2 solid red: means (100, 0, 0)
    assert got["img1"] == [1.0, 2.0, 2.0, 3.0, 100.0, 0.0, 0.0, 255.0]
    assert got["junk"] is None
