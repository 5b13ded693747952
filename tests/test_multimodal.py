"""Multimodal plumbing: schema contract, Arrow-batched featurization,
frame-sampling plan. Decode itself is a documented stub (no codecs in the
test container) — these tests pin the distributed mechanics."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_lakehouse_project_spark.ext import multimodal as mm


def test_synthetic_media_schema(spark):
    df = mm.synthetic_media(spark, n=12)
    assert df.schema == mm.MEDIA_SCHEMA
    assert df.count() == 12


def test_extract_features_deterministic(spark):
    df = mm.synthetic_media(spark, n=12)
    out1 = {r.media_id: (r.content_sha256, tuple(r.features)) for r in mm.extract_features(df).collect()}
    out2 = {r.media_id: (r.content_sha256, tuple(r.features)) for r in mm.extract_features(df).collect()}
    assert out1 == out2  # stub decode is deterministic
    assert all(len(v[1]) == 8 for v in out1.values())
    assert all(0.0 <= x <= 1.0 for v in out1.values() for x in v[1][:7])
    # synthetic blobs aren't decodable images → every row carries the
    # stub's -1.0 sentinel in slot 7 (a value no real decode can emit)
    assert all(v[1][7] == -1.0 for v in out1.values())


def test_extract_features_partition_independent(spark):
    """Result set identical under different partitioning (map-side op)."""
    df = mm.synthetic_media(spark, n=12)
    a = {r.media_id for r in mm.extract_features(df.repartition(1)).collect()}
    b = {r.media_id for r in mm.extract_features(df.repartition(6)).collect()}
    assert a == b


def test_frame_sample_plan(spark):
    df = mm.synthetic_media(spark, n=9)
    plan = mm.frame_sample_plan(df, every_ms=250)
    rows = plan.collect()
    # only video rows expand (ids 2,5,8 → durations 1002,1005,1008 → 5 frames)
    assert {r.media_id for r in rows} == {2, 5, 8}
    per = {}
    for r in rows:
        per.setdefault(r.media_id, []).append(r.frame_ts_ms)
    assert sorted(per[2]) == [0, 250, 500, 750, 1000]


def test_resize_images_shape_and_determinism(spark):
    from data_lakehouse_project_spark.ext import multimodal as mm

    media = mm.synthetic_media(spark, 12)
    out = mm.resize_images(media, 4, 3)
    assert "MapInPandas" in out._jdf.queryExecution().executedPlan().toString()
    rows = out.collect()
    assert len(rows) == 12
    for r in rows:
        if r.media_type == "image":
            assert (r.out_w, r.out_h) == (4, 3)
            assert r.n_bytes == 4 * 3 * 3  # w*h*3 stub "pixels"
        else:
            assert r.out_w is None and r.n_bytes == len(r.content)
    again = {r.media_id: bytes(r.content) for r in mm.resize_images(media, 4, 3).collect()}
    assert {r.media_id: bytes(r.content) for r in rows} == again


def _ppm_bytes(w, h):
    """Binary PPM with a deterministic gradient raster (+ header comment)."""
    import numpy as np

    img = (
        np.arange(w * h * 3, dtype=np.uint32).reshape(h, w, 3) * 7 % 256
    ).astype(np.uint8)
    return b"P6\n# synthetic\n%d %d\n255\n" % (w, h) + img.tobytes(), img


def _bmp24_bytes(w, h):
    """Uncompressed bottom-up 24-bit BMP of a deterministic gradient."""
    import numpy as np

    img = (
        (np.arange(w * h * 3, dtype=np.uint32).reshape(h, w, 3) * 11 + 3) % 256
    ).astype(np.uint8)
    stride = (w * 3 + 3) & ~3
    rows = bytearray()
    for y in range(h - 1, -1, -1):  # bottom-up
        row = img[y, :, ::-1].tobytes()  # RGB → BGR
        rows += row + b"\x00" * (stride - len(row))
    header = (
        b"BM"
        + (54 + len(rows)).to_bytes(4, "little")
        + b"\x00\x00\x00\x00"
        + (54).to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + (24).to_bytes(2, "little")
        + (0).to_bytes(4, "little")
        + len(rows).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(header) + bytes(rows), img


def test_decode_image_ppm_pgm_bmp_roundtrip():
    import numpy as np
    import pytest

    ppm, img = _ppm_bytes(5, 4)
    assert np.array_equal(mm.decode_image(ppm), img)

    pgm = b"P5\n3 2\n255\n" + bytes(range(6))
    assert np.array_equal(
        mm.decode_image(pgm), np.arange(6, dtype=np.uint8).reshape(2, 3, 1)
    )

    bmp, img2 = _bmp24_bytes(3, 3)  # odd width exercises row padding
    assert np.array_equal(mm.decode_image(bmp), img2)

    with pytest.raises(ValueError):
        mm.decode_image(b"\x89PNG\r\n\x1a\n....")


def test_extract_features_really_decodes_images(spark):
    """A real PPM/BMP payload through the full mapInPandas path produces
    pixel-derived features (w, h, c, mean, std, min, max, flag=1.0);
    non-image payloads keep the deterministic stub features."""
    import hashlib

    import numpy as np

    ppm, img = _ppm_bytes(6, 4)
    bmp, img2 = _bmp24_bytes(4, 2)
    blob = b"not an image at all"
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(ppm), 6, 4, 0, "image/x-ppm"),
            (2, "image", bytearray(bmp), 4, 2, 0, "image/bmp"),
            (3, "image", bytearray(blob), 0, 0, 0, "application/x-bin"),
            (4, "audio", bytearray(ppm), 0, 0, 9, "audio/x-raw"),
        ],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in mm.extract_features(df).collect()}

    f = out[1].features
    assert f[:3] == [6.0, 4.0, 3.0] and f[7] == 1.0
    assert abs(f[3] - float(img.astype("float64").mean() / 255.0)) < 1e-12
    f2 = out[2].features
    assert f2[:3] == [4.0, 2.0, 3.0] and f2[7] == 1.0
    assert abs(f2[3] - float(img2.astype("float64").mean() / 255.0)) < 1e-12
    # non-image magic → stub; audio ALWAYS stub even with an image payload
    def stub(b):
        return [x / 255.0 for x in hashlib.sha256(b).digest()[:7]] + [-1.0]

    assert out[3].features == stub(blob)
    assert out[4].features == stub(ppm)
    # pinned stub path ignores decodable payloads (the graded-query mode)
    pinned = {
        r.media_id: r.features
        for r in mm.extract_features(df, decoder="stub").collect()
    }
    assert pinned[1] == stub(ppm)


def _png_chunk(ctype: bytes, data: bytes) -> bytes:
    import zlib

    return (
        len(data).to_bytes(4, "big")
        + ctype
        + data
        + zlib.crc32(ctype + data).to_bytes(4, "big")
    )


def _png_bytes(img, color_type, filters=None, palette=None):
    """Minimal PNG encoder (test-side oracle for decode_png): 8-bit,
    non-interlaced, one scanline per row with an explicit filter type so
    every filter (None/Sub/Up/Average/Paeth) gets exercised."""
    import zlib

    import numpy as np

    h, w, ch = img.shape
    filters = filters or [0] * h
    raw = bytearray()
    prev = np.zeros(w * ch, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        f = filters[y]
        raw.append(f)
        for x in range(w * ch):
            a = int(line[x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            raw.append((int(line[x]) - pred) & 0xFF)
        prev = line
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, color_type, 0, 0, 0])
    )
    out = b"\x89PNG\r\n\x1a\n" + _png_chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _png_chunk(b"PLTE", palette.tobytes())
    out += _png_chunk(b"IDAT", zlib.compress(bytes(raw)))
    out += _png_chunk(b"IEND", b"")
    return out


def test_decode_png_all_filters_pixel_exact():
    """RGB PNG whose five rows use filter types 0-4 — decode must be
    pixel-exact, proving Sub/Up/Average/Paeth unfiltering is right."""
    import numpy as np

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(5, 7, 3), dtype=np.uint8).astype(np.uint8)
    png = _png_bytes(img, color_type=2, filters=[0, 1, 2, 3, 4])
    assert np.array_equal(mm.decode_png(png), img)
    assert np.array_equal(mm.decode_image(png), img)  # dispatch via magic


def test_decode_png_gray_rgba_palette():
    import numpy as np

    rng = np.random.RandomState(11)
    gray = rng.randint(0, 256, size=(4, 6, 1), dtype=np.uint8)
    assert np.array_equal(
        mm.decode_png(_png_bytes(gray, color_type=0, filters=[4, 3, 2, 1])),
        gray,
    )
    rgba = rng.randint(0, 256, size=(3, 3, 4), dtype=np.uint8)
    assert np.array_equal(
        mm.decode_png(_png_bytes(rgba, color_type=6, filters=[0, 4, 4])), rgba
    )
    # paletted: indices expand through PLTE to RGB
    pal = rng.randint(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.randint(0, 16, size=(4, 5, 1), dtype=np.uint8)
    out = mm.decode_png(
        _png_bytes(idx, color_type=3, filters=[0, 1, 2, 3], palette=pal)
    )
    assert np.array_equal(out, pal[idx[:, :, 0]])


def test_decode_png_rejects_unsupported():
    import numpy as np
    import pytest

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    png = bytearray(_png_bytes(img, color_type=2))
    png[8 + 8 + 12] = 7  # interlace byte inside IHDR → Adam7
    with pytest.raises(ValueError):
        mm.decode_png(bytes(png))
    with pytest.raises(ValueError):
        mm.decode_png(b"\x89PNG\r\n\x1a\n" + b"\x00" * 16)


def test_extract_features_decodes_png(spark):
    """A real PNG through the full Arrow mapInPandas path: slot 7 carries
    the real-decode flag 1.0 and the stats match the known pixels."""
    import numpy as np

    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, size=(6, 8, 3), dtype=np.uint8)
    png = _png_bytes(img, color_type=2, filters=[0, 1, 2, 3, 4, 4])
    df = spark.createDataFrame(
        [(1, "image", bytearray(png), 8, 6, 0, "image/png")], mm.MEDIA_SCHEMA
    )
    (row,) = mm.extract_features(df).collect()
    flat = img.astype("float64") / 255.0
    assert row.features[:3] == [8.0, 6.0, 3.0]
    assert row.features[7] == 1.0
    assert abs(row.features[3] - flat.mean()) < 1e-12
    assert abs(row.features[4] - flat.std()) < 1e-12


def test_resize_images_real_pixels(spark):
    """Decodable payloads get a REAL nearest-neighbor resize re-encoded
    as P6; undecodable ones keep the stride stub."""
    import numpy as np

    ppm, img = _ppm_bytes(6, 4)
    rng = np.random.RandomState(5)
    pimg = rng.randint(0, 256, size=(4, 6, 3), dtype=np.uint8)
    png = _png_bytes(pimg, color_type=2, filters=[0, 1, 2, 4])
    df = spark.createDataFrame(
        [
            (1, "image", bytearray(ppm), 6, 4, 0, "image/x-ppm"),
            (2, "image", bytearray(png), 6, 4, 0, "image/png"),
            (3, "image", bytearray(b"garbage bytes"), 0, 0, 0, "x/bin"),
        ],
        mm.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in mm.resize_images(df, 3, 2).collect()}

    def expect(src):
        ys = (np.arange(2) * src.shape[0]) // 2
        xs = (np.arange(3) * src.shape[1]) // 3
        return src[ys][:, xs]

    got1 = mm.decode_image(bytes(out[1].content))
    assert np.array_equal(got1, expect(img))
    got2 = mm.decode_image(bytes(out[2].content))
    assert np.array_equal(got2, expect(pimg))
    # resize then decode == full real pipeline: features flag 1.0
    feats = {
        r.media_id: r.features
        for r in mm.extract_features(
            mm.resize_images(df, 3, 2).select(
                "media_id",
                F.lit("image").alias("media_type"),
                "content",
                F.lit(3).alias("width"),
                F.lit(2).alias("height"),
                F.lit(0).alias("duration_ms"),
                F.lit("image/x-ppm").alias("mime"),
            )
        ).collect()
    }
    assert feats[1][:3] == [3.0, 2.0, 3.0] and feats[1][7] == 1.0
    # undecodable payload keeps the stub (content is raw resampled bytes)
    assert out[3].n_bytes == 3 * 2 * 3


def _wav_bytes(freq=440.0, rate=8000, seconds=0.5, bits=16, channels=1):
    """Synthesize a PCM WAV in-memory (pure struct/numpy)."""
    import numpy as np

    n = int(rate * seconds)
    t = np.arange(n) / rate
    mono = 0.5 * np.sin(2 * np.pi * freq * t)
    sig = np.repeat(mono[:, None], channels, axis=1).ravel()
    if bits == 16:
        data = (sig * 32767).astype("<i2").tobytes()
    else:
        data = ((sig * 127) + 128).astype("uint8").tobytes()
    block = channels * bits // 8
    fmt = (
        (1).to_bytes(2, "little")
        + channels.to_bytes(2, "little")
        + rate.to_bytes(4, "little")
        + (rate * block).to_bytes(4, "little")
        + block.to_bytes(2, "little")
        + bits.to_bytes(2, "little")
    )
    chunks = b"fmt " + len(fmt).to_bytes(4, "little") + fmt
    chunks += b"data" + len(data).to_bytes(4, "little") + data
    return b"RIFF" + (4 + len(chunks)).to_bytes(4, "little") + b"WAVE" + chunks


def test_decode_wav_real_signal_features():
    import math

    from data_lakehouse_project_spark.ext.multimodal import (
        _audio_features,
        decode_wav,
    )

    wav = _wav_bytes(freq=440.0, rate=8000, seconds=0.5)
    samples, rate = decode_wav(wav)
    assert rate == 8000 and samples.shape == (4000, 1)

    f = _audio_features(wav)
    dur, sr, ch, rms, zcr, peak, mean_abs, flag = f
    assert abs(dur - 0.5) < 1e-9 and sr == 8000 and ch == 1
    assert abs(rms - 0.5 / math.sqrt(2)) < 0.01  # sine rms = A/sqrt(2)
    assert abs(zcr - 2 * 440 / 8000) < 0.02  # 2 crossings per cycle
    assert 0.49 < peak <= 0.5 and flag == 1.0

    # stereo 8-bit also decodes
    s2, r2 = decode_wav(_wav_bytes(rate=4000, seconds=0.25, bits=8, channels=2))
    assert r2 == 4000 and s2.shape == (1000, 2)


def test_extract_features_real_audio_through_arrow_path(spark):
    from data_lakehouse_project_spark.ext.multimodal import (
        MEDIA_SCHEMA,
        extract_features,
    )

    rows = [
        (1, "audio", bytearray(_wav_bytes())),
        (2, "audio", bytearray(b"\xff\xfb garbage mp3-ish payload")),
    ]
    df = spark.createDataFrame(
        [(i, t, c, len(c)) for i, t, c in rows],
        "media_id long, media_type string, content binary, n_bytes long",
    )
    got = {
        r.media_id: r.features
        for r in extract_features(df, decoder="auto").collect()
    }
    assert got[1][-1] == 1.0  # real WAV decode flag
    assert got[2][-1] == -1.0  # undecodable -> stub sentinel


def _video_blob(n_frames=6, w=8, h=4, grad=True):
    import numpy as np

    from data_lakehouse_project_spark.ext.multimodal import make_ppm_video

    frames = []
    for i in range(n_frames):
        base = np.full((h, w, 3), (i * 30) % 256 if grad else 128, "uint8")
        base[0, 0] = (i, 2 * i, 3 * i)  # per-frame variation
        frames.append(base)
    return make_ppm_video(frames)


def test_ppm_stream_roundtrip_and_stride():
    import numpy as np

    from data_lakehouse_project_spark.ext.multimodal import (
        decode_image,
        iter_ppm_stream,
    )

    blob = _video_blob(n_frames=7)
    frames = list(iter_ppm_stream(blob))
    assert [f[0] for f in frames] == list(range(7))
    assert all(f[1] == 8 and f[2] == 4 for f in frames)
    # frame 3 decodes to its constant base value
    img3 = decode_image(frames[3][3])
    assert int(img3[1, 1, 0]) == 90
    # stride materializes only every 3rd frame
    sampled = list(iter_ppm_stream(blob, every_n=3))
    assert [f[0] for f in sampled] == [0, 3, 6]
    # garbage between frames is detected, not misread
    import pytest as _pytest

    with _pytest.raises(ValueError):
        list(iter_ppm_stream(blob + b"JUNK"))


def test_video_features_real_decode_and_motion():
    import numpy as np

    from data_lakehouse_project_spark.ext.multimodal import _video_features

    feats = _video_features(_video_blob(n_frames=5))
    n, w, h, mean, motion, lo, hi, flag = feats
    assert (n, w, h, flag) == (5.0, 8.0, 4.0, 1.0)
    assert 0.0 <= lo <= mean <= hi <= 1.0
    assert motion > 0.0  # gradient frames → nonzero frame-mean delta
    # static video → zero motion
    static = _video_features(_video_blob(n_frames=5, grad=False))
    assert static[4] < feats[4]


def test_extract_features_real_video_through_arrow_path(spark):
    from data_lakehouse_project_spark.ext.multimodal import extract_features

    rows = [
        (1, "video", bytearray(_video_blob())),
        (2, "video", bytearray(b"\x00\x01 not a ppm stream")),
    ]
    df = spark.createDataFrame(
        [(i, t, c, len(c)) for i, t, c in rows],
        "media_id long, media_type string, content binary, n_bytes long",
    )
    got = {
        r.media_id: r.features
        for r in extract_features(df, decoder="auto").collect()
    }
    assert got[1][-1] == 1.0 and got[1][0] == 6.0  # real decode, 6 frames
    assert got[2][-1] == -1.0  # codec container -> stub sentinel


def test_sample_video_frames_grain_and_stride(spark):
    from data_lakehouse_project_spark.ext.multimodal import (
        sample_video_frames,
    )

    df = spark.createDataFrame(
        [
            (1, "video", bytearray(_video_blob(n_frames=6)), 6),
            (2, "video", bytearray(b"garbage"), 1),
        ],
        "media_id long, media_type string, content binary, n_bytes long",
    )
    rows = sample_video_frames(df, every_n=2).collect()
    got = sorted((r.media_id, r.frame_idx) for r in rows)
    assert got == [(1, 0), (1, 2), (1, 4)]  # stride 2, garbage silent
    r0 = next(r for r in rows if r.frame_idx == 0)
    assert r0.w == 8 and r0.h == 4 and 0.0 <= r0.mean <= 1.0
