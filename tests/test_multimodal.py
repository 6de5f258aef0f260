"""Multimodal binary-column tests (operators/multimodal.py): schema,
Arrow batch plumbing, deterministic features, codec stub."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from magshield_data_pipeline_spark.operators import multimodal as M


@pytest.fixture()
def media(spark):
    rows = [
        (1, "image", b"\x00\x01\x02\xff" * 4, ("image/png", 2, 2, None, None)),
        (2, "audio", b"RIFFdata" * 100, ("audio/wav", None, None, 44100, 2500)),
        (3, "video", b"\x00" * 64, ("video/mp4", 640, 480, None, 3500)),
        (4, "image", b"", ("image/png", 0, 0, None, None)),
    ]
    return spark.createDataFrame(rows, schema=M.MEDIA_SCHEMA)


def test_media_schema_types(media):
    assert dict(media.dtypes)["content"] == "binary"
    meta_type = media.schema["meta"].dataType.simpleString()
    assert "mime:string" in meta_type and "duration_ms:int" in meta_type


def test_extract_features_deterministic(media):
    out = {r.media_id: r for r in M.extract_features(media).collect()}
    img = out[1]
    payload = b"\x00\x01\x02\xff" * 4
    assert img.byte_len == 16
    assert img.content_md5 == hashlib.md5(payload).hexdigest()
    # nibble checksum: 4 * (0 + 1 + 2 + (15+15))
    assert img.nibble_sum == 4 * (0 + 1 + 2 + 30)
    # bytes < 8: twelve of sixteen
    assert img.bin0_frac == pytest.approx(12 / 16)
    assert len(img.histogram) == M.HIST_BINS
    assert sum(img.histogram) == pytest.approx(1.0, abs=1e-6)
    # empty payload: zeroed features, no crash
    assert out[4].byte_len == 0 and out[4].bin0_frac == 0.0


def test_extract_features_is_pure_projection(media):
    # repartitioning must not change results (per-row purity — the
    # mapInPandas batch boundaries are an implementation detail)
    a = sorted(map(tuple, M.extract_features(media).collect()))
    b = sorted(map(tuple, M.extract_features(media.repartition(3)).collect()))
    assert a == b


def test_decode_media_is_stubbed():
    with pytest.raises(NotImplementedError, match="codec"):
        M.decode_media(b"\x89PNG", "image")


def test_frame_sample_points(media):
    pts = M.frame_sample_points(media, every_ms=1000).collect()
    # only the video row (id 3, duration 3500ms) → samples at 0..3000
    assert {r.media_id for r in pts} == {3}
    assert sorted(r.sample_ms for r in pts) == [0, 1000, 2000, 3000]


def test_resize_plan_dims_and_payload_pruning(spark):
    from magshield_data_pipeline_spark.operators import multimodal as M

    media = spark.createDataFrame(
        [
            (1, "image", b"x", ("image/png", 640, 480, None, None)),
            (2, "image", b"x", ("image/png", 100, 50, None, None)),   # fits → no resize
            (3, "audio", b"x", ("audio/wav", None, None, 44100, 1000)),
            (4, "image", b"x", ("image/png", 0, 10, None, None)),     # degenerate → dropped
        ],
        schema=M.MEDIA_SCHEMA,
    )
    out = {r.media_id: r for r in M.resize_plan(media, 224, 224).collect()}
    assert set(out) == {1, 2}
    # 640x480 → scale 0.35 (224/640), dst 224x168
    assert (out[1].dst_w, out[1].dst_h, out[1].needs_resize) == (224, 168, True)
    # already within bounds → scale 1.0, dims unchanged
    assert (out[2].dst_w, out[2].dst_h, out[2].needs_resize) == (100, 50, False)
    # the binary payload must be pruned from the scan entirely —
    # observable only on a file-backed relation (LocalRelation carries
    # every attribute regardless)
    import tempfile

    path = tempfile.mkdtemp(prefix="resize_media_")
    media.write.mode("overwrite").parquet(path)
    plan = (
        M.resize_plan(spark.read.parquet(path), 224, 224)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_lines = [ln for ln in plan.splitlines() if "FileScan" in ln]
    assert scan_lines and all("content" not in ln for ln in scan_lines)


# ---------------------------------------------------------------------------
# real PPM codec (r6)


def test_ppm_roundtrip_and_header_tolerance():
    import numpy as np

    from magshield_data_pipeline_spark.operators.multimodal import (
        decode_media,
        decode_ppm,
        encode_ppm,
    )

    img = (np.arange(5 * 4 * 3) % 256).astype(np.uint8).reshape(4, 5, 3)
    payload = encode_ppm(img)
    assert (decode_ppm(payload) == img).all()
    assert (decode_media(payload, "image") == img).all()
    # spec wrinkle: comments and arbitrary whitespace inside the header
    commented = b"P6\n# a comment\n 5  4\n# more\n255\n" + img.tobytes()
    assert (decode_ppm(commented) == img).all()


def test_ppm_malformed_payloads_fail_loud():
    import numpy as np
    import pytest

    from magshield_data_pipeline_spark.operators.multimodal import (
        decode_media,
        decode_ppm,
        encode_ppm,
    )

    img = np.zeros((2, 2, 3), dtype=np.uint8)
    good = encode_ppm(img)
    with pytest.raises(ValueError, match="not a binary PPM"):
        decode_ppm(b"P5" + good[2:])          # wrong magic
    with pytest.raises(ValueError, match="truncated"):
        decode_ppm(good[:-1])                  # short raster
    with pytest.raises(ValueError, match="maxval"):
        decode_ppm(b"P6\n2 2\n65535\n" + b"\x00" * 24)
    with pytest.raises(ValueError):
        encode_ppm(np.zeros((2, 2), dtype=np.uint8))  # not RGB
    with pytest.raises(NotImplementedError):
        decode_media(b"\x89PNG....", "image")  # compressed: still a stub
    # ADVICE r6: a magic NOT followed by whitespace must fail loud —
    # b"P63 2 255..." would otherwise tokenize '3' as the width and
    # silently misread the raster
    with pytest.raises(ValueError, match="whitespace"):
        decode_ppm(b"P63 2 255\n" + b"\x00" * 18)
    with pytest.raises(ValueError, match="whitespace"):
        decode_media(b"P63 2 255\n" + b"\x00" * 18, "image")
    # '#' directly after the magic is a legal comment start
    commented = b"P6# c\n2 2 255\n" + b"\x00" * 12
    assert decode_ppm(commented).shape == (2, 2, 3)


def test_resize_nearest_exact_pixel_selection():
    import numpy as np

    from magshield_data_pipeline_spark.operators.multimodal import (
        resize_nearest,
    )

    img = (np.arange(6 * 4 * 3) % 256).astype(np.uint8).reshape(4, 6, 3)
    out = resize_nearest(img, 3, 2)
    assert out.shape == (2, 3, 3)
    # src = dst*src_dim // dst_dim: rows {0,2}, cols {0,2,4}
    for i in range(2):
        for j in range(3):
            assert (out[i, j] == img[(i * 4) // 2, (j * 6) // 3]).all()
    # identity resize returns the same pixels
    assert (resize_nearest(img, 6, 4) == img).all()


# ---------------------------------------------------------------------------
# real PNG codec, stdlib zlib only (r7)


def test_png_roundtrip_exercises_all_five_filters():
    import numpy as np

    from magshield_data_pipeline_spark.operators.multimodal import (
        decode_media,
        decode_png,
        encode_png,
        synth_image,
    )

    # >= 5 rows so the cycling encoder emits every filter type 0..4;
    # several shapes including w=1 (left neighbor always absent) and
    # tall/wide asymmetry
    for mid, w, h in [(3, 7, 6), (11, 1, 9), (4, 32, 5), (9, 2, 2)]:
        img = synth_image(mid, w, h)
        payload = encode_png(img)
        assert (decode_png(payload) == img).all(), (mid, w, h)
        assert (decode_media(payload, "image") == img).all()
    # random content (fixed seed) — exact under every predictor too
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(10, 13, 3), dtype=np.uint8)
    assert (decode_png(encode_png(img)) == img).all()


def test_png_malformed_payloads_fail_loud():
    import numpy as np
    import pytest

    from magshield_data_pipeline_spark.operators.multimodal import (
        decode_png,
        encode_png,
    )

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    good = encode_png(img)
    with pytest.raises(ValueError, match="signature"):
        decode_png(b"\x89PNH" + good[4:])
    # flip one IDAT byte: crc must catch it
    idat_pos = good.index(b"IDAT") + 4
    corrupted = bytearray(good)
    corrupted[idat_pos] ^= 0xFF
    with pytest.raises(ValueError, match="crc"):
        decode_png(bytes(corrupted))
    with pytest.raises(ValueError, match="truncated"):
        decode_png(good[:-6])
    # unsupported profile (grayscale color type) is a loud error, not
    # a silently wrong image
    import struct
    import zlib

    ihdr = struct.pack(">IIBBBBB", 4, 4, 8, 0, 0, 0, 0)
    bad = (
        good[:8]
        + struct.pack(">I", len(ihdr))
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(ValueError, match="color"):
        decode_png(bad)
    with pytest.raises(ValueError):
        encode_png(np.zeros((2, 2), dtype=np.uint8))  # not RGB


# ---------------------------------------------------------------------------
# real WAV + Y4M codecs (r7): the audio/video modalities made real


def test_wav_roundtrip_and_dispatch():
    import numpy as np

    from magshield_data_pipeline_spark.operators.multimodal import (
        decode_media,
        decode_wav,
        encode_wav,
        synth_audio,
    )

    samples = synth_audio(5, 1000)
    payload = encode_wav(samples, 8000)
    got, rate = decode_wav(payload)
    assert rate == 8000 and (got == samples).all()
    got2, rate2 = decode_media(payload, "audio")
    assert rate2 == 8000 and (got2 == samples).all()
    # extremes survive the int16 round-trip
    edge = np.array([-32768, 32767, 0, -1], dtype=np.int16)
    assert (decode_wav(encode_wav(edge))[0] == edge).all()


def test_wav_malformed_payloads_fail_loud():
    import numpy as np
    import pytest

    from magshield_data_pipeline_spark.operators.multimodal import (
        decode_wav,
        encode_wav,
        synth_audio,
    )

    good = encode_wav(synth_audio(1, 100))
    with pytest.raises(ValueError, match="RIFF"):
        decode_wav(b"RIFX" + good[4:])
    with pytest.raises(ValueError, match="size|truncated"):
        decode_wav(good[:-3])
    # stereo / non-PCM profiles are loud errors, never a misread
    import struct

    bad_fmt = good.replace(
        struct.pack("<HH", 1, 1), struct.pack("<HH", 1, 2), 1
    )
    with pytest.raises(ValueError, match="mono|channels"):
        decode_wav(bad_fmt)
    with pytest.raises(ValueError):
        encode_wav(np.zeros(4, dtype=np.float32))  # wrong dtype


def test_y4m_roundtrip_frame_sampling_and_fail_loud():
    import numpy as np
    import pytest

    from magshield_data_pipeline_spark.operators.multimodal import (
        decode_media,
        decode_y4m,
        encode_y4m,
        synth_video,
    )

    frames = synth_video(3, 8, 6, 5)
    payload = encode_y4m(frames, fps=30)
    got, fps = decode_y4m(payload)
    assert fps == 30 and got.shape == (5, 6, 8) and (got == frames).all()
    got2, _ = decode_media(payload, "video")
    assert (got2 == frames).all()
    with pytest.raises(ValueError, match="YUV4MPEG2"):
        decode_y4m(b"NOTAY4M\n")
    with pytest.raises(ValueError, match="truncated"):
        decode_y4m(payload[:-1])
    with pytest.raises(ValueError, match="FRAME"):
        decode_y4m(payload.replace(b"FRAME\n", b"FRAMX\n", 1))
    # a chroma-carrying stream must be rejected, not misread as mono
    chroma = payload.replace(b"Cmono", b"C420", 1)
    with pytest.raises(ValueError, match="mono"):
        decode_y4m(chroma)
