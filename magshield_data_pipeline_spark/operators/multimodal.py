"""Multimodal columns: image/audio/video as opaque binary + typed
metadata (SURVEY §2.10 [EXT] / driver north star).

Engine contract:

- media rows are ``(media_id, kind, content: binary, meta: struct)`` —
  the binary payload is NEVER interpreted by Spark SQL; it flows
  column-pruned and Arrow-batched into Python only where a codec is
  genuinely needed;
- decode / feature-extract run as ``mapInPandas`` over Arrow record
  batches — per-partition, vectorized, no per-row Python round trips;
  at 100 TB this is one scan whose parallelism is the file split count,
  with ``spark.sql.execution.arrow.maxRecordsPerBatch`` bounding batch
  memory;
- decode is REAL for binary PPM (P6), 8-bit RGB PNG (stdlib zlib:
  inflate + crc32 + per-scanline unfilter), baseline JPEG — grayscale,
  YCbCr 4:4:4 color AND 4:2:0 chroma-subsampled color (our own Huffman
  entropy codec + MCU interleave + 8x8 IDCT + BT.601 transform,
  struct + numpy only), PCM WAV, FLAC (fixed predictors + Rice
  residuals, CRC-8/16 + MD5 verified, bit-exact lossless), and mono
  Y4M video.
  Progressive JPEG and the perceptual codecs
  (MP3/AAC/H.264 — PIL/libsndfile/ffmpeg) are NOT available in this
  environment, so for those ``decode_media`` remains a clearly-marked
  stub raising NotImplementedError; the shipped feature extractor
  computes deterministic byte-level features (length, md5, nibble
  checksum, byte histogram) — the Spark-side plumbing (schema,
  batching, UDF signature, partitioning) is real and oracle-checked,
  and swapping a stub for a real codec changes only the inner numpy
  function.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# media schema: binary payload + typed metadata struct
MEDIA_META_TYPE = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("sample_rate", IntegerType()),
        StructField("duration_ms", IntegerType()),
    ]
)
MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("content", BinaryType()),
        StructField("meta", MEDIA_META_TYPE),
    ]
)

HIST_BINS = 32  # byte-value histogram bins (256/8)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("content_md5", StringType()),
        StructField("nibble_sum", LongType()),
        StructField("bin0_frac", DoubleType()),
        StructField("histogram", ArrayType(FloatType())),
    ]
)


def decode_media(content: bytes, kind: str):
    """Decode a media payload. REAL for one format per modality, each
    requiring no external library: images — uncompressed binary PPM
    (P6, :func:`decode_ppm`) and 8-bit RGB PNG (:func:`decode_png`,
    stdlib-zlib inflate + per-scanline unfilter); audio — 16-bit mono
    PCM WAV (:func:`decode_wav`, RIFF chunk walk) and compressed
    lossless FLAC (:func:`decode_flac`, fixed predictors + Rice
    residuals, CRC/MD5 verified); video — mono-plane
    YUV4MPEG2 (:func:`decode_y4m`, header + FRAME markers) — plus one
    COMPRESSED lossy format: baseline JPEG — grayscale, YCbCr 4:4:4
    and 4:2:0 chroma-subsampled color (:func:`decode_jpeg`, real
    Huffman entropy decode + MCU interleave + IDCT + BT.601,
    struct + numpy only), including PROGRESSIVE (SOF2) in every
    supported layout — grayscale, 4:4:4 and 4:2:0 color: multi-scan
    spectral selection + DC/AC successive approximation with
    end-of-band run coding (:func:`decode_jpeg_gray_progressive` /
    :func:`decode_jpeg_rgb_progressive` /
    :func:`decode_jpeg_rgb_progressive_420`).  The remaining formats
    (MP3/AAC, H.264) are PERCEPTUAL codecs that genuinely need codec
    libraries (soundfile/pyav) not installed in this environment and
    stay a clearly-marked stub; every caller goes through
    ``extract_features``-style mapInPandas so only this function
    changes when codecs are plugged in."""
    if content is not None:
        if kind == "image":
            if content[:2] == b"P6":
                return decode_ppm(content)
            if content[: len(PNG_SIGNATURE)] == PNG_SIGNATURE:
                return decode_png(content)
            if content[:2] == b"\xff\xd8":
                # JPEG: (h, w) grayscale or (h, w, 3) RGB for 4:4:4
                # and 4:2:0 color — sequential AND progressive (SOF2)
                # in every layout; decode_jpeg dispatches on the frame
                # header
                return decode_jpeg(content)
        elif kind == "audio":
            if content[:4] == b"RIFF":
                return decode_wav(content)
            if content[:4] == b"fLaC":
                return decode_flac(content)
        elif kind == "video" and content[:9] == b"YUV4MPEG2":
            return decode_y4m(content)
    raise NotImplementedError(
        f"real {kind} decoding of this payload requires a codec library "
        "(PIL/soundfile/ffmpeg) that is not available in this environment; "
        "supported without one: PPM (P6) / 8-bit RGB PNG / baseline "
        "and progressive JPEG (each in grayscale, 4:4:4 and 4:2:0 "
        "color) images, PCM WAV + FLAC audio, mono Y4M video — only "
        "the perceptual codecs (MP3/AAC/H.264) need a real codec"
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Feature extraction over Arrow batches: mapInPandas receives an
    iterator of pandas DataFrames (one per Arrow batch) and yields
    feature frames. Pure per-row computation → embarrassingly parallel,
    no shuffle; the binary column is pruned away after this projection.

    The batch function is deliberately SELF-CONTAINED (local imports, no
    references to this module's globals): cloudpickle serializes module
    functions by reference, and executor Python workers do not share the
    driver's sys.path — a closure referencing this package would raise
    ModuleNotFoundError on any cluster where the package isn't
    pip-installed on the executors.
    """
    bins = HIST_BINS

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        import numpy as _np
        import pandas as _pd

        def byte_features(content):
            # content is a NULLABLE binary column: a null payload gets
            # empty features, it must not TypeError the whole task
            if content is None:
                content = b""
            arr = _np.frombuffer(content, dtype=_np.uint8)
            n = len(arr)
            if n == 0:
                return 0, 0, 0.0, [0.0] * bins
            nibble_sum = int((arr >> 4).sum() + (arr & 0x0F).sum())
            bin0 = int((arr < 256 // bins).sum())
            hist = _np.bincount(arr >> 3, minlength=bins).astype("float64") / n
            return n, nibble_sum, round(bin0 / n, 6), [float(x) for x in hist]

        for pdf in it:
            feats = [byte_features(c) for c in pdf["content"]]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "byte_len": [f[0] for f in feats],
                    "content_md5": [
                        hashlib.md5(c if c is not None else b"").hexdigest()
                        for c in pdf["content"]
                    ],
                    "nibble_sum": [f[1] for f in feats],
                    "bin0_frac": [f[2] for f in feats],
                    "histogram": [f[3] for f in feats],
                }
            )

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


def frame_sample_points(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per sample timestamp, derived
    from the typed metadata only — the binary payload is not touched
    (and is pruned from the scan), so planning sample points over a
    100 TB corpus reads just the metadata column. The actual frame
    decode at each point would go through a mapInPandas like
    ``extract_features`` (codec stubbed, see ``decode_media``)."""
    return (
        media.filter(F.col("kind") == "video")
        .select(
            "media_id",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                    F.lit(every_ms),
                )
            ).alias("sample_ms"),
        )
    )


def resize_plan(media: DataFrame, max_w: int = 224, max_h: int = 224) -> DataFrame:
    """Aspect-preserving image resize PLAN from typed metadata only:
    target dimensions to fit ``max_w × max_h`` without upscaling
    (scale = min(max_w/w, max_h/h, 1), floor to pixels, never below 1).
    Like :func:`frame_sample_points`, the binary payload is untouched —
    column pruning drops it from the scan, so planning a resize pass
    over a 100 TB corpus reads metadata only; the actual pixel
    resampling runs through the (stubbed) codec via an
    ``extract_features``-style mapInPandas.

    The scale factor is rounded to 6 decimals BEFORE the floor so the
    derived integer dimensions are engine-reproducible (identical IEEE
    operands → identical products → identical floors)."""
    w = F.col("meta.width").cast("double")
    h = F.col("meta.height").cast("double")
    scale = F.round(
        F.least(F.lit(float(max_w)) / w, F.lit(float(max_h)) / h, F.lit(1.0)), 6
    )
    return (
        media.filter((F.col("kind") == "image") & (w > 0) & (h > 0))
        .select(
            "media_id",
            F.col("meta.width").alias("src_w"),
            F.col("meta.height").alias("src_h"),
            scale.alias("scale"),
            F.greatest(F.floor(w * scale), F.lit(1)).cast("int").alias("dst_w"),
            F.greatest(F.floor(h * scale), F.lit(1)).cast("int").alias("dst_h"),
            (scale < 1.0).alias("needs_resize"),
        )
    )


# ---------------------------------------------------------------------------
# real uncompressed codec: PPM (P6) — no external library required


def encode_ppm(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as binary PPM (P6): the
    uncompressed interchange format whose whole "codec" is a text
    header + raw RGB bytes — implementable exactly, with zero external
    dependencies. See :func:`encode_png`/:func:`decode_png` for the
    compressed sibling; JPEG/audio/video still require real codec
    libraries and remain stubbed."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_ppm expects an (h, w, 3) uint8 array")
    h, w = img.shape[:2]
    return f"P6\n{w} {h}\n255\n".encode("ascii") + img.tobytes()


def decode_ppm(content: bytes) -> np.ndarray:
    """REAL decode of a binary PPM (P6) payload: parse the magic,
    whitespace/comment-tolerant header tokens (width, height, maxval),
    then view the raw RGB bytes as (h, w, 3) uint8. Raises ValueError
    on a malformed payload — fail loud, never silently misread."""
    if not content.startswith(b"P6"):
        raise ValueError("decode_ppm: not a binary PPM (P6) payload")
    # the spec requires whitespace after the magic (a comment may start
    # wherever whitespace may): without this check a payload like
    # b"P63 2 255\n..." would tokenize '3' as the width and silently
    # misread the raster — fail loud instead (ADVICE r6)
    if not (content[2:3].isspace() or content[2:3] == b"#"):
        raise ValueError(
            f"decode_ppm: magic not followed by whitespace ({content[:3]!r})"
        )
    # tokenize the header: three ints after the magic; '#' starts a
    # comment running to end-of-line (the PPM spec's one wrinkle)
    tokens: list[int] = []
    i = 2
    n = len(content)
    while len(tokens) < 3:
        while i < n and content[i : i + 1].isspace():
            i += 1
        if i < n and content[i : i + 1] == b"#":
            while i < n and content[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < n and not content[j : j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("decode_ppm: truncated header")
        try:
            tokens.append(int(content[i:j]))
        except ValueError as e:
            raise ValueError(f"decode_ppm: bad header token {content[i:j]!r}") from e
        i = j
    w, h, maxval = tokens
    if maxval != 255:
        raise ValueError(f"decode_ppm: only maxval=255 supported, got {maxval}")
    i += 1  # exactly ONE whitespace byte separates header and raster
    raster = content[i : i + w * h * 3]
    if len(raster) != w * h * 3:
        raise ValueError(
            f"decode_ppm: raster truncated ({len(raster)} of {w * h * 3} bytes)"
        )
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


def resize_nearest(img: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize of an (h, w, 3) uint8 image — the one
    resampling kernel that is EXACT (each output pixel is a source
    pixel, chosen by ``src = floor(dst · src_dim / dst_dim)``), so a
    resize executed here can be oracle-checked closed-form; bilinear
    and friends would reopen the float-rounding question for no
    verification gain at thumbnail scale."""
    h, w = img.shape[:2]
    ys = (np.arange(out_h, dtype=np.int64) * h) // out_h
    xs = (np.arange(out_w, dtype=np.int64) * w) // out_w
    return img[ys][:, xs]


# ---------------------------------------------------------------------------
# real compressed codec: PNG (8-bit RGB) — stdlib zlib only
#
# PNG's container is chunked (length/tag/data/crc32) and its raster is
# DEFLATE-compressed scanlines, each prefixed by a filter byte (one of
# five per-scanline predictors). Both halves are implementable exactly
# with the standard library: zlib gives inflate/deflate AND crc32, and
# the filters are byte arithmetic mod 256 — so unlike JPEG (DCT +
# entropy coding) the "no codec library" constraint does not force a
# stub. Spec: W3C PNG (ISO/IEC 15948), §§5, 9, 11.2.

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"
_PNG_BPP = 3  # 8-bit RGB: 3 bytes per pixel


def _png_chunk(tag: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + tag
        + data
        + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
    )


def _paeth(a: int, b: int, c: int) -> int:
    """The Paeth predictor (PNG §9.4): the neighbor (left, up, or
    up-left) closest to the linear estimate a + b - c, ties resolved
    left → up → up-left."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def encode_png(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 array as an 8-bit RGB PNG using ONLY
    the standard library (zlib for DEFLATE + crc32).

    The filter type CYCLES through all five per scanline (y % 5:
    None/Sub/Up/Average/Paeth) — deliberately, so a decoder exercising
    this payload must implement every unfilter, not just the trivial
    one; a real encoder would pick per-line by compressed-size
    heuristic, which changes bytes but not the decoded pixels. Filters
    are computed on the RAW bytes of the current and prior scanline
    (PNG §9.2), vectorized per line with numpy."""
    import struct
    import zlib

    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_png expects an (h, w, 3) uint8 array")
    h, w = img.shape[:2]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = img.reshape(h, w * _PNG_BPP).astype(np.int16)
    zero = np.zeros(w * _PNG_BPP, dtype=np.int16)
    lines = []
    for y in range(h):
        cur = raw[y]
        prior = raw[y - 1] if y > 0 else zero
        left = np.concatenate([zero[:_PNG_BPP], cur[:-_PNG_BPP]])
        upleft = np.concatenate([zero[:_PNG_BPP], prior[:-_PNG_BPP]])
        ftype = y % 5
        if ftype == 0:
            filt = cur
        elif ftype == 1:
            filt = cur - left
        elif ftype == 2:
            filt = cur - prior
        elif ftype == 3:
            filt = cur - (left + prior) // 2
        else:
            p = left + prior - upleft
            pa = np.abs(p - left)
            pb = np.abs(p - prior)
            pc = np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prior, upleft)
            )
            filt = cur - pred
        lines.append(bytes([ftype]) + (filt % 256).astype(np.uint8).tobytes())
    idat = zlib.compress(b"".join(lines))
    return (
        PNG_SIGNATURE
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", idat)
        + _png_chunk(b"IEND", b"")
    )


def decode_png(content: bytes) -> np.ndarray:
    """REAL decode of an 8-bit RGB PNG payload with the standard
    library only: walk the chunk stream (verifying each crc32), parse
    IHDR, inflate the concatenated IDAT bytes, then reverse the
    per-scanline filter (None/Sub/Up/Average/Paeth — PNG §9) to
    reconstruct the (h, w, 3) uint8 raster. Raises ValueError on any
    malformed structure — fail loud, never silently misread. Only the
    profile this engine writes is accepted (bit depth 8, color type 2
    truecolor, no interlace); anything else is a loud error, not a
    wrong image."""
    import struct
    import zlib

    if content[: len(PNG_SIGNATURE)] != PNG_SIGNATURE:
        raise ValueError("decode_png: bad PNG signature")
    pos = len(PNG_SIGNATURE)
    w = h = None
    idat = b""
    seen_end = False
    while pos < len(content):
        if pos + 8 > len(content):
            raise ValueError("decode_png: truncated chunk header")
        (length,) = struct.unpack(">I", content[pos : pos + 4])
        tag = content[pos + 4 : pos + 8]
        data = content[pos + 8 : pos + 8 + length]
        if len(data) != length or pos + 12 + length > len(content):
            raise ValueError(f"decode_png: truncated {tag!r} chunk")
        (crc,) = struct.unpack(
            ">I", content[pos + 8 + length : pos + 12 + length]
        )
        if crc != (zlib.crc32(tag + data) & 0xFFFFFFFF):
            raise ValueError(f"decode_png: crc mismatch in {tag!r}")
        if tag == b"IHDR":
            w, h, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if (depth, color, comp, filt, interlace) != (8, 2, 0, 0, 0):
                raise ValueError(
                    "decode_png: only 8-bit RGB (color type 2), "
                    "non-interlaced supported; got depth="
                    f"{depth} color={color} interlace={interlace}"
                )
        elif tag == b"IDAT":
            idat += data
        elif tag == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if w is None or not idat or not seen_end:
        raise ValueError("decode_png: missing IHDR/IDAT/IEND")
    stride = w * _PNG_BPP
    raster = zlib.decompress(idat)
    if len(raster) != h * (1 + stride):
        raise ValueError(
            f"decode_png: raster size {len(raster)} != {h * (1 + stride)}"
        )
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        line = raster[y * (1 + stride) : (y + 1) * (1 + stride)]
        ftype, filt = line[0], line[1:]
        prior = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[y] = np.frombuffer(filt, dtype=np.uint8)
        elif ftype == 2:
            out[y] = (
                np.frombuffer(filt, dtype=np.uint8).astype(np.int16) + prior
            ) % 256
        elif ftype in (1, 3, 4):
            # Sub/Average/Paeth reconstruct left-to-right (each byte
            # needs the RECONSTRUCTED byte bpp to its left) — a
            # sequential scan per line; fine at thumbnail scale, and
            # the hot path stays one vectorized mapInPandas scan
            row = out[y]
            for i in range(stride):
                a = int(row[i - _PNG_BPP]) if i >= _PNG_BPP else 0
                b = int(prior[i])
                if ftype == 1:
                    pred = a
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    c = int(prior[i - _PNG_BPP]) if i >= _PNG_BPP else 0
                    pred = _paeth(a, b, c)
                row[i] = (filt[i] + pred) % 256
        else:
            raise ValueError(f"decode_png: bad filter type {ftype}")
    return out.reshape(h, w, _PNG_BPP)


# ---------------------------------------------------------------------------
# real uncompressed audio codec: WAV (RIFF PCM 16-bit mono) — stdlib only
#
# WAV's container is RIFF chunks and its PCM payload is raw samples —
# like PPM for audio: struct parsing, no DSP library. Compressed audio
# (MP3/AAC/Opus) genuinely needs codec libraries and stays stubbed.


def encode_wav(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode a 1-D int16 sample array as a 16-bit mono PCM WAV."""
    import struct

    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_wav expects a 1-D int16 array")
    data = samples.tobytes()
    fmt = struct.pack(
        "<HHIIHH", 1, 1, sample_rate, sample_rate * 2, 2, 16
    )  # PCM, mono, rate, byte-rate, block align, bits
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """REAL decode of a 16-bit mono PCM WAV: walk the RIFF chunk list,
    validate the fmt chunk (PCM, mono, 16-bit — anything else raises,
    never misreads), and view the data chunk as int16 samples. Returns
    (samples, sample_rate)."""
    import struct

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        raise ValueError("decode_wav: not a RIFF/WAVE payload")
    (riff_size,) = struct.unpack("<I", content[4:8])
    if riff_size + 8 != len(content):
        raise ValueError(
            f"decode_wav: RIFF size {riff_size + 8} != payload {len(content)}"
        )
    pos, rate, data = 12, None, None
    while pos + 8 <= len(content):
        tag = content[pos : pos + 4]
        (size,) = struct.unpack("<I", content[pos + 4 : pos + 8])
        chunk = content[pos + 8 : pos + 8 + size]
        if len(chunk) != size:
            raise ValueError(f"decode_wav: truncated {tag!r} chunk")
        if tag == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack(
                "<HHIIHH", chunk[:16]
            )
            if (audio_fmt, channels, bits) != (1, 1, 16):
                raise ValueError(
                    "decode_wav: only PCM 16-bit mono supported; got "
                    f"fmt={audio_fmt} channels={channels} bits={bits}"
                )
        elif tag == b"data":
            data = chunk
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if rate is None or data is None:
        raise ValueError("decode_wav: missing fmt/data chunk")
    if len(data) % 2:
        raise ValueError("decode_wav: odd data length for int16 samples")
    return np.frombuffer(data, dtype="<i2"), rate


# ---------------------------------------------------------------------------
# real COMPRESSED lossless audio codec: FLAC (16-bit mono, fixed
# predictors + Rice residuals) — stdlib + numpy only.
#
# FLAC is to audio what PNG is to images: genuinely compressed yet
# LOSSLESS, so the decode contract is bit-exact sample recovery — the
# strongest testable claim a codec can make. Scope (all legal FLAC):
# 16-bit mono, CONSTANT / VERBATIM / FIXED(0-4) subframes chosen per
# block by residual cost, one Rice partition per subframe, explicit
# 16-bit per-frame blocksize, CRC-8 frame headers + CRC-16 frames +
# STREAMINFO MD5 of the raw samples all written AND verified. LPC
# subframes and stereo decorrelation are encoder quality features a
# decoder of this profile never sees; perceptual codecs (MP3/AAC)
# remain the honest stub. Spec: xiph.org FLAC format (RFC 9639).


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = (
                ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
            )
    return crc


def _utf8_frame_number(n: int) -> bytes:
    """FLAC's UTF-8-style frame-number coding (RFC 9639 §9.1.5):
    shortest-form, like real UTF-8 — overlong encodings are invalid."""
    if n < 0x80:
        return bytes([n])
    for nbytes, limit in ((2, 1 << 11), (3, 1 << 16), (4, 1 << 21), (5, 1 << 26), (6, 1 << 31)):
        if n < limit:
            cont = nbytes - 1
            lead = ((0xFF << (8 - nbytes)) & 0xFF) | (n >> (6 * cont))
            return bytes(
                [lead]
                + [0x80 | ((n >> (6 * i)) & 0x3F) for i in range(cont - 1, -1, -1)]
            )
    raise ValueError("_utf8_frame_number: frame number too large")


_FLAC_FIXED_COEFS = [
    [],
    [1],
    [2, -1],
    [3, -3, 1],
    [4, -6, 4, -1],
]


def encode_flac(samples: np.ndarray, sample_rate: int = 16_000) -> bytes:
    """Encode a 1-D int16 array as 16-bit mono FLAC: per 4096-sample
    block pick CONSTANT / best FIXED(0-4) / VERBATIM by actual coded
    cost, Rice-code the residuals (param chosen by exact bit count),
    and wrap in spec frames (sync, UTF-8 frame number, CRC-8, CRC-16)
    under a STREAMINFO carrying the true raw-sample MD5."""
    import hashlib
    import struct

    if samples.ndim != 1 or samples.dtype != np.int16:
        raise ValueError("encode_flac expects a 1-D int16 array")
    block = 4096
    n = len(samples)

    class BW:
        def __init__(self) -> None:
            self.buf = bytearray()
            self.acc = 0
            self.nbits = 0

        def put(self, value: int, length: int) -> None:
            self.acc = (self.acc << length) | (value & ((1 << length) - 1))
            self.nbits += length
            while self.nbits >= 8:
                self.buf.append((self.acc >> (self.nbits - 8)) & 0xFF)
                self.nbits -= 8

        def pad(self) -> None:
            if self.nbits:
                self.put(0, 8 - self.nbits)

    def rice_cost(u: np.ndarray, k: int) -> int:
        return int(np.sum(u >> k)) + len(u) * (k + 1)

    def best_rice(u: np.ndarray) -> tuple[int, int]:
        best_k, best_c = 0, rice_cost(u, 0)
        for k in range(1, 15):
            c = rice_cost(u, k)
            if c < best_c:
                best_k, best_c = k, c
        return best_k, best_c

    frames = bytearray()
    for fi, start in enumerate(range(0, n, block)):
        x = samples[start : start + block].astype(np.int64)
        bs = len(x)
        # choose subframe: constant / fixed orders with cost / verbatim
        choice: tuple = ("verbatim",)
        best_bits = bs * 16
        if np.all(x == x[0]):
            choice = ("constant",)
        else:
            for order in range(0, 5):
                if bs <= order:
                    break
                res = x.copy()
                for _ in range(order):
                    res = np.diff(res)
                u = (np.abs(res) * 2 - (res < 0)).astype(np.int64)
                k, cost = best_rice(u)
                total = order * 16 + 2 + 4 + 4 + cost
                if total < best_bits:
                    best_bits = total
                    choice = ("fixed", order, res, k)

        bw = BW()
        bw.put(0b11111111111110, 14)
        bw.put(0, 1)  # reserved
        bw.put(0, 1)  # fixed-blocksize stream
        bw.put(0b0111, 4)  # blocksize: 16-bit value - 1 at header end
        bw.put(0b0000, 4)  # sample rate: from STREAMINFO
        bw.put(0b0000, 4)  # channels: mono
        bw.put(0b100, 3)  # sample size: 16 bits
        bw.put(0, 1)  # reserved
        for byte in _utf8_frame_number(fi):
            bw.put(byte, 8)
        bw.put(bs - 1, 16)
        header = bytes(bw.buf)
        assert bw.nbits == 0
        bw.put(_crc8(header), 8)

        bw.put(0, 1)  # subframe: zero pad
        if choice[0] == "constant":
            bw.put(0b000000, 6)
            bw.put(0, 1)  # no wasted bits
            bw.put(int(x[0]), 16)
        elif choice[0] == "verbatim":
            bw.put(0b000001, 6)
            bw.put(0, 1)
            for v in x:
                bw.put(int(v), 16)
        else:
            _, order, res, k = choice
            bw.put(0b001000 | order, 6)
            bw.put(0, 1)
            for v in x[:order]:  # warmup
                bw.put(int(v), 16)
            bw.put(0b00, 2)  # rice method, 4-bit params
            bw.put(0, 4)  # partition order 0: one partition
            bw.put(k, 4)
            for r in res:
                u = int(r) * 2 if r >= 0 else -int(r) * 2 - 1
                q = u >> k
                if q:
                    bw.put(0, q)  # unary quotient: q zeros ...
                bw.put(1, 1)  # ... then the terminating 1
                if k:
                    bw.put(u, k)
        bw.pad()
        frame = bytes(bw.buf)
        frames += frame + struct.pack(">H", _crc16(frame))

    md5 = hashlib.md5(samples.astype("<i2").tobytes()).digest()
    info = BW()
    info.put(block, 16)
    info.put(block, 16)
    info.put(0, 24)  # min frame size unknown
    info.put(0, 24)  # max frame size unknown
    info.put(sample_rate, 20)
    info.put(0, 3)  # channels - 1
    info.put(15, 5)  # bits per sample - 1
    info.put(n, 36)
    streaminfo = bytes(info.buf) + md5
    header = b"\x80\x00\x00\x22" + streaminfo  # last-block flag | type 0
    return b"fLaC" + header + bytes(frames)


def decode_flac(content: bytes) -> tuple[np.ndarray, int]:
    """REAL decode of a 16-bit mono FLAC stream: STREAMINFO, per-frame
    sync + UTF-8 frame number + CRC-8 header check, CONSTANT/VERBATIM/
    FIXED subframes with Rice residual decoding and predictor
    reconstruction, CRC-16 frame check, and a final MD5 verification of
    the reconstructed samples against STREAMINFO — lossless means the
    decoder can PROVE it got every sample back. Returns
    (samples, sample_rate); raises ValueError loudly on anything
    outside the profile (stereo, LPC, 24-bit) or any checksum mismatch."""
    import hashlib
    import struct

    if content[:4] != b"fLaC":
        raise ValueError("decode_flac: missing fLaC magic")
    pos = 4
    streaminfo = None
    while True:
        if pos + 4 > len(content):
            raise ValueError("decode_flac: truncated metadata")
        head = content[pos]
        (size,) = struct.unpack(">I", b"\x00" + content[pos + 1 : pos + 4])
        body = content[pos + 4 : pos + 4 + size]
        if head & 0x7F == 0:
            streaminfo = body
        pos += 4 + size
        if head & 0x80:
            break
    if streaminfo is None or len(streaminfo) != 34:
        raise ValueError("decode_flac: missing/odd STREAMINFO")
    sample_rate = int.from_bytes(streaminfo[10:13], "big") >> 4
    channels = ((streaminfo[12] >> 1) & 0x07) + 1
    bits = (((streaminfo[12] & 0x01) << 4) | (streaminfo[13] >> 4)) + 1
    total = int.from_bytes(streaminfo[13:18], "big") & ((1 << 36) - 1)
    md5_expect = streaminfo[18:34]
    if channels != 1 or bits != 16:
        raise ValueError(
            f"decode_flac: only 16-bit mono supported ({channels}ch {bits}b)"
        )

    class BR:
        def __init__(self, data: bytes, start: int) -> None:
            self.data = data
            self.bytepos = start
            self.acc = 0
            self.nbits = 0

        def take(self, length: int) -> int:
            while self.nbits < length:
                if self.bytepos >= len(self.data):
                    raise ValueError("decode_flac: bitstream truncated")
                self.acc = (self.acc << 8) | self.data[self.bytepos]
                self.bytepos += 1
                self.nbits += 8
            out = (self.acc >> (self.nbits - length)) & ((1 << length) - 1)
            self.nbits -= length
            return out

        def unary(self) -> int:
            q = 0
            while self.take(1) == 0:
                q += 1
            return q

        def align(self) -> None:
            self.nbits -= self.nbits % 8
            # any padding bits must be zero per spec; tolerated silently

    out: list[np.ndarray] = []
    while pos < len(content):
        frame_start = pos
        br = BR(content, pos)
        if br.take(14) != 0b11111111111110:
            raise ValueError(f"decode_flac: lost frame sync at {pos}")
        br.take(1)
        br.take(1)
        bs_code = br.take(4)
        sr_code = br.take(4)
        ch_code = br.take(4)
        ss_code = br.take(3)
        br.take(1)
        if ch_code != 0 or ss_code != 0b100 or sr_code != 0:
            raise ValueError("decode_flac: frame outside the mono/16-bit profile")
        lead = br.take(8)  # UTF-8 frame number (value unused; length varies)
        extra = 0
        if lead >= 0xC0:
            mask = 0x20
            extra = 1
            while lead & mask:
                extra += 1
                mask >>= 1
        for _ in range(extra):
            if br.take(8) & 0xC0 != 0x80:
                raise ValueError("decode_flac: bad UTF-8 frame number")
        if bs_code == 0b0111:
            bs = br.take(16) + 1
        elif bs_code == 0b0110:
            bs = br.take(8) + 1
        else:
            raise ValueError("decode_flac: only explicit blocksize supported")
        header_len = br.bytepos - frame_start
        if _crc8(content[frame_start : frame_start + header_len]) != br.take(8):
            raise ValueError("decode_flac: frame header CRC-8 mismatch")

        br.take(1)
        sub = br.take(6)
        if br.take(1):
            raise ValueError("decode_flac: wasted bits unsupported")

        def signed(v: int, nbits: int) -> int:
            return v - (1 << nbits) if v >> (nbits - 1) else v

        if sub == 0b000000:
            x = np.full(bs, signed(br.take(16), 16), dtype=np.int64)
        elif sub == 0b000001:
            x = np.array([signed(br.take(16), 16) for _ in range(bs)], dtype=np.int64)
        elif 0b001000 <= sub <= 0b001100:
            order = sub & 0x07
            warm = [signed(br.take(16), 16) for _ in range(order)]
            if br.take(2) != 0b00:
                raise ValueError("decode_flac: only 4-bit rice supported")
            part_order = br.take(4)
            res: list[int] = []
            n_parts = 1 << part_order
            for p in range(n_parts):
                k = br.take(4)
                if k == 0b1111:
                    raise ValueError("decode_flac: rice escape unsupported")
                cnt = bs >> part_order
                if p == 0:
                    cnt -= order
                for _ in range(cnt):
                    u = (br.unary() << k) | (br.take(k) if k else 0)
                    res.append((u >> 1) ^ -(u & 1))
            x = np.empty(bs, dtype=np.int64)
            x[:order] = warm
            coefs = _FLAC_FIXED_COEFS[order]
            for i in range(order, bs):
                x[i] = res[i - order] + sum(
                    c * x[i - 1 - j] for j, c in enumerate(coefs)
                )
        else:
            raise ValueError(f"decode_flac: LPC subframe {sub:#08b} unsupported")
        br.align()
        frame_bytes = content[frame_start : br.bytepos]
        (crc,) = struct.unpack(">H", content[br.bytepos : br.bytepos + 2])
        if _crc16(frame_bytes) != crc:
            raise ValueError("decode_flac: frame CRC-16 mismatch")
        pos = br.bytepos + 2
        out.append(x)

    samples = (
        np.concatenate(out) if out else np.zeros(0, dtype=np.int64)
    ).astype(np.int16)
    if len(samples) != total:
        raise ValueError(
            f"decode_flac: sample count {len(samples)} != STREAMINFO {total}"
        )
    if md5_expect != b"\x00" * 16:
        if hashlib.md5(samples.astype("<i2").tobytes()).digest() != md5_expect:
            raise ValueError("decode_flac: decoded-sample MD5 mismatch")
    return samples, sample_rate


def synth_audio(media_id: int, n_samples: int) -> np.ndarray:
    """Deterministic synthetic int16 audio: sample t of clip i is
    ``((i*31 + t*17) % 65536) - 32768`` — the one definition the WAV
    oracle's SQL twin mirrors (the synth_image convention)."""
    t = np.arange(n_samples, dtype=np.int64)
    return ((int(media_id) * 31 + t * 17) % 65536 - 32768).astype(np.int16)


# ---------------------------------------------------------------------------
# real uncompressed video container: YUV4MPEG2 (mono plane) — stdlib only
#
# Y4M is PPM's moving-picture sibling: a text header, then per frame a
# "FRAME\n" marker + raw plane bytes. Parsing it exercises the real
# video plumbing (header, frame stride, frame sampling on DECODED
# frames); compressed video (H.264/VP9/AV1) stays honestly stubbed.


def encode_y4m(frames: np.ndarray, fps: int = 25) -> bytes:
    """Encode an (n_frames, h, w) uint8 luma array as YUV4MPEG2 with a
    mono colourspace (one plane per frame)."""
    if frames.ndim != 3 or frames.dtype != np.uint8:
        raise ValueError("encode_y4m expects an (n, h, w) uint8 array")
    n, h, w = frames.shape
    head = f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode("ascii")
    parts = [head]
    for f in range(n):
        parts.append(b"FRAME\n")
        parts.append(frames[f].tobytes())
    return b"".join(parts)


def decode_y4m(content: bytes) -> tuple[np.ndarray, int]:
    """REAL decode of a mono-plane YUV4MPEG2 stream: parse the
    parameter header (W/H/F tags), then walk FRAME markers and view
    each raw plane as an (h, w) uint8 frame. Returns (frames, fps).
    Raises ValueError on malformed structure or a non-mono
    colourspace — fail loud, never silently misread."""
    nl = content.find(b"\n")
    if nl < 0 or not content.startswith(b"YUV4MPEG2"):
        raise ValueError("decode_y4m: not a YUV4MPEG2 stream")
    w = h = fps = None
    colour = "420"  # the spec's default when no C tag is present
    for tok in content[:nl].decode("ascii", "replace").split()[1:]:
        if tok[0] == "W":
            w = int(tok[1:])
        elif tok[0] == "H":
            h = int(tok[1:])
        elif tok[0] == "F":
            fps = int(tok[1:].split(":")[0])
        elif tok[0] == "C":
            colour = tok[1:]
    if not w or not h or not fps:
        raise ValueError("decode_y4m: missing W/H/F header tags")
    if colour != "mono":
        raise ValueError(
            f"decode_y4m: only Cmono streams supported, got C{colour}"
        )
    frame_bytes, frames, pos = w * h, [], nl + 1
    while pos < len(content):
        fnl = content.find(b"\n", pos)
        if fnl < 0 or content[pos : pos + 5] != b"FRAME":
            raise ValueError("decode_y4m: bad FRAME marker")
        plane = content[fnl + 1 : fnl + 1 + frame_bytes]
        if len(plane) != frame_bytes:
            raise ValueError(
                f"decode_y4m: truncated frame ({len(plane)} of {frame_bytes})"
            )
        frames.append(np.frombuffer(plane, dtype=np.uint8).reshape(h, w))
        pos = fnl + 1 + frame_bytes
    return np.stack(frames), fps


def synth_video(media_id: int, w: int, h: int, n_frames: int) -> np.ndarray:
    """Deterministic synthetic luma frames: byte p of frame f of clip i
    is ``(i*7 + f*11 + p*13) % 256`` (the synth_image convention with a
    frame term)."""
    f = np.arange(n_frames, dtype=np.int64)[:, None]
    p = np.arange(w * h, dtype=np.int64)[None, :]
    return (
        ((int(media_id) * 7 + f * 11 + p * 13) % 256)
        .astype(np.uint8)
        .reshape(n_frames, h, w)
    )


def synth_image(media_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic synthetic RGB test image: byte p of image i is
    ``(i*7 + p*13) % 256`` — the ONE definition of the pixel formula
    the PPM decode/resize oracle queries and their SQL twins mirror
    (a second Python copy once risked silent divergence)."""
    p = np.arange(w * h * 3, dtype=np.int64)
    return ((int(media_id) * 7 + p * 13) % 256).astype(np.uint8).reshape(h, w, 3)


# ---------------------------------------------------------------------------
# real COMPRESSED lossy image codec: baseline JPEG, grayscale — no codec
# library (struct + numpy only). Spec: ITU-T T.81 / ISO 10918-1.
#
# The honest scope line, moved again: grayscale (single-component)
# baseline sequential JPEG is fully implementable here — marker stream,
# canonical Huffman entropy coding, zigzag, DC prediction, 0xFF byte
# stuffing, dequantization, orthonormal 8x8 IDCT. The decoder builds its
# Huffman tables FROM THE PAYLOAD's DHT segments (table-agnostic, per
# spec), so the encoder is free to use simple flat-length canonical
# tables instead of the Annex K defaults — worse compression, identical
# validity, and no 162-constant table to mistranscribe. What remains
# stubbed: color (multi-component + YCbCr) and progressive JPEG, and the
# compressed audio/video codecs — those stay behind decode_media's
# NotImplementedError.
#
# Testability contract (tests/test_jpeg.py): JPEG is lossy only in the
# quantization step; the ENTROPY LAYER IS LOSSLESS. The decoder exposes
# its quantized coefficient blocks (decode_jpeg_gray_blocks), which must
# equal the encoder's bit-for-bit — pinning Huffman/zigzag/DC-
# prediction/stuffing exactly even though pixel round-trips are
# approximate. Flat blocks additionally decode to analytically-known
# flat pixels (only the DC basis function is nonzero).

_JPEG_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# deterministic quantization table (natural order): DC coarse like a
# real table, AC varying so dequantization is exercised per position
_JPEG_QUANT = (16 + (np.arange(64, dtype=np.int64) * 7) % 48).reshape(8, 8)

# orthonormal DCT-II basis: row u of _JPEG_DCT is basis function u;
# forward coef = D @ block @ D.T, inverse block = D.T @ coef @ D
_JPEG_DCT = np.zeros((8, 8))
_JPEG_DCT[0, :] = np.sqrt(1.0 / 8.0)
for _u in range(1, 8):
    _JPEG_DCT[_u, :] = 0.5 * np.cos(
        (2 * np.arange(8) + 1) * _u * np.pi / 16.0
    )

# flat-length canonical Huffman tables (legal JPEG: any prefix-free code
# shipped via DHT works). DC: 12 category symbols, all 4-bit codes
# (12 <= 15 usable 4-bit codes; the all-ones code stays unused, per
# spec). AC: the 162 emittable symbols (EOB, ZRL, run 0-15 x size 1-10),
# all 8-bit codes (162 <= 255 usable).
_JPEG_DC_SYMBOLS = list(range(12))
_JPEG_AC_SYMBOLS = sorted(
    {0x00, 0xF0} | {(run << 4) | size for run in range(16) for size in range(1, 11)}
)
_JPEG_DC_BITS = [0] * 16
_JPEG_DC_BITS[3] = len(_JPEG_DC_SYMBOLS)  # all length 4
_JPEG_AC_BITS = [0] * 16
_JPEG_AC_BITS[7] = len(_JPEG_AC_SYMBOLS)  # all length 8


def _huffman_codes(bits: list[int], symbols: list[int]) -> dict[int, tuple[int, int]]:
    """Canonical Huffman code assignment (T.81 Annex C): symbols in
    table order get consecutive codes per length. Returns
    {symbol: (code, length)}."""
    out: dict[int, tuple[int, int]] = {}
    code, k = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing (T.81 F.1.2.3)
                self.buf.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1-bits, per spec
        return bytes(self.buf)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def take(self, length: int) -> int:
        while self.nbits < length:
            if self.pos >= len(self.data):
                raise ValueError("decode_jpeg_gray: entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data) or self.data[self.pos] != 0x00:
                    raise ValueError(
                        "decode_jpeg_gray: unexpected marker in entropy data"
                    )
                self.pos += 1  # skip the stuffed 0x00
            self.acc = (self.acc << 8) | byte
            self.nbits += 8
        out = (self.acc >> (self.nbits - length)) & ((1 << length) - 1)
        self.nbits -= length
        return out


def _jpeg_category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _jpeg_amplitude_bits(v: int, size: int) -> int:
    # positive: the value itself; negative: v - 1 in `size` low bits
    # (one's-complement convention, T.81 F.1.2.1)
    return v if v >= 0 else v - 1 + (1 << size) if size else 0


def _jpeg_extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def quantize_blocks_gray(img: np.ndarray) -> tuple[np.ndarray, int, int]:
    """The encoder's lossy half, exposed for the entropy-lossless test:
    pad to 8x8 multiples by edge replication, level-shift, DCT, divide
    by the quant table, round half-away-from-zero (T.81 convention).
    Returns (blocks[n_by, n_bx, 8, 8] int32, h, w)."""
    if img.ndim != 2 or img.dtype != np.uint8:
        raise ValueError("quantize_blocks_gray expects an (h, w) uint8 array")
    h, w = img.shape
    ph, pw = -h % 8, -w % 8
    padded = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    padded -= 128.0
    n_by, n_bx = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = np.empty((n_by, n_bx, 8, 8), dtype=np.int32)
    for by in range(n_by):
        for bx in range(n_bx):
            coef = _JPEG_DCT @ padded[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] @ _JPEG_DCT.T
            scaled = coef / _JPEG_QUANT
            blocks[by, bx] = np.trunc(scaled + np.copysign(0.5, scaled)).astype(
                np.int32
            )
    return blocks, h, w


def _entropy_encode_interleaved(planes: list[np.ndarray]) -> bytes:
    """Baseline interleaved scan: per MCU (one 8x8 block per component
    at 1x1 sampling), each component keeps its OWN DC predictor
    (T.81 F.1.1.5.1). One plane = the grayscale scan."""
    dc_codes = _huffman_codes(_JPEG_DC_BITS, _JPEG_DC_SYMBOLS)
    ac_codes = _huffman_codes(_JPEG_AC_BITS, _JPEG_AC_SYMBOLS)
    zz_flat = _JPEG_ZIGZAG
    bw = _BitWriter()
    preds = [0] * len(planes)
    n_by, n_bx = planes[0].shape[:2]
    for by in range(n_by):
        for bx in range(n_bx):
            for ci, blocks in enumerate(planes):
                zz = blocks[by, bx].reshape(64)[zz_flat]
                diff = int(zz[0]) - preds[ci]
                preds[ci] = int(zz[0])
                size = _jpeg_category(diff)
                code, length = dc_codes[size]
                bw.put(code, length)
                if size:
                    bw.put(_jpeg_amplitude_bits(diff, size), size)
                run = 0
                for k in range(1, 64):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        code, length = ac_codes[0xF0]  # ZRL
                        bw.put(code, length)
                        run -= 16
                    size = _jpeg_category(v)
                    code, length = ac_codes[(run << 4) | size]
                    bw.put(code, length)
                    bw.put(_jpeg_amplitude_bits(v, size), size)
                    run = 0
                if run:
                    code, length = ac_codes[0x00]  # EOB
                    bw.put(code, length)
    return bw.flush()


def _jpeg_container(
    h: int, w: int, ncomp: int, scan: bytes,
    sampling: list[tuple[int, int]] | None = None,
) -> bytes:
    import struct

    qt_zz = _JPEG_QUANT.reshape(64)[_JPEG_ZIGZAG].astype(np.uint8).tobytes()
    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(cls: int, bits: list[int], symbols: list[int]) -> bytes:
        return bytes([cls << 4]) + bytes(bits) + bytes(symbols)

    sampling = sampling or [(1, 1)] * ncomp
    sof = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        bytes([cid + 1, (sh << 4) | sv, 0])
        for cid, (sh, sv) in enumerate(sampling)
    )
    sos = bytes([ncomp]) + b"".join(
        bytes([cid + 1, 0x00]) for cid in range(ncomp)
    ) + bytes([0, 63, 0])
    return (
        b"\xff\xd8"
        + seg(0xFFE0, app0)
        + seg(0xFFDB, b"\x00" + qt_zz)
        + seg(0xFFC0, sof)
        + seg(0xFFC4, dht(0, _JPEG_DC_BITS, _JPEG_DC_SYMBOLS))
        + seg(0xFFC4, dht(1, _JPEG_AC_BITS, _JPEG_AC_SYMBOLS))
        + seg(0xFFDA, sos)
        + scan
        + b"\xff\xd9"
    )


def encode_jpeg_gray(img: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 grayscale image as a baseline sequential
    JFIF/JPEG using struct + numpy only: SOI/APP0/DQT/SOF0/DHT/SOS
    marker stream, 8x8 DCT + quantization (:func:`quantize_blocks_gray`),
    zigzag, DC prediction, canonical-Huffman entropy coding with 0xFF
    byte stuffing."""
    blocks, h, w = quantize_blocks_gray(img)
    return _jpeg_container(h, w, 1, _entropy_encode_interleaved([blocks]))


def _clip_round_u8(x: np.ndarray) -> np.ndarray:
    return np.clip(np.rint(x), 0, 255).astype(np.uint8)


def _rgb_to_ycbcr(img: np.ndarray) -> list[np.ndarray]:
    """JFIF (BT.601 full-range) color transform, rounded to uint8
    planes — the lossy-but-standard step between RGB and the per-plane
    DCT pipeline."""
    r, g, b = (img[..., i].astype(np.float64) for i in range(3))
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return [_clip_round_u8(y), _clip_round_u8(cb), _clip_round_u8(cr)]


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    yf, cbf, crf = (p.astype(np.float64) for p in (y, cb, cr))
    r = yf + 1.402 * (crf - 128.0)
    g = yf - 0.344136 * (cbf - 128.0) - 0.714136 * (crf - 128.0)
    b = yf + 1.772 * (cbf - 128.0)
    return np.stack([_clip_round_u8(r), _clip_round_u8(g), _clip_round_u8(b)], axis=-1)


def encode_jpeg_rgb(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB image as a COLOR baseline JFIF/JPEG
    (YCbCr, 4:4:4 — no chroma subsampling, so every MCU is one block
    per component): BT.601 color transform, per-plane DCT/quantization,
    interleaved entropy scan with per-component DC predictors."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg_rgb expects an (h, w, 3) uint8 array")
    planes = [quantize_blocks_gray(p)[0] for p in _rgb_to_ycbcr(img)]
    h, w = img.shape[:2]
    return _jpeg_container(h, w, 3, _entropy_encode_interleaved(planes))


def downsample_420(plane: np.ndarray) -> np.ndarray:
    """2x2 chroma downsample with exact integer round-half-up mean
    ((a+b+c+d+2)//4) — deterministic, no float path.  Requires even
    dimensions (the 4:2:0 encoder's 16-multiple contract guarantees
    them)."""
    h, w = plane.shape
    if h % 2 or w % 2:
        raise ValueError("downsample_420 expects even dimensions")
    p = plane.astype(np.int64)
    s = p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2]
    return ((s + 2) // 4).astype(np.uint8)


def _entropy_encode_420(
    y_blocks: np.ndarray, cb_blocks: np.ndarray, cr_blocks: np.ndarray
) -> bytes:
    """Baseline interleaved 4:2:0 scan: per MCU four Y blocks
    (left-to-right, top-to-bottom) then Cb then Cr (T.81 A.2.3), each
    component with its OWN DC predictor."""
    dc_codes = _huffman_codes(_JPEG_DC_BITS, _JPEG_DC_SYMBOLS)
    ac_codes = _huffman_codes(_JPEG_AC_BITS, _JPEG_AC_SYMBOLS)
    bw = _BitWriter()
    preds = [0, 0, 0]

    def put_block(block: np.ndarray, ci: int) -> None:
        zz = block.reshape(64)[_JPEG_ZIGZAG]
        diff = int(zz[0]) - preds[ci]
        preds[ci] = int(zz[0])
        size = _jpeg_category(diff)
        code, length = dc_codes[size]
        bw.put(code, length)
        if size:
            bw.put(_jpeg_amplitude_bits(diff, size), size)
        run = 0
        for k in range(1, 64):
            v = int(zz[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, length = ac_codes[0xF0]  # ZRL
                bw.put(code, length)
                run -= 16
            size = _jpeg_category(v)
            code, length = ac_codes[(run << 4) | size]
            bw.put(code, length)
            bw.put(_jpeg_amplitude_bits(v, size), size)
            run = 0
        if run:
            code, length = ac_codes[0x00]  # EOB
            bw.put(code, length)

    n_mby, n_mbx = cb_blocks.shape[:2]
    for mby in range(n_mby):
        for mbx in range(n_mbx):
            for vy in range(2):
                for vx in range(2):
                    put_block(y_blocks[2 * mby + vy, 2 * mbx + vx], 0)
            put_block(cb_blocks[mby, mbx], 1)
            put_block(cr_blocks[mby, mbx], 2)
    return bw.flush()


def encode_jpeg_rgb_420(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB image as a CHROMA-SUBSAMPLED
    (4:2:0) baseline JFIF/JPEG: BT.601 transform, exact-integer 2x2
    chroma downsample, per-plane DCT/quantization, MCU-interleaved
    entropy scan (4 Y + Cb + Cr per MCU).  Dimensions must be
    16-multiples (whole MCUs) — partial-MCU edge extension is a
    documented non-goal, fail loud instead of guessing the padding
    convention."""
    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError("encode_jpeg_rgb_420 expects an (h, w, 3) uint8 array")
    h, w = img.shape[:2]
    if h % 16 or w % 16:
        raise ValueError(
            "encode_jpeg_rgb_420 requires 16-multiple dimensions "
            f"(whole MCUs); got {h}x{w}"
        )
    y, cb, cr = _rgb_to_ycbcr(img)
    y_blocks = quantize_blocks_gray(y)[0]
    cb_blocks = quantize_blocks_gray(downsample_420(cb))[0]
    cr_blocks = quantize_blocks_gray(downsample_420(cr))[0]
    scan = _entropy_encode_420(y_blocks, cb_blocks, cr_blocks)
    return _jpeg_container(h, w, 3, scan, sampling=_SAMPLING_420)


def decode_jpeg_rgb_420(content: bytes, header=None) -> np.ndarray:
    """REAL decode of a 4:2:0 baseline JPEG: the MCU-interleaved
    lossless core, per-plane IDCT, chroma upsample by 2x2 pixel
    replication (the nearest-neighbor upsampler — a decoder-side
    choice T.81 leaves open), inverse BT.601, crop."""
    y_b, cb_b, cr_b, qt, h, w = _decode_jpeg_blocks_420(content, header)
    y = _idct_plane(y_b, qt)
    cb = _idct_plane(cb_b, qt).repeat(2, axis=0).repeat(2, axis=1)
    cr = _idct_plane(cr_b, qt).repeat(2, axis=0).repeat(2, axis=1)
    return _ycbcr_to_rgb(y[: h, : w], cb[: h, : w], cr[: h, : w])


def decode_jpeg_gray_blocks(
    content: bytes,
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """The decoder's LOSSLESS half: parse the marker stream (validating
    every structure — fail loud on progressive/multi-component/16-bit
    payloads, never misread), build the Huffman tables FROM the DHT
    segments, entropy-decode every block with DC prediction, and return
    (quantized coefficient blocks in natural order, quant table, h, w).
    These blocks must equal the encoder's bit-for-bit — the testable
    exactness contract inside a lossy codec."""
    blocks, qt, h, w = _decode_jpeg_blocks(content, expect_ncomp=1)
    return blocks[0], qt, h, w


def _parse_jpeg_header(content: bytes):
    """Marker-stream parse shared by every sampling layout: validates
    each structure (fail loud on progressive/16-bit/restart payloads),
    builds Huffman tables FROM the DHT segments, and returns
    (qt, h, w, ncomp, sampling, huff, tables, scan_at) where sampling
    is the per-component (H, V) factor list from SOF0."""
    import struct

    if content[:2] != b"\xff\xd8":
        raise ValueError("decode_jpeg: missing SOI marker")
    pos = 2
    qt = None
    h = w = ncomp = None
    sampling: list[tuple[int, int]] = []
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    scan_at = None
    tables: list[tuple[int, int]] = []  # per scan component: (Td, Ta)
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"decode_jpeg: bad marker at {pos}")
        marker = struct.unpack(">H", content[pos : pos + 2])[0]
        (length,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        payload = content[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError(f"decode_jpeg: truncated segment {marker:#x}")
        if marker == 0xFFDB:
            if payload[0] != 0x00:
                raise ValueError(
                    "decode_jpeg: only 8-bit quant table 0 supported"
                )
            qt = np.zeros(64, dtype=np.int64)
            qt[_JPEG_ZIGZAG] = np.frombuffer(payload[1:65], dtype=np.uint8)
            qt = qt.reshape(8, 8)
        elif marker == 0xFFC0:
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or ncomp not in (1, 3):
                raise ValueError(
                    "decode_jpeg: only 8-bit 1- or 3-component baseline "
                    f"supported (prec={prec} ncomp={ncomp})"
                )
            sampling = []
            for ci in range(ncomp):
                hv = payload[6 + 3 * ci + 1]
                if payload[6 + 3 * ci + 2]:
                    raise ValueError(
                        "decode_jpeg: only quant table 0 supported"
                    )
                sampling.append((hv >> 4, hv & 0x0F))
        elif marker in (0xFFC1, 0xFFC2, 0xFFC3):
            raise ValueError(
                "decode_jpeg: only baseline sequential (SOF0) supported"
            )
        elif marker == 0xFFC4:
            off = 0
            while off < len(payload):
                cls, tid = payload[off] >> 4, payload[off] & 0x0F
                bits = list(payload[off + 1 : off + 17])
                n = sum(bits)
                symbols = list(payload[off + 17 : off + 17 + n])
                codes = _huffman_codes(bits, symbols)
                huff[(cls, tid)] = {
                    (code, length): sym for sym, (code, length) in codes.items()
                }
                off += 17 + n
        elif marker == 0xFFDD:
            raise ValueError("decode_jpeg: restart intervals unsupported")
        elif marker == 0xFFDA:
            if ncomp is None or payload[0] != ncomp:
                raise ValueError(
                    "decode_jpeg: scan components != frame components"
                )
            tables = [
                (payload[2 + 2 * ci] >> 4, payload[2 + 2 * ci] & 0x0F)
                for ci in range(ncomp)
            ]
            scan_at = pos + 2 + length
            break
        pos += 2 + length
    if qt is None or h is None or scan_at is None:
        raise ValueError("decode_jpeg: missing DQT/SOF0/SOS")
    for td, ta in tables:
        if (0, td) not in huff or (1, ta) not in huff:
            raise ValueError("decode_jpeg: missing DC/AC Huffman tables")
    return qt, h, w, ncomp, sampling, huff, tables, scan_at


def _entropy_reader(content: bytes, scan_at: int) -> "_BitReader":
    eoi = content.rfind(b"\xff\xd9")
    if eoi < 0:
        raise ValueError("decode_jpeg: missing EOI marker")
    return _BitReader(content[scan_at:eoi])


def _read_symbol(br: "_BitReader", table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 16:
        code = (code << 1) | br.take(1)
        length += 1
        sym = table.get((code, length))
        if sym is not None:
            return sym
    raise ValueError("decode_jpeg: invalid Huffman code")


def _decode_one_block(
    br: "_BitReader",
    huff: dict,
    td: int,
    ta: int,
    pred: int,
) -> tuple[np.ndarray, int]:
    """Entropy-decode ONE 8x8 block (natural order) given the
    component's DC predictor; returns (block, updated predictor)."""
    zz = np.zeros(64, dtype=np.int32)
    size = _read_symbol(br, huff[(0, td)])
    pred += _jpeg_extend(br.take(size) if size else 0, size)
    zz[0] = pred
    k = 1
    while k < 64:
        sym = _read_symbol(br, huff[(1, ta)])
        if sym == 0x00:  # EOB
            break
        run, size = sym >> 4, sym & 0x0F
        if size == 0:
            if run != 15:
                raise ValueError(f"decode_jpeg: bad AC symbol {sym:#x}")
            k += 16  # ZRL
            # k == 64 is a block exactly filled with zeros (legal);
            # past it the stream is malformed — fail loud, same
            # contract as the nonzero-run check below (ADVICE r8)
            if k > 64:
                raise ValueError("decode_jpeg: AC run past block end")
            continue
        k += run
        if k > 63:
            raise ValueError("decode_jpeg: AC run past block end")
        zz[k] = _jpeg_extend(br.take(size), size)
        k += 1
    flat = np.zeros(64, dtype=np.int32)
    flat[_JPEG_ZIGZAG] = zz
    return flat.reshape(8, 8), pred


def _decode_jpeg_blocks(
    content: bytes, expect_ncomp: int | None = None, header=None
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Lossless decoder core for the 1x1-sampled layouts: 1 (grayscale)
    or 3 (YCbCr 4:4:4) components, interleaved scan, per-component DC
    predictors and SOS-declared Huffman table ids. Returns
    (blocks[ncomp, n_by, n_bx, 8, 8], quant table, h, w).  4:2:0
    payloads route through :func:`_decode_jpeg_blocks_420`.  ``header``
    accepts a pre-parsed :func:`_parse_jpeg_header` tuple so dispatch
    callers parse the marker stream once (ADVICE r8)."""
    qt, h, w, ncomp, sampling, huff, tables, scan_at = (
        header if header is not None else _parse_jpeg_header(content)
    )
    if any(s != (1, 1) for s in sampling):
        raise ValueError(
            "decode_jpeg: this path decodes 1x1 sampling only "
            f"(got {sampling}); 4:2:0 routes via decode_jpeg dispatch"
        )
    if expect_ncomp is not None and ncomp != expect_ncomp:
        raise ValueError(
            f"decode_jpeg: expected {expect_ncomp} component(s), got {ncomp}"
        )
    br = _entropy_reader(content, scan_at)
    n_by, n_bx = (h + 7) // 8, (w + 7) // 8
    blocks = np.zeros((ncomp, n_by, n_bx, 8, 8), dtype=np.int32)
    preds = [0] * ncomp
    for by in range(n_by):
        for bx in range(n_bx):
            for ci in range(ncomp):
                td, ta = tables[ci]
                blocks[ci, by, bx], preds[ci] = _decode_one_block(
                    br, huff, td, ta, preds[ci]
                )
    return blocks, qt, h, w


_SAMPLING_420 = [(2, 2), (1, 1), (1, 1)]


def _decode_jpeg_blocks_420(
    content: bytes, header=None
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int, int]:
    """Lossless decoder core for 4:2:0 chroma subsampling (SOF0
    sampling factors Y=2x2, Cb=Cr=1x1): per MCU the scan interleaves
    FOUR Y blocks (left-to-right, top-to-bottom) then one Cb and one
    Cr block (T.81 A.2.3 MCU ordering), per-component DC predictors.
    Returns (y_blocks[2*n_mby, 2*n_mbx, 8, 8],
    cb_blocks[n_mby, n_mbx, 8, 8], cr_blocks[...], qt, h, w).
    ``header`` takes a pre-parsed tuple, as in :func:`_decode_jpeg_blocks`."""
    qt, h, w, ncomp, sampling, huff, tables, scan_at = (
        header if header is not None else _parse_jpeg_header(content)
    )
    if ncomp != 3 or sampling != _SAMPLING_420:
        raise ValueError(
            f"decode_jpeg_420: not a 4:2:0 payload (sampling {sampling})"
        )
    br = _entropy_reader(content, scan_at)
    n_mby, n_mbx = (h + 15) // 16, (w + 15) // 16
    y_blocks = np.zeros((2 * n_mby, 2 * n_mbx, 8, 8), dtype=np.int32)
    cb_blocks = np.zeros((n_mby, n_mbx, 8, 8), dtype=np.int32)
    cr_blocks = np.zeros((n_mby, n_mbx, 8, 8), dtype=np.int32)
    preds = [0, 0, 0]
    for mby in range(n_mby):
        for mbx in range(n_mbx):
            for vy in range(2):
                for vx in range(2):
                    td, ta = tables[0]
                    (
                        y_blocks[2 * mby + vy, 2 * mbx + vx],
                        preds[0],
                    ) = _decode_one_block(br, huff, td, ta, preds[0])
            for ci, plane in ((1, cb_blocks), (2, cr_blocks)):
                td, ta = tables[ci]
                plane[mby, mbx], preds[ci] = _decode_one_block(
                    br, huff, td, ta, preds[ci]
                )
    return y_blocks, cb_blocks, cr_blocks, qt, h, w


def _idct_plane(blocks: np.ndarray, qt: np.ndarray) -> np.ndarray:
    n_by, n_bx = blocks.shape[:2]
    out = np.empty((n_by * 8, n_bx * 8), dtype=np.uint8)
    for by in range(n_by):
        for bx in range(n_bx):
            coef = blocks[by, bx].astype(np.float64) * qt
            pix = _JPEG_DCT.T @ coef @ _JPEG_DCT + 128.0
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.rint(pix), 0, 255
            ).astype(np.uint8)
    return out


def decode_jpeg_gray(content: bytes) -> np.ndarray:
    """REAL decode of a grayscale baseline JPEG with struct + numpy
    only: the lossless entropy half (:func:`decode_jpeg_gray_blocks`)
    then dequantize, orthonormal 8x8 IDCT, +128 level shift, clip, and
    crop the edge padding. Lossy codec — pixel round-trips are
    approximate by design; the exactness contract lives at the
    coefficient level."""
    blocks, qt, h, w = decode_jpeg_gray_blocks(content)
    return _idct_plane(blocks, qt)[:h, :w]


def decode_jpeg_rgb(content: bytes) -> np.ndarray:
    """REAL decode of a COLOR (3-component YCbCr 4:4:4) baseline JPEG:
    the shared lossless entropy core, per-plane IDCT, then the inverse
    BT.601 transform back to an (h, w, 3) uint8 RGB raster."""
    blocks, qt, h, w = _decode_jpeg_blocks(content, expect_ncomp=3)
    y, cb, cr = (_idct_plane(blocks[ci], qt) for ci in range(3))
    return _ycbcr_to_rgb(y, cb, cr)[:h, :w]


def decode_jpeg(content: bytes) -> np.ndarray:
    """Dispatch on the frame type, component count AND sampling
    factors: (h, w) for grayscale (sequential OR progressive),
    (h, w, 3) RGB for 4:4:4 and 4:2:0 color — matching
    decode_ppm/decode_png's RGB raster convention.  The marker stream
    is parsed ONCE and the tuple handed to the selected decoder core
    on BOTH branches (ADVICE r8 + r9 — this is the hot
    extract_features mapInPandas path; header work must not double);
    the progressive pre-check (_is_progressive_jpeg) walks segment
    headers only, so it adds no second full parse."""
    if _is_progressive_jpeg(content):
        pheader = _parse_jpeg_progressive(content)
        if pheader[4] == _SAMPLING_420:
            return decode_jpeg_rgb_progressive_420(content, header=pheader)
        blocks, qt, h, w = _decode_jpeg_progressive_blocks(
            content, header=pheader)
        if blocks.shape[0] == 1:
            return _idct_plane(blocks[0], qt)[:h, :w]
        y, cb, cr = (_idct_plane(blocks[ci], qt) for ci in range(3))
        return _ycbcr_to_rgb(y, cb, cr)[:h, :w]
    header = _parse_jpeg_header(content)
    if header[4] == _SAMPLING_420:
        return decode_jpeg_rgb_420(content, header)
    blocks, qt, h, w = _decode_jpeg_blocks(content, header=header)
    if blocks.shape[0] == 1:
        return _idct_plane(blocks[0], qt)[:h, :w]
    y, cb, cr = (_idct_plane(blocks[ci], qt) for ci in range(3))
    return _ycbcr_to_rgb(y, cb, cr)[:h, :w]


# ---------------------------------------------------------------------------
# Progressive JPEG (SOF2), grayscale — r9, closing the last
# implementable codec stub (VERDICT r8 item 2).  The scan script
# exercises BOTH progressive mechanisms of T.81 Annex G: successive
# approximation on DC (a first pass at point transform Al=1 plus one
# refinement bit per block) and spectral selection on AC (the 1-5 and
# 6-63 zigzag bands as separate scans with end-of-band run coding).
# The exactness contract is the same as the baseline/4:2:0 decoders':
# the entropy layer is LOSSLESS, so decoded quantized coefficients are
# bit-equal to the encoder's whatever the scan script sliced them into.

# progressive AC scans additionally emit EOBn symbols ((r << 4) with
# size 0, r = 0..14: a run of 2^r + r-extra-bits end-of-band blocks);
# the flat 8-bit AC alphabet extends with them (176 symbols <= 255
# usable 8-bit codes, same flat-table legality argument as baseline)
_JPEG_ACP_SYMBOLS = sorted(
    set(_JPEG_AC_SYMBOLS) | {r << 4 for r in range(15)}
)
_JPEG_ACP_BITS = [0] * 16
_JPEG_ACP_BITS[7] = len(_JPEG_ACP_SYMBOLS)

# (Ss, Se, Ah, Al) per scan — DC first at Al=1 then its refinement,
# both AC spectral-selection bands first at Al=1, then each band's
# successive-approximation refinement to full precision (a band's
# first scan must precede its refinements; order across bands is free)
_JPEG_PROG_SCANS = (
    (0, 0, 0, 1),
    (0, 0, 1, 0),
    (1, 5, 0, 1),
    (6, 63, 0, 1),
    (1, 5, 1, 0),
    (6, 63, 1, 0),
)


def _prog_zz_blocks(blocks: np.ndarray) -> np.ndarray:
    """(n_by, n_bx, 8, 8) natural-order -> (n_blocks, 64) zigzag-order
    int64, blocks row-major (the non-interleaved single-component scan
    order progressive AC scans use)."""
    n_by, n_bx = blocks.shape[:2]
    return blocks.reshape(n_by * n_bx, 64)[:, _JPEG_ZIGZAG].astype(np.int64)


def _dc_mcu_order_1x1(ncomp: int, nb: int) -> list[tuple[int, int]]:
    """Interleaved DC block order at 1x1 sampling: one block per
    component per MCU, MCUs row-major."""
    return [(ci, b) for b in range(nb) for ci in range(ncomp)]


def _dc_mcu_order_420(n_mby: int, n_mbx: int) -> list[tuple[int, int]]:
    """Interleaved DC block order at 4:2:0 (T.81 A.2.3): per MCU, FOUR
    Y blocks (left-to-right, top-to-bottom) then one Cb and one Cr —
    expressed as (component, flat index in that component's raster)."""
    order: list[tuple[int, int]] = []
    n_ybx = 2 * n_mbx
    for mby in range(n_mby):
        for mbx in range(n_mbx):
            for vy in range(2):
                for vx in range(2):
                    order.append((0, (2 * mby + vy) * n_ybx + 2 * mbx + vx))
            order.append((1, mby * n_mbx + mbx))
            order.append((2, mby * n_mbx + mbx))
    return order


def _encode_dc_scan(
    zzs: list[np.ndarray],
    ah: int,
    al: int,
    bw: "_BitWriter",
    order: list[tuple[int, int]] | None = None,
) -> None:
    """DC scan over 1..N components: progressive DC scans MAY be
    interleaved (T.81 G.1.2.1); *order* is the MCU-interleaved
    (component, block) sequence (defaults to the 1x1 order), each
    component with its OWN predictor."""
    ncomp, nb = len(zzs), zzs[0].shape[0]
    if order is None:
        order = _dc_mcu_order_1x1(ncomp, nb)
    if ah == 0:  # first pass: Huffman-coded diffs of (DC >> Al)
        dc_codes = _huffman_codes(_JPEG_DC_BITS, _JPEG_DC_SYMBOLS)
        preds = [0] * ncomp
        for ci, b in order:
            v = int(zzs[ci][b, 0]) >> al  # arithmetic (G.1.2.1)
            diff = v - preds[ci]
            preds[ci] = v
            size = _jpeg_category(diff)
            code, length = dc_codes[size]
            bw.put(code, length)
            if size:
                bw.put(_jpeg_amplitude_bits(diff, size), size)
    else:  # refinement: one raw bit per block, no Huffman
        for ci, b in order:
            bw.put((int(zzs[ci][b, 0]) >> al) & 1, 1)


def _encode_ac_first_scan(
    zz: np.ndarray, ss: int, se: int, al: int, bw: "_BitWriter"
) -> None:
    """AC first scan for band [ss, se] (G.1.2.2): in-band zero runs via
    ZRL, all-zero tails fold into an end-of-band run coded as EOBn."""
    ac_codes = _huffman_codes(_JPEG_ACP_BITS, _JPEG_ACP_SYMBOLS)
    eobrun = 0

    def flush_eob() -> None:
        nonlocal eobrun
        while eobrun > 0:
            r = min(eobrun.bit_length() - 1, 14)
            code, length = ac_codes[r << 4]
            bw.put(code, length)
            if r:
                bw.put(eobrun - (1 << r), r)
            eobrun -= min(eobrun, (1 << (r + 1)) - 1)

    for b in range(zz.shape[0]):
        # the AC point transform is a SIGN-MAGNITUDE shift (T.81
        # G.1.2.2: |coef| >> Al, sign reattached) — an arithmetic
        # shift would floor negatives toward -inf and the refinement
        # bit could never reassemble them
        raw = zz[b, ss : se + 1]
        band = np.sign(raw) * (np.abs(raw) >> al)
        nz = np.nonzero(band)[0]
        if nz.size == 0:
            eobrun += 1
            if eobrun == 0x7FFF:  # EOB14 ceiling — flush and restart
                flush_eob()
            continue
        flush_eob()
        run = 0
        for k in range(se - ss + 1):
            v = int(band[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                code, length = ac_codes[0xF0]  # ZRL
                bw.put(code, length)
                run -= 16
            size = _jpeg_category(v)
            code, length = ac_codes[(run << 4) | size]
            bw.put(code, length)
            bw.put(_jpeg_amplitude_bits(v, size), size)
            run = 0
        if run:  # zero tail after the last nonzero -> starts an EOB run
            eobrun = 1
    flush_eob()


def _encode_ac_refine_scan(
    zz: np.ndarray, ss: int, se: int, ah: int, al: int, bw: "_BitWriter"
) -> None:
    """AC successive-approximation refinement for band [ss, se]
    (T.81 G.1.2.3, the jcphuff discipline): coefficients newly
    significant at this precision (|coef| >> Al == 1) are coded as
    run/size-1 symbols plus a sign bit; coefficients already nonzero
    at the PRIOR precision each contribute one raw correction bit,
    buffered and appended after the next emitted symbol; blocks with
    nothing newly significant fold into an EOB run whose buffered
    correction bits flush with the EOBn symbol."""
    if ah - al != 1:
        raise ValueError(
            "encode_jpeg_progressive: AC refinement must lower Al by 1"
        )
    ac_codes = _huffman_codes(_JPEG_ACP_BITS, _JPEG_ACP_SYMBOLS)
    eobrun = 0
    be: list[int] = []  # correction bits buffered with the EOB run

    def put_sym(sym: int) -> None:
        code, length = ac_codes[sym]
        bw.put(code, length)

    def flush_eob() -> None:
        nonlocal eobrun
        while eobrun > 0:
            r = min(eobrun.bit_length() - 1, 14)
            put_sym(r << 4)
            if r:
                bw.put(eobrun - (1 << r), r)
            eobrun -= min(eobrun, (1 << (r + 1)) - 1)
        for bit in be:  # buffered correction bits ride the EOBn flush
            bw.put(bit, 1)
        be.clear()

    for b in range(zz.shape[0]):
        raw = zz[b, ss : se + 1]
        absval = np.abs(raw) >> al
        newly = np.nonzero(absval == 1)[0]
        eob = int(newly[-1]) if newly.size else -1  # last newly-signif.
        r = 0
        br: list[int] = []  # correction bits since the last symbol
        for k in range(se - ss + 1):
            t = int(absval[k])
            if t == 0:
                r += 1
                continue
            # ZRLs only where they cannot fold into the EOB run
            while r > 15 and k <= eob:
                flush_eob()
                put_sym(0xF0)
                r -= 16
                for bit in br:
                    bw.put(bit, 1)
                br = []
            if t > 1:  # already nonzero at prior precision
                br.append(t & 1)
                continue
            flush_eob()
            put_sym((r << 4) | 1)
            bw.put(1 if int(raw[k]) >= 0 else 0, 1)  # sign of the new coef
            for bit in br:
                bw.put(bit, 1)
            br = []
            r = 0
        if r > 0 or br:  # block tail folds into the EOB run
            eobrun += 1
            be.extend(br)
            if eobrun == 0x7FFF:
                flush_eob()
    flush_eob()


def _encode_jpeg_progressive(planes: list[np.ndarray], h: int, w: int) -> bytes:
    """Shared SOF2 encoder over 1 (grayscale) or 3 (YCbCr 4:4:4,
    1x1-sampled) quantized component planes: the DC scans interleave
    every component (per-component predictors); each AC scan is
    single-component as T.81 requires in progressive mode, so the
    per-band first/refine script runs once per component."""
    import struct

    ncomp = len(planes)
    zzs = [_prog_zz_blocks(p) for p in planes]

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(cls: int, bits: list[int], symbols: list[int]) -> bytes:
        return bytes([cls << 4]) + bytes(bits) + bytes(symbols)

    qt_zz = _JPEG_QUANT.reshape(64)[_JPEG_ZIGZAG].astype(np.uint8).tobytes()
    app0 = (
        b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    sof2 = struct.pack(">BHHB", 8, h, w, ncomp) + b"".join(
        bytes([ci + 1, 0x11, 0]) for ci in range(ncomp)
    )
    out = (
        b"\xff\xd8"
        + seg(0xFFE0, app0)
        + seg(0xFFDB, b"\x00" + qt_zz)
        + seg(0xFFC2, sof2)
        + seg(0xFFC4, dht(0, _JPEG_DC_BITS, _JPEG_DC_SYMBOLS))
        + seg(0xFFC4, dht(1, _JPEG_ACP_BITS, _JPEG_ACP_SYMBOLS))
    )
    for ss, se, ah, al in _JPEG_PROG_SCANS:
        if ss == 0:  # DC: ONE interleaved scan covering every component
            bw = _BitWriter()
            _encode_dc_scan(zzs, ah, al, bw)
            sos = bytes([ncomp]) + b"".join(
                bytes([ci + 1, 0x00]) for ci in range(ncomp)
            ) + bytes([ss, se, (ah << 4) | al])
            out += seg(0xFFDA, sos) + bw.flush()
        else:  # AC: one single-component scan per component
            for ci in range(ncomp):
                bw = _BitWriter()
                if ah == 0:
                    _encode_ac_first_scan(zzs[ci], ss, se, al, bw)
                else:
                    _encode_ac_refine_scan(zzs[ci], ss, se, ah, al, bw)
                sos = bytes([1, ci + 1, 0x00, ss, se, (ah << 4) | al])
                out += seg(0xFFDA, sos) + bw.flush()
    return out + b"\xff\xd9"


def encode_jpeg_gray_progressive(img: np.ndarray) -> bytes:
    """Encode an (h, w) uint8 grayscale image as a PROGRESSIVE
    JFIF/JPEG (SOF2) with struct + numpy only: the same lossy half as
    baseline (:func:`quantize_blocks_gray`), then the 6-scan script
    ``_JPEG_PROG_SCANS`` — DC successive approximation (first pass +
    refinement bits), AC spectral selection (two bands) and AC
    successive approximation (refinement scans)."""
    blocks, h, w = quantize_blocks_gray(img)
    return _encode_jpeg_progressive([blocks], h, w)


def encode_jpeg_rgb_progressive(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB image as a PROGRESSIVE color
    JFIF/JPEG (SOF2, YCbCr 4:4:4): BT.601 planes through the shared
    6-scan script — interleaved DC scans with per-component
    predictors, per-component AC band/refinement scans."""
    y, cb, cr = _rgb_to_ycbcr(img)
    planes = [quantize_blocks_gray(p)[0] for p in (y, cb, cr)]
    h, w = img.shape[:2]
    return _encode_jpeg_progressive(planes, h, w)


def _parse_jpeg_progressive(content: bytes):
    """Marker-stream parse for a progressive (SOF2) payload — grayscale
    or 1x1-sampled color: validates structure, builds Huffman tables
    from DHT, and returns (qt, h, w, ncomp, sampling, huff, scans) where each
    scan is (comps, ss, se, ah, al, data) and comps is the ordered
    [(component_index, td, ta), ...] of the scan header.  Scan data
    extends to the next unstuffed marker (progressive streams
    interleave SOS segments with entropy data, unlike the single-scan
    baseline)."""
    import struct

    if content[:2] != b"\xff\xd8":
        raise ValueError("decode_jpeg_progressive: missing SOI marker")
    pos = 2
    qt = h = w = ncomp = None
    sampling: list[tuple[int, int]] = []
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    scans: list[tuple] = []
    while pos + 2 <= len(content):
        if content[pos] != 0xFF:
            raise ValueError(f"decode_jpeg_progressive: bad marker at {pos}")
        marker = struct.unpack(">H", content[pos : pos + 2])[0]
        if marker == 0xFFD9:  # EOI
            break
        (length,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        payload = content[pos + 4 : pos + 2 + length]
        if len(payload) != length - 2:
            raise ValueError(
                f"decode_jpeg_progressive: truncated segment {marker:#x}"
            )
        if marker == 0xFFDB:
            if payload[0] != 0x00:
                raise ValueError(
                    "decode_jpeg_progressive: only 8-bit quant table 0 "
                    "supported"
                )
            qt = np.zeros(64, dtype=np.int64)
            qt[_JPEG_ZIGZAG] = np.frombuffer(payload[1:65], dtype=np.uint8)
            qt = qt.reshape(8, 8)
        elif marker == 0xFFC2:
            prec, h, w, ncomp = struct.unpack(">BHHB", payload[:6])
            if prec != 8 or ncomp not in (1, 3):
                raise ValueError(
                    "decode_jpeg_progressive: only 8-bit 1- or "
                    f"3-component supported (prec={prec} ncomp={ncomp})"
                )
            sampling = []
            for ci in range(ncomp):
                hv = payload[6 + 3 * ci + 1]
                sampling.append((hv >> 4, hv & 0x0F))
            if sampling not in ([(1, 1)] * ncomp, _SAMPLING_420):
                raise ValueError(
                    "decode_jpeg_progressive: only 1x1 or 4:2:0 "
                    f"sampling supported (got {sampling})"
                )
        elif marker in (0xFFC0, 0xFFC1, 0xFFC3):
            raise ValueError(
                "decode_jpeg_progressive: sequential frame — use "
                "decode_jpeg"
            )
        elif marker == 0xFFC4:
            off = 0
            while off < len(payload):
                cls, tid = payload[off] >> 4, payload[off] & 0x0F
                bits = list(payload[off + 1 : off + 17])
                n = sum(bits)
                symbols = list(payload[off + 17 : off + 17 + n])
                codes = _huffman_codes(bits, symbols)
                huff[(cls, tid)] = {
                    (code, length): sym
                    for sym, (code, length) in codes.items()
                }
                off += 17 + n
        elif marker == 0xFFDD:
            raise ValueError(
                "decode_jpeg_progressive: restart intervals unsupported"
            )
        elif marker == 0xFFDA:
            ns = payload[0]
            if ncomp is None or ns < 1 or ns > ncomp:
                raise ValueError(
                    "decode_jpeg_progressive: bad scan component count"
                )
            comps = []
            for i in range(ns):
                cs = payload[1 + 2 * i]
                if not 1 <= cs <= ncomp:
                    raise ValueError(
                        "decode_jpeg_progressive: unknown scan component"
                    )
                tdta = payload[2 + 2 * i]
                comps.append((cs - 1, tdta >> 4, tdta & 0x0F))
            ss, se, ahal = (
                payload[1 + 2 * ns],
                payload[2 + 2 * ns],
                payload[3 + 2 * ns],
            )
            ah, al = ahal >> 4, ahal & 0x0F
            data_start = pos + 2 + length
            # entropy data ends at the next UNSTUFFED marker
            p = data_start
            while p + 1 < len(content):
                if content[p] == 0xFF and content[p + 1] != 0x00:
                    break
                p += 2 if content[p] == 0xFF else 1
            scans.append((comps, ss, se, ah, al, content[data_start:p]))
            pos = p
            continue
        pos += 2 + length
    if qt is None or h is None or not scans:
        raise ValueError("decode_jpeg_progressive: missing DQT/SOF2/SOS")
    return qt, h, w, ncomp, sampling, huff, scans


def _decode_ac_first_band(
    br: "_BitReader", table: dict, zz2: np.ndarray, ss: int, se: int,
    al: int,
) -> None:
    """Decode ONE single-component AC band-first scan into *zz2*
    (shape (n_blocks, 64), zigzag order, component-raster block order):
    in-band zero runs via ZRL, EOB runs across blocks, sign-magnitude
    point transform by Al."""
    nb = zz2.shape[0]
    eobrun = 0
    for b in range(nb):
        if eobrun:
            eobrun -= 1
            continue
        k = ss
        while k <= se:
            sym = _read_symbol(br, table)
            r, s = sym >> 4, sym & 0x0F
            if s == 0:
                if r == 15:  # ZRL: 16 zeros inside the band
                    k += 16
                    if k > se + 1:
                        raise ValueError(
                            "decode_jpeg_progressive: ZRL past band end"
                        )
                    continue
                eobrun = (1 << r) - 1 + (br.take(r) if r else 0)
                break
            k += r
            if k > se:
                raise ValueError(
                    "decode_jpeg_progressive: AC run past band end"
                )
            zz2[b, k] = _jpeg_extend(br.take(s), s) << al
            k += 1


def _decode_ac_refine_band(
    br: "_BitReader", table: dict, zz2: np.ndarray, ss: int, se: int,
    al: int,
) -> None:
    """Decode ONE single-component AC successive-approximation
    refinement scan into *zz2* (T.81 G.1.2.3): newly-significant
    coefficients as run/size-1 symbols + sign bit, one correction bit
    per already-nonzero coefficient passed over (including inside EOB
    runs)."""
    nb = zz2.shape[0]
    p1 = 1 << al
    eobrun = 0

    def refine_nonzero(b: int, k: int) -> None:
        # a 1-bit grows the magnitude by p1 toward the coef's sign
        if br.take(1) and (abs(int(zz2[b, k])) & p1) == 0:
            zz2[b, k] += p1 if zz2[b, k] >= 0 else -p1

    for b in range(nb):
        k = ss
        if eobrun == 0:
            while k <= se:
                sym = _read_symbol(br, table)
                r, s = sym >> 4, sym & 0x0F
                newly = 0
                if s:
                    if s != 1:
                        raise ValueError(
                            "decode_jpeg_progressive: refinement size "
                            "must be 1"
                        )
                    newly = p1 if br.take(1) else -p1
                elif r != 15:
                    eobrun = (1 << r) + (br.take(r) if r else 0)
                    break
                # advance over r zero-HISTORY positions, refining
                # nonzero-history ones in passing
                while k <= se:
                    if zz2[b, k] != 0:
                        refine_nonzero(b, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if newly:
                    if k > se:
                        raise ValueError(
                            "decode_jpeg_progressive: refinement run "
                            "past band end"
                        )
                    zz2[b, k] = newly
                k += 1
        if eobrun > 0:
            # blocks inside the EOB run still carry one correction bit
            # per nonzero-history coef
            while k <= se:
                if zz2[b, k] != 0:
                    refine_nonzero(b, k)
                k += 1
            eobrun -= 1


def _decode_jpeg_progressive_blocks(
    content: bytes, header=None,
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """The progressive decoder's LOSSLESS half, 1 or 3 components:
    parse the multi-scan marker stream and apply each scan to the
    per-component coefficient arrays — interleaved DC first/refinement
    with per-component predictors and the point transform, single-
    component AC band scans with EOB-run decoding and successive-
    approximation refinement (T.81 G.1.2.3 correction bits).  Returns
    (blocks[ncomp, n_by, n_bx, 8, 8] natural order, qt, h, w),
    bit-equal to the encoder's quantized blocks.  *header* is an
    optional pre-parsed _parse_jpeg_progressive tuple — decode_jpeg
    already parsed the marker stream for its dispatch, and the hot
    mapInPandas path must not parse twice (ADVICE r9)."""
    qt, h, w, ncomp, sampling, huff, scans = (
        header if header is not None
        else _parse_jpeg_progressive(content)
    )
    if sampling == _SAMPLING_420:
        raise ValueError(
            "decode_jpeg_progressive: 4:2:0 payloads route through "
            "_decode_jpeg_progressive_blocks_420"
        )
    n_by, n_bx = (h + 7) // 8, (w + 7) // 8
    nb = n_by * n_bx
    zz = np.zeros((ncomp, nb, 64), dtype=np.int32)
    for comps, ss, se, ah, al, data in scans:
        br = _BitReader(data)
        if ss == 0:
            if se != 0:
                raise ValueError(
                    "decode_jpeg_progressive: DC scan must have Se=0"
                )
            if ah == 0:
                tables = []
                for _ci, td, _ta in comps:
                    t = huff.get((0, td))
                    if t is None:
                        raise ValueError(
                            "decode_jpeg_progressive: missing DC "
                            "Huffman table"
                        )
                    tables.append(t)
                preds = [0] * len(comps)
                for b in range(nb):
                    for i, (ci, _td, _ta) in enumerate(comps):
                        size = _read_symbol(br, tables[i])
                        preds[i] += _jpeg_extend(
                            br.take(size) if size else 0, size
                        )
                        zz[ci, b, 0] = preds[i] << al
            else:
                if ah - al != 1:
                    raise ValueError(
                        "decode_jpeg_progressive: DC refinement must "
                        "lower Al by exactly 1"
                    )
                for b in range(nb):
                    for ci, _td, _ta in comps:
                        zz[ci, b, 0] |= br.take(1) << al
        else:
            if len(comps) != 1:
                raise ValueError(
                    "decode_jpeg_progressive: progressive AC scans "
                    "are single-component (T.81 G.1)"
                )
            ci, _td, ta = comps[0]
            table = huff.get((1, ta))
            if table is None:
                raise ValueError(
                    "decode_jpeg_progressive: missing AC Huffman table"
                )
            if ah == 0:  # band first scan
                _decode_ac_first_band(br, table, zz[ci], ss, se, al)
            else:  # successive-approximation refinement (G.1.2.3)
                if ah - al != 1:
                    raise ValueError(
                        "decode_jpeg_progressive: AC refinement must "
                        "lower Al by exactly 1"
                    )
                _decode_ac_refine_band(br, table, zz[ci], ss, se, al)
    flat = np.zeros((ncomp, nb, 64), dtype=np.int32)
    for ci in range(ncomp):
        flat[ci][:, _JPEG_ZIGZAG] = zz[ci]
    return flat.reshape(ncomp, n_by, n_bx, 8, 8), qt, h, w


def decode_jpeg_gray_progressive_blocks(
    content: bytes,
) -> tuple[np.ndarray, np.ndarray, int, int]:
    """Grayscale entry point over the shared progressive core: returns
    (blocks[n_by, n_bx, 8, 8], qt, h, w) — the same exactness contract
    as the sequential decoders."""
    blocks, qt, h, w = _decode_jpeg_progressive_blocks(content)
    if blocks.shape[0] != 1:
        raise ValueError(
            "decode_jpeg_gray_progressive: color payload — use "
            "decode_jpeg_rgb_progressive"
        )
    return blocks[0], qt, h, w


def decode_jpeg_gray_progressive(content: bytes) -> np.ndarray:
    """REAL decode of a grayscale PROGRESSIVE JPEG: the multi-scan
    lossless half, then the same dequantize + IDCT + crop as the
    sequential path."""
    blocks, qt, h, w = decode_jpeg_gray_progressive_blocks(content)
    return _idct_plane(blocks, qt)[:h, :w]


def decode_jpeg_rgb_progressive(content: bytes) -> np.ndarray:
    """REAL decode of a COLOR (YCbCr 4:4:4) PROGRESSIVE JPEG: the
    shared multi-scan lossless core over three components, per-plane
    IDCT, inverse BT.601, crop."""
    blocks, qt, h, w = _decode_jpeg_progressive_blocks(content)
    if blocks.shape[0] != 3:
        raise ValueError(
            "decode_jpeg_rgb_progressive: grayscale payload — use "
            "decode_jpeg_gray_progressive"
        )
    y, cb, cr = (_idct_plane(blocks[ci], qt) for ci in range(3))
    return _ycbcr_to_rgb(y, cb, cr)[:h, :w]


def _is_progressive_jpeg(content: bytes) -> bool:
    """Cheap pre-scan-data marker walk: True iff the frame is SOF2.
    Only segment headers are inspected (never entropy data — the walk
    stops at SOS/any SOF), so a 0xFFC2 byte inside compressed data can
    never mislead the dispatch."""
    import struct

    pos = 2
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            return False
        marker = struct.unpack(">H", content[pos : pos + 2])[0]
        if marker == 0xFFC2:
            return True
        if marker in (0xFFC0, 0xFFC1, 0xFFC3, 0xFFDA):
            return False
        (length,) = struct.unpack(">H", content[pos + 2 : pos + 4])
        pos += 2 + length
    return False


# ---------------------------------------------------------------------------
# progressive 4:2:0 (r9, the last JPEG layout): interleaved DC scans
# over the 4-Y-Cb-Cr MCU order, per-component AC scans over each
# component's OWN raster (non-interleaved scans address data units in
# component order, T.81 G.1/A.2.2 — NOT the MCU order)

_JPEG_PROG_SCANS_420 = (
    (0, 0, 0, 1),   # DC first (interleaved), Al=1
    (0, 0, 1, 0),   # DC refinement (interleaved)
    (1, 63, 0, 1),  # per component: full AC band first at Al=1
    (1, 63, 1, 0),  # per component: AC refinement to full precision
)


def encode_jpeg_rgb_progressive_420(img: np.ndarray) -> bytes:
    """Encode an (h, w, 3) uint8 RGB image as a PROGRESSIVE 4:2:0
    chroma-subsampled JFIF/JPEG (SOF2, sampling Y=2x2, Cb=Cr=1x1):
    the same lossy half as the baseline 4:2:0 encoder, then DC scans
    interleaved in MCU order (4 Y, Cb, Cr — per-component predictors,
    successive-approximation split) and per-component AC band +
    refinement scans in component-raster order."""
    import struct

    if img.ndim != 3 or img.shape[2] != 3 or img.dtype != np.uint8:
        raise ValueError(
            "encode_jpeg_rgb_progressive_420 expects (h, w, 3) uint8"
        )
    h, w = img.shape[:2]
    if h % 16 or w % 16:
        raise ValueError(
            "encode_jpeg_rgb_progressive_420: dimensions must be "
            f"multiples of 16 (whole MCUs); got {h}x{w}"
        )
    y, cb, cr = _rgb_to_ycbcr(img)
    planes = [
        quantize_blocks_gray(y)[0],
        quantize_blocks_gray(downsample_420(cb))[0],
        quantize_blocks_gray(downsample_420(cr))[0],
    ]
    zzs = [_prog_zz_blocks(p) for p in planes]
    n_mby, n_mbx = h // 16, w // 16
    order = _dc_mcu_order_420(n_mby, n_mbx)

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">HH", marker, len(payload) + 2) + payload

    def dht(cls: int, bits: list[int], symbols: list[int]) -> bytes:
        return bytes([cls << 4]) + bytes(bits) + bytes(symbols)

    qt_zz = _JPEG_QUANT.reshape(64)[_JPEG_ZIGZAG].astype(np.uint8).tobytes()
    app0 = (
        b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    sof2 = struct.pack(">BHHB", 8, h, w, 3) + b"".join(
        bytes([cid + 1, (sh << 4) | sv, 0])
        for cid, (sh, sv) in enumerate(_SAMPLING_420)
    )
    out = (
        b"\xff\xd8"
        + seg(0xFFE0, app0)
        + seg(0xFFDB, b"\x00" + qt_zz)
        + seg(0xFFC2, sof2)
        + seg(0xFFC4, dht(0, _JPEG_DC_BITS, _JPEG_DC_SYMBOLS))
        + seg(0xFFC4, dht(1, _JPEG_ACP_BITS, _JPEG_ACP_SYMBOLS))
    )
    for ss, se, ah, al in _JPEG_PROG_SCANS_420:
        if ss == 0:
            bw = _BitWriter()
            _encode_dc_scan(zzs, ah, al, bw, order=order)
            sos = bytes([3]) + b"".join(
                bytes([ci + 1, 0x00]) for ci in range(3)
            ) + bytes([ss, se, (ah << 4) | al])
            out += seg(0xFFDA, sos) + bw.flush()
        else:
            for ci in range(3):
                bw = _BitWriter()
                if ah == 0:
                    _encode_ac_first_scan(zzs[ci], ss, se, al, bw)
                else:
                    _encode_ac_refine_scan(zzs[ci], ss, se, ah, al, bw)
                sos = bytes([1, ci + 1, 0x00, ss, se, (ah << 4) | al])
                out += seg(0xFFDA, sos) + bw.flush()
    return out + b"\xff\xd9"


def _decode_jpeg_progressive_blocks_420(
    content: bytes, header=None,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, int, int]:
    """The 4:2:0 progressive decoder's LOSSLESS half: per-component
    coefficient grids (Y at 2x the chroma grid), interleaved DC scans
    walked in MCU order with per-component predictors, AC scans in
    component-raster order via the shared band helpers.  Returns
    (y_blocks[2*n_mby, 2*n_mbx, 8, 8], cb_blocks[n_mby, n_mbx, 8, 8],
    cr_blocks[...], qt, h, w) — bit-equal to the encoder's quantized
    blocks.  *header* is an optional pre-parsed
    _parse_jpeg_progressive tuple (same single-parse contract as the
    full-resolution core)."""
    qt, h, w, ncomp, sampling, huff, scans = (
        header if header is not None
        else _parse_jpeg_progressive(content)
    )
    if ncomp != 3 or sampling != _SAMPLING_420:
        raise ValueError(
            f"decode_jpeg_progressive_420: not a 4:2:0 payload "
            f"({sampling})"
        )
    n_mby, n_mbx = (h + 15) // 16, (w + 15) // 16
    nbs = [4 * n_mby * n_mbx, n_mby * n_mbx, n_mby * n_mbx]
    zzs = [np.zeros((nb, 64), dtype=np.int32) for nb in nbs]
    order = _dc_mcu_order_420(n_mby, n_mbx)
    for comps, ss, se, ah, al, data in scans:
        br = _BitReader(data)
        if ss == 0:
            if se != 0:
                raise ValueError(
                    "decode_jpeg_progressive: DC scan must have Se=0"
                )
            if len(comps) != 3:
                raise ValueError(
                    "decode_jpeg_progressive_420: DC scan must "
                    "interleave all three components"
                )
            if ah == 0:
                tables = {}
                for ci, td, _ta in comps:
                    t = huff.get((0, td))
                    if t is None:
                        raise ValueError(
                            "decode_jpeg_progressive: missing DC "
                            "Huffman table"
                        )
                    tables[ci] = t
                preds = [0, 0, 0]
                for ci, b in order:
                    size = _read_symbol(br, tables[ci])
                    preds[ci] += _jpeg_extend(
                        br.take(size) if size else 0, size
                    )
                    zzs[ci][b, 0] = preds[ci] << al
            else:
                if ah - al != 1:
                    raise ValueError(
                        "decode_jpeg_progressive: DC refinement must "
                        "lower Al by exactly 1"
                    )
                for ci, b in order:
                    zzs[ci][b, 0] |= br.take(1) << al
        else:
            if len(comps) != 1:
                raise ValueError(
                    "decode_jpeg_progressive: progressive AC scans "
                    "are single-component (T.81 G.1)"
                )
            ci, _td, ta = comps[0]
            table = huff.get((1, ta))
            if table is None:
                raise ValueError(
                    "decode_jpeg_progressive: missing AC Huffman table"
                )
            if ah == 0:
                _decode_ac_first_band(br, table, zzs[ci], ss, se, al)
            else:
                if ah - al != 1:
                    raise ValueError(
                        "decode_jpeg_progressive: AC refinement must "
                        "lower Al by exactly 1"
                    )
                _decode_ac_refine_band(br, table, zzs[ci], ss, se, al)
    shapes = [(2 * n_mby, 2 * n_mbx), (n_mby, n_mbx), (n_mby, n_mbx)]
    out = []
    for zz2, (gy, gx) in zip(zzs, shapes):
        flat = np.zeros_like(zz2)
        flat[:, _JPEG_ZIGZAG] = zz2
        out.append(flat.reshape(gy, gx, 8, 8))
    return out[0], out[1], out[2], qt, h, w


def decode_jpeg_rgb_progressive_420(content: bytes,
                                    header=None) -> np.ndarray:
    """REAL decode of a PROGRESSIVE 4:2:0 color JPEG: the multi-scan
    lossless core, per-plane IDCT, 2x2 chroma replication upsample,
    inverse BT.601, crop — the same reconstruction tail as the
    sequential 4:2:0 decoder.  *header* threads decode_jpeg's
    already-parsed marker stream through (single-parse contract)."""
    y_b, cb_b, cr_b, qt, h, w = _decode_jpeg_progressive_blocks_420(
        content, header=header)
    y = _idct_plane(y_b, qt)
    cb = _idct_plane(cb_b, qt).repeat(2, axis=0).repeat(2, axis=1)
    cr = _idct_plane(cr_b, qt).repeat(2, axis=0).repeat(2, axis=1)
    return _ycbcr_to_rgb(y[:h, :w], cb[:h, :w], cr[:h, :w])
