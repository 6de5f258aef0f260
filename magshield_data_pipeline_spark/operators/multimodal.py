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
- the actual codecs (PIL/libsndfile/ffmpeg) are NOT available in this
  environment, so ``decode_media`` is a clearly-marked stub raising
  NotImplementedError, and the shipped feature extractor computes
  deterministic byte-level features (length, md5, nibble checksum, byte
  histogram) — the Spark-side plumbing (schema, batching, UDF
  signature, partitioning) is real and oracle-checked; swapping the
  fake decode for a real codec changes only the inner numpy function.
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
    """Decode a media payload. REAL for uncompressed binary PPM (P6)
    images — :func:`decode_ppm`, pure header parse + byte view, no
    external library. Compressed formats (JPEG/PNG/audio/video) need
    codec libraries (PIL/soundfile/pyav) that are not installed in
    this environment and remain a clearly-marked stub; every caller
    goes through ``extract_features``-style mapInPandas so only this
    function changes when codecs are plugged in."""
    if kind == "image" and content is not None and content[:2] == b"P6":
        return decode_ppm(content)
    raise NotImplementedError(
        f"real {kind} decoding requires a codec library (PIL/soundfile/ffmpeg) "
        "that is not available in this environment; use the deterministic "
        "byte-level features, binary PPM (P6) input, or install a codec"
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
    dependencies. Compressed formats (JPEG/PNG/audio/video) still
    require real codec libraries and remain stubbed."""
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


def synth_image(media_id: int, w: int, h: int) -> np.ndarray:
    """Deterministic synthetic RGB test image: byte p of image i is
    ``(i*7 + p*13) % 256`` — the ONE definition of the pixel formula
    the PPM decode/resize oracle queries and their SQL twins mirror
    (a second Python copy once risked silent divergence)."""
    p = np.arange(w * h * 3, dtype=np.int64)
    return ((int(media_id) * 7 + p * 13) % 256).astype(np.uint8).reshape(h, w, 3)
