"""Multimodal (image/audio/video) column plumbing
(north star, BASELINE.json; SURVEY.md §7 P3).

Treats media as opaque ``binary`` columns plus a typed metadata struct, with
decode / feature-extraction / frame-sampling as Arrow-batched
``mapInPandas`` stages. ``decode_audio``/``decode_image`` are REAL
stdlib+numpy codecs (RIFF/WAVE PCM via ``wave``, uncompressed 24-bit BMP
via ``struct``, 8-bit PNG via ``zlib`` + scanline filters, baseline JPEG
via ``operators/jpeg_codec.py`` — Huffman + dequant + IDCT + YCbCr) — no
PIL/torchaudio/ffmpeg needed. MP3/video remain the documented
rejections (``ValueError`` at the format sniff). The container formats
round-trip bit-exactly and are oracle-checked end to end
(``mm_decode_wav`` / ``mm_decode_bmp`` / ``mm_decode_png`` plant
deterministic md5-derived payloads with exact SQL twins; the lossy
``mm_decode_jpeg`` pins a per-pixel tolerance claim instead — the spec
bounds IDCT conformance, not bitwise output).

Scale notes: ``mapInPandas`` streams Arrow record batches — memory is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``, not partition
size, which is what makes 100 MB-scale media rows workable. Binary columns
should be sized so row groups stay within executor memory; at 100 TB media
lives in its own parquet files (one row group ≈ a few hundred items) with
metadata-only side tables for pruning.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from deg04_local_data_lake_spark.registry import register
from deg04_local_data_lake_spark.sources.readers import load_table

FRAME_BYTES = 16  # synthetic "frame" size inside the 64-byte payload
SAMPLED_FRAMES = (0, 2)


def ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship this package to executors (``addPyFile`` zip).

    The mapInPandas worker functions here are module-level, so cloudpickle
    serializes them BY REFERENCE — Python workers must import
    ``deg04_local_data_lake_spark``. When the driving process runs from a
    different cwd (as the external harness does), the package isn't on the
    workers' path; distributing a zip makes the import work everywhere.
    Idempotent: the zip name embeds a digest of the package sources, so a
    code change produces a NEW zip (a fixed name once served a stale copy
    from an earlier process and workers failed to resolve newly added
    functions); re-adding the same digest is a no-op.
    """
    import hashlib
    import os
    import tempfile
    import zipfile

    import deg04_local_data_lake_spark as pkg

    pkg_dir = os.path.dirname(os.path.abspath(pkg.__file__))
    sources = []
    for root, _dirs, files in os.walk(pkg_dir):
        for f in sorted(files):
            if f.endswith(".py"):
                sources.append(os.path.join(root, f))
    digest = hashlib.md5()
    for full in sorted(sources):
        with open(full, "rb") as fh:
            digest.update(full.encode())
            digest.update(fh.read())
    zpath = os.path.join(
        tempfile.gettempdir(),
        f"deg04_local_data_lake_spark_pkg_{digest.hexdigest()[:12]}.zip",
    )
    if not os.path.exists(zpath):
        tmp = f"{zpath}.{os.getpid()}.tmp"
        with zipfile.ZipFile(tmp, "w") as zf:
            for full in sorted(sources):
                rel = os.path.join(
                    "deg04_local_data_lake_spark", os.path.relpath(full, pkg_dir)
                )
                zf.write(full, rel)
        os.replace(tmp, zpath)
    spark.sparkContext.addPyFile(zpath)


def decode_image(data: bytes) -> dict:
    """Decode an uncompressed 24-bit BMP, an 8-bit PNG, or a baseline
    JPEG (dispatched on the magic bytes) to top-down RGB pixels — real
    stdlib (``struct``/``zlib``)+numpy codecs, no PIL needed. Returns
    ``{"width", "height", "pixels"}`` with ``pixels`` an (H, W, 3) uint8
    ndarray in RGB order (BMP stores BGR, usually bottom-up; PNG rows are
    inflate + per-row filter reconstruction — see :func:`decode_png`;
    JPEG is Huffman + dequant + IDCT + YCbCr→RGB — see
    ``operators/jpeg_codec.py``, round-10). Compressed or paletted BMPs,
    exotic PNGs, non-baseline JPEGs, and other formats (MP3/video — the
    documented remaining rejections) raise ``ValueError`` at the header
    sniff, so a bad row fails loudly instead of producing garbage
    features."""
    import struct

    import numpy as np

    if data[:8] == _PNG_MAGIC:
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        from deg04_local_data_lake_spark.operators.jpeg_codec import (
            decode_jpeg,
        )

        return decode_jpeg(data)
    if len(data) < 54 or data[:2] != b"BM":
        raise ValueError("not a BMP, PNG, or JPEG payload (bad magic)")
    offset = struct.unpack_from("<I", data, 10)[0]
    hdr_size = struct.unpack_from("<I", data, 14)[0]
    if hdr_size < 40:
        raise ValueError(f"unsupported BMP header size {hdr_size}")
    width, height = struct.unpack_from("<ii", data, 18)
    _planes, bpp = struct.unpack_from("<HH", data, 26)
    compression = struct.unpack_from("<I", data, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(
            f"only uncompressed 24-bit BMP supported (bpp={bpp}, "
            f"compression={compression})"
        )
    bottom_up = height > 0
    height = abs(height)
    row_stride = (width * 3 + 3) & ~3  # rows pad to 4-byte multiples
    need = offset + row_stride * height
    if len(data) < need:
        raise ValueError(f"truncated BMP: {len(data)} bytes, need {need}")
    px = np.frombuffer(
        data, dtype=np.uint8, count=row_stride * height, offset=offset
    ).reshape(height, row_stride)[:, : width * 3].reshape(height, width, 3)
    if bottom_up:
        px = px[::-1]
    return {"width": width, "height": height, "pixels": px[..., ::-1].copy()}


def encode_bmp(pixels) -> bytes:
    """Encode an (H, W, 3) uint8 RGB ndarray (top-down) as an
    uncompressed 24-bit bottom-up BMP — the inverse of
    :func:`decode_image`, used to plant REAL container bytes for the
    oracle-checked decode queries."""
    import struct

    import numpy as np

    h, w, _ = pixels.shape
    row_stride = (w * 3 + 3) & ~3
    body = np.zeros((h, row_stride), dtype=np.uint8)
    body[:, : w * 3] = np.asarray(pixels, dtype=np.uint8)[::-1, :, ::-1].reshape(
        h, w * 3
    )
    raw = body.tobytes()
    offset = 14 + 40
    header = struct.pack("<2sIHHI", b"BM", offset + len(raw), 0, 0, offset)
    info = struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(raw), 2835, 2835, 0, 0
    )
    return header + info + raw


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    """PNG Paeth predictor (spec §"Filter type 4: Paeth"), vectorized
    over uint8-as-int arrays: pick whichever of left/up/up-left is
    closest to a + b - c, ties broken left, up, up-left."""
    import numpy as np

    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out.astype(np.uint8)


def decode_png(data: bytes) -> dict:
    """Decode an 8-bit truecolor (or grayscale) non-interlaced PNG with
    stdlib ``zlib`` only: chunk walk with CRC verification, IDAT
    concatenation + inflate, then per-row reconstruction of all five
    scanline filters (None/Sub/Up/Average/Paeth). Returns
    ``{"width", "height", "pixels"}``, pixels (H, W, 3) uint8 RGB
    top-down (grayscale is broadcast to 3 channels; an alpha channel is
    decoded then dropped). Palette, 16-bit, and interlaced PNGs raise
    ``ValueError`` — loud rejection beats silent garbage."""
    import struct
    import zlib

    import numpy as np

    if data[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG payload (bad signature)")
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("truncated PNG chunk")
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            width, height, depth, color, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
            if depth != 8 or color not in (0, 2, 6) or comp or filt or interlace:
                raise ValueError(
                    f"unsupported PNG (depth={depth}, color_type={color}, "
                    f"interlace={interlace}); only 8-bit gray/RGB/RGBA, "
                    "non-interlaced"
                )
            nch = {0: 1, 2: 3, 6: 4}[color]
        elif ctype == b"IDAT":
            idat.extend(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * nch
    if len(raw) != (stride + 1) * height:
        raise ValueError(
            f"PNG scanline payload {len(raw)} != {(stride + 1) * height}"
        )
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.zeros((height, stride), dtype=np.uint8)
    for y in range(height):
        ftype, line = rows[y, 0], rows[y, 1:].copy()
        prev = out[y - 1] if y else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            out[y] = line
        elif ftype == 1:  # Sub: + left (per channel)
            for x in range(stride):
                left = int(line[x - nch]) if x >= nch else 0
                line[x] = (int(line[x]) + left) & 0xFF
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = line + prev
        elif ftype == 3:  # Average
            for x in range(stride):
                left = int(line[x - nch]) if x >= nch else 0
                line[x] = (line[x] + (left + int(prev[x])) // 2) & 0xFF
            out[y] = line
        elif ftype == 4:  # Paeth
            for x in range(stride):
                left = line[x - nch] if x >= nch else np.uint8(0)
                ul = prev[x - nch] if x >= nch else np.uint8(0)
                pred = _paeth(
                    np.asarray(left), np.asarray(prev[x]), np.asarray(ul)
                )
                line[x] = (int(line[x]) + int(pred)) & 0xFF
            out[y] = line
        else:
            raise ValueError(f"PNG filter type {ftype} out of range")
    px = out.reshape(height, width, nch)
    if nch == 1:
        px = np.repeat(px, 3, axis=2)
    elif nch == 4:
        px = px[..., :3]
    return {"width": int(width), "height": int(height), "pixels": px.copy()}


def encode_png(pixels, row_filters=None) -> bytes:
    """Encode an (H, W, 3) uint8 RGB ndarray as a truecolor 8-bit PNG
    (stdlib ``zlib``) — the inverse of :func:`decode_png`. By default
    every scanline uses filter 0 (None); ``row_filters`` forces a filter
    type per row (cycled), which the decode queries use to exercise all
    five reconstruction paths, not just the trivial one."""
    import struct
    import zlib

    import numpy as np

    px = np.asarray(pixels, dtype=np.uint8)
    h, w, nch = px.shape
    if nch != 3:
        raise ValueError(f"encode_png wants (H, W, 3) RGB, got {px.shape}")
    flat = px.reshape(h, w * 3).astype(np.int32)
    lines = bytearray()
    for y in range(h):
        f = int(row_filters[y % len(row_filters)]) if row_filters else 0
        cur = flat[y]
        prev = flat[y - 1] if y else np.zeros(w * 3, dtype=np.int32)
        left = np.zeros(w * 3, dtype=np.int32)
        left[3:] = cur[:-3]
        ul = np.zeros(w * 3, dtype=np.int32)
        ul[3:] = prev[:-3]
        if f == 0:
            enc = cur
        elif f == 1:
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            enc = cur - (left + prev) // 2
        elif f == 4:
            enc = cur - _paeth(
                left.astype(np.uint8), prev.astype(np.uint8), ul.astype(np.uint8)
            )
        else:
            raise ValueError(f"PNG filter type {f} out of range")
        lines.append(f)
        lines.extend((enc & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        _PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(lines), 6))
        + _png_chunk(b"IEND", b"")
    )


def decode_audio(data: bytes) -> dict:
    """Decode a RIFF/WAVE PCM payload via the stdlib ``wave`` module —
    a real codec, no torchaudio/ffmpeg needed. Returns
    ``{"sample_rate", "n_channels", "n_frames", "samples"}`` with
    ``samples`` an int16 ndarray (interleaved when multi-channel).
    Non-WAV bytes and non-16-bit encodings raise ``ValueError``."""
    import io
    import wave

    import numpy as np

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            if w.getsampwidth() != 2:
                raise ValueError(
                    f"only 16-bit PCM supported (width={w.getsampwidth()})"
                )
            n = w.getnframes()
            samples = np.frombuffer(w.readframes(n), dtype="<i2")
            return {
                "sample_rate": w.getframerate(),
                "n_channels": w.getnchannels(),
                "n_frames": n,
                "samples": samples,
            }
    except wave.Error as exc:
        raise ValueError(f"not a WAV payload: {exc}") from None


def encode_wav(samples, sample_rate: int, n_channels: int = 1) -> bytes:
    """Encode int16 samples as RIFF/WAVE PCM bytes (stdlib ``wave``) —
    the inverse of :func:`decode_audio`."""
    import io
    import wave

    import numpy as np

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(np.asarray(samples, dtype="<i2").tobytes())
    return buf.getvalue()


def with_media_columns(docs: DataFrame) -> DataFrame:
    """Attach a deterministic synthetic media payload + metadata struct:
    ``data`` = 4× md5(text) digest (64 bytes), metadata carries fake
    width/height/format derived from doc fields."""
    digest = F.unhex(F.md5("text"))
    return docs.select(
        "doc_id",
        F.concat(digest, digest, digest, digest).alias("data"),
        F.struct(
            ((F.col("n_chars") % 64) + 1).cast("int").alias("width"),
            ((F.col("doc_id") % 48) + 1).cast("int").alias("height"),
            F.lit("fake/raw").alias("format"),
        ).alias("meta"),
    )


def image_features_batches(
    it: Iterator[pd.DataFrame],
) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: per-item byte features. In production the body
    calls ``decode_image`` and computes real features; the Arrow batch
    handling is identical."""
    for pdf in it:
        data = pdf["data"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": data.map(len).astype("int64"),
                "header_hex": data.map(lambda b: b[:4].hex()),
                "byte_sum": data.map(lambda b: int(sum(b))).astype("int64"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
            }
        )


@register(
    "mm_image_features",
    oracle="""
WITH payload AS (
  SELECT doc_id, md5(text) AS m, n_chars FROM documents
),
bytes AS (
  SELECT doc_id,
         4 * CAST(list_sum(list_transform(generate_series(1, 16),
             i -> ('0x' || substr(m, 2*i - 1, 2))::BIGINT)) AS BIGINT) AS byte_sum,
         substr(m, 1, 8) AS header_hex,
         n_chars
  FROM payload
)
SELECT doc_id,
       64::BIGINT AS n_bytes,
       header_hex,
       byte_sum,
       CAST((n_chars % 64) + 1 AS INTEGER) AS width,
       CAST((doc_id % 48) + 1 AS INTEGER) AS height
FROM bytes
""",
)
def mm_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary → features through a real Arrow mapInPandas stage; the
    deterministic payload gives the pandas code an exact SQL oracle."""
    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs).select(
        "doc_id", "data", F.col("meta.width").alias("width"), F.col("meta.height").alias("height")
    )
    return media.mapInPandas(
        image_features_batches,
        schema="doc_id long, n_bytes long, header_hex string, byte_sum long, "
        "width int, height int",
    )


def resize_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: stride-2 byte downsample — the deterministic
    stand-in for an image resize (production: PIL thumbnail inside the same
    loop; batch shape identical)."""
    for pdf in it:
        data = pdf["data"]
        resized = data.map(lambda b: bytes(b[::2]))
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "resized_hex": resized.map(lambda b: b.hex()),
                "orig_bytes": data.map(len).astype("int64"),
                "new_bytes": resized.map(len).astype("int64"),
            }
        )


@register(
    "mm_resize",
    oracle="""
SELECT doc_id,
       list_reduce(list_transform(range(0, 32),
                   i -> substr(repeat(md5(text), 4), 4 * i + 1, 2)),
                   (a, b) -> a || b) AS resized_hex,
       64::BIGINT AS orig_bytes,
       32::BIGINT AS new_bytes
FROM documents
""",
)
def mm_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage: every-other-byte downsample of the packed payload via
    mapInPandas (the resize slot in a decode→resize→encode media pipeline)."""
    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs).select("doc_id", "data")
    return media.mapInPandas(
        resize_batches,
        schema="doc_id long, resized_hex string, orig_bytes long, new_bytes long",
    )


def sample_frames_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: fixed-stride frame sampling from a packed binary
    payload (video-frame analog: production replaces the slice with an
    ffmpeg keyframe extraction; batch shape is the same)."""
    for pdf in it:
        rows = {"doc_id": [], "frame_idx": [], "frame_hex": []}
        for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
            for idx in SAMPLED_FRAMES:
                rows["doc_id"].append(doc_id)
                rows["frame_idx"].append(idx)
                rows["frame_hex"].append(
                    data[idx * FRAME_BYTES : (idx + 1) * FRAME_BYTES].hex()
                )
        yield pd.DataFrame(rows)


@register(
    "mm_frame_sample",
    oracle="""
SELECT doc_id, f.frame_idx,
       substr(repeat(md5(text), 4), 32 * f.frame_idx + 1, 32) AS frame_hex
FROM documents,
     LATERAL (SELECT unnest([0, 2]) AS frame_idx) f
""",
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling (every other 16-byte frame of the 64-byte payload) —
    a row-expanding mapInPandas stage, the shape video pipelines need."""
    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs).select("doc_id", "data")
    return media.mapInPandas(
        sample_frames_batches, schema="doc_id long, frame_idx int, frame_hex string"
    )


N_AUDIO_WINDOWS = 4
WINDOW_SAMPLES = 8  # 32 int16 samples in the 64-byte payload


def audio_window_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: interpret the payload as big-endian int16 PCM
    and emit per-window amplitude stats (production: ``decode_audio`` +
    torchaudio features in the same loop; the windowing/batch shape is
    identical)."""
    import numpy as np

    for pdf in it:
        rows = {
            "doc_id": [], "window_idx": [], "peak_abs": [],
            "sum_abs": [], "mean_abs": [],
        }
        for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
            samples = np.abs(np.frombuffer(data, dtype=">i2").astype(np.int64))
            for wdx in range(N_AUDIO_WINDOWS):
                w = samples[wdx * WINDOW_SAMPLES : (wdx + 1) * WINDOW_SAMPLES]
                s = int(w.sum())
                rows["doc_id"].append(doc_id)
                rows["window_idx"].append(wdx)
                rows["peak_abs"].append(int(w.max()))
                rows["sum_abs"].append(s)
                # /8 is a power of two: the division is exact in IEEE
                rows["mean_abs"].append(s / float(WINDOW_SAMPLES))
        yield pd.DataFrame(rows)


@register(
    "mm_audio_windows",
    oracle="""
WITH payload AS (SELECT doc_id, repeat(md5(text), 4) AS m FROM documents),
u AS (
  SELECT doc_id, wi.window_idx,
         ('0x' || substr(m, 4 * (8 * wi.window_idx + s.i) + 1, 4))::BIGINT AS raw
  FROM payload,
       LATERAL (SELECT unnest([0, 1, 2, 3]) AS window_idx) wi,
       LATERAL (SELECT unnest(generate_series(0, 7)) AS i) s
),
pcm AS (
  SELECT doc_id, window_idx,
         abs(CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END) AS a
  FROM u
)
SELECT doc_id, CAST(window_idx AS INTEGER) AS window_idx,
       CAST(MAX(a) AS BIGINT) AS peak_abs,
       CAST(SUM(a) AS BIGINT) AS sum_abs,
       CAST(SUM(a) AS BIGINT) / 8.0 AS mean_abs
FROM pcm GROUP BY doc_id, window_idx
""",
)
def mm_audio_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio feature plumbing: payload → big-endian int16 PCM → per-window
    peak/sum/mean absolute amplitude via mapInPandas. The byte→sample→
    window pipeline is exactly what a real torchaudio extractor needs;
    only the decode call is stubbed (codecs absent here). Integer sums are
    exact and the /8 mean is an exact power-of-two division, so the SQL
    twin matches bitwise."""
    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs).select("doc_id", "data")
    return media.mapInPandas(
        audio_window_batches,
        schema="doc_id long, window_idx int, peak_abs long, sum_abs long, "
        "mean_abs double",
    )


def wav_roundtrip_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: plant the 64-byte payload as 32 big-endian
    int16 samples, encode them into a REAL RIFF/WAVE container
    (:func:`encode_wav`), then decode with :func:`decode_audio` and emit
    features FROM THE DECODED values only — the oracle checks the full
    encode→container→decode loop, not the planted array."""
    import numpy as np

    for pdf in it:
        rows = {
            "doc_id": [], "sample_rate": [], "n_channels": [],
            "n_frames": [], "sum_abs": [], "peak_abs": [],
        }
        for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
            rate = 8000 + (int(doc_id) % 5) * 2000
            planted = np.frombuffer(data, dtype=">i2")
            dec = decode_audio(encode_wav(planted, rate))
            a = np.abs(dec["samples"].astype(np.int64))
            rows["doc_id"].append(doc_id)
            rows["sample_rate"].append(dec["sample_rate"])
            rows["n_channels"].append(dec["n_channels"])
            rows["n_frames"].append(dec["n_frames"])
            rows["sum_abs"].append(int(a.sum()))
            rows["peak_abs"].append(int(a.max()))
        yield pd.DataFrame(rows)


@register(
    "mm_decode_wav",
    oracle="""
WITH payload AS (SELECT doc_id, repeat(md5(text), 4) AS m FROM documents),
u AS (
  SELECT doc_id, ('0x' || substr(m, 4 * s.i + 1, 4))::BIGINT AS raw
  FROM payload, LATERAL (SELECT unnest(generate_series(0, 31)) AS i) s
),
pcm AS (
  SELECT doc_id,
         abs(CASE WHEN raw >= 32768 THEN raw - 65536 ELSE raw END) AS a
  FROM u
)
SELECT doc_id,
       CAST(8000 + (doc_id % 5) * 2000 AS INTEGER) AS sample_rate,
       CAST(1 AS INTEGER) AS n_channels,
       32::BIGINT AS n_frames,
       CAST(SUM(a) AS BIGINT) AS sum_abs,
       CAST(MAX(a) AS BIGINT) AS peak_abs
FROM pcm GROUP BY doc_id
""",
)
def mm_decode_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real audio decode: payload → PCM → RIFF/WAVE bytes → stdlib
    ``wave`` decode → amplitude features, all inside one Arrow
    mapInPandas stage. The WAV container bytes are real (44-byte RIFF
    header + LE frames); the oracle recomputes the features from the
    planted samples, so any header/endianness/framing bug in either
    codec direction breaks the hash match."""
    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs).select("doc_id", "data")
    return media.mapInPandas(
        wav_roundtrip_batches,
        schema="doc_id long, sample_rate int, n_channels int, "
        "n_frames long, sum_abs long, peak_abs long",
    )


def bmp_roundtrip_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: plant the first 48 payload bytes as a 4x4
    24-bit pixel grid (stored order: bottom-up BGR, i.e. the raw BMP
    body), encode a REAL BMP (:func:`encode_bmp`), decode it back
    (:func:`decode_image`) and emit features from the DECODED pixels."""
    import numpy as np

    for pdf in it:
        rows = {
            "doc_id": [], "width": [], "height": [],
            "pixel_sum": [], "topleft_rgb_hex": [],
        }
        for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
            stored = np.frombuffer(data[:48], dtype=np.uint8).reshape(4, 4, 3)
            rgb_topdown = stored[::-1, :, ::-1]  # body order → image order
            dec = decode_image(encode_bmp(rgb_topdown))
            px = dec["pixels"]
            rows["doc_id"].append(doc_id)
            rows["width"].append(dec["width"])
            rows["height"].append(dec["height"])
            rows["pixel_sum"].append(int(px.astype(np.int64).sum()))
            rows["topleft_rgb_hex"].append(bytes(px[0, 0]).hex())
        yield pd.DataFrame(rows)


@register(
    "mm_decode_bmp",
    oracle="""
WITH payload AS (SELECT doc_id, md5(text) AS m FROM documents),
b AS (
  SELECT doc_id, m,
         list_sum(list_transform(generate_series(1, 16),
             i -> ('0x' || substr(m, 2 * i - 1, 2))::BIGINT)) AS digest_sum
  FROM payload
)
SELECT doc_id,
       CAST(4 AS INTEGER) AS width,
       CAST(4 AS INTEGER) AS height,
       CAST(3 * digest_sum AS BIGINT) AS pixel_sum,
       substr(m, 13, 2) || substr(m, 11, 2) || substr(m, 9, 2)
           AS topleft_rgb_hex
FROM b
""",
)
def mm_decode_bmp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode: payload → 4x4 pixel grid → uncompressed 24-bit
    BMP bytes (54-byte header, bottom-up BGR rows) → stdlib ``struct``
    decode → features, one Arrow mapInPandas stage. ``topleft_rgb_hex``
    pins BOTH the row flip (top-left = last stored row) and the BGR→RGB
    channel swap: payload byte 36..38 is the stored (B,G,R) of the
    top-left pixel, so its RGB hex is digest bytes 6,5,4 — any
    orientation or channel-order bug flips the value."""
    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs).select("doc_id", "data")
    return media.mapInPandas(
        bmp_roundtrip_batches,
        schema="doc_id long, width int, height int, pixel_sum long, "
        "topleft_rgb_hex string",
    )


def png_roundtrip_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: plant the first 48 payload bytes as a 4x4
    top-down RGB grid, encode a REAL PNG with one of each non-trivial
    scanline filter (rows 0..3 use Sub/Up/Average/Paeth), decode it back
    (:func:`decode_png` — inflate + filter reconstruction + CRC checks)
    and emit features from the DECODED pixels only, so a bug in any of
    the four filter paths or in chunk framing breaks the oracle hash."""
    import numpy as np

    for pdf in it:
        rows = {
            "doc_id": [], "width": [], "height": [],
            "pixel_sum": [], "topleft_rgb_hex": [], "png_bytes": [],
        }
        for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
            planted = np.frombuffer(data[:48], dtype=np.uint8).reshape(4, 4, 3)
            blob = encode_png(planted, row_filters=[1, 2, 3, 4])
            dec = decode_image(blob)  # dispatches on the PNG signature
            px = dec["pixels"]
            rows["doc_id"].append(doc_id)
            rows["width"].append(dec["width"])
            rows["height"].append(dec["height"])
            rows["pixel_sum"].append(int(px.astype(np.int64).sum()))
            rows["topleft_rgb_hex"].append(bytes(px[0, 0]).hex())
            rows["png_bytes"].append(len(blob))
        yield pd.DataFrame(rows)


@register(
    "mm_decode_png",
    oracle="""
WITH payload AS (SELECT doc_id, md5(text) AS m FROM documents),
b AS (
  SELECT doc_id, m,
         list_sum(list_transform(generate_series(1, 16),
             i -> ('0x' || substr(m, 2 * i - 1, 2))::BIGINT)) AS digest_sum
  FROM payload
)
SELECT doc_id,
       CAST(4 AS INTEGER) AS width,
       CAST(4 AS INTEGER) AS height,
       CAST(3 * digest_sum AS BIGINT) AS pixel_sum,
       substr(m, 1, 6) AS topleft_rgb_hex
FROM b
""",
)
def mm_decode_png(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real compressed-image decode: payload → 4x4 RGB grid → PNG bytes
    (zlib-deflated IDAT, per-row filters Sub/Up/Average/Paeth, CRC'd
    chunks) → stdlib ``zlib`` decode → features, one Arrow mapInPandas
    stage. Unlike BMP/WAV this exercises a genuinely COMPRESSED
    container: the decoder must inflate and then undo a different
    predictor on every row to recover the planted pixels. The payload is
    4x md5(text), so bytes 0..47 are the digest repeated 3x: pixel_sum =
    3x digest byte sum, and the top-left pixel is digest bytes 0..2 in
    RGB order (no flip/swap — PNG rows are already top-down RGB), both
    recomputed independently by the DuckDB oracle. ``png_bytes`` is
    intentionally NOT selected into the result (deflate output length is
    zlib-version-dependent); the column exists so pytest can assert the
    container really compresses."""
    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs).select("doc_id", "data")
    decoded = media.mapInPandas(
        png_roundtrip_batches,
        schema="doc_id long, width int, height int, pixel_sum long, "
        "topleft_rgb_hex string, png_bytes int",
    )
    return decoded.drop("png_bytes")


def jpeg_roundtrip_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas worker: tile the 64-byte payload to a 16x16 RGB image
    (768 bytes = payload x12), encode a REAL baseline JPEG (DCT +
    quantization + Annex-K Huffman + byte stuffing), decode it back
    through the magic-byte dispatcher (:func:`decode_image` →
    ``jpeg_codec.decode_jpeg``: Huffman + dequant + IDCT + YCbCr→RGB)
    and attest the per-channel error bound against the planted pixels.
    JPEG is lossy by spec, so the hashed claim is the TOLERANCE, plus
    exact decode metadata and the planted checksum."""
    import numpy as np

    from deg04_local_data_lake_spark.operators.jpeg_codec import encode_jpeg

    for pdf in it:
        rows = {
            "doc_id": [], "width": [], "height": [],
            "planted_sum": [], "within_tolerance": [], "jpeg_bytes": [],
        }
        for doc_id, data in zip(pdf["doc_id"], pdf["data"]):
            planted = (
                np.frombuffer(bytes(data) * 12, dtype=np.uint8)[:768]
                .reshape(16, 16, 3)
            )
            blob = encode_jpeg(planted)
            dec = decode_image(blob)  # dispatches on the 0xFFD8 magic
            err = int(
                np.abs(
                    dec["pixels"].astype(np.int64) - planted.astype(np.int64)
                ).max()
            )
            rows["doc_id"].append(doc_id)
            rows["width"].append(dec["width"])
            rows["height"].append(dec["height"])
            rows["planted_sum"].append(int(planted.astype(np.int64).sum()))
            rows["within_tolerance"].append(err <= 6)
            rows["jpeg_bytes"].append(len(blob))
        yield pd.DataFrame(rows)


@register(
    "mm_decode_jpeg",
    oracle="""
WITH payload AS (SELECT doc_id, md5(text) AS m FROM documents),
b AS (
  SELECT doc_id,
         list_sum(list_transform(generate_series(1, 16),
             i -> ('0x' || substr(m, 2 * i - 1, 2))::BIGINT)) AS digest_sum
  FROM payload
)
SELECT doc_id,
       CAST(16 AS INTEGER) AS width,
       CAST(16 AS INTEGER) AS height,
       CAST(48 * digest_sum AS BIGINT) AS planted_sum,
       TRUE AS within_tolerance
FROM b
""",
)
def mm_decode_jpeg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Baseline JPEG decode, driver-attested (round-10, VERDICT r9 task
    #7): payload → 16x16 RGB → REAL baseline JPEG bytes (forward DCT,
    quantization, Annex-K Huffman entropy coding with byte stuffing,
    JFIF markers) → from-scratch decode (``operators/jpeg_codec.py``:
    marker walk, canonical Huffman, dequant, IDCT, YCbCr→RGB) →
    features, one Arrow mapInPandas stage.

    JPEG is LOSSY — the spec bounds IDCT conformance, not bitwise
    output — so unlike the PNG twin the oracle pins a tolerance claim:
    ``within_tolerance`` is TRUE iff every channel of every decoded
    pixel is within 6 of its planted value (measured bound with the
    all-ones quant tables: ≤3). The exact legs — decoded dimensions
    from the SOF0 header and the planted checksum (48x the digest byte
    sum, recomputed independently by DuckDB) — hash alongside it, so a
    decoder that mis-frames, mis-Huffmans, or mis-transforms ANY doc
    breaks the match. MP3 remains the one documented multimodal
    rejection (no offline decode path worth faking)."""
    ensure_workers_can_import(spark)
    docs = load_table(spark, sf_dir, "documents")
    media = with_media_columns(docs).select("doc_id", "data")
    # The entropy codec is per-doc Python CPU (~3.6 ms/doc), and the
    # documents table is a single parquet file at bench scale — without
    # a spread the whole stage runs on one core. Repartitioning
    # 72-byte rows is noise next to the codec cost, and on a real
    # cluster this is exactly how you size a CPU-bound Python stage:
    # by cores, not by input splits. Measured: 5.8 s → ~1 s at sf0.1.
    media = media.repartition(spark.sparkContext.defaultParallelism)
    decoded = media.mapInPandas(
        jpeg_roundtrip_batches,
        schema="doc_id long, width int, height int, planted_sum long, "
        "within_tolerance boolean, jpeg_bytes int",
    )
    return decoded.drop("jpeg_bytes")
