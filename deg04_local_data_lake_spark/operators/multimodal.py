"""Multimodal (image/audio/video) column plumbing
(north star, BASELINE.json; SURVEY.md §7 P3).

Treats media as opaque ``binary`` columns plus a typed metadata struct, with
decode / feature-extraction / frame-sampling as Arrow-batched
``mapInPandas`` stages. The real codecs (PIL/torchaudio/ffmpeg) are NOT in
this container, so ``decode_image``/``decode_audio`` are clearly-marked
stubs raising ``NotImplementedError`` — everything Spark-side (schema,
batch shape, UDF signature, partition behavior) is real and oracle-checked:
the synthetic payloads are deterministic (md5-derived), so the pandas
feature extraction has an exact SQL twin.

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


def decode_image(data: bytes) -> object:
    """STUB — image codecs are not available in this environment.

    The production implementation decodes ``data`` (JPEG/PNG bytes) to an
    ndarray inside the same mapInPandas batch loop used by
    ``image_features_batches`` below; only this function changes.
    """
    raise NotImplementedError("image codec not available in this container")


def decode_audio(data: bytes) -> object:
    """STUB — audio codecs are not available in this environment."""
    raise NotImplementedError("audio codec not available in this container")


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
