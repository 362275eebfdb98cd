"""Sink operators (SURVEY.md §2.2, K1-K6).

Parquet is the always-available baseline; ``delta`` / ``iceberg`` are format
flags used when the session was built with the matching extension. Writes
are partitioned (never ``coalesce(1)``): at 100 TB output parallelism is the
write throughput, and small-file compaction is a table-service concern
(OPTIMIZE / rewrite_data_files), not an ingest-time ``coalesce``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_lake_table(
    df: DataFrame,
    path_or_name: str,
    fmt: str = "parquet",
    mode: str = "overwrite",
    partition_by: list[str] | None = None,
    merge_schema: bool = False,
    overwrite_schema: bool = False,
    as_table: bool = False,
) -> None:
    """Unified sink covering the reference's write surface:

    - K1 delta/parquet overwrite by path (custom/delta_table_write.py:72-75)
    - K2 ``mergeSchema`` evolution     (financial_dl_etl.py:66,81,99).
      NB: only Delta honors mergeSchema at WRITE time; for plain parquet
      schema union happens at READ (``spark.read.option("mergeSchema",
      "true")``) — the flag is passed through for format parity but parquet
      callers must merge on read, as the pipeline tests do.
    - K3 ``overwriteSchema``           (scratchpads/delta_datalake.py:74)
    - K5 saveAsTable                   (scratchpads/iceberg_data_lake.py:65)
    - K6 partitioned write             (financial_dl_bronze.py:26)
    """
    writer = df.write.format(fmt).mode(mode)
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    if merge_schema:
        writer = writer.option("mergeSchema", "true")
    if overwrite_schema:
        writer = writer.option("overwriteSchema", "true")
    if as_table:
        writer.saveAsTable(path_or_name)
    else:
        writer.save(path_or_name)


def write_iceberg_v2(df: DataFrame, table: str) -> None:
    """K4 DataFrameWriterV2 create-or-replace
    (custom/iceberg_demo_write.py:74-75)."""
    df.writeTo(table).createOrReplace()


def compact_table(
    spark,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    fmt: str = "parquet",
) -> int:
    """Small-file compaction — the table-maintenance service the no-
    ``coalesce(1)`` ingest stance (module docstring) delegates to. Streams
    of appends (CDC microbatches, per-trigger sink files) accumulate files
    far below the optimal scan size; scans then pay per-file open/footer
    costs and lose row-group-level parallelism. Compaction rewrites the
    table into ⌈bytes / target⌉ files of ~``target_file_bytes``.

    The rewrite goes to a side directory first and swaps in with two
    renames (crash leaves either the old or the new table plus garbage to
    sweep — never a half-written table). With Delta/Iceberg wired this is
    ``OPTIMIZE`` / ``rewrite_data_files`` instead, which also gets
    snapshot isolation for concurrent readers. Returns the file count.
    """
    import math
    import os
    import shutil

    size = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _dirs, files in os.walk(path)
        for f in files
        if not f.startswith(("_", "."))
    )
    n_files = max(1, math.ceil(size / target_file_bytes))
    df = spark.read.format(fmt).load(path)
    tmp = f"{path}__compact_tmp"
    df.repartition(n_files).write.format(fmt).mode("overwrite").save(tmp)
    old = f"{path}__compact_old"
    os.rename(path, old)
    os.rename(tmp, path)
    shutil.rmtree(old)
    return n_files


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_by: list[str],
    n_files: int | None = None,
    fmt: str = "parquet",
) -> None:
    """Range-clustered write: ``repartitionByRange`` + ``sortWithinPartitions``
    on the cluster keys before writing.

    The format-agnostic analog of Delta ``OPTIMIZE ZORDER BY`` for a single
    key prefix: each output file covers a narrow key range, so parquet
    min/max stats prune whole files for range predicates on those keys —
    at 100 TB this is the difference between scanning 3 files and 3000 for
    a date-range query. Range partitioning samples the keys, so file sizes
    stay balanced even for skewed distributions.
    """
    cols = [df[c] for c in cluster_by]
    part = (
        df.repartitionByRange(n_files, *cols)
        if n_files
        else df.repartitionByRange(*cols)
    )
    part.sortWithinPartitions(*cols).write.format(fmt).mode("overwrite").save(path)


def zorder_key(col_a, col_b, bits: int = 16):
    """Z-curve (Morton) interleave of two rank-bucketed keys — pure column
    expressions (shift/mask), no UDF.

    Each input must already be bucketed to ``bits`` bits (see
    :func:`write_zordered`); the interleaved key makes lexicographic
    ranges of the output locality-preserving in BOTH dimensions, which is
    what lets parquet min/max file stats prune for predicates on either
    column. This is the format-agnostic core of Delta's OPTIMIZE ZORDER.
    """
    from pyspark.sql import functions as F

    z = F.lit(0).cast("long")
    for i in range(bits):
        z = z.bitwiseOR(
            col_a.bitwiseAND(F.lit(1 << i)) * (1 << i)        # bit i -> 2i
        ).bitwiseOR(
            col_b.bitwiseAND(F.lit(1 << i)) * (1 << (i + 1))  # bit i -> 2i+1
        )
    return z


def write_zordered(
    df,
    path: str,
    cols: tuple[str, str],
    n_files: int = 16,
    bits: int = 8,
    fmt: str = "parquet",
) -> None:
    """Two-dimensional clustered write: bucket both cluster keys to
    ``bits``-bit ranks (ntile keeps buckets balanced under any value
    distribution), interleave them into a Z-curve key, and range-partition
    + sort the output on it.

    vs :func:`write_clustered` (one-dimensional): a date-clustered table
    prunes date predicates only; a Z-ordered (date, user) table prunes
    both date ranges AND user lookups — each file covers a small square of
    the key space instead of a thin stripe. The ntile windows are two
    unpartitioned sorts of the *keys only*; at 100 TB use an approximate
    quantile bucketizer instead (sampled, one pass) — the Z-interleave and
    write path are unchanged.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    a, b = cols
    n_buckets = 1 << bits
    ra = (F.ntile(n_buckets).over(Window.orderBy(F.col(a))) - 1).cast("long")
    rb = (F.ntile(n_buckets).over(Window.orderBy(F.col(b))) - 1).cast("long")
    z = zorder_key(ra, rb, bits)
    (
        df.withColumn("_z", z)
        .repartitionByRange(n_files, F.col("_z"))
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.format(fmt)
        .mode("overwrite")
        .save(path)
    )


# ------------------------------------------------- snapshot versioning
#
# Poor-man's time travel on plain parquet, for environments without the
# Delta/Iceberg jars (this container): each write lands in a fresh
# ``_v=N`` directory and a tiny ``_LATEST`` JSON manifest flips to it via
# atomic rename. Readers resolve the manifest first, so a reader never
# sees a half-written snapshot (single-writer; multi-writer commit races
# need a real table format's log — documented limit, same recovery
# guarantees as Delta's last-checkpoint pointer otherwise). Old snapshots
# stay readable until vacuumed.

_MANIFEST = "_LATEST"


def _manifest_path(path: str) -> str:
    import os

    return os.path.join(path, _MANIFEST)


def write_versioned(df, path: str, fmt: str = "parquet") -> int:
    """Write ``df`` as the next snapshot of the table at ``path`` and
    atomically publish it; returns the new version number."""
    import json
    import os

    os.makedirs(path, exist_ok=True)
    existing = [
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("_v=") and d.split("=", 1)[1].isdigit()
    ]
    version = max(existing, default=0) + 1
    df.write.format(fmt).mode("errorifexists").save(
        os.path.join(path, f"_v={version}")
    )
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "fmt": fmt}, f)
    os.replace(tmp, _manifest_path(path))  # atomic publish
    return version


def read_versioned(spark, path: str, version: int | None = None):
    """Read a snapshot table: latest per the manifest, or ``version`` for
    time travel to any unvacuumed snapshot."""
    import json
    import os

    if version is None:
        with open(_manifest_path(path)) as f:
            version = json.load(f)["version"]
    snap = os.path.join(path, f"_v={version}")
    if not os.path.isdir(snap):
        raise FileNotFoundError(f"no snapshot _v={version} under {path}")
    with open(_manifest_path(path)) as f:
        fmt = json.load(f).get("fmt", "parquet")
    return spark.read.format(fmt).load(snap)


def table_versions(path: str) -> list[int]:
    """All unvacuumed snapshot versions, ascending."""
    import os

    return sorted(
        int(d.split("=", 1)[1])
        for d in os.listdir(path)
        if d.startswith("_v=") and d.split("=", 1)[1].isdigit()
    )


def rollback_versioned(path: str, version: int) -> None:
    """Point the manifest back at an older snapshot (Delta RESTORE)."""
    import json
    import os

    if not os.path.isdir(os.path.join(path, f"_v={version}")):
        raise FileNotFoundError(f"no snapshot _v={version} under {path}")
    with open(_manifest_path(path)) as f:
        fmt = json.load(f).get("fmt", "parquet")
    tmp = _manifest_path(path) + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"version": version, "fmt": fmt}, f)
    os.replace(tmp, _manifest_path(path))


def vacuum_versioned(path: str, keep_last: int = 2) -> list[int]:
    """Drop all but the newest ``keep_last`` snapshots (never the one the
    manifest points at); returns the versions removed."""
    import json
    import os
    import shutil

    with open(_manifest_path(path)) as f:
        current = json.load(f)["version"]
    versions = table_versions(path)
    doomed = [v for v in versions[:-keep_last] if v != current]
    for v in doomed:
        shutil.rmtree(os.path.join(path, f"_v={v}"))
    return doomed


def write_observed(
    df: DataFrame,
    path: str,
    metrics: dict[str, "Column"],
    fmt: str = "parquet",
    mode: str = "overwrite",
) -> dict[str, object]:
    """Write with in-flight quality metrics (``df.observe``): the named
    aggregate expressions are accumulated on the executors WHILE the rows
    stream to the sink — zero extra scans, zero extra shuffles — and
    returned once the write commits.

    This is the 100 TB answer to "audit the load you just wrote": the
    post-hoc alternative re-reads the entire output (a second full scan),
    and the pre-write ``df.agg`` alternative computes the pipeline twice.
    Metrics must be aggregate expressions (count/sum/min/max/...); use the
    exact-decimal builders from functions/portable.py for sums so the
    audit numbers are as reproducible as the queries themselves.

    Batch twin of the streaming path's progress metrics; tested equal to
    separately computed aggregates in tests/test_pipeline.py.
    """
    from pyspark.sql import Observation

    obs = Observation("write_metrics")
    observed = df.observe(obs, *[expr.alias(name) for name, expr in metrics.items()])
    observed.write.format(fmt).mode(mode).save(path)
    return obs.get
