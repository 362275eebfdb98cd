"""Round-8 independent re-reader attestation (VERDICT r7 #3).

The jar-gated interop tests (test_jarful_interop.py) skip in this
container and DuckDB's delta/iceberg extensions can't download, so spec
conformance of the from-scratch table layers was argued, not attested.
This module closes that gap OFFLINE: a minimal pure-pyarrow/stdlib
re-reader that parses ``_delta_log/*.json`` (+ parquet checkpoint, DV
sidecars, Z85 inline DVs) and the Iceberg
``vN.metadata.json`` → manifest-list → manifest chain, sharing NO code
with ``sources/`` — including a fresh Avro object-container decoder and
a fresh RoaringBitmapArray decoder written from the public specs. If
these readers reproduce the engine's frames bit-for-bit, a conformant
external reader (delta-spark, iceberg-java, DuckDB) can too, and a
writer/reader bug pair that cancels out inside ``sources/`` cannot hide.

Everything below the fixtures is deliberately duplicative of what
``sources/avro_io.py`` / ``sources/roaring.py`` / ``sources/delta_log.py``
implement — that duplication IS the attestation.
"""

from __future__ import annotations

import json
import os
import struct
import zlib

import numpy as np
import pandas as pd
import pytest

# --------------------------------------------------------------- Avro
# Fresh object-container-file decoder per the Apache Avro 1.11 spec
# (magic Obj\x01, file-metadata map, 16-byte sync, blocks of
# count/size/payload/sync; null + deflate codecs). Test-local: shares
# nothing with sources/avro_io.py.


class _Cursor:
    def __init__(self, buf: bytes):
        self.b = buf
        self.p = 0

    def take(self, n: int) -> bytes:
        out = self.b[self.p : self.p + n]
        if len(out) != n:
            raise ValueError("truncated avro stream")
        self.p += n
        return out

    def zigzag(self) -> int:
        shift = acc = 0
        while True:
            byte = self.b[self.p]
            self.p += 1
            acc |= (byte & 0x7F) << shift
            if not byte & 0x80:
                break
            shift += 7
        return (acc >> 1) ^ -(acc & 1)

    def raw_bytes(self) -> bytes:
        return self.take(self.zigzag())

    def text(self) -> str:
        return self.raw_bytes().decode("utf-8")


def _avro_value(c: _Cursor, schema):
    if isinstance(schema, list):  # union: branch index then value
        return _avro_value(c, schema[c.zigzag()])
    t = schema if isinstance(schema, str) else schema["type"]
    if t == "null":
        return None
    if t in ("long", "int"):
        return c.zigzag()
    if t == "boolean":
        return c.take(1) != b"\x00"
    if t == "string":
        return c.text()
    if t == "bytes":
        return c.raw_bytes()
    if t == "float":
        return struct.unpack("<f", c.take(4))[0]
    if t == "double":
        return struct.unpack("<d", c.take(8))[0]
    if t == "record":
        return {f["name"]: _avro_value(c, f["type"]) for f in schema["fields"]}
    if t == "array":
        out = []
        while True:
            n = c.zigzag()
            if n == 0:
                break
            if n < 0:  # negative count: byte size follows (skippable form)
                c.zigzag()
                n = -n
            for _ in range(n):
                out.append(_avro_value(c, schema["items"]))
        return out
    if t == "map":
        out = {}
        while True:
            n = c.zigzag()
            if n == 0:
                break
            if n < 0:
                c.zigzag()
                n = -n
            for _ in range(n):
                key = c.text()  # key MUST be read before the value
                out[key] = _avro_value(c, schema["values"])
        return out
    raise ValueError(f"unsupported avro type {t!r}")


def avro_container_records(path: str) -> list[dict]:
    with open(path, "rb") as fh:
        c = _Cursor(fh.read())
    if c.take(4) != b"Obj\x01":
        raise ValueError(f"{path}: not an avro object container")
    meta: dict[str, bytes] = {}
    while True:
        n = c.zigzag()
        if n == 0:
            break
        if n < 0:
            c.zigzag()
            n = -n
        for _ in range(n):
            key = c.text()  # key MUST be read before the value
            meta[key] = c.raw_bytes()
    sync = c.take(16)
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null")
    records: list[dict] = []
    while c.p < len(c.b):
        count = c.zigzag()
        payload = c.raw_bytes()
        if codec == b"deflate":
            payload = zlib.decompress(payload, -15)
        elif codec != b"null":
            raise ValueError(f"unsupported codec {codec!r}")
        pc = _Cursor(payload)
        for _ in range(count):
            records.append(_avro_value(pc, schema))
        if c.take(16) != sync:
            raise ValueError(f"{path}: sync marker mismatch")
    return records


# ------------------------------------------------------------- Roaring
# Fresh decoder for the RoaringBitmapArray framing Delta DVs use
# (magic i32 1681511377 | bitmap count i64 | per bitmap: high-32 key u32
# + the standard 32-bit portable stream: cookie 12346, container count,
# (key u16, cardinality-1 u16) pairs, u32 offsets, then array containers
# (u16 values) or 8 KiB bitset containers for cardinality > 4096).
# Test-local: shares nothing with sources/roaring.py.


def _roaring32_values(data: bytes, base: int) -> tuple[list[int], int]:
    cookie, n = struct.unpack_from("<ii", data, base)
    if cookie != 12346:
        raise ValueError(f"unsupported roaring cookie {cookie}")
    pos = base + 8
    keys_cards = [
        struct.unpack_from("<HH", data, pos + 4 * i) for i in range(n)
    ]
    pos += 4 * n
    offsets = [
        struct.unpack_from("<I", data, pos + 4 * i)[0] for i in range(n)
    ]
    pos += 4 * n
    values: list[int] = []
    end = pos
    for (key, card_m1), off in zip(keys_cards, offsets):
        card = card_m1 + 1
        at = base + off
        if card > 4096:  # bitset container, 8 KiB
            words = np.frombuffer(data, dtype="<u8", count=1024, offset=at)
            bits = np.unpackbits(
                words.view(np.uint8), bitorder="little"
            )
            lows = np.nonzero(bits)[0]
            at_end = at + 8192
        else:  # array container
            lows = np.frombuffer(data, dtype="<u2", count=card, offset=at)
            at_end = at + 2 * card
        values.extend((int(key) << 16) | int(v) for v in lows)
        end = max(end, at_end)
    return values, end - base


def roaring_array_values(data: bytes) -> set[int]:
    magic, n = struct.unpack_from("<iq", data, 0)
    if magic != 1681511377:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: set[int] = set()
    for _ in range(n):
        (key,) = struct.unpack_from("<I", data, pos)
        pos += 4
        lows, consumed = _roaring32_values(data, pos)
        pos += consumed
        out |= {(key << 32) | v for v in lows}
    return out


# ----------------------------------------------------------------- Z85
# ZeroMQ 32/Z85 alphabet (the Delta Base85Codec): 5 chars → 4 bytes,
# big-endian base-85. Test-local re-implementation.

_Z85 = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_VAL = {ch: i for i, ch in enumerate(_Z85)}


def z85_decode(text: str, length: int | None = None) -> bytes:
    out = bytearray()
    for i in range(0, len(text), 5):
        acc = 0
        for ch in text[i : i + 5]:
            acc = acc * 85 + _Z85_VAL[ch]
        out += acc.to_bytes(4, "big")
    return bytes(out if length is None else out[:length])


# -------------------------------------------------- independent Delta


def _dv_deleted_rows(table: str, desc: dict) -> set[int]:
    st = desc["storageType"]
    if st == "i":
        bitmap = z85_decode(desc["pathOrInlineDv"], desc["sizeInBytes"])
    elif st == "u":
        enc = desc["pathOrInlineDv"]
        prefix, zuuid = enc[:-20], enc[-20:]
        raw16 = z85_decode(zuuid, 16)
        hx = raw16.hex()
        name = (
            f"deletion_vector_{hx[:8]}-{hx[8:12]}-{hx[12:16]}-"
            f"{hx[16:20]}-{hx[20:]}.bin"
        )
        rel = f"{prefix}/{name}" if prefix else name
        with open(os.path.join(table, rel), "rb") as fh:
            raw = fh.read()
        off = desc.get("offset") or 1
        (size,) = struct.unpack_from(">i", raw, off)
        assert size == desc["sizeInBytes"]
        bitmap = raw[off + 4 : off + 4 + size]
        (crc,) = struct.unpack_from(">I", raw, off + 4 + size)
        assert (zlib.crc32(bitmap) & 0xFFFFFFFF) == crc
    else:  # pragma: no cover - engine never writes 'p' locally
        raise ValueError(st)
    rows = roaring_array_values(bitmap)
    assert len(rows) == desc["cardinality"]
    return rows


def independent_read_delta(table: str) -> pd.DataFrame:
    """Replay the Delta log with stdlib json + pyarrow only: newest
    parquet checkpoint (via ``_last_checkpoint``) then JSON commits,
    last metaData wins, add/remove tombstone semantics, column-mapping
    physical→logical renames from the schemaString field metadata, and
    DV row filtering per add."""
    import pyarrow.parquet as pq

    log = os.path.join(table, "_delta_log")
    live: dict[str, dict] = {}
    meta: dict | None = None
    start = 0
    lcp = os.path.join(log, "_last_checkpoint")
    if os.path.exists(lcp):
        with open(lcp) as fh:
            cp_version = json.load(fh)["version"]
        cp = pq.read_table(
            os.path.join(log, f"{cp_version:020d}.checkpoint.parquet")
        ).to_pylist()
        for row in cp:
            md = row.get("metaData")
            if md and md.get("schemaString"):
                meta = md
            add = row.get("add")
            if add and add.get("path"):
                live[add["path"]] = add
        start = cp_version + 1
    versions = sorted(
        int(f[:-5])
        for f in os.listdir(log)
        if f.endswith(".json") and f[:-5].isdigit()
    )
    for v in versions:
        if v < start:
            continue
        with open(os.path.join(log, f"{v:020d}.json")) as fh:
            for line in fh:
                action = json.loads(line)
                if "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
    assert meta is not None, "no metaData in log"
    fields = json.loads(meta["schemaString"])["fields"]
    phys_to_logical = {
        f.get("metadata", {}).get(
            "delta.columnMapping.physicalName", f["name"]
        ): f["name"]
        for f in fields
    }
    frames: list[pd.DataFrame] = []
    for path, add in sorted(live.items()):
        pdf = pq.read_table(os.path.join(table, path)).to_pandas()
        dv = add.get("deletionVector")
        if dv and dv.get("storageType"):
            dead = _dv_deleted_rows(table, dv)
            pdf = pdf[~pdf.index.isin(dead)]
        frames.append(pdf)
    out = pd.concat(frames, ignore_index=True)
    return out.rename(columns=phys_to_logical)[
        [f["name"] for f in fields]
    ]


# ------------------------------------------------ independent Iceberg


def independent_read_iceberg(table: str, ref: str | None = None) -> pd.DataFrame:
    """Walk version-hint → vN.metadata.json → (ref or current) snapshot
    → manifest list (avro) → manifests (avro) → parquet data files, then
    subtract position deletes — all with the test-local Avro decoder."""
    import pyarrow.parquet as pq

    with open(os.path.join(table, "metadata", "version-hint.text")) as fh:
        version = int(fh.read().strip())
    with open(
        os.path.join(table, "metadata", f"v{version}.metadata.json")
    ) as fh:
        meta = json.load(fh)
    if ref is None:
        sid = meta["current-snapshot-id"]
    else:
        sid = meta["refs"][ref]["snapshot-id"]
    snap = next(s for s in meta["snapshots"] if s["snapshot-id"] == sid)
    schema = next(
        s
        for s in meta["schemas"]
        if s["schema-id"] == snap.get("schema-id", meta["current-schema-id"])
    )
    col_names = [f["name"] for f in schema["fields"]]
    data_files: list[tuple[str, int]] = []
    delete_files: list[str] = []
    for m in avro_container_records(snap["manifest-list"]):
        for e in avro_container_records(m["manifest_path"]):
            if e["status"] == 2:  # DELETED entry
                continue
            d = e["data_file"]
            if d["content"] == 0:
                data_files.append((d["file_path"], d["record_count"]))
            elif d["content"] == 1:
                delete_files.append(d["file_path"])
    dead_by_file: dict[str, set[int]] = {}
    for p in delete_files:
        pdf = pq.read_table(p).to_pandas()
        for fp, pos in zip(pdf["file_path"], pdf["pos"]):
            dead_by_file.setdefault(os.path.basename(fp), set()).add(int(pos))
    frames = []
    for path, record_count in sorted(data_files):
        pdf = pq.read_table(path).to_pandas()
        assert len(pdf) == record_count
        dead = dead_by_file.get(os.path.basename(path))
        if dead:
            pdf = pdf[~pdf.index.isin(dead)]
        frames.append(pdf)
    return pd.concat(frames, ignore_index=True)[col_names]


# ------------------------------------------------------------ fixtures


def _sorted_tuples(pdf: pd.DataFrame) -> list[tuple]:
    cols = sorted(pdf.columns)
    return sorted(map(tuple, pdf[cols].itertuples(index=False, name=None)))


def _spark_tuples(df) -> list[tuple]:
    cols = sorted(df.columns)
    return sorted(tuple(r[c] for c in cols) for r in df.collect())


def test_independent_delta_reader_dv_column_mapped(spark, tmp_path):
    """Column-mapped + DV'd + checkpointed + post-checkpoint-append table:
    the independent reader, the engine reader, and ground truth agree."""
    from deg04_local_data_lake_spark.sources import delta_log as dl

    t = str(tmp_path / "delta")
    # one big file → the DV for it exceeds the 512-byte inline cap and
    # lands on disk ('u'); the later small file's DV stays inline ('i')
    big = spark.range(0, 3000).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS v"
    ).coalesce(1)
    dl.write_delta_commit(big, t)
    dl.rename_delta_column(spark, t, {"v": "val"})  # activates columnMapping
    dl.delete_delta(spark, t, "id % 7 = 0")
    dl.write_delta_checkpoint(t)
    small = spark.range(3000, 3100).selectExpr(
        "id", "CAST(id * 2 AS DOUBLE) AS val"
    ).coalesce(1)
    dl.write_delta_commit(small, t)
    dl.delete_delta(spark, t, "id >= 3090")

    # both DV storage modes must actually be exercised
    storage_types = set()
    log = os.path.join(t, "_delta_log")
    for f in sorted(os.listdir(log)):
        if not f.endswith(".json"):
            continue
        for line in open(os.path.join(log, f)):
            a = json.loads(line)
            dv = a.get("add", {}).get("deletionVector")
            if dv:
                storage_types.add(dv["storageType"])
    assert storage_types == {"i", "u"}

    indep = independent_read_delta(t)
    assert list(indep.columns) == ["id", "val"]
    engine = _spark_tuples(dl.read_delta_log(spark, t))
    # the %7 delete ran BEFORE the 3000..3100 append, so appended rows
    # with id % 7 == 0 are legitimately live; the second delete trims
    # ids >= 3090
    truth = sorted(
        (float(i), float(i * 2))
        for i in range(3090)
        if i % 7 != 0 or i >= 3000
    )
    got = [(float(a), float(b)) for a, b in _sorted_tuples(indep)]
    assert got == [(float(a), float(b)) for a, b in engine]
    assert got == truth


def test_independent_iceberg_reader_branch_published(spark, tmp_path):
    """Branch-written, WAP-published, position-deleted Iceberg v2 table:
    the independent metadata→manifest-list→manifest walk reproduces the
    engine's frame on main AND on a still-unpublished branch."""
    from deg04_local_data_lake_spark.sources import iceberg_tables as ice

    t = str(tmp_path / "ice")
    df = spark.range(0, 2000).selectExpr(
        "id", "CAST(id * 3 AS DOUBLE) AS v"
    )
    ice.write_iceberg_commit(df, t)
    ice.write_iceberg_commit(
        spark.range(5000, 5050).selectExpr(
            "id", "CAST(id * 3 AS DOUBLE) AS v"
        ),
        t,
        branch="wap",
    )
    ice.fast_forward_iceberg(t, "wap")  # publish
    ice.delete_iceberg(spark, t, "id % 11 = 0")  # position deletes
    ice.write_iceberg_commit(
        spark.range(9000, 9010).selectExpr(
            "id", "CAST(id * 3 AS DOUBLE) AS v"
        ),
        t,
        branch="audit",  # stays unpublished
    )

    indep = independent_read_iceberg(t)
    engine = _spark_tuples(ice.read_iceberg(spark, t))
    truth = sorted(
        (float(i), float(i * 3))
        for i in list(range(2000)) + list(range(5000, 5050))
        if i % 11 != 0
    )
    got = [(float(a), float(b)) for a, b in _sorted_tuples(indep)]
    assert got == [(float(a), float(b)) for a, b in engine]
    assert got == truth
    # the unpublished branch reads via its ref, invisible on main
    indep_branch = independent_read_iceberg(t, ref="audit")
    branch_ids = sorted(int(i) for i in indep_branch["id"] if i >= 9000)
    assert branch_ids == list(range(9000, 9010))
    assert not any(i >= 9000 for i, _ in got)


def test_avro_decoder_is_actually_independent():
    """Guard against accidental coupling: the test-local decoder must not
    import from the package (a shared bug would void the attestation)."""
    import inspect
    import sys

    src = inspect.getsource(sys.modules[__name__])
    head = src.split("# ------------------------------------------------------------ fixtures")[0]
    assert "deg04_local_data_lake_spark" not in head
