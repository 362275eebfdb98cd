"""From-scratch reader/writer for the public Delta Lake transaction-log
protocol — no jars required.

The reference's core table format is Delta (its session factory loads
``io.delta:delta-spark`` and its write jobs save ``format("delta")`` —
mage_demo/utils/spark_session_factory.py:70-71,
mage_demo/custom/delta_table_write.py:72-75,
mage_demo/custom/delta_table_read.py:31). The delta-spark jars are not
available offline, but the transaction-log format itself is a published
open protocol (PROTOCOL.md in the public delta-io/delta repository)
and is deliberately simple: a ``_delta_log/`` directory of ordered JSON
commit files (one action object per line: ``protocol`` / ``metaData`` /
``add`` / ``remove`` / ``commitInfo``) plus periodic parquet checkpoints
and a ``_last_checkpoint`` pointer. This module implements that contract
from scratch:

- :func:`write_delta_commit` — append or overwrite commit: stages the
  DataFrame as parquet, moves the part files into the table root, writes
  commit ``N`` as ``_delta_log/%020d.json`` with ``add`` (and, for
  overwrite, ``remove``) actions.
- :func:`write_delta_checkpoint` — collapses the log at the current
  version into ``%020d.checkpoint.parquet`` + ``_last_checkpoint`` so
  readers replay O(commits-since-checkpoint) JSON, not the whole history.
- :func:`read_delta_log` — snapshot read at latest or ``VERSION AS OF``:
  resolves the newest usable checkpoint, replays subsequent JSON commits
  (last-add-wins per path, ``remove`` tombstones), and hands the live
  file list to ``spark.read.parquet`` — so the DATA path is a plain
  distributed parquet scan with full pushdown/pruning; only the
  (small) log replay is driver-side, exactly as in delta-spark itself.
- :func:`delta_history`, :func:`delta_versions` — DESCRIBE HISTORY.

Scale posture: the log grows with commit count, not data volume; replay
cost is bounded by the checkpoint interval. The snapshot scan is
``spark.read.schema(...).parquet(*files)`` — schema comes from the log's
``metaData.schemaString`` (Spark's own JSON schema serialization, as in
real Delta), so empty snapshots and schema-evolved logs read correctly.
Multi-writer commits serialize through optimistic concurrency: the
commit publish is PUT-IF-ABSENT (``_try_publish_commit``), so a losing
writer rebases on the new head and retries — appends rebase trivially
(they only add files), overwrites rebuild their tombstone set
(last-writer-wins, the semantics of a blind overwrite). The full
delta-spark conflict matrix (e.g. failing serializable overwrite-vs-
append races) is not reproduced — documented limit.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

_LOG_DIR = "_delta_log"
_LAST_CHECKPOINT = "_last_checkpoint"


def _log_path(table: str) -> str:
    return os.path.join(table, _LOG_DIR)


def _commit_file(table: str, version: int) -> str:
    return os.path.join(_log_path(table), f"{version:020d}.json")


def _checkpoint_file(table: str, version: int) -> str:
    return os.path.join(_log_path(table), f"{version:020d}.checkpoint.parquet")


def delta_versions(table: str) -> list[int]:
    """All commit versions present in the log, ascending."""
    log = _log_path(table)
    if not os.path.isdir(log):
        return []
    return sorted(
        int(f[:20])
        for f in os.listdir(log)
        if f.endswith(".json") and f[:20].isdigit()
    )


def _latest_version(table: str) -> int:
    versions = delta_versions(table)
    cp = _read_last_checkpoint(table)
    if not versions and cp is None:
        raise FileNotFoundError(f"not a delta table (no {_LOG_DIR}): {table}")
    return max(versions[-1] if versions else -1, cp or -1)


def _read_last_checkpoint(table: str) -> int | None:
    p = os.path.join(_log_path(table), _LAST_CHECKPOINT)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return int(json.load(f)["version"])


def _checkpoints_on_disk(table: str) -> list[int]:
    """All single-file checkpoint versions present in the log, ascending.
    Listing the directory (not trusting ``_last_checkpoint``) is how
    delta-spark's Snapshot machinery finds replay bases — the pointer
    file is an optimization hint, not the index."""
    log = _log_path(table)
    if not os.path.isdir(log):
        return []
    return sorted(
        int(f[:20])
        for f in os.listdir(log)
        if f.endswith(".checkpoint.parquet") and f[:20].isdigit()
    )


def _usable_checkpoint(table: str, version: int) -> int | None:
    """Newest checkpoint ≤ ``version`` that a replay can start from.

    Fast path: the ``_last_checkpoint`` pointer, when it is ≤ version.
    When the pointer is NEWER than the requested version (time travel
    between two checkpoints), fall back to listing the log directory:
    after ``checkpoint@1 → cleanup → checkpoint@2`` the pointer names
    2, but version 1 is still fully served by the on-disk checkpoint@1
    (cleanup keeps checkpoints ≥ its own base,
    :func:`cleanup_delta_log`). Consulting only the pointer made that
    read raise ``FileNotFoundError: missing commit 0`` even though the
    serving checkpoint sat on disk — falsified by the round-10
    hypothesis model test with ``[append, checkpoint, append, cleanup,
    checkpoint]`` and fixed round 11."""
    cp = _read_last_checkpoint(table)
    if cp is not None and cp <= version:
        return cp
    disk = [c for c in _checkpoints_on_disk(table) if c <= version]
    return disk[-1] if disk else None


def _read_commit(table: str, version: int) -> list[dict]:
    with open(_commit_file(table, version)) as f:
        return [json.loads(line) for line in f if line.strip()]


def _meta_from_checkpoint(meta: dict) -> dict:
    """Normalize a metaData action read back from a parquet checkpoint:
    pyarrow returns map<string,string> columns as LISTS of (k, v) pairs,
    but every consumer of ``configuration`` / ``format.options``
    (column mapping, constraints, CDF flag, defaults) expects the JSON
    commits' dict shape. Without this, any configuration-gated feature
    silently (or loudly) broke on the first read AFTER a checkpoint."""
    m = dict(meta)
    cfg = m.get("configuration")
    if isinstance(cfg, list):
        m["configuration"] = dict(cfg)
    fmt = m.get("format")
    if isinstance(fmt, dict) and isinstance(fmt.get("options"), list):
        fmt = dict(fmt)
        fmt["options"] = dict(fmt["options"])
        m["format"] = fmt
    return m


def _checkpoint_rows_with_retry(
    table: str, cp: int, version: int
) -> tuple[int, list[dict]]:
    """Open checkpoint ``cp``'s rows, retrying on the pointer race.

    Racing maintenance (round-10 live-race fix): between reading the
    ``_last_checkpoint`` pointer and opening the checkpoint parquet, a
    concurrent ``write_delta_checkpoint`` + ``cleanup_delta_log`` pair
    may delete the checkpoint file the pointer named (cleanup removes
    checkpoints BELOW the new one). The stale read must not leak a raw
    pyarrow ENOENT: re-read the pointer and retry — the replacement
    checkpoint always exists and covers ≥ the same versions, so the
    retry succeeds with an identical-or-newer base. Returns the
    checkpoint version actually read plus its rows."""
    import pyarrow.parquet as pq

    for _attempt in range(8):
        try:
            return cp, pq.read_table(_checkpoint_file(table, cp)).to_pylist()
        except FileNotFoundError:
            newer = _read_last_checkpoint(table)
            if newer is not None and newer != cp and newer <= version:
                cp = newer
                continue
            # Pointer points past the requested version (or is gone):
            # probe the directory for any other on-disk checkpoint ≤
            # version before declaring truncation — same rationale as
            # _usable_checkpoint.
            disk = [
                c
                for c in _checkpoints_on_disk(table)
                if c <= version and c != cp
            ]
            if disk:
                cp = disk[-1]
                continue
            raise FileNotFoundError(
                f"checkpoint {cp} for {table} was removed by log "
                f"cleanup and no usable replacement ≤ version "
                f"{version} exists (current checkpoint: {newer}) "
                "— the requested version has been truncated"
            )
    # 8 pointer advances in one read: not a race, a stampede
    raise RuntimeError(
        f"checkpoint pointer for {table} kept moving during replay "
        "(8 retries) — giving up"
    )


def _replay(
    table: str, version: int
) -> tuple[dict[str, dict], dict | None]:
    """Replay the log up to ``version`` inclusive → (live add-actions by
    path, latest metaData). Starts from the newest checkpoint ≤ version
    when one exists; JSON commits before it may have been truncated.
    Checkpoint opens go through :func:`_checkpoint_rows_with_retry`
    (pointer-race safe)."""
    forced_cp: int | None = None  # restart base when a commit vanishes
    for _attempt in range(8):
        live: dict[str, dict] = {}
        meta: dict | None = None
        start = 0
        cp = (
            forced_cp
            if forced_cp is not None
            else _usable_checkpoint(table, version)
        )
        if cp is not None:
            cp, tbl = _checkpoint_rows_with_retry(table, cp, version)
            for row in tbl:
                if row.get("metaData") and row["metaData"].get(
                    "schemaString"
                ):
                    meta = _meta_from_checkpoint(row["metaData"])
                if row.get("add") and row["add"].get("path"):
                    live[row["add"]["path"]] = row["add"]
            start = cp + 1
        for v in range(start, version + 1):
            if not os.path.exists(_commit_file(table, v)):
                # The loop never visits commits covered by the
                # checkpoint. A missing file means either (a) a NEWER
                # on-disk checkpoint ≤ version covers this commit — a
                # concurrent checkpoint+cleanup landed under the read,
                # or the pointer was transiently rolled backwards — so
                # restart replay from it; or (b) the requested version's
                # commits were genuinely truncated → fatal, loudly.
                better = [
                    c
                    for c in _checkpoints_on_disk(table)
                    if v <= c <= version
                ]
                if better:
                    forced_cp = better[-1]
                    break  # restart the outer loop from the newer base
                raise FileNotFoundError(
                    f"missing commit {v} for {table} (checkpoint={cp}, "
                    f"requested version={version})"
                )
            for action in _read_commit(table, v):
                if "metaData" in action:
                    meta = action["metaData"]
                elif "add" in action:
                    live[action["add"]["path"]] = action["add"]
                elif "remove" in action:
                    live.pop(action["remove"]["path"], None)
        else:
            return live, meta
    raise RuntimeError(
        f"log for {table} kept changing during replay (8 restarts) — "
        "giving up"
    )


def _partition_values(add: dict) -> dict[str, str]:
    """``partitionValues`` as a dict — the parquet checkpoint's map type
    round-trips through pyarrow as a list of (k, v) pairs."""
    pv = add.get("partitionValues") or {}
    if isinstance(pv, list):
        pv = dict(pv)
    return pv


def _replay_txns(table: str, version: int) -> dict[str, int]:
    """Replay ``txn`` actions up to ``version``: highest committed
    transaction version per appId — the protocol's idempotent-writer
    state (streaming sinks record (appId, epoch) here and skip replayed
    epochs). Starts from the newest usable checkpoint like ``_replay``."""
    txns: dict[str, int] = {}
    start = 0
    cp = _usable_checkpoint(table, version)
    if cp is not None:
        cp, rows = _checkpoint_rows_with_retry(table, cp, version)
        for row in rows:
            t = row.get("txn")
            if t and t.get("appId") is not None:
                txns[t["appId"]] = max(
                    txns.get(t["appId"], -1), int(t["version"])
                )
        start = cp + 1
    for v in range(start, version + 1):
        if not os.path.exists(_commit_file(table, v)):
            continue
        for action in _read_commit(table, v):
            if "txn" in action:
                t = action["txn"]
                txns[t["appId"]] = max(
                    txns.get(t["appId"], -1), int(t["version"])
                )
    return txns


def _replay_protocol(table: str, version: int) -> dict:
    """Latest ``protocol`` action at ``version`` (last one wins). The
    checkpoint must carry it — the spec makes protocol part of the
    reconstructed state, and a jarful reader of a truncated log needs
    the reader/writer feature floor (e.g. deletionVectors) to know what
    it must support."""
    proto = {"minReaderVersion": 1, "minWriterVersion": 2}
    start = 0
    cp = _usable_checkpoint(table, version)
    if cp is not None:
        cp, rows = _checkpoint_rows_with_retry(table, cp, version)
        for row in rows:
            p = row.get("protocol")
            if p and p.get("minReaderVersion"):
                proto = {k: v for k, v in p.items() if v is not None}
        start = cp + 1
    for v in range(start, version + 1):
        if not os.path.exists(_commit_file(table, v)):
            continue
        for action in _read_commit(table, v):
            if "protocol" in action:
                proto = action["protocol"]
    return proto


#: Features a LEGACY protocol version implies without listing them
#: (PROTOCOL.md's version-to-feature table). An upgrade to table
#: features (writer 7) must carry these forward explicitly: a
#: writer-version-7 table honors ONLY listed features, so overwriting
#: the lists silently deactivates whatever the legacy version implied.
_LEGACY_WRITER_FEATURES = {
    2: ("appendOnly", "invariants"),
    3: ("checkConstraints",),
    4: ("changeDataFeed", "generatedColumns"),
    5: ("columnMapping",),
    6: ("identityColumns",),
}
_LEGACY_READER_FEATURES = {2: ("columnMapping",)}


def _protocol_action_with(
    table: str,
    version: int,
    reader_features: tuple[str, ...],
    writer_features: tuple[str, ...],
) -> dict:
    """Protocol action upgrading the table to table features (reader 3 /
    writer 7) while PRESERVING everything already in force: previously
    listed reader/writer features survive, and a legacy version's
    implied features are materialized into the lists before the new
    ones are unioned in. This is the only correct way to emit a
    ``protocol`` action on an existing table — a hardcoded list would
    wipe e.g. ``allowColumnDefaults`` declared by an earlier ALTER."""
    proto = _replay_protocol(table, version)
    r = int(proto.get("minReaderVersion", 1))
    w = int(proto.get("minWriterVersion", 2))
    rf = set(proto.get("readerFeatures") or [])
    wf = set(proto.get("writerFeatures") or [])
    if w < 7:
        for lv, feats in _LEGACY_WRITER_FEATURES.items():
            if w >= lv:
                wf.update(feats)
    if r < 3:
        for lv, feats in _LEGACY_READER_FEATURES.items():
            if r >= lv:
                rf.update(feats)
    rf.update(reader_features)
    wf.update(writer_features)
    wf.update(rf)  # reader-writer features appear in BOTH lists (spec)
    out = {
        "minReaderVersion": 3 if rf else max(r, 1),
        "minWriterVersion": 7,
        "writerFeatures": sorted(wf),
    }
    if rf:
        out["readerFeatures"] = sorted(rf)
    return {"protocol": out}


def last_txn_version(table: str, app_id: str) -> int:
    """Highest committed ``txn`` version for ``app_id`` (−1 if none)."""
    try:
        latest = _latest_version(table)
    except FileNotFoundError:
        return -1
    return _replay_txns(table, latest).get(app_id, -1)


# ------------------------------------------------------ column mapping
#
# ``delta.columnMapping.mode=name``: every schema field carries a stable
# PHYSICAL name (what the parquet files store) in its StructField
# metadata, so a logical RENAME COLUMN is a metadata-only commit — zero
# data rewritten, all history readable. Readers scan under the physical
# schema and project back to logical names; writers translate logical →
# physical before staging. Partition columns cannot be renamed in this
# subset (their names are baked into directory layout and
# partitionValues).

_CM_MODE = "delta.columnMapping.mode"
_CM_PHYS = "delta.columnMapping.physicalName"
_CM_ID = "delta.columnMapping.id"
_CM_MAX = "delta.columnMapping.maxColumnId"


def _column_mapping(meta: dict) -> dict[str, str] | None:
    """logical → physical column names, or None when mapping is off."""
    if (meta.get("configuration") or {}).get(_CM_MODE) != "name":
        return None
    doc = json.loads(meta["schemaString"])
    return {
        f["name"]: (f.get("metadata") or {}).get(_CM_PHYS, f["name"])
        for f in doc["fields"]
    }


def _physical_struct(meta: dict) -> StructType:
    """The schema under the names the parquet files actually store."""
    doc = json.loads(meta["schemaString"])
    for f in doc["fields"]:
        f["name"] = (f.get("metadata") or {}).get(_CM_PHYS, f["name"])
    return StructType.fromJson(doc)


def _to_logical(df: DataFrame, mapping: dict[str, str], keep=()) -> DataFrame:
    """Project physical columns back to logical names, preserving any
    extra (e.g. coordinate-tag) columns named in ``keep``."""
    from pyspark.sql import functions as F

    cols = [F.col(phys).alias(logical) for logical, phys in mapping.items()]
    cols += [F.col(k) for k in keep]
    return df.select(*cols)


def _to_physical(df: DataFrame, mapping: dict[str, str]) -> DataFrame:
    from pyspark.sql import functions as F

    return df.select(
        *[F.col(logical).alias(phys) for logical, phys in mapping.items()]
    )


# ------------------------------------------------- CHECK constraints
#
# The protocol stores table constraints as configuration entries
# ``delta.constraints.<name> = <SQL expression>``; every writer must
# reject data that violates any of them (writer feature
# ``checkConstraints``). ADD CONSTRAINT first validates the EXISTING
# rows — a constraint that the current table already breaks must not
# commit.

_CONSTRAINT_PREFIX = "delta.constraints."


def _table_constraints(meta: dict) -> dict[str, str]:
    return {
        k[len(_CONSTRAINT_PREFIX):]: v
        for k, v in (meta.get("configuration") or {}).items()
        if k.startswith(_CONSTRAINT_PREFIX)
    }


def _enforce_constraints(df: DataFrame, meta: dict, what: str) -> None:
    """Raise if any row of ``df`` violates a table constraint. One
    filtered existence probe per constraint — each is a scan with the
    NEGATED predicate pushed down and ``limit(1)``, so the common
    all-rows-pass case reads until the first batch proves nothing
    matched; a violation short-circuits on first hit."""
    from pyspark.sql import functions as F

    for name, expr in sorted(_table_constraints(meta).items()):
        bad = df.filter(~F.expr(expr).eqNullSafe(F.lit(True))).limit(1)
        if bad.count() > 0:
            raise ValueError(
                f"CHECK constraint {name!r} ({expr}) violated by {what}"
            )


def add_delta_constraint(
    spark: SparkSession,
    table: str,
    name: str,
    expr: str,
    commit_timestamp: int | None = None,
) -> int:
    """ALTER TABLE ... ADD CONSTRAINT <name> CHECK (<expr>): validates
    the CURRENT snapshot against ``expr`` (a constraint the existing
    data already breaks must not commit — the delta-spark rule), then
    records it in the table configuration as a metadata-only commit.
    Every subsequent write — append, overwrite, MERGE, UPDATE — rejects
    violating rows loudly. Returns the committed version."""
    version = _latest_version(table)
    _live, meta = _replay(table, version)
    if meta is None:
        raise ValueError(f"no metaData action in log for {table}")
    if name in _table_constraints(meta):
        raise ValueError(f"constraint {name!r} already exists")
    from pyspark.sql import functions as F

    existing = read_delta_log(spark, table, version)
    bad = existing.filter(~F.expr(expr).eqNullSafe(F.lit(True))).limit(1)
    if bad.count() > 0:
        raise ValueError(
            f"cannot add constraint {name!r}: existing rows violate ({expr})"
        )
    new_meta = dict(meta)
    config = dict(meta.get("configuration") or {})
    config[_CONSTRAINT_PREFIX + name] = expr
    new_meta["configuration"] = config
    actions = [
        {"metaData": new_meta},
        {
            "commitInfo": {
                "operation": "ADD CONSTRAINT",
                "operationParameters": {"name": name, "expr": expr},
            }
        },
    ]
    # read-modify-write: the validation scan read every live file, and a
    # concurrent append could introduce rows violating the new constraint
    return _publish_rmw_commit(
        table,
        version,
        actions,
        op="ADD CONSTRAINT",
        read_paths=frozenset(_live),
        commit_timestamp=commit_timestamp,
    )


def drop_delta_constraint(
    spark: SparkSession,
    table: str,
    name: str,
    commit_timestamp: int | None = None,
) -> int:
    """ALTER TABLE ... DROP CONSTRAINT: metadata-only commit removing
    the configuration entry. Returns the committed version."""
    del spark
    version = _latest_version(table)
    _live, meta = _replay(table, version)
    if meta is None:
        raise ValueError(f"no metaData action in log for {table}")
    key = _CONSTRAINT_PREFIX + name
    if key not in (meta.get("configuration") or {}):
        raise ValueError(f"no such constraint {name!r}")
    new_meta = dict(meta)
    config = dict(meta["configuration"])
    del config[key]
    new_meta["configuration"] = config
    actions = [
        {"metaData": new_meta},
        {
            "commitInfo": {
                "operation": "DROP CONSTRAINT",
                "operationParameters": {"name": name},
            }
        },
    ]
    # metadata-only and read no data: commutes with concurrent data
    # commits, conflicts only with other metadata/protocol changes
    return _publish_rmw_commit(
        table,
        version,
        actions,
        op="DROP CONSTRAINT",
        tolerate_appends=True,
        tolerate_removes=True,
        commit_timestamp=commit_timestamp,
    )


_ADDABLE_TYPES = {
    "string", "long", "integer", "double", "float", "boolean",
    "date", "timestamp", "binary", "short", "byte",
}


def add_delta_columns(
    table: str,
    columns: dict[str, str],
    defaults: dict[str, str] | None = None,
    commit_timestamp: int | None = None,
) -> int:
    """``ALTER TABLE ... ADD COLUMNS``: a metadata-only commit widening
    the schemaString with NULLABLE columns ({name: spark type name}).
    No data file is touched — the explicit-schema scan serves the new
    columns as null over every existing file, and time travel below
    this commit keeps the old schema. Under column mapping the new
    fields get fresh physical names and ids. Commutes with concurrent
    data commits (conflicts only with other metadata/protocol changes).

    ``defaults`` ({column: SQL literal/expression}) declares ``DEFAULT``
    values (the protocol's ``CURRENT_DEFAULT`` field-metadata key,
    writer feature ``allowColumnDefaults``, minWriterVersion 7): every
    LATER write that omits the column materializes the default instead
    of null; existing rows are untouched and keep reading NULL —
    defaults bind writes, never rewrite history. Returns the committed
    version."""
    version = _latest_version(table)
    _live, meta = _replay(table, version)
    if meta is None:
        raise ValueError(f"no metaData action in log for {table}")
    doc = json.loads(meta["schemaString"])
    existing = {f["name"] for f in doc["fields"]}
    dup = sorted(set(columns) & existing)
    if dup:
        raise ValueError(f"columns already exist: {dup}")
    defaults = dict(defaults or {})
    bad_defaults = sorted(set(defaults) - set(columns))
    if bad_defaults:
        raise ValueError(
            f"defaults for columns not being added: {bad_defaults}"
        )
    config = dict(meta.get("configuration") or {})
    mapping_on = config.get("delta.columnMapping.mode") == "name"
    max_id = int(config.get(_CM_MAX, 0) or 0)
    for name, t in columns.items():
        if not (t in _ADDABLE_TYPES or t.startswith("decimal(")):
            raise ValueError(f"unsupported type for {name!r}: {t}")
        f: dict = {"name": name, "type": t, "nullable": True, "metadata": {}}
        if mapping_on:
            max_id += 1
            f["metadata"] = {_CM_PHYS: f"col-{uuid.uuid4().hex}", _CM_ID: max_id}
        if name in defaults:
            f["metadata"][_CURRENT_DEFAULT] = defaults[name]
        doc["fields"].append(f)
    if mapping_on:
        config[_CM_MAX] = str(max_id)
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(doc)
    new_meta["configuration"] = config
    actions = []
    if defaults:
        actions.append(
            _protocol_action_with(table, version, (), ("allowColumnDefaults",))
        )
    actions += [
        {"metaData": new_meta},
        {
            "commitInfo": {
                "operation": "ADD COLUMNS",
                "operationParameters": {"columns": dict(columns)},
            }
        },
    ]
    return _publish_rmw_commit(
        table,
        version,
        actions,
        op="ADD COLUMNS",
        tolerate_appends=True,
        tolerate_removes=True,
        commit_timestamp=commit_timestamp,
    )


def drop_delta_columns(
    table: str, columns: list[str], commit_timestamp: int | None = None
) -> int:
    """``ALTER TABLE ... DROP COLUMN``: metadata-only commit removing
    the fields from the schemaString. Requires (and auto-activates,
    like RENAME) column mapping — the public protocol's precondition
    for DROP, so readers bind surviving columns by pinned physical
    names whatever later renames do. Data bytes stay in the files
    (O(metadata) ALTER; a later OPTIMIZE rewrite physically sheds
    them); time travel below the commit still serves the column.
    Guards: partition columns, identity/generated columns, and columns
    referenced by CHECK constraints or generation expressions cannot
    be dropped. Returns the committed version."""
    import re as _re

    version = _latest_version(table)
    _live, meta = _replay(table, version)
    if meta is None:
        raise ValueError(f"no metaData action in log for {table}")
    doc = json.loads(meta["schemaString"])
    names = [f["name"] for f in doc["fields"]]
    missing = sorted(set(columns) - set(names))
    if missing:
        raise ValueError(f"no such columns: {missing}")
    part_cols = set(meta.get("partitionColumns") or [])
    bad = sorted(set(columns) & part_cols)
    if bad:
        raise ValueError(f"cannot drop partition columns: {bad}")
    protected = set(_identity_columns(meta)) | set(_generated_columns(meta))
    bad = sorted(set(columns) & protected)
    if bad:
        raise ValueError(f"cannot drop identity/generated columns: {bad}")
    exprs = list(_table_constraints(meta).values()) + list(
        _generated_columns(meta).values()
    )
    for c in columns:
        for e in exprs:
            if _re.search(rf"\b{_re.escape(c)}\b", e):
                raise ValueError(
                    f"cannot drop {c!r}: referenced by a CHECK "
                    f"constraint or generation expression ({e})"
                )
    if len(set(columns)) >= len(names):
        raise ValueError("cannot drop every column")
    config = dict(meta.get("configuration") or {})
    if config.get(_CM_MODE) != "name":
        # DROP requires column mapping (the protocol precondition);
        # activate exactly as RENAME does — existing names become the
        # pinned physical names, every written file stays valid
        config[_CM_MODE] = "name"
        config[_CM_MAX] = str(len(doc["fields"]))
        for i, f in enumerate(doc["fields"], start=1):
            md = dict(f.get("metadata") or {})
            md.setdefault(_CM_PHYS, f["name"])
            md.setdefault(_CM_ID, i)
            f["metadata"] = md
    doc["fields"] = [f for f in doc["fields"] if f["name"] not in set(columns)]
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(doc)
    new_meta["configuration"] = config
    actions = [
        _protocol_action_with(
            table,
            version,
            ("columnMapping", "deletionVectors"),
            ("columnMapping", "deletionVectors"),
        ),
        {"metaData": new_meta},
        {
            "commitInfo": {
                "operation": "DROP COLUMNS",
                "operationParameters": {"columns": list(columns)},
            }
        },
    ]
    return _publish_rmw_commit(
        table,
        version,
        actions,
        op="DROP COLUMNS",
        tolerate_appends=True,
        tolerate_removes=True,
        commit_timestamp=commit_timestamp,
    )


# ------------------------------------------------- generated columns
#
# The protocol stores a generated column's expression in its
# schemaString field metadata under ``delta.generationExpression``
# (writer feature ``generatedColumns``, minWriterVersion 4). The
# WRITER owns the semantics: a write that omits the column gets it
# materialized from the expression; a write that supplies it must
# supply values equal to the expression or be rejected. Readers see a
# plain physical column — generation costs nothing at read time, which
# is why generated date-derivation columns are the standard way to get
# partition-prunable day/month columns for free at 100 TB.

_GEN_EXPR = "delta.generationExpression"


_CURRENT_DEFAULT = "CURRENT_DEFAULT"  # the protocol's default-value key


def _column_defaults(meta: dict) -> dict[str, tuple[str, str]]:
    """column → (default SQL expression, type), from the schemaString
    field metadata (the public protocol's ``CURRENT_DEFAULT`` key,
    writer feature ``allowColumnDefaults``)."""
    doc = json.loads(meta["schemaString"])
    return {
        f["name"]: ((f.get("metadata") or {})[_CURRENT_DEFAULT], f["type"])
        for f in doc["fields"]
        if _CURRENT_DEFAULT in (f.get("metadata") or {})
    }


def _apply_column_defaults(df: DataFrame, meta: dict) -> DataFrame:
    """Materialize defaults for defaulted columns the writer OMITTED —
    the protocol's writer obligation: defaults apply to writes, never
    rewrite existing rows (pre-ALTER files keep reading NULL)."""
    from pyspark.sql import functions as F

    have = set(df.columns)
    for name, (expr, typ) in _column_defaults(meta).items():
        if name not in have:
            df = df.withColumn(
                name, F.expr(expr).cast(typ if isinstance(typ, str) else "string")
            )
    return df


def _generated_columns(meta: dict) -> dict[str, str]:
    """column → generation expression, from the schemaString metadata."""
    doc = json.loads(meta["schemaString"])
    return {
        f["name"]: (f.get("metadata") or {})[_GEN_EXPR]
        for f in doc["fields"]
        if _GEN_EXPR in (f.get("metadata") or {})
    }


def _apply_generated_columns(
    df: DataFrame, gen_cols: dict[str, str], what: str
) -> DataFrame:
    """Materialize absent generated columns from their expressions;
    validate supplied ones (one NEGATED-predicate existence probe per
    column, same shape as CHECK enforcement — the all-rows-pass case
    short-circuits on the first clean batch)."""
    from pyspark.sql import functions as F

    for col, expr in sorted(gen_cols.items()):
        if col not in df.columns:
            df = df.withColumn(col, F.expr(expr))
        else:
            bad = df.filter(
                ~F.col(col).eqNullSafe(F.expr(expr))
            ).limit(1)
            if bad.count() > 0:
                raise ValueError(
                    f"generated column {col!r} violated by {what}: "
                    f"supplied values do not match ({expr})"
                )
    return df


def _embed_generation_exprs(
    schema_string: str, gen_cols: dict[str, str]
) -> str:
    doc = json.loads(schema_string)
    have = {f["name"] for f in doc["fields"]}
    missing = sorted(set(gen_cols) - have)
    if missing:
        raise ValueError(
            f"generated columns not in the written schema: {missing}"
        )
    for f in doc["fields"]:
        if f["name"] in gen_cols:
            md = dict(f.get("metadata") or {})
            md[_GEN_EXPR] = gen_cols[f["name"]]
            f["metadata"] = md
    return json.dumps(doc)


# ------------------------------------------------- identity columns
#
# GENERATED ALWAYS/BY DEFAULT AS IDENTITY (writer feature
# ``identityColumns``, minWriterVersion 6). The protocol stores per-
# field metadata: ``delta.identity.start`` / ``.step`` /
# ``.allowExplicitInsert``, plus ``.highWaterMark`` — the farthest
# value any writer has assigned, advanced by a metaData action on
# every identity-assigning commit. Values are unique and move in step
# direction; GAPS ARE ALLOWED (the spec's concession that makes
# distributed assignment cheap). Assignment here is a contiguous
# block per commit: one O(partitions) count job computes per-partition
# offsets, then a map-only Arrow pass adds base + offset + local index
# — no shuffle, no driver-side data, and the high-water mark grows by
# exactly the row count (monotonically_increasing_id would work too
# but burns ~2^33 of the value space per partition). Concurrent
# identity writers serialize through the optimistic commit protocol,
# same as every other metadata change.

_ID_START = "delta.identity.start"
_ID_STEP = "delta.identity.step"
_ID_ALLOW = "delta.identity.allowExplicitInsert"
_ID_HWM = "delta.identity.highWaterMark"


def _identity_columns(meta: dict) -> dict[str, dict]:
    """column → identity spec, from the schemaString field metadata."""
    doc = json.loads(meta["schemaString"])
    out: dict[str, dict] = {}
    for f in doc["fields"]:
        md = f.get("metadata") or {}
        if _ID_START in md:
            out[f["name"]] = {
                "start": int(md[_ID_START]),
                "step": int(md[_ID_STEP]),
                "allow_explicit": bool(md.get(_ID_ALLOW, False)),
                "high_water_mark": (
                    int(md[_ID_HWM]) if _ID_HWM in md else None
                ),
            }
    return out


def _apply_identity_columns(
    df: DataFrame, id_cols: dict[str, dict], what: str
) -> tuple[DataFrame, dict[str, int]]:
    """Assign absent identity columns (contiguous block past the high
    water mark); validate supplied ones against allowExplicitInsert and
    advance the mark over them. Returns (df, {col: new high water
    mark}) for the columns whose mark moved."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType, StructField, StructType

    hwms: dict[str, int] = {}
    for col, spec in sorted(id_cols.items()):
        start, step = spec["start"], spec["step"]
        base = spec["high_water_mark"]
        if base is None:
            base = start - step
        if col in df.columns:
            if not spec["allow_explicit"]:
                raise ValueError(
                    f"identity column {col!r} is GENERATED ALWAYS: "
                    f"{what} must not supply it"
                )
            # GENERATED BY DEFAULT: user values are free-form; the mark
            # advances to the next step-aligned value at or beyond the
            # farthest supplied one, so generated values never collide
            far_fn = F.max if step > 0 else F.min
            far = df.agg(far_fn(F.col(col)).alias("f")).first()["f"]
            if far is not None:
                q, r = divmod(int(far) - start, step)
                if r != 0:
                    q += 1
                aligned = start + q * step
                newer = (
                    max(base, aligned) if step > 0 else min(base, aligned)
                )
                if newer != base:
                    hwms[col] = newer
            continue
        pid = "_deg04_identity_pid"
        if pid in df.columns:
            raise ValueError(f"column name {pid!r} is reserved")
        with_pid = df.withColumn(pid, F.spark_partition_id())
        counts = {
            r[0]: r[1] for r in with_pid.groupBy(pid).count().collect()
        }
        n_total = sum(counts.values())
        offsets: dict[int, int] = {}
        acc = 0
        for p in sorted(counts):
            offsets[p] = acc
            acc += counts[p]
        out_schema = StructType(
            df.schema.fields + [StructField(col, LongType(), True)]
        )

        def gen(batches, _off=offsets, _b=base, _s=step, _pid=pid, _col=col):
            import numpy as np

            seen = 0
            part_off = None
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                if part_off is None:
                    part_off = _off[int(pdf[_pid].iloc[0])]
                idx = np.arange(
                    seen + 1, seen + len(pdf) + 1, dtype="int64"
                )
                pdf = pdf.drop(columns=[_pid])
                pdf[_col] = _b + _s * (part_off + idx)
                seen += len(idx)
                yield pdf

        df = with_pid.mapInPandas(gen, out_schema)
        if n_total:
            hwms[col] = base + step * n_total
    return df, hwms


def _embed_identity_specs(
    schema_string: str, id_cols: dict[str, dict], hwms: dict[str, int]
) -> str:
    doc = json.loads(schema_string)
    have = {f["name"] for f in doc["fields"]}
    missing = sorted(set(id_cols) - have)
    if missing:
        raise ValueError(
            f"identity columns not in the written schema: {missing}"
        )
    for f in doc["fields"]:
        if f["name"] in id_cols:
            spec = id_cols[f["name"]]
            md = dict(f.get("metadata") or {})
            md[_ID_START] = spec["start"]
            md[_ID_STEP] = spec["step"]
            md[_ID_ALLOW] = spec["allow_explicit"]
            hwm = hwms.get(f["name"], spec.get("high_water_mark"))
            if hwm is not None:
                md[_ID_HWM] = hwm
            f["metadata"] = md
    return json.dumps(doc)


def _embed_identity_hwms(schema_string: str, hwms: dict[str, int]) -> str:
    """The append-commit metaData: the PREVIOUS schemaString with only
    the high water marks advanced — an append never changes schema."""
    doc = json.loads(schema_string)
    for f in doc["fields"]:
        if f["name"] in hwms:
            md = dict(f.get("metadata") or {})
            md[_ID_HWM] = hwms[f["name"]]
            f["metadata"] = md
    return json.dumps(doc)


def rename_delta_column(
    spark: SparkSession,
    table: str,
    renames: dict[str, str],
    commit_timestamp: int | None = None,
) -> int:
    """ALTER TABLE ... RENAME COLUMN as a METADATA-ONLY commit: activate
    column mapping on first use (existing columns keep their current
    names as physical names, so every already-written file stays valid),
    then change the logical field names in ``schemaString``. No data
    file is touched — on a petabyte table the rename costs one JSON
    commit — and time travel still resolves each version under the
    names it had then, because every version's metaData carries its own
    schema. Returns the committed version. Partition columns cannot be
    renamed (directory layout + partitionValues carry their names)."""
    del spark  # log-only operation; kept for API symmetry
    version = _latest_version(table)
    _live, meta = _replay(table, version)
    if meta is None:
        raise ValueError(f"no metaData action in log for {table}")
    doc = json.loads(meta["schemaString"])
    part_cols = set(meta.get("partitionColumns") or [])
    names = [f["name"] for f in doc["fields"]]
    for old, new in renames.items():
        if old in part_cols:
            raise ValueError(f"cannot rename partition column {old!r}")
        if old not in names:
            raise ValueError(f"no such column {old!r} (have {names})")
        if new in names and new != old:
            raise ValueError(f"column {new!r} already exists")
    config = dict(meta.get("configuration") or {})
    if config.get(_CM_MODE) != "name":
        config[_CM_MODE] = "name"
        config[_CM_MAX] = str(len(doc["fields"]))
        for i, f in enumerate(doc["fields"], start=1):
            md = dict(f.get("metadata") or {})
            md.setdefault(_CM_PHYS, f["name"])
            md.setdefault(_CM_ID, i)
            f["metadata"] = md
    for f in doc["fields"]:
        if f["name"] in renames:
            f["name"] = renames[f["name"]]
    new_meta = dict(meta)
    new_meta["schemaString"] = json.dumps(doc)
    new_meta["configuration"] = config
    actions = [
        _protocol_action_with(
            table,
            version,
            ("columnMapping", "deletionVectors"),
            ("columnMapping", "deletionVectors"),
        ),
        {"metaData": new_meta},
        {
            "commitInfo": {
                "operation": "RENAME COLUMN",
                "operationParameters": {"renames": renames},
            }
        },
    ]
    # column mapping keeps physical names stable, so files appended or
    # removed concurrently stay readable under the new logical names
    return _publish_rmw_commit(
        table,
        version,
        actions,
        op="RENAME COLUMN",
        tolerate_appends=True,
        tolerate_removes=True,
        commit_timestamp=commit_timestamp,
    )


def _stats_skip(add: dict, column_ranges: dict[str, tuple]) -> bool:
    """True if the file can be PROVEN to contain no row satisfying
    ``col BETWEEN lo AND hi`` for some filtered column — i.e. its stats
    range lies entirely outside the query range. Missing/unparseable
    stats keep the file (skipping must be conservative); the caller
    still applies the real predicate to whatever is scanned."""
    raw = add.get("stats")
    if not raw:
        return False
    try:
        stats = json.loads(raw) if isinstance(raw, str) else raw
        mins, maxs = stats.get("minValues", {}), stats.get("maxValues", {})
    except (ValueError, AttributeError):
        return False
    for col, (lo, hi) in column_ranges.items():
        mn, mx = mins.get(col), maxs.get(col)
        if mn is None or mx is None:
            continue
        # Footer stats for decimal/timestamp/date columns are serialized
        # as strings (json.dumps(default=str)); comparing those against a
        # numeric bound raises TypeError. Incomparable stats must mean
        # "cannot prove exclusion" — keep the file, never crash the read.
        try:
            if (hi is not None and mn > hi) or (lo is not None and mx < lo):
                return True
        except TypeError:
            continue
    return False


def _hive_base(path: str) -> str:
    """Ancestor directory of ``path`` above any Hive ``k=v`` partition
    segments — the ``basePath`` Spark needs to derive partition columns
    for a file that lives OUTSIDE this table's directory (a shallow
    clone's absolute ``add`` paths pointing into the source table)."""
    d = os.path.dirname(path)
    while "=" in os.path.basename(d):
        d = os.path.dirname(d)
    return d


def _scan_adds(
    spark: SparkSession,
    table: str,
    meta: dict,
    adds: list[dict],
    schema: StructType,
) -> DataFrame:
    """Parquet scan over exactly the given ``add`` actions. Relative
    paths resolve under ``table``; absolute paths (the spec's shallow-
    clone form) are used as-is. Files are grouped by the base directory
    partition columns derive from, one scan per base, unioned — for a
    normal table that is ONE group and the plan is identical to a plain
    multi-file parquet read; a clone that has also taken local appends
    gets one scan per lineage, still file-list-driven and fully pruned."""
    from functools import reduce

    # absolute references exist only on SHALLOW CLONES, and the source
    # table's own VACUUM/retention can reclaim them without this table
    # ever knowing (the source has no registry of its clones — same
    # caveat delta-spark documents). A reclaimed reference must refuse
    # loudly here, not leak a raw PATH_NOT_FOUND out of the executor
    # scan. O(absolute files) driver-side stats; normal tables pay zero.
    missing = [
        a["path"]
        for a in adds
        if os.path.isabs(a["path"]) and not os.path.exists(a["path"])
    ]
    if missing:
        raise FileNotFoundError(
            f"{len(missing)} absolute-path data file(s) referenced by "
            f"this table no longer exist (e.g. {missing[0]}): the source "
            "table of this shallow clone has reclaimed them "
            "(VACUUM/retention passed the clone's reference) — re-clone "
            "from the current source or materialize with a deep copy"
        )
    groups: dict[str, list[str]] = {}
    for a in adds:
        rel = a["path"]
        full = os.path.join(table, rel)  # absolute rel wins the join
        base = _hive_base(full) if os.path.isabs(rel) else table
        groups.setdefault(base, []).append(full)
    scans = []
    for base in sorted(groups):
        reader = spark.read.schema(schema)
        if meta.get("partitionColumns"):
            # Hive-layout partition columns live in directory names, not
            # the data files; basePath makes Spark derive them (typed by
            # the explicit schema) for exactly the pruned file list.
            reader = reader.option("basePath", base)
        scans.append(reader.parquet(*groups[base]))
    return reduce(DataFrame.unionByName, scans)


def _supplied_commit_timestamp(table: str, version: int) -> int | None:
    """Caller-supplied commitInfo timestamp of ``version`` (None when
    the commit carries none — 0 means unset in this engine's
    no-ambient-clocks convention)."""
    return _commit_timestamps(table, version)[1]


def _commit_timestamps(
    table: str, version: int
) -> tuple[int | None, int | None]:
    """(stored effectiveTimestamp, caller-supplied timestamp) of a
    commit. The stored value is the monotonized instant stamped at
    publish time (see :func:`_stamp_effective_timestamp`); pre-round-11
    commits carry only the supplied one."""
    eff = sup = None
    for a in _read_commit(table, version):
        if "commitInfo" in a:
            ci = a["commitInfo"]
            raw = int(ci.get("timestamp", 0) or 0)
            sup = raw if raw > 0 else None
            e = ci.get("effectiveTimestamp")
            eff = int(e) if e is not None else None
    return eff, sup


def _effective_timestamps(table: str):
    """Yield ``(version, effective_timestamp)`` pairs under
    delta-spark's MONOTONIZATION rule (``DeltaHistoryManager``: adjusted
    ts[i] = max(ts[i], ts[i-1] + 1)). delta-spark falls back to commit-file
    modification time for untimestamped commits; this engine has no ambient
    clocks, so an untimestamped commit inherits previous-effective + 1 —
    strictly after its predecessor, never instant 0. Effective timestamps
    are therefore strictly increasing whatever the caller supplied.

    A commit's publish-time ``effectiveTimestamp`` stamp wins when
    present (round-11 fix): re-deriving the rule over only the SURVIVING
    commits re-anchored history after log cleanup — an untimestamped
    commit whose predecessors were truncated re-derived as instant 0,
    silently re-resolving ``TIMESTAMP AS OF`` probes that used to land
    on (now truncated) earlier versions, and shrinking the commit-time
    monotonicity guard's head."""
    eff = None
    for v in delta_versions(table):
        stored, t = _commit_timestamps(table, v)
        if stored is not None:
            eff = stored  # publish-time stamp: immune to truncation
        elif eff is None:
            eff = t if t is not None else 0
        elif t is not None and t > eff:
            eff = t
        else:
            eff += 1
        yield v, eff


def _effective_head_timestamp(table: str) -> int:
    """Effective (monotonized) timestamp of the table's latest commit;
    -1 for a table with no commits yet."""
    eff = -1
    for _v, eff in _effective_timestamps(table):
        pass
    return eff


def _reject_nonmonotone_timestamp(table: str, commit_timestamp: int | None):
    """Commit-time guard: a caller-supplied timestamp must land strictly
    after every existing commit's effective timestamp — otherwise
    ``TIMESTAMP AS OF`` history silently reorders (delta-spark would
    monotonize such a commit forward, changing the instant the caller
    asked to record; rejecting is louder and lossless)."""
    if commit_timestamp is None:
        return
    head = _effective_head_timestamp(table)
    if commit_timestamp <= head:
        raise ValueError(
            f"commit_timestamp {commit_timestamp} is not after the "
            f"table's latest effective commit timestamp {head}; "
            "supplied commit timestamps must be strictly increasing"
        )


def _version_at_timestamp(table: str, ts: int) -> int:
    """``TIMESTAMP AS OF`` resolution: the newest version whose
    MONOTONIZED commitInfo timestamp is ≤ ``ts`` (delta-spark's rule,
    see :func:`_effective_timestamps`). An untimestamped DELETE/UPDATE/
    OPTIMIZE after a timestamped append resolves strictly AFTER the
    append — ``timestamp_as_of=<append instant>`` returns the
    pre-delete state, never the mutated one. Versions truncated below a
    checkpoint are out of retention and never resolve."""
    best = None
    first: tuple[int, int] | None = None
    for v, eff in _effective_timestamps(table):
        if first is None:
            first = (v, eff)
        if eff <= ts:
            best = v  # effective timestamps strictly increase
        else:
            break
    if best is None:
        if first is not None and first[0] > 0:
            # history starts mid-log: everything at or before ``ts``
            # was truncated by log cleanup — refuse loudly instead of
            # "no commit" (the instants existed; retention dropped them)
            raise ValueError(
                f"timestamp {ts} predates the earliest retained commit "
                f"of {table} (version {first[0]}, effective timestamp "
                f"{first[1]}) — earlier history was truncated by log "
                "cleanup (retention passed)"
            )
        raise ValueError(
            f"no commit at or before timestamp {ts} in {table}"
        )
    return best


def read_delta_log(
    spark: SparkSession,
    table: str,
    version: int | None = None,
    partition_filter: dict[str, str] | None = None,
    column_ranges: dict[str, tuple] | None = None,
    timestamp_as_of: int | None = None,
) -> DataFrame:
    """Snapshot read of a Delta table (latest, or ``VERSION AS OF`` when
    ``version`` is given) by replaying the transaction log from scratch.

    Matches ``spark.read.format("delta").option("versionAsOf", n)`` in
    delta-spark (mage_demo/custom/delta_table_read.py:31,
    scratchpads/financial_dl_etl.py:64-66) without any jar: the live file
    set is reconstructed from checkpoint + JSON actions, and the scan is
    a plain parquet read over exactly those files — pushdown, column
    pruning, and partition parallelism all intact at any scale.

    ``partition_filter`` ({col: value}) prunes files by each ``add``'s
    ``partitionValues`` IN THE LOG — non-matching files are never listed,
    opened, or scheduled, the same metadata pruning delta-spark performs
    before handing Spark a file index. For a table partitioned on a
    selective column this is the difference between scanning 1/k of the
    files and all of them, independent of parquet row-group stats.

    ``column_ranges`` ({col: (lo, hi), None = unbounded side}) is DATA
    SKIPPING on the per-file ``stats`` the writer records: files whose
    min/max range cannot contain a matching row are dropped during log
    replay. Unlike partition pruning this works on ANY stats-carrying
    column, and after a clustered OPTIMIZE (``optimize_delta(...,
    cluster_by=...)``) the per-file ranges are narrow, so a selective
    range predicate scans O(matching files) — delta-spark's
    OPTIMIZE ZORDER + data-skipping story, reproduced on the log."""
    if timestamp_as_of is not None:
        if version is not None:
            raise ValueError("pass either version or timestamp_as_of, not both")
        version = _version_at_timestamp(table, timestamp_as_of)
    if version is None:
        version = _latest_version(table)
    live, meta = _replay(table, version)
    if meta is None:
        raise ValueError(f"no metaData action in log for {table}")
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    adds = [live[p] for p in sorted(live)]
    if partition_filter:
        part_cols = set(meta.get("partitionColumns") or [])
        unknown = set(partition_filter) - part_cols
        if unknown:
            raise ValueError(
                f"partition_filter on non-partition columns {sorted(unknown)}; "
                f"table is partitioned by {sorted(part_cols)}"
            )
        adds = [
            a
            for a in adds
            if all(
                _partition_values(a).get(k) == str(v)
                for k, v in partition_filter.items()
            )
        ]
    mapping = _column_mapping(meta)
    if column_ranges:
        # Data skipping from the log's per-file stats: files provably
        # outside every ``col BETWEEN lo AND hi`` range are never listed,
        # opened, or scheduled. The caller STILL applies the predicate —
        # skipping narrows the scan, it never replaces the filter.
        # Stats are keyed by PHYSICAL names under column mapping.
        if mapping:
            column_ranges = {
                mapping.get(c, c): r for c, r in column_ranges.items()
            }
        adds = [a for a in adds if not _stats_skip(a, column_ranges)]
    if not adds:
        return spark.createDataFrame([], schema)
    scan = _scan_adds(
        spark, table, meta, adds, _physical_struct(meta) if mapping else schema
    )
    dv_adds = [a for a in adds if a.get("deletionVector")]
    if dv_adds:
        scan = _apply_deletion_vectors(spark, table, scan, dv_adds)
    if mapping:
        scan = _to_logical(scan, mapping)
    return scan


# ---------------------------------------------------- deletion vectors
#
# The protocol's row-level deletes without file rewrites: an ``add``
# action may carry a ``deletionVector`` descriptor whose payload is the
# spec's 64-bit RoaringBitmapArray of the file's deleted row indexes in
# the "portable" framing (``sources/roaring.py:serialize_array`` —
# magic 1681511377 | bitmap count | per-bitmap key + standard 32-bit
# portable stream). Storage follows the spec's two modes:
# ``i`` inlines small bitmaps into the action as Z85 text (the ZeroMQ
# base-85 alphabet the Delta codec uses — NOT Python's RFC1924 b85);
# ``u`` stores ``[format version byte 1][size int32 BE][bitmap]
# [crc32 int32 BE]`` in a file named ``deletion_vector_<uuid>.bin``,
# with ``pathOrInlineDv = <prefix><z85(uuid bytes)>`` — the last 20
# chars decode to the 16-byte UUID and everything before them is the
# directory prefix, exactly how a jarful delta-spark reader resolves it.

_DV_DIR = "deletion_vectors"
_DV_INLINE_MAX = 512

_DV_FILE_COL = "__dv_file"
_DV_POS_COL = "__dv_pos"

# ZeroMQ Z85 alphabet (public spec 32/Z85) — the Delta Base85Codec one.
_Z85_CHARS = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_INDEX = {c: i for i, c in enumerate(_Z85_CHARS)}


def _z85_encode(data: bytes) -> str:
    """Z85-encode ``data``, zero-padding to a 4-byte multiple (the codec
    contract: the decoder truncates back using the descriptor's
    ``sizeInBytes``)."""
    data = data + b"\x00" * ((-len(data)) % 4)
    out: list[str] = []
    for i in range(0, len(data), 4):
        v = int.from_bytes(data[i: i + 4], "big")
        chunk = []
        for _ in range(5):
            v, r = divmod(v, 85)
            chunk.append(_Z85_CHARS[r])
        out.extend(reversed(chunk))
    return "".join(out)


def _z85_decode(s: str, length: int | None = None) -> bytes:
    if len(s) % 5:
        raise ValueError(f"z85 text length {len(s)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(s), 5):
        v = 0
        for c in s[i: i + 5]:
            v = v * 85 + _Z85_INDEX[c]
        out += v.to_bytes(4, "big")
    return bytes(out[:length]) if length is not None else bytes(out)


def _dv_rel_path(desc: dict) -> str:
    """Table-relative file path of an on-disk (``u``) deletion vector:
    ``pathOrInlineDv``'s last 20 chars are the z85 UUID, the rest is the
    directory prefix."""
    enc = desc["pathOrInlineDv"]
    prefix, z85uuid = enc[:-20], enc[-20:]
    u = uuid.UUID(bytes=_z85_decode(z85uuid, 16))
    name = f"deletion_vector_{u}.bin"
    return f"{prefix}/{name}" if prefix else name


def _dv_store(table: str, bitmap: bytes, cardinality: int) -> dict:
    import struct
    import zlib

    if len(bitmap) <= _DV_INLINE_MAX:
        return {
            "storageType": "i",
            "pathOrInlineDv": _z85_encode(bitmap),
            "sizeInBytes": len(bitmap),
            "cardinality": cardinality,
        }
    u = uuid.uuid4()
    desc = {
        "storageType": "u",
        "pathOrInlineDv": _DV_DIR + _z85_encode(u.bytes),
        "offset": 1,
        "sizeInBytes": len(bitmap),
        "cardinality": cardinality,
    }
    os.makedirs(os.path.join(table, _DV_DIR), exist_ok=True)
    payload = (
        b"\x01"
        + struct.pack(">i", len(bitmap))
        + bitmap
        + struct.pack(">I", zlib.crc32(bitmap) & 0xFFFFFFFF)
    )
    with open(os.path.join(table, _dv_rel_path(desc)), "wb") as f:
        f.write(payload)
    return desc


def _dv_load(table: str, desc: dict):
    """Decode one deletionVector descriptor → sorted uint64 numpy array
    of deleted row indexes (checksum-verified for on-disk storage)."""
    import struct
    import zlib

    from deg04_local_data_lake_spark.sources import roaring

    st = desc.get("storageType")
    if st == "i":
        data = _z85_decode(
            desc["pathOrInlineDv"], desc.get("sizeInBytes")
        )
    elif st in ("u", "p"):
        if st == "u":
            p = os.path.join(table, _dv_rel_path(desc))
        else:
            p = desc["pathOrInlineDv"]
        try:
            with open(p, "rb") as f:
                raw = f.read()
        except FileNotFoundError:
            if st == "p":
                # absolute DV references exist only on shallow clones —
                # same refusal contract as the data-file check in
                # _scan_adds when the source's VACUUM reclaimed it
                raise FileNotFoundError(
                    f"deletion vector {p} referenced by this shallow "
                    "clone no longer exists: the source table's "
                    "VACUUM/retention reclaimed it — re-clone from the "
                    "current source or materialize with a deep copy"
                ) from None
            raise
        off = desc.get("offset") or 1
        size, = struct.unpack_from(">i", raw, off)
        if size != desc.get("sizeInBytes", size):
            raise ValueError(
                f"deletion vector size mismatch in {p}: file header {size}, "
                f"descriptor {desc.get('sizeInBytes')}"
            )
        data = raw[off + 4: off + 4 + size]
        crc, = struct.unpack_from(">I", raw, off + 4 + size)
        if (zlib.crc32(data) & 0xFFFFFFFF) != crc:
            raise ValueError(f"deletion vector checksum mismatch in {p}")
    else:
        raise ValueError(f"unknown deletionVector storageType {st!r}")
    return roaring.deserialize_array(data)


def _tag_scan(scan: DataFrame) -> DataFrame:
    """Attach (file basename, in-file row index) metadata columns — the
    coordinates deletion vectors are expressed in."""
    from pyspark.sql import functions as F

    return scan.select(
        "*",
        F.element_at(
            F.split(F.col("_metadata.file_path"), "/"), -1
        ).alias(_DV_FILE_COL),
        F.col("_metadata.row_index").alias(_DV_POS_COL),
    )


def _apply_deletion_vectors(
    spark: SparkSession,
    table: str,
    scan: DataFrame,
    dv_adds: list[dict],
    keep_tags: bool = False,
) -> DataFrame:
    """Filter DV-deleted rows out of ``scan``. The bitmaps are decoded
    ONCE on the driver (they are kilobytes of compressed metadata) and
    broadcast; the filter itself is an Arrow-batched ``mapInPandas``
    closure — a MAP-ONLY stage with zero shuffle, vectorized
    ``np.isin`` per (batch × file), which is exactly how a jarful
    reader's DV row filter composes with the scan. Files without a DV
    never enter this path (the caller short-circuits), so unDV'd tables
    pay nothing."""
    dv = {
        os.path.basename(a["path"]): _dv_load(table, a["deletionVector"])
        for a in dv_adds
    }
    bc = spark.sparkContext.broadcast(dv)
    tagged = _tag_scan(scan)
    out_cols = tagged.columns if keep_tags else scan.columns
    out_schema = tagged.schema if keep_tags else scan.schema

    def drop_deleted(batches):
        import numpy as np

        dvs = bc.value
        for pdf in batches:
            if len(pdf) == 0:
                continue
            fnames = pdf[_DV_FILE_COL].to_numpy()
            mask = np.ones(len(pdf), dtype=bool)
            for fname in np.unique(fnames):
                arr = dvs.get(fname)
                if arr is None:
                    continue
                sel = fnames == fname
                mask[sel] = ~np.isin(
                    pdf[_DV_POS_COL].to_numpy()[sel], arr
                )
            yield pdf.loc[mask, list(out_cols)]

    return tagged.mapInPandas(drop_deleted, schema=out_schema)


# ------------------------------------------------- change data feed
#
# The protocol's COMMIT-TIME CDC storage (PROTOCOL.md "Add CDC File",
# delta-spark's ``delta.enableChangeDataFeed``): when the table property
# is set, UPDATE / DELETE / MERGE persist their change rows (table
# columns + ``_change_type``) as parquet under ``_change_data/`` and
# record them as ``cdc`` actions in the commit. ``read_delta_changes``
# then serves those commits from the cdc files directly — O(changed
# rows) — instead of the two-full-snapshot ``exceptAll`` diff the
# offline reconstruction pays per rewriting commit. This closes the
# scale caveat that function documents: with CDF enabled, the change
# feed IS a hot path. cdc actions are invisible to snapshot replay
# (``_replay`` only consumes add/remove/metaData — the spec's rule that
# cdc files are not part of any snapshot), are never checkpointed, and
# VACUUM keeps them exactly as long as their commit JSON is replayable.

_CDF_PROP = "delta.enableChangeDataFeed"
_CHANGE_DATA_DIR = "_change_data"
_CT_COL = "_change_type"


def _cdf_enabled(meta: dict | None) -> bool:
    if not meta:
        return False
    cfg = meta.get("configuration") or {}
    return str(cfg.get(_CDF_PROP, "")).lower() == "true"


def enable_delta_cdf(table: str, commit_timestamp: int | None = None) -> int:
    """``ALTER TABLE ... SET TBLPROPERTIES
    ('delta.enableChangeDataFeed' = 'true')``: a metadata-only commit
    that flips the table property and asserts the protocol's
    ``changeDataFeed`` writer feature (minWriterVersion 4 legacy, listed
    explicitly under table features). From this commit on, every
    UPDATE/DELETE/MERGE also writes commit-time cdc files. Returns the
    committed version (unchanged if already enabled). Commutes with
    concurrent data commits; a concurrent metaData/protocol winner
    conflicts, per the RMW rules."""
    version = _latest_version(table)
    _live, meta = _replay(table, version)
    if meta is None:
        raise ValueError(f"no metaData action in log for {table}")
    if _cdf_enabled(meta):
        return version
    new_meta = dict(meta)
    config = dict(meta.get("configuration") or {})
    config[_CDF_PROP] = "true"
    new_meta["configuration"] = config
    actions = [
        _protocol_action_with(table, version, (), ("changeDataFeed",)),
        {"metaData": new_meta},
        {
            "commitInfo": {
                "operation": "SET TBLPROPERTIES",
                "operationParameters": {_CDF_PROP: "true"},
            }
        },
    ]
    return _publish_rmw_commit(
        table,
        version,
        actions,
        op="SET TBLPROPERTIES",
        tolerate_appends=True,
        tolerate_removes=True,
        commit_timestamp=commit_timestamp,
    )


def _stage_cdc_files(
    change_df: DataFrame,
    table: str,
    version: int,
    mapping: dict[str, str] | None = None,
) -> list[dict]:
    """Distributed parquet write of change rows (table columns +
    ``_change_type``) into ``_change_data/``, returned as ``cdc``
    actions. Files store PHYSICAL column names when column mapping is
    active — the same convention as the data files, so RENAME COLUMN
    after the fact cannot orphan historical change files (the read path
    translates through each commit's own mapping). ``dataChange`` is
    false by spec: cdc files describe a change, they are not one.
    Partition values are stored inline as ordinary columns rather than
    hive paths — this engine reads its own cdc files with each commit's
    schema, so the flat layout loses nothing (documented divergence
    from delta-spark's partitioned ``_change_data`` subdirs)."""
    from pyspark.sql import functions as F

    if mapping:
        change_df = change_df.select(
            *[F.col(lg).alias(ph) for lg, ph in mapping.items()],
            F.col(_CT_COL),
        )
    stage = os.path.join(table, f"_stage_{uuid.uuid4().hex}")
    change_df.write.format("parquet").mode("errorifexists").save(stage)
    os.makedirs(os.path.join(table, _CHANGE_DATA_DIR), exist_ok=True)
    out: list[dict] = []
    idx = 0
    for f in sorted(os.listdir(stage)):
        if not f.endswith(".parquet"):
            continue
        name = (
            f"cdc-{version:05d}-{idx:05d}-{uuid.uuid4().hex}.snappy.parquet"
        )
        rel = f"{_CHANGE_DATA_DIR}/{name}"
        src = os.path.join(stage, f)
        size = os.path.getsize(src)
        os.rename(src, os.path.join(table, _CHANGE_DATA_DIR, name))
        out.append(
            {
                "cdc": {
                    "path": rel,
                    "partitionValues": {},
                    "size": size,
                    "dataChange": False,
                }
            }
        )
        idx += 1
    shutil.rmtree(stage)
    return out


def delete_delta(
    spark: SparkSession, table: str, condition,
    commit_timestamp: int | None = None,
) -> int:
    """Row-level DELETE via deletion vectors: mark the rows matching
    ``condition`` (SQL string or Column) deleted WITHOUT rewriting any
    data file. Touched files re-commit as ``remove`` + ``add`` of the
    SAME path carrying a (merged) deletionVector; a file whose every
    row is now deleted drops to a plain ``remove``. Untouched files are
    not mentioned in the commit at all. Returns the committed version
    (or the current one unchanged when nothing matches).

    Why this shape at 100 TB: a selective DELETE over a petabyte table
    rewrites nothing — the write cost is O(deleted rows) of compressed
    bitmap, not O(touched files) of parquet. The per-file bitmaps are
    built DISTRIBUTED (groupBy file → ``applyInPandas`` roaring
    serialization — one shuffle of just the deleted row coordinates),
    and only the finished descriptors come back to the driver, which is
    the same commit-time flow delta-spark's DV writer runs. Repeated
    deletes merge bitmaps (union) rather than chaining; OPTIMIZE
    materializes DVs away (its rewrite reads the DV-filtered snapshot);
    VACUUM reclaims unreferenced DV files."""
    from pyspark.sql import functions as F

    tagged, version, live, _meta = _dv_tagged_snapshot(spark, table)
    if tagged is None:
        return version
    matched = tagged.filter(condition).select(_DV_FILE_COL, _DV_POS_COL)
    actions, n_removed_rows = _dv_delete_actions(table, live, matched)
    if not actions:
        return version
    actions.insert(0, _dv_protocol_action(table, version))
    if _cdf_enabled(_meta):
        # commit-time CDC: the deleted rows ARE the change rows
        pre = tagged.filter(condition).drop(
            _DV_FILE_COL, _DV_POS_COL
        ).withColumn(_CT_COL, F.lit("delete"))
        actions.extend(
            _stage_cdc_files(
                pre, table, version + 1, _column_mapping(_meta)
            )
        )
    actions.append(
        {
            "commitInfo": {
                "operation": "DELETE",
                "operationParameters": {"predicate": str(condition)},
                "operationMetrics": {"numDeletedRows": n_removed_rows},
            }
        }
    )
    # the predicate scan read every live file, and rows appended
    # concurrently could match the predicate: both are conflicts
    return _publish_rmw_commit(
        table,
        version,
        actions,
        op="DELETE",
        read_paths=frozenset(live),
        commit_timestamp=commit_timestamp,
    )


#: Tables carrying deletion vectors require the protocol's DV table
#: feature; re-asserting it in every DV commit is idempotent (last
#: protocol action wins) and keeps jarful readers honest about what
#: they must support before scanning.
def _dv_protocol_action(table: str, version: int) -> dict:
    """DV table-feature assertion for a DELETE/UPDATE commit — built by
    MERGING into the table's replayed protocol (a static action here
    would wipe columnMapping/allowColumnDefaults declared earlier,
    because the last protocol action wins on replay)."""
    return _protocol_action_with(
        table, version, ("deletionVectors",), ("deletionVectors",)
    )


def _dv_tagged_snapshot(spark: SparkSession, table: str):
    """Current snapshot as a coordinate-tagged scan (existing DVs
    applied, so dead rows can't rematch) → (tagged, version, live,
    meta); ``tagged`` is None for an empty table."""
    from deg04_local_data_lake_spark.operators.multimodal import (
        ensure_workers_can_import,
    )

    version = _latest_version(table)
    live, meta = _replay(table, version)
    if meta is None:
        raise ValueError(f"no metaData action in log for {table}")
    mapping = _column_mapping(meta)
    schema = (
        _physical_struct(meta)
        if mapping
        else StructType.fromJson(json.loads(meta["schemaString"]))
    )
    adds = [live[p] for p in sorted(live)]
    if not adds:
        return None, version, live, meta
    scan = _scan_adds(spark, table, meta, adds, schema)
    dv_adds = [a for a in adds if a.get("deletionVector")]
    if dv_adds:
        tagged = _apply_deletion_vectors(
            spark, table, scan, dv_adds, keep_tags=True
        )
    else:
        tagged = _tag_scan(scan)
    if mapping:
        # predicates and SET expressions speak LOGICAL names
        tagged = _to_logical(
            tagged, mapping, keep=(_DV_FILE_COL, _DV_POS_COL)
        )
    ensure_workers_can_import(spark)
    return tagged, version, live, meta


def _dv_delete_actions(
    table: str, live: dict[str, dict], matched: DataFrame
) -> tuple[list[dict], int]:
    """remove/add actions marking ``matched`` (file, pos) coordinates
    deleted via per-file deletion vectors — the shared core of DELETE
    and UPDATE. Bitmaps build distributed (groupBy file →
    ``applyInPandas`` roaring serialization); only finished descriptors
    reach the driver. Returns ([], 0) when nothing matched."""

    def to_bitmap(pdf):
        import pandas as pd

        from deg04_local_data_lake_spark.sources import roaring

        pos = pdf[_DV_POS_COL].to_numpy().astype("uint32")
        return pd.DataFrame(
            {
                "file": [pdf[_DV_FILE_COL].iloc[0]],
                "bitmap": [roaring.serialize(pos)],
                "card": [int(len(set(pos.tolist())))],
            }
        )

    per_file = (
        matched.groupBy(_DV_FILE_COL)
        .applyInPandas(to_bitmap, "file string, bitmap binary, card long")
        .collect()
    )
    if not per_file:
        return [], 0
    by_name = {os.path.basename(p): a for p, a in live.items()}
    actions: list[dict] = []
    n_removed_rows = 0
    for row in per_file:
        import numpy as np

        from deg04_local_data_lake_spark.sources import roaring

        old_add = by_name[row["file"]]
        new_arr = roaring.deserialize(bytes(row["bitmap"]))
        old_desc = old_add.get("deletionVector")
        if old_desc:
            new_arr = np.union1d(new_arr, _dv_load(table, old_desc))
        card = int(len(new_arr))
        n_removed_rows += int(row["card"])
        num_records = None
        try:
            num_records = json.loads(old_add.get("stats") or "{}").get(
                "numRecords"
            )
        except ValueError:
            pass
        actions.append(
            {
                "remove": {
                    "path": old_add["path"],
                    "deletionTimestamp": 0,
                    "dataChange": True,
                }
            }
        )
        if num_records is not None and card >= num_records:
            continue  # every row dead: plain remove, no DV needed
        new_add = {
            k: v for k, v in old_add.items() if k != "deletionVector"
        }
        new_add["dataChange"] = True
        new_add["deletionVector"] = _dv_store(
            table, roaring.serialize_array(new_arr), card
        )
        actions.append({"add": new_add})
    return actions, n_removed_rows


def update_delta(
    spark: SparkSession,
    table: str,
    condition,
    set_exprs: dict[str, str],
    commit_timestamp: int | None = None,
) -> int:
    """UPDATE ... SET via deletion vectors, in ONE atomic commit: rows
    matching ``condition`` are marked dead in their files (merged DV,
    no rewrite of untouched rows) and re-written with ``set_exprs``
    applied ({column: SQL expression over the pre-update row}) as new
    data files — remove+add(DV)+add(new) land together, so readers see
    either the whole UPDATE or none of it. Returns the committed
    version (current one unchanged when nothing matches).

    This is delta-spark's DV-enabled UPDATE shape: cost is O(matched
    rows) written + O(deleted coordinates) of bitmap, never O(touched
    files) of parquet — on a petabyte table a selective UPDATE touches
    exactly the rows it changes."""
    from pyspark.sql import functions as F

    tagged, version, live, meta = _dv_tagged_snapshot(spark, table)
    if tagged is None:
        return version
    bad = set(set_exprs) - {
        f.name
        for f in StructType.fromJson(json.loads(meta["schemaString"])).fields
    }
    if bad:
        raise ValueError(f"SET on unknown columns: {sorted(bad)}")
    matched_tagged = tagged.filter(condition).localCheckpoint(eager=True)
    coords = matched_tagged.select(_DV_FILE_COL, _DV_POS_COL)
    actions, n_matched = _dv_delete_actions(table, live, coords)
    if not actions:
        return version
    updated = matched_tagged.drop(_DV_FILE_COL, _DV_POS_COL)
    types = {f.name: f.dataType for f in updated.schema.fields}
    for col, expr in set_exprs.items():
        # UPDATE never changes a column's type: cast the SET expression
        # to the existing type (a bare literal like `-1.0` would
        # otherwise silently drift the column to decimal)
        updated = updated.withColumn(col, F.expr(expr).cast(types[col]))
    ids = _identity_columns(meta)
    bad_ids = sorted(set(set_exprs) & set(ids))
    if bad_ids:
        raise ValueError(
            f"cannot UPDATE identity column(s) {bad_ids}: identity "
            "values are writer-assigned and immutable"
        )
    gen = _generated_columns(meta)
    if gen:
        # a SET on a generated column's BASE recomputes it; a SET on
        # the generated column itself must agree with its expression
        for col, expr in sorted(gen.items()):
            if col not in set_exprs:
                updated = updated.withColumn(
                    col, F.expr(expr).cast(types[col])
                )
        supplied = {c: e for c, e in gen.items() if c in set_exprs}
        if supplied:
            _apply_generated_columns(updated, supplied, "UPDATE")
    _enforce_constraints(updated, meta, "UPDATE")
    mapping = _column_mapping(meta)
    new_version = version + 1
    cdc_acts: list[dict] = []
    if _cdf_enabled(meta):
        # commit-time CDC: matched rows pre-SET are the preimages, the
        # rewritten rows the postimages (both still under logical names
        # here; _stage_cdc_files applies the physical mapping)
        pre = matched_tagged.drop(_DV_FILE_COL, _DV_POS_COL).withColumn(
            _CT_COL, F.lit("update_preimage")
        )
        post = updated.withColumn(_CT_COL, F.lit("update_postimage"))
        cdc_acts = _stage_cdc_files(
            pre.unionByName(post), table, new_version, mapping
        )
    if mapping:
        updated = _to_physical(updated, mapping)
    part_cols = list(meta.get("partitionColumns") or []) or None
    adds = _stage_files(updated, table, new_version, part_cols)
    actions = [_dv_protocol_action(table, version)] + actions + adds + cdc_acts
    actions.append(
        {
            "commitInfo": {
                "operation": "UPDATE",
                "operationParameters": {"predicate": str(condition)},
                "operationMetrics": {"numUpdatedRows": n_matched},
            }
        }
    )
    # same read set as DELETE: the predicate scan covered every live
    # file and concurrent appends could have matched
    return _publish_rmw_commit(
        table,
        version,
        actions,
        op="UPDATE",
        read_paths=frozenset(live),
        commit_timestamp=commit_timestamp,
    )


def _file_stats(path: str) -> str | None:
    """Per-file column statistics as the protocol's ``stats`` JSON
    (numRecords / minValues / maxValues / nullCount), aggregated from the
    parquet footer's row-group statistics — zero data reads. Columns
    whose footer lacks min/max are simply omitted (readers must treat
    missing stats as "cannot skip")."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(path).metadata
    mins: dict = {}
    maxs: dict = {}
    nulls: dict = {}
    bad: set[str] = set()
    for rg in range(md.num_row_groups):
        g = md.row_group(rg)
        for ci in range(g.num_columns):
            col = g.column(ci)
            name = col.path_in_schema
            if "." in name:
                continue  # nested leaves: out of scope
            try:
                st = col.statistics
                if st is None or not st.has_min_max:
                    bad.add(name)
                    continue
                st_min, st_max = st.min, st.max
            except Exception:
                # pyarrow cannot extract stats for every physical type
                # (ArrowNotImplementedError) — omit, readers keep the file
                bad.add(name)
                continue
            mins[name] = st_min if name not in mins else min(mins[name], st_min)
            maxs[name] = st_max if name not in maxs else max(maxs[name], st_max)
            nulls[name] = nulls.get(name, 0) + (st.null_count or 0)
    for name in bad:
        mins.pop(name, None)
        maxs.pop(name, None)
    return json.dumps(
        {
            "numRecords": md.num_rows,
            "minValues": mins,
            "maxValues": maxs,
            "nullCount": nulls,
        },
        default=str,  # timestamps/dates serialize as ISO strings
    )


def _stage_files(
    df: DataFrame, table: str, version: int, partition_by: list[str] | None
) -> list[dict]:
    """Distributed parquet write into a staging dir, then move part files
    into the table (under ``col=value/`` subdirs when partitioned) and
    return their ``add`` actions with ``partitionValues`` and per-file
    column ``stats`` filled in."""
    stage = os.path.join(table, f"_stage_{uuid.uuid4().hex}")
    writer = df.write.format("parquet").mode("errorifexists")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(stage)
    adds = []
    idx = 0
    for root, _dirs, files in sorted(os.walk(stage)):
        rel_dir = os.path.relpath(root, stage)
        pvals: dict[str, str] = {}
        if rel_dir != ".":
            for seg in rel_dir.split(os.sep):
                k, _, v = seg.partition("=")
                pvals[k] = v
        for f in sorted(files):
            if not f.endswith(".parquet"):
                continue
            name = f"part-{version:05d}-{idx:05d}-{uuid.uuid4().hex}.snappy.parquet"
            rel = name if rel_dir == "." else os.path.join(rel_dir, name)
            dst = os.path.join(table, rel)
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            src = os.path.join(root, f)
            size = os.path.getsize(src)
            stats = _file_stats(src)
            os.rename(src, dst)
            adds.append(
                {
                    "add": {
                        "path": rel.replace(os.sep, "/"),
                        "partitionValues": pvals,
                        "size": size,
                        "modificationTime": 0,
                        "dataChange": True,
                        "stats": stats,
                    }
                }
            )
            idx += 1
    shutil.rmtree(stage)
    return adds


def _write_commit_file(table: str, version: int, actions: list[dict]) -> None:
    if not _try_publish_commit(table, version, actions):
        raise FileExistsError(
            f"commit {version} already exists for {table} (concurrent writer)"
        )


def _stamp_effective_timestamp(
    table: str, version: int, actions: list[dict]
) -> None:
    """Record the commit's MONOTONIZED instant in its own commitInfo
    (``effectiveTimestamp``) at publish time — every commit passes
    through here, so the value is part of the commit and survives
    whatever later log cleanup truncates.

    Round-11 bug this closes: the monotonization rule was re-derived at
    READ time over the surviving commits only, so after cleanup an
    untimestamped commit whose predecessors were truncated re-anchored
    at instant 0 — ``TIMESTAMP AS OF 150`` on a history whose (now
    truncated) v0 was committed at 100 silently resolved to the LATEST
    data, and a new commit stamped 50 passed the monotonicity guard,
    reordering history. delta-spark is immune because every commitInfo
    carries wall-clock ms; this is the no-ambient-clocks twin.
    Idempotent: retried publishes (optimistic-concurrency rebases)
    restamp the same key against the new head."""
    supplied = None
    ci = None
    for a in actions:
        if "commitInfo" in a:
            ci = a["commitInfo"]
            raw = int(ci.get("timestamp", 0) or 0)
            supplied = raw if raw > 0 else None
    prev_eff = None
    if version > 0 and os.path.exists(_commit_file(table, version - 1)):
        prev_eff = _commit_timestamps(table, version - 1)[0]
        if prev_eff is None:
            # legacy predecessor (pre-stamping): derive it once by the
            # read-time rule; every commit from here on is stamped
            for _v, e in _effective_timestamps(table):
                if _v == version - 1:
                    prev_eff = e
    if prev_eff is None:
        eff = supplied if supplied is not None else 0
    elif supplied is not None and supplied > prev_eff:
        eff = supplied
    else:
        eff = prev_eff + 1
    if ci is None:
        actions.append(
            {"commitInfo": {"timestamp": 0, "effectiveTimestamp": int(eff)}}
        )
    else:
        ci["effectiveTimestamp"] = int(eff)


def _try_publish_commit(
    table: str, version: int, actions: list[dict]
) -> bool:
    """PUT-IF-ABSENT publish of commit ``version`` — the atomicity
    primitive the Delta protocol requires of its log store. ``os.link``
    fails with EEXIST if another writer already claimed the version, so
    two concurrent committers can never both succeed at the same version
    (``os.replace`` would silently clobber the loser). Object-store
    deployments substitute the store's conditional-put here."""
    _stamp_effective_timestamp(table, version, actions)
    tmp = _commit_file(table, version) + f".{uuid.uuid4().hex}.tmp"
    with open(tmp, "w") as f:
        for a in actions:
            f.write(json.dumps(a) + "\n")
    try:
        os.link(tmp, _commit_file(table, version))
        return True
    except FileExistsError:
        return False
    finally:
        os.remove(tmp)


class ConcurrentModificationError(RuntimeError):
    """An optimistic commit lost its race and the winning commit does
    not commute with it — the Delta protocol's conflict classes
    (delta-spark's ``ConflictChecker``): MetadataChangedException,
    ProtocolChangedException, ConcurrentAppendException,
    ConcurrentDeleteReadException. The losing operation must be re-run
    from a fresh snapshot; blindly rebasing would publish a result
    computed against state that no longer holds."""


def _publish_rmw_commit(
    table: str,
    read_version: int,
    actions: list[dict],
    *,
    op: str,
    read_paths: frozenset[str] = frozenset(),
    tolerate_appends: bool = False,
    tolerate_removes: bool = False,
    commit_timestamp: int | None = None,
) -> int:
    """Publish the commit of a read-modify-write operation that built
    ``actions`` against snapshot ``read_version``, applying the Delta
    protocol's conflict-resolution rules on a lost race:

    - a winning ``metaData`` or ``protocol`` action ALWAYS conflicts —
      the op validated rows / built its result against stale table
      metadata (MetadataChanged / ProtocolChanged);
    - a winning ``add`` of a path in ``read_paths`` conflicts — the file
      this op read was modified under it, e.g. re-added with a deletion
      vector (ConcurrentDeleteRead);
    - any other winning ``add`` conflicts unless ``tolerate_appends`` —
      ops whose result depends on the table's rows (DELETE, UPDATE,
      RESTORE, constraint validation) could have matched the new rows;
      ops that only rewrite their inputs (OPTIMIZE) commute with blind
      appends (ConcurrentAppend);
    - a winning ``remove`` of a path in ``read_paths`` conflicts
      (ConcurrentDeleteRead); of any other path, conflicts unless
      ``tolerate_removes``.

    Commuting winners rebase the commit to the new head and the publish
    retries; conflicting winners raise :class:`ConcurrentModificationError`.

    ``commit_timestamp`` stamps the trailing commitInfo action (the
    ``TIMESTAMP AS OF`` instant this op records); it must be strictly
    after every prior commit's effective timestamp.
    """
    if commit_timestamp is not None:
        _reject_nonmonotone_timestamp(table, commit_timestamp)
        for a in actions:
            if "commitInfo" in a:
                a["commitInfo"]["timestamp"] = int(commit_timestamp)
    version = read_version + 1
    while True:
        if _try_publish_commit(table, version, actions):
            return version
        head = _latest_version(table)
        for v in range(version, head + 1):
            for a in _read_commit(table, v):
                if "metaData" in a:
                    raise ConcurrentModificationError(
                        f"{op} on {table}: concurrent metadata change "
                        f"at version {v}"
                    )
                if "protocol" in a:
                    raise ConcurrentModificationError(
                        f"{op} on {table}: concurrent protocol change "
                        f"at version {v}"
                    )
                if "add" in a:
                    path = a["add"]["path"]
                    if path in read_paths:
                        raise ConcurrentModificationError(
                            f"{op} on {table}: file {path} it read was "
                            f"concurrently modified at version {v}"
                        )
                    if not tolerate_appends:
                        raise ConcurrentModificationError(
                            f"{op} on {table}: concurrent append at "
                            f"version {v} could change its result"
                        )
                if "remove" in a:
                    path = a["remove"]["path"]
                    if path in read_paths:
                        raise ConcurrentModificationError(
                            f"{op} on {table}: file {path} it read was "
                            f"concurrently removed at version {v}"
                        )
                    if not tolerate_removes:
                        raise ConcurrentModificationError(
                            f"{op} on {table}: concurrent remove at "
                            f"version {v} could change its result"
                        )
        # commuting winner: re-assert the timestamp still lands after
        # the (possibly advanced) effective timeline before rebasing
        _reject_nonmonotone_timestamp(table, commit_timestamp)
        version = head + 1


#: Automatic checkpoint cadence (delta-spark's default): every Nth
#: commit collapses the log so replay cost stays bounded however long
#: a table (e.g. a streaming sink) keeps committing.
CHECKPOINT_INTERVAL = 10


def write_delta_commit(
    df: DataFrame,
    table: str,
    mode: str = "append",
    partition_by: list[str] | None = None,
    txn: tuple[str, int] | None = None,
    checkpoint_interval: int | None = CHECKPOINT_INTERVAL,
    generated_columns: dict[str, str] | None = None,
    identity_columns: dict[str, dict] | None = None,
    strict_conflicts: bool = False,
    merge_schema: bool = False,
    commit_timestamp: int | None = None,
    cdc_actions: list[dict] | None = None,
) -> int:
    """Commit ``df`` to the Delta table at ``table`` (created on first
    commit) and return the new version. ``mode`` is ``append`` or
    ``overwrite`` (overwrite emits ``remove`` tombstones for every
    previously-live file, the protocol's logical delete).
    ``partition_by`` writes Hive-layout partitions whose values land in
    each ``add``'s ``partitionValues`` — the metadata that lets readers
    prune whole files from the LOG, before any filesystem listing.
    ``txn=(appId, version)`` records the protocol's idempotent-writer
    action; callers use :func:`last_txn_version` to skip replayed epochs
    (exactly-once streaming sinks). ``generated_columns`` ({col: SQL
    expr}) declares GENERATED ALWAYS AS columns on the commits that
    write metaData (creation or overwrite): the expressions embed in the
    schemaString field metadata (``delta.generationExpression``, writer
    feature ``generatedColumns``), and EVERY subsequent write
    materializes an omitted generated column from its expression or
    validates a supplied one against it. ``identity_columns``
    ({col: {"start": 1, "step": 1, "allow_explicit": False}}) declares
    GENERATED AS IDENTITY columns the same way (writer feature
    ``identityColumns``, minWriterVersion 6): every write that omits an
    identity column gets a fresh contiguous block of values past the
    table's high water mark, every identity-assigning commit advances
    the mark via a metaData action, and supplying values requires
    ``allow_explicit`` (GENERATED BY DEFAULT)."""
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(_log_path(table), exist_ok=True)
    try:
        version = _latest_version(table) + 1
    except FileNotFoundError:
        version = 0
    if version > 0:
        _reject_nonmonotone_timestamp(table, commit_timestamp)

    # Under column mapping the parquet files store PHYSICAL names:
    # translate before staging, and (on overwrite) preserve the mapping
    # metadata for same-named columns so a schema overwrite never
    # orphans the physical-name contract.
    prev_meta0 = None
    if version > 0:
        _pl0, prev_meta0 = _replay(table, version - 1)
    mapping0 = _column_mapping(prev_meta0) if prev_meta0 else None
    # generated columns bind every writer: the table's declared set
    # carries forward; a metaData-writing commit (creation/overwrite)
    # may declare or replace it
    gen_cols = _generated_columns(prev_meta0) if prev_meta0 else {}
    if generated_columns is not None:
        if version > 0 and mode == "append":
            raise ValueError(
                "generated columns are declared on the commits that "
                "write metaData (creation or overwrite), not on append"
            )
        gen_cols = dict(generated_columns)
    id_cols = _identity_columns(prev_meta0) if prev_meta0 else {}
    if identity_columns is not None:
        if version > 0 and mode == "append":
            raise ValueError(
                "identity columns are declared on the commits that "
                "write metaData (creation or overwrite), not on append"
            )
        id_cols = {}
        for c, s in identity_columns.items():
            step = int(s.get("step", 1))
            if step == 0:
                raise ValueError(f"identity column {c!r}: step must be nonzero")
            id_cols[c] = {
                "start": int(s.get("start", 1)),
                "step": step,
                "allow_explicit": bool(s.get("allow_explicit", False)),
                "high_water_mark": None,
            }
    id_hwms: dict[str, int] = {}
    if id_cols:
        # identity assignment FIRST: generated columns and CHECKs may
        # reference the identity column the writer is about to fill
        df, id_hwms = _apply_identity_columns(df, id_cols, f"{mode} write")
    if gen_cols:
        # materialize/validate BEFORE constraint checks — a CHECK may
        # reference a generated column the writer is about to fill in
        df = _apply_generated_columns(df, gen_cols, f"{mode} write")
    if prev_meta0 is not None:
        # declared column DEFAULTs fill omitted columns BEFORE the
        # constraint check (a CHECK may reference a defaulted column)
        df = _apply_column_defaults(df, prev_meta0)
        # CHECK constraints bind every writer, whatever the mode
        _enforce_constraints(df, prev_meta0, f"{mode} write")
    merged_schema: str | None = None
    if version > 0 and mode == "append":
        # Append schema enforcement (delta-spark's writer contract): a
        # type change on an existing column or an extra column without
        # merge_schema must fail LOUDLY — the lax alternative silently
        # drops the new column and nulls mis-typed ones on read.
        prev_fields = {
            f["name"]: f
            for f in json.loads(prev_meta0["schemaString"])["fields"]
        }
        cur_fields = json.loads(df.schema.json())["fields"]
        mismatched = sorted(
            f["name"]
            for f in cur_fields
            if f["name"] in prev_fields
            and f["type"] != prev_fields[f["name"]]["type"]
        )
        if mismatched:
            raise ValueError(
                f"append schema mismatch on columns {mismatched}; "
                "cast to the table's types or use mode='overwrite' "
                "to evolve the schema"
            )
        extra = [f for f in cur_fields if f["name"] not in prev_fields]
        if extra and not merge_schema:
            raise ValueError(
                "append has columns not in the table: "
                f"{sorted(f['name'] for f in extra)}; pass "
                "merge_schema=True (mergeSchema) to add them"
            )
        if extra:
            if mapping0:
                raise ValueError(
                    "merge_schema append is not supported on "
                    "column-mapped tables (new columns need mapped "
                    "physical names); evolve via overwrite instead"
                )
            doc = json.loads(prev_meta0["schemaString"])
            for f in extra:
                f = dict(f)
                f["nullable"] = True  # absent in every pre-merge file
                doc["fields"].append(f)
            merged_schema = json.dumps(doc)
    schema_string = df.schema.json()
    if gen_cols and (version == 0 or mode == "overwrite"):
        schema_string = _embed_generation_exprs(schema_string, gen_cols)
    id_append_schema: str | None = None
    if id_cols:
        if version == 0 or mode == "overwrite":
            schema_string = _embed_identity_specs(
                schema_string, id_cols, id_hwms
            )
        elif id_hwms:
            # append that assigned identity values: the commit must
            # advance the high water mark — prev schema, marks moved
            id_append_schema = _embed_identity_hwms(
                prev_meta0["schemaString"], id_hwms
            )
    if merged_schema is not None:
        # mergeSchema append: the commit carries a metaData action with
        # the widened schema (reusing the identity-HWM metaData branch);
        # when the same commit also advances identity marks, the merged
        # fields fold into the HWM-advanced schemaString
        if id_append_schema is not None:
            doc = json.loads(id_append_schema)
            have = {f["name"] for f in doc["fields"]}
            doc["fields"] += [
                f
                for f in json.loads(merged_schema)["fields"]
                if f["name"] not in have
            ]
            id_append_schema = json.dumps(doc)
        else:
            id_append_schema = merged_schema
    # an overwrite rewrites content, not table properties: constraints,
    # column-mapping state, and any other configuration carry forward
    configuration: dict = dict(
        (prev_meta0 or {}).get("configuration") or {}
    )
    stage_df = df
    if mapping0:
        configuration = dict(prev_meta0.get("configuration") or {})
        prev_doc = json.loads(prev_meta0["schemaString"])
        prev_fields = {f["name"]: f for f in prev_doc["fields"]}
        max_id = int(configuration.get(_CM_MAX, len(prev_fields)))
        doc = json.loads(schema_string)
        write_mapping: dict[str, str] = {}
        for f in doc["fields"]:
            old = prev_fields.get(f["name"])
            md = dict(f.get("metadata") or {})
            if old is not None:
                md[_CM_PHYS] = (old.get("metadata") or {}).get(
                    _CM_PHYS, f["name"]
                )
                md[_CM_ID] = (old.get("metadata") or {}).get(_CM_ID, 0)
            else:
                max_id += 1
                md[_CM_PHYS] = f["name"]
                md[_CM_ID] = max_id
            f["metadata"] = md
            write_mapping[f["name"]] = md[_CM_PHYS]
        configuration[_CM_MAX] = str(max_id)
        schema_string = json.dumps(doc)
        if mode == "append":
            # Round-11 soak find: an append may legally OMIT nullable
            # columns (they read back as null — the unmapped path has
            # always allowed this); projecting the FULL mapping here
            # raised UNRESOLVED_COLUMN on any mapped table appended
            # without a just-added column. Map only what's present.
            m = _column_mapping(prev_meta0)
            stage_df = _to_physical(
                df, {lg: ph for lg, ph in m.items() if lg in set(df.columns)}
            )
        else:
            stage_df = _to_physical(df, write_mapping)

    adds = _stage_files(stage_df, table, version, partition_by)

    while True:
        actions: list[dict] = []
        if version == 0:
            # generatedColumns is writer version 4; identityColumns 6
            writer_v = 6 if id_cols else (4 if gen_cols else 2)
            actions.append(
                {
                    "protocol": {
                        "minReaderVersion": 1,
                        "minWriterVersion": writer_v,
                    }
                }
            )
        elif (
            generated_columns is not None or identity_columns is not None
        ) and mode == "overwrite":
            need = 6 if identity_columns is not None else 4
            proto = _replay_protocol(table, version - 1)
            if proto.get("minWriterVersion", 2) < need:
                proto = dict(proto)
                proto["minWriterVersion"] = need
                actions.append({"protocol": proto})
        prev_live: dict[str, dict] = {}
        if version > 0:
            prev_live, _prev_meta = _replay(table, version - 1)
        if version == 0 or mode == "overwrite":
            actions.append(
                {
                    "metaData": {
                        "id": uuid.uuid4().hex,
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": schema_string,
                        "partitionColumns": list(partition_by or []),
                        "configuration": configuration,
                        "createdTime": 0,
                    }
                }
            )
        elif id_append_schema is not None:
            # identity high-water-mark advance: same table metadata,
            # only the marks in the schemaString move
            actions.append(
                {
                    "metaData": {
                        "id": prev_meta0.get("id", uuid.uuid4().hex),
                        "format": {"provider": "parquet", "options": {}},
                        "schemaString": id_append_schema,
                        "partitionColumns": list(
                            prev_meta0.get("partitionColumns") or []
                        ),
                        "configuration": dict(
                            prev_meta0.get("configuration") or {}
                        ),
                        "createdTime": 0,
                    }
                }
            )
        if mode == "overwrite":
            for path in sorted(prev_live):
                actions.append(
                    {
                        "remove": {
                            "path": path,
                            "deletionTimestamp": 0,
                            "dataChange": True,
                        }
                    }
                )
        actions.extend(adds)
        if cdc_actions:
            # commit-time CDC (MERGE passes its staged change files).
            # Only meaningful with strict_conflicts: the change rows
            # were computed FROM the snapshot this commit overwrites, so
            # a rebase would publish stale changes alongside fresh data.
            assert strict_conflicts, "cdc_actions requires strict_conflicts"
            actions.extend(cdc_actions)
        if txn is not None:
            actions.append({"txn": {"appId": txn[0], "version": int(txn[1])}})
        actions.append(
            {
                "commitInfo": {
                    "operation": "WRITE",
                    "operationParameters": {"mode": mode},
                    # deterministic wall-clock: the caller supplies it
                    # (no ambient clocks in this engine); 0 = unset
                    "timestamp": int(commit_timestamp or 0),
                }
            }
        )
        if _try_publish_commit(table, version, actions):
            if checkpoint_interval and version > 0 and version % checkpoint_interval == 0:
                write_delta_checkpoint(table)
            return version
        # Optimistic-concurrency retry: another writer claimed this
        # version. Blind appends are data-conflict-free (they only add
        # files) and rebase cleanly onto the new head; overwrites
        # rebuild their tombstone set against the new state
        # (last-writer-wins, the semantics of a blind overwrite). The
        # staged data files are already in place and carry over
        # untouched. BUT a winning metaData or protocol action always
        # conflicts (MetadataChanged/ProtocolChanged): this write
        # validated constraints, generated columns, identity marks and
        # column mapping against the OLD metadata, so rebasing would
        # publish rows checked against rules that no longer hold.
        # `strict_conflicts` marks content computed FROM a snapshot
        # (MERGE overwrites): there, any concurrent commit invalidates
        # the computed result and rebasing would silently drop it.
        new_head = _latest_version(table)
        for v in range(version, new_head + 1):
            for a in _read_commit(table, v):
                if "metaData" in a or "protocol" in a:
                    kind = "metadata" if "metaData" in a else "protocol"
                    raise ConcurrentModificationError(
                        f"{mode} write on {table}: concurrent {kind} "
                        f"change at version {v}"
                    )
                if strict_conflicts and ("add" in a or "remove" in a):
                    raise ConcurrentModificationError(
                        f"{mode} write on {table}: the written content "
                        f"was computed from a stale snapshot — a "
                        f"concurrent data commit landed at version {v}"
                    )
        # the winner may have advanced the effective timeline past this
        # commit's instant: re-assert monotonicity before rebasing (two
        # racers can't both record the same caller-supplied instant)
        _reject_nonmonotone_timestamp(table, commit_timestamp)
        version = new_head + 1


def write_delta_checkpoint(table: str) -> int:
    """Write a parquet checkpoint of the current snapshot plus the
    ``_last_checkpoint`` pointer; returns the checkpointed version.
    After this, JSON commits ≤ the checkpoint may be truncated and
    readers still reconstruct every snapshot ≥ the checkpoint.

    Concurrency (round-10 live-race hole #6): the checkpoint parquet is
    written to a temp path and ``os.replace``d into place — writing it
    in place tore the footer out from under concurrent readers that had
    already resolved the pointer (pyarrow: "magic bytes not found").
    Re-checkpointing an already-checkpointed version is a no-op: the
    content for a version is deterministic, so rewriting it buys
    nothing and churns bytes under readers."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    version = _latest_version(table)
    if os.path.exists(_checkpoint_file(table, version)):
        cur = _read_last_checkpoint(table)
        if cur is not None and cur >= version:
            return version  # already checkpointed — deterministic no-op
    live, meta = _replay(table, version)
    txns = _replay_txns(table, version)
    protocol = _replay_protocol(table, version)
    rows = [
        {"metaData": None, "add": None, "txn": None, "protocol": protocol},
        {"metaData": meta, "add": None, "txn": None, "protocol": None},
    ]
    rows += [
        {
            "metaData": None,
            "add": None,
            "txn": {"appId": a, "version": v},
            "protocol": None,
        }
        for a, v in sorted(txns.items())
    ]
    rows += [
        {"metaData": None, "add": a, "txn": None, "protocol": None}
        for _p, a in sorted(live.items())
    ]
    # Explicit protocol-shaped schema: the option/configuration fields are
    # map<string,string> (pyarrow cannot infer a type for empty dicts).
    str_map = pa.map_(pa.string(), pa.string())
    schema = pa.schema(
        [
            pa.field(
                "metaData",
                pa.struct(
                    [
                        pa.field("id", pa.string()),
                        pa.field(
                            "format",
                            pa.struct(
                                [
                                    pa.field("provider", pa.string()),
                                    pa.field("options", str_map),
                                ]
                            ),
                        ),
                        pa.field("schemaString", pa.string()),
                        pa.field("partitionColumns", pa.list_(pa.string())),
                        pa.field("configuration", str_map),
                        pa.field("createdTime", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "add",
                pa.struct(
                    [
                        pa.field("path", pa.string()),
                        pa.field("partitionValues", str_map),
                        pa.field("size", pa.int64()),
                        pa.field("modificationTime", pa.int64()),
                        pa.field("dataChange", pa.bool_()),
                        pa.field("stats", pa.string()),
                        pa.field(
                            "deletionVector",
                            pa.struct(
                                [
                                    pa.field("storageType", pa.string()),
                                    pa.field("pathOrInlineDv", pa.string()),
                                    pa.field("offset", pa.int32()),
                                    pa.field("sizeInBytes", pa.int32()),
                                    pa.field("cardinality", pa.int64()),
                                ]
                            ),
                        ),
                    ]
                ),
            ),
            pa.field(
                "txn",
                pa.struct(
                    [
                        pa.field("appId", pa.string()),
                        pa.field("version", pa.int64()),
                    ]
                ),
            ),
            pa.field(
                "protocol",
                pa.struct(
                    [
                        pa.field("minReaderVersion", pa.int32()),
                        pa.field("minWriterVersion", pa.int32()),
                        pa.field("readerFeatures", pa.list_(pa.string())),
                        pa.field("writerFeatures", pa.list_(pa.string())),
                    ]
                ),
            ),
        ]
    )
    cp_tmp = _checkpoint_file(table, version) + f".{uuid.uuid4().hex}.tmp"
    pq.write_table(pa.Table.from_pylist(rows, schema=schema), cp_tmp)
    os.replace(cp_tmp, _checkpoint_file(table, version))
    # unique tmp: two concurrent checkpointers sharing one tmp name can
    # atomically publish each other's half-written bytes
    tmp = os.path.join(
        _log_path(table), f"{_LAST_CHECKPOINT}.{uuid.uuid4().hex}.tmp"
    )
    with open(tmp, "w") as f:
        json.dump({"version": version, "size": len(rows)}, f)
    cur = _read_last_checkpoint(table)
    if cur is not None and cur > version:
        os.remove(tmp)  # a newer checkpoint published while we wrote —
        return version  # moving the pointer BACKWARDS would un-shield
        # the newer checkpoint's truncated commits from readers
    os.replace(tmp, os.path.join(_log_path(table), _LAST_CHECKPOINT))
    # The guard above is check-then-act: a concurrent checkpointer can
    # publish a newer pointer in the window between our read and our
    # replace, and the replace just rolled it backwards (round-11 fix
    # for the round-10 guard's own race). Heal: re-read and restore the
    # max of pointer vs newest on-disk checkpoint until stable — the
    # checkpoint set only grows, so each pass narrows the window and
    # the loop converges.
    for _ in range(8):
        cur = _read_last_checkpoint(table)
        disk = _checkpoints_on_disk(table)
        best = max(disk) if disk else version
        if cur is not None and cur >= best:
            break
        meta_rows = pq.read_metadata(_checkpoint_file(table, best)).num_rows
        heal = os.path.join(
            _log_path(table), f"{_LAST_CHECKPOINT}.{uuid.uuid4().hex}.tmp"
        )
        with open(heal, "w") as f:
            json.dump({"version": best, "size": meta_rows}, f)
        os.replace(heal, os.path.join(_log_path(table), _LAST_CHECKPOINT))
    return version


def merge_delta(
    spark: SparkSession,
    table: str,
    source: DataFrame,
    key: str,
    op_col: str | None = None,
    commit_timestamp: int | None = None,
    not_matched_by_source: str | None = None,
    not_matched_by_source_condition: str | None = None,
) -> int:
    """MERGE INTO on the jar-less Delta table; returns the committed
    version. Without ``op_col``: whole-row upsert by ``key`` (matched →
    update, unmatched → insert). With ``op_col``: the source is a CDC
    feed — rows whose op is ``'D'`` delete their key, every other row
    upserts — i.e. ``WHEN MATCHED AND op='D' THEN DELETE / WHEN MATCHED
    THEN UPDATE / WHEN NOT MATCHED THEN INSERT``, the MERGE every CDC
    pipeline applies downstream.

    ``not_matched_by_source="delete"`` adds the third MERGE leg
    (``WHEN NOT MATCHED BY SOURCE [AND <condition>] THEN DELETE``,
    delta-spark ≥ 2.3 syntax): target rows whose key is absent from the
    source are deleted — the whole source, not just its upsert rows,
    counts as "matched", so a CDC 'D' row both deletes its own key AND
    shields it from the by-source leg, exactly like the reference
    engines. With a ``condition`` (a SQL expression over target columns)
    only the not-matched rows satisfying it are deleted; the rest are
    kept untouched. This is the full-table-sync MERGE: source = desired
    partition of the world, condition = the slice the source is
    authoritative for.

    Physical strategy is copy-on-write like delta-spark's: the merged
    snapshot is two keyed anti-joins + a union (no row-by-row driver
    work), committed as an overwrite (removes + adds). At 100 TB
    delta-spark narrows the rewrite to only files containing matched
    keys; that file-level pruning composes with this log layer but is
    not implemented here — documented limit of the offline writer."""
    from pyspark.sql import functions as F

    if not_matched_by_source not in (None, "delete"):
        raise ValueError(
            "not_matched_by_source supports only 'delete', got "
            f"{not_matched_by_source!r}"
        )
    version = _latest_version(table)
    _live, meta = _replay(table, version)
    target = read_delta_log(spark, table, version)
    if op_col is not None:
        deletes = source.filter(F.col(op_col) == "D").select(key)
        upserts = source.filter(F.col(op_col) != "D").drop(op_col)
    else:
        deletes = None
        upserts = source
    kept = target.join(upserts.select(key), on=key, how="left_anti")
    if deletes is not None:
        kept = kept.join(deletes, on=key, how="left_anti")
    deleted_by_source = None
    if not_matched_by_source == "delete":
        # rows not matched by ANY source key (upserts and CDC deletes
        # alike) fall to the by-source leg; an optional condition keeps
        # the non-qualifying ones
        in_source = kept.join(
            source.select(key).distinct(), on=key, how="left_semi"
        )
        survivors = in_source
        not_in_source = kept.join(
            source.select(key).distinct(), on=key, how="left_anti"
        )
        deleted_by_source = not_in_source
        if not_matched_by_source_condition is not None:
            cond = F.expr(not_matched_by_source_condition)
            survivors = in_source.unionByName(not_in_source.filter(~cond))
            # deleted iff NOT kept — i.e. the condition is TRUE or NULL
            # (the ~cond filter above drops NULLs from the survivors)
            deleted_by_source = not_in_source.filter(
                ~cond.eqNullSafe(F.lit(False))
            )
        kept = survivors
    merged = upserts.select(*target.columns).unionByName(kept)
    # Materialize BEFORE the overwrite commit: the merged plan reads the
    # files the commit is about to tombstone.
    merged = merged.localCheckpoint(eager=True)
    cdc_acts: list[dict] | None = None
    if _cdf_enabled(meta):
        # Commit-time CDC for MERGE, delta-spark's flavor: a matched
        # upsert emits its pre/post images, a source 'D' row emits the
        # target rows it killed as 'delete', unmatched source rows are
        # 'insert' — and a key carrying BOTH a 'D' and an upsert counts
        # as delete + insert (never an unpaired postimage). The fold
        # identity (prev − pre − delete + post + insert == next, as
        # multisets) holds by construction; the model test asserts it
        # under random op sequences.
        tgt_keys = target.select(key).distinct()
        upd_keys = upserts.select(key).distinct().join(
            tgt_keys, on=key, how="left_semi"
        )
        if deletes is not None:
            upd_keys = upd_keys.join(
                deletes.distinct(), on=key, how="left_anti"
            )
        src_cols = upserts.select(*target.columns)
        change = (
            target.join(upd_keys, on=key, how="left_semi")
            .withColumn(_CT_COL, F.lit("update_preimage"))
            .unionByName(
                src_cols.join(upd_keys, on=key, how="left_semi")
                .withColumn(_CT_COL, F.lit("update_postimage"))
            )
            .unionByName(
                src_cols.join(upd_keys, on=key, how="left_anti")
                .withColumn(_CT_COL, F.lit("insert"))
            )
        )
        if deletes is not None:
            change = change.unionByName(
                target.join(deletes.distinct(), on=key, how="left_semi")
                .withColumn(_CT_COL, F.lit("delete"))
            )
        if deleted_by_source is not None:
            change = change.unionByName(
                deleted_by_source.withColumn(_CT_COL, F.lit("delete"))
            )
        # materialize BEFORE the overwrite tombstones the files the
        # change plan reads (same rule as the merged snapshot)
        change = change.localCheckpoint(eager=True)
        cdc_acts = _stage_cdc_files(
            change, table, version + 1, _column_mapping(meta)
        )
    # MERGE's output is computed from the snapshot it read: a rebase
    # over concurrent data commits would silently drop their rows
    return write_delta_commit(
        merged,
        table,
        mode="overwrite",
        strict_conflicts=True,
        commit_timestamp=commit_timestamp,
        cdc_actions=cdc_acts,
    )


def _zorder_key(df: DataFrame, cols: list[str], bits: int = 4):
    """Morton (Z-curve) key over quantile-ranked numeric columns: each
    column quantizes to a ``2^bits``-bucket rank via approxQuantile
    boundaries (driver-side, O(buckets) metadata — never data), then the
    rank bits INTERLEAVE, so proximity in the key implies proximity in
    EVERY dimension at once. Files range-partitioned on this key get
    narrow min/max stats on ALL the z-columns — the property linear
    ``cluster_by`` only delivers for its leading key. Quantile (not
    min/max-uniform) bucketing keeps the curve balanced under skew. The
    whole expression is built-in arithmetic — codegen-friendly, no UDF."""
    from functools import reduce

    from pyspark.sql import functions as F

    n_buckets = 1 << bits
    probs = [i / n_buckets for i in range(1, n_buckets)]
    for c in cols:
        f = df.schema[c].dataType.typeName()
        if f not in (
            "integer", "long", "short", "byte", "double", "float", "decimal"
        ) and not f.startswith("decimal"):
            raise ValueError(
                f"zorder_by column {c!r} must be numeric, got {f}"
            )
    # ONE stats pass for every z-column: approxQuantile takes a column
    # LIST and computes all sketches in a single job — per-column calls
    # would scan the table once per dimension before the rewrite even
    # starts (3-4 wasted full passes per OPTIMIZE at 100 TB).
    all_cuts = df.approxQuantile(cols, probs, 0.01)
    ranks = []
    for c, cuts in zip(cols, all_cuts):
        bnd = sorted(set(cuts))
        ranks.append(
            reduce(
                lambda acc, b: acc
                + F.when(F.col(c) >= F.lit(b), 1).otherwise(0),
                bnd,
                F.lit(0),
            )
        )
    z = F.lit(0)
    for bit in range(bits):
        for j, r in enumerate(ranks):
            pos = bit * len(ranks) + j
            z = z + F.shiftright(r, bit).bitwiseAND(F.lit(1)) * F.lit(
                1 << pos
            )
    return z


def optimize_delta(
    spark: SparkSession,
    table: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
    zorder_by: list[str] | None = None,
    commit_timestamp: int | None = None,
    partition_filter: dict[str, str] | None = None,
) -> int:
    """OPTIMIZE (small-file compaction) as a Delta commit: rewrite the
    current snapshot into ⌈bytes/target⌉ files and commit removes + adds
    with ``dataChange: false`` — the protocol's marker that the commit
    reorganizes storage without changing table content (streaming
    readers skip it). Returns the committed version.

    ``cluster_by`` range-partitions + sorts the rewrite on the given
    keys, so each output file covers a narrow key range and the per-file
    ``stats`` become selective for the LEADING key — linear clustering.
    ``zorder_by`` (mutually exclusive) range-partitions on a Morton
    interleaved-bits key instead (:func:`_zorder_key`) — OPTIMIZE
    ZORDER — so ``read_delta_log(column_ranges=...)`` data skipping
    prunes on EVERY listed dimension, the multi-column-predicate layout
    that matters once a 100 TB table is queried by more than one key.

    This is the table-service answer to microbatch file accumulation
    (same role as ``writers.compact_table``), but snapshot-isolated:
    concurrent readers of older versions keep their file lists, and time
    travel across the OPTIMIZE boundary still works because the old
    files stay on disk until VACUUM.

    ``partition_filter`` ({col: value}) is ``OPTIMIZE ... WHERE``:
    compaction scoped to the matching partitions only — files of other
    partitions are neither read, rewritten, nor tombstoned, and the
    conflict read-set shrinks to the scoped files (a concurrent writer
    touching OTHER partitions commutes). At 100 TB this is how table
    services actually run: compact yesterday's partition, never the
    whole table."""
    import math

    version = _latest_version(table)
    live, meta = _replay(table, version)
    if meta is None:
        raise ValueError(f"no metaData action in log for {table}")
    if partition_filter:
        part_set = set(meta.get("partitionColumns") or [])
        unknown = set(partition_filter) - part_set
        if unknown:
            raise ValueError(
                f"partition_filter on non-partition columns "
                f"{sorted(unknown)}; table is partitioned by "
                f"{sorted(part_set)}"
            )
        live = {
            p: a
            for p, a in live.items()
            if all(
                _partition_values(a).get(k) == str(v)
                for k, v in partition_filter.items()
            )
        }
        if not live:
            return version  # nothing in scope: no commit
    if not live:
        # nothing to compact — an empty snapshot has no files. Committing
        # anyway would ADD a zero-row file that the next overwrite must
        # then tombstone, turning that overwrite into a rewriting commit
        # (remove + add) the snapshot stream rightly skips — dropping the
        # overwrite's rows from the append flow. Found by the round-11
        # random-op model ([delete-all, optimize, overwrite]); delta-spark
        # OPTIMIZE with zero candidate files is the same no-op.
        return version
    size = sum(a.get("size", 0) for a in live.values())
    n_files = max(1, math.ceil(size / target_file_bytes))
    if cluster_by and zorder_by:
        raise ValueError("pass either cluster_by or zorder_by, not both")
    snapshot = read_delta_log(
        spark, table, partition_filter=partition_filter
    )
    if cluster_by:
        from pyspark.sql import functions as F

        cols = [F.col(c) for c in cluster_by]
        snapshot = snapshot.repartitionByRange(
            n_files, *cols
        ).sortWithinPartitions(*cols)
    elif zorder_by:
        from pyspark.sql import functions as F

        zc = "_deg04_zorder"
        snapshot = (
            snapshot.withColumn(zc, _zorder_key(snapshot, zorder_by))
            .repartitionByRange(n_files, F.col(zc))
            .sortWithinPartitions(zc)
            .drop(zc)
        )
    else:
        snapshot = snapshot.repartition(n_files)
    snapshot = snapshot.localCheckpoint(eager=True)
    mapping = _column_mapping(meta)
    if mapping:
        snapshot = _to_physical(snapshot, mapping)
    new_version = version + 1
    # a partitioned table must stay hive-partitioned through the rewrite
    # or the new files lose their partitionValues (and the basePath read
    # its directory-derived columns)
    part_cols = list(meta.get("partitionColumns") or []) or None
    adds = _stage_files(snapshot, table, new_version, part_cols)
    for a in adds:
        a["add"]["dataChange"] = False
    actions: list[dict] = []
    for path in sorted(live):
        actions.append(
            {
                "remove": {
                    "path": path,
                    "deletionTimestamp": 0,
                    "dataChange": False,
                }
            }
        )
    actions.extend(adds)
    actions.append(
        {
            "commitInfo": {
                "operation": "OPTIMIZE",
                "operationParameters": {
                    "targetSize": target_file_bytes,
                    **(
                        {"predicate": json.dumps(partition_filter)}
                        if partition_filter
                        else {}
                    ),
                },
            }
        }
    )
    # compaction rewrites exactly its input files without changing
    # logical content: blind appends commute (delta-spark allows them),
    # but removal or DV-modification of an input file is a conflict
    return _publish_rmw_commit(
        table,
        new_version - 1,
        actions,
        op="OPTIMIZE",
        read_paths=frozenset(live),
        tolerate_appends=True,
        commit_timestamp=commit_timestamp,
    )


def restore_delta(
    spark: SparkSession, table: str, version: int,
    commit_timestamp: int | None = None,
) -> int:
    """RESTORE TABLE ... VERSION AS OF: commit a new version whose live
    state equals snapshot ``version`` — adds back files the target had
    (including their deletion-vector state), removes files added since,
    and re-commits the target's metaData when the schema drifted. The
    restore is itself a commit: history is never rewritten, time travel
    to the pre-restore state still works, and a second RESTORE can undo
    the first. Restored files must still exist on disk (not VACUUMed) —
    the same constraint delta-spark's RESTORE enforces. Returns the new
    version.

    O(metadata) end to end: two log replays and one JSON commit, zero
    data movement — which is why RESTORE is the right rollback tool at
    100 TB (the alternative, re-writing the old snapshot's data, costs
    a full table write)."""
    del spark  # log-only operation; kept for API symmetry with readers
    cur = _latest_version(table)
    if version == cur:
        return cur
    target_live, target_meta = _replay(table, version)
    cur_live, cur_meta = _replay(table, cur)
    if target_meta is None:
        raise ValueError(f"no metaData action at version {version}")
    missing = [
        p for p in target_live if not os.path.exists(os.path.join(table, p))
    ]
    if missing:
        raise FileNotFoundError(
            f"cannot RESTORE {table} to {version}: {len(missing)} data "
            f"file(s) were VACUUMed (e.g. {missing[0]})"
        )
    actions: list[dict] = []
    if target_meta != cur_meta:
        actions.append({"metaData": target_meta})
    for path in sorted(set(cur_live) - set(target_live)):
        actions.append(
            {
                "remove": {
                    "path": path,
                    "deletionTimestamp": 0,
                    "dataChange": True,
                }
            }
        )
    for path in sorted(target_live):
        if target_live[path] != cur_live.get(path):
            # absent now, or present with different state (e.g. another
            # deletionVector): the add fully replaces last-add-wins
            add = dict(target_live[path])
            add["dataChange"] = True
            actions.append({"add": add})
    actions.append(
        {
            "commitInfo": {
                "operation": "RESTORE",
                "operationParameters": {"version": version},
            }
        }
    )
    # RESTORE replaces the whole table state it computed from `cur`:
    # any concurrent commit invalidates the diff
    return _publish_rmw_commit(
        table,
        cur,
        actions,
        op="RESTORE",
        read_paths=frozenset(cur_live),
        commit_timestamp=commit_timestamp,
    )


def clone_delta(
    spark: SparkSession, src: str, dst: str, version: int | None = None
) -> int:
    """SHALLOW CLONE: create a new Delta table at ``dst`` whose version-0
    commit references the SOURCE's data files by absolute path (the
    spec's shallow-clone form) — zero bytes of data copied, O(metadata)
    end to end. The clone then evolves independently: appends land as
    normal relative files next to the absolute references (the scan
    layer groups per base path), overwrites/deletes tombstone or DV the
    referenced files in the CLONE's log only, and ``vacuum_delta`` on
    either table never reclaims the other's files (it only walks its own
    directory). On-disk (``u``) deletion-vector descriptors are
    rewritten to the spec's absolute-path ``p`` storage so the clone's
    readers resolve them without owning the files. This is the
    dev/test-against-prod and experiment-branch primitive: at 100 TB a
    deep copy is a day of cluster time, a shallow clone is one JSON
    file. Public surface: delta-spark's ``CREATE TABLE ... SHALLOW CLONE
    src [VERSION AS OF n]``; reference intent
    ``spark_session_factory.py:27-33`` (Delta as the managed-table
    format)."""
    del spark  # log-only operation; kept for API symmetry
    if version is None:
        version = _latest_version(src)
    live, meta = _replay(src, version)
    if meta is None:
        raise ValueError(f"no metaData action in log for {src}")
    if os.path.exists(_log_path(dst)) and delta_versions(dst):
        raise FileExistsError(f"clone target {dst} already has a Delta log")
    src_abs = os.path.abspath(src)
    proto = _replay_protocol(src, version)
    actions: list[dict] = [{"protocol": proto}]
    new_meta = dict(meta)
    new_meta["id"] = uuid.uuid4().hex  # a clone is its OWN table
    cfg = dict(new_meta.get("configuration") or {})
    cfg["delta.clonedFrom"] = src_abs
    cfg["delta.clonedVersion"] = str(version)
    new_meta["configuration"] = cfg
    actions.append({"metaData": new_meta})
    for path in sorted(live):
        add = dict(live[path])
        if not os.path.isabs(path):
            add["path"] = os.path.join(src_abs, path).replace(os.sep, "/")
        dv = add.get("deletionVector")
        if dv and dv.get("storageType") == "u":
            dv = dict(dv)
            dv["storageType"] = "p"
            dv["pathOrInlineDv"] = os.path.join(
                src_abs, _dv_rel_path(dv)
            ).replace(os.sep, "/")
            add["deletionVector"] = dv
        add["dataChange"] = True
        actions.append({"add": add})
    actions.append(
        {
            "commitInfo": {
                "operation": "CLONE",
                "operationParameters": {
                    "source": src_abs,
                    "sourceVersion": version,
                    "isShallow": True,
                },
            }
        }
    )
    os.makedirs(_log_path(dst), exist_ok=True)
    _write_commit_file(dst, 0, actions)
    return 0


#: Files younger than this are NEVER vacuumed (mtime-based), mirroring
#: delta-spark's default 7-day retention and iceberg_tables.
#: ORPHAN_GRACE_MS. A distributed writer stages part files INTO the
#: table directory before its commit JSON publishes, so between the
#: rename and the publish those files are unreferenced — a grace-less
#: vacuum racing a live writer deletes them and the commit then
#: publishes references to vanished files (the round-10 live-race hole,
#: the exact twin of the r9 Iceberg remove_orphan hole). grace_ms=0 is
#: safe ONLY with every writer quiesced.
VACUUM_GRACE_MS = 3 * 24 * 3600 * 1000


def vacuum_delta(table: str, grace_ms: int = VACUUM_GRACE_MS) -> list[str]:
    """VACUUM: delete data files no longer referenced by ANY
    reconstructable snapshot (file referenced by no version's live set —
    i.e. removed and unreachable even via time travel from the earliest
    replayable version) and older than ``grace_ms``. Returns the deleted
    relative paths.

    Retention here is "every replayable version" rather than a wall-clock
    horizon (no clocks in this engine's tests); delta-spark's
    ``RETAIN n HOURS`` maps onto the same referenced-set computation with
    a time cutoff. ``grace_ms`` protects exactly two racing shapes a
    LIVE table exhibits: (a) a writer's staged-but-not-yet-committed
    part files, and (b) files added by commits that landed after this
    vacuum's replay snapshot. Both are seconds old when vacuum meets
    them; both are unreferenced by every version vacuum can see; both
    would be silently deleted without the window. Crashed writers'
    stale ``_stage_*`` leftovers DO get reclaimed once they age past the
    window — the same trade delta-spark's retention makes."""
    import time as _time

    latest = _latest_version(table)
    earliest = 0
    if not os.path.exists(_commit_file(table, 0)):
        # earliest replayable version = oldest on-disk checkpoint (the
        # r11 _usable_checkpoint fallback makes versions between two
        # checkpoints replayable again — their files must stay
        # referenced or vacuum would break the time travel the replay
        # fix just restored)
        disk = _checkpoints_on_disk(table)
        earliest = disk[0] if disk else (_read_last_checkpoint(table) or 0)
    referenced: set[str] = set()
    for v in range(earliest, latest + 1):
        try:
            live, _meta = _replay(table, v)
        except FileNotFoundError:
            continue
        referenced.update(live)
        for a in live.values():
            dv = a.get("deletionVector")
            if dv and dv.get("storageType") == "u":
                # a live snapshot's deletion vector is part of that
                # snapshot — reclaiming it would corrupt time travel
                referenced.add(_dv_rel_path(dv))
    for v in range(earliest, latest + 1):
        # commit-time cdc files live exactly as long as their commit
        # JSON is replayable: read_delta_changes serves them for any
        # in-retention range, so reclaiming one would break a valid CDF
        # read; once cleanup truncates the commit (the range refuses
        # anyway), the file goes unreferenced and sweeps here.
        if not os.path.exists(_commit_file(table, v)):
            continue
        for action in _read_commit(table, v):
            if "cdc" in action:
                referenced.add(action["cdc"]["path"])
    now_ms = _time.time() * 1000.0
    doomed = []
    for root, _dirs, files in os.walk(table):
        if _LOG_DIR in os.path.relpath(root, table).split(os.sep):
            continue
        for f in files:
            if not (f.endswith(".parquet") or f.endswith(".bin")):
                continue
            full = os.path.join(root, f)
            rel = os.path.relpath(full, table).replace(os.sep, "/")
            if rel in referenced:
                continue
            try:
                age_ms = now_ms - os.path.getmtime(full) * 1000.0
            except OSError:
                continue  # vanished mid-walk (e.g. a writer's stage move)
            if age_ms < grace_ms:
                continue  # inside the grace window — may be in flight
            doomed.append(rel)
    survivors = []
    for rel in doomed:
        try:
            os.remove(os.path.join(table, rel))
            survivors.append(rel)
        except FileNotFoundError:
            pass  # a concurrent vacuum got it first — same outcome
    return sorted(survivors)


def cleanup_delta_log(table: str) -> list[int]:
    """Metadata cleanup (delta-spark's ``delta.logRetentionDuration``
    sweep, run automatically after checkpoints): JSON commits and stale
    checkpoint files strictly BELOW the last checkpoint are redundant —
    the checkpoint fully reconstructs its version and everything above
    replays from it — and are deleted. Time travel below the checkpoint
    stops resolving (loudly; that is the retention trade, and why
    retention must exceed the oldest reader). Retention here is
    version-based rather than wall-clock for the same no-clocks reason
    as :func:`vacuum_delta`. Returns the removed commit versions."""
    cp = _read_last_checkpoint(table)
    if cp is None:
        return []  # nothing is reconstructable without the JSON log
    removed: list[int] = []
    for v in delta_versions(table):
        if v >= cp:
            continue
        try:
            os.remove(_commit_file(table, v))
            removed.append(v)
        except FileNotFoundError:
            pass  # a concurrent cleanup got it first — same outcome
        stale_cp = _checkpoint_file(table, v)
        try:
            os.remove(stale_cp)
        except FileNotFoundError:
            pass
    return removed


def read_delta_changes(
    spark: SparkSession, table: str, from_version: int, to_version: int
) -> DataFrame:
    """Change data feed (delta-spark's ``table_changes``) reconstructed
    from the log: every row inserted or deleted by the commits in
    ``(from_version, to_version]``, tagged with ``_change_type``
    ('insert' | 'delete' | 'update_preimage' | 'update_postimage' —
    delta-spark's CDF flavor: an UPDATE commit's diff rows are its pre/
    post images) and ``_commit_version``.

    Per commit: a pure-append (`add` only, dataChange=true) feeds its new
    files directly — no diffing; a rewriting commit (overwrite/merge)
    yields the MULTISET difference of its adjacent snapshots
    (``exceptAll`` both ways — exact under duplicate rows); a
    dataChange=false commit (OPTIMIZE) emits nothing, by protocol.

    Scale note: real Delta CDF persists change files AT COMMIT TIME so
    reading changes never diffs snapshots. Since round 11 this engine
    does too — ``enable_delta_cdf`` makes UPDATE/DELETE/MERGE write
    ``_change_data/`` files with ``cdc`` actions, and commits carrying
    them are served from those files directly (O(changed rows), the hot
    path). The snapshot-diff reconstruction remains the fallback for
    commits written before the property was set — right for
    audit/backfill, and said so here."""
    from pyspark.sql import functions as F

    out: DataFrame | None = None
    for v in range(from_version + 1, to_version + 1):
        try:
            actions = _read_commit(table, v)
            _live, meta = _replay(table, v)
        except FileNotFoundError as exc:
            # round-10 live-race contract: a CDF range that log cleanup
            # truncated mid-read must refuse with the documented message,
            # never leak a raw ENOENT or return a partial diff. The
            # _replay case covers the snapshot diff of a rewriting
            # commit whose base versions were truncated under the read.
            raise ValueError(
                f"change feed range ({from_version}, {to_version}] for "
                f"{table} includes commit {v}, which has been truncated "
                "by log cleanup (retention passed) — re-read from a "
                "version at or above the current checkpoint"
                f" [{exc}]"
            ) from None
        cdcs = [a["cdc"] for a in actions if "cdc" in a]
        if cdcs:
            # commit-time CDC (the spec's rule: when a commit carries
            # cdc actions, readers take change info from those files
            # EXCLUSIVELY — no snapshot diff, no add/remove derivation).
            # This is the O(changed rows) hot path the docstring's scale
            # note promises once ``enable_delta_cdf`` is on.
            schema = StructType.fromJson(json.loads(meta["schemaString"]))
            mapping = _column_mapping(meta)
            paths = [os.path.join(table, c["path"]) for c in cdcs]
            scan = spark.read.parquet(*paths)
            if mapping:
                scan = _to_logical(scan, mapping, keep=(_CT_COL,))
            delta = scan.select(
                *[F.col(f.name).cast(f.dataType) for f in schema.fields],
                F.col(_CT_COL),
            ).withColumn("_commit_version", F.lit(v).cast("long"))
            out = delta if out is None else out.unionByName(delta)
            continue
        adds = [a["add"] for a in actions if "add" in a]
        removes = [a for a in actions if "remove" in a]
        op = None
        for a in actions:
            if "commitInfo" in a:
                op = a["commitInfo"].get("operation")
        data_change = any(a.get("dataChange", True) for a in adds) or any(
            r["remove"].get("dataChange", True) for r in removes
        )
        if not data_change:
            continue  # OPTIMIZE: storage reorganization, no table change
        schema = StructType.fromJson(json.loads(meta["schemaString"]))
        # an add-only commit is a pure append UNLESS it is a RESTORE:
        # a restore across a DV delete re-adds LIVE paths with smaller
        # deletion vectors and removes nothing — its change rows are
        # the resurrected ones, not the whole re-added files (round-11
        # hole found by the stream-reconstruction equality test: the
        # pure-append branch re-emitted DV-dead rows and stale values)
        if not removes and op != "RESTORE":
            # pure append: the added files ARE the inserted rows
            # (_scan_adds also derives Hive partition columns — a bare
            # schema read would null them out on a partitioned append)
            mapping = _column_mapping(meta)
            if not adds:
                delta = None
            else:
                scan = _scan_adds(
                    spark,
                    table,
                    meta,
                    adds,
                    _physical_struct(meta) if mapping else schema,
                )
                if mapping:
                    scan = _to_logical(scan, mapping)
                delta = scan.withColumn("_change_type", F.lit("insert"))
        else:
            # delta-spark's CDF flavor: an UPDATE's diff rows are its
            # pre/post images, not anonymous delete/insert pairs
            ins_tag, del_tag = (
                ("update_postimage", "update_preimage")
                if op == "UPDATE"
                else ("insert", "delete")
            )
            try:
                prev = read_delta_log(spark, table, v - 1)
                cur = read_delta_log(spark, table, v)
            except FileNotFoundError as exc:
                raise ValueError(
                    f"change feed range ({from_version}, {to_version}] "
                    f"for {table}: snapshot base of commit {v} was "
                    "truncated by log cleanup (retention passed) — "
                    f"re-read from the current checkpoint [{exc}]"
                ) from None
            cols = cur.columns
            ins = cur.exceptAll(prev.select(*cols)).withColumn(
                "_change_type", F.lit(ins_tag)
            )
            dels = prev.select(*cols).exceptAll(cur).withColumn(
                "_change_type", F.lit(del_tag)
            )
            delta = ins.unionByName(dels)
        if delta is None:
            continue
        delta = delta.withColumn("_commit_version", F.lit(v).cast("long"))
        out = delta if out is None else out.unionByName(delta)
    if out is None:
        raise ValueError(
            f"no data-changing commits in ({from_version}, {to_version}] "
            f"for {table}"
        )
    return out


def delta_stream_writer(table: str, app_id: str):
    """foreachBatch function for an EXACTLY-ONCE streaming append sink on
    the jar-less Delta table: each microbatch commits with a ``txn``
    action ``(app_id, batch_id)``, and a batch whose id is already
    recorded is skipped entirely — so at-least-once batch re-delivery
    (foreachBatch's contract after restarts) becomes exactly-once table
    content. Same mechanism as delta-spark's streaming sink; the skip
    check is one log replay (O(commits since checkpoint)), not a data
    comparison."""

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_id <= last_txn_version(table, app_id):
            return  # replayed epoch — already committed
        write_delta_commit(
            batch_df, table, mode="append", txn=(app_id, batch_id)
        )

    return apply_batch


def delta_history(table: str) -> list[dict]:
    """DESCRIBE HISTORY: one dict per commit (version, operation, files
    added/removed), ascending. Replays commitInfo/add/remove counts only."""
    out = []
    for v in delta_versions(table):
        n_add = n_remove = 0
        op = None
        for action in _read_commit(table, v):
            if "add" in action:
                n_add += 1
            elif "remove" in action:
                n_remove += 1
            elif "commitInfo" in action:
                op = action["commitInfo"].get("operation")
        out.append(
            {"version": v, "operation": op, "n_add": n_add, "n_remove": n_remove}
        )
    return out
