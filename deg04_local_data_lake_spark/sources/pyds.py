"""Custom Python data source (Spark 4 ``pyspark.sql.datasource``).

The reference ingests OHLCV ticker feeds from CSV drops
(mage_demo/scratchpads/financial_dl_etl.py:102-108); this source shows the
engine-extensibility answer: a first-class ``spark.read.format(...)``
connector written in Python that Spark plans like any other scan —

- **partitioned parallel reads**: one :class:`InputPartition` per trading
  day, so a 10-year backfill fans out across the cluster instead of
  serializing through the driver;
- **filter pushdown** (``pushFilters``): ``day = N`` / ``day IN (...)`` /
  ``ticker = 'X'`` predicates prune partitions and generated rows at the
  source, before any data exists — the same contract parquet scans get
  from row-group stats;
- **deterministic generation**: every tick derives from md5 of
  (ticker, day, seq), so reads are reproducible across retries and
  speculative tasks — the property every restartable source needs.

At 100 TB the same shape wraps a real external system (an HTTP tick API, a
market-data vendor SDK): partitions = request shards, pushFilters = query
parameters.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    EqualTo,
    Filter,
    In,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

TICKS_SCHEMA = "day int, ticker string, seq int, price double, volume bigint"


class DayPartition(InputPartition):
    def __init__(self, day: int):
        self.day = day


def _tick(ticker: str, day: int, seq: int) -> tuple:
    h = hashlib.md5(f"{ticker}:{day}:{seq}".encode()).hexdigest()
    price = 100.0 + (int(h[:8], 16) % 10_000) / 100.0
    volume = 1_000 + int(h[8:16], 16) % 100_000
    return (day, ticker, seq, price, volume)


class TicksReader(DataSourceReader):
    def __init__(self, options):
        self.n_days = int(options.get("days", 5))
        self.tickers = [
            t for t in options.get("tickers", "AAPL,MSFT,GOOG").split(",") if t
        ]
        self.rows = int(options.get("rowsperday", 10))
        self.days = list(range(self.n_days))

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("day",):
                self.days = [d for d in self.days if d == f.value]
            elif isinstance(f, In) and f.attribute == ("day",):
                # In.value is the tuple of values (the dataclass field is
                # singular); `.values` raised and silently disabled IN
                # pruning until the oracle query exercised it
                self.days = [d for d in self.days if d in f.value]
            elif isinstance(f, EqualTo) and f.attribute == ("ticker",):
                self.tickers = [t for t in self.tickers if t == f.value]
            else:
                yield f  # unsupported → Spark evaluates it post-scan

    def partitions(self) -> list[InputPartition]:
        return [DayPartition(d) for d in self.days]

    def read(self, partition: DayPartition) -> Iterator[tuple]:
        for ticker in self.tickers:
            for seq in range(self.rows):
                yield _tick(ticker, partition.day, seq)


class TicksDataSource(DataSource):
    """``spark.read.format("deg04_ticks")`` after
    ``spark.dataSource.register(TicksDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "deg04_ticks"

    def schema(self) -> str:
        return TICKS_SCHEMA

    def reader(self, schema) -> TicksReader:
        return TicksReader(self.options)

    def simpleStreamReader(self, schema) -> "TicksStreamReader":
        return TicksStreamReader(self.options)


class TicksStreamReader(SimpleDataSourceStreamReader):
    """Offset-tracked streaming variant: each microbatch advances the
    day offset by ``daysPerBatch``. Offsets are plain dicts checkpointed
    by Spark, and generation is a pure function of (ticker, day, seq) —
    so ``readBetweenOffsets`` replays EXACTLY the same rows after a
    failure, which is the whole exactly-once contract a custom streaming
    source must honor. A real feed would map offsets to vendor sequence
    numbers / Kafka-style cursors the same way."""

    def __init__(self, options):
        self.tickers = [
            t for t in options.get("tickers", "AAPL,MSFT,GOOG").split(",") if t
        ]
        self.rows = int(options.get("rowsperday", 10))
        self.per_batch = int(options.get("daysperbatch", 1))
        self.max_days = int(options.get("days", 5))

    def initialOffset(self) -> dict:
        return {"day": 0}

    def read(self, start: dict):
        lo = start["day"]
        hi = min(lo + self.per_batch, self.max_days)
        return self._rows(lo, hi), {"day": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["day"], end["day"])  # deterministic replay

    def _rows(self, lo: int, hi: int) -> list[tuple]:
        # a concrete list, not a generator — the prefetch path pickles
        # the returned rows alongside the offset
        return [
            _tick(ticker, day, seq)
            for day in range(lo, hi)
            for ticker in self.tickers
            for seq in range(self.rows)
        ]


@dataclass
class JsonlCommit(WriterCommitMessage):
    file: str
    rows: int


class JsonlWriter(DataSourceWriter):
    """Executor-side task writer with the two-phase commit protocol every
    exactly-once sink needs: each task writes to a uuid-named temp file
    and reports it in its commit message; only the DRIVER's ``commit``
    publishes (atomic rename + ``_SUCCESS`` manifest), and ``abort``
    removes temps — so readers keyed on the manifest never observe
    partial output from failed/speculative tasks. Same protocol Spark's
    FileOutputCommitter v2 / Delta's log commit implement."""

    def __init__(self, options, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("deg04_jsonl requires a path")
        self.overwrite = overwrite

    def write(self, iterator) -> JsonlCommit:
        import json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        tmp = os.path.join(self.path, f"_tmp-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(tmp, "w") as f:
            for row in iterator:
                f.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return JsonlCommit(file=tmp, rows=n)

    def commit(self, messages) -> None:
        import json
        import os

        final = []
        for m in messages:
            pub = m.file.replace("_tmp-", "part-")
            os.replace(m.file, pub)
            final.append({"file": os.path.basename(pub), "rows": m.rows})
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump(final, f)

    def abort(self, messages) -> None:
        import os

        for m in messages:
            if m is not None and os.path.exists(m.file):
                os.remove(m.file)


class JsonlDataSource(DataSource):
    """``df.write.format("deg04_jsonl").option("path", p).save()`` after
    ``spark.dataSource.register(JsonlDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "deg04_jsonl"

    def writer(self, schema, overwrite: bool) -> JsonlWriter:
        return JsonlWriter(self.options, overwrite)


# ------------------------------------------------- Delta log as a stream
#
# ``spark.readStream.format("deg04_delta_stream")`` over a jar-less Delta
# table (sources/delta_log.py): the structured-streaming source
# delta-spark exposes, rebuilt on the Python Data Source API. Offsets ARE
# log versions — initial −1, each trigger advances to the latest commit
# (bounded by ``maxVersionsPerBatch`` to keep microbatches commit-sized),
# and ``partitions`` fans the versions' ``add`` actions out one
# InputPartition per data file, read executor-side as Arrow batches
# straight from parquet. Replaying (version_lo, version_hi] always yields
# the same files, so checkpointed restarts are exactly-once.
#
# Change semantics match delta-spark's source: ``dataChange=false``
# commits (OPTIMIZE) are invisible; a commit that REMOVES files
# (overwrite / DELETE / UPDATE) fails the stream unless
# ``skipChangeCommits=true``, in which case it is skipped whole — a
# streaming reader must never silently re-emit rewritten rows.
#
# The classes are built INSIDE a factory so cloudpickle serializes them
# BY VALUE: Spark plans Python streaming sources in a separate
# python_streaming_source_runner process that does not see
# ``sc.addPyFile`` modules, so a module-top-level class (pickled by
# reference) would fail to import there. For the same reason the reader
# is fully self-contained — only stdlib + pyarrow, with the tiny
# log-listing/commit-parsing bits inlined rather than imported from
# ``sources.delta_log``.


def make_delta_stream_source():
    """Build the ``deg04_delta_stream`` DataSource class (see module
    comment for why this is a factory). Register with
    ``spark.dataSource.register(make_delta_stream_source())``."""
    import json as _json
    import os as _os

    from pyspark import cloudpickle as _cloudpickle
    from pyspark.sql.datasource import (
        DataSource as _DataSource,
        DataSourceStreamReader as _StreamReader,
        InputPartition as _InputPartition,
    )

    from deg04_local_data_lake_spark.sources import roaring as _roaring

    # the runner process can't import sc.addPyFile modules, so the DV
    # bitmap codec rides along by value (numpy-only module) exactly as
    # the Iceberg factory below ships its Avro codec
    _cloudpickle.register_pickle_by_value(_roaring)
    _dv_deserialize = _roaring.deserialize_array

    def _latest_version(table):
        log = _os.path.join(table, "_delta_log")
        versions = [
            int(f[:20])
            for f in _os.listdir(log)
            if f.endswith(".json") and f[:20].isdigit()
        ]
        if not versions:
            raise FileNotFoundError(f"no commits in {log}")
        return max(versions)

    def _read_commit(table, version):
        p = _os.path.join(table, "_delta_log", f"{version:020d}.json")
        with open(p) as f:
            return [_json.loads(line) for line in f if line.strip()]

    def _pointer_version(table):
        p = _os.path.join(table, "_delta_log", "_last_checkpoint")
        if not _os.path.exists(p):
            return None
        with open(p) as f:
            return int(_json.load(f)["version"])

    def _checkpoints_on_disk(table):
        log = _os.path.join(table, "_delta_log")
        if not _os.path.isdir(log):
            return []
        return sorted(
            int(f[:20])
            for f in _os.listdir(log)
            if f.endswith(".checkpoint.parquet") and f[:20].isdigit()
        )

    def _checkpoint_meta(table):
        """Latest ``metaData`` recoverable from the newest parquet
        checkpoint — required once log cleanup truncates the early
        commits (v0 carries the only JSON metaData on an untouched
        table, so a cleaned log has NO metaData in any commit file).
        Round-10 live-race hole #5: without this, the stream source
        refused to even START on a perfectly healthy cleaned table.

        Round-11 hardening (ADVICE r10): mirrors delta_log's
        ``_checkpoint_rows_with_retry`` + pointer-is-a-hint fallback —
        inlined rather than imported because the streaming runner
        process can't see ``sources.delta_log`` (module comment). If
        racing maintenance deletes the named checkpoint between the
        pointer read and the parquet open, retry via the fresh pointer
        or the newest ON-DISK checkpoint instead of silently returning
        None (which made schema resolution fail on a healthy table)."""
        import pyarrow.parquet as _pq

        cp = _pointer_version(table)
        if cp is None:
            disk = _checkpoints_on_disk(table)
            cp = disk[-1] if disk else None
        for _attempt in range(8):
            if cp is None:
                return None  # genuinely checkpoint-less table
            cpf = _os.path.join(
                table, "_delta_log", f"{cp:020d}.checkpoint.parquet"
            )
            try:
                rows = _pq.read_table(cpf, columns=["metaData"]).to_pylist()
            except FileNotFoundError:
                newer = _pointer_version(table)
                if newer is not None and newer != cp:
                    cp = newer
                    continue
                disk = [c for c in _checkpoints_on_disk(table) if c != cp]
                cp = disk[-1] if disk else None
                continue
            meta = None
            for row in rows:
                m = row.get("metaData")
                if m and m.get("schemaString"):
                    meta = dict(m)
                    # pyarrow reads map<string,string> back as pair-lists
                    cfg = meta.get("configuration")
                    if isinstance(cfg, list):
                        meta["configuration"] = dict(cfg)
            return meta
        return None  # pointer kept moving: caller's JSON fallback decides

    def _physical_to_logical(table):
        """physical→logical column renames from the LATEST ``metaData``
        action (empty when the table has no column mapping). Streaming a
        column-mapped table must bind parquet's PHYSICAL names back to
        the declared logical schema or the Arrow batches misbind
        (round-6 ADVICE). Latest, not per-version: the stream declares
        the latest logical schema, and physical names are stable across
        renames, so the latest mapping binds files from EVERY version —
        including those written before column mapping was activated,
        whose stored names became the physical names at activation."""
        meta = _checkpoint_meta(table)  # base for cleanup-truncated logs
        for v in range(_latest_version(table) + 1):
            try:
                for a in _read_commit(table, v):
                    if "metaData" in a:
                        meta = a["metaData"]
            except FileNotFoundError:
                continue
        if meta is None:
            return {}
        if (
            meta.get("configuration", {}).get("delta.columnMapping.mode")
            != "name"
        ):
            return {}
        rename = {}
        for f in _json.loads(meta["schemaString"])["fields"]:
            phys = f.get("metadata", {}).get(
                "delta.columnMapping.physicalName"
            )
            if phys and phys != f["name"]:
                rename[phys] = f["name"]
        return rename

    _Z85 = (
        "0123456789abcdefghijklmnopqrstuvwxyz"
        "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
    )
    _Z85_IDX = {c: i for i, c in enumerate(_Z85)}

    def _z85_decode(s, length=None):
        out = bytearray()
        for i in range(0, len(s), 5):
            v = 0
            for c in s[i: i + 5]:
                v = v * 85 + _Z85_IDX[c]
            out += v.to_bytes(4, "big")
        return bytes(out[:length]) if length is not None else bytes(out)

    def _dv_rows(table, desc):
        """deletionVector descriptor → sorted list of deleted row
        indexes, or None when the add carries no DV. Mirrors
        delta_log._dv_load (inlined: module comment) — ``i`` inline
        z85 payloads and ``u`` on-disk framed files, crc-checked."""
        import struct as _struct
        import zlib as _zlib
        import uuid as _uuid

        if not desc or not desc.get("storageType"):
            return None
        st = desc["storageType"]
        if st == "i":
            data = _z85_decode(
                desc["pathOrInlineDv"], desc.get("sizeInBytes")
            )
        elif st in ("u", "p"):
            if st == "u":
                enc = desc["pathOrInlineDv"]
                prefix, z85uuid = enc[:-20], enc[-20:]
                u = _uuid.UUID(bytes=_z85_decode(z85uuid, 16))
                name = f"deletion_vector_{u}.bin"
                rel = f"{prefix}/{name}" if prefix else name
                p = _os.path.join(table, rel)
            else:
                p = desc["pathOrInlineDv"]
            with open(p, "rb") as f:
                raw = f.read()
            off = desc.get("offset") or 1
            size, = _struct.unpack_from(">i", raw, off)
            data = raw[off + 4: off + 4 + size]
            crc, = _struct.unpack_from(">I", raw, off + 4 + size)
            if (_zlib.crc32(data) & 0xFFFFFFFF) != crc:
                raise ValueError(
                    f"deletion vector checksum mismatch in {p}"
                )
        else:
            raise ValueError(
                f"unknown deletionVector storageType {st!r}"
            )
        return _dv_deserialize(data).tolist()

    def _effective_stream_timestamps(table):
        """(version, effective timestamp) pairs over the SURVIVING
        commits, delta_log._effective_timestamps' monotonization rule
        inlined for the runner process: a publish-time
        ``effectiveTimestamp`` stamp wins (truncation-immune), else a
        supplied timestamp advances the clock, else previous + 1."""
        log = _os.path.join(table, "_delta_log")
        versions = sorted(
            int(f[:20])
            for f in _os.listdir(log)
            if f.endswith(".json") and f[:20].isdigit()
        )
        eff = None
        for v in versions:
            stored = sup = None
            for a in _read_commit(table, v):
                if "commitInfo" in a:
                    ci = a["commitInfo"]
                    raw = int(ci.get("timestamp", 0) or 0)
                    sup = raw if raw > 0 else None
                    e = ci.get("effectiveTimestamp")
                    stored = int(e) if e is not None else None
            if stored is not None:
                eff = stored
            elif eff is None:
                eff = sup if sup is not None else 0
            elif sup is not None and sup > eff:
                eff = sup
            else:
                eff += 1
            yield v, eff

    def _first_version_at_or_after(table, ts):
        """``startingTimestamp`` resolution (delta-spark's stream rule:
        all changes committed AT OR AFTER the timestamp stream). Refuses
        loudly when the timestamp is after the latest commit, and — this
        engine's retention contract, stricter than delta-spark's
        silent earliest-available fallback — when log cleanup truncated
        commits the timestamp would have selected."""
        first = None
        for v, eff in _effective_stream_timestamps(table):
            if first is None:
                first = (v, eff)
                if v > 0 and ts < eff:
                    raise ValueError(
                        f"startingTimestamp {ts} predates the earliest "
                        f"retained commit of {table} (version {v}, "
                        f"effective timestamp {eff}) — earlier history "
                        "was truncated by log cleanup (retention "
                        "passed); start at or after the retained head"
                    )
            if eff >= ts:
                return v
        raise ValueError(
            f"startingTimestamp {ts} is after the latest effective "
            f"commit timestamp of {table} — nothing to stream"
        )

    def _replay_live(table, version):
        """Live file state (path → add action) and effective metaData
        at ``version``, replaying from the newest ON-DISK checkpoint ≤
        version (the r11 pointer-is-a-hint rule, delta_log._replay's
        contract inlined for the runner process). Raises
        FileNotFoundError with the documented truncation text when log
        cleanup removed a needed commit and no checkpoint covers it."""
        import pyarrow.parquet as _pq

        for _attempt in range(8):
            cps = [c for c in _checkpoints_on_disk(table) if c <= version]
            live, meta = {}, None
            start = 0
            if cps:
                cp = cps[-1]
                cpf = _os.path.join(
                    table, "_delta_log", f"{cp:020d}.checkpoint.parquet"
                )
                try:
                    rows = _pq.read_table(
                        cpf, columns=["add", "metaData"]
                    ).to_pylist()
                except FileNotFoundError:
                    continue  # racing cleanup: re-list, retry
                for row in rows:
                    m = row.get("metaData")
                    if m and m.get("schemaString"):
                        meta = dict(m)
                        cfg = meta.get("configuration")
                        if isinstance(cfg, list):
                            meta["configuration"] = dict(cfg)
                    a = row.get("add")
                    if a and a.get("path"):
                        add = dict(a)
                        pv = add.get("partitionValues")
                        if isinstance(pv, list):
                            add["partitionValues"] = dict(pv)
                        live[add["path"]] = add
                start = cp + 1
            for v in range(start, version + 1):
                try:
                    actions = _read_commit(table, v)
                except FileNotFoundError:
                    raise FileNotFoundError(
                        f"cannot replay version {version} of {table}: "
                        f"commit {v} has been truncated by log cleanup "
                        "and no on-disk checkpoint at or below the "
                        "version covers it"
                    ) from None
                for act in actions:
                    if "metaData" in act:
                        meta = act["metaData"]
                    if "remove" in act:
                        live.pop(act["remove"]["path"], None)
                for act in actions:
                    if "add" in act:
                        live[act["add"]["path"]] = act["add"]
            return live, meta
        raise FileNotFoundError(
            f"cannot replay version {version} of {table}: checkpoints "
            "kept moving under concurrent maintenance"
        )

    class DeltaCommitFilePartition(_InputPartition):
        def __init__(
            self,
            path,
            rename=None,
            tag=None,
            version=None,
            include=None,
            exclude=None,
        ):
            self.path = path
            self.rename = rename or {}
            # CDF mode only: ``tag`` stamps a constant _change_type on
            # files that don't carry one (add files are inserts); cdc
            # files ship their own column and pass tag=None. ``version``
            # stamps _commit_version. Both None in plain-append mode.
            self.tag = tag
            self.version = version
            # whole-file CDF reconstruction: emit only these in-file
            # row indexes (``include``, the DV-diff resurrection /
            # kill sets) or everything EXCEPT these (``exclude``, a
            # file's deletion vector). At most one is set.
            self.include = include
            self.exclude = exclude

    class DeltaLogStreamReader(_StreamReader):
        # Restart safety (round-6 ADVICE): a reader restarted from a
        # checkpoint at offset N is reconstructed with a fresh cursor, and
        # the Python streaming API's no-argument latestOffset() gives it
        # no way to learn N before the first trigger — so the first
        # latestOffset() after a fully-committed restart can REGRESS below
        # N, and once Spark records that regressed end offset the next
        # batch's (start, end] range would replay versions already
        # emitted. ``_floor`` tracks the highest version seen in ANY
        # engine-supplied offset (partitions start/end, commit end): the
        # cursor clamps to it, and partitions() never reads at or below
        # it when the engine-supplied start has regressed past it. Replays
        # of a genuinely-uncommitted batch still work — there the
        # engine-supplied start IS the floor, so the range is untouched.
        def __init__(self, options):
            self.table = options["path"]
            self.per_batch = int(options.get("maxversionsperbatch", 1))
            self.skip_change = (
                str(options.get("skipchangecommits", "false")).lower()
                == "true"
            )
            # readChangeFeed=true streams the change data feed instead
            # of the append flow: cdc-file commits fan out one partition
            # per cdc file (rows already tagged), pure appends emit
            # their add files tagged 'insert', and a rewriting commit
            # WITHOUT cdc files (written before enable_delta_cdf) fails
            # loudly — delta-spark's readChangeFeed stream contract.
            self.read_change_feed = (
                str(options.get("readchangefeed", "false")).lower()
                == "true"
            )
            ts = options.get("startingtimestamp")
            if ts is not None and "startingversion" in options:
                raise ValueError(
                    "startingVersion and startingTimestamp are "
                    "mutually exclusive (delta-spark's stream contract)"
                )
            if ts is not None:
                self.start_version = _first_version_at_or_after(
                    self.table, int(ts)
                )
            else:
                self.start_version = int(options.get("startingversion", 0))
            self._cursor = self.start_version - 1
            self._floor = self.start_version - 1
            # NOTE on restarts: a reader rebuilt from a fully-committed
            # checkpoint hears no engine offset before its first
            # latestOffset() (the no-arg Python API cannot pass the
            # committed offset), so its first cursor-paced answers can
            # land AT or BELOW the checkpoint. That is safe under the
            # real engine contract — MicroBatchExecution keeps polling
            # and every poll advances the window by per_batch, so the
            # stream catches up after ⌈committed/per_batch⌉ empty polls
            # — but any drain loop that treats ONE no-progress poll as
            # caught-up will stall (the round-11 random-op model's sim
            # did; its drain now re-polls until the answer stabilizes,
            # like the engine).
            # memoized (version, live, meta) snapshot cursor for the
            # CDF whole-file reconstruction: partitions() walks
            # versions in ascending order, so the previous snapshot
            # advances by one commit instead of replaying per version
            self._snap = None

        def initialOffset(self):
            return {"version": self.start_version - 1}

        def latestOffset(self):
            latest = _latest_version(self.table)
            self._cursor = max(self._cursor, self._floor)
            self._cursor = max(
                self._cursor, min(self._cursor + self.per_batch, latest)
            )
            return {"version": self._cursor}

        def commit(self, end):
            self._floor = max(self._floor, end["version"])
            self._cursor = max(self._cursor, self._floor)

        def _snapshot(self, version):
            """Live state + metaData at ``version`` via the memo
            cursor (ascending walks advance commit-by-commit)."""
            if self._snap is not None and self._snap[0] <= version:
                v0, live, meta = self._snap
                live = dict(live)
                for v in range(v0 + 1, version + 1):
                    actions = _read_commit(table=self.table, version=v)
                    for act in actions:
                        if "metaData" in act:
                            meta = act["metaData"]
                        if "remove" in act:
                            live.pop(act["remove"]["path"], None)
                    for act in actions:
                        if "add" in act:
                            live[act["add"]["path"]] = act["add"]
            else:
                live, meta = _replay_live(self.table, version)
            self._snap = (version, live, meta)
            return live, meta

        def _reconstruct_changes(self, v, actions, rename):
            """CDF partitions for a rewriting commit WITHOUT cdc files.

            With change-data-feed enabled, the only commits that rewrite
            data without persisting cdc files are whole-file operations
            (overwrite, RESTORE — UPDATE/DELETE/MERGE stage cdc at
            commit time), and those are EXACTLY reconstructable at the
            file level, the same add/remove derivation delta-spark's
            CDCReader runs: a file added is its live rows as inserts, a
            file removed is its previously-live rows as deletes, and a
            file whose deletion vector changed emits the DV set
            difference both ways (resurrected rows insert, newly-dead
            rows delete). Per-file row sets ride in the partition —
            the reconstruction stays one task per changed file, no
            snapshot-wide diff. Commits from BEFORE the property flip
            still refuse (delta-spark's stream contract; the batch
            reader's snapshot-diff fallback is the audit path for
            those)."""
            try:
                prev_live, prev_meta = self._snapshot(v - 1)
            except FileNotFoundError as exc:
                raise RuntimeError(
                    f"commit {v} of {self.table} rewrites data and its "
                    "base snapshot has been truncated by log cleanup "
                    "(retention passed the stream's position); restart "
                    "the stream with a startingVersion at or above the "
                    f"current checkpoint [{exc}]"
                ) from None
            cfg = (prev_meta or {}).get("configuration") or {}
            own_meta = None
            for a in actions:
                if "metaData" in a:
                    own_meta = a["metaData"]
            if own_meta is not None:
                cfg = own_meta.get("configuration") or {}
            if str(cfg.get("delta.enableChangeDataFeed", "false")
                   ).lower() != "true":
                raise RuntimeError(
                    f"commit {v} of {self.table} rewrites data "
                    "but carries no cdc files (written before "
                    "delta.enableChangeDataFeed was set); the "
                    "CDF stream cannot reconstruct it — start "
                    "at or after the property flip"
                )
            op = None
            for a in actions:
                if "commitInfo" in a:
                    op = a["commitInfo"].get("operation")
            ins_tag, del_tag = (
                ("update_postimage", "update_preimage")
                if op == "UPDATE"
                else ("insert", "delete")
            )
            cur_live = dict(prev_live)
            for a in actions:
                if "remove" in a:
                    cur_live.pop(a["remove"]["path"], None)
            for a in actions:
                if "add" in a:
                    cur_live[a["add"]["path"]] = a["add"]
            parts = []
            for path in sorted(set(prev_live) | set(cur_live)):
                before, after = prev_live.get(path), cur_live.get(path)
                if before == after:
                    continue
                full = _os.path.join(self.table, path)
                if before is None:
                    parts.append(
                        DeltaCommitFilePartition(
                            full, rename, tag=ins_tag, version=v,
                            exclude=_dv_rows(
                                self.table, after.get("deletionVector")
                            ),
                        )
                    )
                elif after is None:
                    parts.append(
                        DeltaCommitFilePartition(
                            full, rename, tag=del_tag, version=v,
                            exclude=_dv_rows(
                                self.table, before.get("deletionVector")
                            ),
                        )
                    )
                else:
                    dvb = set(
                        _dv_rows(
                            self.table, before.get("deletionVector")
                        ) or []
                    )
                    dva = set(
                        _dv_rows(
                            self.table, after.get("deletionVector")
                        ) or []
                    )
                    resurrected = sorted(dvb - dva)
                    killed = sorted(dva - dvb)
                    if resurrected:
                        parts.append(
                            DeltaCommitFilePartition(
                                full, rename, tag=ins_tag, version=v,
                                include=resurrected,
                            )
                        )
                    if killed:
                        parts.append(
                            DeltaCommitFilePartition(
                                full, rename, tag=del_tag, version=v,
                                include=killed,
                            )
                        )
            # advance the memo past this commit so the next version's
            # base is one incremental step away
            self._snap = (v, cur_live, own_meta or prev_meta)
            return parts

        def partitions(self, start, end):
            lo = max(start["version"], self._floor)
            self._floor = max(self._floor, start["version"], end["version"])
            self._cursor = max(self._cursor, self._floor)
            rename = _physical_to_logical(self.table)
            parts = []
            for v in range(lo + 1, end["version"] + 1):
                try:
                    actions = _read_commit(self.table, v)
                except FileNotFoundError:
                    # round-10 live-race contract: a version inside this
                    # batch's range that log cleanup truncated must stop
                    # the stream with the documented refusal — silently
                    # skipping it would drop its rows from the stream
                    # forever (the offset range still advances past it)
                    raise RuntimeError(
                        f"commit {v} of {self.table} has been truncated "
                        "by log cleanup (retention passed the stream's "
                        "position); restart the stream with a "
                        "startingVersion at or above the current "
                        "checkpoint"
                    ) from None
                adds = [
                    a["add"]
                    for a in actions
                    if "add" in a and a["add"].get("dataChange", True)
                ]
                op = None
                for a in actions:
                    if "commitInfo" in a:
                        op = a["commitInfo"].get("operation")
                # a RESTORE can change data WITHOUT removing a file
                # (re-adding a live path with different deletion-vector
                # state resurrects rows) — treating its adds as fresh
                # appends would re-emit rows already streamed, so it is
                # a change commit whenever it touches data at all. A
                # METADATA-ONLY restore (reverting schema/properties of
                # a data-identical snapshot: no adds, no removes) is
                # invisible to the stream, like any metaData commit.
                has_change = any(
                    "remove" in a and a["remove"].get("dataChange", True)
                    for a in actions
                ) or (op == "RESTORE" and bool(adds))
                if self.read_change_feed:
                    cdcs = [a["cdc"] for a in actions if "cdc" in a]
                    if cdcs:
                        # the spec's reader rule: cdc files serve the
                        # commit's changes EXCLUSIVELY
                        for c in cdcs:
                            parts.append(
                                DeltaCommitFilePartition(
                                    _os.path.join(self.table, c["path"]),
                                    rename,
                                    tag=None,
                                    version=v,
                                )
                            )
                        continue
                    if has_change:
                        parts.extend(
                            self._reconstruct_changes(v, actions, rename)
                        )
                        continue
                    for add in adds:
                        parts.append(
                            DeltaCommitFilePartition(
                                _os.path.join(self.table, add["path"]),
                                rename,
                                tag="insert",
                                version=v,
                            )
                        )
                    continue
                if has_change:
                    if not self.skip_change:
                        raise RuntimeError(
                            f"commit {v} of {self.table} rewrites data "
                            "(overwrite/DELETE/UPDATE/RESTORE); set "
                            "skipChangeCommits=true to stream past it"
                        )
                    continue  # skipped whole, as delta-spark does
                for add in adds:
                    parts.append(
                        DeltaCommitFilePartition(
                            _os.path.join(self.table, add["path"]),
                            rename,
                        )
                    )
            return parts

        def read(self, partition):
            import pyarrow as pa
            import pyarrow.parquet as pq

            row0 = 0
            for batch in pq.ParquetFile(partition.path).iter_batches():
                if (
                    partition.include is not None
                    or partition.exclude is not None
                ):
                    import numpy as np

                    # deletion-vector coordinates are in-file row
                    # indexes; track them across arrow batches
                    pos = np.arange(
                        row0, row0 + batch.num_rows, dtype="int64"
                    )
                    row0 += batch.num_rows
                    if partition.include is not None:
                        mask = np.isin(pos, partition.include)
                    else:
                        mask = ~np.isin(pos, partition.exclude)
                    if not mask.any():
                        continue
                    batch = batch.filter(pa.array(mask))
                else:
                    row0 += batch.num_rows
                if partition.rename:
                    batch = batch.rename_columns(
                        [
                            partition.rename.get(c, c)
                            for c in batch.schema.names
                        ]
                    )
                if partition.version is not None:
                    n = batch.num_rows
                    if partition.tag is not None:
                        batch = batch.append_column(
                            "_change_type",
                            pa.array([partition.tag] * n, pa.string()),
                        )
                    batch = batch.append_column(
                        "_commit_version",
                        pa.array([partition.version] * n, pa.int64()),
                    )
                yield batch

        def stop(self):
            pass

    class DeltaLogStreamDataSource(_DataSource):
        @classmethod
        def name(cls):
            return "deg04_delta_stream"

        def schema(self):
            from pyspark.sql.types import StructType

            table = self.options["path"]
            meta = _checkpoint_meta(table)  # cleanup-truncated logs
            for v in range(_latest_version(table) + 1):
                try:
                    for a in _read_commit(table, v):
                        if "metaData" in a:
                            meta = a["metaData"]
                except FileNotFoundError:
                    continue  # checkpoint-truncated prefix
            if meta is None:
                raise ValueError(f"no metaData action in log for {table}")
            st = StructType.fromJson(_json.loads(meta["schemaString"]))
            if (
                str(self.options.get("readchangefeed", "false")).lower()
                == "true"
            ):
                from pyspark.sql.types import LongType, StringType

                st = st.add("_change_type", StringType()).add(
                    "_commit_version", LongType()
                )
            return st

        def streamReader(self, schema):
            return DeltaLogStreamReader(self.options)

    return DeltaLogStreamDataSource


# --------------------------------------------- Iceberg log as a stream
#
# ``spark.readStream.format("deg04_iceberg_stream")`` over a jar-less
# Iceberg table (sources/iceberg_tables.py): the incremental-append
# streaming read the Iceberg Spark runtime exposes. Offsets ARE snapshot
# SEQUENCE NUMBERS; each trigger advances by ``maxSnapshotsPerBatch``
# (default 1 — one snapshot per microbatch) and ``partitions`` resolves
# the new snapshots' ADDED data files from their manifest lists (the
# manifests whose added_snapshot_id matches), one InputPartition per
# file, read executor-side as Arrow batches. Replaying (seq_lo, seq_hi]
# always yields the same files — checkpointed restarts are exactly-once.
#
# Non-append snapshots (overwrite / delete / compaction) fail the stream
# unless ``skipNonAppendSnapshots=true`` skips them whole — re-emitting
# rewritten rows is never acceptable for a streaming reader.
#
# Like the Delta twin above, the classes are factory-built so cloudpickle
# serializes them BY VALUE into the python_streaming_source_runner
# process; the Avro manifest codec it needs is registered for by-value
# pickling too (``register_pickle_by_value`` on ``sources.avro_io`` —
# stdlib-only module, safe to embed), because that runner cannot import
# ``sc.addPyFile`` modules.


def make_iceberg_stream_source():
    """Build the ``deg04_iceberg_stream`` DataSource class (see module
    comment for why this is a factory). Register with
    ``spark.dataSource.register(make_iceberg_stream_source())``."""
    import json as _json
    import os as _os

    from pyspark import cloudpickle as _cloudpickle
    from pyspark.sql.datasource import (
        DataSource as _DataSource,
        DataSourceStreamReader as _StreamReader,
        InputPartition as _InputPartition,
    )

    from deg04_local_data_lake_spark.sources import avro_io as _avro_io

    _cloudpickle.register_pickle_by_value(_avro_io)
    read_container = _avro_io.read_container

    def _load_meta(table):
        with open(
            _os.path.join(table, "metadata", "version-hint.text")
        ) as f:
            v = int(f.read().strip())
        with open(
            _os.path.join(table, "metadata", f"v{v}.metadata.json")
        ) as f:
            return _json.load(f)

    def _first_seq_at_or_after(table, ts):
        """``streamFromTimestamp`` resolution (Iceberg's
        ``stream-from-timestamp`` contract: snapshots whose commit
        instant is AT OR AFTER the timestamp stream) over the
        snapshot-log's MONOTONIZED effective instants — the same
        publish-time ``effective-timestamp-ms``-wins rule the batch
        ``TIMESTAMP AS OF`` resolver uses, so resolution survives
        expiry. An instant with nothing at or after it yet starts PAST
        the head (only future snapshots stream — Iceberg's semantics,
        unlike the Delta stream's loud refusal); an instant whose
        selected snapshots were already expired refuses loudly (this
        engine's retention contract, the Delta twin)."""
        meta = _load_meta(table)
        sid_seq = {
            s["snapshot-id"]: s["sequence-number"]
            for s in meta.get("snapshots", [])
        }
        by_id = {
            s["snapshot-id"]: s for s in meta.get("snapshots", [])
        }
        eff = None
        first = True
        for entry in meta.get("snapshot-log") or []:
            stored = entry.get("effective-timestamp-ms")
            raw = int(entry.get("timestamp-ms", 0) or 0)
            if stored is not None:
                eff = int(stored)
            elif eff is None:
                eff = raw
            elif raw > eff:
                eff = raw
            else:
                eff += 1
            sid = entry["snapshot-id"]
            if first:
                first = False
                snap = by_id.get(sid)
                if (
                    ts < eff
                    and snap is not None
                    and snap.get("parent-snapshot-id") is not None
                ):
                    raise ValueError(
                        f"streamFromTimestamp {ts} predates the "
                        f"earliest retained snapshot of {table} "
                        f"(effective timestamp-ms {eff}) — earlier "
                        "history was removed by snapshot expiry "
                        "(retention passed); start at or after the "
                        "retained head"
                    )
            if eff >= ts and sid in sid_seq:
                return sid_seq[sid]
        return meta.get("last-sequence-number", 0) + 1

    class IcebergSnapshotFilePartition(_InputPartition):
        def __init__(self, path):
            self.path = path

    class IcebergLogStreamReader(_StreamReader):
        # Same restart-safety scheme as DeltaLogStreamReader (round-6
        # ADVICE): ``_floor`` tracks the highest sequence number seen in
        # any engine-supplied offset so a checkpoint-restarted reader's
        # fresh cursor can never regress committed progress into
        # duplicate replays.
        def __init__(self, options):
            self.table = options["path"]
            self.per_batch = int(options.get("maxsnapshotsperbatch", 1))
            self.skip_non_append = (
                str(options.get("skipnonappendsnapshots", "false")).lower()
                == "true"
            )
            # an expired snapshot inside an uncommitted offset range is
            # DATA LOSS for the stream (its added rows would never be
            # emitted) — loud by default; opt in to the skip only for
            # catch-up reads that accept a partial history (round-9
            # expiry-vs-reader race finding)
            self.allow_expired_gaps = (
                str(options.get("allowexpiredgaps", "false")).lower()
                == "true"
            )
            ts = options.get("streamfromtimestamp")
            self.start_seq = (
                0
                if ts is None
                else _first_seq_at_or_after(self.table, int(ts)) - 1
            )
            self._cursor = self.start_seq
            self._floor = self.start_seq
            # restart pacing contract: see DeltaLogStreamReader.__init__
            # — paced answers may sit at/below a restarted checkpoint for
            # a few polls; the engine's re-polling catches up, and drain
            # loops must poll until the answer stabilizes

        def initialOffset(self):
            return {"seq": self.start_seq}

        def latestOffset(self):
            latest = _load_meta(self.table)["last-sequence-number"]
            self._cursor = max(self._cursor, self._floor)
            self._cursor = max(
                self._cursor, min(self._cursor + self.per_batch, latest)
            )
            return {"seq": self._cursor}

        def commit(self, end):
            self._floor = max(self._floor, end["seq"])
            self._cursor = max(self._cursor, self._floor)

        def partitions(self, start, end):
            lo = max(start["seq"], self._floor)
            self._floor = max(self._floor, start["seq"], end["seq"])
            self._cursor = max(self._cursor, self._floor)
            meta = _load_meta(self.table)
            snaps = {s["sequence-number"]: s for s in meta["snapshots"]}
            parts = []
            for seq in range(lo + 1, end["seq"] + 1):
                s = snaps.get(seq)
                if s is None:
                    if self.allow_expired_gaps:
                        continue  # caller accepts a partial history
                    raise RuntimeError(
                        f"snapshot seq {seq} of {self.table} expired "
                        "before this stream read it — its rows would be "
                        "silently lost; restart the stream from current "
                        "state or set allowExpiredGaps=true to accept a "
                        "partial history"
                    )
                if s["summary"]["operation"] != "append":
                    if not self.skip_non_append:
                        raise RuntimeError(
                            f"snapshot seq {seq} of {self.table} is "
                            f"'{s['summary']['operation']}', not append; "
                            "set skipNonAppendSnapshots=true to stream "
                            "past it"
                        )
                    continue  # skipped whole
                try:
                    _s, manifests = read_container(s["manifest-list"])
                except FileNotFoundError as exc:
                    raise RuntimeError(
                        f"snapshot seq {seq} of {self.table} was expired "
                        f"concurrently (metadata file gone: {exc}); "
                        "restart the stream from current table state"
                    ) from None
                for m in manifests:
                    if m["added_snapshot_id"] != s["snapshot-id"]:
                        continue  # carried forward from older snapshots
                    if m["content"] != 0:
                        continue  # delete manifest
                    try:
                        _es, entries = read_container(m["manifest_path"])
                    except FileNotFoundError as exc:
                        raise RuntimeError(
                            f"snapshot seq {seq} of {self.table} was "
                            f"expired concurrently (manifest gone: {exc});"
                            " restart the stream from current table state"
                        ) from None
                    for e in entries:
                        if (
                            e["status"] == 1
                            and e["data_file"]["content"] == 0
                        ):
                            parts.append(
                                IcebergSnapshotFilePartition(
                                    e["data_file"]["file_path"]
                                )
                            )
            return parts

        def read(self, partition):
            import pyarrow.parquet as pq

            yield from pq.ParquetFile(partition.path).iter_batches()

        def stop(self):
            pass

    class IcebergLogStreamDataSource(_DataSource):
        @classmethod
        def name(cls):
            return "deg04_iceberg_stream"

        def schema(self):
            # DDL string, NOT a parsed StructType: this runs in the
            # planner process, which has no SparkContext to parse with
            meta = _load_meta(self.options["path"])
            sch = [
                s
                for s in meta["schemas"]
                if s["schema-id"] == meta.get("current-schema-id", 0)
            ][0]
            m = {
                "long": "BIGINT",
                "int": "INT",
                "double": "DOUBLE",
                "float": "FLOAT",
                "string": "STRING",
                "boolean": "BOOLEAN",
                "date": "DATE",
                "timestamptz": "TIMESTAMP",
                "timestamp": "TIMESTAMP_NTZ",
                "binary": "BINARY",
            }
            return ", ".join(
                f"`{f['name']}` "
                + (
                    f["type"].upper()
                    if f["type"].startswith("decimal")
                    else m[f["type"]]
                )
                for f in sch["fields"]
            )

        def streamReader(self, schema):
            return IcebergLogStreamReader(self.options)

    return IcebergLogStreamDataSource
