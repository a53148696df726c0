"""Python DataSource (Spark 4 ``pyspark.sql.datasource``) over the
transactional store, BOTH directions of the read API:

- ``spark.read.format("txstore").option("path", root).load()`` — one
  snapshot scan with ``versionAsOf`` / ``timestampAsOf`` time travel
  (Delta's option names), deletion vectors applied, column mapping
  presented logically, shallow-clone refs resolved, every row tagged
  ``_commit_version`` = the resolved snapshot version. The fast path
  for snapshot reads remains ``tx_read_events`` (a native parquet
  scan); this reader is the format-API surface over the same state.
- ``spark.readStream.format("txstore")...`` tails APPENDS
  exactly-once (below), and with ``readChangeFeed=true`` streams the
  CHANGE DATA FEED (appends as ``insert``, DV deletes as ``delete``).
- Pure SQL composes for free: ``CREATE TEMPORARY VIEW t USING txstore
  OPTIONS (path '...')`` routes through the batch reader, so
  ``spark.sql`` queries the DV-applied logical snapshot directly.

Both directions materialize files through ONE shared per-file
transform (_read_partition) that yields whole Arrow RecordBatches —
the scan stays columnar end-to-end (DV mask, physical→logical
projection, constant columns and timestamp localization are Arrow
compute), with a row-loop fallback that any unsafe cast degrades to.

Offsets ARE manifest versions — the one thing the store already
guarantees to be atomic, totally ordered and immutable — so the
source needs no side ledger: Spark checkpoints ``{"version": N}``,
``latestOffset`` is the head manifest, and a micro-batch's partitions
are exactly the data files that ENTERED the snapshot in
``(start, end]``. Replaying any offset range re-reads identical
manifests and identical immutable files, which is the whole
exactly-once argument (the same one ``tx_read_incremental`` makes for
its batch cursor — this module is that cursor surfaced through the
engine's native streaming API, so watermarks, stateful operators and
every sink compose on top).

Operation handling mirrors tx_read_incremental: ``append`` versions
contribute their new files; ``compact`` / ``zorder`` / ``bloom`` are
provably row-preserving (the manifest's operation field) and
contribute nothing; ANY other operation (upsert / overwrite / delete /
future ops) fails the stream unless ``ignoreChanges=true``, which
emits the version's entered files Delta-style (at-least-once rows,
consumer dedupes).

Scale: one input partition per entered file (the natural parallelism
of an append); partition planning is O(versions in the batch) driver-
side manifest reads through pyarrow's filesystem layer (local, file:,
hdfs://, s3:// — same resolution as the stats harvest). Partition
columns (event_date) are reconstructed from the file's directory, the
same contract as the batch reader's basePath scan.

Cites reference behavior: the reference's incremental tail
(lib/maillogsentinel/parser.py offset ledger) restarts from a byte
offset in ONE file; this source restarts from a version in a
transactional multi-file store — the Spark-native generalization.
"""

from __future__ import annotations

import datetime
import json

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

_MANIFEST_DIR = "_manifests"
_DATA_DIR = "data"
# row- AND shape-preserving commits the tail skips silently; a
# rename_column/drop_column (shape change) or delete/upsert/overwrite
# (row change) hits the raise-unless-ignoreChanges gate below
_ROW_PRESERVING = (
    "compact", "zorder", "bloom", "add_constraint", "drop_constraint"
)


def _fs_root(root: str):
    from .txstore import _resolve_pafs

    return _resolve_pafs(root)


def _list_versions(root: str) -> list[int]:
    fs, base = _fs_root(root)
    from pyarrow import fs as pafs

    try:
        infos = fs.get_file_info(
            pafs.FileSelector(f"{base}/{_MANIFEST_DIR}", allow_not_found=True)
        )
    except FileNotFoundError:
        return []
    out = []
    for info in infos:
        name = info.base_name
        if name.startswith("v") and name.endswith(".json"):
            try:
                out.append(int(name[1:-5]))
            except ValueError:
                continue
    return sorted(out)


def _list_ckpts(root: str) -> list[int]:
    fs, base = _fs_root(root)
    from pyarrow import fs as pafs

    try:
        infos = fs.get_file_info(
            pafs.FileSelector(f"{base}/{_MANIFEST_DIR}", allow_not_found=True)
        )
    except FileNotFoundError:
        return []
    out = []
    for info in infos:
        name = info.base_name
        if name.startswith("v") and name.endswith(".ckpt.parquet"):
            try:
                out.append(int(name[1:11]))
            except ValueError:
                continue
    return sorted(out)


def _read_json(root: str, version: int) -> dict:
    fs, base = _fs_root(root)
    path = f"{base}/{_MANIFEST_DIR}/v{version:010d}.json"
    with fs.open_input_file(path) as f:
        return json.loads(f.read().decode("utf-8"))


def _load_manifest(root: str, version: int) -> dict:
    """Full state at ``version`` — same checkpoint + delta-chain
    reconstruction as the batch reader (the logic is SHARED from
    txstore so the two can never drift), through pyarrow's filesystem
    layer instead of the JVM's."""
    from .txstore import _read_ckpt, _reconstruct

    return _reconstruct(
        version,
        lambda w: _read_json(root, w),
        set(_list_ckpts(root)),
        lambda w: _read_ckpt(root, w),
    )


class _ArrowFallback(Exception):
    """Raised when the columnar transform cannot guarantee the exact
    Spark-facing types — the caller degrades to the row loop."""


def _arrow_batches(
    table, schema, log2phys, deleted, day, version,
    change_type="insert", emit_deleted=False,
):
    """The whole per-file transform as Arrow compute: DV row-position
    mask, physical→logical projection, synthesized event_date /
    _commit_version constants, NTZ→UTC timestamp localization, and a
    cast to the exact Arrow type Spark expects for each field. Raises
    _ArrowFallback before yielding anything if a cast is unsafe."""
    import numpy as np
    import pyarrow as pa

    from pyspark.sql.pandas.types import to_arrow_type

    mask = np.ones(table.num_rows, dtype=bool)
    if deleted:
        mask[np.fromiter(deleted, dtype=np.int64)] = False
    if emit_deleted:
        mask = ~mask  # CDF delete partition: the masked rows ARE the payload
    if deleted or emit_deleted:
        table = table.filter(pa.array(mask))
    n = table.num_rows
    arrays, fields = [], []
    try:
        for f in schema.fields:
            want = to_arrow_type(f.dataType)
            name = f.name
            if name == "_commit_version":
                arr = pa.array([version] * n, type=want)
            elif name == "_change_type":
                arr = pa.array([change_type] * n, type=want)
            elif name == "event_date":
                arr = pa.array([day] * n, type=want)
            else:
                phys = log2phys.get(name, name)
                if phys in table.column_names:
                    arr = table.column(phys)
                    if (
                        pa.types.is_timestamp(arr.type)
                        and arr.type.tz is None
                        and pa.types.is_timestamp(want)
                    ):
                        # NTZ physical under the session's UTC pin:
                        # identity wall-clock→epoch, same contract as
                        # the row loop
                        arr = arr.cast(
                            pa.timestamp(arr.type.unit, "UTC")
                        )
                    arr = arr.cast(want, safe=True)
                else:
                    arr = pa.nulls(n, type=want)
            arrays.append(
                arr.combine_chunks() if isinstance(arr, pa.ChunkedArray)
                else arr
            )
            fields.append(pa.field(name, want, nullable=True))
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError,
            pa.ArrowTypeError, TypeError, ValueError) as exc:
        raise _ArrowFallback(str(exc))
    yield from pa.Table.from_arrays(
        arrays, schema=pa.schema(fields)
    ).to_batches()


def _read_partition(root: str, schema, log2phys: dict, partition):
    """Materialize one data file's rows under the given (logical)
    schema — shared by the batch and stream readers so the two can
    never drift: DV positions anti-filtered, event_date reconstructed
    from the dir name, timestamps localized to UTC, logical names
    resolved to frozen physical columns, _commit_version from the
    partition tag."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from pyspark.sql.types import TimestampType

    fs, base = _fs_root(root)
    data_dir = partition.base or f"{base}/{_DATA_DIR}"
    with fs.open_input_file(f"{data_dir}/{partition.rel}") as f:
        table = pq.read_table(f)
    deleted: set = set()
    for dv_rel, dv_dir in zip(partition.dv_rels, partition.dv_bases):
        ds = pads.dataset(
            f"{dv_dir or f'{base}/_deletes'}/{dv_rel}",
            format="parquet",
            filesystem=fs,
        )
        dv_tab = ds.to_table(
            filter=pads.field("rel") == partition.rel, columns=["pos"]
        )
        deleted.update(dv_tab.column("pos").to_pylist())
    day = None
    dirname = partition.rel.split("/")[0]
    if dirname.startswith("event_date="):
        day = datetime.date.fromisoformat(dirname.split("=", 1)[1])
    # ARROW FAST PATH: hand Spark whole RecordBatches (the Python
    # DataSource API accepts them) — the scan stays columnar end to
    # end instead of materializing python tuples row by row, the
    # difference between a metadata loop and a real data path at
    # file sizes that matter. Any type-mapping surprise degrades to
    # the row loop below, never to a wrong result.
    try:
        yield from _arrow_batches(
            table, schema, log2phys, deleted, day, partition.version,
            partition.change_type, partition.emit_deleted,
        )
        return
    except _ArrowFallback:
        pass
    cols = {c: table.column(c).to_pylist() for c in table.column_names}
    n = table.num_rows
    names = [f.name for f in schema.fields]
    # Spark's TIMESTAMP (LTZ) converter requires tz-AWARE datetimes;
    # a parquet file whose timestamps read back naive (NTZ physical
    # type under the session's UTC pin) is localized to UTC — the
    # identity wall-clock→epoch map, same contract as
    # plans.queries._norm_events_ts
    ts_fields = {
        f.name
        for f in schema.fields
        if isinstance(f.dataType, TimestampType)
    }
    for i in range(n):
        if (i in deleted) != partition.emit_deleted:
            continue
        row = []
        for name in names:
            if name == "_commit_version":
                row.append(partition.version)
            elif name == "_change_type":
                row.append(partition.change_type)
            elif name == "event_date":
                row.append(day)
            elif log2phys.get(name, name) in cols:
                val = cols[log2phys.get(name, name)][i]
                if (
                    name in ts_fields
                    and val is not None
                    and val.tzinfo is None
                ):
                    val = val.replace(tzinfo=datetime.timezone.utc)
                row.append(val)
            else:
                row.append(None)  # pre-evolution file: new col null
        yield tuple(row)


class TxStoreDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "txstore"

    def _root(self) -> str:
        root = self.options.get("path")
        if not root:
            raise ValueError("txstore source requires a path option")
        return root

    def _resolved_version(self) -> int:
        """The snapshot version this read targets: ``versionAsOf``
        wins, then ``timestampAsOf`` (epoch millis or ISO local
        datetime — latest commit at-or-before it, tx_version_at's
        contract via the committed_at_ms scalar every delta doc
        carries), else head."""
        versions = _list_versions(self._root())
        if not versions:
            raise FileNotFoundError(
                f"no committed manifest under {self._root()}"
            )
        v_opt = self.options.get("versionasof")
        if v_opt is not None:
            v = int(v_opt)
            if v not in versions:
                raise ValueError(
                    f"versionAsOf {v} not in retained versions {versions}"
                )
            return v
        ts_opt = self.options.get("timestampasof")
        if ts_opt is not None:
            try:
                ts_ms = int(ts_opt)
            except ValueError:
                ts_ms = int(
                    datetime.datetime.fromisoformat(ts_opt).timestamp()
                    * 1000
                )
            best = None
            for v in versions:
                doc = _read_json(self._root(), v)
                at = doc.get("committed_at_ms")
                if at is not None and at <= ts_ms:
                    best = v
            if best is None:
                raise ValueError(
                    f"timestampAsOf {ts_opt} precedes the store's history"
                )
            return best
        return versions[-1]

    def schema(self):
        from pyspark.sql.types import IntegerType, StructField, StructType

        from .txstore import _logical_struct

        m = _load_manifest(self._root(), self._resolved_version())
        st = _logical_struct(StructType.fromJson(json.loads(m["schema"])))
        extra = [StructField("_commit_version", IntegerType())]
        if self._cdf_opt():
            from pyspark.sql.types import StringType

            extra.insert(0, StructField("_change_type", StringType()))
        return StructType(st.fields + extra)

    def _cdf_opt(self) -> bool:
        return (
            str(self.options.get("readchangefeed", "false")).lower()
            == "true"
        )

    def reader(self, schema) -> "TxStoreBatchReader":
        """BATCH read — ``spark.read.format("txstore").option("path",
        root).load()``: one snapshot scan, with ``versionAsOf`` /
        ``timestampAsOf`` time travel through the same options Delta
        uses. One input partition per live data file; DV positions
        anti-filtered; shallow-clone external refs resolved; every row
        tagged with the resolved snapshot version in
        ``_commit_version``."""
        from pyspark.sql.types import StructType

        from .txstore import _cm_visible

        v = self._resolved_version()
        m = _load_manifest(self._root(), v)
        st = StructType.fromJson(json.loads(m["schema"]))
        log2phys = {lg: ph for lg, ph in _cm_visible(st) if lg != ph}
        return TxStoreBatchReader(self._root(), schema, v, m, log2phys)

    def streamReader(self, schema) -> "TxStoreStreamReader":
        from pyspark.sql.types import StructType

        from .txstore import _cm_visible

        versions = _list_versions(self._root())
        log2phys = {}
        if versions:
            m = _load_manifest(self._root(), versions[-1])
            st = StructType.fromJson(json.loads(m["schema"]))
            log2phys = {
                lg: ph for lg, ph in _cm_visible(st) if lg != ph
            }
        # physical names are FROZEN (column mapping), so the map taken
        # at stream start stays valid for every later append; a rename
        # or drop mid-stream hits the op gate in partitions() anyway
        return TxStoreStreamReader(
            self._root(),
            schema,
            str(self.options.get("ignorechanges", "false")).lower() == "true",
            log2phys,
            cdf=self._cdf_opt(),
        )


class _FilePartition(InputPartition):
    def __init__(
        self,
        rel: str,
        version: int,
        dv_rels: tuple = (),
        base: str | None = None,
        dv_bases: tuple = (),
        change_type: str = "insert",
        emit_deleted: bool = False,
    ):
        self.rel = rel
        self.version = version
        # deletion-vector sidecars applying to this file (seed-snapshot
        # partitions only: an append's new files cannot carry a DV at
        # their own commit) — read() anti-filters their row positions
        self.dv_rels = tuple(dv_rels)
        # shallow-clone external bases: absolute data dir for this rel
        # (None = the store's own data dir) and per-sidecar dirs
        # aligned with dv_rels (None entries = the store's _deletes)
        self.base = base
        self.dv_bases = tuple(dv_bases) or (None,) * len(self.dv_rels)
        # change-data-feed reads: the _change_type this partition's
        # rows carry, and whether to emit ONLY the sidecar-matched
        # positions (a CDF 'delete' partition inverts the DV mask —
        # the deleted rows ARE the payload)
        self.change_type = change_type
        self.emit_deleted = emit_deleted


class TxStoreBatchReader(DataSourceReader):
    """One-snapshot batch scan: partitions are the resolved version's
    live files with their DV sidecars and shallow-clone bases — the
    same per-file shape (and the same _read_partition materializer) as
    the stream reader's seed snapshot."""

    def __init__(
        self,
        root: str,
        schema,
        version: int,
        manifest: dict,
        log2phys: dict[str, str],
    ):
        self._root = root
        self._schema = schema
        self._version = version
        self._manifest = manifest
        self._log2phys = log2phys

    def partitions(self):
        m = self._manifest
        dv = m.get("dv", {})
        ext = m.get("ext", {})
        ext_dv = m.get("ext_dv", {})
        rels = sorted(r for fl in m["files"].values() for r in fl)
        return [
            _FilePartition(
                rel,
                self._version,
                dv.get(rel, ()),
                ext.get(rel),
                tuple(ext_dv.get(d) for d in dv.get(rel, ())),
            )
            for rel in rels
        ]

    def read(self, partition: _FilePartition):
        return _read_partition(
            self._root, self._schema, self._log2phys, partition
        )


class TxStoreStreamReader(DataSourceStreamReader):
    def __init__(
        self,
        root: str,
        schema,
        ignore_changes: bool,
        log2phys: dict[str, str] | None = None,
        cdf: bool = False,
    ):
        self._root = root
        self._schema = schema
        self._ignore_changes = ignore_changes
        self._log2phys = log2phys or {}
        # readChangeFeed=true: emit _change_type-tagged rows — appends
        # as 'insert', DV deletes as 'delete' (the sidecar-masked rows
        # read back as the payload); rewrites raise, the batch
        # tx_changes feed being the precise alternative for those
        self._cdf = cdf

    def initialOffset(self) -> dict:
        # version 0 = before the first commit: a fresh query replays
        # the store from its very first snapshot
        return {"version": 0}

    def latestOffset(self) -> dict:
        versions = _list_versions(self._root)
        return {"version": versions[-1] if versions else 0}

    def partitions(self, start: dict, end: dict):
        lo, hi = int(start["version"]), int(end["version"])
        parts: list[_FilePartition] = []
        if hi <= lo:
            return parts
        from .txstore import _apply_delta

        if lo == 0:
            # fresh query: seed from the EARLIEST RETAINED manifest's
            # full snapshot, whatever operation committed it — on a
            # vacuumed store (keep_versions manifests survive) there is
            # no v1 to walk from, and the first retained file map IS
            # the stream's starting state (Delta's starting-snapshot
            # semantics)
            versions = _list_versions(self._root)
            seed_v = versions[0]
            state = _load_manifest(self._root, seed_v)
            seed_dv = state.get("dv", {})
            seed_ext = state.get("ext", {})
            seed_ext_dv = state.get("ext_dv", {})
            prev_files = {
                r for rels in state["files"].values() for r in rels
            }
            parts.extend(
                _FilePartition(
                    rel,
                    seed_v,
                    seed_dv.get(rel, ()),
                    seed_ext.get(rel),
                    tuple(
                        seed_ext_dv.get(d) for d in seed_dv.get(rel, ())
                    ),
                )  # CDF mode: the seed snapshot is all 'insert's
                for rel in sorted(prev_files)
            )
            first = seed_v + 1
        else:
            try:
                state = _load_manifest(self._root, lo)
            except FileNotFoundError:
                raise FileNotFoundError(
                    f"txstore stream: checkpointed offset version {lo} "
                    "has been vacuumed — the cursor fell behind the "
                    "retention window (same failure mode as log "
                    "retention expiry); restart with a fresh checkpoint"
                )
            prev_files = {
                r for rels in state["files"].values() for r in rels
            }
            first = lo + 1
        prev_dv = {
            r: tuple(es) for r, es in state.get("dv", {}).items()
        }
        for v in range(first, hi + 1):
            # roll the delta chain forward from the seed state — one
            # JSON read per version, no per-version reconstruction
            doc = _read_json(self._root, v)
            state = (
                _apply_delta(state, doc)
                if doc.get("kind") == "delta"
                else doc
            )
            m = state
            op = m.get("operation", "?")
            files_v = {r for rels in m["files"].values() for r in rels}
            entered = files_v - prev_files
            prev_files = files_v
            cur_dv = {
                r: tuple(es) for r, es in m.get("dv", {}).items()
            }
            if self._cdf and op == "delete":
                # CHANGE FEED: a DV delete's payload is exactly the
                # rows the NEW sidecars mask — one partition per
                # touched file, reading ONLY those positions
                ext = m.get("ext", {})
                ext_dv = m.get("ext_dv", {})
                for rel in sorted(cur_dv):
                    new_sc = tuple(
                        d for d in cur_dv[rel]
                        if d not in prev_dv.get(rel, ())
                    )
                    if not new_sc:
                        continue
                    parts.append(
                        _FilePartition(
                            rel, v, new_sc, ext.get(rel),
                            tuple(ext_dv.get(d) for d in new_sc),
                            change_type="delete", emit_deleted=True,
                        )
                    )
                prev_dv = cur_dv
                continue
            prev_dv = cur_dv
            if op in _ROW_PRESERVING:
                continue
            if op != "append" and (self._cdf or not self._ignore_changes):
                alt = (
                    "the batch tx_changes feed derives precise "
                    "update pre/post images"
                    if self._cdf
                    else "tx_changes gives the precise feed, or set "
                    "ignoreChanges=true for Delta-style at-least-once "
                    "rows"
                )
                raise ValueError(
                    f"txstore stream: version {v} is a row-changing "
                    f"{op!r}; "
                    + ("the change feed stops here — " if self._cdf
                       else "append-only tailing stops here — ")
                    + alt
                )
            parts.extend(
                _FilePartition(rel, v) for rel in sorted(entered)
            )
        return parts

    def read(self, partition: _FilePartition):
        return _read_partition(
            self._root, self._schema, self._log2phys, partition
        )

    def commit(self, end: dict) -> None:
        pass  # offsets are durable manifests; nothing to acknowledge


def register(spark) -> None:
    spark.dataSource.register(TxStoreDataSource)
