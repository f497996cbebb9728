"""Minimal ACID table format: an optimistic-concurrency manifest log over
plain parquet — the public Delta Lake / Apache Iceberg design (ordered
JSON commit log, copy-on-write file rewrites, snapshot isolation, time
travel), reduced to what a Spark engine actually needs:

- A table is a directory. Data lives in parquet part files under
  ``data/``; the source of truth is the ordered commit log under
  ``_log/`` (``%020d.json``). A data file is VISIBLE iff some committed
  manifest added it and no later one removed it — readers never list the
  data directory, so partially-written (crashed) files are invisible by
  construction.
- Commit = write manifest to a temp name, fsync, then ``os.link`` it to
  its version-numbered name. link(2) fails with EEXIST if the version is
  taken, which IS the optimistic-concurrency check: two writers racing
  the same version cannot both win, and a reader sees either the old
  snapshot or the new one, never a blend (single-filesystem stand-in for
  Delta's transaction-log put-if-absent / Iceberg's atomic swap).
- MERGE and DELETE are copy-on-write: only data files that actually
  contain affected keys are rewritten (found via the ``_metadata``
  file-path column + a broadcast semi-join — one scan, no shuffle of the
  base), everything else is carried by reference. OPTIMIZE rewrites the
  active file set into fewer files, byte-identical content.
- Time travel: replaying the log up to version v reconstructs the exact
  snapshot-v file set; as-of reads are just ``spark.read.parquet`` over
  that list.

Scale notes: the log is O(commits) tiny JSON; snapshot reconstruction
seeds from the newest checkpoint (`checkpoint()` — the Delta checkpoint
mechanic) and replays only the manifests behind it, so the fold is
O(tail), not O(commits). COW touches only affected files, so a selective
MERGE on a 100 TB table rewrites the few GB that changed; sub-percent
deletes can instead land as positional deletion vectors
(`delete_where_dv` / `read_with_dv` / `purge_dv` — merge-on-read). All
heavy work (scans, joins, rewrites) is ordinary distributed Spark over
parquet.
"""

from __future__ import annotations

import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class CommitConflictError(RuntimeError):
    """Another writer committed this version first (optimistic loss)."""


def parse_hive_dir_value(raw: str, dt, part_col: str):
    """Parse one hive partition-directory value (the '<v>' of
    '<col>=<v>') to the COLUMN's Python stat type. EVERY walker that
    records directory values into manifest stats must go through this
    (overwrite_partitions AND initial partitioned loads) — Spark
    hive-escapes reserved path chars as %XX ('ts=2020-01-01
    00%3A00%3A00'), and a raw '%' in a string value is itself written as
    %25, so unquoting is lossless and mandatory: storing or comparing
    the escaped form against the ISO strings _json_safe_stat records
    would never match, silently keeping a replaced file and duplicating
    the overwritten partition's rows. Mixed str/int stats would likewise
    break later typed pruning and straddle checks, so numerics parse to
    their column type."""
    import datetime
    import urllib.parse

    from pyspark.sql import types as T

    if raw == "__HIVE_DEFAULT_PARTITION__":
        raise ValueError(
            f"batch has NULL {part_col} values (Spark wrote a "
            "__HIVE_DEFAULT_PARTITION__ directory): [v, v] partition "
            "stats cannot model a null partition — filter the nulls or "
            "map them to a sentinel value first (the aborted batch files "
            "were never committed and stay invisible to readers)"
        )
    v = urllib.parse.unquote(raw)
    if isinstance(dt, T.BooleanType):
        return v.lower() == "true"
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return int(v)
    if isinstance(dt, (T.FloatType, T.DoubleType)):
        return float(v)
    # date/timestamp: round-trip through datetime and re-serialize
    # exactly as _json_safe_stat does, so the membership compare is
    # rendering-insensitive (Spark may trim trailing fractional zeros
    # in dir names; isoformat pads microseconds to 6 digits).
    if isinstance(dt, T.DateType):
        return datetime.date.fromisoformat(v).isoformat()
    if isinstance(dt, (T.TimestampType, T.TimestampNTZType)):
        # Spark trims trailing fractional zeros in dir names ('...00.1');
        # fromisoformat only accepts arbitrary-length fractions on
        # Python >= 3.11 — pad to exactly 6 digits so the parse (and the
        # overwrite membership compare downstream) is version-independent.
        if "." in v:
            head, frac = v.rsplit(".", 1)
            if len(frac) > 6:
                # Spark renders partition timestamps at microsecond
                # precision today; a 7+-digit fraction means a future
                # source wrote nanosecond dir names — truncating would
                # silently alias distinct partitions, so refuse.
                raise ValueError(
                    f"sub-microsecond timestamp partition value {v!r} "
                    "(> 6 fractional digits) — overwrite membership "
                    "compare would lose precision"
                )
            v = f"{head}.{frac.ljust(6, '0')}"
        return datetime.datetime.fromisoformat(v).isoformat(sep=" ")
    return v  # string: compares as-is


def _fsync_dir(path: str) -> None:
    """fsync a DIRECTORY so a just-linked/renamed entry survives power
    loss — the half of the POSIX put-if-absent recipe os.link alone
    misses (a crashed dir entry would gap the log and make the fold
    silently skip a committed version)."""
    fd = os.open(path, os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


class AcidTable:
    def __init__(self, root: str):
        self.root = root
        self.log_dir = os.path.join(root, "_log")
        self.data_dir = os.path.join(root, "data")
        # Highest version THIS instance's commit() actually published
        # (os.link succeeded). Lets error-path cleanup decide "is the
        # manifest at v mine?" from direct evidence instead of inferring
        # ownership from manifest-exists + exception type — the
        # inference misattributes one race (racer publishes v, then WE
        # fail with a non-conflict error before linking).
        self.last_published_version: int | None = None

    def _ref(self, abspath: str) -> str:
        """Canonical manifest reference for a resolved path: root-relative
        for files this table owns, ABSOLUTE for foreign files (shallow
        clones reference the source's data in place — zero copy). Must be
        the inverse of the os.path.join(root, ref) readers apply (join
        with an absolute second arg returns it unchanged)."""
        ap = os.path.abspath(abspath)
        root = os.path.abspath(self.root)
        if ap == root or ap.startswith(root + os.sep):
            return os.path.relpath(ap, root)
        return ap

    # ------------------------------------------------------------------ log

    def _manifest_path(self, version: int) -> str:
        return os.path.join(self.log_dir, f"{version:020d}.json")

    def versions(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f.split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.endswith(".json") and not f.startswith("_")
        )

    def latest_version(self) -> int:
        vs = self.versions()
        if not vs:
            raise FileNotFoundError(f"no commits at {self.root}")
        return vs[-1]

    def history(self) -> list[dict]:
        return [
            json.load(open(self._manifest_path(v))) for v in self.versions()
        ]

    def _checkpoint_path(self, version: int) -> str:
        # leading "_" keeps checkpoints out of versions()' manifest listing
        return os.path.join(self.log_dir, f"_checkpoint-{version:020d}.json")

    def checkpoints(self) -> list[int]:
        if not os.path.isdir(self.log_dir):
            return []
        return sorted(
            int(f[len("_checkpoint-"):].split(".")[0])
            for f in os.listdir(self.log_dir)
            if f.startswith("_checkpoint-") and f.endswith(".json")
        )

    def _fold_state(
        self, version: int
    ) -> tuple[list[str], dict[str, dict], list[str]]:
        """(active relpaths, per-file stats, live DV relpaths) at
        `version` — seeded from the newest checkpoint <= version (so the
        fold opens O(tail) manifests, not O(commits); the Delta
        checkpoint idea), then replaying only the later manifests."""
        active: list[str] = []
        stats: dict[str, dict] = {}
        dvs: list[str] = []
        start = 0
        ckpts = [c for c in self.checkpoints() if c <= version]
        if ckpts:
            cp = json.load(open(self._checkpoint_path(ckpts[-1])))
            active = list(cp["active"])
            stats = dict(cp["stats"])
            dvs = list(cp["dv"])
            start = ckpts[-1] + 1
        for v in self.versions():
            if v < start:
                continue
            if v > version:
                break
            m = json.load(open(self._manifest_path(v)))
            removed = set(m.get("remove", []))
            active = [f for f in active if f not in removed]
            for f in removed:
                stats.pop(f, None)
            active.extend(m.get("add", []))
            stats.update(m.get("stats", {}))
            cleared = set(m.get("dv_remove", []))
            dvs = [f for f in dvs if f not in cleared]
            dvs.extend(m.get("dv", []))
        return active, stats, dvs

    def checkpoint(self, version: int | None = None) -> int:
        """Materialize the folded snapshot state as a checkpoint file, so
        later reads replay only manifests AFTER it. Written atomically
        (temp + rename); the manifest log itself is never touched, so a
        checkpoint can always be discarded or rebuilt."""
        head = self.latest_version()
        if version is None:
            version = head
        if version > head:
            raise ValueError(
                f"cannot checkpoint v{version}: head is v{head} — a "
                "future-stamped checkpoint would make later folds skip "
                "real manifests"
            )
        active, stats, dvs = self._fold_state(version)
        payload = {
            "version": version,
            "active": active,
            "stats": stats,
            "dv": dvs,
        }
        fd, tmp = tempfile.mkstemp(prefix="_tmp_ckpt_", dir=self.log_dir)
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(payload, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._checkpoint_path(version))
            _fsync_dir(self.log_dir)
        except BaseException:
            if os.path.exists(tmp):
                os.unlink(tmp)
            raise
        return version

    def _horizon_path(self) -> str:
        # leading "_" keeps it out of versions()' manifest listing
        return os.path.join(self.log_dir, "_vacuum_horizon.json")

    def vacuum_horizon(self) -> int | None:
        """Oldest version whose snapshot is still guaranteed physically
        complete (None if never vacuumed). Persisted by vacuum() so
        readers in OTHER processes refuse pre-horizon time travel too."""
        try:
            with open(self._horizon_path()) as f:
                return json.load(f)["horizon"]
        except FileNotFoundError:
            return None

    def _check_horizon(self, version: int) -> None:
        h = self.vacuum_horizon()
        if h is not None and version < h:
            raise ValueError(
                f"time travel to v{version} predates the vacuum horizon "
                f"v{h}: files unreferenced at/after the horizon were "
                "physically deleted, so the snapshot cannot be "
                "guaranteed complete — refusing rather than returning "
                "partial data"
            )

    def active_files(self, version: int | None = None) -> list[str]:
        """Replay the log up to `version` (latest if None): the snapshot's
        file set is adds minus later removes, in commit order — seeded
        from the newest checkpoint at or before `version`. Raises if
        `version` predates the vacuum horizon (see _check_horizon)."""
        if version is None:
            version = self.latest_version()
        self._check_horizon(version)
        active, _stats, _dvs = self._fold_state(version)
        return [os.path.join(self.root, f) for f in active]

    def commit(
        self,
        version: int,
        op: str,
        add: list[str],
        remove: list[str],
        stats: dict[str, dict] | None = None,
        dv: list[str] | None = None,
        dv_remove: list[str] | None = None,
    ) -> None:
        """Atomic put-if-absent publish of manifest `version`.

        The manifest is fully written + fsynced under a temp name first;
        os.link then either claims the version atomically or raises —
        a crash before the link leaves NO visible change (readers only
        trust linked manifests), a racing writer gets
        CommitConflictError and must rebase. `stats` optionally carries
        per-file column min/max (relpath -> {col: [lo, hi]}) — the
        Iceberg-manifest idea that lets readers prune files from the log
        alone, without opening a single parquet footer."""
        os.makedirs(self.log_dir, exist_ok=True)
        payload = {
            "version": version,
            "op": op,
            "add": add,
            "remove": remove,
            "stats": stats or {},
            "dv": dv or [],
            "dv_remove": dv_remove or [],
        }
        fd, tmp = tempfile.mkstemp(prefix="_tmp_commit_", dir=self.log_dir)
        try:
            with os.fdopen(fd, "w") as f:
                json.dump(payload, f)
                f.flush()
                os.fsync(f.fileno())
            try:
                os.link(tmp, self._manifest_path(version))
            except FileExistsError as exc:
                raise CommitConflictError(
                    f"version {version} already committed"
                ) from exc
            # Published the instant the link lands — even if _fsync_dir
            # or the tmp unlink below raises, readers already trust the
            # manifest, so callers' cleanup must treat it as ours.
            self.last_published_version = version
            _fsync_dir(self.log_dir)
        finally:
            os.unlink(tmp)

    # ----------------------------------------------------------------- data

    def _write_files(self, df: DataFrame, tag: str) -> list[str]:
        """Write df as parquet under data/<tag>-<token>/ and return the
        part-file paths relative to the table root (what manifests
        reference). The random token makes the DIRECTORY per-writer
        unique: two writers racing the same next-version must lose at
        the manifest put-if-absent (CommitConflictError -> rebase), not
        die early on a colliding data path (mode('error')) — the loser's
        orphaned directory is invisible to readers and reclaimed by
        vacuum."""
        import uuid

        out = os.path.join(self.data_dir, f"{tag}-{uuid.uuid4().hex[:8]}")
        df.write.mode("error").parquet(out)
        rel = os.path.relpath(out, self.root)
        return sorted(
            os.path.join(rel, f)
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )

    def _collect_stats(
        self, spark: SparkSession, rel_files: list[str], cols: list[str]
    ) -> dict[str, dict]:
        """Per-file min/max for `cols` over freshly written files — ONE
        distributed pass grouped by the _metadata file path (at scale the
        writer tasks would emit these with the files; a post-pass keeps
        the demo simple without changing the manifest contract)."""
        if not rel_files or not cols:
            return {}
        by_base = {os.path.basename(f): f for f in rel_files}
        df = spark.read.parquet(
            *[os.path.join(self.root, f) for f in rel_files]
        )
        aggs = []
        for c in cols:
            aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
        rows = (
            df.groupBy(F.col("_metadata.file_path").alias("_fp"))
            .agg(*aggs)
            .collect()
        )
        out: dict[str, dict] = {}
        for r in rows:
            rel = by_base[os.path.basename(r["_fp"])]
            out[rel] = {
                c: [
                    self._json_safe_stat(c, r[f"min_{c}"]),
                    self._json_safe_stat(c, r[f"max_{c}"]),
                ]
                for c in cols
            }
        return out

    @staticmethod
    def _json_safe_stat(col: str, v):
        """Normalize a collected min/max value so the manifest's
        json.dumps cannot raise at commit time. date/datetime become ISO
        strings (lossless AND order-preserving lexicographically, so
        stats pruning against string bounds stays correct); JSON-native
        types pass through; anything else (Decimal, binary, ...) is
        refused with a clear error at stats-collection time instead of a
        TypeError deep inside commit()."""
        import datetime
        import decimal

        if v is None or isinstance(v, (bool, int, float, str)):
            return v
        if isinstance(v, (datetime.date, datetime.datetime)):
            return v.isoformat(sep=" ") if isinstance(v, datetime.datetime) \
                else v.isoformat()
        if isinstance(v, decimal.Decimal):
            raise ValueError(
                f"stats_cols column {col!r} is DECIMAL-typed: its min/max "
                "cannot be stored losslessly as JSON numbers nor compared "
                "correctly as strings — cast the column (e.g. to DOUBLE or "
                "a scaled BIGINT) before using it for stats pruning"
            )
        raise ValueError(
            f"stats_cols column {col!r} has unsupported stat type "
            f"{type(v).__name__}: only numeric, string, boolean, date and "
            "timestamp columns can back manifest stats pruning"
        )

    def append(
        self,
        spark: SparkSession,
        df: DataFrame,
        stats_cols: list[str] | None = None,
    ) -> int:
        """Append-only commit: new files land, nothing is removed. The
        batch's schema may be a SUPERSET of the table's (schema
        evolution by addition — old files simply lack the new columns
        and read as NULL under mergeSchema, the Delta/Iceberg
        add-column semantics)."""
        version = self.latest_version()
        next_v = version + 1
        add = self._write_files(df, f"commit-{next_v:05d}-append")
        stats = self._collect_stats(spark, add, stats_cols or [])
        self.commit(next_v, "append", add=add, remove=[], stats=stats)
        return next_v

    def file_stats(self, version: int | None = None) -> dict[str, dict]:
        """relpath -> {col: [min, max]} for the snapshot's active files,
        folded from the manifests that added them."""
        if version is None:
            version = self.latest_version()
        self._check_horizon(version)
        active, stats, _dvs = self._fold_state(version)
        return {f: stats.get(f, {}) for f in active}

    def read(
        self,
        spark: SparkSession,
        version: int | None = None,
        merge_schema: bool = False,
    ) -> DataFrame:
        files = self.active_files(version)
        if not files:
            raise ValueError(
                f"empty snapshot at {self.root} (all rows deleted): the "
                "manifest log stores no schema, so an empty table cannot "
                "be materialized as a DataFrame"
            )
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*files)

    def read_pruned(
        self,
        spark: SparkSession,
        col: str,
        lo,
        hi,
        version: int | None = None,
    ) -> tuple[DataFrame, int, int]:
        """Single-predicate convenience over read_pruned_multi."""
        return self.read_pruned_multi(spark, {col: (lo, hi)}, version)

    def read_pruned_multi(
        self,
        spark: SparkSession,
        preds: dict[str, tuple],
        version: int | None = None,
    ) -> tuple[DataFrame, int, int]:
        """Manifest-stats data skipping: read ONLY files whose recorded
        [min, max] overlaps EVERY predicate's [lo, hi] — file elimination
        happens on the driver against the log's stats, before any parquet
        footer is opened (on a 100 TB table with clustered files this is
        the difference between listing a handful of files and scanning
        the world). A file missing stats for a predicate column is kept
        for that predicate (pruning must be lossless). With a Z-ordered
        layout, several predicates prune multiplicatively — each file is
        narrow on every interleaved dimension at once. Returns
        (df, n_files_scanned, n_files_total)."""
        all_stats = self.file_stats(version)
        # Bounds go through the same normalization as stored stats, so a
        # date/datetime predicate compares ISO-string-to-ISO-string (order
        # -preserving) instead of raising str-vs-datetime TypeErrors.
        preds = {
            col: (
                self._json_safe_stat(col, lo),
                self._json_safe_stat(col, hi),
            )
            for col, (lo, hi) in preds.items()
        }
        keep = []
        for f, st in all_stats.items():
            ok = True
            for col, (lo, hi) in preds.items():
                s = st.get(col)
                # [None, None] stats (all-NULL column in that file) prune
                # like MISSING stats: the file is kept — lossless
                if (
                    s is not None
                    and s[0] is not None
                    and s[1] is not None
                    and (s[0] > hi or s[1] < lo)
                ):
                    ok = False
                    break
            if ok:
                keep.append(os.path.join(self.root, f))
        if not keep:
            # everything pruned: empty result with the snapshot's schema
            # (one footer read; zero data rows materialize). Use the MOST
            # RECENTLY ADDED active file (file_stats preserves manifest
            # add order): under schema evolution by addition the newest
            # file carries the superset schema, whereas an arbitrary old
            # file could lack newer columns and give the empty frame a
            # different schema than a non-empty read of the same snapshot.
            newest = next(reversed(all_stats), None)
            if newest is None:
                raise ValueError(f"empty snapshot at {self.root}")
            df = spark.read.parquet(
                os.path.join(self.root, newest)
            ).filter(F.lit(False))
            return df, 0, len(all_stats)
        df = spark.read.parquet(*keep)
        return df, len(keep), len(all_stats)

    def vacuum(
        self, retain_from_version: int, grace_seconds: float = 0.0
    ) -> list[str]:
        """Physically delete data files not referenced by ANY snapshot at
        or after `retain_from_version` (the retention policy Delta's
        VACUUM applies by age — by version here for determinism). Time
        travel earlier than the horizon stops working, by design — and
        FAILS LOUD: the horizon is persisted to the log dir before any
        delete, and active_files/file_stats (every read path) raise
        ValueError on a pre-horizon version instead of assembling a
        snapshot that may reference deleted parquet. The commit log
        itself is never rewritten.

        The referenced set is ONE fold at the horizon plus the adds of
        every later manifest — a file added after the horizon was
        referenced by the snapshot that added it even if later removed,
        so the per-version refold the naive form does is redundant
        (O(versions x tail) JSON reads collapse to O(tail)).

        `grace_seconds` skips files younger than the window — the Delta
        -style protection for a concurrent writer that has landed data
        files but not yet published its manifest (its files reference
        nothing until the commit wins). The default 0 keeps single
        -writer replays deterministic; ANY concurrent deployment should
        pass a grace comfortably above its write latency."""
        import time as _time

        latest = self.latest_version()
        horizon = min(retain_from_version, latest)
        # Persist the horizon BEFORE any unlink (atomic tmp+rename, never
        # lowered): if the delete pass crashes midway, readers in every
        # process already refuse pre-horizon time travel instead of
        # assembling a partially-deleted snapshot. The safe failure mode
        # of the early write is over-refusal, never partial data.
        prev = self.vacuum_horizon()
        if prev is None or horizon > prev:
            fd, tmp = tempfile.mkstemp(prefix="_tmp_horizon_", dir=self.log_dir)
            with os.fdopen(fd, "w") as f:
                json.dump({"horizon": horizon}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self._horizon_path())
            _fsync_dir(self.log_dir)
        active, _stats, dvs = self._fold_state(horizon)
        referenced: set[str] = set(active) | set(dvs)
        for v in self.versions():
            if v <= horizon or v > latest:
                continue
            m = json.load(open(self._manifest_path(v)))
            referenced.update(m.get("add", []))
            referenced.update(m.get("dv", []))
        now = _time.time()
        deleted = []
        for dirpath, _dirs, files in os.walk(self.data_dir):
            for f in files:
                if not f.endswith(".parquet"):
                    continue
                full = os.path.join(dirpath, f)
                rel = os.path.relpath(full, self.root)
                if rel in referenced:
                    continue
                if grace_seconds > 0 and (
                    now - os.path.getmtime(full) < grace_seconds
                ):
                    continue
                os.unlink(full)
                deleted.append(rel)
        return deleted

    # ------------------------------------------------------------ operations

    @classmethod
    def create(
        cls,
        spark: SparkSession,
        df: DataFrame,
        root: str,
        stats_cols: list[str] | None = None,
    ) -> "AcidTable":
        t = cls(root)
        files = t._write_files(df, "commit-00000")
        stats = t._collect_stats(spark, files, stats_cols or [])
        t.commit(0, "create", add=files, remove=[], stats=stats)
        return t

    def merge(
        self,
        spark: SparkSession,
        changes: DataFrame,
        key: str,
        as_of_version: int | None = None,
        tag: str = "",
        stats_cols: list[str] | None = None,
    ) -> int:
        """Copy-on-write MERGE: keys present in the base are updated in
        place (only their containing files rewritten), unmatched change
        keys are appended. One base scan finds affected files via the
        _metadata file path; untouched files carry over by reference.

        `as_of_version` pins the snapshot the rewrite is computed FROM
        (default: current head). A stale writer — one whose target commit
        version is already taken because another writer won the race —
        gets CommitConflictError and must call merge_with_rebase (commit
        blind-retrying would publish a rewrite of files the winner may
        have already removed: lost update)."""
        version = (
            self.latest_version() if as_of_version is None else as_of_version
        )
        # Copy-on-write and merge-on-read must not mix blindly: a rewrite
        # computed from read() would copy DV-deleted rows into fresh files
        # (resurrection) and strand the vectors. Re-materialize first.
        if self.dv_files(version):
            if (
                as_of_version is not None
                and as_of_version != self.latest_version()
            ):
                raise ValueError(
                    "merge against a STALE DV-bearing snapshot: purge_dv "
                    "first (a stale rewrite cannot safely carry live "
                    "deletion vectors); rebasing onto the DV-bearing HEAD "
                    "purges automatically"
                )
            self.purge_dv(spark)
            version = self.latest_version()
        files = self.active_files(version)
        tagged = spark.read.parquet(*files).select(
            "*", F.col("_metadata.file_path").alias("_fp")
        )
        hit = (
            tagged.join(F.broadcast(changes.select(key)), key, "left_semi")
            .select("_fp")
            .distinct()
            .collect()
        )
        affected = {os.path.basename(r["_fp"]) for r in hit}
        rel_affected = [
            f
            for f in (self._ref(p) for p in files)
            if os.path.basename(f) in affected
        ]
        add: list[str] = []
        next_v = version + 1
        # Every change key present in the base necessarily lives in an
        # affected file (that is how `affected` was found), so the
        # matched-key set of the AFFECTED rows equals changes-keys-in
        # -base — the update/insert split never needs the full base's
        # distinct keys (a 100 TB-table scan + unbounded broadcast).
        if rel_affected:
            aff_rows = spark.read.parquet(
                *[os.path.join(self.root, f) for f in rel_affected]
            )
            aff_keys = aff_rows.select(key).distinct()
            kept = aff_rows.join(
                F.broadcast(changes.select(key)), key, "left_anti"
            )
            updates = changes.join(aff_keys, key, "left_semi")
            add += self._write_files(
                kept.unionByName(updates), f"commit-{next_v:05d}{tag}-rewrite"
            )
            inserts = changes.join(aff_keys, key, "left_anti")
        else:
            inserts = changes
        inserts = inserts.persist()
        try:
            if inserts.limit(1).count() > 0:
                add += self._write_files(
                    inserts, f"commit-{next_v:05d}{tag}-insert"
                )
        finally:
            inserts.unpersist()
        stats = self._collect_stats(spark, add, stats_cols or [])
        self.commit(next_v, "merge", add=add, remove=rel_affected, stats=stats)
        return next_v

    def merge_with_rebase(
        self,
        spark: SparkSession,
        changes: DataFrame,
        key: str,
        as_of_version: int,
        max_retries: int = 3,
    ) -> tuple[int, int]:
        """Optimistic-concurrency MERGE for a writer whose snapshot went
        stale: try to commit the rewrite computed at `as_of_version`; on
        CommitConflictError REBASE — recompute the whole merge against
        the new head (the Delta/Iceberg conflict rule reduced to its safe
        core: rather than proving the winner's file set is disjoint and
        grafting, recompute from current state, which is always correct
        for key-level MERGE because the change set itself is
        deterministic). Returns (committed_version, n_retries)."""
        retries = 0
        base_v = as_of_version
        while True:
            try:
                v = self.merge(
                    spark, changes, key,
                    as_of_version=base_v, tag=f"-try{retries}",
                )
                return v, retries
            except CommitConflictError:
                retries += 1
                if retries > max_retries:
                    raise
                base_v = self.latest_version()  # rebase onto the new head

    def delete_where(
        self, spark: SparkSession, cond, stats_cols: list[str] | None = None
    ) -> int:
        """Copy-on-write DELETE: rewrite only files containing matches.
        Live deletion vectors are purged first (see merge)."""
        if self.dv_files(self.latest_version()):
            self.purge_dv(spark)
        version = self.latest_version()
        files = self.active_files(version)
        tagged = spark.read.parquet(*files).select(
            "*", F.col("_metadata.file_path").alias("_fp")
        )
        hit = tagged.filter(cond).select("_fp").distinct().collect()
        affected = {os.path.basename(r["_fp"]) for r in hit}
        rel_affected = [
            f
            for f in (self._ref(p) for p in files)
            if os.path.basename(f) in affected
        ]
        add: list[str] = []
        next_v = version + 1
        if rel_affected:
            aff_rows = spark.read.parquet(
                *[os.path.join(self.root, f) for f in rel_affected]
            )
            # SQL DELETE removes only rows where cond is TRUE; a NULL
            # predicate row matches neither cond nor ~cond, so a plain
            # ~cond filter would silently drop it from the rewrite
            survivors = aff_rows.filter(~F.coalesce(cond, F.lit(False)))
            if survivors.limit(1).count() > 0:
                add = self._write_files(
                    survivors, f"commit-{next_v:05d}-delete"
                )
        stats = self._collect_stats(spark, add, stats_cols or [])
        self.commit(
            next_v, "delete", add=add, remove=rel_affected, stats=stats
        )
        return next_v

    def dv_files(self, version: int | None = None) -> list[str]:
        """Deletion-vector files live to snapshot `version`: every
        ``dv`` added by commits <= version, minus those a later purge
        cleared (``dv_remove``)."""
        if version is None:
            version = self.latest_version()
        self._check_horizon(version)
        _active, _stats, dvs = self._fold_state(version)
        return [os.path.join(self.root, f) for f in dvs]

    def delete_where_dv(self, spark: SparkSession, cond) -> int:
        """Merge-on-read DELETE via positional deletion vectors (the
        Delta DV / Iceberg positional-delete mechanic): instead of
        rewriting every file containing a match (copy-on-write's write
        amplification), write only the tiny (file_name, row_index) set
        of deleted positions and commit it alongside the untouched data
        files. A 100 TB table deleting 0.01% of rows writes megabytes,
        not the terabytes COW would rewrite; readers pay one broadcast
        anti-join until a purge re-materializes."""
        version = self.latest_version()
        next_v = version + 1
        matches = (
            self.read_with_dv(spark, version, _keep_meta=True)
            .filter(cond)
            .select(
                F.col("_fname").alias("file_name"),
                F.col("_ridx").alias("row_index"),
            )
        )
        out = os.path.join(self.data_dir, f"commit-{next_v:05d}-dv")
        matches.coalesce(1).write.mode("error").parquet(out)
        rel = os.path.join("data", f"commit-{next_v:05d}-dv")
        dv = sorted(
            os.path.join(rel, f)
            for f in os.listdir(out)
            if f.endswith(".parquet")
        )
        self.commit(next_v, "delete-dv", add=[], remove=[], dv=dv)
        return next_v

    def read_with_dv(
        self,
        spark: SparkSession,
        version: int | None = None,
        _keep_meta: bool = False,
    ) -> DataFrame:
        """Snapshot read that applies live deletion vectors: scan the
        active files with their (file_name, row_index) position, then
        broadcast-anti-join the DV set. The base NEVER shuffles — the DV
        side is broadcast-sized by the merge-on-read contract."""
        df = self.read(spark, version).select(
            "*",
            F.col("_metadata.file_name").alias("_fname"),
            F.col("_metadata.row_index").alias("_ridx"),
        )
        dvs = self.dv_files(version)
        if dvs:
            dv = spark.read.parquet(*dvs).select(
                F.col("file_name").alias("_fname"),
                F.col("row_index").alias("_ridx"),
            )
            df = df.join(F.broadcast(dv), ["_fname", "_ridx"], "left_anti")
        return df if _keep_meta else df.drop("_fname", "_ridx")

    def purge_dv(self, spark: SparkSession) -> int:
        """Re-materialize: rewrite the active set with deletion vectors
        applied and clear them in the same atomic commit — the OPTIMIZE
        step that turns merge-on-read debt back into clean scans."""
        version = self.latest_version()
        dvs = self.dv_files(version)
        rel_dvs = [self._ref(p) for p in dvs]
        survivors = self.read_with_dv(spark, version)
        rel_data = [self._ref(p) for p in self.active_files(version)]
        next_v = version + 1
        add = self._write_files(survivors, f"commit-{next_v:05d}-purge")
        self.commit(
            next_v, "purge", add=add, remove=rel_data, dv_remove=rel_dvs
        )
        return next_v

    def restore(self, version: int) -> int:
        """RESTORE TO VERSION v as a NEW commit (Delta RESTORE): the
        snapshot's file set is re-published at the head of the log, so
        the rollback is itself versioned, auditable, and reversible —
        nothing is deleted, history stays intact."""
        head = self.latest_version()
        want = {self._ref(p) for p in self.active_files(version)}
        have = {self._ref(p) for p in self.active_files(head)}
        dv_now = {self._ref(p) for p in self.dv_files(head)}
        # the target snapshot's visible row-set includes its DVs: restore
        # must re-publish those too, not just the data-file set
        dv_want = {self._ref(p) for p in self.dv_files(version)}
        next_v = head + 1
        # re-added files regain the stats they had at the target
        # snapshot (the fold popped them on removal) — without this,
        # stats-skipping silently degrades to full scans after a restore
        _a, want_stats, _d = self._fold_state(version)
        readd = sorted(want - have)
        self.commit(
            next_v,
            "restore",
            add=readd,
            remove=sorted(have - want),
            stats={f: want_stats[f] for f in readd if f in want_stats},
            dv=sorted(dv_want - dv_now),
            dv_remove=sorted(dv_now - dv_want),
        )
        return next_v

    def clone_shallow(self, dest_root: str) -> "AcidTable":
        """SHALLOW CLONE (the Delta mechanic): a NEW table whose create
        manifest references this table's current data files IN PLACE —
        absolute paths, zero bytes copied. The clone then evolves
        independently: its copy-on-write operations rewrite affected
        files into ITS OWN data dir and drop the foreign references,
        while untouched source files stay shared. Caveat carried over
        from Delta: VACUUM on the SOURCE does not know about clones, so
        retention there can break a clone's time travel — the clone's
        own vacuum never deletes foreign files (it only walks its own
        data dir). Live DVs also carry by reference."""
        head = self.latest_version()
        clone = AcidTable(dest_root)
        clone.commit(
            0,
            "clone-shallow",
            add=[os.path.abspath(p) for p in self.active_files(head)],
            remove=[],
            stats={},
            dv=[os.path.abspath(p) for p in self.dv_files(head)],
        )
        return clone

    def compact(
        self,
        spark: SparkSession,
        target_files: int = 1,
        stats_cols: list[str] | None = None,
    ) -> int:
        """OPTIMIZE: rewrite the active set into `target_files` files,
        content byte-identical (row-set equality is what the oracle
        checks), then swap atomically in one commit."""
        if self.dv_files(self.latest_version()):
            self.purge_dv(spark)  # see merge: COW must not strand live DVs
        version = self.latest_version()
        files = self.active_files(version)
        rel = [self._ref(p) for p in files]
        df = spark.read.parquet(*files).coalesce(target_files)
        next_v = version + 1
        add = self._write_files(df, f"commit-{next_v:05d}-compact")
        stats = self._collect_stats(spark, add, stats_cols or [])
        self.commit(next_v, "compact", add=add, remove=rel, stats=stats)
        return next_v


# ---------------------------------------------------------------------------
# Registered queries — the ACID layer under the driver's oracle check.
# ---------------------------------------------------------------------------

from ..io import table  # noqa: E402
from ..operators._helpers import lng, sql_lsum  # noqa: E402
from ..registry import register  # noqa: E402
from ..session import scratch_dir  # noqa: E402

_MERGE_ORACLE_CTES = """
base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey < 10000
),
changes AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice
  FROM orders WHERE o_orderkey % 7 = 0 AND o_orderkey < 12000
),
v1 AS (
  SELECT * FROM changes
  UNION ALL
  SELECT b.* FROM base b ANTI JOIN changes c USING (o_orderkey)
)
"""


def _base(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 10000)
        .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice")
    )


def _changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") < 12000)
    ).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
    )


@register(
    "table_merge_acid",
    category="acid_table",
    oracle=f"""
WITH {_MERGE_ORACLE_CTES}
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       (o_orderkey % 7 = 0 AND o_orderkey < 12000) AS was_upserted
FROM v1
""",
)
def table_merge_acid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO on the manifest-log table: create a multi-file base
    snapshot, apply a change batch via copy-on-write (only files holding
    changed keys are rewritten; new keys append), then read the table
    BACK from its committed manifest — the oracle is the relational MERGE
    semantics, so a bug anywhere in the log replay, COW file selection,
    rewrite, or atomic publish surfaces as a hash mismatch. This is
    etl_merge_upsert's anti-join+union expressed as an actual table
    mutation with snapshot isolation (same SQL oracle, deliberately:
    parity of the two paths is the point)."""
    t = AcidTable.create(
        spark, _base(spark, sf_dir).repartition(4), scratch_dir("acid_merge")
    )
    t.merge(spark, _changes(spark, sf_dir), "o_orderkey")
    return t.read(spark).withColumn(
        "was_upserted",
        (F.col("o_orderkey") % 7 == 0) & (F.col("o_orderkey") < 12000),
    )


@register(
    "table_time_travel",
    category="acid_table",
    oracle=f"""
WITH {_MERGE_ORACLE_CTES},
v2 AS (SELECT * FROM v1 WHERE o_orderkey % 3 <> 0)
SELECT 0 AS version, COUNT(*) AS n_rows,
       {sql_lsum('o_totalprice')} AS total_price FROM base
UNION ALL
SELECT 1, COUNT(*), {sql_lsum('o_totalprice')} FROM v1
UNION ALL
SELECT 2, COUNT(*), {sql_lsum('o_totalprice')} FROM v2
""",
)
def table_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time travel: three commits (create / MERGE / DELETE WHERE key%3=0),
    then one as-of read per version off the SAME table — each snapshot
    reconstructed purely by log replay. The oracle recomputes all three
    states relationally; a reader that leaked post-snapshot files (or a
    DELETE that rewrote too much) diverges on some version's row count or
    exact cent total."""
    t = AcidTable.create(
        spark, _base(spark, sf_dir).repartition(4), scratch_dir("acid_tt")
    )
    t.merge(spark, _changes(spark, sf_dir), "o_orderkey")
    t.delete_where(spark, F.col("o_orderkey") % 3 == 0)
    outs = []
    for v in (0, 1, 2):
        outs.append(
            t.read(spark, version=v).agg(
                F.lit(v).alias("version"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.sum(lng(F.col("o_totalprice"))).cast("double") / 1e6).alias(
                    "total_price"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out


@register(
    "table_compaction_acid",
    category="acid_table",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       {sql_lsum('o_totalprice')} AS total_price,
       1 AS n_files_after, TRUE AS files_reduced
FROM orders WHERE o_orderkey < 10000
""",
)
def table_compaction_acid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE (small-file compaction) as an atomic snapshot swap: a
    16-file base is rewritten into one file in a single commit; readers
    see either the fragmented or the compacted snapshot, never a mix.
    The oracle pins content preservation (row count + exact cent total
    unchanged) and the file-count contract (exactly 1 after, fewer than
    before). Content equality across the swap is the ACID guarantee
    OPTIMIZE must keep — data-changing compaction is corruption."""
    t = AcidTable.create(
        spark, _base(spark, sf_dir).repartition(16), scratch_dir("acid_opt")
    )
    n_before = len(t.active_files())
    t.compact(spark, target_files=1)
    n_after = len(t.active_files())
    return t.read(spark).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(lng(F.col("o_totalprice"))).cast("double") / 1e6).alias(
            "total_price"
        ),
        F.lit(n_after).alias("n_files_after"),
        F.lit(n_after < n_before).alias("files_reduced"),
    )


@register(
    "table_commit_atomicity",
    category="acid_table",
    oracle="""
SELECT COUNT(*) AS n_rows_v0, TRUE AS crash_invisible,
       TRUE AS conflict_detected, 1 AS latest_version
FROM orders WHERE o_orderkey < 10000
""",
)
def table_commit_atomicity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two failure modes an ACID log must survive, exercised for real:
    (1) CRASH ATOMICITY — a writer lands data files but dies before its
    manifest publishes; the read path must not see one orphan row
    (readers trust only linked manifests, never directory listings).
    (2) WRITE CONFLICT — two writers race version 1; os.link's
    put-if-absent lets exactly one win and raises CommitConflictError
    for the loser. Counts come from real distributed reads; the final
    one-row assembly is driver-side by nature (this is a protocol test
    — the data math lives in the other three acid queries)."""
    t = AcidTable.create(
        spark, _base(spark, sf_dir).repartition(4), scratch_dir("acid_atom")
    )
    n0 = t.read(spark).count()
    # simulated crash: files written, manifest never published
    t._write_files(_changes(spark, sf_dir), "orphan-crashed-writer")
    n_after_crash = t.read(spark).count()
    t.commit(1, "writer_a", add=[], remove=[])  # writer A wins version 1
    try:
        t.commit(1, "writer_b", add=[], remove=[])
        conflict = False
    except CommitConflictError:
        conflict = True
    return spark.createDataFrame(
        [(n0, n_after_crash == n0, conflict, t.latest_version())],
        "n_rows_v0 long, crash_invisible boolean, conflict_detected boolean, "
        "latest_version int",
    )


@register(
    "table_stats_skipping",
    category="acid_table",
    oracle=f"""
WITH b AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 10000
),
r AS (SELECT MIN(o_orderkey) AS lo0, MAX(o_orderkey) AS hi0 FROM b),
sel AS (
  SELECT b.* FROM b, r
  WHERE o_orderkey BETWEEN lo0 + (hi0 - lo0) // 5
                       AND lo0 + 2 * ((hi0 - lo0) // 5)
)
SELECT COUNT(*) AS n_rows, {sql_lsum('o_totalprice')} AS total_price,
       TRUE AS pruned_fewer_files, TRUE AS pruning_lossless
FROM sel
""",
)
def table_stats_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Manifest-stats data skipping (the Iceberg manifest idea): the table
    is created range-clustered on o_orderkey (16 repartitionByRange
    files, so each file covers a tight key band) with per-file min/max
    recorded in the commit manifest. A predicate read then eliminates
    files ON THE DRIVER from the log's stats — no parquet footer is even
    opened for a pruned file; at 100 TB this is the difference between
    listing a handful of files and scanning the world. The oracle pins
    the lossless contract (identical rows/exact cent total to a full
    scan with the predicate) and the pruning flags assert files were
    actually skipped; row-level residue is still filtered after the
    file-level cut (stats prune files, not rows)."""
    t = AcidTable.create(
        spark,
        _base(spark, sf_dir).repartitionByRange(16, "o_orderkey"),
        scratch_dir("acid_skip"),
        stats_cols=["o_orderkey"],
    )
    # predicate band = the 2nd fifth of the observed key range, so the
    # query prunes meaningfully at EVERY scale factor (fixed literals
    # would fall outside the key span at small sf)
    b = t.read(spark).agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    lo0, hi0 = int(b[0]), int(b[1])
    lo = lo0 + (hi0 - lo0) // 5
    hi = lo0 + 2 * ((hi0 - lo0) // 5)
    pruned, n_scanned, n_total = t.read_pruned(spark, "o_orderkey", lo, hi)
    full = t.read(spark).filter(F.col("o_orderkey").between(lo, hi))
    n_full = full.count()
    return pruned.filter(F.col("o_orderkey").between(lo, hi)).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(lng(F.col("o_totalprice"))).cast("double") / 1e6).alias(
            "total_price"
        ),
        F.lit(n_scanned < n_total).alias("pruned_fewer_files"),
        (F.count(F.lit(1)) == n_full).alias("pruning_lossless"),
    )


@register(
    "table_schema_evolution",
    category="acid_table",
    oracle=f"""
WITH v0 AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 5000
),
added AS (
  SELECT o_orderkey + 20000000 AS o_orderkey, o_totalprice,
         (o_totalprice > 100000) AS is_big
  FROM orders WHERE o_orderkey < 3000
)
SELECT COUNT(*) AS n_rows,
       CAST(COUNT(*) FILTER (WHERE is_big IS NULL) AS BIGINT) AS n_legacy,
       CAST(COUNT(*) FILTER (WHERE is_big) AS BIGINT) AS n_big,
       {sql_lsum('o_totalprice')} AS total_price
FROM (SELECT o_orderkey, o_totalprice, NULL AS is_big FROM v0
      UNION ALL SELECT * FROM added)
""",
)
def table_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution by column addition: v0 files carry two columns, a
    later append commits files WITH a third (is_big); a mergeSchema read
    of the latest snapshot resolves the union schema, surfacing the new
    column as NULL on pre-evolution rows — the Delta/Iceberg add-column
    contract (no rewrite of existing data, old readers unaffected, new
    column back-filled as NULL). The oracle recomputes the evolved state
    relationally: total rows, legacy-NULL count, true-flag count, exact
    cent total."""
    o = table(spark, sf_dir, "orders")
    v0 = o.filter(F.col("o_orderkey") < 5000).select(
        "o_orderkey", "o_totalprice"
    )
    t = AcidTable.create(spark, v0.repartition(4), scratch_dir("acid_evo"))
    added = o.filter(F.col("o_orderkey") < 3000).select(
        (F.col("o_orderkey") + 20_000_000).alias("o_orderkey"),
        "o_totalprice",
        (F.col("o_totalprice") > 100000).alias("is_big"),
    )
    t.append(spark, added)
    return t.read(spark, merge_schema=True).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("is_big").isNull().cast("long")).alias("n_legacy"),
        F.sum(F.coalesce(F.col("is_big"), F.lit(False)).cast("long")).alias(
            "n_big"
        ),
        (F.sum(lng(F.col("o_totalprice"))).cast("double") / 1e6).alias(
            "total_price"
        ),
    )


@register(
    "table_changes_feed",
    category="acid_table",
    oracle=f"""
WITH {_MERGE_ORACLE_CTES},
v2 AS (SELECT * FROM v1 WHERE o_orderkey % 3 <> 0),
pre AS (SELECT * FROM base EXCEPT ALL SELECT * FROM v2),
post AS (SELECT * FROM v2 EXCEPT ALL SELECT * FROM base),
upd AS (SELECT o_orderkey FROM pre INTERSECT SELECT o_orderkey FROM post)
SELECT p.*, CASE WHEN u.o_orderkey IS NOT NULL THEN 'update_pre'
                 ELSE 'delete' END AS _change_type
FROM pre p LEFT JOIN upd u USING (o_orderkey)
UNION ALL
SELECT p.*, CASE WHEN u.o_orderkey IS NOT NULL THEN 'update_post'
                 ELSE 'insert' END AS _change_type
FROM post p LEFT JOIN upd u USING (o_orderkey)
""",
)
def table_changes_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change data feed (CDC) between two snapshots of the ACID table:
    rows present only in the earlier snapshot surface as delete /
    update_pre, rows only in the later as insert / update_post, with the
    update split decided by key co-presence — Delta's CDF read contract,
    derived purely from the two as-of reads (multiset EXCEPT ALL keeps
    duplicate-row accounting exact) rather than stored change files.
    Scale: two snapshot scans + one exceptAll shuffle each on the full
    row, then a key-level intersect — the no-stored-CDF fallback; a
    production table would persist per-commit change files and read
    those instead (the commit log already records exactly which files
    each version touched, bounding the diff to rewritten files)."""
    t = AcidTable.create(
        spark, _base(spark, sf_dir).repartition(4), scratch_dir("acid_cdc")
    )
    t.merge(spark, _changes(spark, sf_dir), "o_orderkey")
    t.delete_where(spark, F.col("o_orderkey") % 3 == 0)
    a = t.read(spark, 0)
    b = t.read(spark, 2)
    pre = a.exceptAll(b).localCheckpoint()
    post = b.exceptAll(a).localCheckpoint()
    upd = (
        pre.select("o_orderkey")
        .intersect(post.select("o_orderkey"))
        .withColumnRenamed("o_orderkey", "_uk")
    )
    pre_t = pre.join(
        F.broadcast(upd), pre["o_orderkey"] == upd["_uk"], "left"
    ).select(
        *[pre[c] for c in pre.columns],
        F.when(F.col("_uk").isNotNull(), "update_pre")
        .otherwise("delete")
        .alias("_change_type"),
    )
    post_t = post.join(
        F.broadcast(upd), post["o_orderkey"] == upd["_uk"], "left"
    ).select(
        *[post[c] for c in post.columns],
        F.when(F.col("_uk").isNotNull(), "update_post")
        .otherwise("insert")
        .alias("_change_type"),
    )
    return pre_t.unionByName(post_t)


@register(
    "table_incremental_mv",
    category="acid_table",
    oracle=f"""
WITH {_MERGE_ORACLE_CTES},
v2 AS (SELECT * FROM v1 WHERE o_orderkey % 3 <> 0)
SELECT o_custkey,
       CAST(SUM(CAST(FLOOR(o_totalprice*100 + 0.5) AS BIGINT)) AS DOUBLE)/100
         AS revenue,
       COUNT(*) AS n_orders
FROM v2 GROUP BY o_custkey
""",
)
def table_incremental_mv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental materialized-view maintenance off the CDC feed: a
    per-customer revenue aggregate built at v0 is advanced to v2 by
    applying ONLY the change rows (subtract update_pre/delete, add
    update_post/insert) — never rescanning the base. The oracle is the
    FULL recompute over the v2 state, so any drift between delta
    maintenance and recomputation (the classic IVM soundness bug: missed
    retraction, double-applied update, zombie group) hash-fails.

    Exactness: revenue is maintained as integer cents (floor half-up),
    so subtract-then-add is associative and drift-free — delta
    maintenance on raw doubles would accumulate rounding and could never
    hash-match. Scale: the MV update shuffles only |changed rows|
    grouped by key + one outer join MV-vs-delta on the MV key — the
    whole point of IVM at 100 TB; groups whose count reaches zero are
    retracted."""
    t = AcidTable.create(
        spark, _base(spark, sf_dir).repartition(4), scratch_dir("acid_mv")
    )
    t.merge(spark, _changes(spark, sf_dir), "o_orderkey")
    t.delete_where(spark, F.col("o_orderkey") % 3 == 0)

    cents = F.floor(F.col("o_totalprice") * 100 + 0.5).cast("long")
    mv0 = (
        t.read(spark, 0)
        .groupBy("o_custkey")
        .agg(F.sum(cents).alias("rev_c"), F.count(F.lit(1)).alias("n_orders"))
    )
    # CDC rows v0 -> v2, signed: retractions count -1, additions +1
    a = t.read(spark, 0)
    b = t.read(spark, 2)
    pre = a.exceptAll(b).select(
        "o_custkey", (-cents).alias("d_rev"), F.lit(-1).alias("d_n")
    )
    post = b.exceptAll(a).select(
        "o_custkey", cents.alias("d_rev"), F.lit(1).alias("d_n")
    )
    delta = (
        pre.unionByName(post)
        .groupBy("o_custkey")
        .agg(F.sum("d_rev").alias("d_rev"), F.sum("d_n").alias("d_n"))
    )
    mv2 = (
        mv0.join(delta, "o_custkey", "full_outer")
        .select(
            "o_custkey",
            (
                F.coalesce(F.col("rev_c"), F.lit(0))
                + F.coalesce(F.col("d_rev"), F.lit(0))
            ).alias("rev_c"),
            (
                F.coalesce(F.col("n_orders"), F.lit(0))
                + F.coalesce(F.col("d_n"), F.lit(0))
            ).alias("n_orders"),
        )
        .filter(F.col("n_orders") > 0)  # zero-count groups retract
    )
    return mv2.select(
        "o_custkey",
        (F.col("rev_c").cast("double") / 100).alias("revenue"),
        "n_orders",
    )


@register(
    "table_zorder_skipping",
    category="acid_table",
    oracle=f"""
SELECT COUNT(*) AS n_rows, {sql_lsum('l_extendedprice')} AS total_price,
       TRUE AS pruned_half, TRUE AS pruning_lossless
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND CAST(floor(l_extendedprice / 1000) AS BIGINT) BETWEEN 10 AND 30
""",
)
def table_zorder_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPTIMIZE ZORDER for the ACID table: lineitem is laid out by the
    Morton interleave of (quantity, price-bucket) — repartitionByRange on
    the z-value makes every file narrow in BOTH dimensions at once — and
    per-file min/max for both dimensions land in the commit manifest. A
    2-D predicate then prunes files MULTIPLICATIVELY from the log's
    stats (the layout single-column range clustering cannot give: sorted
    by quantity alone, every file spans the full price range and a price
    predicate prunes nothing). The oracle pins losslessness (identical
    rows/exact cents to a full scan) and the flags assert at least half
    the files were eliminated by stats alone. The z expression is
    opt_zorder_cluster's, reused as the physical write layout here."""
    from .file_sources import _z_col

    li = table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_quantity",
        "l_extendedprice",
        F.floor(F.col("l_extendedprice") / 1000).cast("long").alias("pbucket"),
    )
    lz = li.withColumn("z", _z_col(F.col("l_quantity"), F.col("pbucket")))
    t = AcidTable.create(
        spark,
        lz.repartitionByRange(16, "z").drop("z"),
        scratch_dir("acid_zorder"),
        stats_cols=["l_quantity", "pbucket"],
    )
    preds = {"l_quantity": (10, 20), "pbucket": (10, 30)}
    pruned, n_scanned, n_total = t.read_pruned_multi(spark, preds)
    residue = (
        F.col("l_quantity").between(10, 20) & F.col("pbucket").between(10, 30)
    )
    n_full = t.read(spark).filter(residue).count()
    return pruned.filter(residue).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(lng(F.col("l_extendedprice"))).cast("double") / 1e6).alias(
            "total_price"
        ),
        F.lit(n_scanned * 2 <= n_total).alias("pruned_half"),
        (F.count(F.lit(1)) == n_full).alias("pruning_lossless"),
    )


class ConstraintViolation(RuntimeError):
    """A commit-time CHECK constraint rejected the batch."""


def append_with_constraints(
    t: AcidTable,
    spark: SparkSession,
    df: DataFrame,
    checks: dict[str, "F.Column"],
) -> int:
    """Delta-style commit-time CHECK constraints: the batch is validated
    with ONE aggregate pass (count of violators per named rule) BEFORE
    any manifest publishes; a single violation rejects the whole batch —
    files may have landed in the data directory, but without a manifest
    they are invisible (the same orphan guarantee crash atomicity rides
    on), so enforcement is atomic by construction. Raises
    ConstraintViolation listing the failed rules."""
    viols = df.agg(
        *[
            F.sum((~c).cast("long")).alias(name)
            for name, c in checks.items()
        ]
    ).first()
    failed = {n: viols[n] for n in checks if (viols[n] or 0) > 0}
    if failed:
        raise ConstraintViolation(str(sorted(failed.items())))
    return t.append(spark, df)


@register(
    "table_check_constraints",
    category="acid_table",
    oracle=f"""
WITH v0 AS (
  SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey < 5000
),
good AS (
  SELECT o_orderkey + 40000000 AS o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey < 2000 AND o_totalprice > 0
)
SELECT COUNT(*) AS n_rows, {sql_lsum('o_totalprice')} AS total_price,
       TRUE AS bad_batch_rejected, TRUE AS bad_batch_invisible,
       2 AS n_versions
FROM (SELECT * FROM v0 UNION ALL SELECT * FROM good)
""",
)
def table_check_constraints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-time CHECK constraint enforcement: a batch carrying NULL
    keys and non-positive prices is validated against the table's rules
    before its manifest can publish — the whole batch is rejected
    atomically (its files stay orphaned and invisible), then a clean
    batch commits normally. The oracle pins the end state: base + good
    batch only, exactly two manifests, and flags for the rejection and
    the invisibility of the rejected rows. This is Delta's CHECK /
    NOT NULL contract: a constraint is only worth having if a violating
    writer cannot make ANY of its rows visible."""
    o = table(spark, sf_dir, "orders")
    v0 = o.filter(F.col("o_orderkey") < 5000).select(
        "o_orderkey", "o_totalprice"
    )
    t = AcidTable.create(spark, v0.repartition(4), scratch_dir("acid_check"))
    checks = {
        "key_not_null": F.col("o_orderkey").isNotNull(),
        "price_positive": F.col("o_totalprice") > 0,
    }
    bad = o.filter(F.col("o_orderkey") < 2000).select(
        F.when(F.col("o_orderkey") % 5 == 0, None)
        .otherwise(F.col("o_orderkey") + 40_000_000)
        .alias("o_orderkey"),
        (F.col("o_totalprice") * -1).alias("o_totalprice"),
    )
    n_before = t.read(spark).count()
    try:
        append_with_constraints(t, spark, bad, checks)
        rejected = False
    except ConstraintViolation:
        rejected = True
    invisible = t.read(spark).count() == n_before
    good = o.filter(
        (F.col("o_orderkey") < 2000) & (F.col("o_totalprice") > 0)
    ).select(
        (F.col("o_orderkey") + 40_000_000).alias("o_orderkey"),
        "o_totalprice",
    )
    append_with_constraints(t, spark, good, checks)
    return t.read(spark).agg(
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(lng(F.col("o_totalprice"))).cast("double") / 1e6).alias(
            "total_price"
        ),
        F.lit(rejected).alias("bad_batch_rejected"),
        F.lit(invisible).alias("bad_batch_invisible"),
        F.lit(len(t.versions())).alias("n_versions"),
    )


@register(
    "table_stream_source",
    category="acid_table",
    oracle="""
SELECT v.v AS version, e.event_type,
       CAST(COUNT(*) AS BIGINT) AS cum_events
FROM UNNEST(range(0, 4)) AS v(v)
JOIN events e ON e.event_id % 4 <= v.v
GROUP BY v.v, e.event_type
""",
)
def table_stream_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ACID table as a STREAMING SOURCE (Delta streaming-source
    semantics): an append-only table's commit log is a replayable change
    stream — each commit's added files are one micro-batch, and a
    consumer's offset is simply the last processed version. Four
    commits land events split by event_id%4; the consumer then walks the
    log from its cursor, reading ONLY the files each manifest added
    (never rescanning the table), and emits the cumulative per-type
    counts after every batch. The oracle recomputes each cumulative
    state relationally, so a consumer that missed a commit's files,
    double-read them, or leaked a later commit into an earlier offset
    diverges. Scale: per batch the consumer touches |added files| — the
    log IS the incremental-processing index; no directory diffing, no
    full-table scans."""
    src = table(spark, sf_dir, "events").select("event_id", "event_type")
    t = AcidTable.create(
        spark,
        src.filter(F.col("event_id") % 4 == 0).coalesce(2),
        scratch_dir("acid_src"),
    )
    for i in range(1, 4):
        t.append(spark, src.filter(F.col("event_id") % 4 == i).coalesce(2))

    # consumer: cursor over the log, one micro-batch per commit
    outs = []
    cursor = -1
    for m in t.history():
        v = m["version"]
        assert v == cursor + 1, "gap in the commit stream"
        cursor = v
        batch_files = [os.path.join(t.root, f) for f in m["add"]]
        batch = spark.read.parquet(*batch_files)
        counts = batch.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("d")
        )
        outs.append(counts.withColumn("version", F.lit(v)))
    all_deltas = outs[0]
    for o in outs[1:]:
        all_deltas = all_deltas.unionByName(o)
    # cumulative state after each batch = sum of deltas with version <= v
    a = all_deltas.alias("a")
    b = all_deltas.alias("b")
    return (
        a.join(
            b,
            (F.col("b.version") <= F.col("a.version"))
            & (F.col("b.event_type") == F.col("a.event_type")),
        )
        .groupBy(
            F.col("a.version").alias("version"),
            F.col("a.event_type").alias("event_type"),
        )
        .agg(F.sum("b.d").alias("cum_events"))
    )


def _manifest_adds_reference(t: AcidTable, version: int, out_dir: str) -> bool:
    """Content-based commit ownership: True iff manifest `version` exists
    and its 'add' entries reference files under `out_dir`. Used by
    cleanup paths to decide whether a failed attempt actually published —
    the data directory's uuid suffix makes it writer-unique, so a match
    proves the manifest is OURS even when the in-memory publish marker
    was never set (async exception between os.link and the marker
    assignment inside commit())."""
    try:
        with open(t._manifest_path(version)) as f:
            manifest = json.load(f)
    except FileNotFoundError:
        return False
    except (OSError, json.JSONDecodeError):
        # Manifest present but unreadable: a linked manifest is always
        # fully written + fsynced, so this is an environment fault — the
        # SAFE answer is "published" (leave the directory; deleting data
        # a committed manifest might reference is the unrecoverable side).
        return True
    prefix = os.path.relpath(out_dir, t.root).rstrip("/") + "/"
    return any(a.startswith(prefix) for a in manifest.get("add", []))


def overwrite_partitions(
    t: AcidTable, spark: SparkSession, df: DataFrame, part_col: str
) -> int:
    """Atomic DYNAMIC PARTITION OVERWRITE: replace exactly the partitions
    present in the batch, in ONE commit. The batch is written partitioned
    by `part_col` (one subdir per value); the manifest removes every
    active file whose recorded partition value is in the batch's set and
    adds the new files tagged with theirs. Readers see the old or the
    new partition content, never a mix — the atomicity Spark's native
    dynamic overwrite on a plain directory cannot give (it deletes, then
    writes). Partition values ride in the manifest stats as a [v, v]
    min/max, so partition pruning is just read_pruned_multi."""
    version = t.latest_version()
    next_v = version + 1
    tag = f"commit-{next_v:05d}-dynover"
    out = os.path.join(t.data_dir, tag)
    df.write.mode("error").partitionBy(part_col).parquet(out)

    dt = df.schema[part_col].dataType

    # Everything after the write can refuse (validation) — clean the
    # just-written uncommitted directory up on ANY failure, else a retry
    # of the SAME version recomputes the same tag and df.write
    # .mode("error") dies on path-already-exists instead of succeeding.
    # Snapshot the publish marker so the error path can tell "THIS
    # attempt's commit linked the manifest" apart from "this instance
    # published next_v earlier / someone else did" — attempt-scoped
    # ownership, no inference from exception types.
    marker_before = t.last_published_version
    try:
        add, stats = [], {}
        batch_parts = set()
        for dirpath, _dirs, files in os.walk(out):
            for fname in files:
                if not fname.endswith(".parquet"):
                    continue
                rel = os.path.relpath(os.path.join(dirpath, fname), t.root)
                add.append(rel)
                # .../<part_col>=<value>/part-*.parquet
                pv = parse_hive_dir_value(
                    os.path.basename(dirpath).split("=", 1)[1], dt, part_col
                )
                batch_parts.add(pv)
                stats[rel] = {part_col: [pv, pv]}
        old_stats = t.file_stats(version)
        # A file is replaceable iff its recorded partition value is
        # DEGENERATE ([v, v]): dynamic overwrite removes whole files, so a
        # file whose stats straddle values (min != max) or are missing
        # might hold rows of BOTH overwritten and untouched partitions —
        # removing it loses the untouched rows, keeping it duplicates the
        # overwritten ones. Refuse rather than corrupt. All comparisons
        # are TYPED: the hive directory strings are parsed to the stat
        # value's Python type first — string order is wrong for numerics
        # ('10' < '9' lexicographically, so a file spanning [9, 12] would
        # look disjoint from batch partition 10 and its rows would be
        # silently duplicated), and string-equality membership is
        # representation-sensitive (5 vs '5', 5.0 vs '5.0').
        def _typed(b, exemplar):
            if type(b) is type(exemplar):
                return b
            if isinstance(exemplar, str) and not isinstance(b, str):
                # Legacy/external string-typed stats for a non-string
                # batch column: stringifying the batch values would
                # silently revert the straddle range check to
                # lexicographic order ('9' > '10') — the exact corruption
                # the typed compare exists to prevent.
                raise TypeError(
                    f"stat is str but the batch column is "
                    f"{type(b).__name__}: refusing to compare "
                    "lexicographically"
                )
            bs = str(b)
            if isinstance(exemplar, bool):  # before int: bool is int subclass
                return bs.lower() == "true"
            if isinstance(exemplar, int):
                return int(bs)
            if isinstance(exemplar, float):
                return float(bs)
            raise TypeError(type(exemplar).__name__)

        remove = []
        for f, st in old_stats.items():
            pv = st.get(part_col)
            if pv is None or pv[0] is None:
                raise ValueError(
                    f"dynamic overwrite needs [v, v] {part_col} stats on "
                    f"every active file; {f} has none — rewrite it "
                    "partitioned first"
                )
            try:
                typed_parts = {_typed(b, pv[0]) for b in batch_parts}
            except (TypeError, ValueError) as exc:
                raise ValueError(
                    f"dynamic overwrite cannot compare batch {part_col} "
                    f"values {sorted(batch_parts)} against {f}'s stats "
                    f"{pv} ({type(pv[0]).__name__}): {exc} — use a "
                    "string-typed partition column or rewrite the file's "
                    "stats"
                ) from exc
            if pv[0] != pv[1]:
                if any(pv[0] <= b <= pv[1] for b in typed_parts):
                    raise ValueError(
                        f"{f} spans {part_col} range {pv} which intersects "
                        "the batch's partitions — whole-file replacement "
                        "would corrupt; compact the table per-partition "
                        "first"
                    )
                continue
            if pv[0] in typed_parts:
                remove.append(f)
        t.commit(
            next_v, "dynamic_overwrite", add=sorted(add), remove=remove,
            stats=stats,
        )
    except BaseException as exc:
        # Clean up ONLY when OUR version was never published. commit()
        # can raise AFTER the manifest hard-link succeeded (_fsync_dir or
        # the tmp unlink failing, or a KeyboardInterrupt landing between
        # link and return) — at that point readers already trust the
        # manifest, and deleting `out` would leave a committed version
        # referencing missing parquet (the exact torn state the manifest
        # log exists to prevent). Ownership comes from direct evidence —
        # commit() records last_published_version the instant its
        # os.link lands — not from manifest-exists + exception-type
        # inference, which misattributed one race: a racer publishes
        # next_v, then WE fail with a non-conflict error (validation
        # ValueError, pre-link OSError) — the manifest exists but is the
        # racer's, and our never-committed directory must be removed.
        # The marker is corroborating, not sole, evidence: an async
        # exception (KeyboardInterrupt) can land INSIDE commit() between
        # os.link and the marker assignment — manifest published, marker
        # unset. Content-based ownership from the manifest itself covers
        # that window: if the manifest at next_v exists AND its 'add'
        # entries reference OUR out directory, the commit is ours no
        # matter what the marker says (a racer's manifest references a
        # different uuid-suffixed directory, so this never misattributes).
        published = (
            t.last_published_version == next_v
            and t.last_published_version != marker_before
        ) or _manifest_adds_reference(t, next_v, out)
        if not published:
            shutil.rmtree(out, ignore_errors=True)
        raise
    return next_v


@register(
    "table_partition_overwrite",
    category="acid_table",
    oracle="""
WITH base AS (
  SELECT event_id, event_type,
         CAST(CAST(ts AS DATE) AS VARCHAR) AS event_day, value
  FROM events
),
days AS (
  SELECT DISTINCT event_day FROM base
  ORDER BY event_day LIMIT 2
),
kept AS (
  SELECT * FROM base WHERE event_day NOT IN (SELECT event_day FROM days)
),
replaced AS (
  SELECT event_id + 90000000 AS event_id, event_type, event_day,
         value * 2 AS value
  FROM base WHERE event_day IN (SELECT event_day FROM days)
)
SELECT event_day, COUNT(*) AS n_events,
       CAST(SUM(CAST(FLOOR(value*100 + 0.5) AS BIGINT)) AS BIGINT)
         AS value_cents,
       CAST(COUNT(*) FILTER (WHERE event_id >= 90000000) AS BIGINT)
         AS n_replaced
FROM (SELECT * FROM kept UNION ALL SELECT * FROM replaced)
GROUP BY event_day
""",
)
def table_partition_overwrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic partition overwrite as ONE atomic commit: an events table
    partitioned by day gets its two earliest days re-landed (corrected
    ids, doubled values) — exactly those partitions' files are swapped in
    a single manifest publish; untouched days carry by reference (the
    backfill contract: no reader ever sees a half-replaced day, unlike
    delete-then-write on a plain directory). The oracle recomputes the
    end state per day: untouched days bit-identical, replaced days fully
    new (n_replaced == n_events there). Partition values live in the
    manifest as degenerate [v, v] stats, so day-level pruning reuses the
    ordinary stats-skipping path."""
    e = table(spark, sf_dir, "events").select(
        "event_id",
        "event_type",
        F.col("ts").cast("date").cast("string").alias("event_day"),
        "value",
    )
    t = AcidTable(scratch_dir("acid_dynover"))
    # initial load, partitioned by day (same hive layout the overwrite uses)
    out = os.path.join(t.data_dir, "commit-00000")
    e.write.partitionBy("event_day").parquet(out)
    add, stats = [], {}
    for dirpath, _dirs, files in os.walk(out):
        for fname in files:
            if fname.endswith(".parquet"):
                rel = os.path.relpath(os.path.join(dirpath, fname), t.root)
                add.append(rel)
                # same unescape/typing path the overwrite walker uses —
                # recording the RAW dir value here would recreate the
                # escaped-vs-unquoted stat mismatch for reserved chars
                pv = parse_hive_dir_value(
                    os.path.basename(dirpath).split("=", 1)[1],
                    e.schema["event_day"].dataType,
                    "event_day",
                )
                stats[rel] = {"event_day": [pv, pv]}
    t.commit(0, "create", add=sorted(add), remove=[], stats=stats)
    days = [
        r["event_day"]
        for r in e.select("event_day").distinct().orderBy("event_day").limit(2).collect()
    ]
    repl = e.filter(F.col("event_day").isin(days)).select(
        (F.col("event_id") + 90_000_000).alias("event_id"),
        "event_type",
        "event_day",
        (F.col("value") * 2).alias("value"),
    )
    overwrite_partitions(t, spark, repl, "event_day")
    # the partition column is directory-encoded (hive layout) and the
    # active files span several commit dirs, so standard partition
    # discovery has no single base path — restore the value from each
    # file's own path via the _metadata column, which is exactly what a
    # manifest-driven reader does (the path segment IS table metadata)
    got = spark.read.parquet(*t.active_files()).withColumn(
        "event_day",
        F.regexp_extract(F.col("_metadata.file_path"), "event_day=([^/]+)/", 1),
    )
    return got.groupBy("event_day").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 100 + 0.5).cast("long")).alias(
            "value_cents"
        ),
        F.sum((F.col("event_id") >= 90_000_000).cast("long")).alias(
            "n_replaced"
        ),
    )


@register(
    "table_deletion_vectors",
    category="acid_table",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey < 10000
),
v1 AS (SELECT * FROM base WHERE NOT (o_orderkey % 3 = 0)),
v2 AS (SELECT * FROM v1 WHERE NOT (o_totalprice > 150000.0))
SELECT 0 AS version, 'create' AS op, COUNT(*) AS n_rows,
       {sql_lsum('o_totalprice')} AS total_price,
       CAST(4 AS BIGINT) AS files_written FROM base
UNION ALL
SELECT 1, 'delete-dv', COUNT(*), {sql_lsum('o_totalprice')},
       CAST(0 AS BIGINT) FROM v1
UNION ALL
SELECT 2, 'delete-dv', COUNT(*), {sql_lsum('o_totalprice')},
       CAST(0 AS BIGINT) FROM v2
UNION ALL
SELECT 3, 'purge', COUNT(*), {sql_lsum('o_totalprice')},
       CAST(4 AS BIGINT) FROM v2
""",
)
def table_deletion_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge-on-read DELETE via positional deletion vectors — the public
    Delta-DV / Iceberg-positional-delete mechanic, measured end to end:
    two DV deletes land WITHOUT rewriting a single data file (the
    files_written column comes from the actual manifests, and the
    oracle pins the DV commits to 0 data files), every snapshot read applies the live DV set as
    a broadcast anti-join on (file_name, row_index), and a final purge
    re-materializes survivors and clears the vectors in one atomic
    commit. Row counts and exact cent totals for all four versions must
    match the relational recomputation — so a DV that dropped the wrong
    positions, leaked across versions, or survived the purge diverges.
    At 100 TB this is the difference between writing megabytes of
    positions and rewriting terabytes of parquet for a 0.01% delete."""
    t = AcidTable.create(
        spark, _base(spark, sf_dir).repartition(4), scratch_dir("acid_dv")
    )
    t.delete_where_dv(spark, F.col("o_orderkey") % 3 == 0)
    t.delete_where_dv(spark, F.col("o_totalprice") > 150000.0)
    t.purge_dv(spark)
    outs = []
    for v, m in zip(t.versions(), t.history()):
        outs.append(
            t.read_with_dv(spark, version=v).agg(
                F.lit(v).alias("version"),
                F.lit(m["op"]).alias("op"),
                F.count(F.lit(1)).alias("n_rows"),
                (F.sum(lng(F.col("o_totalprice"))).cast("double") / 1e6)
                .alias("total_price"),
                F.lit(len(m["add"])).cast("long").alias("files_written"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionAll(o)
    return out


@register(
    "table_restore_rollback",
    category="acid_table",
    oracle=f"""
WITH {_MERGE_ORACLE_CTES}
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       CAST(4 AS BIGINT) AS history_n
FROM v1
""",
)
def table_restore_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RESTORE TO VERSION as a forward commit (Delta RESTORE semantics):
    after create -> MERGE -> bad DELETE, rolling back to the post-MERGE
    snapshot re-publishes that file set at the head of the log — the
    rollback is itself a versioned, auditable commit and the full
    history (history_n = 4 manifests) stays intact, so the "bad" state
    remains reachable for forensics. The read-back must be row-for-row
    the v1 MERGE result; a restore that grabbed the wrong file set, or
    deleted history instead of appending, diverges immediately."""
    t = AcidTable.create(
        spark, _base(spark, sf_dir).repartition(4), scratch_dir("acid_restore")
    )
    t.merge(spark, _changes(spark, sf_dir), "o_orderkey")
    t.delete_where(spark, F.col("o_orderkey") % 3 == 0)  # the bad delete
    t.restore(1)
    return t.read(spark).withColumn(
        "history_n", F.lit(len(t.versions())).cast("long")
    )


@register(
    "table_conflict_rebase",
    category="acid_table",
    oracle="""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey < 10000
),
a AS (
  SELECT o_orderkey, o_custkey, 'X' AS o_orderstatus,
         o_totalprice + 1000.0 AS o_totalprice
  FROM base WHERE o_orderkey % 7 = 0
),
b AS (
  SELECT o_orderkey, o_custkey, 'Y' AS o_orderstatus,
         o_totalprice + 500.0 AS o_totalprice
  FROM base WHERE o_orderkey % 7 = 3
),
final AS (
  SELECT * FROM a
  UNION ALL SELECT * FROM b
  UNION ALL
  SELECT bs.* FROM base bs
  ANTI JOIN a ON bs.o_orderkey = a.o_orderkey
  ANTI JOIN b ON bs.o_orderkey = b.o_orderkey
)
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
       CAST(1 AS BIGINT) AS loser_retries,
       CAST(3 AS BIGINT) AS history_n
FROM final
""",
)
def table_conflict_rebase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimistic-concurrency conflict and REBASE: two writers prepare
    MERGEs against the SAME snapshot v0; writer A publishes v1 first, so
    writer B's put-if-absent on v1 fails (the os.link EEXIST race — the
    same atomic primitive Delta's put-if-absent / Iceberg's swap rely
    on). B then REBASES: recomputes its copy-on-write rewrite against
    the new head and commits v2 — recomputation (not blind re-commit) is
    what prevents the lost update when A rewrote the very files B's
    stale plan carried by reference. The oracle pins the end state (both
    change sets applied over the base), B's retry count (exactly 1) and
    the history length (3 manifests) — a blind retry that clobbers A's
    rewrite, or a rebase that double-applies B, diverges. The loser's
    pre-conflict data files stay orphaned and invisible (VACUUM's job),
    which test_orphan_data_files_are_invisible already pins."""
    t = AcidTable.create(
        spark, _base(spark, sf_dir).repartition(4), scratch_dir("acid_race")
    )
    base = _base(spark, sf_dir)
    changes_a = base.filter(F.col("o_orderkey") % 7 == 0).select(
        "o_orderkey",
        "o_custkey",
        F.lit("X").alias("o_orderstatus"),
        (F.col("o_totalprice") + 1000.0).alias("o_totalprice"),
    )
    changes_b = base.filter(F.col("o_orderkey") % 7 == 3).select(
        "o_orderkey",
        "o_custkey",
        F.lit("Y").alias("o_orderstatus"),
        (F.col("o_totalprice") + 500.0).alias("o_totalprice"),
    )
    # Both writers snapshot v0. A wins the race for v1...
    t.merge(spark, changes_a, "o_orderkey", as_of_version=0, tag="-writerA")
    # ...so B's commit of its v0-based plan conflicts and must rebase.
    _, retries = t.merge_with_rebase(
        spark, changes_b, "o_orderkey", as_of_version=0
    )
    return t.read(spark).select(
        "*",
        F.lit(retries).cast("long").alias("loser_retries"),
        F.lit(len(t.versions())).cast("long").alias("history_n"),
    )


@register(
    "table_log_checkpoint",
    category="acid_table",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_totalprice, o_orderkey % 12 AS residue
  FROM orders WHERE o_orderkey < 20000
)
SELECT residue,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       {sql_lsum('o_totalprice')} AS total_price,
       CAST(12 AS BIGINT) AS n_commits,
       CAST(10 AS BIGINT) AS ckpt_version,
       CAST(1 AS BIGINT) AS manifests_after_ckpt
FROM base GROUP BY residue
""",
)
def table_log_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Commit-log checkpointing — the Delta checkpoint mechanic that keeps
    snapshot reconstruction O(tail), not O(commits): after 11 commits
    (create + 10 appends) a checkpoint materializes the folded state, and
    every later read seeds from it, replaying only the manifests behind
    it (here exactly ONE — the post-checkpoint append; the
    manifests_after_ckpt column is computed from the actual log listing).
    On a table with years of streaming commits this is the difference
    between opening a million manifests per query plan and opening a
    handful. The read-back after checkpoint + one more append must equal
    the full relational state (per-residue counts and exact cent totals);
    time travel BEFORE the checkpoint still folds from scratch —
    test_checkpoint_equivalence pins byte-equality of both paths."""
    o = (
        table(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey") < 20000)
        .select(
            "o_orderkey",
            "o_totalprice",
            (F.col("o_orderkey") % 12).alias("residue"),
        )
    )
    t = AcidTable.create(
        spark, o.filter(F.col("residue") == 0), scratch_dir("acid_ckpt")
    )
    for i in range(1, 11):
        t.append(spark, o.filter(F.col("residue") == i))
    ckpt_v = t.checkpoint()  # folds create + 10 appends
    t.append(spark, o.filter(F.col("residue") == 11))
    tail = len([v for v in t.versions() if v > ckpt_v])
    return t.read(spark).groupBy("residue").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        (F.sum(lng(F.col("o_totalprice"))).cast("double") / 1e6).alias(
            "total_price"
        ),
        F.lit(len(t.versions())).cast("long").alias("n_commits"),
        F.lit(ckpt_v).cast("long").alias("ckpt_version"),
        F.lit(tail).cast("long").alias("manifests_after_ckpt"),
    )


@register(
    "table_clone_shallow",
    category="acid_table",
    oracle=f"""
WITH base AS (
  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
  FROM orders WHERE o_orderkey < 10000
),
clone_v1 AS (SELECT * FROM base WHERE NOT (o_orderkey % 3 = 0))
SELECT 'source' AS tbl, COUNT(*) AS n_rows,
       {sql_lsum('o_totalprice')} AS total_price,
       CAST(0 AS BIGINT) AS files_copied_at_clone
FROM base
UNION ALL
SELECT 'clone', COUNT(*), {sql_lsum('o_totalprice')}, CAST(0 AS BIGINT)
FROM clone_v1
""",
)
def table_clone_shallow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-copy SHALLOW CLONE, then divergence: the clone's create
    manifest references the source's data files absolutely (the
    files_copied_at_clone column counts parquet files under the clone's
    OWN data dir at clone time — the oracle pins it to 0), a
    copy-on-write DELETE on the clone rewrites only affected files into
    the clone's dir and drops those foreign references, and the SOURCE
    must read back bit-identical afterwards — shared files are never
    mutated. This is how a 100 TB table gets a writable dev/test copy
    in O(1) bytes."""
    src = AcidTable.create(
        spark, _base(spark, sf_dir).repartition(4), scratch_dir("acid_src")
    )
    clone = src.clone_shallow(scratch_dir("acid_clone"))
    files_copied = (
        sum(
            1
            for _dir, _sub, files in os.walk(clone.data_dir)
            for f in files
            if f.endswith(".parquet")
        )
        if os.path.isdir(clone.data_dir)
        else 0
    )
    clone.delete_where(spark, F.col("o_orderkey") % 3 == 0)
    source_df = src.read(spark).agg(
        F.lit("source").alias("tbl"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(lng(F.col("o_totalprice"))).cast("double") / 1e6).alias(
            "total_price"
        ),
        F.lit(files_copied).cast("long").alias("files_copied_at_clone"),
    )
    clone_df = clone.read(spark).agg(
        F.lit("clone").alias("tbl"),
        F.count(F.lit(1)).alias("n_rows"),
        (F.sum(lng(F.col("o_totalprice"))).cast("double") / 1e6).alias(
            "total_price"
        ),
        F.lit(files_copied).cast("long").alias("files_copied_at_clone"),
    )
    return source_df.unionAll(clone_df)
