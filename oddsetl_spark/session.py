"""SparkSession construction and per-query session pinning.

The driver (and any external caller) may hand us an existing SparkSession,
so every registered query pins the runtime-settable confs it depends on
(`pin_session`) instead of relying on builder-time configuration.

Design notes for the 100 TB target:
- AQE stays ON: runtime shuffle-partition coalescing, skew-join splitting,
  and broadcast-join demotion/promotion are the scale safety net.
- `spark.sql.shuffle.partitions` defaults to the session's default
  parallelism locally; on a 1000-executor cluster the same code runs with
  a cluster-appropriate value (AQE coalesces the excess).
- Session timezone is pinned UTC so timestamp semantics are stable across
  engines (fixtures are tz-naive microsecond timestamps).
"""

from __future__ import annotations

import atexit
import os
import shutil
import tempfile
import time

from pyspark.sql import SparkSession

# Runtime-settable confs applied to ANY session before a query runs.
_RUNTIME_CONF: dict[str, str] = {
    "spark.sql.session.timeZone": "UTC",
    # ANSI mode is the OVERFLOW SAFETY NET for the scaled-long exact-sum
    # grid (_helpers.lsum/lng): a long SUM that exceeds 2^63 raises
    # ARITHMETIC_OVERFLOW instead of wrapping, so a grand-total that
    # outgrows the single-phase grid fails LOUDLY at any scale factor
    # (test_lsum_overflow_raises locks this). Spark 4 defaults ANSI on;
    # pinning it here keeps the guarantee when a caller hands us a
    # session built with ANSI off.
    "spark.sql.ansi.enabled": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # events.ts is parquet TIMESTAMP(NANOS) which Spark cannot read natively;
    # read as long nanos and convert in io.normalize_ts_nanos (true FLOOR
    # to micros — matching DuckDB's CAST(ts_ns AS TIMESTAMP), which floors;
    # a plain `div` would truncate toward zero and differ pre-epoch).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Fixture timestamps are tz-naive micros; with session tz pinned UTC,
    # reading them as TimestampType (not NTZ) gives identical values while
    # keeping epoch functions (unix_micros etc.) and DuckDB parity working.
    "spark.sql.parquet.inferTimestampNTZ.enabled": "false",
    # Defaults restored on every pin so per-query overrides (e.g. the
    # runtime-bloom-filter demo disabling auto-broadcast) cannot leak into
    # the next query in a shared session.
    "spark.sql.autoBroadcastJoinThreshold": "10MB",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "10GB",
}


# SparkContexts that already received the package zip (addPyFile is
# idempotent per context but re-adding logs noisy warnings).
_SHIPPED: set[str] = set()


def _ship_package(spark: SparkSession) -> None:
    """Make oddsetl_spark importable on executors via addPyFile.

    Worker-side closures (mapInPandas / pandas UDFs) that reference
    module-level helpers are pickled BY REFERENCE to this package, so
    executors must import it. The driver's sys.path shim does not reach
    worker processes — shipping a package zip does, on local mode and on
    a real cluster alike."""
    sc = spark.sparkContext
    if sc.applicationId in _SHIPPED:
        return
    import zipfile

    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(scratch_dir("pkg"), "oddsetl_spark.zip")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _, files in os.walk(pkg_dir):
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, os.path.dirname(pkg_dir)))
    sc.addPyFile(zpath)
    _SHIPPED.add(sc.applicationId)


# Dead-block reaper (r13, guide §5 "unpersist when done"): localCheckpoint
# blocks are NOT freed by Dataset.unpersist() or by dropping the Python
# DataFrame — the only sound liveness signal is JVM reachability, which
# Spark's ContextCleaner already tracks through weak references. But the
# chain (Python refcount -> py4j detach -> JVM GC -> cleaner unpersist)
# has no pump: measured in a 16 GB local session, three consecutive runs
# of dedup_minhash_det each leaked their full signature checkpoint
# (~88 MB/run at K=10, GBs at K=100), and the MemoryStore pressure made
# later runs' refine stages pay eviction/re-promotion churn (isolated
# K=100 probe: 54 -> 120 s run-to-run on identical code). Two explicit
# GC rounds drain the chain completely (probe: 3 dead checkpoints ->
# 0 after two rounds); one round only frees the oldest, because the
# py4j detach for recently-dropped frames lands between rounds. The
# reap only ever frees JVM-UNREACHABLE RDDs — frames a caller still
# holds (even indirectly through a derived plan) are never touched —
# so it is safe at any point. It runs at REGISTERED-QUERY ENTRY (the
# registry decorator), where the previous query's intermediates are the
# likely dead weight; the gates bound its cost: the storage-info probe
# is one py4j roundtrip per query call, and the double full-GC
# (~0.5-1 s on a 16 GB heap) fires only when the MemoryStore actually
# holds enough bytes to matter and not more often than the throttle.
_REAP_MIN_BYTES = 256 << 20
_REAP_GC_THROTTLE_S = 10.0
_LAST_REAP_GC: dict[str, float] = {}


def reap_dead_storage(spark: SparkSession, force: bool = False) -> None:
    """Pump the Python-GC -> py4j-detach -> JVM-GC -> ContextCleaner chain
    so dead checkpoint/cache blocks from completed queries are released.
    `force=True` skips the throttle/size gates (tests, probes)."""
    try:
        sc = spark.sparkContext
        app = sc.applicationId
        now = time.monotonic()
        if not force:
            held = sum(
                i.memSize() + i.diskSize()
                for i in sc._jsc.sc().getRDDStorageInfo()
            )
            if held < _REAP_MIN_BYTES:
                return
            if now - _LAST_REAP_GC.get(app, -1e9) < _REAP_GC_THROTTLE_S:
                return
        _LAST_REAP_GC[app] = now
        import gc

        for _ in range(2):
            gc.collect()
            sc._jvm.System.gc()
            time.sleep(0.2)  # let the cleaner thread drain its ref queue
    except Exception:  # noqa: BLE001 — a leaked block is memory pressure,
        pass  # not corruption; never fail a query over cleanup


def pin_session(spark: SparkSession) -> SparkSession:
    """Pin runtime confs required for deterministic, oracle-comparable runs."""
    _ship_package(spark)
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # conf not settable on this build — keep going
    # Shuffle width: ~cores locally; AQE coalesces small shuffles anyway.
    # ODDSETL_SHUFFLE_PARTITIONS overrides — used by the partition-
    # invariance tests to prove results don't depend on parallelism.
    try:
        override = os.environ.get("ODDSETL_SHUFFLE_PARTITIONS")
        cores = spark.sparkContext.defaultParallelism
        spark.conf.set(
            "spark.sql.shuffle.partitions", override or str(max(cores, 8))
        )
    except Exception:
        pass
    return spark


# Input-byte totals per fixture dir, keyed on (dir, max mtime_ns over
# the dir AND its immediate table subdirs): staging tools add/replace
# table subdirs (bumps the parent mtime) or rewrite parquet files INSIDE
# an existing subdir (bumps only that subdir's mtime — the parent alone
# was a stale key, r11 ADVICE), so either kind of growth re-walks
# instead of keeping a stale partition count for the process lifetime.
# Within one key the full walk runs once; the key itself is one listdir.
_DIR_BYTES: dict[tuple[str, int], int] = {}


def _dir_key_mtime(sf_dir: str) -> int:
    mt = os.stat(sf_dir).st_mtime_ns
    for entry in os.scandir(sf_dir):
        if entry.is_dir(follow_symlinks=False):
            mt = max(mt, entry.stat().st_mtime_ns)
    return mt

# Target shuffle-task input: the r9 ~sf10 sweep (SCALING.md
# "shuffle-partition sizing at ~sf10") measured the spill inflection at
# ~1.9M lineitem rows/task (p=32 at 60M rows: join_broadcast_star paid
# 5.1x) and flat-to-noise beyond ~0.9M rows/task (p=64 vs p=128).
# Calibration is in SOURCE-PARQUET bytes, which run ~12x smaller than
# the in-memory rows a shuffle task holds (snappy + dictionary columnar
# vs row objects): the staged ~sf10 dir is 1.58 GB of parquet for 60M
# lineitem rows, so 16 MiB/task -> p=95, inside the measured p=64-128
# flat band, while sf0.1 (17.5 MB) and ~sf1 (156 MB) stay on the cores
# floor where they measured fastest. On a real cluster the same rule
# scales partitions with data; AQE coalesces back when individual
# stages are small.
_TARGET_TASK_INPUT_BYTES = 16 * 1024 * 1024
_MAX_SHUFFLE_PARTITIONS = 4096


def input_bytes(sf_dir: str) -> int:
    """Total parquet bytes under a fixture dir (cached per mtime key —
    the same walk size_shuffle_partitions uses). Operators consult this
    to pick SIZE-DEPENDENT strategies, e.g. DISK_ONLY storage for large
    localCheckpoints (a multi-GB checkpoint cached as deserialized rows
    is what OOM'd dedup_components at ~sf30 on the default heap: every
    read of a disk-spilled block tried to re-promote it into memory
    across 32 concurrent tasks — r12, stack in SCALING.md)."""
    try:
        key = (sf_dir, _dir_key_mtime(sf_dir))
    except OSError:
        key = (sf_dir, 0)
    total = _DIR_BYTES.get(key)
    if total is None:
        total = 0
        try:
            if os.path.isdir(sf_dir):
                for root, _, files in os.walk(sf_dir):
                    for f in files:
                        if f.endswith(".parquet"):
                            total += os.path.getsize(os.path.join(root, f))
        except OSError:
            total = 0  # non-local / unreadable dir: treat as small
        _DIR_BYTES[key] = total
    return total


def size_shuffle_partitions(spark: SparkSession, sf_dir: str) -> None:
    """Set spark.sql.shuffle.partitions from the input size (r9 board
    item: 'partitions scale with data' was a documented rule; this wires
    it). Called by io.table() so every registered query gets it for the
    dir it actually reads.

    ODDSETL_SHUFFLE_PARTITIONS is the documented escape hatch and still
    wins (the partition-invariance tests prove results don't depend on
    this). Tools that need a fixed width must pin through the env var,
    NOT spark.conf.set — this function runs on every table load and
    would clobber a programmatic pin on the next one (r10 ADVICE;
    tools/stream_restart_worker.py is the in-repo example)."""
    if os.environ.get("ODDSETL_SHUFFLE_PARTITIONS"):
        return  # explicit override already pinned by pin_session
    total = input_bytes(sf_dir)
    try:
        floor = max(spark.sparkContext.defaultParallelism, 8)
        p = min(
            _MAX_SHUFFLE_PARTITIONS,
            max(floor, -(-total // _TARGET_TASK_INPUT_BYTES)),
        )
        spark.conf.set("spark.sql.shuffle.partitions", str(p))
    except Exception:
        pass


def get_spark(app_name: str = "oddsetl-spark") -> SparkSession:
    """Build (or reuse) a local session sized from $SPARK_GRAFT_CPUS."""
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.driver.memory", os.environ.get("ODDSETL_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return pin_session(spark)

_SCRATCH_ROOT: str | None = None


def scratch_dir(tag: str) -> str:
    """Per-process scratch directory, removed at interpreter exit.

    Every sink/stream/staging query used to mkdtemp straight into /tmp
    and leak the dir; a long session (the driver's full sweep runs 40+
    such queries per pass) accumulated thousands of /tmp entries and
    measurably degraded tempdir operations (bench 3.3s -> 6.8s at ~3.4k
    dirs, restored by cleanup). All scratch now nests under ONE root
    that atexit removes, so a process cleans up after itself without
    touching other processes' scratch."""
    global _SCRATCH_ROOT
    if _SCRATCH_ROOT is None:
        _SCRATCH_ROOT = tempfile.mkdtemp(prefix="oddsetl_scratch_")
        atexit.register(shutil.rmtree, _SCRATCH_ROOT, True)
    return tempfile.mkdtemp(prefix=f"{tag}_", dir=_SCRATCH_ROOT)
