"""Stage a ~sf1 (K x sf0.1) differential-sweep dataset as one parquet
TABLE per fixture name: `<out>/<table>.parquet` is a directory of part
files written in parallel (r11 verdict item 3: the old single-file
`coalesce(1)` writer was the sf100 staging wall — 1,723 s of the probe,
all of it one task streaming 600M rows). Spark reads the directory
natively; DuckDB consumers glob `<table>.parquet/*.parquet` when the
path is a directory (tests/harness.duck_con does this automatically).
Dirs staged by older rounds as flat single files keep working — the
idempotence check and both readers accept either layout.

The K-copy expansion is a `crossJoin(broadcast(range(K)))` with every
per-copy difference expressed as a function of the `copy_i` column —
ONE scan of the source and ONE plan regardless of K. (The first
parallel-writer attempt kept the K-branch union: at K=1000 Catalyst
spent minutes analyzing a 1000-child Union per table and re-scanned the
source 1000x. Fan-out belongs on the executors, not in the plan.)

Two modes:

  standard — the r6 shifted-copy staging: K copies of each fact table
    with key columns offset per copy, all other column values verbatim.
    Preserves join selectivity and group cardinality per copy; used for
    the 424-query relational/ETL/streaming sweep (SCALING.md round 6).

  low-dup  — same key shifts, plus deterministic per-copy CONTENT
    mutations that keep the pair graph LINEAR in K for the
    pair-graph-oracle family (whose DuckDB verification side replays the
    uncontracted graph — quadratic when copies are verbatim text/vector
    duplicates, which is a verification-harness cost, not an engine
    cost):
      documents.text  — every word w of copy i>0 becomes w||i (token
        sets of different copies are disjoint -> cross-copy shingle /
        minhash / simhash similarity collapses to ~0; WITHIN-copy
        near-dup structure is exactly the original corpus's); n_chars
        recomputed to stay consistent.
      embeddings.embedding — copy i's vectors are rotated by i dims
        (distinct vectors, same norms and coordinate distribution;
        cross-copy cosine ~ random-pair level).
      events.ts — copy i shifted +i * 30 days (copies become temporally
        disjoint, so the +/-6 h spatio-temporal join output grows K x,
        not K^2).
    Copy 0 is byte-verbatim in every mode (explicit WHEN, not a no-op
    mutation). No RNG anywhere — both engines see identical bytes.

Usage: python tools/stage_sf1.py [K] [standard|low-dup] [src_dir]
Default: K=10, low-dup, src=/root/testdata/sf0.1. Output dir printed on
the last line. A non-default src (e.g. sf0.001 for a small
duplicate-heavy oracle-equivalence fixture) is tagged into the dir name.
"""

from __future__ import annotations

import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from oddsetl_spark.session import get_spark  # noqa: E402

SRC = "/root/testdata/sf0.1"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]
FACT_SHIFT = {
    "lineitem": {"l_orderkey": 10_000_000},
    "orders": {"o_orderkey": 10_000_000, "o_custkey": 1_000_000},
    "events": {"event_id": 10_000_000, "user_id": 1_000_000},
    "documents": {"doc_id": 1_000_000},
    "embeddings": {"vec_id": 1_000_000},
}
_D = 64  # embedding dims
_MONTH_US = 30 * 24 * 3600 * 1_000_000  # 30 days in microseconds

# Per-table output-file budget: each scan partition carries ALL K copies
# of its rows (the fan-out multiplies rows in place), so the source read
# is split to ~this many partitions to keep the write wide and the part
# files bounded (~K x source_bytes / N_FILES each).
_N_FILES = 128


def _mutate(t: str, c, ci):
    """Low-dup content mutation as an expression of the copy index
    column `ci` (copy 0 stays byte-verbatim via explicit WHEN)."""
    if t == "documents":
        mutated = F.array_join(
            F.transform(
                F.split(F.col("text"), " "),
                lambda w: F.concat(w, ci.cast("string")),
            ),
            " ",
        )
        c = c.withColumn(
            "text", F.when(ci == 0, F.col("text")).otherwise(mutated)
        )
        return c.withColumn(
            "n_chars",
            F.when(ci == 0, F.col("n_chars")).otherwise(
                F.length("text").cast("long")
            ),
        )
    if t == "embeddings":
        r = ci % _D
        rotated = F.concat(
            F.slice(F.col("embedding"), r + 1, F.lit(_D) - r),
            F.slice(F.col("embedding"), F.lit(1), r),
        )
        return c.withColumn(
            "embedding",
            F.when(r == 0, F.col("embedding")).otherwise(rotated),
        )
    if t == "events":
        return c.withColumn(
            "ts",
            F.timestamp_micros(
                F.unix_micros(F.col("ts")) + ci * F.lit(_MONTH_US)
            ),
        )
    return c


def stage(k: int, mode: str, src: str = SRC) -> str:
    tag = "" if src == SRC else f"_{os.path.basename(src.rstrip('/'))}"
    out = f"/tmp/oddsetl_sf1_{mode.replace('-', '')}_k{k}{tag}"
    if all(os.path.exists(f"{out}/{t}.parquet") for t in TABLES):
        return out
    spark = get_spark("stage-sf1")
    spark.sparkContext.setLogLevel("ERROR")
    os.makedirs(out, exist_ok=True)
    for t in TABLES:
        path = f"{src}/{t}.parquet"
        if t in FACT_SHIFT and k > 1:
            ci = F.col("copy_i")
            # repartition the base BEFORE the fan-out: the single-file
            # fixtures hold one parquet row group, so scan-split knobs
            # (maxPartitionBytes) cannot widen them — without the
            # explicit shuffle the whole K-x expansion and encode ran in
            # ONE task (measured: load ~1.3 on 32 cores). The base is
            # small (<= a few hundred MB), so this shuffle is noise next
            # to the K-x encode it parallelizes. The copy index comes
            # from an explode'd sequence — plain codegen, no join.
            df = (
                spark.read.parquet(path)
                .repartition(_N_FILES)
                .withColumn(
                    "copy_i",
                    F.explode(
                        F.sequence(F.lit(0), F.lit(k - 1)).cast("array<long>")
                    ),
                )
            )
            for col, span in FACT_SHIFT[t].items():
                df = df.withColumn(col, F.col(col) + ci * F.lit(span))
            if mode == "low-dup":
                df = _mutate(t, df, ci)
            df = df.drop("copy_i")
        else:
            df = spark.read.parquet(path)
        tmp = f"{out}/_tmp_{t}"
        # Write to a tmp dir, drop Spark's _SUCCESS/CRC noise, then
        # rename atomically so the idempotence check above never sees a
        # half-staged table.
        df.write.mode("overwrite").parquet(tmp)
        for extra in os.listdir(tmp):
            if not extra.endswith(".parquet"):
                os.remove(os.path.join(tmp, extra))
        final = f"{out}/{t}.parquet"
        if os.path.isdir(final):
            shutil.rmtree(final)
        elif os.path.exists(final):
            os.remove(final)  # older flat single-file layout
        os.replace(tmp, final)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    mode = sys.argv[2] if len(sys.argv) > 2 else "low-dup"
    assert mode in ("standard", "low-dup"), mode
    src = sys.argv[3] if len(sys.argv) > 3 else SRC
    print(stage(k, mode, src))


if __name__ == "__main__":
    main()
