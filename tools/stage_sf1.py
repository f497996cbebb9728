"""Stage a ~sf1 (K x sf0.1) differential-sweep dataset as FLAT parquet
files (one file per table, so DuckDB's read_parquet sees them exactly
like the driver's fixture layout).

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
    No RNG anywhere — both engines see identical bytes.

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


def _mutate(t: str, c, i: int):
    """Low-dup content mutation for copy i (i=0 is the verbatim base)."""
    if i == 0:
        return c
    if t == "documents":
        c = c.withColumn(
            "text",
            F.array_join(
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit(str(i))),
                ),
                " ",
            ),
        )
        return c.withColumn("n_chars", F.length("text").cast("long"))
    if t == "embeddings":
        r = i % _D
        if r:
            c = c.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), r + 1, _D - r),
                    F.slice(F.col("embedding"), 1, r),
                ),
            )
        return c
    if t == "events":
        return c.withColumn(
            "ts",
            F.timestamp_micros(F.unix_micros(F.col("ts")) + F.lit(i * _MONTH_US)),
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
        base = spark.read.parquet(f"{src}/{t}.parquet")
        if t in FACT_SHIFT and k > 1:
            copies = []
            for i in range(k):
                c = base
                for col, span in FACT_SHIFT[t].items():
                    c = c.withColumn(col, F.col(col) + F.lit(i * span))
                if mode == "low-dup":
                    c = _mutate(t, c, i)
                copies.append(c)
            df = copies[0]
            for c in copies[1:]:
                df = df.unionByName(c)
        else:
            df = base
        tmp = f"{out}/_tmp_{t}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = [f for f in os.listdir(tmp) if f.endswith(".parquet")]
        assert len(part) == 1, part
        os.replace(os.path.join(tmp, part[0]), f"{out}/{t}.parquet")
        shutil.rmtree(tmp)
    return out


def main() -> None:
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    mode = sys.argv[2] if len(sys.argv) > 2 else "low-dup"
    assert mode in ("standard", "low-dup"), mode
    src = sys.argv[3] if len(sys.argv) > 3 else SRC
    print(stage(k, mode, src))


if __name__ == "__main__":
    main()
