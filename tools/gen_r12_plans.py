"""Dump .explain('formatted') for named registered queries into
plans/r12/<query>_<tag>.txt — the per-query before/after plan evidence
for the optimization rounds (one file per query per tag, unlike
tools/gen_plans.py which renders the single PLANS.md digest).

Usage: python tools/gen_r12_plans.py <before|after> [query ...]
       (no query names = the default headline+heavy set)
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)
import oddsetl_spark  # noqa: F401,E402 — populates registry
from oddsetl_spark import registry  # noqa: E402
from oddsetl_spark.session import get_spark  # noqa: E402

DEFAULT = [
    "agg_groupby_multi",
    "join3_topk_revenue",
    "join_broadcast_star",
    "win_topk_per_group",
    "win_sessionize",
    "win_sessionize_stats",
    "sim_cosine_topk",
    "text_token_count",
    "dedup_minhash_det",
    "sim_ann_ivf",
    "sim_lsh_whitened",
    "dedup_components",
    "graph_pagerank",
    "table_stats_skipping",
]

def main() -> None:
    args = sys.argv[1:]
    full_lineage = "--full-lineage" in args
    if full_lineage:
        # Iterative queries end in localCheckpoint(), which truncates the
        # lineage to a Scan ExistingRDD and hides the plan the optimization
        # actually changed.  Neutralize it (explain-only; nothing executes)
        # so the dumped plan shows the real build + iteration subtree.
        args = [a for a in args if a != "--full-lineage"]
        # Spark 4: runtime instances are the classic subclass, which
        # overrides the parent method — patch the class actually used.
        from pyspark.sql.classic.dataframe import DataFrame

        DataFrame.localCheckpoint = (
            lambda self, eager=True, storageLevel=None: self
        )
    tag = args[0]
    names = args[1:] or DEFAULT
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans",
        "r12",
    )
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("r12-plans")
    spark.sparkContext.setLogLevel("ERROR")
    available = registry.all_queries()
    for name in names:
        df = available[name].fn(spark, sf)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} — explain('formatted') at {sf} [{tag}]\n")
            f.write(buf.getvalue())
        print(f"wrote {path}")


if __name__ == "__main__":
    main()
