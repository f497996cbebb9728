"""Interleaved A/B bench protocol (r10 verdict item 1).

Separates environment noise from code/config regressions: each (arm,
iteration) runs in a FRESH child process ([[bench-timing-discipline]]:
one long-lived JVM contaminates iterative rows), arms are interleaved
A,B,A,B,... so slow machine phases hit both arms equally, and the
1-minute loadavg is recorded immediately before every child so a
contended run is visible in the record instead of silently polluting a
median.

Usage:
  python tools/bench_ab.py --sf-dir /root/testdata/sf0.1 \
      --queries agg_groupby_multi,join3_topk_revenue \
      --arm base= --arm w16=ODDSETL_SHUFFLE_PARTITIONS:16 \
      --iters 5 [--exec-only]

Each arm is `label=ENV:VAL,ENV2:VAL2` (empty spec = inherited env).
Prints ONE JSON line: per-arm per-query medians across iterations, the
per-iteration raw times, and the loadavg series.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _child() -> None:
    """Child mode: time the requested queries once (warm-up + median-of-3
    warm, same convention as bench.py) and print one JSON line. AB_REPO
    selects WHICH checkout's package the child imports — that is what
    makes old-code-vs-new-code arms possible (point it at a git worktree
    of the old commit)."""
    sys.path.insert(0, os.environ.get("AB_REPO", REPO))
    import oddsetl_spark  # noqa: F401 — populates registry
    from oddsetl_spark import registry
    from oddsetl_spark.session import get_spark

    sf_dir = os.environ["AB_SF_DIR"]
    names = os.environ["AB_QUERIES"].split(",")
    spark = get_spark("oddsetl-bench-ab")
    available = registry.all_queries()
    times: dict[str, float] = {}
    for name in names:
        fn = available[name].fn
        if os.environ.get("AB_COLD") == "1":
            # One cold run, no warm-up — the bench.py SF10_COLD1
            # convention for queries that re-stage their whole input
            # per call (stream_neardup_*): "warm" never applies, and
            # warm-up + median-of-3 would 4x a multi-minute row.
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            times[name] = round(time.perf_counter() - t0, 4)
            continue
        fn(spark, sf_dir).collect()  # warm-up: JIT, code cache, listing
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, sf_dir).collect()
            runs.append(time.perf_counter() - t0)
        times[name] = round(sorted(runs)[1], 4)
    times["_shuffle_partitions"] = int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )
    print(json.dumps(times))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", required=True)
    ap.add_argument("--queries", required=True)
    ap.add_argument(
        "--arm",
        action="append",
        required=True,
        help="label=ENV:VAL,ENV2:VAL2 (empty spec after = is allowed)",
    )
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--timeout", type=int, default=1800)
    ap.add_argument(
        "--cold",
        action="store_true",
        help="one cold run per child, no warm-up (re-staging queries)",
    )
    args = ap.parse_args()

    arms: list[tuple[str, dict[str, str]]] = []
    for spec in args.arm:
        label, _, envspec = spec.partition("=")
        env = {}
        for pair in filter(None, envspec.split(",")):
            k, _, v = pair.partition(":")
            env[k] = v
        arms.append((label, env))

    raw: dict[str, list[dict]] = {label: [] for label, _ in arms}
    loads: dict[str, list[float]] = {label: [] for label, _ in arms}
    qnames = args.queries.split(",")
    for i in range(args.iters):
        # Interleaved, with arm ORDER alternating per iteration (A,B /
        # B,A — r11 ADVICE): a fixed order biases arm A with every
        # order-correlated effect (page-cache warm-up, background phases
        # that decay within an iteration); alternating cancels them in
        # the medians.
        order = arms if i % 2 == 0 else list(reversed(arms))
        for label, env in order:
            loads[label].append(round(os.getloadavg()[0], 2))
            child_env = dict(
                os.environ,
                AB_CHILD="1",
                AB_SF_DIR=args.sf_dir,
                AB_QUERIES=args.queries,
                AB_COLD="1" if args.cold else "0",
                **env,
            )
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__)],
                capture_output=True,
                text=True,
                env=child_env,
                timeout=args.timeout,
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"arm {label} iter {i} rc={proc.returncode}: "
                    f"{proc.stderr[-400:]}"
                )
            raw[label].append(json.loads(proc.stdout.strip().splitlines()[-1]))
            print(
                f"# iter {i} arm {label}: "
                + json.dumps(raw[label][-1]),
                file=sys.stderr,
            )

    def med(vals: list[float]) -> float:
        s = sorted(vals)
        return round(s[len(s) // 2], 4)

    summary = {}
    for label, _ in arms:
        per_q = {
            q: med([r[q] for r in raw[label]])
            for q in qnames
        }
        summary[label] = {
            "median": per_q,
            "sum": round(sum(per_q.values()), 4),
            "shuffle_partitions": raw[label][0]["_shuffle_partitions"],
            "loadavg_before": loads[label],
        }
    print(
        json.dumps(
            {
                "protocol": "interleaved fresh-process A/B, "
                f"median-of-3 warm per child, {args.iters} iters",
                "sf_dir": args.sf_dir,
                "arms": summary,
                "raw": raw,
            }
        )
    )


if __name__ == "__main__":
    if os.environ.get("AB_CHILD") == "1":
        _child()
    else:
        main()
