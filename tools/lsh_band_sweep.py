"""LSH band-parameter sweep: recall vs candidate cost across (bands x rows).

For each (n_bands, rows_per_band) config, measures against the exact
inverted-index Jaccard pairs (dedup_ngram_jaccard's output, the ground
truth the production 16x4 config is recall-asserted against in tests):

- recall:      |LSH-refined pairs ∩ exact pairs| / |exact pairs|
- candidates:  pre-refine candidate pair count (the work the refine pays)
- sig cost:    n_bands * rows_per_band hashes per doc (map-side work)

The banding S-curve: P[candidate] = 1 - (1 - s^r)^b for Jaccard s, so at
fixed signature budget b*r, more bands (smaller r) push the threshold
s* ~ (1/b)^(1/r) DOWN — higher recall, more junk candidates. The sweep
makes that trade measurable at any SF instead of folklore.

Usage: python tools/lsh_band_sweep.py [sf_dir]   (default sf0.01)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oddsetl_spark import registry  # noqa: E402
from oddsetl_spark.operators.llm_dedup import minhash_lsh_pairs  # noqa: E402
from oddsetl_spark.session import get_spark  # noqa: E402

CONFIGS = [(8, 8), (16, 4), (32, 2), (64, 1)]  # fixed 64-signature budget


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark("lsh-band-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    exact = {
        (r["doc_a"], r["doc_b"])
        for r in registry.get("dedup_ngram_jaccard").fn(spark, sf_dir).collect()
    }
    rows = []
    for n_bands, rows_per_band in CONFIGS:
        t0 = time.time()
        found = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_lsh_pairs(
                spark, sf_dir, n_bands, rows_per_band
            ).collect()
        }
        n_cand = minhash_lsh_pairs(
            spark, sf_dir, n_bands, rows_per_band, candidates_only=True
        ).count()
        s_star = (1.0 / n_bands) ** (1.0 / rows_per_band)
        rows.append(
            {
                "bands": n_bands,
                "rows": rows_per_band,
                "s_threshold": round(s_star, 3),
                "recall": round(len(found & exact) / max(len(exact), 1), 4),
                "candidates": n_cand,
                "refined_pairs": len(found),
                "sec": round(time.time() - t0, 2),
            }
        )
        print(json.dumps(rows[-1]), flush=True)
    print(
        json.dumps(
            {"sf_dir": sf_dir, "exact_pairs": len(exact), "sweep": rows}
        )
    )


if __name__ == "__main__":
    main()
