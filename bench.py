"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Timing materializes every query with the noop sink (full execution, no
collect/driver cost) after a JVM/table warm-up pass — the analog of the
reference's decompression-speed harness warm-up
(tools/conversion/decompression-speed.cpp:91-239).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from btrblocks_spark.queries import all_queries
from btrblocks_spark.session import get_spark

# Headline set: one per operator family (scan+agg, star join, window, rollup,
# time-series, run-detection). Pipeline/format additions register here as
# they land.
HEADLINE = [
    "q1_pricing_summary",
    "join_multi",
    "join_broadcast",
    "window_rank",
    "agg_rollup",
    "events_time_rollup",
    "rle_runs",
    "dedup_exact",
    "dedup_minhash_lsh",
    "text_quality",
    "ann_cosine_topk",
]


def materialize(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="btrblocks-bench")
    spark.sparkContext.setLogLevel("ERROR")

    queries = all_queries()
    names = [n for n in HEADLINE if n in queries]

    # warm-up: JVM, file listing, parquet footers
    materialize(queries[names[0]](spark, sf_dir))

    timings: dict[str, float] = {}
    for name in names:
        t0 = time.perf_counter()
        materialize(queries[name](spark, sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
