"""Dev loop: run every registered query against its DuckDB oracle.

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
Strict bit-exact compare (stronger than the driver's hash check).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from btrblocks_spark.oracle import compare
from btrblocks_spark.queries import all_oracles, all_queries
from btrblocks_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    sf_dir = args[0] if args and args[0].startswith("/") else "/root/testdata/sf0.001"
    only = [a for a in args if not a.startswith("/")]

    queries = all_queries()
    oracles = all_oracles()
    spark = get_spark(
        cpus=int(os.environ.get("ORACLE_CPUS", "8")),
        shuffle_partitions=int(os.environ.get("ORACLE_SHUFFLE", "8")),
    )
    spark.sparkContext.setLogLevel("ERROR")

    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            if name in oracles:
                ok, msg = compare(df, oracles[name], sf_dir)
            else:
                n = df.count()
                ok, msg = True, f"rows-only: {n} rows"
        except Exception as e:  # noqa: BLE001
            ok, msg = False, f"EXCEPTION: {type(e).__name__}: {e}"
        dt = time.time() - t0
        status = "PASS" if ok else "FAIL"
        print(f"[{status}] {name:32s} {dt:6.2f}s  {msg}")
        if not ok:
            failed.append(name)

    print(f"\n{len(queries) - len(failed)}/{len(queries)} passed")
    if failed:
        print("failed:", ", ".join(failed))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
