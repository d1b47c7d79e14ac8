"""Refresh BENCH_REF.json — the bench's quiet-machine backstop reference —
from the per-query numbers of a completed bench run (BENCH_DETAIL.json).

This is a DELIBERATE, human-invoked step (round-9 contract, VERDICT r8 #2):
a bench run never mutates the reference itself, so the committed reference
cannot ratchet to best-ever numbers or absorb a run at a different core
count. The reference carries the sf and worker-core count it was taken at;
bench.py only consults it when both match the current run.

Usage:  python scripts/update_bench_ref.py  (run from the repo root after a
        verified-quiet bench run; inspect load_hint in BENCH_DETAIL first)
"""

import json
import os
import sys

root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
with open(os.path.join(root, "BENCH_DETAIL.json")) as fh:
    detail = json.load(fh)

load = detail.get("load_hint") or {}
start = load.get("loadavg_1m_start")
if start is not None and start > 2.0 and "--force" not in sys.argv:
    sys.exit(
        f"refusing: source run started at loadavg {start} (> 2.0) — "
        "a contended run makes a bad quiet reference (--force to override)"
    )

ref = {
    "comment": (
        "Quiet-machine per-query reference for bench.py's contention "
        "backstop. Written ONLY by scripts/update_bench_ref.py from a "
        "completed run's BENCH_DETAIL.json — never by a bench run itself."
    ),
    "sf": detail.get("sf"),
    "cpus": detail.get("cpus"),
    "load_hint": load,
    "queries": {
        name: info["t"] for name, info in (detail.get("queries") or {}).items()
    },
}
out = os.path.join(root, "BENCH_REF.json")
with open(out, "w") as fh:
    json.dump(ref, fh, indent=1)
print(f"wrote {out}: {len(ref['queries'])} queries, sf={ref['sf']}, cpus={ref['cpus']}")
