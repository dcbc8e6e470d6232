"""Decompose per-entry bench time into DataFrame build (Python +
analysis), planning (optimize + initial physical plan), and execution
(noop sink) — guide §1: find out WHERE each second goes before touching
the operator. Planning here is the driver-side single-threaded cost
that the bench pays once per query per pass; with AQE on, re-planning
during execution is charged to exec.

Usage: python tools/profile_entries.py [entry ...]   (default: all)
Env:   SPARK_GRAFT_SF_DIR, PROFILE_REPS (default 3, best-of reported)
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import __spark_entry__ as entrymod  # noqa: E402
from rag_database_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPS = max(1, int(os.environ.get("PROFILE_REPS", "3")))


def main(argv: list[str]) -> int:
    spark = get_spark("profile_entries")
    entrymod.prepare(spark, SF_DIR)
    qs = entrymod.queries()
    names = argv or sorted(qs)
    # untimed warmup (codegen, broadcast, page cache) — mirrors bench.py
    for n in names:
        qs[n](spark, SF_DIR).write.format("noop").mode("overwrite").save()
    out: dict[str, dict[str, float]] = {}
    for n in names:
        spark.sparkContext.setJobDescription(f"profile:{n}")
        rows = []
        for _ in range(REPS):
            t0 = time.time()
            df = qs[n](spark, SF_DIR)
            t1 = time.time()
            df._jdf.queryExecution().executedPlan()
            t2 = time.time()
            df.write.format("noop").mode("overwrite").save()
            t3 = time.time()
            rows.append((t1 - t0, t2 - t1, t3 - t2))
        best = min(rows, key=sum)
        out[n] = {
            "build": round(best[0], 3),
            "plan": round(best[1], 3),
            "exec": round(best[2], 3),
            "total": round(sum(best), 3),
        }
        print(f"{n:28s} {out[n]}", flush=True)
    spark.sparkContext.setJobDescription(None)
    agg = {
        k: round(sum(v[k] for v in out.values()), 3)
        for k in ("build", "plan", "exec", "total")
    }
    print("TOTALS", agg)
    Path(REPO / "PROFILE.json").write_text(
        json.dumps({"entries": out, "totals": agg, "sf_dir": SF_DIR}, indent=1)
        + "\n"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
