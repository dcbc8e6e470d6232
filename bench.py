"""Driver bench harness: runs every queries() entry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via the `noop` sink — full computation of
every column, no driver-side collect bottleneck in the measurement.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod
from rag_database_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name  # e.g. sf0.1
    try:
        return float(name.removeprefix("sf"))
    except ValueError:
        return -1.0


def main() -> int:
    spark = get_spark("bench")
    # warmup: materialize the persisted BM25 index (S7) so timings
    # measure query paths, not one-time index construction
    entrymod.prepare(spark, SF_DIR)
    qs = entrymod.queries()
    timings: dict[str, float] = {}
    for name, fn in sorted(qs.items()):
        t0 = time.time()
        fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        ),
        flush=True,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
