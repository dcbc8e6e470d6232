"""Per-query scaling probe: run every queries() entry once at the
synthetic sf1 (tools/make_scale_probe.py) and at sf0.1, and record the
scaling exponent of each —

    exponent = log(t_sf1 / t_sf0.1) / log(10)

≈1 is linear in the data, <1 is sublinear (fixed overhead dominates at
this size, or the query touches a fixed-size slice), >1 is the red
flag: work growing faster than data (quadratic candidate sets,
unpruned scans). Results go to SCALING.json; bench.py embeds them in
BENCH_DETAIL.json so every round's detail carries the latest probe.

Times here are single-run (the probe wants decade-level ratios, not
3-run medians), so exponents carry ±0.1-0.2 of noise; read >1.3 as
"audit this plan", not as a precise complexity measurement.
"""

from __future__ import annotations

import json
import math
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from tools.make_scale_probe import build  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from rag_database_spark.session import get_spark  # noqa: E402

SF_SMALL = "/root/testdata/sf0.1"


def time_all(spark, sf_dir: str) -> dict[str, float]:
    entrymod.prepare(spark, sf_dir)
    out: dict[str, float] = {}
    for name, fn in sorted(entrymod.queries().items()):
        t0 = time.time()
        try:
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t0, 3)
        except Exception as exc:  # keep the probe running
            print(f"{name}: FAILED {exc}", file=sys.stderr)
            out[name] = float("nan")
    return out


def main() -> int:
    sf1_dir = str(build())
    spark = get_spark("scale_probe")
    # warm pass at the small sf so JIT/codegen caches are hot before
    # either timed pass
    time_all(spark, SF_SMALL)
    t_small = time_all(spark, SF_SMALL)
    t_big = time_all(spark, sf1_dir)
    scaling = {}
    for name in sorted(t_small):
        ts, tb = t_small[name], t_big.get(name, float("nan"))
        exp = (
            round(math.log(tb / ts) / math.log(10), 2)
            if ts and ts > 0 and tb == tb and tb > 0
            else None
        )
        scaling[name] = {"t_sf0.1": ts, "t_sf1": tb, "exponent": exp}
    blob = {
        "probe": "sf0.1 -> synthetic sf1 (10x rows, tools/make_scale_probe.py)",
        "runs_per_point": 1,
        "queries": scaling,
        "superlinear": sorted(
            n for n, s in scaling.items()
            if s["exponent"] is not None and s["exponent"] > 1.3
            and s["t_sf1"] > 1.0
        ),
    }
    (REPO / "SCALING.json").write_text(json.dumps(blob, indent=1) + "\n")
    print(json.dumps({"superlinear": blob["superlinear"]}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
