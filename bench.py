"""Driver bench harness: runs every queries() entry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via the `noop` sink — full computation of
every column, no driver-side collect bottleneck in the measurement.

Per-query variance on this box is ±2-4x, so each query runs
$SPARK_GRAFT_BENCH_RUNS times (default 3): ``queries`` carries the
MEDIAN, ``queries_min`` the best run, and ``value`` is the sum of
medians — round-over-round regressions are detectable instead of
drowned in single-run noise.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import __spark_entry__ as entrymod
from rag_database_spark.session import get_spark

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_RUNS = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name  # e.g. sf0.1
    try:
        return float(name.removeprefix("sf"))
    except ValueError:
        return -1.0


STDOUT_BUDGET = 1950  # driver keeps the LAST 2000 chars; newline margin


def render_stdout_line(medians: dict[str, float], total: float,
                       sf: float, n_runs: int) -> str:
    """Render the single driver-parsed JSON line, guaranteed to fit the
    driver's 2000-char stdout window whatever the entry count:

    1. full dict at 3/2/1 decimal places;
    2. pack the SLOWEST entries that fit, with ``queries_omitted``
       making the truncation explicit;
    3. last resort (pathological name lengths): headline numbers only,
       empty ``queries`` dict + detail pointer — still schema-complete
       and parseable.
    """
    for dp in (3, 2, 1):
        line = json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": {n: round(v, dp) for n, v in medians.items()},
                "n_runs": n_runs,
                "sf": sf,
                "detail": "BENCH_DETAIL.json",
            },
            # compact separators: ~2 chars saved per query keeps the
            # 82-entry dict inside the window where the default
            # rendering (1994 chars at dp=1) already overflowed
            separators=(",", ":"),
        )
        if len(line) <= STDOUT_BUDGET:
            return line

    # partial fallback: the full dict no longer fits even at dp=1
    # (first hit at 91 entries: 1965 chars), so pack the SLOWEST
    # entries that fit — an informative subset beats an empty dict;
    # the complete dict lives in BENCH_DETAIL.json.
    def _render(kept: dict) -> str:
        return json.dumps(
            {
                "metric": "total_query_seconds",
                "value": total,
                "unit": "sec",
                "queries": kept,
                "queries_omitted": len(medians) - len(kept),
                "n_runs": n_runs,
                "sf": sf,
                "detail": "BENCH_DETAIL.json",
            },
            separators=(",", ":"),
        )

    kept: dict[str, float] = {}
    for name, v in sorted(medians.items(), key=lambda kv: -kv[1]):
        kept[name] = round(v, 1)
        if len(_render(kept)) > STDOUT_BUDGET:
            del kept[name]  # overflowed; shorter names may still fit
    line = _render(kept)
    if len(line) <= STDOUT_BUDGET:
        return line
    # absolute floor: even the scaffolding overflowed (only possible
    # with absurd entry-count-to-budget ratios) — headline only
    return _render({})


def main() -> int:
    spark = get_spark("bench")
    # warmup: materialize the persisted BM25 index (S7) so timings
    # measure query paths, not one-time index construction
    entrymod.prepare(spark, SF_DIR)
    qs = entrymod.queries()
    runs: dict[str, list[float]] = {name: [] for name in qs}
    # interleave whole passes (not per-query repeats) so run i of every
    # query sees the same JVM/cache warmth profile
    for _ in range(N_RUNS):
        for name, fn in sorted(qs.items()):
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            runs[name].append(time.time() - t0)
    medians = {
        name: round(statistics.median(ts), 3) for name, ts in runs.items()
    }
    mins = {name: round(min(ts), 3) for name, ts in runs.items()}
    total = round(sum(medians.values()), 3)
    sf = _sf_from_dir(SF_DIR)
    # Full per-query detail (median + min, 3dp) goes to a sidecar file:
    # the driver keeps only the LAST 2000 chars of stdout and parses the
    # final line, so an unbounded per-query dict on stdout gets its head
    # truncated and the parse fails (that is exactly what nulled rounds
    # 3-4's parsed blob once the query count passed ~50).
    detail = {
        "metric": "total_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": medians,
        "queries_min": mins,
        "n_runs": N_RUNS,
        "sf": sf,
    }
    # embed the latest scale-probe results (tools/scale_probe.py) so
    # the per-round detail carries per-query scaling exponents
    scaling_path = Path(__file__).resolve().parent / "SCALING.json"
    if scaling_path.exists():
        try:
            detail["scaling"] = json.loads(scaling_path.read_text())
        except (OSError, json.JSONDecodeError):
            pass
    detail_path = Path(__file__).resolve().parent / "BENCH_DETAIL.json"
    detail_path.write_text(json.dumps(detail, indent=1) + "\n")
    print(render_stdout_line(medians, total, sf, N_RUNS), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
