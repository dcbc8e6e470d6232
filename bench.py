"""Driver bench harness: runs every queries() entry at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is materialized via the `noop` sink — full computation of
every column, no driver-side collect bottleneck in the measurement.

Per-query variance on this box is ±2-4x, so each query runs in
$SPARK_GRAFT_BENCH_RUNS interleaved passes (default 3): ``queries``
carries the MEDIAN, ``queries_min`` the best run, and ``value`` is the
sum of medians — round-over-round regressions are detectable instead
of drowned in single-run noise.

Contention robustness (r14 VERDICT item 1): the r14 driver medians
read +14 % while every uncontended signal showed −16 %, purely from
co-tenant host load. Each pass is therefore BRACKETED by a fixed
trivial sentinel job; a pass whose leading or trailing sentinel runs
> $SPARK_GRAFT_BENCH_SENTINEL_FACTOR (default 2.0) × the session-best
sentinel is marked CONTENDED and a replacement pass runs (bounded:
at most $SPARK_GRAFT_BENCH_MAX_EXTRA extra passes, default 3).
Medians are computed over clean passes when ≥2 exist; otherwise the
2nd-lowest across all runs is reported (robust to one-sided
inflation). Sentinel timings and the clean/total pass counts land in
BENCH_DETAIL.json so a contended session is adjudicable after the
fact.
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
# contention guard knobs (see module docstring)
MAX_EXTRA_PASSES = max(
    0, int(os.environ.get("SPARK_GRAFT_BENCH_MAX_EXTRA", "3"))
)
SENTINEL_FACTOR = float(
    os.environ.get("SPARK_GRAFT_BENCH_SENTINEL_FACTOR", "2.0")
)
# whole-pass self-sentinel (r16): a pass whose TOTAL runtime exceeds
# this factor × the best pass's total is contended even when its
# bracketing sentinels read clean — the CPU-only sentinel job is blind
# to I/O/page-cache contention (observed: an I/O storm inflated a
# pass's total 1.5× — shortest_chains alone 1.9 → 26.9 s — while all
# four sentinels stayed within 1.25× of the session best). The
# workload itself is the only probe that touches the artifact files,
# so its own sum is the I/O sentinel.
#
# Calibration (r17, acting on the r16 note + VERDICT item 2): at
# sf ≥ 0.1 clean passes reproduce within ~1.1× of each other (two
# independent clean runs agreed to 0.7 %), yet r16's 1.4 gate
# admitted a 1.31× contended pass that moved the driver total ~5 %
# off the clean run — so the sf ≥ 0.1 default tightens to 1.25.
# Below sf0.1 fixed overhead dominates and the NATURAL pass-over-pass
# decay measured 1.38× at sf0.01, so the small-scale default stays
# wide (1.6) — a tight gate there would routinely reject legitimate
# passes, burn MAX_EXTRA_PASSES, and silently degrade the stat to
# second_lowest_of_all_runs. Override either with
# SPARK_GRAFT_BENCH_PASS_SUM_FACTOR.


def _sf_from_dir(sf_dir: str) -> float:
    name = Path(sf_dir).name  # e.g. sf0.1
    try:
        return float(name.removeprefix("sf"))
    except ValueError:
        return -1.0


def _default_pass_sum_factor(sf: float) -> float:
    return 1.25 if sf >= 0.1 else 1.6


_PASS_SUM_ENV = os.environ.get("SPARK_GRAFT_BENCH_PASS_SUM_FACTOR")
PASS_SUM_FACTOR = (
    float(_PASS_SUM_ENV)
    if _PASS_SUM_ENV is not None
    else _default_pass_sum_factor(_sf_from_dir(SF_DIR))
)


def sentinel_seconds(spark) -> float:
    """One fixed trivial job — a 8M-row modulo groupBy through the
    noop sink — timed as a pure host-load probe. Constant work, no
    data dependence, small enough (~0.3-1 s warm) that bracketing
    every pass costs ~1 % of a pass."""
    from pyspark.sql import functions as F

    t0 = time.time()
    (
        spark.range(8_000_000)
        .select((F.col("id") % 97).alias("k"))
        .groupBy("k")
        .count()
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return time.time() - t0


def classify_passes(
    sentinels: list[float], brackets: list[tuple[int, int]],
    factor: float,
    pass_sums: list[float] | None = None,
    sum_factor: float | None = None,
    noted: set[int] | None = None,
) -> list[bool]:
    """True per pass iff BOTH bracketing sentinels are within
    ``factor`` × the session-best sentinel — i.e. the host was quiet
    when the pass started and when it ended — AND (when ``pass_sums``
    is given) the pass's total runtime is within ``sum_factor`` × the
    best pass's total (the whole-pass self-sentinel: catches I/O and
    page-cache contention the CPU sentinel job never touches).

    ``noted``: optional caller-held set of pass indexes whose sum-only
    rejection was already reported — the bench loop reclassifies after
    every pass, and without it the same rejection prints once per
    remaining loop iteration."""
    best = min(sentinels)
    clean = [
        sentinels[lo] <= factor * best and sentinels[hi] <= factor * best
        for lo, hi in brackets
    ]
    if pass_sums:
        # explicit None check: `or` would silently swap an explicit
        # sum_factor of 0/0.0 for the module default (r17 ADVICE)
        sf_eff = PASS_SUM_FACTOR if sum_factor is None else sum_factor
        best_sum = min(pass_sums)
        out = []
        for i, (ok, s) in enumerate(zip(clean, pass_sums)):
            sum_ok = s <= sf_eff * best_sum
            if ok and not sum_ok and (noted is None or i not in noted):
                if noted is not None:
                    noted.add(i)
                # sentinel-clean but sum-rejected: at small scales the
                # natural pass-1 decay (~1.38× at sf0.01) can trip a
                # tight factor, so make the sum-only rejection visible
                # for post-hoc adjudication instead of silently
                # burning a replacement pass
                print(
                    f"bench: pass {i + 1} rejected by whole-pass "
                    f"self-sentinel alone (sum {s:.1f}s = "
                    f"{s / best_sum:.2f}x best {best_sum:.1f}s, "
                    f"factor {sf_eff})",
                    file=sys.stderr,
                )
            out.append(ok and sum_ok)
        clean = out
    return clean


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
    names = sorted(qs)
    # warm the sentinel's own codegen path once, then open the
    # sentinel series — its running MIN is the session-quiet baseline
    sentinel_seconds(spark)
    # untimed per-entry warmup pass: execute every query once before
    # any timed run so codegen/JIT compilation and broadcast/shuffle
    # warmup land here, not in timed pass 1 — without it, clean-pass
    # med/min spreads of 2-3× persisted on first-execution-heavy
    # entries (hybrid_adaptive, fuzzy_decontam; r15 VERDICT item 3),
    # which three timed runs cannot average away
    for name in names:
        qs[name](spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
    sentinels = [sentinel_seconds(spark)]
    # interleave whole passes (not per-query repeats) so run i of every
    # query sees the same JVM/cache warmth profile; each pass is
    # bracketed by sentinels (trailing sentinel i == leading i+1)
    pass_times: list[dict[str, float]] = []
    sum_reject_noted: set[int] = set()  # one stderr note per pass
    brackets: list[tuple[int, int]] = []
    while True:
        lead = len(sentinels) - 1
        times: dict[str, float] = {}
        for name in names:
            fn = qs[name]
            t0 = time.time()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            times[name] = time.time() - t0
        sentinels.append(sentinel_seconds(spark))
        pass_times.append(times)
        brackets.append((lead, len(sentinels) - 1))
        # classify against ALL sentinels (and pass totals) so far: a
        # later, faster sentinel/pass lowers the session-best baseline
        # and retroactively reclassifies earlier passes — sum(clean)
        # here is always the CURRENT count, and it is the value used
        # everywhere below (no post-loop recompute, so the break
        # condition and the reported clean_passes can never disagree).
        # clean_passes may still end < N_RUNS when the
        # MAX_EXTRA_PASSES cap trips first; the stat-selection
        # fallback below handles that explicitly.
        pass_sums = [sum(p.values()) for p in pass_times]
        clean = classify_passes(
            sentinels, brackets, SENTINEL_FACTOR, pass_sums,
            noted=sum_reject_noted,
        )
        if sum(clean) >= N_RUNS or len(pass_times) >= N_RUNS + MAX_EXTRA_PASSES:
            break
    runs = {n: [p[n] for p in pass_times] for n in names}
    clean_runs = {
        n: [p[n] for p, ok in zip(pass_times, clean) if ok] for n in names
    }
    n_clean = sum(clean)
    if n_clean >= min(2, N_RUNS):
        stat = "median_of_clean_passes"
        medians = {
            n: round(statistics.median(ts), 3)
            for n, ts in clean_runs.items()
        }
    else:
        # the whole session was loaded (or a single clean pass):
        # 2nd-lowest across every run resists one-sided inflation
        # without degenerating to best-case-only
        stat = "second_lowest_of_all_runs"
        medians = {
            n: round(sorted(ts)[1 if len(ts) > 1 else 0], 3)
            for n, ts in runs.items()
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
        # contention adjudication record (r14 VERDICT item 1)
        "stat": stat,
        # r16: one untimed per-entry warmup pass precedes the timed
        # passes — medians measure warm serving, not codegen warmup
        "warmup_pass": True,
        "sentinels": [round(s, 3) for s in sentinels],
        "pass_sums": [round(s, 3) for s in pass_sums],
        "pass_sum_factor": PASS_SUM_FACTOR,
        "sentinel_factor": SENTINEL_FACTOR,
        "clean_passes": n_clean,
        "total_passes": len(pass_times),
        "queries_all_runs": {
            n: [round(t, 3) for t in ts] for n, ts in runs.items()
        },
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
    # r17 VERDICT item 2: the driver benches at several core counts and
    # each run overwrote BENCH_DETAIL.json (the c8 detail clobbered the
    # c32 one) — persist a per-core-count copy under a distinct name so
    # every run's detail survives. The stdout contract is unchanged
    # (same line, same "detail" pointer).
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "").strip()
    if cpus:
        (detail_path.parent / f"BENCH_DETAIL_c{cpus}.json").write_text(
            json.dumps(detail, indent=1) + "\n"
        )
    print(render_stdout_line(medians, total, sf, len(pass_times)), flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
