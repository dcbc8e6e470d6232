"""The driver keeps only the last 2000 chars of bench stdout and
parses the final line — the rendering must stay parseable and under
budget at ANY entry count (the contract that nulled rounds 3-4's
parsed blob when the query count passed ~50)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import STDOUT_BUDGET, render_stdout_line


def _check(line: str, n_entries: int):
    assert len(line) <= STDOUT_BUDGET
    blob = json.loads(line)
    assert blob["metric"] == "total_query_seconds"
    assert blob["unit"] == "sec"
    assert isinstance(blob["queries"], dict)
    omitted = blob.get("queries_omitted", 0)
    assert len(blob["queries"]) + omitted == n_entries
    return blob


def test_current_entry_count_fits():
    medians = {f"entry_name_{i:03d}": 1.234 for i in range(91)}
    blob = _check(render_stdout_line(medians, 112.3, 0.1, 3), 91)
    # at today's scale the packed form must carry a non-empty subset
    assert len(blob["queries"]) > 50


def test_120_entry_dry_run_emits_parseable_line():
    medians = {f"some_longer_operator_name_{i:03d}": i * 0.137 for i in range(120)}
    blob = _check(render_stdout_line(medians, 987.6, 0.1, 3), 120)
    assert blob["value"] == 987.6
    # the slowest entries are the ones kept
    if blob.get("queries_omitted"):
        kept_min = min(blob["queries"].values())
        dropped = set(medians) - set(blob["queries"])
        assert all(medians[n] <= kept_min + 0.1 for n in dropped)


def test_pathological_names_fall_back_to_headline_only():
    # names so long not even one fits: the absolute-floor fallback
    # must still emit a schema-complete parseable line
    medians = {"x" * 3000 + str(i): 1.0 for i in range(5)}
    blob = _check(render_stdout_line(medians, 5.0, 0.01, 1), 5)
    assert blob["queries"] == {}
    assert blob["queries_omitted"] == 5


def test_classify_passes_brackets_contention():
    """A pass is clean only when BOTH bracketing sentinels are within
    factor × the session best — contention arriving mid-pass (slow
    trailing sentinel) or pre-pass (slow leading) marks it."""
    from bench import classify_passes

    # sentinels: s0 quiet (best), s1 quiet, s2 loaded, s3 quiet
    sentinels = [0.5, 0.6, 2.0, 0.55]
    brackets = [(0, 1), (1, 2), (2, 3)]
    clean = classify_passes(sentinels, brackets, 2.0)
    # pass 0: 0.5/0.6 both <= 1.0 -> clean
    # pass 1: trailing 2.0 > 1.0 -> contended
    # pass 2: leading 2.0 > 1.0 -> contended
    assert clean == [True, False, False]

    # a uniformly loaded session self-normalizes: best is itself slow,
    # every pass reads clean (nothing to discard against)
    assert classify_passes([5.0, 5.5, 5.2], [(0, 1), (1, 2)], 2.0) == [
        True,
        True,
    ]


def test_classify_passes_whole_pass_self_sentinel():
    """r16: a pass whose TOTAL runtime blows past sum_factor x the
    best pass is contended even when its bracketing sentinels are
    clean — the CPU sentinel is blind to I/O/page-cache contention,
    so the workload's own sum is the I/O probe."""
    from bench import classify_passes

    sentinels = [0.5, 0.55, 0.6, 0.5]
    brackets = [(0, 1), (1, 2), (2, 3)]
    # sentinels all clean; pass 0 took 1.6x the best pass
    clean = classify_passes(
        sentinels, brackets, 2.0, pass_sums=[160.0, 110.0, 100.0],
        sum_factor=1.4,
    )
    assert clean == [False, True, True]
    # uniformly slow passes self-normalize (best is itself slow)
    assert classify_passes(
        sentinels, brackets, 2.0, pass_sums=[150.0, 155.0, 149.0],
        sum_factor=1.4,
    ) == [True, True, True]
    # and a sentinel-contended pass stays contended regardless of sums
    assert classify_passes(
        [0.5, 2.0, 0.5, 0.5], brackets, 2.0,
        pass_sums=[100.0, 100.0, 100.0], sum_factor=1.4,
    ) == [False, False, True]


def test_classify_passes_explicit_zero_sum_factor_applied(capsys):
    """r17 ADVICE: an explicit sum_factor of 0.0 must be APPLIED (it
    rejects every pass, sums being positive), not silently swapped
    for the module default by an `or`-falsy fallback."""
    from bench import classify_passes

    sentinels = [0.5, 0.55, 0.6, 0.5]
    brackets = [(0, 1), (1, 2), (2, 3)]
    assert classify_passes(
        sentinels, brackets, 2.0, pass_sums=[100.0, 101.0, 99.0],
        sum_factor=0.0,
    ) == [False, False, False]


def test_classify_passes_sum_only_rejection_noted(capsys):
    """A sentinel-clean pass rejected solely by the whole-pass
    self-sentinel emits a stderr note (small scales have a natural
    pass-1 decay that can trip a tight factor; the rejection must be
    adjudicable, not silent)."""
    from bench import classify_passes

    sentinels = [0.5, 0.55, 0.6, 0.5]
    brackets = [(0, 1), (1, 2), (2, 3)]
    clean = classify_passes(
        sentinels, brackets, 2.0, pass_sums=[160.0, 110.0, 100.0],
        sum_factor=1.4,
    )
    assert clean == [False, True, True]
    err = capsys.readouterr().err
    assert "whole-pass self-sentinel" in err and "1.60x" in err
    # sentinel-contended passes are NOT re-noted by the sum check
    classify_passes(
        [0.5, 2.0, 0.5, 0.5], brackets, 2.0,
        pass_sums=[100.0, 100.0, 100.0], sum_factor=1.4,
    )
    assert "self-sentinel alone" not in capsys.readouterr().err


def test_default_pass_sum_factor_scales_with_sf():
    """r17 calibration (VERDICT r16 item 2): tight 1.25 gate at
    sf >= 0.1 (clean passes reproduce within ~1.1x there; r16's 1.4
    admitted a 1.31x contended pass), wide 1.6 below (natural pass
    decay measured 1.38x at sf0.01)."""
    from bench import _default_pass_sum_factor

    assert _default_pass_sum_factor(0.1) == 1.25
    assert _default_pass_sum_factor(1.0) == 1.25
    assert _default_pass_sum_factor(0.01) == 1.6
    assert _default_pass_sum_factor(0.001) == 1.6
    assert _default_pass_sum_factor(-1.0) == 1.6


def test_classify_passes_noted_set_dedupes_rejection_notes(capsys):
    """The bench loop reclassifies after every pass; with a caller-held
    ``noted`` set the same pass's sum-only rejection prints once, not
    once per remaining iteration."""
    from bench import classify_passes

    sentinels = [0.5, 0.55, 0.6, 0.5]
    brackets = [(0, 1), (1, 2), (2, 3)]
    noted: set[int] = set()
    for _ in range(3):
        classify_passes(
            sentinels, brackets, 2.0, pass_sums=[160.0, 110.0, 100.0],
            sum_factor=1.4, noted=noted,
        )
    assert capsys.readouterr().err.count("rejected") == 1
    assert noted == {0}
