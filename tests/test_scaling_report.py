"""Per-query scaling-report mechanics (r11 verdict item 3): scaled
sweeps record per-query wall time and normalize it to the x1 baseline
of the same seed/axis, flagging growth above 1.5x the median ratio —
a super-linear plan completes the parity sweep green, so cost growth
must be its own signal. Pinned at the pure-function level so the x100
run's RESULT-line semantics can't silently drift."""
from __future__ import annotations

import json
import os
import tempfile

from tests.robustness.run_sweep import scaling_report

# improbable seed so the baseline file can't collide with a real sweep
SEED = 99991


def _write_baseline(timings, axis=None):
    tag = f"seed{SEED}_x1" + (f"_{axis}" if axis else "")
    d = os.path.join(tempfile.gettempdir(), "testdata_alt", tag)
    os.makedirs(d, exist_ok=True)
    path = os.path.join(d, "timings.json")
    with open(path, "w") as fh:
        json.dump({"tag": tag, "scale": 1.0, "timings": timings}, fh)
    return path


def test_flags_super_linear_growth():
    # at a x10 sweep, ~linear growers (10x wall) are healthy; the
    # 40x grower is clearly super-linear and must be the only flag
    base = {f"q{i}": 1.0 for i in range(20)}
    base["q_bad"] = 1.0
    now = {f"q{i}": 10.0 for i in range(20)}
    now["q_bad"] = 40.0
    path = _write_baseline(base)
    try:
        rep = scaling_report(now, set(), SEED, 10.0, None)
        assert rep["median"] == 10.0
        assert rep["threshold"] == 15.0  # 1.5x the scale factor
        assert rep["flagged"] == ["q_bad"]
        assert rep["top10"][0] == ("q_bad", 40.0)
        assert len(rep["top10"]) == 10
    finally:
        os.remove(path)


def test_excludes_sampled_path_and_subsecond_noise():
    base = {"q_fast": 0.01, "q_samp": 1.0, "q_a": 1.0, "q_b": 1.0,
            "q_c": 1.0}
    now = {"q_fast": 9.0, "q_samp": 99.0, "q_a": 2.0, "q_b": 2.0,
           "q_c": 2.2}
    path = _write_baseline(base)
    try:
        rep = scaling_report(now, {"q_samp"}, SEED, 100.0, None)
        names = dict(rep["top10"])
        # sub-0.1 s x1 baseline: fixed-overhead noise amplifies, skip
        assert "q_fast" not in names
        # sampled-parity path ran on a 1/10 universe: not comparable
        assert "q_samp" not in names
        assert set(names) == {"q_a", "q_b", "q_c"}
    finally:
        os.remove(path)


def test_silent_without_baseline_and_at_x1():
    # no x1 timings recorded for this seed/axis -> no report
    assert scaling_report({"q": 1.0}, set(), 123457, 100.0,
                          "no_such_axis") is None
    # an x1 sweep never reports against itself
    path = _write_baseline({"q": 1.0})
    try:
        assert scaling_report({"q": 1.0}, set(), SEED, 1.0, None) is None
    finally:
        os.remove(path)
