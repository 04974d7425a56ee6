"""The bench tail is self-describing (r13 item 5) and self-LABELING (r14
item 8): the final compact line carries a load_state verdict so a noisy
driver capture is machine-adjudicable without a re-run. These tests pin the
classifier's contract and that the verdict actually rides the tail line —
no SparkSession needed (bench.py only builds one inside main())."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import classify_load_state


def test_idle_capture_classifies_idle():
    # the r14 builder-certified clean capture shape: probes at baseline,
    # tight reps, best rep last
    assert classify_load_state(0.10, 0.10, [44.0, 43.5, 43.1]) == "idle"


def test_probe_contention_classifies_degraded():
    # a probe >1.5x idle = k-way contention during the bench
    assert classify_load_state(0.16, 0.10, [44.0, 43.5, 43.1]) == "degraded"
    assert classify_load_state(0.10, 0.31, [44.0, 43.5, 43.1]) == "degraded"


def test_rep_spread_classifies_degraded():
    # the r14 driver capture signature: probes near baseline but 23.7%
    # rep spread with the first rep worst (contention decayed mid-bench)
    assert classify_load_state(0.109, 0.107, [62.8, 53.7, 50.8]) == "degraded"


def test_first_rep_skew_alone_classifies_degraded():
    # spread under 20% but first rep >20% above best: early contention
    assert classify_load_state(0.10, 0.10, [50.0, 41.5, 41.2]) == "degraded"


def test_threshold_edges():
    # exactly at the documented 15-20% idle swing stays idle
    assert classify_load_state(0.10, 0.10, [47.0, 40.0, 41.0]) == "idle"
    # 0.149 is deliberately just UNDER the 1.5x probe threshold (and the
    # nominal boundary 0.15 is avoided: 0.15/0.10 floats to 1.4999…, so the
    # exact-ratio case would also read idle — test a value that is
    # unambiguously below instead)
    assert classify_load_state(0.149, 0.10, [44.0, 43.5, 43.1]) == "idle"


def test_combined_moderate_indicators_classify_degraded():
    # the r15 sustained-degradation signature: every solo indicator just
    # under threshold (probe 1.24x, spread 19%, first-rep skew 19%) but the
    # combination is unambiguous — untouched queries ran uniformly 2-5x
    assert classify_load_state(0.1242, 0.1041, [107.3, 90.2, 94.5]) == "degraded"
    # r14's genuinely clean capture: spread 18.9% but probes BELOW baseline
    # — one noisy indicator alone stays idle
    assert classify_load_state(0.076, 0.098, [51.2, 43.1, 44.6]) == "idle"


def test_tail_line_carries_load_state():
    """The final compact line (the ONLY line guaranteed to survive the
    driver's ~2 KB tail capture) must carry the load_state key — pinned by
    source inspection so the check doesn't need a full sf0.1 bench run."""
    src = (Path(__file__).resolve().parent.parent / "bench.py").read_text()
    tail_start = src.index('"tail_summary": True')
    final_block = src[src.rindex("json.dumps", 0, tail_start) : tail_start]
    assert '"load_state": load_state' in final_block
