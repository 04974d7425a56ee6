"""The bench tail is self-describing (r13 item 5) and self-LABELING (r14
item 8): the final compact line carries a load_state verdict so a noisy
driver capture is machine-adjudicable without a re-run. These tests pin the
classifier's contract and that the verdict actually rides the tail line —
no SparkSession needed (bench.py only builds one inside main()).

The classifier was RECALIBRATED in r16 against the mechanical fold of the
r10-r15 driver captures plus two same-day clean-probe r16 captures: the
first rep total runs 21-24% above the best rep in EVERY capture (including
provably-idle ones — probes at/below baseline, rep2+ spread 1-6%), because
each query's first timed rep re-pays warmth evicted since the warmup pass.
Structural, not contention — so the spread signal now excludes the first
rep, the first-skew solo threshold sits far past the structural band, and a
fixed-workload reference (the original-15 core vs its recorded idle
baseline) detects uniform sustained slowdown that intra-run signals cannot
see."""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from bench import classify_load_state


def test_idle_capture_classifies_idle():
    # the r16 clean-probe capture shape: probes at baseline, structural
    # first-rep skew (~22%), steady reps tight — this exact shape appears
    # in EVERY capture r10-r16, so it must read idle or the label is dead
    assert classify_load_state(0.0927, 0.0939, [66.63, 57.67, 54.60]) == "idle"
    assert classify_load_state(0.102, 0.105, [62.10, 53.06, 49.75]) == "idle"
    # the r15 DRIVER capture (probes 0.083/0.0996, steady spread 1.1%,
    # first skew 21%): re-read as idle — its common-query ratio vs r14 was
    # 1.03 and the original-15 core 0.99x, i.e. the numbers were fine; the
    # old spread rule mislabeled the structural first rep as contention
    assert classify_load_state(0.0832, 0.0996, [68.44, 56.63, 57.24]) == "idle"


def test_probe_contention_classifies_degraded():
    # a probe >1.35x idle = contention during the bench (clean band observed
    # 0.83-1.1x; the r15 degraded episodes probed 1.24-1.73x)
    assert classify_load_state(0.137, 0.105, [58.0, 57.0, 57.2]) == "degraded"
    assert classify_load_state(0.10, 0.1728, [32.0, 26.6, 25.7]) == "degraded"


def test_uniform_sustained_slowdown_detected_by_reference_workload():
    # the r15 WORST episode: probes only 1.24x, steady reps tight, first
    # skew 19% — every intra-run signal under threshold, yet untouched
    # queries ran uniformly 2-5x. The fixed original-15 core vs its
    # recorded idle baseline (6.6 s) is the only detector for this shape.
    assert (
        classify_load_state(
            0.1242, 0.1041, [107.3, 90.2, 94.5], original15_min_total=13.4
        )
        == "degraded"
    )
    # the same intra-run shape WITHOUT the reference workload evidence is
    # indistinguishable from idle — the residual blind spot the original15
    # detector exists to close (bench always passes it at sf0.1)
    assert classify_load_state(0.1242, 0.1041, [107.3, 90.2, 94.5]) == "idle"
    # a healthy original15 core (r8-r16 band 5.85-7.32 s) never trips it
    assert (
        classify_load_state(
            0.10, 0.10, [66.0, 55.0, 54.0], original15_min_total=7.32
        )
        == "idle"
    )


def test_steady_spread_classifies_degraded():
    # reps 2..n disagree by >20% — machine state CHANGED during the steady
    # phase (the structural first rep is excluded from this signal)
    assert classify_load_state(0.10, 0.10, [60.0, 55.0, 44.0]) == "degraded"


def test_first_rep_skew_far_past_structural_band_classifies_degraded():
    # first skew 50% is well past the 21-24% structural band: contention
    # that decayed after rep 1
    assert classify_load_state(0.10, 0.10, [63.0, 42.5, 42.0]) == "degraded"


def test_combined_moderate_indicators_classify_degraded():
    # moderately hot probe (1.24x) + moderate steady spread (12%) — neither
    # alone is conclusive, together they are
    assert classify_load_state(0.124, 0.10, [60.0, 50.4, 45.0]) == "degraded"
    # moderately hot probe + first skew past 30% (above structural, below
    # the 40% solo threshold)
    assert classify_load_state(0.120, 0.118, [58.0, 43.5, 43.1]) == "degraded"
    # the same rep shapes with probes at baseline stay idle (the first
    # shape's steady spread 12% is inside noise without probe support)
    assert classify_load_state(0.098, 0.10, [60.0, 50.4, 45.0]) == "idle"


def test_two_rep_capture_excludes_structural_first_rep():
    # the steady signal excludes rep 1 at ANY rep count >= 2: a 2-rep
    # capture with the structural 22% first-rep skew must read idle (the
    # same shape with 3 reps is asserted idle in test_threshold_edges)
    assert classify_load_state(0.10, 0.10, [53.3, 43.5]) == "idle"
    # first-rep skew far past structural still flags with 2 reps
    assert classify_load_state(0.10, 0.10, [63.0, 42.5]) == "degraded"


def test_threshold_edges():
    # structural first-rep skew exactly in-band (24%) with tight steady reps
    assert classify_load_state(0.10, 0.10, [53.3, 43.5, 43.0]) == "idle"
    # 0.134 is deliberately just UNDER the 1.35x probe threshold (and the
    # nominal boundary 0.135 is avoided: float division may land either
    # side of the exact ratio — test a value that is unambiguously below)
    assert classify_load_state(0.134, 0.10, [44.0, 43.5, 43.1]) == "idle"


def test_tail_line_carries_load_state():
    """The final compact line (the ONLY line guaranteed to survive the
    driver's ~2 KB tail capture) must carry the load_state key — pinned by
    source inspection so the check doesn't need a full sf0.1 bench run."""
    src = (Path(__file__).resolve().parent.parent / "bench.py").read_text()
    tail_start = src.index('"tail_summary": True')
    final_block = src[src.rindex("json.dumps", 0, tail_start) : tail_start]
    assert '"load_state": load_state' in final_block
