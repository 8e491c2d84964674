"""Bench-infrastructure tests (the fast ones; FLOP-anchor check is slow)."""

import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")


def test_analytic_flops_magnitude():
    """The analytic count scales linearly in batch and sits in the
    right magnitude for the flagship model (9.695 TFLOP at batch 80)."""
    from bench import analytic_train_flops
    f80 = analytic_train_flops(B=80)
    f160 = analytic_train_flops(B=160)
    assert 9.0e12 < f80 < 10.5e12
    assert abs(f160 / f80 - 2.0) < 1e-6


def test_analytic_flops_matches_cost_model():
    """The matmul-only analytic count must agree with XLA's cost model for
    the REAL grad step within 5% — a drift in either the model structure
    (a layer added/removed, a head resized) or the formula breaks this.
    VERDICT r2 weak #6: this is what makes the MFU number trustworthy."""
    from bench import analytic_train_flops, train_step_flops
    xla = train_step_flops()          # CPU-lowers the flagship grad step
    analytic = analytic_train_flops(B=80)
    assert abs(xla - analytic) / xla < 0.05, (xla, analytic)


def test_backend_down_fallback_prints_last_good():
    """With the device backend down, ``python bench.py`` must still emit
    ONE JSON line: the committed last-good real-hardware run, marked
    stale (the tunneled axon backend has wedged for 6+ hour stretches —
    the driver's round-end bench must never come back empty)."""
    import contextlib
    import io
    import json

    import bench

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        bench._print_last_good("probe timed out")
    line = json.loads(buf.getvalue())
    assert line["unit"] == "qa_pairs/s/chip"
    assert line["value"] > 0            # the snapshot carries real numbers
    assert line["aux"]["stale"] is True
    assert "probe timed out" in line["aux"]["stale_reason"]
    assert line["aux"]["measured_at"] != "unknown"
    # the snapshot must never be refreshed from a cpu run or a stale line
    bench._save_last_good({"value": 1.0, "aux": {}}, platform="cpu")
    bench._save_last_good({"value": 1.0, "aux": {"stale": True}},
                          platform="axon")
    with open(bench._last_good_path()) as f:
        snap = json.load(f)
    assert snap["result"]["value"] == line["value"]


def test_run_guarded_contention_self_check():
    """The bench self-guard (VERDICT r4 #9): a guarded metric >30% below
    the last-good snapshot re-runs its section once; a persistent drop is
    annotated in aux.suspect_host_contention instead of being silently
    committed; a transient drop (retry recovers) is NOT annotated; and a
    contention-flagged result never refreshes the last-good snapshot."""
    import json

    import bench

    # persistent drop: retried once, then annotated
    calls = []
    def bad():
        calls.append(1)
        return {"m": 10.0, "extra": 1}
    aux = {}
    bench._run_guarded(aux, bad, ("m",), {"m": 100.0}, "sec")
    assert len(calls) == 2
    assert aux["m"] == 10.0 and aux["extra"] == 1
    assert aux["suspect_host_contention"] == ["sec:m 10.0 vs last_good 100.0"]

    # transient drop: retry recovers, no annotation, better run kept
    calls = []
    def flaky():
        calls.append(1)
        return {"m": 10.0 if len(calls) == 1 else 95.0}
    aux = {}
    bench._run_guarded(aux, flaky, ("m",), {"m": 100.0}, "sec")
    assert len(calls) == 2
    assert aux["m"] == 95.0 and "suspect_host_contention" not in aux

    # healthy: single run, no annotation; and no last-good key -> no retry
    calls = []
    def ok():
        calls.append(1)
        return {"m": 80.0}
    aux = {}
    bench._run_guarded(aux, ok, ("m",), {"m": 100.0}, "sec")
    assert len(calls) == 1 and aux["m"] == 80.0
    calls = []
    aux = {}
    bench._run_guarded(aux, ok, ("m",), {}, "sec")
    assert len(calls) == 1

    # a contention-flagged run must not refresh BENCH_LAST_GOOD
    with open(bench._last_good_path()) as f:
        before = json.load(f)
    bench._save_last_good(
        {"value": 1.0, "aux": {"suspect_host_contention": ["x"]}},
        platform="axon")
    with open(bench._last_good_path()) as f:
        assert json.load(f) == before


@pytest.mark.slow
def test_serve_bench_smoke():
    """tools/serve_bench.py end-to-end on CPU with the tiny model: the
    live-server load harness completes with zero client errors and the
    batcher actually coalesces under concurrency."""
    from tools.serve_bench import main
    res = main(["--cpu", "--tiny", "--requests", "16", "--threads", "4",
                "--sequential", "2", "--chunk", "64"])
    assert res["requests"] == 16
    assert res["errors"] == []
    assert res["dispatches"] >= 1
    assert res["serve_questions_per_sec_per_chip"] > 0
