"""Round-over-round bench regression flags: past BENCH_r*.json driver
records parse back into a per-lane history, and a lane falling below its
all-rounds floor by more than the tunnel-noise allowance trips a
collapse flag (bench.py exits nonzero).  Tunnel contention legitimately
swings lanes several-fold, so the flag must NOT fire inside that noise
band — both directions are pinned here against synthetic histories and
the repo's real records."""

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import bench  # noqa: E402


def _record(tmp_path, tag, lines):
    (tmp_path / f"BENCH_{tag}.json").write_text(
        json.dumps({"tail": "\n".join(lines)}))


def test_history_parses_lanes_and_keeps_gated_min(tmp_path):
    _record(tmp_path, "r01", [
        "# filter_1_1: 1000.0 Msamples/s (20833x realtime@48k)",
        "# poly_voices_256: 85717 Mvoice-samples/s (6976x realtime mix)",
        "# streaming_tracker_4v: 3.2 Msamples/s (73x realtime headroom)",
        "# streaming_tracker_4v: 6.0 Msamples/s (137x realtime headroom)",
        "# not a lane line",
    ])
    hist = bench._bench_history(tmp_path)
    assert hist["filter_1_1"] == {"r01": 1000.0}
    assert hist["poly_voices_256"] == {"r01": 85717.0}
    # Per-run streaming lines collapse to the min, like the gate itself.
    assert hist["streaming_tracker_4v"] == {"r01": 3.2}


def test_collapse_below_floor_flags_and_noise_band_does_not(tmp_path):
    _record(tmp_path, "r01", ["# lane_a: 900.0 Msamples/s (x)",
                              "# lane_b: 50.0 Msamples/s (x)"])
    _record(tmp_path, "r02", ["# lane_a: 3000.0 Msamples/s (x)",
                              "# lane_b: 40.0 Msamples/s (x)"])
    # lane_a at 200 = 4.5x below its 900 floor: inside the 6x allowance,
    # no flag.  lane_b at 5 = 8x below its 40 floor: collapse.
    assert bench.flag_regressions({"lane_a": 200.0, "lane_b": 39.0},
                                  tmp_path) == 0
    assert bench.flag_regressions({"lane_a": 200.0, "lane_b": 5.0},
                                  tmp_path) == 1
    # Unknown lanes and failed lanes never flag (no history to collapse
    # against / failure already visible upstream).
    assert bench.flag_regressions({"lane_new": 1.0, "lane_a": None},
                                  tmp_path) == 0


def test_repo_round3_numbers_pass_against_real_history():
    # The committed BENCH_r01-r03 records themselves: replaying round 3's
    # numbers as "current" must not flag (sanity against false alarms).
    hist = bench._bench_history()
    assert "filter_1_1" in hist  # the records exist in the repo root
    current = {lane: vals[max(vals)] for lane, vals in hist.items()}
    assert bench.flag_regressions(current) == 0


def test_incomparable_history_is_excluded_from_the_floor(tmp_path, capsys):
    # The streaming lane's contract changed at r04 (K=32 -> K=4, min ->
    # median) and again at r05 (K=4 -> K=2 after the serve-thread stall
    # class was eliminated): pre-cut rounds must not set the floor, and
    # the exclusion must be stated in the table (VERDICT r04 #6/#7).
    _record(tmp_path, "r03", [
        "# streaming_tracker_4v: 99.0 Msamples/s (x)"])
    _record(tmp_path, "r04", [
        "# streaming_tracker_4v: 9.0 Msamples/s (x)"])
    _record(tmp_path, "r05", [
        "# streaming_tracker_4v: 1.4 Msamples/s (x)"])
    # 0.9 is 110x below the K=32-era 99.0 but only 1.6x below r05's 1.4:
    # with the incomparable history dropped there is NO collapse flag.
    assert bench.flag_regressions({"streaming_tracker_4v": 0.9},
                                  tmp_path) == 0
    err = capsys.readouterr().err
    assert "history before r05 excluded" in err
    assert "r03" in err and "r04" in err
    # With ONLY incomparable history the lane reports as new.
    sub = tmp_path / "only_old"
    sub.mkdir()
    _record(sub, "r03", ["# streaming_tracker_4v: 99.0 Msamples/s (x)"])
    _record(sub, "r04", ["# streaming_tracker_4v: 9.0 Msamples/s (x)"])
    assert bench.flag_regressions({"streaming_tracker_4v": 0.9}, sub) == 0
    assert "(no history)" in capsys.readouterr().err


def test_deadline_skip_prints_and_main_always_emits_json(monkeypatch,
                                                         capsys):
    # _skip: an exhausted deadline refuses the lane with the mandatory
    # SKIPPED(budget) line.
    monkeypatch.setattr(bench, "DEADLINE_SECS", 10.0)
    monkeypatch.setattr(bench, "_T0", __import__("time").monotonic() - 9.0)
    assert bench._skip("pump gate", floor=60.0)
    assert "# pump gate SKIPPED(budget):" in capsys.readouterr().err
    # A healthy deadline does not skip.
    monkeypatch.setattr(bench, "_T0", __import__("time").monotonic())
    monkeypatch.setattr(bench, "DEADLINE_SECS", 1500.0)
    assert not bench._skip("pump gate", floor=60.0)
    # main() must emit the one-line JSON artifact even when the lane
    # runner dies outright (the r04 failure mode was a kill with no
    # JSON; now any partial state flushes).
    monkeypatch.setattr(bench, "_run_lanes",
                        lambda *a: (_ for _ in ()).throw(RuntimeError("x")))
    rc = bench.main()
    out = capsys.readouterr()
    line = [l for l in out.out.splitlines() if l.startswith("{")]
    assert line, out.out
    parsed = json.loads(line[-1])
    assert parsed["metric"] == "tracker_bench_x_realtime_48k"
    assert rc == 1  # no lane landed -> honest zero-value artifact


def test_gate_floors_reserve_budget_against_earlier_lanes(monkeypatch,
                                                          capsys):
    # r05's first full run: poly_16 cold-compiled for 780 s and starved
    # every downstream gate.  The floors make that impossible: with 900 s
    # left, a headline workload (before all gates) may spend only
    # 900 - reserve - sum(floors) and must SKIP below 60 s affordable,
    # while the LAST gate (soak) still sees nearly the whole remainder.
    import time as _time
    monkeypatch.setattr(bench, "DEADLINE_SECS", 900.0)
    monkeypatch.setattr(bench, "_T0", _time.monotonic())
    total_floors = sum(f for _, f in bench.GATE_FLOORS)
    assert total_floors == 760
    aff_workload = bench._afford(None)
    assert aff_workload < 900 - total_floors  # reserve also held back
    assert bench._afford("soak") > 850
    # streaming's affordance excludes every floor after it, not its own.
    assert abs(bench._afford("streaming") -
               (bench._afford("soak") - (total_floors - 120))) < 1.0
    # With only the floors left, a workload skips but the gates run.
    monkeypatch.setattr(bench, "_T0",
                        _time.monotonic() - (900 - total_floors - 20))
    assert bench._skip("marks_4_40", 60, after=None)
    assert "# marks_4_40 SKIPPED(budget)" in capsys.readouterr().err
    assert not bench._skip("fuzz_tpu gate", 100, after="fuzz_tpu")
    assert not bench._skip("soak gate", 150, after="soak")


def test_main_flushes_partial_results_on_interrupt(monkeypatch, capsys):
    # A SIGTERM-style interrupt mid-run: whatever landed still produces
    # the regression table and the JSON line.
    def fake_lanes(results, extra_msps, failed_gates):
        results["filter_1_1"] = 1.0e9
        bench._STOPPING[0] = True

    monkeypatch.setattr(bench, "_run_lanes", fake_lanes)
    try:
        rc = bench.main()
    finally:
        bench._STOPPING[0] = False
    out = capsys.readouterr()
    assert "partial results flushed" in out.err
    parsed = json.loads(
        [l for l in out.out.splitlines() if l.startswith("{")][-1])
    assert parsed["value"] > 0
    assert rc in (0, 2)


def test_fuzz_tpu_lane_on_cpu(capsys):
    # The fuzz_tpu lane's harness, driven on the CPU backend with a small
    # case bank (4 structures x 2 const-jitter variants): the production
    # fast/jit render of every case must hold the differential suite's
    # statistical gates vs the oracle.
    ok, fail, skip, failures = bench.bench_fuzz_tpu(seed0=5000,
                                                    n_structs=4,
                                                    n_variants=2)
    assert fail == 0, failures
    assert ok >= 4  # the bank can't be all skips
    err = capsys.readouterr().err
    assert "# fuzz_tpu:" in err and "seeds 5000..5003" in err
    assert "2 const-jitter variants" in err


def test_fuzz_tpu_budget_stop_reports_and_counts(capsys):
    # A lane whose internal budget expires must stop issuing cases and
    # say so — never bust the subprocess cap (VERDICT r04 item 1/3).
    ok, fail, skip, _ = bench.bench_fuzz_tpu(seed0=5000, budget=0.0)
    assert ok + fail + skip == 0
    err = capsys.readouterr().err
    assert "budget-stopped at 5000/v0" in err


def test_jitter_consts_preserves_compiled_structure():
    # Variants must reuse the base structure's executable: identical
    # structure_key, identical tree shape, with Reset-trigger and
    # Fin-length consts frozen (they bake into the executable).
    import random

    from tuun_tpu import fuzzgen, ir
    from tuun_tpu.engine import structure_key

    for seed in range(5000, 5016):
        rng = random.Random(seed)
        w0 = fuzzgen.random_waveform(rng, depth=4 + seed % 2)
        wv = fuzzgen.jitter_consts(w0, random.Random(seed * 1000 + 1))
        assert structure_key(w0, 44100) == structure_key(wv, 44100), seed
        # At least one movable const actually moved for trees that
        # have any (zeros and frozen contexts legitimately pin some).
        consts0 = [x.value for x in w0.walk() if isinstance(x, ir.Const)]
        constsv = [x.value for x in wv.walk() if isinstance(x, ir.Const)]
        assert len(consts0) == len(constsv), seed


def test_fuzz_shapes_harness_on_cpu(capsys):
    # The production-shape differential tier, shrunk to CPU scale: the
    # four class programs render in exact_df at BOTH block shapes
    # (one full-piece dispatch + 1024-lane state-carried blocks) and
    # hold the strict per-class bounds vs the oracle.
    assert bench.bench_fuzz_shapes(n=1 << 13, sr=8000)
    err = capsys.readouterr().err
    assert "# fuzz_shapes: 8 ok / 0 fail" in err
    for cname in ("nco", "fm", "filter", "reset"):
        assert f"{cname}/offline" in err and f"{cname}/stream" in err


def test_longrender_harness_on_cpu(capsys):
    # The long-render product proof's machinery at CPU scale: the
    # 4-class score evaluates end to end (source -> evaluator ->
    # optimizer), renders in exact_df, and matches the native oracle at
    # the strict bound over its opening seconds.  (The full 64-s render
    # runs on the TPU: bench.py --one longrender.)
    assert bench.bench_longrender(n=2 * bench.SAMPLE_RATE)
    err = capsys.readouterr().err
    assert "# longrender: PASS" in err
