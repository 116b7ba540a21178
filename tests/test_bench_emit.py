"""The round-5 bench artifact contract (VERDICT r4 ask #1-#4).

The driver keeps the LAST 2000 CHARACTERS of bench stdout+stderr and
parses the last JSON line inside them. Rounds 3 and 4 both shipped
``parsed: null`` — r3 printed nothing before the driver's patience ran
out, r4 printed one cumulative line that outgrew the tail window. These
tests pin the contract that fixes both: every emitted line is compact
(<=1500 chars), the full detail goes to ``bench_detail.json``, the
headline is emitted BEFORE its convergence assert, and ``main()``'s last
line always parses from a 2000-char tail.
"""

import json
import sys

import pytest

sys.path.insert(0, __file__.rsplit("/tests/", 1)[0])
import bench

pytestmark = pytest.mark.fast


def _parse_tail(text, window=2000):
    """Exactly the driver's recipe: last JSON line in the last 2000 chars."""
    tail = text[-window:]
    last = None
    for line in tail.splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                last = json.loads(line)
            except ValueError:
                pass
    return last


class TestCompactFields:
    def test_flagship(self):
        sec = {"value": 299.8, "n_frames": 2000, "ate_rmse_m": 0.0103,
               "ate_rot_mean_deg": 0.063, "gt_path_length_m": 39.6,
               "phase_timers": {"big": "dict"}, "chi2": 29.5}
        out = bench._compact_fields("vio_planes_2k", sec)
        assert out["flagship_fps"] == 299.8
        assert out["flagship_frames"] == 2000
        assert out["flagship_ate_rmse_m"] == 0.0103
        assert "phase_timers" not in json.dumps(out)

    def test_skip_and_error(self):
        out = bench._compact_fields("multigraph", {"skipped": "x" * 300})
        assert len(out["multigraph_status"]) <= 90
        out = bench._compact_fields(
            "vio_planes_2k", {"value": 1.0, "n_frames": 30,
                              "error": "ATE blew up"})
        assert out["flagship_fps"] == 1.0          # numbers survive errors
        assert "error" in out["vio_planes_2k_status"]

    def test_non_dict(self):
        out = bench._compact_fields("ba_sqrt_100k", "garbage")
        assert out == {"ba_sqrt_100k_status": "garbage"}

    def test_mfu_fields(self):
        sec = {"value": 638.5, "mfu_pct": 12.9, "mfu_pct_xla": 12.7}
        out = bench._compact_fields("ba_sqrt_100k", sec)
        assert out == {"ba_sqrt_100k_ms_per_iter": 638.5,
                       "ba_sqrt_100k_mfu_pct": 12.9,
                       "ba_sqrt_100k_mfu_pct_xla": 12.7}


class TestEmit:
    def test_oversize_payload_degrades_to_parseable(self, capsys, tmp_path,
                                                    monkeypatch):
        monkeypatch.setattr(bench, "DETAIL_PATH",
                            str(tmp_path / "d.json"))
        payload = {"metric": "m", "value": 1.0, "unit": "u",
                   "vs_baseline": 2.0, "extra": {"blob": "x" * 3000}}
        bench._emit(payload, {"full": "detail"})
        line = capsys.readouterr().out.strip()
        assert len(line) <= 1500
        parsed = json.loads(line)
        assert parsed["value"] == 1.0
        assert parsed["extra"]["truncated"] == "see bench_detail.json"
        assert json.load(open(tmp_path / "d.json")) == {"full": "detail"}

    def test_normal_payload_verbatim(self, capsys, tmp_path, monkeypatch):
        monkeypatch.setattr(bench, "DETAIL_PATH",
                            str(tmp_path / "d.json"))
        payload = {"metric": "m", "value": 3.0, "unit": "u",
                   "vs_baseline": 1.5, "extra": {"flagship_fps": 10.0}}
        bench._emit(payload)
        assert json.loads(capsys.readouterr().out) == payload


@pytest.fixture
def _tiny_main(monkeypatch, tmp_path):
    """main() on CPU with tiny shapes, canned secondaries, no subprocesses."""
    monkeypatch.setattr(bench, "N_POSES", 100)
    monkeypatch.setattr(bench, "ITERS_PER_CALL", 6)
    monkeypatch.setattr(bench, "N_CALLS", 1)
    monkeypatch.setattr(bench, "PCG_ITERS", 8)
    monkeypatch.setattr(bench, "DETAIL_PATH", str(tmp_path / "d.json"))
    monkeypatch.setattr(bench, "_backend_alive", lambda timeout=240: True)
    canned = {
        "relay_probe": {"metric": "probe", "value": 45.0, "unit": "ms"},
        "vio_planes_2k": {"metric": "f", "value": 300.0,
                          "unit": "frames/sec", "n_frames": 2000,
                          "ate_rmse_m": 0.0103, "ate_rot_mean_deg": 0.06,
                          "gt_path_length_m": 39.6,
                          "phase_timers": {"k": {"calls": 1}}},
        "ba_sqrt_100k": {"metric": "b", "value": 638.5, "unit": "ms/iter",
                         "mfu_pct": 12.9, "mfu_pct_xla": 12.7,
                         "flops_per_iter_est": 8.1e12},
        # canned from the 2026-08-20 v5e capture (jittered bf16x3 assembly)
        "ba_sqrt_100k_bf16x3": {"metric": "b3", "value": 499.4,
                                "unit": "ms/iter", "mfu_pct": 16.5,
                                "chi2_final": 210719.4,
                                "assembly_precision": "high"},
        "multigraph": {"metric": "g", "value": 14284.0,
                       "unit": "graph-GN-iters/sec",
                       "speedup_vs_serial_dispatch": 60.2},
        "chordal": {"metric": "c", "value": 352.0, "unit": "x speedup"},
    }
    calls = []

    def fake_secondary(name, timeout=600):
        calls.append((name, timeout))
        return canned[name]

    monkeypatch.setattr(bench, "_run_secondary", fake_secondary)
    return calls, tmp_path


def test_main_tail_always_parses(_tiny_main, capsys):
    calls, tmp_path = _tiny_main
    bench.main()
    out = capsys.readouterr().out
    lines = [ln for ln in out.splitlines() if ln.strip()]
    # EVERY line is JSON and compact — any prefix of the run is parseable
    for ln in lines:
        assert len(ln) <= 1500, f"line too long: {len(ln)}"
        json.loads(ln)
    final = _parse_tail(out)
    assert final is not None
    assert final["value"] > 0
    ex = final["extra"]
    assert ex["flagship_fps"] == 300.0
    assert ex["flagship_ate_rmse_m"] == 0.0103
    assert ex["ba_sqrt_100k_mfu_pct"] == 12.9
    # the converged bf16x3 variant wins the best-MFU slot, and its chi2
    # parity evidence rides along in the compact line
    assert ex["ba_sqrt_100k_bf16x3_mfu_pct"] == 16.5
    assert ex["ba_sqrt_100k_bf16x3_chi2_final"] == 210719.4
    assert ex["best_mfu_pct"] == 16.5
    assert ex["best_mfu_config"] == "ba_sqrt_100k_bf16x3"
    assert "mfu" not in json.dumps(
        {k: v for k, v in ex.items() if "multigraph" in k}).lower()
    assert ex["total_wall_s"] >= 0
    # core secondaries ran; the full record went to the detail file
    names = [c[0] for c in calls]
    assert names[0] == "relay_probe"
    assert "vio_planes_2k" in names and "ba_sqrt_100k" in names
    detail = json.load(open(tmp_path / "d.json"))
    assert detail["secondaries"]["vio_planes_2k"]["phase_timers"]
    assert detail["headline"]["chi2_0"] > 0


def test_main_deadline_skips_cleanly(_tiny_main, capsys, monkeypatch):
    # 0 s of budget left: every secondary (probe included) must be clamped
    # or skipped, and the final line must still parse with skip statuses
    monkeypatch.setattr(bench, "DEADLINE_S", 0.0)
    bench.main()
    out = capsys.readouterr().out
    final = _parse_tail(out)
    assert final is not None and final["value"] > 0
    assert "skipped" in final["extra"]["vio_planes_2k_status"]
    assert "skipped" in final["extra"]["ba_sqrt_100k_status"]


def test_main_convergence_failure_emits_before_dying(_tiny_main, capsys,
                                                     monkeypatch):
    import graph_slam_tpu.graph as G

    # poison the headline: total_error reports a tiny initial chi2 so the
    # converged result "fails" the 0.1x bar — the run must still ship an
    # error-tagged parseable headline line (r4 verdict ask #3)
    real = G.total_error
    monkeypatch.setattr(G, "total_error",
                        lambda g, v: 1e-30 * real(g, v) + 1e-30)
    bench.main()
    out = capsys.readouterr().out
    final = _parse_tail(out)
    assert final is not None
    assert "headline_convergence_error" in final["extra"]
    assert final["value"] > 0          # the measured rate still ships


def test_error_tagged_secondary_never_takes_best_mfu(_tiny_main, capsys):
    # a non-converged run still reports its (real) timing-derived mfu_pct,
    # but a secondary carrying an "error" tag must never claim the
    # best-MFU slot in the compact line
    calls, _ = _tiny_main
    poisoned = {
        "metric": "b3", "value": 400.0, "unit": "ms/iter",
        "mfu_pct": 20.0, "chi2_final": float("nan"),
        "error": "sqrt-Schur failed to converge: 2.2e9 -> nan"}

    real = bench._run_secondary

    def fake(name, timeout=600):
        if name == "ba_sqrt_100k_bf16x3":
            return poisoned
        return real(name, timeout=timeout)

    bench._run_secondary = fake
    try:
        bench.main()
    finally:
        bench._run_secondary = real
    final = _parse_tail(capsys.readouterr().out)
    assert final["extra"]["best_mfu_config"] == "ba_sqrt_100k"
    assert final["extra"]["best_mfu_pct"] == 12.9
    assert "error" in final["extra"]["ba_sqrt_100k_bf16x3_status"]
