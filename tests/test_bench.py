"""bench.py smoke tests (tiny sizes, CPU) — the driver runs this file's
subject on real hardware every round, so API breakage must fail CI first."""

import pytest
import json

import numpy as np

import bench


def test_main_emits_parseable_json_when_backend_unavailable(monkeypatch, capsys):
    """BENCH_r02 was lost to one transient TPU outage at capture time; the
    contract now is ONE parseable JSON line whatever the backend does."""
    monkeypatch.setattr(bench, "_backend_ready",
                        lambda *a, **k: (False, "UNAVAILABLE: test"))
    bench.main()
    line = capsys.readouterr().out.strip()
    rec = json.loads(line)
    assert rec["device"] == "unavailable"
    assert rec["metric"] == "stylize_256_p50_latency"
    assert rec["value"] is None and "error" in rec


def test_main_emits_partial_json_on_midrun_failure(monkeypatch, capsys):
    """A backend death mid-bench must still report what was measured."""
    monkeypatch.setattr(bench, "_backend_ready", lambda *a, **k: (True, "cpu"))
    monkeypatch.setattr(bench, "bench_inference",
                        lambda *a, **k: (1.5, 0.1))
    def boom(*a, **k):
        raise RuntimeError("backend died")
    monkeypatch.setattr(bench, "bench_inference_batched", boom)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 1.5
    assert "backend died" in rec["error"]


def test_backend_ready_respects_cpu_force(monkeypatch):
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    ok, plat = bench._backend_ready(max_wait_s=1, probe_timeout_s=1)
    assert ok and plat == "cpu"


def test_bench_inference_smoke():
    p50, rtt = bench.bench_inference(chain=2, samples=1)
    assert np.isfinite(p50) and p50 >= 0
    assert np.isfinite(rtt) and rtt >= 0


@pytest.mark.slow
def test_bench_train_steps_smoke():
    sps = bench.bench_train_steps_per_sec(iters=1, batch=1)
    assert np.isfinite(sps) and sps > 0


@pytest.mark.slow
def test_bench_batched_smoke():
    ips = bench.bench_inference_batched(2, chain=2, samples=1)
    assert np.isfinite(ips) and ips > 0


def test_bench_e2e_smoke(tmp_path):
    from PIL import Image

    p = tmp_path / "img.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    ).save(p)
    ms = bench.bench_e2e_ms_per_image(str(p), repeats=1)
    assert np.isfinite(ms) and ms > 0


def test_bench_adain_smoke():
    ms = bench.bench_adain_ms(hw=32, chain=2, samples=1)
    assert np.isfinite(ms) and ms > 0


def test_bench_adain_serving_smoke():
    ms = bench.bench_adain_serving_ms(hw=32, chain=2, samples=1)
    assert ms > 0


@pytest.mark.slow
def test_memory_probe_reports_compiled_analysis(capsys):
    """tools/memory_probe.py compiles (never runs) a train step and emits
    one JSON line per (batch, remat) with XLA's memory analysis — the
    numbers that decide whether a shape OOMs on chip."""
    import json as _json
    import sys

    sys.path.insert(0, "/root/repo/tools")
    import memory_probe

    old = sys.argv
    try:
        sys.argv = ["memory_probe.py", "2", "--image_size", "32",
                    "--family", "adain"]
        memory_probe.main()
    finally:
        sys.argv = old
    lines = [ln for ln in capsys.readouterr().out.splitlines() if ln.strip()]
    assert len(lines) == 2  # remat false + true
    for ln in lines:
        rec = _json.loads(ln)
        assert rec["family"] == "adain" and rec["batch"] == 2
        assert "temp_size_in_bytes" in rec or "error" in rec
