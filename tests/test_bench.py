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


def _patch_cheap_metrics(monkeypatch, **overrides):
    """Replace every metric body with a trivial stub so main() is fast."""
    cheap = {
        "bench_inference": lambda *a, **k: (1.5, 0.1),
        "bench_inference_batched": lambda *a, **k: 100.0,
        "bench_e2e_ms_per_image": lambda *a, **k: 10.0,
        "bench_e2e_breakdown": lambda *a, **k: {
            "e2e_decode_ms": 1.0, "e2e_h2d_ms": 2.0,
            "e2e_device_ms": 3.0, "e2e_d2h_ms": 4.0},
        "bench_video_fps": lambda *a, **k: 100.0,
        "bench_adain_ms": lambda *a, **k: 1.0,
        "bench_adain_serving_ms": lambda *a, **k: 1.0,
        "bench_train_steps_per_sec": lambda *a, **k: 10.0,
    }
    cheap.update(overrides)
    for name, fn in cheap.items():
        monkeypatch.setattr(bench, name, fn)


def test_main_emits_partial_json_on_midrun_failure(monkeypatch, capsys):
    """A metric failure mid-bench must record the error and KEEP GOING —
    everything else measured still lands in the one JSON line."""
    monkeypatch.setattr(bench, "_backend_ready", lambda *a, **k: (True, "cpu"))

    def boom(*a, **k):
        raise RuntimeError("backend died")

    _patch_cheap_metrics(monkeypatch, bench_inference_batched=boom)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] == 1.5
    assert "backend died" in rec["error"]
    # later metrics still ran despite the b8/b32 failures
    assert rec["e2e_ms_per_image"] == 10.0
    assert rec["train_images_per_sec_b96"] == 960.0
    assert rec["skipped_metrics"] == []


def test_main_budget_skips_metrics_and_reports_them(monkeypatch, capsys):
    """With no remaining budget every metric is skipped by name — the
    BENCH_r04 fix: the driver window can never again kill the JSON line."""
    monkeypatch.setattr(bench, "_backend_ready", lambda *a, **k: (True, "cpu"))
    _patch_cheap_metrics(monkeypatch)
    bench.main(budget_s=0.0)
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["value"] is None
    assert "train_b96" in rec["skipped_metrics"]
    assert len(rec["skipped_metrics"]) == 11


def test_main_residual_field_makes_leg_approximation_visible(monkeypatch, capsys):
    """ADVICE r4: the four e2e legs only approximately sum to the e2e
    number; the residual must be reported rather than implied zero."""
    monkeypatch.setattr(bench, "_backend_ready", lambda *a, **k: (True, "cpu"))
    _patch_cheap_metrics(monkeypatch)
    bench.main()
    rec = json.loads(capsys.readouterr().out.strip())
    assert rec["e2e_legs_residual_ms"] == 0.0  # 10.0 - (1+2+3+4)


def test_flop_accounting_static_values():
    """The static FLOP model behind the MFU fields: stylizer ~53 GF fwd,
    VGG-through-conv4_2 ~36.5 GF, train step ~273 GF/image at 256^2."""
    s = bench.stylizer_fwd_gflops()
    assert 50.0 < s < 56.0
    v = bench.vgg_fwd_gflops()
    assert 34.0 < v < 39.0
    t = bench.train_step_gflops_per_image()
    assert abs(t - 3 * (s + v + bench.gram_gflops())) < 1e-6
    assert 260.0 < t < 285.0
    # scale check: FLOPs are quadratic in image side
    assert abs(bench.stylizer_fwd_gflops(512, 512) / s - 4.0) < 0.01


def test_bf16_peak_lookup(monkeypatch):
    assert bench.bf16_peak_tflops("TPU v5 lite") == 197.0
    assert bench.bf16_peak_tflops("TPU v4") == 275.0
    assert bench.bf16_peak_tflops("weird chip") is None
    monkeypatch.setenv("FNST_BF16_PEAK_TFLOPS", "123.5")
    assert bench.bf16_peak_tflops("weird chip") == 123.5


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


def test_stylizer_raw_forward_u8_hook():
    """The public bench hook matches the production stylize_u8 path at an
    aligned shape and refuses misaligned ones (ADVICE r4: benches must not
    reach into _fwd_u8)."""
    import jax
    import jax.numpy as jnp

    from fast_neural_style_transfer_tpu.infer.stylize import Stylizer
    from fast_neural_style_transfer_tpu.models import TransformerNet

    sty = Stylizer(TransformerNet.init(jax.random.PRNGKey(0)))
    img = np.random.default_rng(0).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    y = sty.raw_forward_u8(jnp.asarray(img[None]))
    assert y.shape == (1, 64, 64, 3) and y.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(y[0]), sty.stylize_u8(img))
    with pytest.raises(ValueError):
        sty.raw_forward_u8(jnp.zeros((1, 60, 64, 3), jnp.uint8))
    with pytest.raises(TypeError):
        sty.raw_forward_u8(jnp.zeros((1, 64, 64, 3), jnp.float32))


def test_video_raw_forward_hook():
    import jax
    import jax.numpy as jnp

    from fast_neural_style_transfer_tpu.infer.video import VideoStylizer
    from fast_neural_style_transfer_tpu.models import TransformerNet

    vs = VideoStylizer(TransformerNet.init(jax.random.PRNGKey(0)))
    frames = np.random.default_rng(0).integers(
        0, 256, (2, 64, 64, 3), dtype=np.uint8)
    with pytest.raises(RuntimeError):
        vs.raw_forward(jnp.asarray(frames))  # no reference captured yet
    vs.set_reference(frames[0])
    y = vs.raw_forward(jnp.asarray(frames))
    assert y.shape == (2, 64, 64, 3) and y.dtype == jnp.uint8
    # matches the production path (stylize_frames pads/crops around _fwd)
    np.testing.assert_array_equal(np.asarray(y), vs.stylize_frames(frames))


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
