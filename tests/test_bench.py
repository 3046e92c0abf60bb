"""bench.py smoke tests (tiny sizes, CPU) — the driver runs this file's
subject on real hardware every round, so API breakage must fail CI first."""

import numpy as np

import bench


def test_bench_inference_smoke():
    p50, rtt = bench.bench_inference(chain=2, samples=1)
    assert np.isfinite(p50) and p50 >= 0
    assert np.isfinite(rtt) and rtt >= 0


def test_bench_train_steps_smoke():
    sps = bench.bench_train_steps_per_sec(iters=1, batch=1)
    assert np.isfinite(sps) and sps > 0


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
