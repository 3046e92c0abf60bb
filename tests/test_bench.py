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
