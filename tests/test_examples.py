"""The example scripts must actually run (they are user-facing docs)."""

import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow  # multi-minute end-to-end drives

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(script: str, outdir: str) -> str:
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # scripts force CPU themselves
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "examples", script), outdir],
        capture_output=True, text=True, timeout=600, cwd=REPO, env=env,
    )
    assert r.returncode == 0, f"{script} failed:\n{r.stdout}\n{r.stderr}"
    return r.stdout


def test_quickstart_example(tmp_path):
    out = _run("quickstart.py", str(tmp_path))
    assert "loss" in out.lower() or os.listdir(tmp_path)


def test_multistyle_example(tmp_path):
    out = _run("multistyle.py", str(tmp_path))
    assert "loss" in out.lower()
    for name in ("style0.jpg", "style1.jpg", "blend.jpg", "multistyle_final.npz"):
        assert os.path.exists(tmp_path / name)


def test_serving_example(tmp_path):
    out = _run("serving.py", str(tmp_path))
    assert "data-parallel over 8 devices: identical output" in out
    assert "spatial (H over 4 shards)" in out
    assert "arbitrary-style DP serving" in out
    assert "HTTP micro-batching: 4 concurrent POSTs -> 4 JPEGs" in out
    assert os.path.exists(tmp_path / "single.jpg")


def test_adain_example(tmp_path):
    out = _run("adain.py", str(tmp_path))
    assert "loss" in out.lower()
    for name in ("arbitrary.jpg", "alpha0.0.jpg", "alpha1.0.jpg",
                 "interpolated.jpg", "served_a0.4.jpg", "served_a1.0.jpg",
                 "color_matched.jpg", "color_luma.jpg", "masked_styles.jpg",
                 "adain_decoder.npz"):
        assert os.path.exists(tmp_path / name)
