"""fnst-parity end-to-end: with a (random-weight) reference-layout .pth the
harness must score our stylizer vs the reference's own net at SSIM ~ 1.0 —
one file-drop away from verifying the >=0.98 north star on real weights."""

import json

import numpy as np
import pytest
import torch
from PIL import Image

import jax

from fast_neural_style_transfer_tpu.cli.parity import main, run_parity
from fast_neural_style_transfer_tpu.export.torch_convert import to_torch_state_dict
from fast_neural_style_transfer_tpu.models import TransformerNet


@pytest.fixture(scope="module")
def fixture_paths(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("parity")
    params = TransformerNet.init(jax.random.PRNGKey(3))
    sd = {k: torch.from_numpy(np.asarray(v).copy())
          for k, v in to_torch_state_dict(params).items()}
    pth = tmp / "ref_ckpt.pth"
    # reference training-checkpoint layout (train.py:269-283)
    torch.save({"model_state_dict": sd, "iteration": 1234}, pth)
    content = tmp / "content.jpg"
    Image.fromarray(
        np.random.default_rng(0).integers(0, 256, (300, 220, 3), dtype=np.uint8)
    ).save(content)
    return str(pth), str(content), tmp


@pytest.mark.parametrize("mode", ["reference-exact", "canonical"])
def test_parity_harness_matches_reference_net(fixture_paths, mode):
    pth, content, _ = fixture_paths
    result = run_parity(pth, content, size=(64, 64), mode=mode)
    assert result["pass"] and result["value"] > 0.99, result


def test_parity_cli_prints_json_and_saves_outputs(fixture_paths, capsys):
    pth, content, tmp = fixture_paths
    out_dir = tmp / "out"
    rc = main([
        "--reference_pth", pth, "--content", content,
        "--size", "64", "64", "--output_dir", str(out_dir),
        "--reference_sample", content,
    ])
    assert rc == 0
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["metric"] == "ssim_vs_reference_net"
    assert rec["value"] > 0.99 and rec["pass"]
    assert "ssim_vs_sample_file" in rec
    assert (out_dir / "parity_ours.jpg").exists()
    assert (out_dir / "parity_reference.jpg").exists()
