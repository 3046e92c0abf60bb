"""TorchScript export: traced .pt loads standalone and matches our forward."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.export.torchscript import export_torchscript
from fast_neural_style_transfer_tpu.models import TransformerNet


def test_torchscript_roundtrip_forward_parity(tmp_path):
    params = TransformerNet.init(jax.random.PRNGKey(0))
    path = str(tmp_path / "model_traced.pt")
    export_torchscript(params, path, example_hw=32)

    loaded = torch.jit.load(path)  # what reference inference.py:38 does
    x = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        got = loaded(torch.from_numpy(x)).numpy()

    want = TransformerNet.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False
    )
    want = np.transpose(np.asarray(want), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_torchscript_runs_at_other_resolutions(tmp_path):
    """trace(strict=False) of the fully-convolutional graph generalizes."""
    params = TransformerNet.init(jax.random.PRNGKey(1))
    path = str(tmp_path / "m.pt")
    export_torchscript(params, path, example_hw=32)
    loaded = torch.jit.load(path)
    with torch.no_grad():
        out = loaded(torch.rand(1, 3, 64, 64))
    assert tuple(out.shape) == (1, 3, 64, 64)


def test_export_cli(tmp_path):
    from fast_neural_style_transfer_tpu.export.cli import main
    from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

    params = TransformerNet.init(jax.random.PRNGKey(0))
    npz = str(tmp_path / "p.npz")
    save_params_npz(params, npz)
    onnx = str(tmp_path / "m.onnx")
    ts = str(tmp_path / "m.pt")
    pth = str(tmp_path / "m.pth")
    main(["--model", npz, "--onnx", onnx, "--torchscript", ts, "--pth", pth])
    import os

    assert all(os.path.getsize(f) > 1000 for f in (onnx, ts, pth))
