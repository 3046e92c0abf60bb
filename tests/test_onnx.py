"""ONNX export tests: wire-format validity, graph structure, forward parity."""

import shutil
import subprocess

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.export.onnx_export import (
    INPUT_NAME,
    OUTPUT_NAME,
    build_onnx_model,
    export_onnx,
)
from fast_neural_style_transfer_tpu.export.onnx_runtime import (
    onnx_stylize,
    parse_model,
    run_model,
)
from fast_neural_style_transfer_tpu.models import TransformerNet


def _params():
    return TransformerNet.init(jax.random.PRNGKey(0))


def test_model_parses_back_with_expected_structure():
    data = build_onnx_model(_params())
    m = parse_model(data)
    assert m["opset"] == 11  # reference exports opset 11 (onnx_model.py:28)
    assert m["inputs"] == [INPUT_NAME] and m["outputs"] == [OUTPUT_NAME]
    ops = [n["op"] for n in m["nodes"]]
    assert ops.count("Conv") == 13  # 2 enc + 10 res + 1 final
    assert ops.count("ConvTranspose") == 2
    assert ops.count("InstanceNormalization") == 14
    assert ops.count("Add") == 5
    assert ops.count("Pad") == 13
    # all node inputs resolve to an initializer, graph input, or earlier output
    known = set(m["initializers"]) | set(m["inputs"])
    for n in m["nodes"]:
        for i in n["inputs"]:
            assert i in known, f"dangling input {i}"
        known.update(n["outputs"])
    assert OUTPUT_NAME in known


def test_wire_format_is_valid_protobuf():
    """protoc --decode_raw accepts any well-formed wire stream."""
    if shutil.which("protoc") is None:
        pytest.skip("protoc not available")
    data = build_onnx_model(_params())
    proc = subprocess.run(
        ["protoc", "--decode_raw"], input=data, capture_output=True
    )
    assert proc.returncode == 0, proc.stderr.decode()[:500]
    assert b"input_image" in proc.stdout


def test_onnx_forward_parity_with_native_model():
    params = _params()
    data = build_onnx_model(params, input_shape=(1, 3, 32, 32))
    x = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
    (got,) = run_model(data, {INPUT_NAME: x})
    want = TransformerNet.apply(
        params, jnp.asarray(np.transpose(x, (0, 2, 3, 1))), train=False
    )
    want = np.transpose(np.asarray(want), (0, 3, 1, 2))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_onnxruntime_executor_parity():
    """Independent-executor parity: the reference's artifact runs under
    onnxruntime (/root/reference/onnx_version/onnx_inference.py:32-35), so
    ours must too wherever that wheel exists. Env-gated: this image has no
    network and no cached wheel (attempt recorded in PARITY.md), but the
    test is live the moment one appears."""
    ort = pytest.importorskip("onnxruntime")
    params = _params()
    data = build_onnx_model(params, input_shape=(1, 3, 32, 32))
    sess = ort.InferenceSession(data, providers=["CPUExecutionProvider"])
    x = np.random.default_rng(0).normal(size=(1, 3, 32, 32)).astype(np.float32)
    (got,) = sess.run(None, {INPUT_NAME: x})
    (want,) = run_model(data, {INPUT_NAME: x})
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_onnx_stylize_file_end_to_end(tmp_path):
    model_path = str(tmp_path / "model.onnx")
    export_onnx(_params(), model_path)
    content = tmp_path / "c.jpg"
    Image.fromarray(
        np.random.default_rng(1).integers(0, 256, (64, 64, 3), dtype=np.uint8)
    ).save(content)
    out = onnx_stylize(model_path, str(content), str(tmp_path / "o.jpg"))
    with Image.open(out) as im:
        assert im.size == (256, 256)  # static-shape export resizes input


def test_dynamic_shape_export_parses_and_runs():
    """Symbolic batch/H/W export (dim_param) — graph runs at any resolution."""
    params = _params()
    data = build_onnx_model(params, input_shape=("batch", 3, "height", "width"))
    m = parse_model(data)
    assert m["inputs"] == [INPUT_NAME]
    x = np.random.default_rng(0).normal(size=(2, 3, 40, 24)).astype(np.float32)
    (out,) = run_model(data, {INPUT_NAME: x})
    assert out.shape == (2, 3, 40, 24)


def test_dynamic_export_output_dims_are_distinct_params():
    """Output spatial dims are NOT guaranteed equal to input dims (non-4-
    multiples round up), so symbolic outputs must use distinct dim_params."""
    data = build_onnx_model(_params(), input_shape=("batch", 3, "height", "width"))
    # crude but sufficient: the serialized bytes must contain out_height
    assert b"out_height" in data and b"out_width" in data
    # and a static non-multiple-of-4 shape declares the rounded-up output
    x = np.random.default_rng(0).normal(size=(1, 3, 30, 30)).astype(np.float32)
    data30 = build_onnx_model(_params(), input_shape=(1, 3, 30, 30))
    (out,) = run_model(data30, {INPUT_NAME: x})
    assert out.shape == (1, 3, 32, 32)


def test_export_cli_dynamic_requires_onnx(tmp_path):
    import pytest as _pytest

    from fast_neural_style_transfer_tpu.export.cli import main
    from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

    npz = str(tmp_path / "p.npz")
    save_params_npz(_params(), npz)
    with _pytest.raises(SystemExit):
        main(["--model", npz, "--onnx-dynamic", "--pth", str(tmp_path / "m.pth")])
