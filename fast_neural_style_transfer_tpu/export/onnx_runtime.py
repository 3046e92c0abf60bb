"""Minimal ONNX interpreter for the exported stylizer graph.

The reference runs its export through onnxruntime
(/root/reference/onnx_version/onnx_inference.py:32-35, with a shape bug — it
feeds a 3-D CHW array to a 4-D model). Neither ``onnx`` nor ``onnxruntime``
exist in this environment, so this module provides (a) a wire-format parser
for the ModelProto subset we emit and (b) an executor for its 6 op types
(Pad/Conv/InstanceNormalization/Relu/Add/ConvTranspose) on JAX — which also
serves as the round-trip validation harness for the hand-rolled writer.

NCHW tensors inside the graph are transposed to NHWC around our TPU ops.
"""

from __future__ import annotations

import struct
from typing import Any, Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from fast_neural_style_transfer_tpu.ops import (
    conv_transpose2d,
    instance_norm,
    max_pool2d,
    reflect_conv2d,
)
from fast_neural_style_transfer_tpu.ops.conv import _conv

# -- wire-format reader ------------------------------------------------------


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    n = 0
    shift = 0
    while True:
        b = buf[i]
        n |= (b & 0x7F) << shift
        shift += 7
        i += 1
        if not b & 0x80:
            return n, i


def _fields(buf: bytes):
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    while i < len(buf):
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i : i + ln]
            i += ln
        elif wire == 5:
            v = struct.unpack("<f", buf[i : i + 4])[0]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, v


def _parse_tensor(buf: bytes) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype = None
    name = ""
    raw = b""
    for field, wire, v in _fields(buf):
        if field == 1:
            if wire == 2:  # packed
                j = 0
                while j < len(v):
                    d, j = _read_varint(v, j)
                    dims.append(d)
            else:
                dims.append(v)
        elif field == 2:
            dtype = v
        elif field == 8:
            name = v.decode()
        elif field == 9:
            raw = v
    np_dtype = {1: np.float32, 7: np.int64}[dtype]
    return name, np.frombuffer(raw, np_dtype).reshape(dims)


def _parse_attr(buf: bytes) -> Tuple[str, Any]:
    name = ""
    value: Any = None
    ints: List[int] = []
    for field, wire, v in _fields(buf):
        if field == 1:
            name = v.decode()
        elif field == 2:
            value = v  # float
        elif field == 3:
            value = v  # int
        elif field == 4:
            value = v.decode()  # string
        elif field == 8:
            # repeated int64 ints: proto3 encoders (protoc, onnx) emit these
            # packed (one length-delimited blob of varints); our own writer
            # emits them unpacked. Accept both.
            if wire == 2:
                j = 0
                while j < len(v):
                    d, j = _read_varint(v, j)
                    ints.append(d)
            else:
                ints.append(v)
    return name, (ints if ints else value)


def _parse_node(buf: bytes) -> Dict[str, Any]:
    n: Dict[str, Any] = {"inputs": [], "outputs": [], "op": "", "attrs": {}}
    for field, wire, v in _fields(buf):
        if field == 1:
            n["inputs"].append(v.decode())
        elif field == 2:
            n["outputs"].append(v.decode())
        elif field == 4:
            n["op"] = v.decode()
        elif field == 5:
            k, val = _parse_attr(v)
            n["attrs"][k] = val
    return n


def parse_model(data: bytes) -> Dict[str, Any]:
    """ModelProto bytes -> {nodes, initializers, inputs, outputs, opset}."""
    graph_buf = None
    opset = None
    for field, wire, v in _fields(data):
        if field == 7:
            graph_buf = v
        elif field == 8:
            for f2, _, v2 in _fields(v):
                if f2 == 2:
                    opset = v2
    if graph_buf is None:
        raise ValueError("no graph in ONNX model")
    nodes, inits, g_in, g_out = [], {}, [], []
    for field, wire, v in _fields(graph_buf):
        if field == 1:
            nodes.append(_parse_node(v))
        elif field == 5:
            name, arr = _parse_tensor(v)
            inits[name] = arr
        elif field in (11, 12):
            for f2, _, v2 in _fields(v):
                if f2 == 1:
                    (g_in if field == 11 else g_out).append(v2.decode())
    return {
        "nodes": nodes,
        "initializers": inits,
        "inputs": g_in,
        "outputs": g_out,
        "opset": opset,
    }


# -- executor ----------------------------------------------------------------


def _nhwc(x):
    return jnp.transpose(x, (0, 2, 3, 1))


def _nchw(x):
    return jnp.transpose(x, (0, 3, 1, 2))


def run_model(data: bytes, feeds: Dict[str, np.ndarray]) -> List[np.ndarray]:
    """Execute the parsed graph; feeds/results are NCHW (ONNX convention)."""
    m = parse_model(data)
    env: Dict[str, Any] = dict(m["initializers"])
    for k, v in feeds.items():
        env[k] = np.asarray(v)
    for n in m["nodes"]:
        op, ins, attrs = n["op"], n["inputs"], n["attrs"]
        if op == "Pad":
            x, pads = env[ins[0]], np.asarray(env[ins[1]])
            rank = np.asarray(x).ndim
            pairs = [(int(pads[d]), int(pads[d + rank])) for d in range(rank)]
            mode = attrs.get("mode", "constant")
            if isinstance(mode, bytes):
                mode = mode.decode()
            if mode not in ("constant", "reflect"):
                raise NotImplementedError(f"ONNX Pad mode {mode!r} not supported")
            out = jnp.pad(jnp.asarray(x), pairs, mode="reflect" if mode == "reflect" else "constant")
        elif op == "Conv":
            x, w = jnp.asarray(env[ins[0]]), jnp.asarray(env[ins[1]])  # x NCHW, w OIHW
            b = jnp.asarray(env[ins[2]]) if len(ins) > 2 else None
            strides = attrs.get("strides", [1, 1])
            # semantics-bearing attributes this runner does not implement
            # must REJECT, not silently execute wrong (a pads-attribute conv
            # run as VALID would shrink every output by k-1)
            if any(attrs.get("pads", [])):
                raise NotImplementedError(
                    "ONNX Conv pads attribute not supported (this runner "
                    "expects explicit Pad nodes, as our exporter emits)"
                )
            if any(d != 1 for d in attrs.get("dilations", [1, 1])):
                raise NotImplementedError("ONNX Conv dilations not supported")
            if attrs.get("group", 1) != 1:
                raise NotImplementedError("ONNX Conv group != 1 not supported")
            if len(set(strides)) > 1:
                raise NotImplementedError(f"anisotropic Conv strides {strides}")
            w_hwio = jnp.transpose(w, (2, 3, 1, 0))
            out = _conv(_nhwc(x), w_hwio, strides[0], "VALID")
            if b is not None:
                out = out + b
            out = _nchw(out)
        elif op == "ConvTranspose":
            x, w = jnp.asarray(env[ins[0]]), jnp.asarray(env[ins[1]])  # w IOHW
            b = jnp.asarray(env[ins[2]]) if len(ins) > 2 else None
            strides = attrs.get("strides", [1, 1])
            pads = attrs.get("pads", [0, 0, 0, 0])
            op_pads = attrs.get("output_padding", [0, 0])
            if attrs.get("group", 1) != 1:
                raise NotImplementedError("ConvTranspose group != 1 not supported")
            if len(set(pads)) > 1 or len(set(strides)) > 1 or len(set(op_pads)) > 1:
                raise NotImplementedError(
                    f"asymmetric ConvTranspose pads/strides/output_padding "
                    f"not supported: pads={pads} strides={strides} "
                    f"output_padding={op_pads}"
                )
            w_hwio = jnp.transpose(w, (2, 3, 0, 1))
            out = _nchw(
                conv_transpose2d(_nhwc(x), w_hwio, b, stride=strides[0],
                                 padding=pads[0], output_padding=op_pads[0])
            )
        elif op == "InstanceNormalization":
            x, scale, bias = (jnp.asarray(env[i]) for i in ins)
            eps = attrs.get("epsilon", 1e-5)
            out = _nchw(instance_norm(_nhwc(x), scale, bias, eps=eps))
        elif op == "Relu":
            out = jnp.maximum(jnp.asarray(env[ins[0]]), 0)
        elif op == "Add":
            out = jnp.asarray(env[ins[0]]) + jnp.asarray(env[ins[1]])
        elif op == "Sub":
            out = jnp.asarray(env[ins[0]]) - jnp.asarray(env[ins[1]])
        elif op == "Mul":
            out = jnp.asarray(env[ins[0]]) * jnp.asarray(env[ins[1]])
        elif op == "Div":
            out = jnp.asarray(env[ins[0]]) / jnp.asarray(env[ins[1]])
        elif op == "Sqrt":
            out = jnp.sqrt(jnp.asarray(env[ins[0]]))
        elif op == "ReduceMean":
            axes = tuple(attrs.get("axes", []))
            keep = bool(attrs.get("keepdims", 1))
            out = jnp.mean(jnp.asarray(env[ins[0]]),
                           axis=axes or None, keepdims=keep)
        elif op == "MaxPool":
            ks = attrs.get("kernel_shape", [2, 2])
            strides = attrs.get("strides", ks)
            if any(attrs.get("pads", [])):
                raise NotImplementedError("ONNX MaxPool pads not supported")
            if list(ks) != [2, 2] or list(strides) != [2, 2]:
                raise NotImplementedError(
                    f"only 2x2/2 MaxPool supported, got {ks}/{strides}")
            out = _nchw(max_pool2d(_nhwc(jnp.asarray(env[ins[0]]))))
        elif op == "Resize":
            mode = attrs.get("mode", b"nearest")
            mode = mode.decode() if isinstance(mode, bytes) else mode
            ctm = attrs.get("coordinate_transformation_mode", b"half_pixel")
            ctm = ctm.decode() if isinstance(ctm, bytes) else ctm
            nm = attrs.get("nearest_mode", b"round_prefer_floor")
            nm = nm.decode() if isinstance(nm, bytes) else nm
            if (mode, ctm, nm) != ("nearest", "asymmetric", "floor"):
                raise NotImplementedError(
                    f"only nearest/asymmetric/floor Resize supported, got "
                    f"{(mode, ctm, nm)}")
            scales = np.asarray(env[ins[2]])
            if scales.shape != (4,) or scales[0] != 1 or scales[1] != 1 \
                    or scales[2] != int(scales[2]) or scales[3] != int(scales[3]):
                raise NotImplementedError(
                    f"only integer NCHW spatial Resize scales supported: "
                    f"{scales}")
            x = jnp.asarray(env[ins[0]])
            # nearest + asymmetric + floor at integer scale == repeat
            out = jnp.repeat(jnp.repeat(x, int(scales[2]), axis=2),
                             int(scales[3]), axis=3)
        else:
            raise NotImplementedError(f"ONNX op {op} not supported by this runner")
        env[n["outputs"][0]] = out
    return [np.asarray(env[o]) for o in m["outputs"]]


def onnx_stylize(model_path: str, image_path: str, output_path: str) -> str:
    """File-level ONNX inference (the reference's onnx_inference flow with its
    3-D-input bug fixed: input is batched 4-D and ImageNet-normalized)."""
    from fast_neural_style_transfer_tpu.utils.image_io import load_image, save_image

    with open(model_path, "rb") as f:
        data = f.read()
    x = load_image(image_path, (256, 256))  # NHWC normalized
    (out,) = run_model(data, {"input_image": np.transpose(x, (0, 3, 1, 2))})
    save_image(np.transpose(out, (0, 2, 3, 1)), output_path)
    return output_path
