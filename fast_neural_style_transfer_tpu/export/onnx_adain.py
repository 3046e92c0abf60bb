"""AdaIN pipeline -> ONNX export (opset 11, dependency-free writer).

Serializes the FULL arbitrary-style pipeline — VGG19 encoder to relu4_1
(run on both inputs), the AdaIN statistic re-normalization, and the trained
decoder — as one graph with two inputs (``content_image``, ``style_image``,
NCHW, ImageNet-normalized like every model in this framework) and one
output (``output_image``). The style image is an ONNX runtime input, so the
exported artifact keeps the family's defining property: any style, no
re-export. ``alpha`` (style strength) is baked at export time. Passing
``baked_style`` instead freezes one style's (mu, sigma) moments into the
graph and drops the style input + its VGG branch entirely — a smaller,
faster single-purpose artifact for deployments that serve one style.

Ops (all opset-11 standard): Pad, Conv, MaxPool, Relu, Resize(nearest),
ReduceMean, Sub, Mul, Div, Sqrt, Add. The sibling mini-runtime
(export/onnx_runtime.py) executes every one of them, so the exported bytes
are verified end-to-end against ``stylize_arbitrary`` in tests.

No reference counterpart (the reference exports only its single-style net,
/root/reference/onnx_version/onnx_model.py); weight names are this
framework's own (``vgg.conv1_1.weight``, ``decoder.0.weight``, ...).
"""

from __future__ import annotations

from typing import Any, Sequence, Union

import numpy as np

from fast_neural_style_transfer_tpu.export import onnx_writer as ow
from fast_neural_style_transfer_tpu.export.onnx_export import _GraphBuilder
from fast_neural_style_transfer_tpu.models.adain import _DECODER_CFG, ENCODE_TAP
from fast_neural_style_transfer_tpu.models.vgg import _CFG as VGG_CFG

CONTENT_NAME = "content_image"
STYLE_NAME = "style_image"
ALPHA_NAME = "alpha"
OUTPUT_NAME = "output_image"


class _AdaINBuilder(_GraphBuilder):
    """The stylizer graph builder plus the ops AdaIN needs."""

    def init_tensor(self, name: str, arr: np.ndarray) -> str:
        # both VGG branches (content + style) reference the same weights;
        # emit each initializer once or the graph carries duplicate names
        if not hasattr(self, "_emitted"):
            self._emitted = set()
        if name in self._emitted:
            return name
        self._emitted.add(name)
        return super().init_tensor(name, arr)

    def zero_conv(self, x: str, prefix: str, k: int = 3) -> str:
        """VGG conv: explicit constant Pad(k//2) + VALID Conv (the runner
        rejects the pads attribute by design)."""
        padded = self.fresh("zpad")
        self.nodes.append(
            ow.node("Pad", [x, self._pads_const(k // 2)], [padded],
                    mode="constant")
        )
        out = self.fresh("conv")
        self.nodes.append(
            ow.node(
                "Conv",
                [padded, self._weight(prefix + ".weight"),
                 self._weight(prefix + ".bias")],
                [out],
                strides=[1, 1],
                kernel_shape=[k, k],
            )
        )
        return out

    def max_pool(self, x: str) -> str:
        out = self.fresh("pool")
        self.nodes.append(
            ow.node("MaxPool", [x], [out], kernel_shape=[2, 2], strides=[2, 2])
        )
        return out

    def upsample2x(self, x: str) -> str:
        """Resize nearest x2 == jnp.repeat: asymmetric + floor rounding."""
        if not hasattr(self, "_resize_consts"):
            roi = self.init_tensor("resize_roi", np.zeros((0,), np.float32))
            scales = self.init_tensor(
                "resize_scales", np.asarray([1, 1, 2, 2], np.float32)
            )
            self._resize_consts = (roi, scales)
        roi, scales = self._resize_consts
        out = self.fresh("up")
        self.nodes.append(
            ow.node("Resize", [x, roi, scales], [out], mode="nearest",
                    coordinate_transformation_mode="asymmetric",
                    nearest_mode="floor")
        )
        return out

    def scalar(self, value: float) -> str:
        name = self.fresh("const")
        return self.init_tensor(name, np.asarray(value, np.float32))

    def binop(self, op: str, a: str, b: str, out: str = "") -> str:
        out = out or self.fresh(op.lower())
        self.nodes.append(ow.node(op, [a, b], [out]))
        return out

    def channel_stats(self, x: str, eps: float = 1e-5):
        """ReduceMean/Sqrt chain mirroring models.adain.channel_stats."""
        mu = self.fresh("mean")
        self.nodes.append(
            ow.node("ReduceMean", [x], [mu], axes=[2, 3], keepdims=1)
        )
        d = self.binop("Sub", x, mu)
        var = self.fresh("var")
        self.nodes.append(
            ow.node("ReduceMean", [self.binop("Mul", d, d)], [var],
                    axes=[2, 3], keepdims=1)
        )
        sd = self.fresh("std")
        self.nodes.append(
            ow.node("Sqrt", [self.binop("Add", var, self.scalar(eps))], [sd])
        )
        return mu, sd

    def conv1x1_const(self, x: str, name: str, w_oihw: np.ndarray,
                      out: str = "") -> str:
        """Pointwise conv with a constant weight — how channel mixes (the
        RGB<->YIQ changes of basis) are expressed without Slice/Concat."""
        w = self.init_tensor(name, np.asarray(w_oihw, np.float32))
        o = out or self.fresh("mix")
        self.nodes.append(
            ow.node("Conv", [x, w], [o], strides=[1, 1], kernel_shape=[1, 1]))
        return o

    def stats_raw(self, x: str):
        """(mean, sqrt(var)) over H, W — NO epsilon, matching
        utils.color.luminance_transfer's formula exactly."""
        mu = self.fresh("mean")
        self.nodes.append(
            ow.node("ReduceMean", [x], [mu], axes=[2, 3], keepdims=1))
        d = self.binop("Sub", x, mu)
        var = self.fresh("var")
        self.nodes.append(
            ow.node("ReduceMean", [self.binop("Mul", d, d)], [var],
                    axes=[2, 3], keepdims=1))
        sd = self.fresh("std")
        self.nodes.append(ow.node("Sqrt", [var], [sd]))
        return mu, sd

    def channel_affine(self, name: str, vec: np.ndarray) -> str:
        """(1, 3, 1, 1) per-channel constant (the ImageNet mean/std)."""
        return self.init_tensor(name, np.asarray(vec, np.float32)
                                .reshape(1, 3, 1, 1))

    def vgg_to_relu4_1(self, x: str) -> str:
        """VGG19 feature walk up to the AdaIN encode tap."""
        for name, cout in VGG_CFG:
            if not cout:
                x = self.max_pool(x)
                continue
            x = self.relu(self.zero_conv(x, f"vgg.{name}"))
            if "relu" + name[4:] == ENCODE_TAP:
                return x
        raise AssertionError(f"{ENCODE_TAP} not reached in VGG cfg")


def build_adain_onnx(
    decoder_params: Any,
    vgg_params: Any,
    *,
    alpha: float = 1.0,
    content_shape: Sequence[Union[int, str]] = (1, 3, 256, 256),
    style_shape: Sequence[Union[int, str]] = (1, 3, 256, 256),
    baked_style=None,
    preserve_color: str = "off",
    opset_version: int = 11,
) -> bytes:
    """Serialize the arbitrary-style pipeline to ONNX ModelProto bytes.

    Static H/W must be multiples of 8 (VGG pools + decoder ups); symbolic
    (string) dims defer that to the runtime.

    ``baked_style``: optional (mu, sigma) pair from
    ``models.adain.blended_style_stats`` (NHWC (1, 1, 1, C)). When given,
    the style's moments ship as graph constants and the artifact becomes a
    SINGLE-input (content only) graph — the AdaIN analogue of the
    multi-style family's ``bake_style``: fix the style at export, drop the
    per-image style encode. ``style_shape`` is ignored in that case.

    ``alpha``: a float bakes that strength into the graph; the string
    ``"input"`` adds a scalar ``alpha`` graph input instead, so the
    artifact keeps the family's runtime strength knob.

    ``preserve_color='luma'`` bakes Gatys color control into the artifact:
    the decoder output keeps only its luminance, chrominance comes from the
    content input — de-normalize both, change basis to YIQ (pointwise
    constant convs: no Slice/Concat needed), shift the stylized Y to the
    content Y's mean/std, mix back, re-normalize. Matches
    ``utils.color.luminance_transfer`` exactly (same no-epsilon stats)."""
    shapes = [(content_shape, "content")]
    if baked_style is None:
        shapes.append((style_shape, "style"))
    for shape, what in shapes:
        for d in shape[2:]:
            if isinstance(d, int) and d % 8:
                raise ValueError(f"{what} dims {shape} must be multiples of 8")

    weights = {}
    for name, cout in VGG_CFG:
        if not cout:
            continue
        p = vgg_params[name]
        weights[f"vgg.{name}.weight"] = np.transpose(
            np.asarray(p["w"], np.float32), (3, 2, 0, 1))  # HWIO -> OIHW
        weights[f"vgg.{name}.bias"] = np.asarray(p["b"], np.float32)
        if "relu" + name[4:] == ENCODE_TAP:
            break
    for i, conv in enumerate(decoder_params["convs"]):
        weights[f"decoder.{i}.weight"] = np.transpose(
            np.asarray(conv["w"], np.float32), (3, 2, 0, 1))
        weights[f"decoder.{i}.bias"] = np.asarray(conv["b"], np.float32)

    g = _AdaINBuilder(weights)

    c_feat = g.vgg_to_relu4_1(CONTENT_NAME)
    mu_c, sd_c = g.channel_stats(c_feat)
    if baked_style is not None:
        mu_arr, sd_arr = (
            np.transpose(np.asarray(a, np.float32), (0, 3, 1, 2))  # NHWC->NCHW
            for a in baked_style
        )
        mu_s = g.init_tensor("baked_style.mu", mu_arr)
        sd_s = g.init_tensor("baked_style.sigma", sd_arr)
    else:
        s_feat = g.vgg_to_relu4_1(STYLE_NAME)
        mu_s, sd_s = g.channel_stats(s_feat)
    t = g.binop(
        "Add",
        g.binop("Mul", g.binop("Div", g.binop("Sub", c_feat, mu_c), sd_c),
                sd_s),
        mu_s,
    )
    if alpha == "input":
        one_minus = g.binop("Sub", g.scalar(1.0), ALPHA_NAME)
        t = g.binop(
            "Add",
            g.binop("Mul", t, ALPHA_NAME),
            g.binop("Mul", c_feat, one_minus),
        )
    elif alpha != 1.0:
        t = g.binop(
            "Add",
            g.binop("Mul", t, g.scalar(float(alpha))),
            g.binop("Mul", c_feat, g.scalar(1.0 - float(alpha))),
        )

    if preserve_color not in ("off", "luma"):
        raise ValueError(
            f"preserve_color must be 'off' or 'luma' (got {preserve_color!r});"
            " 'match' re-colors the style pixels per content and cannot be a"
            " fixed graph")
    h = t
    last = len(_DECODER_CFG) - 1
    final_name = OUTPUT_NAME if preserve_color == "off" else ""
    for i, (_, up) in enumerate(_DECODER_CFG):
        if up:
            h = g.upsample2x(h)
        h = g.reflect_conv(h, f"decoder.{i}", 3, 1,
                           out=final_name if i == last else "")
        if i != last:
            h = g.relu(h)

    if preserve_color == "luma":
        # Gatys color control, graph-resident: stylized LUMINANCE (shifted
        # to the content's Y mean/std, utils/color.py formula verbatim) +
        # content CHROMINANCE, via YIQ changes of basis as pointwise convs
        from fast_neural_style_transfer_tpu.utils.color import (
            _RGB2YIQ,
            _YIQ2RGB,
        )
        from fast_neural_style_transfer_tpu.utils.image_io import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        m = np.asarray(_RGB2YIQ, np.float64)
        a = np.asarray(_YIQ2RGB, np.float64)
        mean = g.channel_affine("imagenet.mean", IMAGENET_MEAN)
        std = g.channel_affine("imagenet.std", IMAGENET_STD)
        s01 = g.binop("Add", g.binop("Mul", h, std), mean)
        c01 = g.binop("Add", g.binop("Mul", CONTENT_NAME, std), mean)
        rgb2y = m[0:1].reshape(1, 3, 1, 1)
        y_s = g.conv1x1_const(s01, "color.rgb2y", rgb2y)
        y_c = g.conv1x1_const(c01, "color.rgb2y", rgb2y)
        mu_sy, sd_sy = g.stats_raw(y_s)
        mu_cy, sd_cy = g.stats_raw(y_c)
        y_new = g.binop(
            "Add",
            g.binop("Mul",
                    g.binop("Div", g.binop("Sub", y_s, mu_sy),
                            g.binop("Add", sd_sy, g.scalar(1e-6))),
                    sd_cy),
            mu_cy,
        )
        out01 = g.binop(
            "Add",
            g.conv1x1_const(y_new, "color.y2rgb",
                            a[:, :1].reshape(3, 1, 1, 1)),
            g.conv1x1_const(c01, "color.iq2rgb",
                            (a[:, 1:] @ m[1:]).reshape(3, 3, 1, 1)),
        )
        g.binop("Div", g.binop("Sub", out01, mean), std, out=OUTPUT_NAME)

    out_shape = list(content_shape)
    for i in (2, 3):
        if isinstance(out_shape[i], str):
            out_shape[i] = f"out_{out_shape[i]}"
    inputs = [ow.value_info(CONTENT_NAME, content_shape)]
    if baked_style is None:
        inputs.append(ow.value_info(STYLE_NAME, style_shape))
    if alpha == "input":
        inputs.append(ow.value_info(ALPHA_NAME, ()))
    graph_msg = ow.graph(
        g.nodes,
        "adain_style_transfer",
        inputs=inputs,
        outputs=[ow.value_info(OUTPUT_NAME, out_shape)],
        initializers=g.initializers,
    )
    return ow.model(graph_msg, opset_version=opset_version)


def export_adain_onnx(decoder_params: Any, vgg_params: Any, path: str,
                      **kw) -> str:
    data = build_adain_onnx(decoder_params, vgg_params, **kw)
    with open(path, "wb") as f:
        f.write(data)
    return path
