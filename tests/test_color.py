"""Color control (utils/color.py) — AdaIN paper §7.2 / Gatys color control.

The reference repo has no color control; the AdaIN paper defines it, so the
AdaIN family here carries it: 'match' re-colors the style to the content's
RGB statistics before encoding, 'luma' keeps only the stylized luminance.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_neural_style_transfer_tpu.utils.color import (
    luminance_transfer,
    match_color,
)

_RGB2YIQ = np.array([
    [0.299, 0.587, 0.114],
    [0.595716, -0.274453, -0.321263],
    [0.211456, -0.522591, 0.311135],
], np.float32)


def _stats(x):
    flat = np.asarray(x, np.float64).reshape(-1, 3)
    mean = flat.mean(axis=0)
    c = flat - mean
    return mean, (c.T @ c) / len(c)


class TestMatchColor:
    def test_statistics_match_target(self):
        rng = np.random.default_rng(0)
        src = jnp.asarray(rng.uniform(0.2, 0.9, (1, 40, 32, 3)), jnp.float32)
        # a strongly-colored target with correlated channels
        base = rng.uniform(0, 1, (1, 24, 48, 1))
        tgt = jnp.asarray(
            np.concatenate([base * 0.9, base * 0.3 + 0.1,
                            0.8 - base * 0.5], axis=-1), jnp.float32)
        out = match_color(src, tgt)
        m_out, c_out = _stats(out)
        m_tgt, c_tgt = _stats(tgt)
        np.testing.assert_allclose(m_out, m_tgt, atol=1e-4)
        np.testing.assert_allclose(c_out, c_tgt, atol=1e-3)
        assert out.shape == src.shape and out.dtype == src.dtype

    def test_identity_when_target_is_source(self):
        rng = np.random.default_rng(1)
        src = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)), jnp.float32)
        out = match_color(src, src)
        np.testing.assert_allclose(np.asarray(out), np.asarray(src),
                                   atol=2e-3)

    def test_rejects_non_nhwc(self):
        x = jnp.zeros((8, 8, 3))
        with pytest.raises(ValueError, match="NHWC"):
            match_color(x, x)

    def test_jittable(self):
        rng = np.random.default_rng(2)
        src = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
        tgt = jnp.asarray(rng.uniform(0, 1, (1, 8, 8, 3)), jnp.float32)
        eager = match_color(src, tgt)
        jitted = jax.jit(match_color)(src, tgt)
        np.testing.assert_allclose(np.asarray(jitted), np.asarray(eager),
                                   atol=1e-5)


class TestLuminanceTransfer:
    def test_chrominance_is_contents(self):
        rng = np.random.default_rng(3)
        stylized = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
        content = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
        out = luminance_transfer(stylized, content)
        iq_out = np.einsum("...c,dc->...d", np.asarray(out), _RGB2YIQ)[..., 1:]
        iq_c = np.einsum("...c,dc->...d", np.asarray(content), _RGB2YIQ)[..., 1:]
        np.testing.assert_allclose(iq_out, iq_c, atol=1e-4)

    def test_luminance_tracks_stylized_structure(self):
        """Y(out) is an affine map of Y(stylized) (shifted to the content's
        mean/std), so their correlation across pixels must be ~1."""
        rng = np.random.default_rng(4)
        stylized = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
        content = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)), jnp.float32)
        out = luminance_transfer(stylized, content)
        y = lambda v: np.einsum("...c,dc->...d", np.asarray(v),
                                _RGB2YIQ)[..., 0].ravel()
        r = np.corrcoef(y(out), y(stylized))[0, 1]
        assert r > 0.999, r

    def test_identity_when_same_image(self):
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.uniform(0, 1, (1, 12, 12, 3)), jnp.float32)
        np.testing.assert_allclose(np.asarray(luminance_transfer(x, x)),
                                   np.asarray(x), atol=1e-4)

    def test_shape_mismatch_rejected(self):
        a = jnp.zeros((1, 8, 8, 3))
        b = jnp.zeros((1, 16, 8, 3))
        with pytest.raises(ValueError, match="must match"):
            luminance_transfer(a, b)


@pytest.mark.slow
def test_adain_cli_preserve_color_end_to_end(tmp_path):
    """fnst-adain stylize --preserve_color match|luma write valid images;
    'match' visibly shifts the palette toward the content vs 'off'."""
    from PIL import Image

    from fast_neural_style_transfer_tpu.cli.adain import main as adain_main
    from fast_neural_style_transfer_tpu.models.adain import AdaINDecoder
    from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

    rng = np.random.default_rng(0)
    content_p = str(tmp_path / "content.jpg")
    style_p = str(tmp_path / "style.jpg")
    # content: green-ish; style: red-ish — 'match' should pull the style's
    # red toward the content's palette before encoding
    c = np.zeros((48, 40, 3), np.uint8)
    c[..., 1] = rng.integers(100, 255, (48, 40))
    Image.fromarray(c).save(content_p)
    s = np.zeros((40, 40, 3), np.uint8)
    s[..., 0] = rng.integers(100, 255, (40, 40))
    Image.fromarray(s).save(style_p)

    dec_p = str(tmp_path / "dec.npz")
    save_params_npz(AdaINDecoder.init(jax.random.PRNGKey(0)), dec_p)

    outs = {}
    for mode in ("off", "match", "luma"):
        out_p = str(tmp_path / f"out_{mode}.jpg")
        adain_main(["stylize", "--decoder", dec_p,
                    "--content_image", content_p, "--style_image", style_p,
                    "--output", out_p, "--preserve_color", mode])
        outs[mode] = np.asarray(Image.open(out_p), np.float32)
        assert outs[mode].shape == (48, 40, 3)
    # 'luma' replaces the output's chrominance with the content's — a shift
    # that survives uint8 quantization even under a random decoder
    assert np.abs(outs["luma"] - outs["off"]).mean() > 1.0
    # 'match' changes the STYLE's statistics; a random decoder responds to
    # style only weakly (sub-1/255 in pixels), so assert its effect at
    # float level through the library instead
    from fast_neural_style_transfer_tpu.models.adain import stylize_arbitrary
    from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
    from fast_neural_style_transfer_tpu.utils.color import match_color
    from fast_neural_style_transfer_tpu.utils.image_io import load_image

    vgg = VGG19Features.init(jax.random.PRNGKey(0))
    dec = AdaINDecoder.init(jax.random.PRNGKey(0))
    c = jnp.asarray(load_image(content_p))
    s = jnp.asarray(load_image(style_p, (40, 40)))
    out_plain = np.asarray(stylize_arbitrary(dec, vgg, c, s))
    out_match = np.asarray(stylize_arbitrary(dec, vgg, c, match_color(s, c)))
    assert np.abs(out_match - out_plain).max() > 1e-5


@pytest.mark.slow
def test_adain_cli_preserve_color_match_rejected_in_bulk(tmp_path):
    """'match' re-colors the style pixels per content — incompatible with
    the bulk engine's once-per-job cached style. 'luma' IS bulk-servable
    (folded into the jitted roundtrip; covered below)."""
    from fast_neural_style_transfer_tpu.cli.adain import main as adain_main

    with pytest.raises(SystemExit, match="per-content"):
        adain_main(["stylize", "--decoder", "x.npz",
                    "--content_dir", str(tmp_path), "--style_image", "s.jpg",
                    "--preserve_color", "match"])


class TestServingLuma:
    """preserve_color='luma' folded into ArbitraryStylizer's jitted u8
    roundtrip: the serving output keeps the content's chrominance."""

    def test_serving_output_keeps_content_chroma(self):
        from fast_neural_style_transfer_tpu.infer.adain import (
            ArbitraryStylizer,
        )
        from fast_neural_style_transfer_tpu.models.adain import AdaINDecoder
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

        rng = np.random.default_rng(0)
        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        dec = AdaINDecoder.init(jax.random.PRNGKey(1))
        content = rng.integers(0, 255, (2, 32, 32, 3), dtype=np.uint8)
        style = rng.integers(0, 255, (24, 24, 3), dtype=np.uint8)

        plain = ArbitraryStylizer(dec, vgg, bucket_multiple=8)
        plain.set_style_u8(style)
        luma = ArbitraryStylizer(dec, vgg, bucket_multiple=8,
                                 preserve_color="luma")
        luma.set_style_u8(style)
        out_p = plain.stylize_u8(content).astype(np.float32)
        out_l = luma.stylize_u8(content).astype(np.float32)

        iq = lambda v: np.einsum("...c,dc->...d", v / 255.0,
                                 _RGB2YIQ)[..., 1:]
        c_iq = iq(content.astype(np.float32))
        # the luma output's chrominance is much closer to the content's
        d_l = np.abs(iq(out_l) - c_iq).mean()
        d_p = np.abs(iq(out_p) - c_iq).mean()
        assert d_l < d_p * 0.5, (d_l, d_p)

    def test_match_mode_rejected_for_serving(self):
        from fast_neural_style_transfer_tpu.infer.adain import (
            ArbitraryStylizer,
        )
        from fast_neural_style_transfer_tpu.models.adain import AdaINDecoder
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

        with pytest.raises(ValueError, match="cached style"):
            ArbitraryStylizer(AdaINDecoder.init(jax.random.PRNGKey(0)),
                              VGG19Features.init(jax.random.PRNGKey(1)),
                              preserve_color="match")


def test_flagship_stylizer_luma_in_graph():
    """Stylizer(preserve_color='luma'): the u8 roundtrip's output keeps the
    content's chrominance, entirely in-graph."""
    from fast_neural_style_transfer_tpu.infer.stylize import Stylizer
    from fast_neural_style_transfer_tpu.models import TransformerNet

    rng = np.random.default_rng(0)
    params = TransformerNet.init(jax.random.PRNGKey(0))
    content = rng.integers(0, 255, (1, 32, 32, 3), dtype=np.uint8)

    plain = Stylizer(params, bucket_multiple=8).stylize_u8(content)
    luma = Stylizer(params, bucket_multiple=8,
                    preserve_color="luma").stylize_u8(content)
    iq = lambda v: np.einsum("...c,dc->...d",
                             v.astype(np.float32) / 255.0, _RGB2YIQ)[..., 1:]
    c_iq = iq(content)
    assert np.abs(iq(luma) - c_iq).mean() < np.abs(iq(plain) - c_iq).mean() * 0.5

    with pytest.raises(ValueError, match="preserve_color"):
        Stylizer(params, preserve_color="match")
