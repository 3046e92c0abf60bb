"""AdaIN arbitrary-style transfer (models/adain.py, train/adain.py).

Second model family, beyond the reference's one-net-per-style regime
(Huang & Belongie 2017): pins the AdaIN statistic-alignment property, the
decoder geometry, the training step's loss mechanics and robustness
contract, data-parallel parity on the 8-device mesh, and the end-to-end
CLI train -> arbitrary-style stylize flow.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from fast_neural_style_transfer_tpu.models.adain import (
    AdaINDecoder,
    adain,
    channel_stats,
    stylize_arbitrary,
)


class TestAdaINOp:
    def test_stats_match_numpy(self):
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4)) * 3 + 1
        mu, sd = channel_stats(x)
        ref_mu = np.asarray(x).mean(axis=(1, 2), keepdims=True)
        ref_sd = np.sqrt(np.asarray(x).var(axis=(1, 2), keepdims=True) + 1e-5)
        np.testing.assert_allclose(np.asarray(mu), ref_mu, rtol=1e-5)
        np.testing.assert_allclose(np.asarray(sd), ref_sd, rtol=1e-4)

    def test_adain_aligns_statistics(self):
        """The defining property: output channel stats == style channel
        stats, regardless of the content distribution."""
        c = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 8)) * 5 - 2
        s = jax.random.normal(jax.random.PRNGKey(2), (2, 16, 16, 8)) * 0.5 + 3
        out = adain(c, s)
        mu_o, sd_o = channel_stats(out)
        mu_s, sd_s = channel_stats(s)
        np.testing.assert_allclose(np.asarray(mu_o), np.asarray(mu_s),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(sd_o), np.asarray(sd_s),
                                   rtol=1e-3, atol=1e-4)

    def test_adain_identity_when_same_stats(self):
        c = jax.random.normal(jax.random.PRNGKey(3), (1, 8, 8, 4))
        np.testing.assert_allclose(np.asarray(adain(c, c)), np.asarray(c),
                                   atol=1e-4)


class TestDecoder:
    @pytest.mark.slow
    def test_geometry_and_param_shapes(self):
        params = AdaINDecoder.init(jax.random.PRNGKey(0))
        assert params["convs"][0]["w"].shape == (3, 3, 512, 256)
        assert params["convs"][-1]["w"].shape == (3, 3, 64, 3)
        feat = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 6, 512))
        out = AdaINDecoder.apply(params, feat)
        assert out.shape == (2, 32, 48, 3)  # three x2 ups

    @pytest.mark.slow
    def test_stylize_arbitrary_end_to_end_shapes(self):
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        dec = AdaINDecoder.init(jax.random.PRNGKey(1))
        content = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
        style = jax.random.normal(jax.random.PRNGKey(3), (1, 48, 40, 3))
        out = stylize_arbitrary(dec, vgg, content, style)
        assert out.shape == (1, 32, 32, 3)
        # alpha=0 must equal decoding the raw content feature (style-free)
        out0 = stylize_arbitrary(dec, vgg, content, style, alpha=0.0)
        (c_feat,) = VGG19Features.apply(vgg, content, ("relu4_1",))
        np.testing.assert_allclose(
            np.asarray(out0), np.asarray(AdaINDecoder.apply(dec, c_feat)),
            atol=1e-5,
        )
        # different styles produce different outputs
        style2 = jax.random.normal(jax.random.PRNGKey(4), (1, 48, 40, 3)) * 2
        out2 = stylize_arbitrary(dec, vgg, content, style2)
        assert np.abs(np.asarray(out) - np.asarray(out2)).max() > 1e-4

    @pytest.mark.slow
    def test_style_interpolation(self):
        """Paper eq. 15: a convex combination of per-style AdaIN targets.
        Weight (1, 0) must equal the single-style path; weights must be
        validated convex."""
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        dec = AdaINDecoder.init(jax.random.PRNGKey(1))
        content = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
        s1 = jax.random.normal(jax.random.PRNGKey(3), (1, 40, 40, 3))
        s2 = jax.random.normal(jax.random.PRNGKey(4), (1, 24, 32, 3)) * 2

        solo = stylize_arbitrary(dec, vgg, content, s1)
        degenerate = stylize_arbitrary(dec, vgg, content, [s1, s2],
                                       style_weights=[1.0, 0.0])
        np.testing.assert_allclose(np.asarray(degenerate), np.asarray(solo),
                                   atol=1e-5)
        blend = stylize_arbitrary(dec, vgg, content, [s1, s2],
                                  style_weights=[0.5, 0.5])
        assert np.abs(np.asarray(blend) - np.asarray(solo)).max() > 1e-4
        with pytest.raises(ValueError, match="convex"):
            stylize_arbitrary(dec, vgg, content, [s1, s2],
                              style_weights=[0.8, 0.8])
        with pytest.raises(ValueError, match="style_weights"):
            stylize_arbitrary(dec, vgg, content, [s1, s2],
                              style_weights=[1.0])


class TestTrainStep:
    def _setup(self, batch=4, hw=32):
        import optax

        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
        from fast_neural_style_transfer_tpu.train.adain import make_adain_train_step
        from fast_neural_style_transfer_tpu.train.state import create_train_state

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        state = create_train_state(AdaINDecoder.init(jax.random.PRNGKey(1)), opt)
        step = make_adain_train_step(opt, donate=False)
        content = jax.random.normal(jax.random.PRNGKey(2), (batch, hw, hw, 3))
        style = jax.random.normal(jax.random.PRNGKey(3), (batch, hw, hw, 3))
        return state, vgg, content, style, step

    @pytest.mark.slow
    def test_loss_decreases_on_fixed_batch(self):
        state, vgg, content, style, step = self._setup()
        losses = []
        for _ in range(6):
            state, metrics = step(state, vgg, content, style)
            losses.append(float(metrics["loss"]))
        assert all(np.isfinite(losses))
        assert losses[-1] < losses[0]
        assert int(state.step) == 6

    @pytest.mark.slow
    def test_remat_matches_baseline(self):
        """--remat (jax.checkpoint on the decoder + output-VGG forwards) is
        a memory/compute trade, not a numerics change."""
        import optax

        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
        from fast_neural_style_transfer_tpu.train.adain import (
            make_adain_train_step,
        )
        from fast_neural_style_transfer_tpu.train.state import (
            create_train_state,
        )

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        opt = optax.adam(1e-3)
        state = create_train_state(AdaINDecoder.init(jax.random.PRNGKey(1)),
                                   opt)
        content = jax.random.normal(jax.random.PRNGKey(2), (2, 32, 32, 3))
        style = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))

        s_base, m_base = make_adain_train_step(opt, donate=False)(
            state, vgg, content, style)
        s_rm, m_rm = make_adain_train_step(opt, donate=False, remat=True)(
            state, vgg, content, style)
        np.testing.assert_allclose(float(m_rm["loss"]),
                                   float(m_base["loss"]), rtol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7),
            s_rm.params, s_base.params,
        )

    @pytest.mark.slow
    def test_dp_sharded_matches_single_device(self):
        """The AdaIN step must partition over the data mesh value-identically
        (per-(b, c) stats never cross the batch axis)."""
        import optax

        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan
        from fast_neural_style_transfer_tpu.train.adain import make_adain_train_step
        from fast_neural_style_transfer_tpu.train.state import (
            create_train_state,
            replicate_state,
        )

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        opt = optax.sgd(1e-3)  # see test_multistyle: Adam amplifies ~0 grads
        state = create_train_state(AdaINDecoder.init(jax.random.PRNGKey(1)), opt)
        step = make_adain_train_step(opt, donate=False)
        content = jax.random.normal(jax.random.PRNGKey(2), (8, 32, 32, 3))
        style = jax.random.normal(jax.random.PRNGKey(3), (8, 32, 32, 3))

        s1, m1 = step(state, vgg, content, style)

        plan = make_mesh_plan()
        s8, m8 = step(
            replicate_state(state, plan.replicated),
            jax.device_put(vgg, plan.replicated),
            jax.device_put(content, plan.batch_sharding),
            jax.device_put(style, plan.batch_sharding),
        )
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=1e-5)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
            ),
            s1.params, s8.params,
        )

    @pytest.mark.slow
    def test_nonfinite_loss_skips_update(self):
        state, vgg, content, style, step = self._setup()
        bad = content.at[0, 0, 0, 0].set(jnp.nan)
        new_state, metrics = step(state, vgg, bad, style)
        assert float(metrics["skipped_nonfinite"]) == 1.0
        assert int(new_state.step) == 0
        jax.tree.map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(b)),
            new_state.params, state.params,
        )


class TestONNXExport:
    @pytest.mark.slow
    def test_preserve_color_luma_in_graph_matches_native(self, tmp_path):
        """preserve_color='luma' baked into the ONNX graph (YIQ changes of
        basis as pointwise convs, no-eps stats) == stylize_arbitrary
        followed by utils.color.luminance_transfer in [0,1] space."""
        from fast_neural_style_transfer_tpu.export.onnx_adain import (
            export_adain_onnx,
        )
        from fast_neural_style_transfer_tpu.export.onnx_runtime import (
            run_model,
        )
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
        from fast_neural_style_transfer_tpu.utils.color import (
            luminance_transfer,
        )
        from fast_neural_style_transfer_tpu.utils.image_io import (
            IMAGENET_MEAN,
            IMAGENET_STD,
        )

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        dec = AdaINDecoder.init(jax.random.PRNGKey(1))
        content = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
        style = jax.random.normal(jax.random.PRNGKey(3), (1, 40, 48, 3))

        path = str(tmp_path / "adain_luma.onnx")
        export_adain_onnx(dec, vgg, path, alpha=0.8,
                          content_shape=(1, 3, 32, 32),
                          style_shape=(1, 3, 40, 48),
                          preserve_color="luma")
        with open(path, "rb") as f:
            data = f.read()
        (out,) = run_model(data, {
            "content_image": np.transpose(np.asarray(content), (0, 3, 1, 2)),
            "style_image": np.transpose(np.asarray(style), (0, 3, 1, 2)),
        })
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        raw = stylize_arbitrary(dec, vgg, content, style, alpha=0.8)
        want01 = luminance_transfer(raw * std + mean, content * std + mean)
        want = (want01 - mean) / std
        # atol 5e-4: the Y-stat chain's f32 accumulation-order noise (~8e-5
        # in [0,1] space) is amplified ~4.4x by the final /std
        np.testing.assert_allclose(
            np.transpose(out, (0, 2, 3, 1)), np.asarray(want),
            rtol=1e-3, atol=5e-4,
        )
        with pytest.raises(ValueError, match="preserve_color"):
            export_adain_onnx(dec, vgg, str(tmp_path / "x.onnx"),
                              preserve_color="match")

    @pytest.mark.slow
    def test_exported_pipeline_matches_native(self, tmp_path):
        """The exported two-input graph, executed by the mini ONNX runtime,
        must reproduce stylize_arbitrary — verifying the whole opset-11
        lowering (VGG walk, stat chain, nearest Resize) end to end."""
        from fast_neural_style_transfer_tpu.export.onnx_adain import (
            export_adain_onnx,
        )
        from fast_neural_style_transfer_tpu.export.onnx_runtime import run_model
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        dec = AdaINDecoder.init(jax.random.PRNGKey(1))
        content = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
        style = jax.random.normal(jax.random.PRNGKey(3), (1, 40, 48, 3))

        path = str(tmp_path / "adain.onnx")
        export_adain_onnx(dec, vgg, path, alpha=0.8,
                          content_shape=(1, 3, 32, 32),
                          style_shape=(1, 3, 40, 48))
        with open(path, "rb") as f:
            data = f.read()
        (out,) = run_model(data, {
            "content_image": np.transpose(np.asarray(content), (0, 3, 1, 2)),
            "style_image": np.transpose(np.asarray(style), (0, 3, 1, 2)),
        })
        native = stylize_arbitrary(dec, vgg, content, style, alpha=0.8)
        np.testing.assert_allclose(
            np.transpose(out, (0, 2, 3, 1)), np.asarray(native),
            rtol=1e-3, atol=1e-4,
        )

    @pytest.mark.slow
    def test_alpha_as_runtime_input(self, tmp_path):
        """alpha='input' exposes a scalar graph input: one artifact, any
        strength at runtime — matches the native path at each alpha."""
        from fast_neural_style_transfer_tpu.export.onnx_adain import (
            export_adain_onnx,
        )
        from fast_neural_style_transfer_tpu.export.onnx_runtime import (
            parse_model,
            run_model,
        )
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        dec = AdaINDecoder.init(jax.random.PRNGKey(1))
        content = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
        style = jax.random.normal(jax.random.PRNGKey(3), (1, 24, 24, 3))

        path = str(tmp_path / "adain_alpha.onnx")
        export_adain_onnx(dec, vgg, path, alpha="input",
                          content_shape=(1, 3, 32, 32),
                          style_shape=(1, 3, 24, 24))
        with open(path, "rb") as f:
            data = f.read()
        assert parse_model(data)["inputs"] == [
            "content_image", "style_image", "alpha"]
        feeds = {
            "content_image": np.transpose(np.asarray(content), (0, 3, 1, 2)),
            "style_image": np.transpose(np.asarray(style), (0, 3, 1, 2)),
        }
        for a in (0.3, 1.0):
            (out,) = run_model(data, {**feeds,
                                      "alpha": np.float32(a)})
            native = stylize_arbitrary(dec, vgg, content, style, alpha=a)
            np.testing.assert_allclose(
                np.transpose(out, (0, 2, 3, 1)), np.asarray(native),
                rtol=1e-3, atol=1e-4, err_msg=f"alpha={a}",
            )

    @pytest.mark.slow
    def test_baked_style_export_single_input(self, tmp_path):
        """baked_style freezes the style moments into the graph: one input,
        no style VGG branch, same output as the live two-input pipeline."""
        from fast_neural_style_transfer_tpu.export.onnx_adain import (
            export_adain_onnx,
        )
        from fast_neural_style_transfer_tpu.export.onnx_runtime import run_model
        from fast_neural_style_transfer_tpu.models.adain import (
            blended_style_stats,
        )
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        dec = AdaINDecoder.init(jax.random.PRNGKey(1))
        content = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
        s1 = jax.random.normal(jax.random.PRNGKey(3), (1, 40, 48, 3))
        s2 = jax.random.normal(jax.random.PRNGKey(4), (1, 24, 24, 3))

        path = str(tmp_path / "adain_baked.onnx")
        export_adain_onnx(
            dec, vgg, path, alpha=0.7,
            content_shape=(1, 3, 32, 32),
            baked_style=blended_style_stats(vgg, [s1, s2], [0.6, 0.4]),
        )
        with open(path, "rb") as f:
            data = f.read()
        # single-input graph: the style input (and its whole VGG branch)
        # is gone from the serialized model
        from fast_neural_style_transfer_tpu.export.onnx_runtime import (
            parse_model,
        )

        assert parse_model(data)["inputs"] == ["content_image"]
        (out,) = run_model(data, {
            "content_image": np.transpose(np.asarray(content), (0, 3, 1, 2)),
        })
        native = stylize_arbitrary(dec, vgg, content, [s1, s2],
                                   style_weights=[0.6, 0.4], alpha=0.7)
        np.testing.assert_allclose(
            np.transpose(out, (0, 2, 3, 1)), np.asarray(native),
            rtol=1e-3, atol=1e-4,
        )

    def test_non_multiple_of_8_rejected(self, tmp_path):
        from fast_neural_style_transfer_tpu.export.onnx_adain import (
            export_adain_onnx,
        )
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

        with pytest.raises(ValueError, match="multiples of 8"):
            export_adain_onnx(
                AdaINDecoder.init(jax.random.PRNGKey(0)),
                VGG19Features.init(jax.random.PRNGKey(1)),
                str(tmp_path / "x.onnx"),
                content_shape=(1, 3, 30, 32),
            )


@pytest.mark.slow
class TestEndToEnd:
    @pytest.fixture
    def workspace(self, tmp_path):
        rng = np.random.default_rng(0)
        for sub in ("content", "styles"):
            d = tmp_path / sub
            d.mkdir()
            for i in range(10):
                Image.fromarray(
                    rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
                ).save(d / f"{sub}_{i}.jpg")
        Image.fromarray(
            rng.integers(0, 256, (48, 48, 3), dtype=np.uint8)
        ).save(tmp_path / "new_style.jpg")  # never seen in training
        return tmp_path

    def test_cli_train_then_arbitrary_stylize(self, workspace):
        from fast_neural_style_transfer_tpu.cli.adain import main as adain_main

        out_dir = str(workspace / "out")
        with pytest.warns(UserWarning, match="VGG19"):
            adain_main([
                "train",
                "--content_dir", str(workspace / "content"),
                "--style_dir", str(workspace / "styles"),
                "--output_dir", out_dir,
                "--total_steps", "2",
                "--batch_size", "8",
                "--image_size", "32", "32",
                "--num_workers", "2",
                "--checkpoint_every", "2",
            ])
        final = os.path.join(out_dir, "adain_decoder_final.npz")
        assert os.path.exists(final)
        records = [json.loads(l)
                   for l in open(os.path.join(out_dir, "metrics.jsonl"))]
        assert records and np.isfinite(records[-1]["loss"])
        # loss-curve PNGs, like the main trainer (reference assets parity)
        assert os.path.exists(os.path.join(out_dir, "loss.png"))

        # stylize with a style image NEVER seen in training — the point of
        # the model family; content size 40 is not a multiple of 8, so the
        # CLI's pad/crop path is exercised too
        out_img = str(workspace / "styled.jpg")
        with pytest.warns(UserWarning, match="VGG19"):
            adain_main([
                "stylize",
                "--decoder", final,
                "--content_image", str(workspace / "content" / "content_0.jpg"),
                "--style_image", str(workspace / "new_style.jpg"),
                "--output", out_img,
                "--alpha", "0.7",
            ])
        with Image.open(out_img) as im:
            assert im.size == (40, 40)

        # Orbax checkpoint dir loads too
        from fast_neural_style_transfer_tpu.cli.adain import load_decoder

        params = load_decoder(os.path.join(out_dir, "checkpoints"))
        assert params["convs"][0]["w"].shape == (3, 3, 512, 256)

    def test_cli_spatial_stylize(self, workspace):
        """--spatial N routes through the H-sharded forward and writes an
        image of the original size (pad/crop handled inside)."""
        from fast_neural_style_transfer_tpu.cli.adain import main as adain_main
        from fast_neural_style_transfer_tpu.models.adain import AdaINDecoder
        from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

        dec = str(workspace / "dec.npz")
        save_params_npz(AdaINDecoder.init(jax.random.PRNGKey(0)), dec)
        out_img = str(workspace / "spatial.jpg")
        with pytest.warns(UserWarning, match="VGG19"):
            adain_main([
                "stylize",
                "--decoder", dec,
                "--content_image", str(workspace / "content" / "content_1.jpg"),
                "--style_image", str(workspace / "new_style.jpg"),
                "--output", out_img,
                "--spatial", "4",
            ])
        with Image.open(out_img) as im:
            assert im.size == (40, 40)

    def test_sigterm_checkpoints_and_exits_cleanly(self, workspace):
        """Same preemption contract as the main trainer (train/loop.py):
        SIGTERM mid-run stops the loop, persists a checkpoint, exits 0."""
        import signal
        import subprocess
        import sys
        import time as _time

        out_dir = workspace / "sig_out"
        code = f"""
import jax
jax.config.update("jax_platforms", "cpu")
from fast_neural_style_transfer_tpu.train.adain import AdaINTrainConfig, train_adain
cfg = AdaINTrainConfig(
    content_dir=r"{workspace / 'content'}",
    style_dir=r"{workspace / 'styles'}",
    output_dir=r"{out_dir}",
    total_steps=10_000, batch_size=8, image_size=(32, 32),
    log_every=1, checkpoint_every=10_000, num_workers=2, resume=False,
)
train_adain(cfg)
"""
        proc = subprocess.Popen(
            [sys.executable, "-c", code],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env={**os.environ,
                 "XLA_FLAGS": "--xla_force_host_platform_device_count=8"},
        )
        metrics = out_dir / "metrics.jsonl"
        deadline = _time.time() + 240
        try:
            while _time.time() < deadline:
                if metrics.exists() and metrics.read_text().strip():
                    break
                if proc.poll() is not None:
                    raise AssertionError(
                        "training exited early: "
                        f"{proc.stdout.read().decode()[-2000:]}"
                    )
                _time.sleep(1)
            else:
                raise AssertionError("no training step within 240s")
            proc.send_signal(signal.SIGTERM)
            out, _ = proc.communicate(timeout=180)
        finally:
            if proc.poll() is None:
                proc.kill()
        assert proc.returncode == 0, out.decode()[-2000:]
        assert b"SIGTERM received" in out
        assert (out_dir / "checkpoints").exists()
        # the final decoder artifact is still written after a SIGTERM stop
        assert (out_dir / "adain_decoder_final.npz").exists()


class TestSpatialAdaIN:
    """H-sharded arbitrary-style inference (infer/spatial_adain.py) must
    match the single-device math: the AdaIN moments are global psums, the
    decoder convs halo-exchange, upsampling is a local row repeat."""

    def _setup(self, seed=0):
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

        rng = np.random.default_rng(seed)
        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        dec = AdaINDecoder.init(jax.random.PRNGKey(1))
        content = jnp.asarray(rng.normal(size=(1, 64, 48, 3)), jnp.float32)
        style = jnp.asarray(rng.normal(size=(1, 40, 40, 3)), jnp.float32)
        return vgg, dec, content, style

    def test_matches_unsharded(self):
        from fast_neural_style_transfer_tpu.infer.spatial_adain import (
            stylize_arbitrary_spatial,
        )
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

        vgg, dec, content, style = self._setup()
        plan = make_mesh_plan(spatial=4)
        ref = stylize_arbitrary(dec, vgg, content, style, alpha=0.8)
        got = stylize_arbitrary_spatial(dec, vgg, content, style, plan,
                                        alpha=0.8)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    def test_interpolation_matches_unsharded(self):
        from fast_neural_style_transfer_tpu.infer.spatial_adain import (
            stylize_arbitrary_spatial,
        )
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

        vgg, dec, content, style = self._setup(1)
        rng = np.random.default_rng(9)
        style2 = jnp.asarray(rng.normal(size=(1, 24, 56, 3)), jnp.float32)
        plan = make_mesh_plan(spatial=4)
        ref = stylize_arbitrary(dec, vgg, content, [style, style2],
                                style_weights=[0.3, 0.7])
        got = stylize_arbitrary_spatial(dec, vgg, content, [style, style2],
                                        plan, style_weights=[0.3, 0.7])
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=2e-4, atol=2e-4)

    @pytest.mark.slow
    def test_odd_sizes_match_single_device(self):
        """Non-shard-aligned sizes are EXACT, not merely finite: the sharded
        route's active-extent masking (zero-filled stage-2 pad kept out of
        every conv, the AdaIN moments, and the decoder reflect boundary)
        reproduces the single-device route — reflect-pad to a multiple of 8,
        forward, crop — to f32 tolerance. 70 rows -> canonical 72, equal-slab
        96 over 4 shards; the relu4_1 extent is 9 rows over 3-row slabs, so
        the virtual reflect row (9 <- 7) crosses a shard boundary."""
        from fast_neural_style_transfer_tpu.core.shapes import (
            pad_to_multiple_reflect,
        )
        from fast_neural_style_transfer_tpu.infer.spatial_adain import (
            stylize_arbitrary_spatial,
        )
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

        vgg, dec, _, style = self._setup(2)
        rng = np.random.default_rng(3)
        plan = make_mesh_plan(spatial=4)
        for h, w in ((70, 50), (41, 50)):
            content = jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32)
            canon, _ = pad_to_multiple_reflect(content, 8)
            ref = np.asarray(stylize_arbitrary(dec, vgg, canon, style,
                                               alpha=0.7))[:, :h, :w, :]
            out = stylize_arbitrary_spatial(dec, vgg, content, style, plan,
                                            alpha=0.7)
            assert out.shape == content.shape
            np.testing.assert_allclose(np.asarray(out), ref,
                                       rtol=2e-4, atol=2e-4)

    def test_bad_weights_rejected(self):
        from fast_neural_style_transfer_tpu.infer.spatial_adain import (
            stylize_arbitrary_spatial,
        )
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

        vgg, dec, content, style = self._setup(4)
        plan = make_mesh_plan(spatial=4)
        with pytest.raises(ValueError, match="convex"):
            stylize_arbitrary_spatial(dec, vgg, content, [style, style],
                                      plan, style_weights=[0.9, 0.4])


class TestArbitraryStylizer:
    """Cached-style serving path (infer/adain.py): u8 roundtrip equals the
    reference stylize_arbitrary up to the final *255 rounding, and the bulk
    directory engine writes one output per input."""

    def _setup(self):
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        dec = AdaINDecoder.init(jax.random.PRNGKey(1))
        return vgg, dec

    def test_set_style_u8_matches_blended_style_stats(self):
        """The cached (mu, sigma) pair must equal blended_style_stats of the
        canonically-normalized style image — pins the u8 -> network-space
        conversion itself (a double-/255 here once shipped: normalize_image
        already divides by 255)."""
        from fast_neural_style_transfer_tpu.infer.adain import ArbitraryStylizer
        from fast_neural_style_transfer_tpu.models.adain import blended_style_stats
        from fast_neural_style_transfer_tpu.utils.image_io import normalize_image

        vgg, dec = self._setup()
        rng = np.random.default_rng(5)
        style_u8 = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        styler = ArbitraryStylizer(dec, vgg).set_style_u8(style_u8)
        mu, sigma = styler._style
        ref_mu, ref_sigma = blended_style_stats(
            vgg, jnp.asarray(normalize_image(style_u8[None])), None)
        np.testing.assert_allclose(np.asarray(mu), np.asarray(ref_mu),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(np.asarray(sigma), np.asarray(ref_sigma),
                                   rtol=1e-5, atol=1e-5)
        # and the stats must be far from what a double-/255 (near-black
        # style) would produce — guards the guard
        dark_mu, _ = blended_style_stats(
            vgg, jnp.asarray(normalize_image((style_u8[None] / 255.0))), None)
        assert float(jnp.abs(mu - dark_mu).max()) > 1e-3

    def test_u8_roundtrip_matches_float_path(self):
        from fast_neural_style_transfer_tpu.infer.adain import ArbitraryStylizer
        from fast_neural_style_transfer_tpu.utils.image_io import (
            denormalize_image,
            normalize_image,
        )

        vgg, dec = self._setup()
        rng = np.random.default_rng(0)
        content_u8 = rng.integers(0, 256, (2, 32, 40, 3), dtype=np.uint8)
        style_u8 = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)

        # bucket 8 = the float path's pad extent, so the global AdaIN
        # moments see identical pixels and the comparison is exact
        styler = ArbitraryStylizer(dec, vgg, bucket_multiple=8)
        styler.set_style_u8(style_u8)
        got = styler.stylize_u8(content_u8, alpha=0.8)

        c = normalize_image(content_u8)
        s = normalize_image(style_u8[None])
        ref = stylize_arbitrary(dec, vgg, jnp.asarray(c), jnp.asarray(s),
                                alpha=0.8)
        ref_u8 = (np.clip(denormalize_image(np.asarray(ref)), 0, 1)
                  * 255.0 + 0.5).astype(np.uint8)
        assert got.shape == ref_u8.shape
        # identical math, different fusion order: allow 1 LSB of rounding
        assert np.abs(got.astype(int) - ref_u8.astype(int)).max() <= 1

    def test_requires_style(self):
        from fast_neural_style_transfer_tpu.infer.adain import ArbitraryStylizer

        vgg, dec = self._setup()
        with pytest.raises(ValueError, match="no style set"):
            ArbitraryStylizer(dec, vgg).stylize_u8(
                np.zeros((1, 16, 16, 3), np.uint8))

    def test_alpha_is_an_operand(self):
        """Different alphas reuse one compiled program (traced operand)."""
        from fast_neural_style_transfer_tpu.infer.adain import ArbitraryStylizer

        vgg, dec = self._setup()
        rng = np.random.default_rng(1)
        styler = ArbitraryStylizer(dec, vgg).set_style_u8(
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
        x = rng.integers(0, 256, (1, 16, 16, 3), dtype=np.uint8)
        a = styler.stylize_u8(x, alpha=1.0)
        b = styler.stylize_u8(x, alpha=0.0)
        assert not np.array_equal(a, b)  # alpha actually does something
        assert styler._fwd_u8._cache_size() == 1

    def test_bucket_shares_compiled_program_across_shapes(self):
        """Heterogeneous source shapes inside one 64-bucket must reuse ONE
        compiled program (the recompile-storm guard for real photo dirs)."""
        from fast_neural_style_transfer_tpu.infer.adain import ArbitraryStylizer

        vgg, dec = self._setup()
        rng = np.random.default_rng(8)
        styler = ArbitraryStylizer(dec, vgg).set_style_u8(
            rng.integers(0, 256, (16, 16, 3), dtype=np.uint8))
        for hw in ((40, 48), (56, 33), (64, 64)):
            out = styler.stylize_u8(
                rng.integers(0, 256, (1, *hw, 3), dtype=np.uint8))
            assert out.shape == (1, *hw, 3)
        assert styler._fwd_u8._cache_size() == 1

    def test_directory_bulk(self, tmp_path):
        from fast_neural_style_transfer_tpu.infer.adain import (
            stylize_directory_arbitrary,
        )
        from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

        vgg, dec = self._setup()
        rng = np.random.default_rng(2)
        content = tmp_path / "content"
        (content / "sub").mkdir(parents=True)
        for i in range(5):
            Image.fromarray(rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
                            ).save(content / f"c{i}.jpg")
        Image.fromarray(rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
                        ).save(content / "sub" / "c0.jpg")
        style = tmp_path / "style.jpg"
        Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                        ).save(style)
        dec_path = str(tmp_path / "dec.npz")
        save_params_npz(dec, dec_path)

        with pytest.warns(UserWarning, match="VGG19"):
            written = stylize_directory_arbitrary(
                dec_path, str(content), str(tmp_path / "out"), str(style),
                batch_size=4)
        assert len(written) == 6 and all(os.path.exists(p) for p in written)
        assert any("sub" in p for p in written)  # subdirs mirrored

    def test_cli_bulk_route(self, tmp_path):
        from fast_neural_style_transfer_tpu.cli.adain import main as adain_main
        from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

        vgg, dec = self._setup()
        rng = np.random.default_rng(3)
        content = tmp_path / "content"
        content.mkdir()
        for i in range(3):
            Image.fromarray(rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
                            ).save(content / f"c{i}.jpg")
        style = tmp_path / "style.jpg"
        Image.fromarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
                        ).save(style)
        dec_path = str(tmp_path / "dec.npz")
        save_params_npz(dec, dec_path)

        with pytest.warns(UserWarning, match="VGG19"):
            adain_main([
                "stylize", "--decoder", dec_path,
                "--content_dir", str(content),
                "--style_image", str(style),
                "--output", str(tmp_path / "out"),
                "--batch_size", "2",
            ])
        outs = os.listdir(tmp_path / "out")
        assert len(outs) == 3

        # exactly one of --content_image/--content_dir
        with pytest.raises(SystemExit, match="exactly one"):
            adain_main(["stylize", "--decoder", dec_path,
                        "--style_image", str(style)])

    @pytest.mark.slow
    def test_data_parallel_sharding_identical_output(self):
        """Batch sharded over the 8-device data mesh must produce the exact
        unsharded output (per-(b,c) moments never cross the batch axis)."""
        from fast_neural_style_transfer_tpu.infer.adain import ArbitraryStylizer
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

        vgg, dec = self._setup()
        rng = np.random.default_rng(7)
        style_u8 = rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
        content = rng.integers(0, 256, (8, 32, 32, 3), dtype=np.uint8)

        base = ArbitraryStylizer(dec, vgg).set_style_u8(style_u8)
        plan = make_mesh_plan()
        dp = ArbitraryStylizer(dec, vgg, sharding=plan.batch_sharding)
        dp.set_style_u8(style_u8)
        np.testing.assert_array_equal(dp.stylize_u8(content),
                                      base.stylize_u8(content))
        # non-divisible batches fall back to the default device, not crash
        assert dp.stylize_u8(content[:3]).shape == (3, 32, 32, 3)


class TestTorchDecoderInterchange:
    """export/torch_adain.py: the canonical-architecture decoder moves
    between the torch ecosystem's Sequential state_dicts and our pytree."""

    def test_roundtrip_and_forward_parity(self, tmp_path):
        import torch

        from fast_neural_style_transfer_tpu.export.torch_adain import (
            build_torch_decoder,
            load_torch_adain_decoder,
            save_torch_adain_decoder,
        )

        params = AdaINDecoder.init(jax.random.PRNGKey(0))
        path = str(tmp_path / "decoder.pth")
        save_torch_adain_decoder(params, path)
        back = load_torch_adain_decoder(path)
        for a, b in zip(params["convs"], back["convs"]):
            np.testing.assert_allclose(np.asarray(a["w"]), b["w"], rtol=1e-6)
            np.testing.assert_allclose(np.asarray(a["b"]), b["b"], rtol=1e-6)

        # forward parity: torch Sequential (NCHW) vs our decoder (NHWC)
        dec = build_torch_decoder()
        dec.load_state_dict(torch.load(path, weights_only=True))
        feat = np.random.default_rng(0).normal(
            size=(1, 4, 6, 512)).astype(np.float32)
        with torch.no_grad():
            ref = dec(torch.from_numpy(np.transpose(feat, (0, 3, 1, 2))))
        ours = AdaINDecoder.apply(params, jnp.asarray(feat))
        np.testing.assert_allclose(
            np.asarray(ours), np.transpose(ref.numpy(), (0, 2, 3, 1)),
            rtol=1e-4, atol=1e-5,
        )

    def test_wrapped_and_prefixed_state_dicts(self, tmp_path):
        """Order-based import survives key prefixes and common wrappers."""
        import torch

        from fast_neural_style_transfer_tpu.cli.adain import load_decoder
        from fast_neural_style_transfer_tpu.export.torch_adain import (
            save_torch_adain_decoder,
        )

        params = AdaINDecoder.init(jax.random.PRNGKey(1))
        plain = str(tmp_path / "d.pth")
        save_torch_adain_decoder(params, plain)
        sd = torch.load(plain, weights_only=True)
        wrapped = {"decoder": {f"module.decoder.{k}": v for k, v in sd.items()}}
        path = str(tmp_path / "wrapped.pth")
        torch.save(wrapped, path)
        back = load_decoder(path)  # the CLI loader routes .pth here
        np.testing.assert_allclose(
            np.asarray(params["convs"][3]["w"]), back["convs"][3]["w"],
            rtol=1e-6)

    @pytest.mark.slow
    def test_torchscript_full_pipeline(self, tmp_path):
        """The traced two-input .pt loads with torch.jit.load, matches
        stylize_arbitrary, and runs at resolutions other than the trace
        example's (shape-polymorphic graph)."""
        import torch

        from fast_neural_style_transfer_tpu.export.torch_adain import (
            export_adain_torchscript,
        )
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        dec = AdaINDecoder.init(jax.random.PRNGKey(1))
        path = str(tmp_path / "adain.pt")
        export_adain_torchscript(dec, vgg, path, alpha=0.8, example_hw=32)
        loaded = torch.jit.load(path)

        rng = np.random.default_rng(0)
        content = rng.normal(size=(1, 40, 48, 3)).astype(np.float32)
        style = rng.normal(size=(1, 24, 24, 3)).astype(np.float32)
        with torch.no_grad():
            got = loaded(
                torch.from_numpy(np.transpose(content, (0, 3, 1, 2))),
                torch.from_numpy(np.transpose(style, (0, 3, 1, 2))),
            ).numpy()
        ref = stylize_arbitrary(dec, vgg, jnp.asarray(content),
                                jnp.asarray(style), alpha=0.8)
        np.testing.assert_allclose(
            np.transpose(got, (0, 2, 3, 1)), np.asarray(ref),
            rtol=2e-3, atol=1e-4,
        )

    def test_architecture_mismatch_rejected(self):
        from fast_neural_style_transfer_tpu.export.torch_adain import (
            adain_decoder_from_state_dict,
        )

        with pytest.raises(ValueError, match="architecture mismatch"):
            adain_decoder_from_state_dict({
                "0.weight": np.zeros((256, 512, 3, 3), np.float32),
                "0.bias": np.zeros((256,), np.float32),
            })


class TestTorchPipelineOracle:
    """Cross-framework oracle: the ENTIRE arbitrary-style pipeline (VGG walk
    to relu4_1 -> AdaIN -> decoder, with alpha) re-executed in PyTorch over
    the same weights must match stylize_arbitrary — an independent-framework
    check in the spirit of tests/test_reference_oracle.py (the reference has
    no AdaIN to import, so torch itself is the second implementation)."""

    def test_full_pipeline_matches_torch(self):
        import torch
        import torch.nn.functional as F

        from fast_neural_style_transfer_tpu.export.torch_adain import (
            build_torch_decoder,
            save_torch_adain_decoder,
        )
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features, _CFG

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        dec = AdaINDecoder.init(jax.random.PRNGKey(1))
        rng = np.random.default_rng(0)
        content = rng.normal(size=(1, 32, 40, 3)).astype(np.float32)
        style = rng.normal(size=(1, 24, 24, 3)).astype(np.float32)

        def t_vgg(x):  # torch VGG19 walk to relu4_1 over the same params
            h = x
            for name, cout in _CFG:
                if cout:
                    w = torch.from_numpy(np.transpose(
                        np.asarray(vgg[name]["w"], np.float32), (3, 2, 0, 1)))
                    b = torch.from_numpy(np.asarray(vgg[name]["b"], np.float32))
                    h = F.relu(F.conv2d(h, w, b, padding=1))
                    if name == "conv4_1":
                        return h
                else:
                    h = F.max_pool2d(h, 2, 2)
            raise AssertionError("conv4_1 not reached")

        def t_stats(f):
            mu = f.mean(dim=(2, 3), keepdim=True)
            var = f.var(dim=(2, 3), keepdim=True, unbiased=False)
            return mu, torch.sqrt(var + 1e-5)

        import tempfile

        with tempfile.NamedTemporaryFile(suffix=".pth") as tmp:
            save_torch_adain_decoder(dec, tmp.name)
            t_dec = build_torch_decoder()
            t_dec.load_state_dict(torch.load(tmp.name, weights_only=True))

        alpha = 0.8
        with torch.no_grad():
            cf = t_vgg(torch.from_numpy(np.transpose(content, (0, 3, 1, 2))))
            sf = t_vgg(torch.from_numpy(np.transpose(style, (0, 3, 1, 2))))
            mu_c, sd_c = t_stats(cf)
            mu_s, sd_s = t_stats(sf)
            t = sd_s * (cf - mu_c) / sd_c + mu_s
            t = alpha * t + (1 - alpha) * cf
            ref = t_dec(t).numpy()

        ours = stylize_arbitrary(dec, vgg, jnp.asarray(content),
                                 jnp.asarray(style), alpha=alpha)
        np.testing.assert_allclose(
            np.asarray(ours), np.transpose(ref, (0, 2, 3, 1)),
            rtol=2e-3, atol=1e-4,
        )


class TestLRSchedule:
    def test_inverse_time_decay_math(self):
        from fast_neural_style_transfer_tpu.train.adain import lr_decay_factor

        assert float(lr_decay_factor(5e-5, 0)) == pytest.approx(1.0)
        assert float(lr_decay_factor(5e-5, 20_000)) == pytest.approx(0.5)
        assert float(lr_decay_factor(0.0, 10**6)) == pytest.approx(1.0)

    def _one_update_movement(self, lr_decay, start_step):
        import optax

        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features
        from fast_neural_style_transfer_tpu.train.adain import (
            make_adain_train_step,
        )
        from fast_neural_style_transfer_tpu.train.state import (
            TrainState,
            create_train_state,
        )

        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        content = jnp.asarray(
            np.random.default_rng(0).integers(0, 256, (2, 32, 32, 3)), jnp.uint8)
        style = jnp.asarray(
            np.random.default_rng(1).integers(0, 256, (2, 32, 32, 3)), jnp.uint8)
        opt = optax.adam(1e-4)
        params0 = AdaINDecoder.init(jax.random.PRNGKey(1))
        state = create_train_state(params0, opt)
        state = TrainState(params=state.params, opt_state=state.opt_state,
                           step=jnp.asarray(start_step, state.step.dtype))
        step = make_adain_train_step(opt, donate=False, lr_decay=lr_decay)
        state, _ = step(state, vgg, content, style)
        return float(sum(
            jnp.sum(jnp.abs(a - b)) for a, b in zip(
                jax.tree.leaves(state.params), jax.tree.leaves(params0))))

    @pytest.mark.slow
    def test_decay_scales_updates_by_step_position(self):
        """The decay multiplies the applied updates: at step 0 it is a
        no-op; at a late (e.g. restored) step the same update shrinks by
        exactly the schedule factor — so resume lands at the right
        position without touching the optimizer state structure."""
        base = self._one_update_movement(lr_decay=0.0, start_step=0)
        at0 = self._one_update_movement(lr_decay=1e-3, start_step=0)
        late = self._one_update_movement(lr_decay=1e-3, start_step=10_000)
        assert at0 == pytest.approx(base, rel=1e-5)
        assert late == pytest.approx(base / 11.0, rel=1e-2)  # 1/(1+10)

    def test_pre_decay_checkpoints_still_restore(self, tmp_path):
        """The decay must NOT change the opt_state pytree (adam(callable)
        would): a checkpoint written by the pre-decay trainer layout
        restores into the current one."""
        import optax

        from fast_neural_style_transfer_tpu.train.checkpoint import (
            CheckpointManager,
        )
        from fast_neural_style_transfer_tpu.train.state import create_train_state

        params = AdaINDecoder.init(jax.random.PRNGKey(0))
        old = create_train_state(params, optax.adam(1e-4))  # pre-decay layout
        mgr = CheckpointManager(str(tmp_path / "ck"))
        mgr.save(1, old)
        mgr.wait()
        # the current trainer builds its template exactly like this
        # (train_adain: optax.adam(cfg.lr), decay applied to updates)
        template = create_train_state(AdaINDecoder.init(jax.random.PRNGKey(1)),
                                      optax.adam(1e-4))
        restored = CheckpointManager(str(tmp_path / "ck")).restore(template)
        assert int(restored.step) == int(old.step)
        mgr.close()


class TestSpatialStyleControl:
    """Paper §7.3: per-pixel style masks — each content region re-normalized
    toward its own style's statistics (models/adain.py feature_masks +
    stylize_arbitrary(style_masks=...))."""

    def _setup(self):
        from fast_neural_style_transfer_tpu.models.vgg import VGG19Features

        rng = np.random.default_rng(0)
        vgg = VGG19Features.init(jax.random.PRNGKey(0))
        dec = AdaINDecoder.init(jax.random.PRNGKey(1))
        content = jnp.asarray(rng.normal(size=(1, 32, 40, 3)), jnp.float32)
        s1 = jnp.asarray(rng.normal(size=(1, 24, 24, 3)), jnp.float32)
        s2 = jnp.asarray(rng.normal(size=(1, 16, 32, 3)) * 2, jnp.float32)
        return vgg, dec, content, s1, s2

    def test_degenerate_mask_equals_single_style(self):
        vgg, dec, content, s1, s2 = self._setup()
        h, w = content.shape[1:3]
        masks = np.zeros((2, h, w), np.float32)
        masks[0] = 1.0
        got = stylize_arbitrary(dec, vgg, content, [s1, s2],
                                style_masks=masks)
        want = stylize_arbitrary(dec, vgg, content, s1)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_split_mask_differs_from_uniform_blend(self):
        vgg, dec, content, s1, s2 = self._setup()
        h, w = content.shape[1:3]
        masks = np.zeros((2, h, w), np.float32)
        masks[0, :, : w // 2] = 1.0
        masks[1, :, w // 2:] = 1.0
        got = np.asarray(stylize_arbitrary(dec, vgg, content, [s1, s2],
                                           style_masks=masks))
        blend = np.asarray(stylize_arbitrary(dec, vgg, content, [s1, s2]))
        assert np.abs(got - blend).max() > 1e-6
        assert np.isfinite(got).all()

    def test_all_zero_region_falls_back_to_uniform(self):
        from fast_neural_style_transfer_tpu.models.adain import feature_masks

        masks = np.zeros((2, 16, 16), np.float32)
        masks[0, :8] = 2.0  # unnormalized weights are fine
        mf = np.asarray(feature_masks(masks, (16, 16), 2))
        assert mf.shape == (2, 2, 2)
        np.testing.assert_allclose(mf[:, 0, :], [[1.0, 1.0], [0.0, 0.0]])
        np.testing.assert_allclose(mf[:, 1, :], 0.5)  # dead region: uniform

    def test_sharded_masks_match_single_device(self):
        """Masked stylization on the H-sharded path == single-device at
        aligned AND odd sizes (the per-pixel folding plus the active-extent
        machinery; masks shard along with the content)."""
        from fast_neural_style_transfer_tpu.core.shapes import (
            pad_to_multiple_reflect,
        )
        from fast_neural_style_transfer_tpu.infer.spatial_adain import (
            stylize_arbitrary_spatial,
        )
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

        vgg, dec, _, s1, s2 = self._setup()
        plan = make_mesh_plan(spatial=4)
        rng = np.random.default_rng(7)
        for h, w in ((64, 40), (70, 50)):
            content = jnp.asarray(rng.normal(size=(1, h, w, 3)), jnp.float32)
            masks = np.zeros((2, h, w), np.float32)
            masks[0, :, : w // 2] = 1.0
            masks[1, :, w // 2:] = 1.0
            got = stylize_arbitrary_spatial(
                dec, vgg, content, [s1, s2], plan, alpha=0.9,
                style_masks=masks)
            canon, _ = pad_to_multiple_reflect(content, 8)
            h8, w8 = canon.shape[1:3]
            m_canon = np.pad(masks, ((0, 0), (0, h8 - h), (0, w8 - w)),
                             mode="edge")
            ref = np.asarray(stylize_arbitrary(
                dec, vgg, canon, [s1, s2], alpha=0.9,
                style_masks=m_canon))[:, :h, :w, :]
            assert got.shape == content.shape
            np.testing.assert_allclose(np.asarray(got), ref,
                                       rtol=2e-4, atol=2e-4)
        with pytest.raises(ValueError, match="mutually exclusive"):
            stylize_arbitrary_spatial(
                dec, vgg, content, [s1, s2], plan,
                style_masks=np.ones((2, h, w), np.float32),
                style_weights=[0.5, 0.5])

    def test_validation(self):
        vgg, dec, content, s1, s2 = self._setup()
        h, w = content.shape[1:3]
        good = np.ones((2, h, w), np.float32)
        with pytest.raises(ValueError, match="mutually exclusive"):
            stylize_arbitrary(dec, vgg, content, [s1, s2], style_masks=good,
                              style_weights=[0.5, 0.5])
        with pytest.raises(ValueError, match="must be"):
            stylize_arbitrary(dec, vgg, content, [s1, s2],
                              style_masks=np.ones((3, h, w), np.float32))
        with pytest.raises(ValueError, match="must equal"):
            stylize_arbitrary(dec, vgg, content, [s1, s2],
                              style_masks=np.ones((2, h, w + 8), np.float32))

    @pytest.mark.slow
    def test_cli_style_masks_end_to_end(self, tmp_path):
        from PIL import Image

        from fast_neural_style_transfer_tpu.cli.adain import main as adain_main
        from fast_neural_style_transfer_tpu.train.checkpoint import (
            save_params_npz,
        )

        rng = np.random.default_rng(0)
        paths = {}
        for name, shape in (("content", (41, 50)), ("s1", (24, 24)),
                            ("s2", (32, 24))):
            p = str(tmp_path / f"{name}.jpg")
            Image.fromarray(rng.integers(0, 255, (*shape, 3),
                                         dtype=np.uint8)).save(p)
            paths[name] = p
        for name in ("m1", "m2"):
            p = str(tmp_path / f"{name}.png")
            m = np.zeros((41, 50), np.uint8)
            if name == "m1":
                m[:, :25] = 255
            else:
                m[:, 25:] = 255
            Image.fromarray(m, "L").save(p)
            paths[name] = p
        dec_p = str(tmp_path / "dec.npz")
        save_params_npz(AdaINDecoder.init(jax.random.PRNGKey(0)), dec_p)

        out_p = str(tmp_path / "out.jpg")
        adain_main(["stylize", "--decoder", dec_p,
                    "--content_image", paths["content"],
                    "--style_image", paths["s1"], paths["s2"],
                    "--style_masks", paths["m1"], paths["m2"],
                    "--output", out_p])
        out = np.asarray(Image.open(out_p))
        assert out.shape == (41, 50, 3)

        # masks also run on the H-sharded path (8-dev virtual mesh)
        out_sp = str(tmp_path / "out_spatial.jpg")
        adain_main(["stylize", "--decoder", dec_p,
                    "--content_image", paths["content"],
                    "--style_image", paths["s1"], paths["s2"],
                    "--style_masks", paths["m1"], paths["m2"],
                    "--spatial", "4", "--output", out_sp])
        assert np.asarray(Image.open(out_sp)).shape == (41, 50, 3)
