"""Multi-style (conditional instance norm) training and inference.

Beyond-reference capability: the reference trains one net per style
(/root/reference/train.py trains a single style image); here S styles share
one net's convs via per-style (S, C) IN affine banks (Dumoulin et al. 2017).
These tests pin: bank selection == baked single-style math, per-example
conditioning, bank-aware style loss, the end-to-end 2-style training run,
and every guard rail (export/bake errors, checkpoint style detection).
"""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from fast_neural_style_transfer_tpu.models.transformer import (
    TransformerNet,
    bake_style,
    num_styles,
    require_single_style,
)


def _multi_params(seed=0, s=3):
    """A 3-style net whose banks actually differ per style (init is
    identical across styles — gamma=1, beta=0 — so tests randomize them)."""
    params = TransformerNet.init(jax.random.PRNGKey(seed), num_styles=s)
    key = jax.random.PRNGKey(seed + 100)

    def jitter(leaf):
        nonlocal key
        if leaf.ndim == 2 and leaf.shape[0] == s:  # the IN banks
            key, k = jax.random.split(key)
            return leaf + 0.3 * jax.random.normal(k, leaf.shape)
        return leaf

    return jax.tree.map(jitter, params)


class TestModel:
    def test_init_shapes_and_detection(self):
        p1 = TransformerNet.init(jax.random.PRNGKey(0))
        p3 = TransformerNet.init(jax.random.PRNGKey(0), num_styles=3)
        assert num_styles(p1) == 1
        assert num_styles(p3) == 3
        assert p1["norm1"]["gamma"].shape == (64,)
        assert p3["norm1"]["gamma"].shape == (3, 64)
        assert p3["res_blocks"][0]["in1"]["beta"].shape == (3, 256)
        # convs are shared (identical shapes regardless of style count)
        assert p1["conv1"]["w"].shape == p3["conv1"]["w"].shape
        with pytest.raises(ValueError, match="num_styles"):
            TransformerNet.init(jax.random.PRNGKey(0), num_styles=0)

    def test_onehot_apply_equals_baked(self):
        params = _multi_params()
        x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
        for s in range(3):
            onehot = jnp.zeros((3,)).at[s].set(1.0)
            out_cond = TransformerNet.apply(
                params, x, train=False, style_weights=onehot
            )
            out_baked = TransformerNet.apply(
                bake_style(params, s), x, train=False
            )
            np.testing.assert_allclose(
                np.asarray(out_cond), np.asarray(out_baked), atol=1e-5
            )

    def test_blend_apply_equals_baked_blend(self):
        params = _multi_params()
        x = jax.random.normal(jax.random.PRNGKey(2), (1, 16, 16, 3))
        w = jnp.asarray([0.2, 0.5, 0.3])
        out_cond = TransformerNet.apply(params, x, train=False, style_weights=w)
        out_baked = TransformerNet.apply(
            bake_style(params, [0.2, 0.5, 0.3]), x, train=False
        )
        np.testing.assert_allclose(
            np.asarray(out_cond), np.asarray(out_baked), atol=1e-5
        )

    def test_per_example_conditioning(self):
        """A (B, S) row-per-example batch == each example run with its own
        style — the property the training step depends on."""
        params = _multi_params()
        x = jax.random.normal(jax.random.PRNGKey(3), (3, 16, 16, 3))
        sel = jnp.eye(3)  # example i gets style i
        batch_out = TransformerNet.apply(
            params, x, train=False, style_weights=sel
        )
        for i in range(3):
            solo = TransformerNet.apply(
                bake_style(params, i), x[i : i + 1], train=False
            )
            np.testing.assert_allclose(
                np.asarray(batch_out[i : i + 1]), np.asarray(solo), atol=1e-5
            )

    def test_styles_actually_differ(self):
        params = _multi_params()
        x = jax.random.normal(jax.random.PRNGKey(4), (1, 16, 16, 3))
        a = TransformerNet.apply(params, x, train=False,
                                 style_weights=jnp.asarray([1.0, 0.0, 0.0]))
        b = TransformerNet.apply(params, x, train=False,
                                 style_weights=jnp.asarray([0.0, 1.0, 0.0]))
        assert np.abs(np.asarray(a) - np.asarray(b)).max() > 1e-3

    def test_guards(self):
        single = TransformerNet.init(jax.random.PRNGKey(0))
        multi = _multi_params()
        x = jnp.zeros((1, 16, 16, 3))
        with pytest.raises(ValueError, match="style_weights"):
            TransformerNet.apply(multi, x, train=False)
        with pytest.raises(ValueError, match="single-style"):
            TransformerNet.apply(single, x, train=False,
                                 style_weights=jnp.ones((1,)))
        with pytest.raises(ValueError, match="already single-style"):
            bake_style(single, 0)
        with pytest.raises(ValueError, match="out of range"):
            bake_style(multi, 7)
        with pytest.raises(ValueError, match="shape"):
            bake_style(multi, [0.5, 0.5])
        require_single_style(single, "x")  # no-op
        with pytest.raises(ValueError, match="bake_style"):
            require_single_style(multi, "x")
        # bool passes isinstance(int) but jnp .at[True] is mask indexing —
        # without the guard it silently bakes the SUM of all styles
        with pytest.raises(TypeError, match="bool"):
            bake_style(multi, True)
        # numpy integers (np.argmax, JSON round trips) must select, not fall
        # into the weight-vector branch with a bogus shape error
        baked_np = bake_style(multi, np.int64(1))
        baked_py = bake_style(multi, 1)
        np.testing.assert_array_equal(
            np.asarray(baked_np["norm1"]["gamma"]),
            np.asarray(baked_py["norm1"]["gamma"]),
        )
        # blends must be convex — scaled affines would otherwise ship into
        # exports silently
        with pytest.raises(ValueError, match="convex"):
            bake_style(multi, [0.5, 0.7, 0.0])
        with pytest.raises(ValueError, match="convex"):
            bake_style(multi, [1.5, -0.5, 0.0])


class TestStyleLoss:
    def test_bank_selection_matches_manual(self):
        from fast_neural_style_transfer_tpu.losses import style_loss

        key = jax.random.PRNGKey(5)
        feats = [jax.random.normal(key, (4, 8, 8, 16))]
        banks = [jax.random.normal(jax.random.PRNGKey(6), (3, 16, 16))]
        idx = jnp.asarray([0, 2, 1, 2])
        sel = jax.nn.one_hot(idx, 3)
        got = style_loss(feats, banks, [1.0], style_select=sel)
        # manual: each example against its own (c, c) target
        total = 0.0
        for i in range(4):
            total += float(
                style_loss([feats[0][i : i + 1]], [banks[0][idx[i]]], [1.0])
            )
        np.testing.assert_allclose(float(got), total, rtol=1e-5)

    def test_bank_without_select_rejected(self):
        from fast_neural_style_transfer_tpu.losses import style_loss

        with pytest.raises(ValueError, match="style_select"):
            style_loss(
                [jnp.zeros((1, 4, 4, 8))], [jnp.zeros((2, 8, 8))], [1.0]
            )
        # and the symmetric mistake: conditioned generator, single targets
        with pytest.raises(ValueError, match="single-style"):
            style_loss(
                [jnp.zeros((2, 4, 4, 8))], [jnp.zeros((8, 8))], [1.0],
                style_select=jnp.eye(2),
            )


class TestTrainStep:
    @pytest.mark.slow
    def test_multi_style_step_runs_and_descends(self):
        """2-style train step: loss finite, params update, and both styles'
        IN banks receive gradient signal over a few steps."""
        import optax

        from fast_neural_style_transfer_tpu.losses import LossTaps
        from fast_neural_style_transfer_tpu.models.vgg_weights import resolve_params
        from fast_neural_style_transfer_tpu.train.state import create_train_state
        from fast_neural_style_transfer_tpu.train.step import make_train_step

        with pytest.warns(UserWarning, match="VGG19"):
            vgg_params = resolve_params(None, seed=0)
        params = TransformerNet.init(jax.random.PRNGKey(0), num_styles=2)
        opt = optax.adam(1e-3)
        state = create_train_state(params, opt)
        step = make_train_step(opt, taps=LossTaps(), num_styles=2,
                               total_steps=10, donate=False)

        banks = [
            jax.random.normal(jax.random.PRNGKey(7), (2, c, c)) * 0.01
            for c in (64, 128, 256)
        ]
        batch = jax.random.normal(jax.random.PRNGKey(8), (8, 32, 32, 3))
        rng = jax.random.PRNGKey(9)
        for i in range(3):
            rng, k = jax.random.split(rng)
            state, metrics = step(state, vgg_params, batch, tuple(banks), k)
            assert np.isfinite(float(metrics["loss"]))
        assert int(state.step) == 3
        # both bank rows moved away from init (gamma=1): style sampling hit
        # every style across 8 examples x 3 steps with overwhelming odds
        g = np.asarray(state.params["norm2"]["gamma"])
        assert np.abs(g[0] - 1.0).max() > 0
        assert np.abs(g[1] - 1.0).max() > 0


class TestDataParallel:
    @pytest.mark.slow
    def test_multistyle_dp_matches_single_device(self):
        """Multi-style step over the 8-device data mesh == local math: the
        in-step style sampling and the (S, c, c) bank einsum must partition
        without changing values (threefry bits are position-, not device-,
        dependent)."""
        import optax

        from fast_neural_style_transfer_tpu.losses import LossTaps
        from fast_neural_style_transfer_tpu.models.vgg_weights import resolve_params
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan
        from fast_neural_style_transfer_tpu.train.state import (
            create_train_state,
            replicate_state,
        )
        from fast_neural_style_transfer_tpu.train.step import make_train_step

        with pytest.warns(UserWarning, match="VGG19"):
            vgg = resolve_params(None, seed=0)
        # SGD, not Adam: Adam maps near-zero grads to +-lr, so a mere
        # psum-reduction-order sign flip on a ~0 element becomes a 2*lr
        # param difference — noise that would swamp what this test is
        # about (value-identical partitioning of sampling + bank einsum)
        opt = optax.sgd(1e-3)
        state = create_train_state(
            TransformerNet.init(jax.random.PRNGKey(0), num_styles=2), opt
        )
        step = make_train_step(opt, taps=LossTaps(), num_styles=2,
                               total_steps=10, donate=False)
        banks = tuple(
            jax.random.normal(jax.random.PRNGKey(c), (2, c, c)) * 0.01
            for c in (64, 128, 256)
        )
        batch = jax.random.normal(jax.random.PRNGKey(8), (8, 32, 32, 3))
        rng = jax.random.PRNGKey(9)

        s1, m1 = step(state, vgg, batch, banks, rng)

        plan = make_mesh_plan()
        s8, m8 = step(
            replicate_state(state, plan.replicated),
            jax.device_put(vgg, plan.replicated),
            jax.device_put(batch, plan.batch_sharding),
            tuple(jax.device_put(b, plan.replicated) for b in banks),
            rng,
        )
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=1e-5)
        jax.tree.map(
            # psum reduction-order float noise scales with magnitude
            # (loss is ~1e6, so one SGD step moves params by O(10)):
            # relative tolerance, not absolute
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
            ),
            s1.params,
            s8.params,
        )


class TestEndToEnd:
    @pytest.fixture
    def workspace(self, tmp_path):
        rng = np.random.default_rng(0)
        data = tmp_path / "data"
        data.mkdir()
        for i in range(8):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(data / f"img_{i}.jpg")
        for name in ("style_a.jpg", "style_b.jpg", "monitor.jpg"):
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), dtype=np.uint8)
            ).save(tmp_path / name)
        return tmp_path

    @pytest.mark.slow
    def test_two_style_training_and_inference(self, workspace):
        from fast_neural_style_transfer_tpu.infer import Stylizer
        from fast_neural_style_transfer_tpu.train import (
            TrainConfig,
            train_style_transfer,
        )

        out_dir = str(workspace / "out")
        cfg = TrainConfig(
            style_image=(
                str(workspace / "style_a.jpg"),
                str(workspace / "style_b.jpg"),
            ),
            dataset_dir=str(workspace / "data"),
            output_dir=out_dir,
            monitor_image=str(workspace / "monitor.jpg"),
            total_steps=2,
            batch_size=8,
            image_size=(32, 32),
            log_every=1,
            monitor_every=2,
            checkpoint_every=2,
            num_workers=2,
            resume=False,
        )
        with pytest.warns(UserWarning, match="VGG19"):
            final = train_style_transfer(cfg)

        # per-style monitor samples were written
        assert glob.glob(os.path.join(out_dir, "sample_step_2_style0.jpg"))
        assert glob.glob(os.path.join(out_dir, "sample_step_2_style1.jpg"))

        # the artifact is multi-style and requires a selection
        raw = Stylizer.load_params(final)
        assert num_styles(raw) == 2
        with pytest.raises(ValueError, match="2-style"):
            Stylizer.from_checkpoint(final)

        img = np.random.default_rng(1).integers(
            0, 256, (40, 40, 3), dtype=np.uint8
        )
        outs = []
        for style in (0, 1, [0.5, 0.5]):
            sty = Stylizer.from_checkpoint(final, style=style)
            assert num_styles(sty.params) == 1  # baked
            outs.append(sty.stylize_u8(img))
        assert outs[0].shape == img.shape

        # Orbax checkpoint dir round-trips the multi-style banks too
        ckpt_dir = os.path.join(out_dir, "checkpoints")
        raw2 = Stylizer.load_params(ckpt_dir)
        assert num_styles(raw2) == 2

        # single-style checkpoints reject a style selection
        single = TransformerNet.init(jax.random.PRNGKey(0))
        from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

        single_path = str(workspace / "single.npz")
        save_params_npz(single, single_path)
        with pytest.raises(ValueError, match="single-style"):
            Stylizer.from_checkpoint(single_path, style=0)

        # export CLI bakes a chosen style into a reference .pth
        from fast_neural_style_transfer_tpu.export.cli import main as export_main

        pth = str(workspace / "style0.pth")
        export_main(["--model", final, "--pth", pth, "--style-index", "0"])
        assert os.path.exists(pth)

        # exporting multi-style params directly is refused with the fix
        from fast_neural_style_transfer_tpu.export.onnx_export import export_onnx

        with pytest.raises(ValueError, match="bake_style"):
            export_onnx(raw, str(workspace / "nope.onnx"))

        # warm-start path: style counts must match
        cfg2 = TrainConfig(
            style_image=str(workspace / "style_a.jpg"),
            dataset_dir=str(workspace / "data"),
            output_dir=str(workspace / "out2"),
            total_steps=1,
            batch_size=8,
            image_size=(32, 32),
            num_workers=2,
            resume=False,
            init_checkpoint=final,
        )
        with pytest.raises(ValueError, match="style"):
            with pytest.warns(UserWarning, match="VGG19"):
                train_style_transfer(cfg2)

        # a reference TRAINING checkpoint (single-style by definition) into
        # a multi-style run must fail early with the reason, not at trace
        # time deep inside the first jitted step
        import torch

        ref_ckpt = str(workspace / "ref_train.pth")
        torch.save({"model_state_dict": {}, "optimizer_state_dict": {},
                    "iteration": 3}, ref_ckpt)
        cfg3 = TrainConfig(
            style_image=(
                str(workspace / "style_a.jpg"),
                str(workspace / "style_b.jpg"),
            ),
            dataset_dir=str(workspace / "data"),
            output_dir=str(workspace / "out3"),
            total_steps=1,
            batch_size=8,
            image_size=(32, 32),
            num_workers=2,
            resume=False,
            init_checkpoint=ref_ckpt,
        )
        with pytest.raises(ValueError, match="single-style"):
            with pytest.warns(UserWarning, match="VGG19"):
                train_style_transfer(cfg3)


class TestComposition:
    @pytest.mark.slow
    def test_int8_and_spatial_take_baked_styles(self, tmp_path):
        """Baking makes multi-style checkpoints compose with every
        downstream precision/sharding path — spot-check int8 (quantizes the
        baked affines) and the spatial halo forward."""
        from fast_neural_style_transfer_tpu.infer import Stylizer
        from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

        path = str(tmp_path / "ms.npz")
        save_params_npz(jax.device_get(_multi_params()), path)

        img = np.random.default_rng(0).integers(
            0, 256, (32, 32, 3), dtype=np.uint8
        )
        out = Stylizer.from_checkpoint(path, style=2, precision="int8").stylize_u8(img)
        assert out.shape == img.shape and out.dtype == np.uint8

        from fast_neural_style_transfer_tpu.infer import stylize_spatial
        from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

        plan = make_mesh_plan(spatial=4)
        sty = Stylizer.from_checkpoint(path, style=[0.3, 0.3, 0.4])
        x = np.random.default_rng(1).standard_normal((1, 64, 64, 3)).astype(np.float32)
        out_sp = stylize_spatial(sty.params, x, plan, precision=sty.precision)
        assert np.asarray(out_sp).shape == (1, 64, 64, 3)


class TestCLIParsing:
    def test_training_cli_multi_style_paths(self):
        from fast_neural_style_transfer_tpu.cli.begin_training import build_parser

        args = build_parser().parse_args(
            ["--style_image", "a.jpg", "b.jpg", "c.jpg"]
        )
        assert args.style_image == ["a.jpg", "b.jpg", "c.jpg"]
        args = build_parser().parse_args(["--style_image", "a.jpg"])
        assert args.style_image == ["a.jpg"]

    def test_inference_cli_style_flags(self):
        from fast_neural_style_transfer_tpu.cli.begin_inference import build_parser

        args = build_parser().parse_args(["--style_index", "1"])
        assert args.style_index == 1
        args = build_parser().parse_args(["--style_blend", "0.3", "0.7"])
        assert args.style_blend == [0.3, 0.7]
