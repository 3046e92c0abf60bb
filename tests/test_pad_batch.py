"""--pad_batch: loss-masked batch padding computes EXACT real-batch steps.

The reference's default batch 20 (/root/reference/config.py:4) is a hostile
shape on TPU: XLA's (batch, channel)-tiled conv layouts pad it to 24 and
compute on the pad anyway (measured v5e: b24 costs +3.6% wall over b20 for
+20% images — DESIGN.md §8). --pad_batch claims that throughput without
changing the training math: pad each data shard to a multiple of 8 with
dummy images and mask them out of every loss term. All three reference
losses are batch SUM-reductions (TV normalizes by the real count), so the
masked padded step must equal the unpadded step exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_neural_style_transfer_tpu.losses import (
    LossTaps,
    content_loss,
    style_loss,
    style_targets_from_features,
    total_variation_loss,
)
from fast_neural_style_transfer_tpu.models import TransformerNet, VGG19Features
from fast_neural_style_transfer_tpu.train.schedule import LossWeightSchedule
from fast_neural_style_transfer_tpu.train.state import (
    create_train_state,
    make_optimizer,
)
from fast_neural_style_transfer_tpu.train.step import make_train_step


def _pad(batch_np, mult=8):
    b = batch_np.shape[0]
    padded = -(-b // mult) * mult
    pad = np.repeat(batch_np[-1:], padded - b, axis=0)
    mask = np.concatenate([np.ones(b, np.float32),
                           np.zeros(padded - b, np.float32)])
    return np.concatenate([batch_np, pad]), mask


def test_masked_losses_equal_unpadded():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    xp, mask = _pad(x)
    assert xp.shape[0] == 8

    # TV: per-batch normalizer must use the real count
    tv_real = float(total_variation_loss(jnp.asarray(x)))
    tv_masked = float(total_variation_loss(jnp.asarray(xp),
                                           batch_mask=jnp.asarray(mask)))
    assert tv_masked == pytest.approx(tv_real, rel=1e-6)

    # content: batch-independent normalizer, masked sum
    y = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    yp, _ = _pad(y)
    c_real = float(content_loss(jnp.asarray(x), jnp.asarray(y)))
    c_masked = float(content_loss(jnp.asarray(xp), jnp.asarray(yp),
                                  batch_mask=jnp.asarray(mask)))
    assert c_masked == pytest.approx(c_real, rel=1e-6)

    # style: per-example gram sums
    vgg = VGG19Features.init(jax.random.PRNGKey(0))
    taps = LossTaps()
    feats = VGG19Features.apply(vgg, jnp.asarray(x), taps.style_taps)
    feats_p = VGG19Features.apply(vgg, jnp.asarray(xp), taps.style_taps)
    grams = style_targets_from_features(
        VGG19Features.apply(vgg, jnp.asarray(x[:1]), taps.style_taps))
    s_real = float(style_loss(feats, grams, taps.style_weights))
    s_masked = float(style_loss(feats_p, grams, taps.style_weights,
                                batch_mask=jnp.asarray(mask)))
    assert s_masked == pytest.approx(s_real, rel=1e-6)


@pytest.mark.slow
def test_padded_step_equals_unpadded_step():
    """Full jitted train step: b4 padded to b8 with the mask reproduces the
    b4 step — identical loss metrics and identical GRADIENTS (rel-L2
    ~1.6e-7 measured: pure f32 reassociation noise from the different batch
    shape; the masked math is exact). Post-Adam params are NOT compared
    elementwise: Adam's first step is ±lr·sign(g), and sign(g) flips where
    g sits at f32 noise — same artifact the lockstep harness documents."""
    import functools

    import optax

    from fast_neural_style_transfer_tpu.core.dtypes import Precision
    from fast_neural_style_transfer_tpu.train.step import loss_fn

    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 32, 32, 3)).astype(np.float32)
    xp, mask = _pad(x)

    taps = LossTaps()
    vgg = VGG19Features.init(jax.random.PRNGKey(0))
    params = TransformerNet.init(jax.random.PRNGKey(1))
    style = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    grams = tuple(style_targets_from_features(
        VGG19Features.apply(vgg, jnp.asarray(style), taps.style_taps)))
    opt = make_optimizer(1e-3, 100)
    step = make_train_step(opt, taps=taps,
                           weight_schedule=LossWeightSchedule(),
                           lr=1e-3, total_steps=100, dropout=False,
                           donate=False)
    srng = jax.random.PRNGKey(2)

    st0 = create_train_state(params, opt)
    _, m_real = step(st0, vgg, jnp.asarray(x), grams, srng)
    st1 = create_train_state(params, opt)
    _, m_pad = step(st1, vgg, jnp.asarray(xp), grams, srng,
                    jnp.asarray(mask))
    for k in ("loss", "content_loss", "style_loss", "tv_loss"):
        assert float(m_pad[k]) == pytest.approx(float(m_real[k]), rel=1e-6), k

    w = (jnp.float32(1000.0), jnp.float32(1.0), jnp.float32(10.0))
    g_real, _ = jax.grad(
        functools.partial(loss_fn, taps=taps, precision=Precision.f32()),
        has_aux=True)(params, vgg, jnp.asarray(x), grams, w, None)
    g_pad, _ = jax.grad(
        functools.partial(loss_fn, taps=taps, precision=Precision.f32(),
                          batch_mask=jnp.asarray(mask)),
        has_aux=True)(params, vgg, jnp.asarray(xp), grams, w, None)
    rel_l2 = float(optax.global_norm(
        jax.tree.map(lambda a, b: a - b, g_real, g_pad))) / float(
        optax.global_norm(g_real))
    assert rel_l2 < 1e-5


def test_step_rejects_wrong_mask_shape():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 32, 32, 3)).astype(np.float32))
    taps = LossTaps()
    vgg = VGG19Features.init(jax.random.PRNGKey(0))
    params = TransformerNet.init(jax.random.PRNGKey(1))
    grams = tuple(style_targets_from_features(
        VGG19Features.apply(vgg, x[:1], taps.style_taps)))
    opt = make_optimizer(1e-3, 100)
    step = make_train_step(opt, taps=taps, donate=False)
    with pytest.raises(ValueError, match="batch_mask shape"):
        step(create_train_state(params, opt), vgg, x, grams,
             jax.random.PRNGKey(0), jnp.ones((4,), jnp.float32))


def test_pipeline_pads_per_shard(tmp_path):
    """InputPipeline(pad_to_multiple=8, num_data_shards=2): each shard's
    slice is padded independently (so the padded global batch still splits
    contiguously over chips) and batch_mask_global marks the real rows."""
    from PIL import Image

    from fast_neural_style_transfer_tpu.data import (
        ImageFolderDataset,
        InputPipeline,
    )

    rng = np.random.default_rng(0)
    for i in range(12):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(tmp_path / f"im{i}.png")
    ds = ImageFolderDataset(str(tmp_path), (32, 32), seed=0)
    pipe = InputPipeline(ds, 10, seed=0, num_workers=2,
                         pad_to_multiple=8, num_data_shards=2)
    mask = pipe.batch_mask_global
    # per shard: 5 real + 3 pad -> global 16
    assert mask.shape == (16,)
    np.testing.assert_array_equal(
        mask.reshape(2, 8),
        np.array([[1, 1, 1, 1, 1, 0, 0, 0]] * 2, np.float32))
    batch = next(iter(pipe.host_batches(num_epochs=1)))
    assert batch.shape[0] == 16
    # pad rows repeat each shard's last real image
    np.testing.assert_array_equal(batch[5], batch[4])
    np.testing.assert_array_equal(batch[13], batch[12])


@pytest.mark.slow
def test_train_loop_pad_batch_e2e(tmp_path, capsys):
    """train_style_transfer(pad_batch=True) on the 8-device mesh: batch 8
    -> per-chip 1 -> padded 8/chip; the run announces the padding, trains,
    logs finite losses, and writes the final artifact."""
    import json
    import os

    from PIL import Image

    from fast_neural_style_transfer_tpu.train.loop import (
        TrainConfig,
        train_style_transfer,
    )

    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()
    for i in range(16):
        Image.fromarray(
            rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)
        ).save(data / f"im{i}.jpg")
    style = tmp_path / "style.jpg"
    Image.fromarray(
        rng.integers(0, 255, (48, 48, 3), dtype=np.uint8)).save(style)
    out = str(tmp_path / "out")
    cfg = TrainConfig(
        style_image=str(style), dataset_dir=str(data), output_dir=out,
        total_steps=2, batch_size=8, image_size=(32, 32), log_every=1,
        monitor_every=1000, checkpoint_every=1000, num_workers=1,
        resume=False, pad_batch=True,
    )
    with pytest.warns(UserWarning, match="VGG19"):
        train_style_transfer(cfg)
    assert "pad_batch: per-chip batch 1 -> 8" in capsys.readouterr().out
    rows = [json.loads(l) for l in open(os.path.join(out, "metrics.jsonl"))]
    assert rows[-1]["step"] == 2
    assert all(np.isfinite(r["loss"]) for r in rows)
    assert os.path.exists(os.path.join(out, "style_transfer_final.npz"))


def test_pipeline_pad_noop_when_aligned(tmp_path):
    from PIL import Image

    from fast_neural_style_transfer_tpu.data import (
        ImageFolderDataset,
        InputPipeline,
    )

    rng = np.random.default_rng(0)
    for i in range(16):
        Image.fromarray(
            rng.integers(0, 255, (40, 40, 3), dtype=np.uint8)
        ).save(tmp_path / f"im{i}.png")
    ds = ImageFolderDataset(str(tmp_path), (32, 32), seed=0)
    pipe = InputPipeline(ds, 16, seed=0, num_workers=2,
                         pad_to_multiple=8, num_data_shards=2)
    assert pipe.batch_mask_global is None
    batch = next(iter(pipe.host_batches(num_epochs=1)))
    assert batch.shape[0] == 16
