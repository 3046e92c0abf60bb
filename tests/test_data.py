"""Data layer tests: scan, robust decode, batching, normalization, sharding."""

import os

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.data import ImageFolderDataset, InputPipeline
from fast_neural_style_transfer_tpu.parallel import make_mesh_plan
from fast_neural_style_transfer_tpu.utils.image_io import IMAGENET_MEAN, IMAGENET_STD


@pytest.fixture
def image_dir(tmp_path):
    rng = np.random.default_rng(0)
    sub = tmp_path / "nested"
    sub.mkdir()
    for i in range(10):
        arr = rng.integers(0, 256, (40 + i, 50, 3), dtype=np.uint8)
        where = sub if i % 2 else tmp_path
        Image.fromarray(arr).save(where / f"img_{i}.jpg")
    (tmp_path / "notes.txt").write_text("not an image")
    return str(tmp_path)


def test_scan_recursive_and_extension_filter(image_dir):
    ds = ImageFolderDataset(image_dir, (32, 32))
    assert len(ds) == 10  # txt excluded, nested dir included


def test_getitem_resizes_to_fixed_shape(image_dir):
    ds = ImageFolderDataset(image_dir, (32, 48))
    img = ds[0]
    assert img.shape == (32, 48, 3) and img.dtype == np.uint8


def test_decode_error_falls_back_to_substitute(image_dir):
    bad = os.path.join(image_dir, "zz_corrupt.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8 not a real jpeg")
    ds = ImageFolderDataset(image_dir, (32, 32), seed=0)
    idx = ds.files.index(bad)
    img = ds[idx]  # must substitute another image, not raise
    assert img.shape == (32, 32, 3)


def test_empty_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        ImageFolderDataset(str(tmp_path))


def test_host_batches_shapes_and_normalization(image_dir):
    ds = ImageFolderDataset(image_dir, (32, 32))
    pipe = InputPipeline(ds, global_batch_size=4, num_workers=2,
                         transport="f32")
    batch = next(pipe.host_batches(num_epochs=1))
    assert batch.shape == (4, 32, 32, 3) and batch.dtype == np.float32
    # values must lie in the ImageNet-normalized range of [0,1] inputs
    lo = (0.0 - IMAGENET_MEAN) / IMAGENET_STD
    hi = (1.0 - IMAGENET_MEAN) / IMAGENET_STD
    assert (batch >= lo - 1e-5).all() and (batch <= hi + 1e-5).all()


def test_u8_transport_matches_host_normalize(image_dir):
    """Default transport ships raw uint8 (4x fewer H2D bytes); the step's
    on-device normalize must reproduce the host-normalized f32 path."""
    from fast_neural_style_transfer_tpu.train.step import normalize_u8_batch

    ds = ImageFolderDataset(image_dir, (32, 32))
    pipe_u8 = InputPipeline(ds, global_batch_size=4, num_workers=2)
    b_u8 = next(pipe_u8.host_batches(num_epochs=1))
    assert b_u8.dtype == np.uint8
    pipe_f32 = InputPipeline(ds, global_batch_size=4, num_workers=2,
                             transport="f32")
    b_f32 = next(pipe_f32.host_batches(num_epochs=1))
    np.testing.assert_allclose(
        np.asarray(normalize_u8_batch(jnp.asarray(b_u8))), b_f32,
        rtol=1e-5, atol=1e-5)
    # float input passes through untouched
    np.testing.assert_array_equal(
        np.asarray(normalize_u8_batch(jnp.asarray(b_f32))), b_f32)


def test_epoch_drop_last_and_shuffle_determinism(image_dir):
    ds = ImageFolderDataset(image_dir, (16, 16))
    pipe = InputPipeline(ds, global_batch_size=4, num_workers=2, seed=3)
    batches = list(pipe.host_batches(num_epochs=1))
    assert len(batches) == 2  # 10 images, batch 4, drop_last
    pipe2 = InputPipeline(ds, global_batch_size=4, num_workers=2, seed=3)
    batches2 = list(pipe2.host_batches(num_epochs=1))
    np.testing.assert_array_equal(batches[0], batches2[0])


def test_device_batches_sharded_over_mesh(image_dir):
    plan = make_mesh_plan()
    assert plan.num_data_shards == 8  # conftest forces 8 virtual CPU devices
    ds = ImageFolderDataset(image_dir, (16, 16))
    pipe = InputPipeline(ds, global_batch_size=8, num_workers=2,
                         sharding=plan.batch_sharding)
    batch = next(iter(pipe))
    assert batch.shape == (8, 16, 16, 3)
    assert batch.sharding.is_equivalent_to(plan.batch_sharding, batch.ndim)
    # each device holds exactly one image of the batch
    assert len(batch.addressable_shards) == 8
    assert batch.addressable_shards[0].data.shape == (1, 16, 16, 3)


def test_drop_last_false_wraps_final_batch(image_dir):
    ds = ImageFolderDataset(image_dir, (16, 16))  # 10 images
    pipe = InputPipeline(ds, global_batch_size=4, num_workers=2, drop_last=False)
    batches = list(pipe.host_batches(num_epochs=1))
    assert len(batches) == 3  # ceil(10/4), final batch wrap-filled
    assert all(b.shape == (4, 16, 16, 3) for b in batches)


def test_prefetch_zero_rejected(image_dir):
    """queue.Queue(maxsize=0) is UNBOUNDED, the opposite of 'no prefetch'."""
    ds = ImageFolderDataset(image_dir, (16, 16))
    with pytest.raises(ValueError, match="prefetch"):
        InputPipeline(ds, global_batch_size=4, prefetch=0)


def test_decode_substitution_is_deterministic(image_dir):
    """The substitute draw is seeded by (seed, index), not a shared RNG, so
    concurrent decode threads can't make it scheduler-dependent."""
    bad = os.path.join(image_dir, "zz_corrupt2.jpg")
    with open(bad, "wb") as f:
        f.write(b"\xff\xd8 nope")
    ds = ImageFolderDataset(image_dir, (16, 16), seed=3)
    idx = ds.files.index(bad)
    first = ds[idx]
    for _ in range(3):  # same instance, repeated draws: identical substitute
        np.testing.assert_array_equal(ds[idx], first)
    ds2 = ImageFolderDataset(image_dir, (16, 16), seed=3)
    np.testing.assert_array_equal(ds2[idx], first)


def test_dataset_smaller_than_batch_raises_with_drop_last(image_dir):
    """drop_last + dataset < global batch would yield ZERO batches per epoch
    and an unbounded run would hang on the queue forever; must fail loudly."""
    ds = ImageFolderDataset(image_dir, (16, 16))  # 10 images
    with pytest.raises(ValueError, match="drop_last"):
        InputPipeline(ds, global_batch_size=20, num_workers=2)


def test_dataset_smaller_than_batch_wraps_without_drop_last(image_dir):
    """drop_last=False must wrap-fill even when one batch needs more than a
    full extra pass over the dataset (10 images, batch 32)."""
    ds = ImageFolderDataset(image_dir, (16, 16))  # 10 images
    pipe = InputPipeline(ds, global_batch_size=32, num_workers=2,
                         drop_last=False)
    batches = list(pipe.host_batches(num_epochs=1))
    assert len(batches) == 1
    assert batches[0].shape == (32, 16, 16, 3)


def test_device_batches_finite_epochs_terminate(image_dir):
    ds = ImageFolderDataset(image_dir, (16, 16))
    pipe = InputPipeline(ds, global_batch_size=4, num_workers=2)
    batches = list(pipe.device_batches(num_epochs=2))
    assert len(batches) == 4  # 2 per epoch (10 images, batch 4, drop_last)
