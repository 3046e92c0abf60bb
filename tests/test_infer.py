"""Inference tests: bucketing, arbitrary resolution, file-in/file-out CLI path."""

import pytest
import numpy as np
from PIL import Image

import jax
import jax.numpy as jnp

from fast_neural_style_transfer_tpu.infer import Stylizer, stylize_image_file
from fast_neural_style_transfer_tpu.models import TransformerNet
from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz
from fast_neural_style_transfer_tpu.utils.image_io import (
    denormalize_image,
    load_image,
    normalize_image,
    save_image,
)


def _params():
    return TransformerNet.init(jax.random.PRNGKey(0))


def test_stylizer_preserves_input_resolution():
    s = Stylizer(_params())
    for h, w in [(64, 64), (100, 130), (57, 200)]:
        x = np.random.default_rng(0).normal(size=(1, h, w, 3)).astype(np.float32)
        out = s(x)
        assert out.shape == (1, h, w, 3)


def test_bucketing_matches_direct_forward():
    """Padding to the bucket and cropping back must equal the direct forward
    when the input is already bucket-aligned."""
    s = Stylizer(_params())
    x = np.random.default_rng(1).normal(size=(1, 64, 64, 3)).astype(np.float32)
    direct = np.asarray(
        TransformerNet.apply(s.params, jax.numpy.asarray(x), train=False)
    )
    np.testing.assert_allclose(s(x), direct, rtol=1e-3, atol=1e-5)


def test_stylize_unbatched_returns_01_range():
    s = Stylizer(_params())
    img = normalize_image(
        np.random.default_rng(2).integers(0, 256, (70, 90, 3), dtype=np.uint8)
    )
    out = s.stylize(img)
    assert out.shape == (70, 90, 3)
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_stylize_image_file_end_to_end(tmp_path):
    rng = np.random.default_rng(3)
    content = tmp_path / "content.jpg"
    Image.fromarray(rng.integers(0, 256, (120, 80, 3), dtype=np.uint8)).save(content)
    model = tmp_path / "model.npz"
    save_params_npz(_params(), str(model))

    out_path = stylize_image_file(str(model), str(content), str(tmp_path / "out.jpg"))
    with Image.open(out_path) as im:
        assert im.size == (80, 120)  # PIL reports (w, h)


def test_image_io_normalize_roundtrip(tmp_path):
    rng = np.random.default_rng(4)
    arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    p = tmp_path / "x.png"
    Image.fromarray(arr).save(p)
    x = load_image(str(p))  # normalized NHWC
    back = denormalize_image(x[0])
    np.testing.assert_allclose(back, arr.astype(np.float32) / 255.0, atol=1e-6)
    save_image(x, str(tmp_path / "y.png"))
    with Image.open(tmp_path / "y.png") as im:
        np.testing.assert_array_equal(np.asarray(im), arr)


def test_begin_inference_cli_spatial(tmp_path):
    """--spatial N routes through the halo-exchange forward (in-process,
    virtual 8-device mesh)."""
    from fast_neural_style_transfer_tpu.cli.begin_inference import main
    from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

    model = tmp_path / "m.npz"
    save_params_npz(_params(), str(model))
    content = tmp_path / "c.jpg"
    Image.fromarray(
        np.random.default_rng(5).integers(0, 256, (96, 64, 3), dtype=np.uint8)
    ).save(content)
    main([
        "--model_path", str(model), "--content_image", str(content),
        "--output_dir", str(tmp_path), "--output_name", "sp.jpg",
        "--spatial", "4",
    ])
    with Image.open(tmp_path / "sp.jpg") as im:
        assert im.size == (64, 96)


def test_stylizer_from_reference_pth_checkpoint(tmp_path):
    """Stylizer loads the reference's .pth checkpoint format directly."""
    from fast_neural_style_transfer_tpu.export import save_torch_checkpoint

    params = _params()
    path = str(tmp_path / "ref_style.pth")
    save_torch_checkpoint(params, path)
    s = Stylizer.from_checkpoint(path)
    x = np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype(np.float32)
    direct = Stylizer(params)(x)
    np.testing.assert_allclose(s(x), direct, rtol=1e-5, atol=1e-5)


def test_stylizer_rejects_torchscript_archive(tmp_path):
    import pytest

    from fast_neural_style_transfer_tpu.export.torchscript import export_torchscript

    path = str(tmp_path / "model_traced.pt")
    export_torchscript(_params(), path, example_hw=32)
    with pytest.raises(ValueError, match="TorchScript"):
        Stylizer.from_checkpoint(path)


def test_stylize_u8_matches_f32_path():
    """The uint8 device-roundtrip must equal the f32 network-space path up
    to output rounding (same normalize -> forward -> denormalize math)."""
    params = _params()
    s = Stylizer(params)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (2, 40, 56, 3), dtype=np.uint8)

    got = s.stylize_u8(u8)
    assert got.dtype == np.uint8 and got.shape == u8.shape

    from fast_neural_style_transfer_tpu.utils.image_io import normalize_image

    want01 = s.stylize(normalize_image(u8).astype(np.float32))
    want_u8 = (want01 * 255.0 + 0.5).astype(np.uint8)
    # identical up to +-1 quantum from f32 rounding order
    assert np.abs(got.astype(int) - want_u8.astype(int)).max() <= 1
    # unbatched input round-trips too
    one = s.stylize_u8(u8[0])
    assert one.shape == u8[0].shape and one.dtype == np.uint8


def test_stylize_u8_rejects_float():
    import pytest

    s = Stylizer(_params())
    with pytest.raises(TypeError, match="uint8"):
        s.stylize_u8(np.zeros((8, 8, 3), np.float32))


def test_stylize_directory_batches_mixed_shapes(tmp_path):
    """Directory stylization: mixed image sizes group into shape buckets,
    every input yields a <stem>_stylized.jpg, values match the single-image
    path."""
    from PIL import Image

    from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz
    from fast_neural_style_transfer_tpu.infer import stylize_directory

    rng = np.random.default_rng(0)
    src = tmp_path / "imgs"
    src.mkdir()
    shapes = [(40, 56), (40, 56), (32, 32), (40, 56)]
    for i, (h, w) in enumerate(shapes):
        Image.fromarray(
            rng.integers(0, 256, (h, w, 3), dtype=np.uint8)).save(
            src / f"im{i}.png")

    params = _params()
    model = str(tmp_path / "m.npz")
    save_params_npz(params, model)

    outs = stylize_directory(model, str(src), str(tmp_path / "out"),
                             batch_size=2)
    assert len(outs) == 4 and all(o is not None for o in outs)
    import os

    for i, (h, w) in enumerate(shapes):
        out = np.asarray(Image.open(tmp_path / "out" / f"im{i}_stylized.jpg"))
        assert out.shape == (h, w, 3)
        assert os.path.exists(outs[i])

    # batched forward == per-image forward (in memory; the files above add
    # a JPEG encode that swamps a value comparison on random-weight noise)
    s = Stylizer(params)
    u8s = np.stack([
        np.asarray(Image.open(src / f"im{i}.png").convert("RGB"))
        for i in (0, 1, 3)])
    batched = s.stylize_u8(u8s)
    for j in range(3):
        single = s.stylize_u8(u8s[j])
        assert np.abs(batched[j].astype(int) - single.astype(int)).max() <= 1


def test_stylize_directory_no_collision_across_subdirs(tmp_path):
    """Same-named files in different subdirectories must not clobber each
    other: outputs mirror the relative path, and a same-dir stem clash
    (x.jpg vs x.png) gets a numeric suffix."""
    from PIL import Image

    from fast_neural_style_transfer_tpu.infer import stylize_directory

    rng = np.random.default_rng(0)
    src = tmp_path / "imgs"
    (src / "a").mkdir(parents=True)
    (src / "b").mkdir()
    for p in ("a/photo.jpg", "b/photo.jpg", "b/photo.png"):
        Image.fromarray(
            rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)).save(src / p)

    model = str(tmp_path / "m.npz")
    save_params_npz(_params(), model)
    outs = stylize_directory(model, str(src), str(tmp_path / "out"),
                             batch_size=2)
    assert len(outs) == 3
    assert len(set(outs)) == 3, f"output paths collided: {outs}"
    import os

    for o in outs:
        assert os.path.exists(o), o


def test_from_checkpoint_missing_path_raises_without_mkdir(tmp_path):
    """A typo'd checkpoint path must raise FileNotFoundError — not create an
    empty Orbax directory as a side effect and then complain about it."""
    import pytest

    missing = tmp_path / "no_such_dir"
    with pytest.raises(FileNotFoundError, match="no such checkpoint"):
        Stylizer.from_checkpoint(str(missing))
    assert not missing.exists()


def test_cli_rejects_content_dir_with_spatial(tmp_path):
    import pytest

    from fast_neural_style_transfer_tpu.cli.begin_inference import main

    with pytest.raises(SystemExit, match="content_dir"):
        main(["--content_dir", str(tmp_path), "--spatial", "4",
              "--model_path", "x.npz", "--output_dir", str(tmp_path)])


@pytest.mark.slow
def test_stylizer_from_grad_accum_orbax_checkpoint(tmp_path):
    """Orbax checkpoints from --grad_accum>1 runs wrap opt_state in
    optax.MultiSteps; inference restore must not depend on the optimizer
    topology the run used."""
    from fast_neural_style_transfer_tpu.train.checkpoint import CheckpointManager
    from fast_neural_style_transfer_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )

    params = _params()
    opt = make_optimizer(1e-3, 100, grad_accum=4)
    state = create_train_state(params, opt)
    ckdir = str(tmp_path / "ckpts")
    mgr = CheckpointManager(ckdir)
    mgr.save(0, state)
    mgr.close()

    s = Stylizer.from_checkpoint(ckdir)
    x = np.random.default_rng(0).normal(size=(1, 32, 32, 3)).astype(np.float32)
    np.testing.assert_allclose(s(x), Stylizer(params)(x), rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_int8_quantized_forward_agrees_with_f32():
    """int8 quantized inference must track the f32 forward closely even on
    a random-weight (worst-case, chaotic) network; instance norm after
    every conv keeps per-layer scale error from compounding."""
    from fast_neural_style_transfer_tpu.infer.quantized import (
        apply_int8,
        quantize_params,
    )

    params = _params()
    q = quantize_params(params)
    x = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
    ref = np.asarray(
        __import__("fast_neural_style_transfer_tpu.models",
                   fromlist=["TransformerNet"]).TransformerNet.apply(
            params, x, train=False))
    got = np.asarray(apply_int8(q, x))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    corr = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert rel < 0.15 and corr > 0.98, (rel, corr)


@pytest.mark.slow
def test_int8_stylizer_end_to_end():
    """precision='int8' drives the same Stylizer API (incl. the u8
    roundtrip and shape bucketing)."""
    params = _params()
    s8 = Stylizer(params, precision="int8")
    sf = Stylizer(params)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (1, 40, 56, 3), dtype=np.uint8)
    got = s8.stylize_u8(u8)
    assert got.dtype == np.uint8 and got.shape == u8.shape
    want = sf.stylize_u8(u8)
    # int8 quantization error in [0,255] space stays small
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 12.0


@pytest.mark.slow
def test_int8_static_calibration_matches_dynamic():
    """Calibrated static scales track dynamic quantization on held-out
    input (scale transfer across batches)."""
    from fast_neural_style_transfer_tpu.infer.quantized import (
        apply_int8,
        calibrate,
        quantize_params,
    )

    params = _params()
    q = quantize_params(params)
    cal = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 64, 64, 3)), jnp.float32)
    qc = calibrate(q, params, cal)
    x = jnp.asarray(
        np.random.default_rng(7).standard_normal((2, 64, 64, 3)), jnp.float32)
    ref = np.asarray(TransformerNet.apply(params, x, train=False))
    got = np.asarray(apply_int8(qc, x))
    rel = np.linalg.norm(got - ref) / np.linalg.norm(ref)
    assert rel < 0.15, rel


def test_stylizer_data_parallel_matches_single_device():
    """A batch sharded over the virtual 8-device data axis must produce the
    same images as the unsharded forward (params replicated, XLA DP)."""
    from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

    params = _params()
    plan = make_mesh_plan()
    assert plan.num_data_shards == 8
    sdp = Stylizer(params, sharding=plan.batch_sharding)
    s1 = Stylizer(params)
    rng = np.random.default_rng(0)
    u8 = rng.integers(0, 256, (8, 40, 56, 3), dtype=np.uint8)
    got = sdp.stylize_u8(u8)
    want = s1.stylize_u8(u8)
    assert np.abs(got.astype(int) - want.astype(int)).max() <= 1
    # non-divisible batches fall back to the default device and still work
    got5 = sdp.stylize_u8(u8[:5])
    assert np.abs(got5.astype(int) - want[:5].astype(int)).max() <= 1


def test_stylize_directory_data_parallel(tmp_path):
    from PIL import Image

    from fast_neural_style_transfer_tpu.infer import stylize_directory
    from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

    rng = np.random.default_rng(1)
    src = tmp_path / "imgs"
    src.mkdir()
    for i in range(5):  # 5 images, batch 8 -> one wrap-padded DP batch
        Image.fromarray(
            rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)).save(
            src / f"im{i}.png")
    model = str(tmp_path / "m.npz")
    save_params_npz(_params(), model)
    outs = stylize_directory(model, str(src), str(tmp_path / "out"),
                             batch_size=8, data_parallel=True)
    assert len(outs) == 5 and all(o is not None for o in outs)


def test_directory_skip_bad_images(tmp_path):
    """skip_bad_images: corrupt files are logged and skipped (None in the
    returned list); default behavior still raises."""
    import os

    import pytest

    from fast_neural_style_transfer_tpu.infer import stylize_directory

    rng = np.random.default_rng(0)
    content = tmp_path / "content"
    content.mkdir()
    for i in range(3):
        Image.fromarray(rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
                        ).save(content / f"ok{i}.jpg")
    (content / "corrupt.jpg").write_bytes(b"\xff\xd8 not a real jpeg")
    model = str(tmp_path / "m.npz")
    save_params_npz(TransformerNet.init(jax.random.PRNGKey(0)), model)

    with pytest.raises(Exception):
        stylize_directory(model, str(content), str(tmp_path / "out_fail"),
                          size=(24, 24), batch_size=2)

    written = stylize_directory(model, str(content), str(tmp_path / "out"),
                                size=(24, 24), batch_size=2,
                                skip_bad_images=True)
    done = [w for w in written if w]
    assert len(written) == 4 and len(done) == 3
    assert all(os.path.exists(w) for w in done)
    assert not any(w and "corrupt" in w for w in written)


def test_directory_skip_bad_images_grouping_path(tmp_path):
    """Without a fixed --size the engine reads headers to group shapes; a
    corrupt file must be skipped there too (before any decode)."""
    import os

    from fast_neural_style_transfer_tpu.infer import stylize_directory

    rng = np.random.default_rng(1)
    content = tmp_path / "content"
    content.mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
                        ).save(content / f"ok{i}.jpg")
    (content / "broken.jpg").write_bytes(b"not an image at all")
    model = str(tmp_path / "m.npz")
    save_params_npz(TransformerNet.init(jax.random.PRNGKey(0)), model)

    written = stylize_directory(model, str(content), str(tmp_path / "out"),
                                batch_size=2, skip_bad_images=True)
    done = [w for w in written if w]
    assert len(written) == 3 and len(done) == 2


def test_cli_bulk_skip_bad_images(tmp_path):
    """--skip_bad_images on the inference CLI: bulk job completes and
    reports the skip count."""
    import os

    from fast_neural_style_transfer_tpu.cli.begin_inference import main

    rng = np.random.default_rng(2)
    content = tmp_path / "content"
    content.mkdir()
    for i in range(2):
        Image.fromarray(rng.integers(0, 256, (24, 24, 3), dtype=np.uint8)
                        ).save(content / f"ok{i}.jpg")
    (content / "bad.jpg").write_bytes(b"nope")
    model = str(tmp_path / "m.npz")
    save_params_npz(TransformerNet.init(jax.random.PRNGKey(0)), model)

    main(["--content_dir", str(content), "--model_path", model,
          "--output_dir", str(tmp_path / "out"), "--size", "24", "24",
          "--batch_size", "2", "--skip_bad_images"])
    outs = os.listdir(tmp_path / "out")
    assert len(outs) == 2 and not any("bad" in o for o in outs)
