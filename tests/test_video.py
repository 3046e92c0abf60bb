"""Video stylization: frozen-IN-statistics stabilization + clip IO.

The stabilization contract (infer/video.py): capturing a forward's own IN
moments and re-injecting them reproduces the plain forward exactly; frozen
reference statistics remove normalization re-exposure — static pixels outside
the moving content's receptive field are bitwise stable, whereas the
reference's per-frame normalization (/root/reference/inference.py applied
frame-by-frame) provably changes them (DESIGN.md §13)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fast_neural_style_transfer_tpu.infer.video import (
    VideoStylizer,
    flicker_score,
    read_frames,
    stylize_video_file,
    write_frames,
)
from fast_neural_style_transfer_tpu.models import TransformerNet


@pytest.fixture(scope="module")
def params():
    return TransformerNet.init(jax.random.PRNGKey(0))


def _clip(n=6, h=64, w=64, seed=0):
    """A fixed textured background with a bright disk growing a little each
    frame: the local change drifts every frame's GLOBAL channel moments, which
    is exactly what makes per-frame instance norm re-expose the whole stylized
    frame (flicker) while frozen statistics confine the change to the disk."""
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 120, (h, w, 3), dtype=np.uint8)
    base = ((base.astype(np.int32) + np.roll(base, 1, 0) + np.roll(base, 1, 1))
            // 3).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        f = base.copy()
        r = 6 + 3 * i
        mask = (yy - h // 2) ** 2 + (xx - w // 2) ** 2 <= r * r
        f[mask] = 235
        frames.append(f)
    return np.stack(frames)


# -- model-level stats contract ----------------------------------------------


def test_capture_matches_plain_forward(params):
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    y0 = TransformerNet.apply(params, x)
    y1, stats = TransformerNet.apply(params, x, return_stats=True)
    assert len(stats) == 14  # 4 top-level + 2 per res block x 5
    assert stats[0][0].shape == (1, 1, 1, 64)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y1), atol=1e-5)


def test_self_injection_is_identity(params):
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 32, 32, 3))
    y0 = TransformerNet.apply(params, x)
    _, stats = TransformerNet.apply(params, x, return_stats=True)
    y2 = TransformerNet.apply(params, x, in_stats=stats)
    np.testing.assert_allclose(np.asarray(y0), np.asarray(y2), atol=1e-4)


def test_blend_zero_matches_per_frame(params):
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 32, 32, 3))
    ref = jax.random.normal(jax.random.PRNGKey(4), (1, 32, 32, 3))
    _, stats = TransformerNet.apply(params, ref, return_stats=True)
    y_plain = TransformerNet.apply(params, x)
    y_b0 = TransformerNet.apply(params, x, in_stats=stats, stats_blend=0.0)
    np.testing.assert_allclose(np.asarray(y_plain), np.asarray(y_b0), atol=1e-4)
    # and a fully frozen forward actually differs (stats are load-bearing)
    y_b1 = TransformerNet.apply(params, x, in_stats=stats, stats_blend=1.0)
    assert float(jnp.abs(y_b1 - y_plain).max()) > 1e-3


def test_wrong_stats_length_rejected(params):
    x = jax.random.normal(jax.random.PRNGKey(5), (1, 32, 32, 3))
    _, stats = TransformerNet.apply(params, x, return_stats=True)
    with pytest.raises(ValueError, match="14 IN sites"):
        TransformerNet.apply(params, x, in_stats=stats[:3])


# -- VideoStylizer ------------------------------------------------------------


def _reexposure_clip(n=6, h=160, w=160, seed=0):
    """Static textured background; a bright disk grows in the TOP-LEFT
    corner only. The frame is large enough that the bottom-right block lies
    outside the net's ~107 px receptive field of every changed pixel
    (DESIGN.md §13), so any inter-frame change there is pure normalization
    re-exposure, not content."""
    rng = np.random.default_rng(seed)
    base = rng.integers(40, 120, (h, w, 3), dtype=np.uint8)
    base = ((base.astype(np.int32) + np.roll(base, 1, 0) + np.roll(base, 1, 1))
            // 3).astype(np.uint8)
    yy, xx = np.mgrid[0:h, 0:w]
    frames = []
    for i in range(n):
        f = base.copy()
        r = 8 + 2 * i
        mask = (yy - 28) ** 2 + (xx - 28) ** 2 <= r * r
        f[mask] = 235
        frames.append(f)
    return np.stack(frames)


@pytest.mark.slow
def test_stabilization_removes_reexposure_flicker(params):
    """The honest stabilization claim (root-caused in round 4, DESIGN.md
    §13): frozen IN statistics make static pixels outside the moving
    content's receptive field BITWISE stable (flicker exactly 0), while
    per-frame normalization provably re-exposes them — the local change
    drifts the frame's global moments, and those moments renormalize every
    pixel. A whole-frame metric only shows the win when moving content is a
    small fraction of the frame (here it is); on content-dominated frames
    per-frame IN's gain control can compress genuine content change below
    the re-exposure it adds, which is why the old 64x64 growing-disk test
    was wrong, not the feature."""
    frames = _reexposure_clip()
    stable = VideoStylizer(params, stabilize=True).stylize_frames(frames)
    plain = VideoStylizer(params, stabilize=False).stylize_frames(frames)
    assert stable.shape == frames.shape and stable.dtype == np.uint8
    bg = np.zeros(frames.shape[1:3], bool)
    bg[-32:, -32:] = True  # ~150 px from the disk, RF ~107 px
    # theorem: frozen stats -> static region bitwise stable
    assert flicker_score(stable, mask=bg) == 0.0
    # per-frame IN re-exposes the same untouched pixels
    assert flicker_score(plain, mask=bg) > 0.5
    # and with moving content a small fraction of the frame, the win shows
    # up whole-frame too (measured r4: frozen 4.58 vs per-frame 5.63)
    assert flicker_score(stable) < flicker_score(plain)


def test_flicker_score_mask_validation():
    frames = np.zeros((3, 8, 8, 3), np.uint8)
    with pytest.raises(ValueError, match="mask shape"):
        flicker_score(frames, mask=np.ones((4, 4), bool))


def test_pallas_norm_method_rejected_with_stats(params):
    x = jax.random.normal(jax.random.PRNGKey(6), (1, 32, 32, 3))
    with pytest.raises(ValueError, match="pallas"):
        TransformerNet.apply(params, x, norm_method="pallas", return_stats=True)


def test_reset_reference(params):
    vs = VideoStylizer(params, stabilize=True)
    a = _clip(n=2)
    vs.stylize_frames(a)
    assert vs._stats is not None
    vs.reset_reference()
    assert vs._stats is None


def test_first_frame_identical_stable_vs_plain(params):
    # frame 0 IS the reference frame: injecting its own stats is an
    # identity, so stabilized and plain stylization agree on frame 0
    frames = _clip(n=3)
    stable = VideoStylizer(params, stabilize=True).stylize_frames(frames)
    plain = VideoStylizer(params, stabilize=False).stylize_frames(frames)
    diff = np.abs(stable[0].astype(int) - plain[0].astype(int))
    assert diff.max() <= 1  # u8 rounding only


def test_short_tail_chunk(params):
    frames = _clip(n=5)
    vs = VideoStylizer(params)
    out = vs.stylize_frames(frames, batch_size=4)  # 4 + padded tail of 1
    out_one = vs.stylize_frames(frames, batch_size=5)
    np.testing.assert_array_equal(out, out_one)


def test_rejects_bad_inputs(params):
    vs = VideoStylizer(params)
    with pytest.raises(ValueError, match=r"\(N, H, W, 3\)"):
        vs.stylize_frames(np.zeros((64, 64, 3), np.uint8))
    with pytest.raises(TypeError, match="uint8"):
        vs.stylize_frames(np.zeros((2, 64, 64, 3), np.float32))
    with pytest.raises(ValueError, match="stats_blend"):
        VideoStylizer(params, stats_blend=1.5)


# -- clip IO -------------------------------------------------------------------


def test_gif_roundtrip(tmp_path):
    frames = _clip(n=4, h=32, w=32)
    gif = str(tmp_path / "clip.gif")
    write_frames(frames, gif, fps=10)
    back = read_frames(gif)
    # GIF is 256-color-paletted: identical shape/count, approximate values
    assert back.shape == frames.shape and back.dtype == np.uint8


def test_read_frames_natural_sort(tmp_path):
    from PIL import Image

    d = tmp_path / "frames"
    d.mkdir()
    # non-zero-padded names: lexicographic order would read 1, 10, 2
    for i, v in [(1, 10), (2, 20), (10, 100)]:
        Image.fromarray(np.full((8, 8, 3), v, np.uint8)).save(
            d / f"frame_{i}.png")
    back = read_frames(str(d))
    assert [int(f[0, 0, 0]) for f in back] == [10, 20, 100]


def test_frame_dir_roundtrip_exact(tmp_path):
    frames = _clip(n=4, h=32, w=32)
    d = str(tmp_path / "frames")
    write_frames(frames, d)
    back = read_frames(d)
    np.testing.assert_array_equal(back, frames)  # PNG is lossless
    resized = read_frames(d, size=(16, 16))
    assert resized.shape == (4, 16, 16, 3)
    limited = read_frames(d, max_frames=2)
    assert limited.shape[0] == 2


def test_read_frames_shape_mismatch(tmp_path):
    from PIL import Image

    d = tmp_path / "bad"
    d.mkdir()
    Image.fromarray(np.zeros((32, 32, 3), np.uint8)).save(d / "a.png")
    Image.fromarray(np.zeros((16, 32, 3), np.uint8)).save(d / "b.png")
    with pytest.raises(ValueError, match="disagree on shape"):
        read_frames(str(d))


# -- end-to-end (checkpoint -> clip -> gif) ------------------------------------


def test_stylize_video_file_e2e(params, tmp_path):
    from fast_neural_style_transfer_tpu.train.checkpoint import save_params_npz

    ckpt = str(tmp_path / "net.npz")
    save_params_npz(params, ckpt)
    src = str(tmp_path / "in")
    write_frames(_clip(n=4), src)
    out_gif = str(tmp_path / "out.gif")
    summary = stylize_video_file(ckpt, src, out_gif, batch_size=4)
    assert summary["frames"] == 4 and summary["stabilized"]
    assert os.path.exists(out_gif)
    assert read_frames(out_gif).shape == (4, 64, 64, 3)
    assert summary["output_flicker"] >= 0.0


def test_cli_parser():
    from fast_neural_style_transfer_tpu.cli.video import build_parser

    args = build_parser().parse_args(
        ["--model_path", "m.npz", "--content", "in", "--output", "o.gif",
         "--stats_blend", "0.7", "--max_frames", "3"])
    assert args.stats_blend == 0.7 and args.max_frames == 3
