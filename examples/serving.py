"""Serving patterns: the production inference paths on one host.

Runs everywhere (forces CPU with a virtual 8-device mesh unless
FNST_SERVING_DEVICE=tpu): demonstrates, in order,

1. the uint8 device-roundtrip single-image path (what `fnst-infer` uses —
   both transfer directions carry 1/4 the f32 bytes);
2. batched equal-shape stylization through one compiled program;
3. data-parallel batches sharded over every chip (params replicated;
   XLA handles the collectives);
4. height-sharded spatial inference for very large images
   (halo-exchange forward, exact — not overlap-tiling).

    python examples/serving.py [output_dir]
"""

import os
import sys

# run from a source checkout without installation
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get("FNST_SERVING_DEVICE", "cpu") == "cpu":
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    import jax

import numpy as np

from fast_neural_style_transfer_tpu.infer import Stylizer, stylize_spatial
from fast_neural_style_transfer_tpu.models import TransformerNet
from fast_neural_style_transfer_tpu.parallel import make_mesh_plan
from fast_neural_style_transfer_tpu.utils import save_image

out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fnst_serving"
os.makedirs(out_dir, exist_ok=True)
rng = np.random.default_rng(0)

# in production: Stylizer.from_checkpoint("run/style_transfer_final.npz")
params = TransformerNet.init(jax.random.PRNGKey(0))

# 1. single image, uint8 in -> uint8 out, normalize/denormalize on device
sty = Stylizer(params)
frame = rng.integers(0, 256, (300, 400, 3), dtype=np.uint8)
out = sty.stylize_u8(frame)
save_image(out.astype(np.float32) / 255.0, os.path.join(out_dir, "single.jpg"))
print(f"1. single u8 roundtrip: {frame.shape} -> {out.shape} {out.dtype}")

# 2. batched: equal-shape frames share one compiled program
batch = rng.integers(0, 256, (8, 300, 400, 3), dtype=np.uint8)
outs = sty.stylize_u8(batch)
print(f"2. batched: {batch.shape} -> {outs.shape} (one compile, reused)")

# 3. data-parallel over the mesh: batch dim sharded, params replicated
plan = make_mesh_plan()
dp = Stylizer(params, sharding=plan.batch_sharding)
outs_dp = dp.stylize_u8(batch)  # batch of 8 -> 1 image per device here
assert np.array_equal(np.asarray(outs_dp), np.asarray(outs))
print(f"3. data-parallel over {plan.num_data_shards} devices: identical output")

# 4. very large image: height sharded over a 'space' axis (halo exchange)
sp_plan = make_mesh_plan(spatial=4)
big = rng.standard_normal((1, 512, 256, 3)).astype(np.float32)
out_sp = np.asarray(stylize_spatial(params, big, sp_plan))
print(f"4. spatial (H over 4 shards): {big.shape} -> {out_sp.shape}")

# 5. arbitrary-style serving (AdaIN family): encode the style ONCE, then
#    stream u8 batches, data-parallel over the same mesh; alpha is a traced
#    operand so strength changes reuse the compiled program
from fast_neural_style_transfer_tpu.infer import ArbitraryStylizer
from fast_neural_style_transfer_tpu.models import AdaINDecoder
from fast_neural_style_transfer_tpu.models.vgg_weights import resolve_params

styler = ArbitraryStylizer(
    AdaINDecoder.init(jax.random.PRNGKey(1)), resolve_params(None),
    sharding=plan.batch_sharding,
).set_style_u8(rng.integers(0, 256, (64, 64, 3), dtype=np.uint8))
ad_out = styler.stylize_u8(batch[:, :64, :64], alpha=0.8)
print(f"5. arbitrary-style DP serving: {batch[:, :64, :64].shape} -> "
      f"{ad_out.shape} (style cached, one VGG encode per frame)")

# 6. online HTTP serving: concurrent requests micro-batched into one
#    device batch per shape bucket (serve/batcher.py); in production run
#    `fnst-serve --model final.npz --port 8765` instead
import io
import threading
import urllib.request
from concurrent.futures import ThreadPoolExecutor

from PIL import Image

from fast_neural_style_transfer_tpu.serve import make_server

srv = make_server(sty.stylize_u8, family="flagship", port=0,
                  max_wait_ms=200.0)
threading.Thread(target=srv.serve_forever, daemon=True).start()
buf = io.BytesIO()
Image.fromarray(frame).save(buf, format="JPEG")


def post(_):
    req = urllib.request.Request(
        f"http://127.0.0.1:{srv.server_address[1]}/stylize",
        data=buf.getvalue(), method="POST")
    with urllib.request.urlopen(req, timeout=300) as r:
        return r.read()


with ThreadPoolExecutor(max_workers=4) as ex:
    replies = list(ex.map(post, range(4)))
occ = srv.batcher.stats.snapshot()["mean_batch_occupancy"]
print(f"6. HTTP micro-batching: 4 concurrent POSTs -> "
      f"{len(replies)} JPEGs, mean batch occupancy {occ:.1f}")
srv.shutdown()

print(f"outputs under {out_dir}")
