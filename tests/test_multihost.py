"""True multi-process SPMD: 2 jax.distributed processes on localhost, each
owning 2 virtual CPU devices. Validates the per-process data pipeline
(host slices + make_array_from_process_local_data) and a full data-parallel
train step across processes — the multi-node path no single-process test can
exercise (SURVEY.md §2.2 'DCN only for per-host input sharding')."""

import os
import socket
import subprocess
import sys
import textwrap

import numpy as np
import pytest
from PIL import Image

pytestmark = pytest.mark.slow  # multi-minute end-to-end drives

_WORKER = textwrap.dedent(
    """
    import os, sys
    rank = int(sys.argv[1]); port = sys.argv[2]; data_dir = sys.argv[3]
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                               num_processes=2, process_id=rank)
    import numpy as np
    import jax.numpy as jnp
    assert jax.process_count() == 2 and len(jax.devices()) == 4

    from fast_neural_style_transfer_tpu.data import ImageFolderDataset, InputPipeline
    from fast_neural_style_transfer_tpu.parallel import make_mesh_plan

    ds = ImageFolderDataset(data_dir, (16, 16), seed=0)
    plan = make_mesh_plan()
    pipe = InputPipeline(ds, global_batch_size=4, num_workers=2,
                         sharding=plan.batch_sharding, seed=0)
    assert pipe.local_batch_size == 2
    batch = next(iter(pipe))
    assert batch.shape == (4, 16, 16, 3)
    local = batch.addressable_shards
    assert len(local) == 2  # only this process's devices
    hb = next(pipe.host_batches(num_epochs=1))
    for s in local:
        row = s.index[0].start
        np.testing.assert_allclose(np.asarray(s.data)[0], hb[row - rank * 2])

    # one DP train step across BOTH processes (grad psum spans them)
    from fast_neural_style_transfer_tpu.core.dtypes import Precision
    from fast_neural_style_transfer_tpu.losses import (
        LossTaps, style_targets_from_features)
    from fast_neural_style_transfer_tpu.models import TransformerNet, VGG19Features
    from fast_neural_style_transfer_tpu.train import (
        LossWeightSchedule, create_train_state, make_train_step)
    from fast_neural_style_transfer_tpu.train.state import (
        make_optimizer, replicate_state)

    key = jax.random.PRNGKey(0)
    taps = LossTaps(content_tap="relu4_2")
    vgg = jax.device_put(VGG19Features.init(key), plan.replicated)
    style = jnp.asarray(np.random.default_rng(7).normal(size=(1, 16, 16, 3)),
                        jnp.float32)
    grams = tuple(jax.device_put(g, plan.replicated) for g in
                  style_targets_from_features(
                      VGG19Features.apply(vgg, style, taps.style_taps)))
    opt = make_optimizer(1e-3, 10)
    state = replicate_state(
        create_train_state(TransformerNet.init(key), opt), plan.replicated)
    step = make_train_step(opt, taps=taps, weight_schedule=LossWeightSchedule(),
                           lr=1e-3, total_steps=10, donate=False)
    state, metrics = step(state, vgg, batch, grams, None)
    loss = float(metrics["loss"])
    assert np.isfinite(loss) and int(state.step) == 1
    print(f"rank {rank}: pipeline+train OK loss={loss:.6f}", flush=True)

    # AdaIN decoder DP step across BOTH processes (second model family):
    # each rank assembles its local slice of the same seeded global uint8
    # batches; the decoder grads psum over the cross-process data axis
    import optax
    from fast_neural_style_transfer_tpu.models.adain import AdaINDecoder
    from fast_neural_style_transfer_tpu.train.adain import make_adain_train_step

    gc = np.random.default_rng(9).integers(0, 256, (4, 16, 16, 3)).astype(np.uint8)
    gs = np.random.default_rng(10).integers(0, 256, (4, 16, 16, 3)).astype(np.uint8)
    local_rows = slice(rank * 2, rank * 2 + 2)
    c_arr = jax.make_array_from_process_local_data(
        plan.batch_sharding, gc[local_rows])
    s_arr = jax.make_array_from_process_local_data(
        plan.batch_sharding, gs[local_rows])
    ad_opt = optax.adam(1e-4)
    ad_state = replicate_state(
        create_train_state(AdaINDecoder.init(key), ad_opt), plan.replicated)
    ad_step = make_adain_train_step(ad_opt, donate=False, lr_decay=5e-5)
    ad_state, ad_metrics = ad_step(ad_state, vgg, c_arr, s_arr)
    ad_loss = float(ad_metrics["loss"])
    assert np.isfinite(ad_loss) and int(ad_state.step) == 1
    print(f"rank {rank}: adain DP OK loss={ad_loss:.6f}", flush=True)
    """
)


@pytest.mark.skipif(os.environ.get("FNST_SKIP_MULTIHOST") == "1",
                    reason="multihost test disabled")
def test_two_process_pipeline_and_train_step(tmp_path):
    rng = np.random.default_rng(0)
    data = tmp_path / "data"
    data.mkdir()
    for i in range(8):
        Image.fromarray(rng.integers(0, 256, (20, 20, 3), dtype=np.uint8)).save(
            data / f"i{i}.png"
        )
    worker = tmp_path / "worker.py"
    worker.write_text(_WORKER)
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()

    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    # Workers must import the package even when it isn't pip-installed:
    # sys.path[0] for `python /tmp/worker.py` is /tmp, not the cwd.
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen(
            [sys.executable, str(worker), str(r), str(port), str(data)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env,
            cwd="/root/repo",
        )
        for r in (0, 1)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=300)
        outs.append(out.decode())
        assert p.returncode == 0, out.decode()[-2000:]
    # both ranks computed the SAME global loss (grads/loss span processes)
    losses = [l.split("loss=")[1].strip() for o in outs for l in o.splitlines()
              if "pipeline+train OK" in l]
    assert len(losses) == 2 and losses[0] == losses[1], losses
    ad = [l.split("loss=")[1].strip() for o in outs for l in o.splitlines()
          if "adain DP OK" in l]
    assert len(ad) == 2 and ad[0] == ad[1], ad
