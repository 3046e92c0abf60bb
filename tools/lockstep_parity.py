"""Lockstep training-dynamics parity vs the reference's EXECUTABLE trainer.

The strongest training-quality statement available with zero pretrained VGG
weights (PARITY.md: quality_evidence blocked-on-weights): run the reference's
own training math — its StyleTransferNet (/root/reference/models/model.py),
its loss functions (/root/reference/losses/losses.py), its optimizer recipe
(torch Adam(lr, betas=(0.9,0.999), eps=1e-8, weight_decay=1e-5) +
CosineAnnealingLR(T_max, eta_min=1e-7) + clip_grad_norm_(1.0), train.py:
135-145,203) and its step semantics (train.py:162-206: stylize -> clamp(-3,3)
-> no-grad content VGG -> grad VGG -> content/style/tv -> 1000*c + 1*s +
10*tv -> backward/clip/step/scheduler) — in lockstep with THIS repo's jitted
train step, from identical initial stylizer params, identical random-init VGG
weights (exported via models/vgg_weights.to_torch_state_dict), and an
identical fixed batch sequence. Per-step loss parity then proves the two
trainers compute the same function, converting every stability soak into
"trains the same dynamics as the reference code".

The ONE deliberate divergence: res-block Dropout2d is disabled on both sides
(torch: net.eval(), which changes nothing else — the reference's
InstanceNorm2d(track_running_stats=False) uses instance stats in both modes;
jax: make_train_step(dropout=False)) because dropout randomness cannot be
matched across frameworks. The reference's *executable* content tap is
feature index 4 = relu4_3 (losses/losses.py:49 over vgg19_net.py:56-65), so
the jax side runs REFERENCE_TAPS, not the documented-intent default.

Torch's VGG19 module cannot construct (self.slice5 never created — SURVEY
defect #1) and would download ImageNet weights; the oracle rebuilds its
*executable intent*: torchvision vgg19 ``features[0:25]`` layout with the
exact slice boundaries of vgg19_net.py:32-51 ([0:4) [4:9) [9:16) [16:22)
[22:25)), holding this repo's VGG init.

Usage: python tools/lockstep_parity.py [--steps 50] [--out evidence/...jsonl]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"

# torchvision vgg19 'E' cfg through features[24] (= relu4_3); numbers are
# conv output channels, "M" is 2x2/2 max-pool. Conv indices land at
# 0,2,5,7,10,12,14,16,19,21,23 — matching models/vgg.py TORCHVISION_CONV_INDEX.
_VGG_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, 256, "M",
            512, 512, 512]
# reference slice boundaries (vgg19_net.py:32-51)
_SLICES = ((0, 4), (4, 9), (9, 16), (16, 22), (22, 25))


def _load_ref_module(name: str, relpath: str):
    import importlib.util

    sys.path.insert(0, REF)
    try:
        spec = importlib.util.spec_from_file_location(name, f"{REF}/{relpath}")
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
    finally:
        sys.path.remove(REF)
    return mod


def _build_torch_vgg(vgg_params):
    """torchvision-features-layout Sequential[0:25] holding our VGG weights."""
    import torch
    import torch.nn as nn

    from fast_neural_style_transfer_tpu.models.vgg_weights import (
        to_torch_state_dict,
    )

    layers, cin = [], 3
    for v in _VGG_CFG:
        if v == "M":
            layers.append(nn.MaxPool2d(2, 2))
        else:
            layers.append(nn.Conv2d(cin, v, 3, padding=1))
            layers.append(nn.ReLU(inplace=False))
            cin = v
    features = nn.Sequential(*layers[:25])
    sd = {k[len("features."):]: __import__("torch").from_numpy(v)
          for k, v in to_torch_state_dict(vgg_params).items()
          if int(k.split(".")[1]) < 25}
    features.load_state_dict(sd, strict=True)
    features.eval()
    for p in features.parameters():
        p.requires_grad_(False)

    def forward(x):
        outs, h = [], x
        for lo, hi in _SLICES:
            for i in range(lo, hi):
                h = features[i](h)
            outs.append(h)
        return outs

    return forward


def run_lockstep(steps: int = 50, batch: int = 2, size: int = 64,
                 total_steps: int = 200, lr: float = 1e-3,
                 seed: int = 0, mode: str = "free") -> dict:
    """Run both trainers for ``steps`` on an identical batch sequence.

    ``mode="free"``: both trainers free-run from the shared init. Step-0
    parity is ~1e-7 rel, but the dynamics are chaotic — the reference clips
    its enormous early gradients to norm 1.0, so the update direction is
    grad/||grad|| and f32-level forward differences amplify ~2-3x per step
    (measured r4: <1e-2 rel through ~step 12, tens of percent by step 20
    while the trajectories stay statistically interchangeable). That is a
    property of f32 + the reference recipe, not of either implementation:
    the reference diverges from ITSELF the same way under a different
    summation order.

    ``mode="synced"``: the chaos-free statement. Before every step, the jax
    trainer's FULL state (params + Adam moments + bias-correction count +
    cosine position) is synced from the torch trajectory point, so each row
    compares one reference step against one jax step FROM THE SAME STATE:
    loss parity and post-update parameter parity, independently at every
    point along the reference's own trajectory. This is the "trains the
    same function" proof; "free" documents the chaos horizon.

    Returns {"steps": [...per-step rows...], "max_rel_diff": f, ...}.
    """
    import torch

    import jax
    import jax.numpy as jnp

    from fast_neural_style_transfer_tpu.export.torch_convert import (
        from_torch_state_dict,
        to_torch_state_dict,
    )
    from fast_neural_style_transfer_tpu.losses import (
        style_targets_from_features,
    )
    from fast_neural_style_transfer_tpu.losses.perceptual import REFERENCE_TAPS
    from fast_neural_style_transfer_tpu.train.schedule import LossWeightSchedule
    from fast_neural_style_transfer_tpu.models import (
        TransformerNet,
        VGG19Features,
    )
    from fast_neural_style_transfer_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )
    from fast_neural_style_transfer_tpu.train.step import make_train_step

    torch.manual_seed(seed)

    # shared initial state: our init -> both frameworks
    params = TransformerNet.init(jax.random.PRNGKey(seed))
    vgg_params = VGG19Features.init(jax.random.PRNGKey(seed + 1))

    # ---- torch oracle -------------------------------------------------------
    ref_model = _load_ref_module("lockstep_ref_model", "models/model.py")
    ref_losses = _load_ref_module("lockstep_ref_losses", "losses/losses.py")
    net = ref_model.StyleTransferNet()
    net.load_state_dict(
        {k: torch.from_numpy(np.asarray(v).copy())
         for k, v in to_torch_state_dict(params).items()},
        strict=True)
    net.eval()  # dropout OFF (see module docstring); IN unaffected
    vgg_fwd = _build_torch_vgg(vgg_params)

    opt = torch.optim.Adam(net.parameters(), lr=lr, betas=(0.9, 0.999),
                           eps=1e-8, weight_decay=1e-5)
    sched = torch.optim.lr_scheduler.CosineAnnealingLR(
        opt, T_max=total_steps, eta_min=1e-7)

    # fixed style image + batch sequence, identical arrays on both sides
    rng = np.random.default_rng(seed + 100)
    style_np = rng.normal(size=(1, size, size, 3)).astype(np.float32) * 0.5
    batches = [rng.normal(size=(batch, size, size, 3)).astype(np.float32) * 0.5
               for _ in range(steps)]

    def nchw(a):
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())

    with torch.no_grad():
        style_feats_t = vgg_fwd(nchw(style_np))
        style_targets_t = [ref_losses.gram_matrix(f).squeeze(0).detach()
                           for f in style_feats_t]  # train.py:25-37

    cw, sw, tw = 1000.0, 1.0, 10.0  # train.py:121-122, config.py:15

    def torch_step(content_batch):
        stylized = torch.clamp(net(content_batch), -3, 3)  # train.py:171-174
        with torch.no_grad():
            content_features = vgg_fwd(content_batch)      # train.py:177-178
        stylized_features = vgg_fwd(stylized)              # train.py:180
        c = ref_losses.content_loss(stylized_features, content_features)
        s = ref_losses.style_loss(stylized_features, style_targets_t)
        tv = ref_losses.total_variation_loss(stylized)
        total = cw * c + sw * s + tw * tv                  # train.py:188-191
        opt.zero_grad()
        total.backward()
        torch.nn.utils.clip_grad_norm_(net.parameters(), max_norm=1.0)
        opt.step()
        sched.step()                                       # train.py:199-206
        return {"total": float(total.detach()), "content": float(c.detach()) * cw,
                "style": float(s.detach()) * sw, "tv": float(tv.detach()) * tw}

    # ---- this repo's jitted step -------------------------------------------
    taps = REFERENCE_TAPS  # executable content tap: relu4_3
    optimizer = make_optimizer(lr, total_steps)
    state = create_train_state(params, optimizer)
    step_fn = make_train_step(
        optimizer, taps=taps,
        weight_schedule=LossWeightSchedule(content=cw, style=sw, tv=tw),
        lr=lr, total_steps=total_steps, dropout=False, donate=False)

    style_feats_j = VGG19Features.apply(
        vgg_params, jnp.asarray(style_np), taps.style_taps)
    style_grams = tuple(style_targets_from_features(style_feats_j))
    jrng = jax.random.PRNGKey(seed + 7)  # unused math-wise (dropout off)

    def torch_params_to_pytree():
        return from_torch_state_dict(
            {k: v.detach() for k, v in net.state_dict().items()})

    def synced_state(t):
        """TrainState at torch trajectory point t: torch params + Adam
        moments + count t injected into a fresh optax state (the same
        injection state_from_reference_checkpoint uses for .pth resume)."""
        from fast_neural_style_transfer_tpu.train.state import _walk_opt_state

        p_t = torch_params_to_pytree()
        mu_sd, nu_sd = {}, {}
        for k, p in net.named_parameters():
            st = opt.state.get(p)
            if st:
                mu_sd[k] = st["exp_avg"].detach().numpy()
                nu_sd[k] = st["exp_avg_sq"].detach().numpy()
            else:  # before the first update
                mu_sd[k] = np.zeros(tuple(p.shape), np.float32)
                nu_sd[k] = np.zeros(tuple(p.shape), np.float32)
        mu = from_torch_state_dict(mu_sd)
        nu = from_torch_state_dict(nu_sd)
        count = np.asarray(t, np.int32)
        opt_state = _walk_opt_state(
            optimizer.init(p_t),
            on_adam=lambda s: s._replace(count=count, mu=mu, nu=nu),
            on_schedule=lambda s: s._replace(count=count),
            on_multistep=lambda s: s)
        from fast_neural_style_transfer_tpu.train.state import TrainState

        return TrainState(params=p_t, opt_state=opt_state,
                          step=jnp.asarray(t, jnp.int32))

    rows = []
    max_rel = 0.0
    max_update_diff = 0.0
    for t, b_np in enumerate(batches):
        if mode == "synced":
            state = synced_state(t)
            synced_pre = state.params
        trow = torch_step(nchw(b_np))
        jrng, srng = jax.random.split(jrng)
        state, metrics = step_fn(state, vgg_params, jnp.asarray(b_np),
                                 style_grams, srng)
        jrow = {"total": float(metrics["loss"]),
                "content": float(metrics["content_loss"]),
                "style": float(metrics["style_loss"]),
                "tv": float(metrics["tv_loss"])}
        rel = abs(jrow["total"] - trow["total"]) / max(abs(trow["total"]), 1e-9)
        max_rel = max(max_rel, rel)
        row = {"step": t, "torch": trow, "jax": jrow, "rel_diff_total": rel}
        if mode == "synced":
            # post-update parameter parity from the same pre-step state.
            # NOTE max-abs is sign-sensitive on Adam's first steps: with
            # near-zero moments every element's update is ~±lr, so elements
            # whose gradient is at f32-noise level flip sign across
            # frameworks and contribute 2*lr each — the L2-relative diff is
            # the faithful metric (flips are a vanishing fraction).
            import optax

            after_t = torch_params_to_pytree()
            pre = synced_pre  # captured before the steps ran
            ud = max(jax.tree.leaves(jax.tree.map(
                lambda a, b: float(jnp.max(jnp.abs(a - b))),
                after_t, state.params)))
            upd_torch = jax.tree.map(lambda a, b: a - b, after_t, pre)
            upd_diff = jax.tree.map(lambda a, b: a - b, after_t, state.params)
            rel_l2 = float(optax.global_norm(upd_diff)) / max(
                float(optax.global_norm(upd_torch)), 1e-12)
            row["update_max_abs_diff"] = ud
            row["update_rel_l2"] = rel_l2
            max_update_diff = max(max_update_diff, rel_l2)
        rows.append(row)

    # final params: torch net back to our pytree layout, elementwise diff
    back = from_torch_state_dict(
        {k: v.detach() for k, v in net.state_dict().items()})
    diffs = jax.tree.map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), back, state.params)
    scales = jax.tree.map(
        lambda a: float(jnp.max(jnp.abs(a))), state.params)
    pdiff = max(jax.tree.leaves(diffs))
    pscale = max(max(jax.tree.leaves(scales)), 1e-9)
    return {"steps": rows, "max_rel_diff": max_rel,
            "max_update_diff": max_update_diff if mode == "synced" else None,
            "final_param_max_abs_diff": pdiff,
            "final_param_max_abs": pscale,
            "config": {"steps": steps, "batch": batch, "size": size,
                       "total_steps": total_steps, "lr": lr, "seed": seed,
                       "weights": [cw, sw, tw], "dropout": False, "mode": mode,
                       "content_tap": "relu4_3 (reference executable)"}}


def main():
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--total_steps", type=int, default=200)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", default="evidence/lockstep_r4/losses.jsonl")
    ap.add_argument("--mode", choices=("free", "synced"), default="free")
    ap.add_argument(
        "--tpu", action="store_true",
        help="run the jax side on the real chip instead of CPU. On TPU the "
        "f32 path multiplies on the MXU at XLA's default precision, so "
        "expect ~1e-2-level loss deltas (not an apples-to-apples f32 "
        "comparison; the CPU run is the parity statement)")
    args = ap.parse_args()

    if not args.tpu:
        # the axon sitecustomize force-sets JAX_PLATFORMS=axon; the env var
        # alone does not stick, but the config update does (tests/conftest.py)
        import jax

        jax.config.update("jax_platforms", "cpu")

    res = run_lockstep(steps=args.steps, batch=args.batch, size=args.size,
                       total_steps=args.total_steps, seed=args.seed,
                       mode=args.mode)
    os.makedirs(os.path.dirname(args.out), exist_ok=True)
    with open(args.out, "w") as f:
        for row in res["steps"]:
            f.write(json.dumps(row) + "\n")
    summary = {k: v for k, v in res.items() if k != "steps"}
    report = os.path.splitext(args.out)[0] + "_report.json"
    with open(report, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
