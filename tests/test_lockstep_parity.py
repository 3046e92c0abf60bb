"""Lockstep training-dynamics parity vs the reference's executable trainer.

VERDICT r3 task #3: the strongest training-quality statement available with
zero pretrained VGG weights. tools/lockstep_parity.py runs the reference's
own model + losses + Adam/cosine/clip recipe (/root/reference/train.py:
135-145,162-206) against this repo's jitted train step on identical state
and batches; see that module's docstring for the full semantics (dropout is
the one disabled op; content tap is the reference's executable relu4_3).

Two statements, two tests:
- synced mode (chaos-free): at EVERY step along the reference's own
  trajectory, our step computes the same loss (~1e-7 rel measured) and the
  same parameter update (L2-relative ~1e-4 once Adam moments build; Adam's
  first steps are sign-sensitive where gradients sit at f32 noise).
- free mode: both trainers free-run; early steps match tightly, then f32
  noise amplifies chaotically under the reference's clip-to-1.0 recipe
  (measured ~2-3x/step) — documented, not asserted tightly.

Requires torch (in the image); runs on CPU via conftest.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from tools.lockstep_parity import run_lockstep  # noqa: E402

pytestmark = pytest.mark.slow  # ~2 min of CPU convs


@pytest.fixture(scope="module")
def synced():
    return run_lockstep(steps=10, mode="synced")


def test_synced_per_step_loss_parity(synced):
    """From the same state, every step's total loss matches the reference's
    executable math to f32 tolerance (measured ~1e-7 rel)."""
    for row in synced["steps"]:
        assert row["rel_diff_total"] < 1e-5, row


def test_synced_update_parity(synced):
    """One optimizer step from the same state produces the same new params:
    clip-by-global-norm -> L2-into-grad weight decay -> Adam(bias-corrected)
    -> cosine LR, all at the right schedule position. Step 0 is excluded
    from the tight bound: with zero moments Adam's elementwise update is
    +-lr, so f32-noise gradients flip signs across frameworks (measured
    ~4e-2 L2-rel at t=0, ~1e-4 after)."""
    rels = [row["update_rel_l2"] for row in synced["steps"]]
    assert rels[0] < 0.1
    assert max(rels[1:]) < 2e-2
    assert float(np.median(rels[1:])) < 2e-3


def test_free_run_matches_until_chaos(synced):
    """Free-running trainers agree tightly for the first steps (before f32
    noise is amplified by the clipped-gradient dynamics)."""
    res = run_lockstep(steps=6, mode="free")
    rels = [row["rel_diff_total"] for row in res["steps"]]
    assert rels[0] < 1e-6  # identical state, identical math
    # measured amplification ~5-7x/step under clip-to-1.0 (r4: 9e-8, 2e-4,
    # 1.4e-3, 3e-3, 2e-2, 1.2e-2): tight for the first steps, order-of-
    # magnitude beyond — the synced test is the real parity statement
    assert max(rels[:4]) < 8e-3
    assert max(rels) < 0.1
