"""SSL-loss parity vs the ACTUAL vendored DINOv3 implementations.

The torch originals (dinov3/loss/*.py) run in-process on CPU; the iBOT
Sinkhorn-Knopp path all-reduces unconditionally, so a 1-process gloo group
is initialized for the module. losses.ssl must match them exactly at world
size 1 (the distributed variants differ only by psum placement, covered by
test_mesh_sinkhorn_matches_single_device on the virtual mesh).
"""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from omgsr_tpu.losses.ssl import (
    dino_loss,
    dino_softmax_center_teacher,
    dino_update_center,
    gram_loss,
    ibot_patch_loss,
    ibot_softmax_center_teacher,
    ibot_update_center,
    koleo_loss,
    sinkhorn_knopp,
)

REF_ROOT = "/root/reference/dinov3_gan/facebookresearch_dinov3_main"


@pytest.fixture(scope="module")
def ref_losses():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    # iBOTPatchLoss.__init__ compiles its Sinkhorn module; keep it eager
    orig_compile = torch.nn.Module.compile
    torch.nn.Module.compile = lambda self, *a, **k: self
    # the iBOT Sinkhorn all-reduces unconditionally
    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            "gloo", rank=0, world_size=1, init_method="tcp://127.0.0.1:29781"
        )
    try:
        from dinov3.loss.dino_clstoken_loss import DINOLoss
        from dinov3.loss.gram_loss import GramLoss
        from dinov3.loss.ibot_patch_loss import iBOTPatchLoss
        from dinov3.loss.koleo_loss import KoLeoLoss
    finally:
        torch.nn.Module.compile = orig_compile
    return DINOLoss, iBOTPatchLoss, KoLeoLoss, GramLoss


def _rand(*shape, seed=0):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def _close(jx, tx, tol=1e-5):
    np.testing.assert_allclose(np.asarray(jx), tx.detach().numpy(), rtol=tol, atol=tol)


def test_dino_loss_matches(ref_losses):
    DINOLoss, *_ = ref_losses
    ref = DINOLoss(out_dim=16)
    ref.init_weights()
    s = _rand(3, 4, 16, seed=1)  # (student crops, B, K)
    t_logits = _rand(2, 4, 16, seed=2)
    with torch.no_grad():
        t_probs = torch.softmax(torch.from_numpy(t_logits) / 0.07, dim=-1)
    for diag in (False, True):
        want = ref.forward(
            torch.from_numpy(s), t_probs, ignore_diagonal=diag
        )
        got = dino_loss(
            jnp.asarray(s), jnp.asarray(t_probs.numpy()), ignore_diagonal=diag
        )
        _close(got, want)


def test_dino_centering_matches(ref_losses):
    DINOLoss, *_ = ref_losses
    ref = DINOLoss(out_dim=16, center_momentum=0.9)
    ref.init_weights()
    t = _rand(8, 16, seed=3)
    with torch.no_grad():
        ref.update_center(torch.from_numpy(t))
        want_probs = ref.softmax_center_teacher(torch.from_numpy(t), teacher_temp=0.04)
    center = dino_update_center(jnp.zeros((1, 16)), jnp.asarray(t), momentum=0.9)
    _close(center, ref.center)
    got = dino_softmax_center_teacher(jnp.asarray(t), center, 0.04)
    _close(got, want_probs)


def test_dino_sinkhorn_matches(ref_losses):
    DINOLoss, *_ = ref_losses
    ref = DINOLoss(out_dim=16)
    t = _rand(8, 16, seed=4)
    with torch.no_grad():
        want = ref.sinkhorn_knopp_teacher(torch.from_numpy(t), teacher_temp=0.04)
    got = sinkhorn_knopp(jnp.asarray(t), 0.04)
    _close(got, want)
    # each sample's assignment sums to 1
    np.testing.assert_allclose(np.asarray(got).sum(-1), 1.0, rtol=1e-4)


def test_ibot_loss_and_centering_match(ref_losses):
    _, iBOTPatchLoss, *_ = ref_losses
    ref = iBOTPatchLoss(patch_out_dim=16)
    ref.init_weights()
    s = _rand(2, 10, 16, seed=5)
    t_logits = _rand(2, 10, 16, seed=6)
    masks = np.random.default_rng(7).random((2, 10)) < 0.4
    with torch.no_grad():
        ref.update_center(torch.from_numpy(t_logits))
        t_probs = ref.softmax_center_teacher(torch.from_numpy(t_logits), 0.04)
        want = ref.forward(
            torch.from_numpy(s), t_probs, torch.from_numpy(masks)
        )
    center = ibot_update_center(jnp.zeros((1, 1, 16)), jnp.asarray(t_logits))
    _close(center, ref.center)
    probs = ibot_softmax_center_teacher(jnp.asarray(t_logits), center, 0.04)
    _close(probs, t_probs)
    got = ibot_patch_loss(jnp.asarray(s), probs, jnp.asarray(masks))
    _close(got, want)


def test_ibot_sinkhorn_matches(ref_losses):
    _, iBOTPatchLoss, *_ = ref_losses
    ref = iBOTPatchLoss(patch_out_dim=16)
    t = _rand(12, 16, seed=8)  # (n_masked_patches, K)
    n = torch.tensor(12.0)
    with torch.no_grad():
        want = ref.sinkhorn_knopp_teacher(
            torch.from_numpy(t), teacher_temp=0.04, n_masked_patches_tensor=n.clone()
        )
    got = sinkhorn_knopp(jnp.asarray(t), 0.04, total_samples=12.0)
    _close(got, want)


def test_koleo_matches(ref_losses):
    *_, KoLeoLoss, _ = ref_losses
    ref = KoLeoLoss()
    x = _rand(16, 8, seed=9)
    with torch.no_grad():
        want = ref.forward(torch.from_numpy(x))
    got = koleo_loss(jnp.asarray(x))
    _close(got, want)


@pytest.mark.parametrize(
    "kwargs",
    [
        dict(),
        dict(img_level=False),
        dict(apply_norm=False),
        dict(remove_neg=False, remove_only_teacher_neg=True),
    ],
    ids=["default", "batch-level", "no-norm", "teacher-neg-only"],
)
def test_gram_matches(ref_losses, kwargs):
    *_, GramLoss = ref_losses
    img_level = kwargs.pop("img_level", True)
    ctor = {k: v for k, v in kwargs.items() if k != "img_level"}
    ref = GramLoss(**ctor)
    s = _rand(2, 6, 8, seed=10)
    t = _rand(2, 6, 8, seed=11)
    with torch.no_grad():
        want = ref.forward(
            torch.from_numpy(s), torch.from_numpy(t), img_level=img_level
        )
    got = gram_loss(jnp.asarray(s), jnp.asarray(t), img_level=img_level, **ctor)
    _close(got, want)


def test_mesh_sinkhorn_matches_single_device():
    """Batch-sharded sinkhorn (psum over 'data') == single-device on the
    concatenated batch — the TPU replacement for the torch all_reduce path."""
    from jax import shard_map
    from jax.sharding import Mesh, PartitionSpec as P

    devs = jax.devices()
    if len(devs) < 4:
        pytest.skip("needs the virtual multi-device mesh")
    mesh = Mesh(np.array(devs[:4]), ("data",))
    t = jnp.asarray(_rand(16, 8, seed=12))

    sharded = shard_map(
        lambda x: sinkhorn_knopp(x, 0.04, axis_name="data"),
        mesh=mesh,
        in_specs=P("data"),
        out_specs=P("data"),
    )(t)
    single = sinkhorn_knopp(t, 0.04)
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(single), rtol=1e-5, atol=1e-5)

    c_sharded = shard_map(
        lambda x: dino_update_center(jnp.zeros((1, 8)), x, axis_name="data"),
        mesh=mesh,
        in_specs=P("data"),
        out_specs=P(None),
    )(t)
    c_single = dino_update_center(jnp.zeros((1, 8)), t)
    np.testing.assert_allclose(np.asarray(c_sharded), np.asarray(c_single), rtol=1e-5, atol=1e-5)
