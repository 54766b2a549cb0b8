"""SSL meta-arch (training/ssl_meta_arch.py): masked static-shape variants
vs the reference's dynamic-gather forms, and the full pretraining step
(single-device and pjit-sharded on the virtual mesh)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from omgsr_tpu.losses.ssl import gram_loss, masked_gram_loss, sinkhorn_knopp
from omgsr_tpu.models.configs import DinoV3ViTConfig
from omgsr_tpu.models.dinov3_vit import init_dinov3_vit
from omgsr_tpu.training.ssl import make_ssl_optimizer, ssl_param_groups
from omgsr_tpu.training.ssl_meta_arch import (
    SSLMetaConfig,
    init_center_state,
    init_ssl_student,
    make_ssl_train_step,
    resize_gram_teacher_patches,
    ssl_losses,
)

REF_ROOT = "/root/reference/dinov3_gan/facebookresearch_dinov3_main"


@pytest.fixture(scope="module")
def ref_ibot():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    orig_compile = torch.nn.Module.compile
    torch.nn.Module.compile = lambda self, *a, **k: self
    if not torch.distributed.is_initialized():
        torch.distributed.init_process_group(
            "gloo", rank=0, world_size=1, init_method="tcp://127.0.0.1:29782"
        )
    try:
        from dinov3.loss.ibot_patch_loss import iBOTPatchLoss
    finally:
        torch.nn.Module.compile = orig_compile
    return iBOTPatchLoss


# ---------------------------------------------------------------------------
# static-shape masked variants == reference dynamic gathers
# ---------------------------------------------------------------------------


def test_masked_sinkhorn_matches_reference_gather(ref_ibot):
    """Zero-mass exclusion == the reference's index_select + global-count
    sinkhorn (ibot_patch_loss.py:30-60) on the gathered subset."""
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((24, 16)).astype(np.float32)
    mask = rng.uniform(size=24) < 0.4
    m = int(mask.sum())
    loss_mod = ref_ibot(patch_out_dim=16)
    with torch.no_grad():
        want = loss_mod.sinkhorn_knopp_teacher(
            torch.from_numpy(logits[mask]),
            teacher_temp=0.07,
            n_masked_patches_tensor=torch.tensor(m),
        ).numpy()
    got = np.asarray(
        sinkhorn_knopp(jnp.asarray(logits), 0.07, sample_mask=jnp.asarray(mask))
    )
    np.testing.assert_allclose(got[mask], want, rtol=2e-5, atol=1e-6)
    np.testing.assert_array_equal(got[~mask], 0.0)


@pytest.mark.parametrize("remove_neg", [False, True])
def test_masked_gram_matches_subset(remove_neg):
    rng = np.random.default_rng(1)
    s = rng.standard_normal((3, 10, 8)).astype(np.float32)
    t = rng.standard_normal((3, 10, 8)).astype(np.float32)
    mask = rng.uniform(size=(3, 10)) < 0.5
    got = masked_gram_loss(
        jnp.asarray(s), jnp.asarray(t), jnp.asarray(mask), remove_neg=remove_neg
    )
    # reference semantics: boolean-gather to (n_sel, D), then batch-level gram
    want = gram_loss(
        jnp.asarray(s[mask]),
        jnp.asarray(t[mask]),
        img_level=False,
        remove_neg=remove_neg,
    )
    np.testing.assert_allclose(float(got), float(want), rtol=1e-5)


def test_resize_gram_teacher_patches_shape_and_identity():
    rng = np.random.default_rng(2)
    p = rng.standard_normal((2, 16, 6)).astype(np.float32)
    out = resize_gram_teacher_patches(jnp.asarray(p), (4, 4), (2, 2))
    assert out.shape == (2, 4, 6)
    same = resize_gram_teacher_patches(jnp.asarray(p), (4, 4), (4, 4))
    np.testing.assert_allclose(np.asarray(same), p, atol=1e-6)


# ---------------------------------------------------------------------------
# full step
# ---------------------------------------------------------------------------

VIT = DinoV3ViTConfig(patch_size=4, embed_dim=16, depth=2, num_heads=2, n_storage_tokens=1)
META = SSLMetaConfig(
    n_global_crops=2,
    n_local_crops=4,
    dino_out_dim=32,
    dino_hidden_dim=24,
    dino_bottleneck_dim=8,
    ibot_out_dim=32,
    ibot_hidden_dim=24,
    ibot_bottleneck_dim=8,
)


def _fake_batch(b=4, gs=16, ls=8, seed=0):
    rng = np.random.default_rng(seed)
    n = (gs // VIT.patch_size) ** 2
    masks = np.zeros((2 * b, n), bool)
    for i in range(b):  # half the rows masked, ~40%
        idx = rng.choice(n, max(1, int(n * 0.4)), replace=False)
        masks[i, idx] = True
    return {
        "global_crops": rng.standard_normal((2 * b, gs, gs, 3)).astype(np.float32),
        "local_crops": rng.standard_normal((4 * b, ls, ls, 3)).astype(np.float32),
        "masks": masks,
    }


def _init(seed=0, cfg=META):
    student = init_ssl_student(jax.random.key(seed), VIT, cfg, init_dinov3_vit)
    teacher = jax.tree.map(jnp.copy, student)
    lr_t, wd_t = ssl_param_groups(student, lr_decay_rate=0.9, num_layers=VIT.depth)
    tx = make_ssl_optimizer(lr_t, wd_t)
    return student, teacher, tx, tx.init(student)


@pytest.mark.parametrize("centering", ["sinkhorn_knopp", "softmax"])
def test_train_step_moves_and_is_finite(centering):
    cfg = (
        META
        if centering == "sinkhorn_knopp"
        else __import__("dataclasses").replace(META, centering="softmax")
    )
    student, teacher, tx, opt_state = _init(cfg=cfg)
    centers = init_center_state(cfg)
    step = jax.jit(
        make_ssl_train_step(tx, cfg=cfg, vit_cfg=VIT),
        static_argnames=(),
    )
    batch = {k: jnp.asarray(v) for k, v in _fake_batch().items()}
    s0 = student
    for it in range(2):
        student, teacher, opt_state, centers, metrics = step(
            student, teacher, opt_state, centers, batch,
            lr=1e-3, wd=0.04, teacher_temp=0.07, momentum=0.99,
        )
    for k in ("dino_local_crops_loss", "dino_global_crops_loss", "koleo_loss", "ibot_loss", "total_loss"):
        assert np.isfinite(float(metrics[k])), k
    # every student component trained: backbone, dino head, ibot head
    for path in (
        ("backbone", "blocks", "0", "attn", "qkv", "kernel"),
        ("dino_head", "mlp", "0", "kernel"),
        ("ibot_head", "last_layer", "kernel"),
    ):
        a, b_ = student, s0
        for p in path:
            a, b_ = a[p], b_[p]
        assert not np.allclose(np.asarray(a), np.asarray(b_)), path
    # teacher EMA moved off the student's start but isn't the student
    t_kernel = np.asarray(teacher["dino_head"]["mlp"]["0"]["kernel"])
    assert not np.allclose(t_kernel, np.asarray(s0["dino_head"]["mlp"]["0"]["kernel"]))
    assert not np.allclose(t_kernel, np.asarray(student["dino_head"]["mlp"]["0"]["kernel"]))
    if centering == "softmax":
        assert not np.allclose(np.asarray(centers["dino"]), 0.0)
    else:
        np.testing.assert_array_equal(np.asarray(centers["dino"]), 0.0)


@pytest.mark.parametrize("tokens_used", ["all", "masked"])
def test_gram_anchoring_contributes(tokens_used):
    import dataclasses

    cfg = dataclasses.replace(
        META, gram_loss_weight=1.0, gram_tokens_used=tokens_used
    )
    student, teacher, tx, opt_state = _init(cfg=cfg)
    centers = init_center_state(cfg)
    batch = {k: jnp.asarray(v) for k, v in _fake_batch().items()}
    total, aux = ssl_losses(
        student, teacher, batch, centers, cfg=cfg, vit_cfg=VIT, teacher_temp=0.07
    )
    m = aux["metrics"]
    assert "gram_loss" in m and np.isfinite(float(m["gram_loss"]))
    # nonzero even with identical init weights: the student's global
    # forward swaps masked patches for the mask token, the teacher's
    # doesn't, so their patch Grams differ on masked rows
    assert float(m["gram_loss"]) > 0.0
    # and the anchor contributes with the configured weight
    cfg0 = dataclasses.replace(cfg, gram_loss_weight=0.0)
    total0, _ = ssl_losses(
        student, teacher, batch, centers, cfg=cfg0, vit_cfg=VIT, teacher_temp=0.07
    )
    np.testing.assert_allclose(
        float(total), float(total0) + float(m["gram_loss"]), rtol=1e-5
    )


def test_sharded_step_matches_single_device():
    """pjit over {data: 8} == single device: the batch-stat collectives
    (sinkhorn normalizers, loss means) are inserted by XLA from the
    shardings."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omgsr_tpu.parallel import create_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs the virtual multi-device mesh")
    mesh8 = create_mesh({"data": 8})

    student, teacher, tx, opt_state = _init()
    centers = init_center_state(META)
    step = make_ssl_train_step(tx, cfg=META, vit_cfg=VIT)
    batch_np = _fake_batch(b=8)
    kwargs = dict(lr=1e-3, wd=0.04, teacher_temp=0.07, momentum=0.99)

    single = jax.jit(step)(
        student, teacher, opt_state, centers,
        {k: jnp.asarray(v) for k, v in batch_np.items()}, **kwargs
    )

    shard = NamedSharding(mesh8, P("data"))
    batch_sh = {k: jax.device_put(jnp.asarray(v), shard) for k, v in batch_np.items()}
    repl = NamedSharding(mesh8, P())
    put = lambda tree: jax.device_put(tree, repl)
    sharded = jax.jit(step)(
        put(student), put(teacher), put(opt_state), put(centers), batch_sh, **kwargs
    )

    for a, b in zip(jax.tree.leaves(single[4]), jax.tree.leaves(sharded[4])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5)
    # spot-check a trained weight
    np.testing.assert_allclose(
        np.asarray(single[0]["dino_head"]["mlp"]["0"]["kernel"]),
        np.asarray(sharded[0]["dino_head"]["mlp"]["0"]["kernel"]),
        rtol=2e-4, atol=2e-5,
    )
