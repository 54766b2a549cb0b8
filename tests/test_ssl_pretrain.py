"""Parity for the SSL pretraining building blocks (training/ssl.py) vs the
ACTUAL vendored DINOv3 implementations (dinov3/layers/dino_head.py,
dinov3/train/{cosine_lr_scheduler,param_groups}.py)."""

import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from omgsr_tpu.models.configs import DinoV3ViTConfig
from omgsr_tpu.models.dinov3_vit import init_dinov3_vit
from omgsr_tpu.training.ssl import (
    TabulatedSchedule,
    cosine_schedule,
    dino_head_apply,
    ema_update,
    init_dino_head,
    linear_warmup_cosine_decay,
    make_ssl_optimizer,
    ssl_param_groups,
    vit_lr_decay_rate,
)

REF_ROOT = "/root/reference/dinov3_gan/facebookresearch_dinov3_main"


def _load_ref_module(relpath, name):
    # dinov3.train's __init__ imports omegaconf (not in this image); load the
    # leaf modules directly by file path — they only need numpy/torch.
    import importlib.util

    spec = importlib.util.spec_from_file_location(name, f"{REF_ROOT}/{relpath}")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def ref():
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)
    DINOHead = _load_ref_module("dinov3/layers/dino_head.py", "ref_dino_head").DINOHead
    sched = _load_ref_module("dinov3/train/cosine_lr_scheduler.py", "ref_cosine")
    pg = _load_ref_module("dinov3/train/param_groups.py", "ref_param_groups")
    return DINOHead, sched.CosineScheduler, sched.linear_warmup_cosine_decay, pg.get_vit_lr_decay_rate


def _copy_head_to_torch(params, torch_head):
    sd = {}
    mlp = params["mlp"]
    if "kernel" in mlp:
        sd["mlp.weight"] = torch.tensor(np.asarray(mlp["kernel"]).T)
        if "bias" in mlp:
            sd["mlp.bias"] = torch.tensor(np.asarray(mlp["bias"]))
    else:
        for idx, leaf in mlp.items():
            sd[f"mlp.{idx}.weight"] = torch.tensor(np.asarray(leaf["kernel"]).T)
            if "bias" in leaf:
                sd[f"mlp.{idx}.bias"] = torch.tensor(np.asarray(leaf["bias"]))
    sd["last_layer.weight"] = torch.tensor(np.asarray(params["last_layer"]["kernel"]).T)
    torch_head.load_state_dict(sd)


@pytest.mark.parametrize("nlayers", [1, 2, 3])
def test_dino_head_matches_torch(ref, nlayers):
    DINOHead = ref[0]
    in_dim, out_dim, hidden, bottleneck = 24, 48, 32, 16
    params = init_dino_head(
        jax.random.key(0), in_dim, out_dim, hidden, bottleneck, nlayers=nlayers
    )
    th = DINOHead(in_dim, out_dim, nlayers=nlayers, hidden_dim=hidden, bottleneck_dim=bottleneck)
    _copy_head_to_torch(params, th)
    th.eval()
    x = np.random.default_rng(nlayers).normal(size=(5, in_dim)).astype(np.float32)
    ours = np.asarray(dino_head_apply(params, jnp.asarray(x)))
    with torch.no_grad():
        theirs = th(torch.tensor(x)).numpy()
    np.testing.assert_allclose(ours, theirs, rtol=2e-5, atol=2e-6)
    # partial-application modes (:43-50)
    ours_pre = np.asarray(dino_head_apply(params, jnp.asarray(x), no_last_layer=True))
    with torch.no_grad():
        theirs_pre = th(torch.tensor(x), no_last_layer=True).numpy()
    np.testing.assert_allclose(ours_pre, theirs_pre, rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("trunc_extra", [0.0, 0.25])
def test_cosine_schedule_matches_reference(ref, trunc_extra):
    CosineScheduler = ref[1]
    kw = dict(
        base_value=2.0,
        final_value=0.1,
        total_iters=50,
        warmup_iters=7,
        start_warmup_value=0.01,
        freeze_iters=3,
        trunc_extra=trunc_extra,
    )
    theirs = CosineScheduler(**kw)
    ours = TabulatedSchedule(cosine_schedule(**kw), final_value=0.1)
    np.testing.assert_allclose(ours.table, theirs.schedule, rtol=1e-12)
    for it in (0, 3, 9, 49, 50, 1000):  # incl. past-the-end clamp (:47-51)
        assert ours[it] == theirs[it]


def test_linear_warmup_cosine_decay_matches_reference(ref):
    ref_lwcd = ref[2]
    kw = dict(start=0.0, peak=1e-3, end=1e-5, warmup_iterations=5, total_iterations=40, cosine_iterations=30)
    np.testing.assert_allclose(linear_warmup_cosine_decay(**kw), ref_lwcd(**kw), rtol=1e-12)


def test_vit_lr_decay_rate_matches_reference(ref):
    get_ref = ref[3]
    names = [
        "cls_token",
        "storage_tokens",
        "mask_token",
        "patch_embed.proj.weight",
        "blocks.0.attn.qkv.weight",
        "blocks.3.mlp.fc1.bias",
        "blocks.11.ls2.gamma",
        "norm.weight",
    ]
    for name in names:
        ours = vit_lr_decay_rate(name, 0.9, 12)
        theirs = get_ref(name, 0.9, num_layers=12, force_is_backbone=True)
        assert ours == pytest.approx(theirs), name


def test_ssl_param_groups_semantics():
    cfg = DinoV3ViTConfig(patch_size=4, embed_dim=16, depth=3, num_heads=2, n_storage_tokens=2)
    backbone = init_dinov3_vit(jax.random.key(0), cfg)
    head = init_dino_head(jax.random.key(1), 16, 32, 24, 8)
    params = {"backbone": backbone, "dino_head": head}
    lr_t, wd_t = ssl_param_groups(params, lr_decay_rate=0.9, num_layers=cfg.depth, dino_head_wd_multiplier=0.5)
    bb_lr, bb_wd = lr_t["backbone"], wd_t["backbone"]
    # layer-0 group: tokens + patch embed at rate**(depth+1)
    assert bb_lr["cls_token"] == pytest.approx(0.9**4)
    assert bb_lr["patch_embed"]["proj"]["kernel"] == pytest.approx(0.9**4)
    # block i at rate**(depth - i)
    assert bb_lr["blocks"]["0"]["attn"]["qkv"]["kernel"] == pytest.approx(0.9**3)
    assert bb_lr["blocks"]["2"]["mlp"]["fc2"]["kernel"] == pytest.approx(0.9**1)
    # final norm / heads at 1.0
    assert bb_lr["norm"]["scale"] == 1.0
    assert lr_t["dino_head"]["mlp"]["0"]["kernel"] == 1.0
    # frozen rope buffer
    assert bb_lr["rope_embed"]["periods"] == 0.0
    # wd: zero on biases, norms, gammas; head multiplier elsewhere in the head
    assert bb_wd["blocks"]["1"]["attn"]["qkv"]["bias"] == 0.0
    assert bb_wd["blocks"]["1"]["norm1"]["scale"] == 0.0
    assert bb_wd["blocks"]["1"]["ls1"]["gamma"] == 0.0
    assert bb_wd["blocks"]["1"]["attn"]["qkv"]["kernel"] == 1.0
    assert wd_t["dino_head"]["mlp"]["0"]["kernel"] == 0.5
    assert wd_t["dino_head"]["mlp"]["0"]["bias"] == 0.0
    # tokens keep weight decay — the reference CODE's condition, not its comment
    assert bb_wd["cls_token"] == 1.0


def test_ssl_optimizer_step_and_ema():
    cfg = DinoV3ViTConfig(patch_size=4, embed_dim=16, depth=2, num_heads=2, n_storage_tokens=1)
    params = {"backbone": init_dinov3_vit(jax.random.key(0), cfg)}
    lr_t, wd_t = ssl_param_groups(params, lr_decay_rate=0.9, num_layers=cfg.depth)
    tx = make_ssl_optimizer(lr_t, wd_t)
    state = tx.init(params)
    state.hyperparams["learning_rate"] = jnp.asarray(1e-2)
    state.hyperparams["weight_decay"] = jnp.asarray(0.04)
    grads = jax.tree.map(jnp.ones_like, params)
    updates, state = tx.update(grads, state, params)
    new = jax.tree.map(lambda p, u: p + u, params, updates)
    # rope periods frozen (lr mult 0 and wd mult 0)
    np.testing.assert_array_equal(
        np.asarray(new["backbone"]["rope_embed"]["periods"]),
        np.asarray(params["backbone"]["rope_embed"]["periods"]),
    )
    # everything else moved and stayed finite
    moved = np.asarray(new["backbone"]["blocks"]["0"]["attn"]["qkv"]["kernel"])
    assert np.isfinite(moved).all()
    assert not np.allclose(moved, np.asarray(params["backbone"]["blocks"]["0"]["attn"]["qkv"]["kernel"]))

    teacher = jax.tree.map(jnp.zeros_like, params)
    t2 = ema_update(teacher, params, 0.75)
    np.testing.assert_allclose(
        np.asarray(t2["backbone"]["cls_token"]),
        0.25 * np.asarray(params["backbone"]["cls_token"]),
        rtol=1e-6,
    )
