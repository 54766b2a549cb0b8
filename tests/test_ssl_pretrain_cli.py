"""SSL pretraining CLI (cli/pretrain_dinov3.py) — schedules vs the
reference's build_schedulers wiring, the last-layer lr freeze group, and
the end-to-end tiny pretraining loop with checkpoint/resume."""

import dataclasses
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omgsr_tpu.cli.pretrain_dinov3 import (
    SSLPretrainConfig,
    build_ssl_schedulers,
    load_ssl_config,
    run_pretraining,
)
from omgsr_tpu.training.ssl import (
    last_layer_mask,
    make_ssl_optimizer,
    ssl_param_groups,
)


def _tiny_cfg(tmp_path, **kw):
    base = dict(
        output_dir=str(tmp_path / "out"),
        dataset_paths=str(tmp_path / "imgs"),
        batch_size_per_device=1,
        official_epoch_length=2,
        epochs=2,
        warmup_epochs=1,
        warmup_teacher_temp_epochs=1,
        freeze_last_layer_epochs=1,
        saveckp_freq=3,
        print_freq=1,
        arch="custom",
        global_crops_size=32,
        local_crops_size=16,
        local_crops_number=4,
        dino_out_dim=64,
        dino_hidden_dim=32,
        dino_bottleneck_dim=16,
        dino_nlayers=2,
        ibot_out_dim=64,
        ibot_hidden_dim=32,
        ibot_bottleneck_dim=16,
        ibot_nlayers=2,
        extra={"vit": {"embed_dim": 32, "depth": 2, "num_heads": 2, "patch_size": 8}},
    )
    base.update(kw)
    return SSLPretrainConfig(**base)


def _write_images(tmp_path, n=6):
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (64, 80, 3), dtype=np.uint8), "RGB"
        ).save(d / f"{i}.png")


def test_schedulers_match_reference_wiring():
    """build_schedulers (train/train.py:102-152): warmup lengths, freeze
    zeroing, clamp-past-end, and the sqrt_wrt_1024 lr scaling rule
    (configs/config.py:50-55)."""
    cfg = SSLPretrainConfig(
        official_epoch_length=10,
        epochs=4,
        warmup_epochs=1,
        lr=0.004,
        min_lr=1e-6,
        freeze_last_layer_epochs=2,
        warmup_teacher_temp_epochs=2,
        warmup_teacher_temp=0.04,
        teacher_temp=0.07,
        momentum_teacher=0.992,
        final_momentum_teacher=1.0,
    )
    sched = build_ssl_schedulers(cfg, global_batch_size=256)
    s = 4 * np.sqrt(256 / 1024.0)  # = 2.0
    assert sched["lr"][0] == 0.0  # linear warmup from 0
    np.testing.assert_allclose(sched["lr"][10], 0.004 * s, rtol=1e-6)  # warmup peak
    np.testing.assert_allclose(sched["lr"][10_000], 1e-6 * s, rtol=1e-6)  # clamp
    # last-layer lr: zero through the freeze epochs, then == lr
    assert all(sched["last_layer_lr"][i] == 0.0 for i in range(20))
    assert sched["last_layer_lr"][20] == sched["lr"][20] != 0.0
    # teacher temp: linear warmup to teacher_temp, constant after
    np.testing.assert_allclose(sched["teacher_temp"][0], 0.04)
    np.testing.assert_allclose(sched["teacher_temp"][19], 0.07, rtol=1e-6)
    np.testing.assert_allclose(sched["teacher_temp"][35], 0.07)
    # momentum cosine 0.992 -> 1.0
    np.testing.assert_allclose(sched["momentum"][0], 0.992)
    np.testing.assert_allclose(sched["momentum"][39], 1.0, atol=1e-4)
    # no scaling rule
    cfg2 = dataclasses.replace(cfg, scaling_rule="none")
    np.testing.assert_allclose(
        build_ssl_schedulers(cfg2, 256)["lr"][10], 0.004, rtol=1e-6
    )
    # gram loss-weight schedule (ssl_meta_arch.py:186-201 wiring)
    assert sched["gram_weight"] is None
    cfg3 = dataclasses.replace(
        cfg,
        gram_loss_weight_schedule={"start": 0.0, "peak": 2.0, "end": 1.0, "warmup_epochs": 1},
    )
    g = build_ssl_schedulers(cfg3, 256)["gram_weight"]
    np.testing.assert_allclose(g[0], 0.0)
    np.testing.assert_allclose(g[10], 2.0, rtol=1e-6)
    np.testing.assert_allclose(g[39], 1.0, atol=2e-2)
    np.testing.assert_allclose(g[100], 1.0)


def test_last_layer_freeze_group():
    """With last_layer_lr=0 the prototype layers stay put while everything
    else moves; with last_layer_lr == lr the split optimizer matches the
    plain one exactly."""
    key = jax.random.key(0)
    params = {
        "backbone": {"kernel": jax.random.normal(key, (4, 4))},
        "dino_head": {
            "mlp": {"0": {"kernel": jnp.ones((4, 4)), "bias": jnp.zeros((4,))}},
            "last_layer": {"kernel": jnp.ones((4, 8))},
        },
    }
    grads = jax.tree.map(jnp.ones_like, params)
    lr_t, wd_t = ssl_param_groups(params, num_layers=2)
    mask = last_layer_mask(params)
    assert mask["dino_head"]["last_layer"]["kernel"] is True
    assert mask["backbone"]["kernel"] is False

    tx = make_ssl_optimizer(lr_t, wd_t, last_layer_mask_tree=mask)
    st = tx.init(params)
    st.hyperparams["learning_rate"] = jnp.asarray(1e-2)
    st.hyperparams["weight_decay"] = jnp.asarray(0.0)
    st.hyperparams["last_layer_lr"] = jnp.asarray(0.0)
    upd, _ = tx.update(grads, st, params)
    np.testing.assert_array_equal(
        np.asarray(upd["dino_head"]["last_layer"]["kernel"]), 0.0
    )
    assert np.all(np.asarray(upd["backbone"]["kernel"]) != 0.0)

    # ll_lr == lr  ==>  identical to the mask-free optimizer
    tx0 = make_ssl_optimizer(lr_t, wd_t)
    st0 = tx0.init(params)
    st0.hyperparams["learning_rate"] = jnp.asarray(1e-2)
    st0.hyperparams["weight_decay"] = jnp.asarray(0.04)
    st.hyperparams["last_layer_lr"] = jnp.asarray(1e-2)
    st.hyperparams["weight_decay"] = jnp.asarray(0.04)
    upd_split, _ = tx.update(grads, st, params)
    upd_plain, _ = tx0.update(grads, st0, params)
    for a, b in zip(jax.tree.leaves(upd_split), jax.tree.leaves(upd_plain)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_load_ssl_config_overrides(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text("epochs: 3\nlr: 0.001\nvit:\n  embed_dim: 32\n")
    cfg = load_ssl_config(str(p), ["epochs=5", "mask_probability=0.7"])
    assert cfg.epochs == 5
    assert cfg.lr == 0.001
    assert cfg.mask_probability == 0.7
    assert cfg.extra["vit"]["embed_dim"] == 32


def test_distill_step_frozen_teacher_and_student_ema():
    """Distillation (ssl_meta_arch.py:131-141): a larger frozen teacher
    provides the targets, the student trains from clean pixels, and the
    EMA tracks the student, not the teacher."""
    from omgsr_tpu.models.configs import DinoV3ViTConfig
    from omgsr_tpu.models.dinov3_vit import init_dinov3_vit
    from omgsr_tpu.training.ssl_meta_arch import (
        SSLMetaConfig,
        init_center_state,
        init_distill_ema,
        init_ssl_student,
        make_distill_train_step,
    )

    s_vit = DinoV3ViTConfig(embed_dim=32, depth=2, num_heads=2, patch_size=8)
    t_vit = DinoV3ViTConfig(embed_dim=48, depth=3, num_heads=3, patch_size=8)
    meta = SSLMetaConfig(
        n_local_crops=4,
        dino_out_dim=64, dino_hidden_dim=32, dino_bottleneck_dim=16, dino_nlayers=2,
        ibot_out_dim=64, ibot_hidden_dim=32, ibot_bottleneck_dim=16, ibot_nlayers=2,
    )
    student = init_ssl_student(jax.random.key(0), s_vit, meta, init_dinov3_vit)
    frozen = init_ssl_student(jax.random.key(1), t_vit, meta, init_dinov3_vit)
    ema = init_distill_ema(student)
    lr_t, wd_t = ssl_param_groups(student, num_layers=s_vit.depth)
    tx = make_ssl_optimizer(lr_t, wd_t, last_layer_mask_tree=last_layer_mask(student))
    opt_state = tx.init(student)
    centers = init_center_state(meta)

    rng = np.random.default_rng(0)
    b, n = 2, (32 // 8) ** 2
    masks = np.zeros((2 * b, n), bool)
    masks[0, :6] = True
    batch = {
        "global_crops": jnp.asarray(rng.standard_normal((2 * b, 32, 32, 3)), jnp.float32),
        "local_crops": jnp.asarray(rng.standard_normal((4 * b, 16, 16, 3)), jnp.float32),
        "masks": jnp.asarray(masks),
    }
    step = jax.jit(
        make_distill_train_step(tx, cfg=meta, vit_cfg=s_vit, teacher_vit_cfg=t_vit)
    )
    frozen0 = jax.tree.map(np.asarray, frozen)
    student1, ema1, opt_state, centers, metrics = step(
        student, frozen, ema, opt_state, centers, batch,
        lr=1e-3, wd=0.04, teacher_temp=0.07, momentum=0.9, last_layer_lr=0.0,
    )
    assert all(np.isfinite(float(v)) for v in metrics.values())
    # student moved; frozen teacher untouched; EMA = 0.9*student0 + 0.1*student1
    assert not np.allclose(
        np.asarray(student1["backbone"]["cls_token"]),
        np.asarray(student["backbone"]["cls_token"]),
    )
    np.testing.assert_array_equal(
        np.asarray(frozen["backbone"]["cls_token"]), frozen0["backbone"]["cls_token"]
    )
    np.testing.assert_allclose(
        np.asarray(ema1["backbone"]["cls_token"]),
        0.9 * np.asarray(student["backbone"]["cls_token"])
        + 0.1 * np.asarray(student1["backbone"]["cls_token"]),
        rtol=1e-5, atol=1e-7,
    )
    # last-layer freeze active through the split optimizer
    np.testing.assert_array_equal(
        np.asarray(student1["dino_head"]["last_layer"]["kernel"]),
        np.asarray(student["dino_head"]["last_layer"]["kernel"]),
    )


def test_pretrain_e2e_distillation(tmp_path):
    """CLI distillation mode: frozen bigger teacher, 2 tiny iterations."""
    _write_images(tmp_path)
    cfg = _tiny_cfg(
        tmp_path,
        distillation_enabled=True,
        distillation_arch="custom",
        epochs=1,
        saveckp_freq=2,
    )
    cfg.extra["teacher_vit"] = {
        "embed_dim": 48, "depth": 2, "num_heads": 3, "patch_size": 8
    }
    out = run_pretraining(cfg)
    # the exported "teacher" is the student's EMA: same tree shape as student
    assert (
        np.asarray(out["teacher"]["backbone"]["cls_token"]).shape
        == np.asarray(out["student"]["backbone"]["cls_token"]).shape
    )


def test_gram_step_anchors_on_frozen_teacher():
    """make_gram_ssl_train_step: the frozen gram backbone's patches (incl.
    the larger-crop resize path, get_gram_teacher_output:488-503) anchor
    the loss; swapping the gram params changes gram_loss, everything else
    fixed."""
    from omgsr_tpu.models.configs import DinoV3ViTConfig
    from omgsr_tpu.models.dinov3_vit import init_dinov3_vit
    from omgsr_tpu.training.ssl_meta_arch import (
        SSLMetaConfig,
        init_center_state,
        init_ssl_student,
        make_gram_ssl_train_step,
    )

    vit = DinoV3ViTConfig(embed_dim=32, depth=2, num_heads=2, patch_size=8)
    meta = SSLMetaConfig(
        n_local_crops=4,
        dino_out_dim=64, dino_hidden_dim=32, dino_bottleneck_dim=16, dino_nlayers=2,
        ibot_out_dim=64, ibot_hidden_dim=32, ibot_bottleneck_dim=16, ibot_nlayers=2,
        gram_loss_weight=1.0,
    )
    student = init_ssl_student(jax.random.key(0), vit, meta, init_dinov3_vit)
    teacher = jax.tree.map(jnp.copy, student)
    gram_a = init_ssl_student(jax.random.key(1), vit, meta, init_dinov3_vit)["backbone"]
    gram_b = init_ssl_student(jax.random.key(2), vit, meta, init_dinov3_vit)["backbone"]
    lr_t, wd_t = ssl_param_groups(student, num_layers=vit.depth)
    tx = make_ssl_optimizer(lr_t, wd_t)
    opt_state = tx.init(student)
    centers = init_center_state(meta)

    rng = np.random.default_rng(0)
    b, n = 2, (32 // 8) ** 2
    masks = np.zeros((2 * b, n), bool)
    masks[0, :6] = True
    batch = {
        "global_crops": jnp.asarray(rng.standard_normal((2 * b, 32, 32, 3)), jnp.float32),
        "local_crops": jnp.asarray(rng.standard_normal((4 * b, 16, 16, 3)), jnp.float32),
        # gram crops at 48px -> 6x6 patch grid, resized down to the 4x4 student grid
        "gram_teacher_crops": jnp.asarray(
            rng.standard_normal((2 * b, 48, 48, 3)), jnp.float32
        ),
        "masks": jnp.asarray(masks),
    }
    step = jax.jit(make_gram_ssl_train_step(tx, cfg=meta, vit_cfg=vit))
    kw = dict(lr=1e-3, wd=0.04, teacher_temp=0.07, momentum=0.99)
    _, _, _, _, m_a = step(student, teacher, gram_a, opt_state, centers, batch, **kw)
    _, _, _, _, m_b = step(student, teacher, gram_b, opt_state, centers, batch, **kw)
    assert np.isfinite(float(m_a["gram_loss"])) and float(m_a["gram_loss"]) > 0.0
    assert not np.isclose(float(m_a["gram_loss"]), float(m_b["gram_loss"]))
    # non-gram losses identical across gram teachers
    np.testing.assert_allclose(
        float(m_a["ibot_loss"]), float(m_b["ibot_loss"]), rtol=1e-6
    )


def test_pretrain_e2e_gram_teacher(tmp_path):
    """CLI gram mode: frozen gram teacher, periodic EMA refresh, gram state
    in the checkpoint."""
    _write_images(tmp_path)
    cfg = _tiny_cfg(
        tmp_path,
        epochs=1,
        saveckp_freq=2,
        gram_use_loss=True,
        gram_teacher_crops_size=48,
        gram_update_frequency=1,
        gram_it_first_update=1,
        gram_loss_weight_schedule={
            "start": 0.0, "peak": 1.0, "end": 0.5, "warmup_epochs": 1
        },
    )
    out = run_pretraining(cfg)
    assert out is not None
    ckpt = os.path.join(cfg.output_dir, "checkpoints", "checkpoint-1")
    assert os.path.isdir(ckpt)
    # resume restores the gram slot too (template includes "gram")
    out2 = run_pretraining(cfg)
    assert out2 is not None


def test_pretrain_inline_knn_eval(tmp_path):
    """eval_period_iterations hook: k-NN probe on a dir-per-class pair runs
    in-train and writes eval/knn-*.json with top-1 accuracies."""
    import json

    from PIL import Image

    _write_images(tmp_path)
    rng = np.random.default_rng(1)
    for split in ("eval_train", "eval_val"):
        for ci, color in enumerate([(220, 40, 40), (40, 40, 220)]):
            d = tmp_path / split / f"class{ci}"
            d.mkdir(parents=True)
            for i in range(4):
                arr = np.full((40, 40, 3), color, np.uint8)
                arr = np.clip(
                    arr.astype(np.int16) + rng.integers(-30, 30, arr.shape), 0, 255
                ).astype(np.uint8)
                Image.fromarray(arr, "RGB").save(d / f"{i}.png")
    cfg = _tiny_cfg(
        tmp_path,
        epochs=1,
        eval_period_iterations=2,
        eval_knn_train_dir=str(tmp_path / "eval_train"),
        eval_knn_val_dir=str(tmp_path / "eval_val"),
        eval_resize_size=36,
        eval_crop_size=32,
    )
    run_pretraining(cfg)
    path = os.path.join(cfg.output_dir, "eval", "knn-1.json")
    assert os.path.exists(path)
    accs = json.load(open(path))
    assert accs and all(0.0 <= v <= 1.0 for v in accs.values())


def test_pretrain_multires_resume_matches_straight_run(tmp_path):
    """Multi-resolution loaders (train.py:334-380): ratio-sampled batches
    across two crop resolutions, and a split run (2 iters + resume 2 more)
    reproduces the straight 4-iter run exactly — choice stream and
    per-loader advance are deterministic."""
    _write_images(tmp_path)
    # constant schedules: the cosine tables span epochs*ep, so a shorter
    # first leg would otherwise train its shared iterations under different
    # wd/momentum values than the straight run (resume assumes the SAME
    # config; this isolates the data-stream/state replay under test)
    multires = dict(
        global_crops_size=[32, 48],
        local_crops_size=[16, 16],
        global_local_crop_pairs_ratios=[2, 1],
        saveckp_freq=10,
        warmup_epochs=0,
        freeze_last_layer_epochs=0,
        min_lr=0.004,
        scaling_rule="none",
        weight_decay_end=0.04,
        final_momentum_teacher=0.992,
        warmup_teacher_temp_epochs=0,
    )
    cfg_a = _tiny_cfg(tmp_path, **multires)
    cfg_a.output_dir = str(tmp_path / "straight")
    out_a = run_pretraining(cfg_a)

    cfg_b1 = _tiny_cfg(tmp_path, epochs=1, **multires)
    cfg_b1.output_dir = str(tmp_path / "split")
    run_pretraining(cfg_b1)
    cfg_b2 = _tiny_cfg(tmp_path, **multires)  # epochs=2 resumes at it 2
    cfg_b2.output_dir = cfg_b1.output_dir
    out_b = run_pretraining(cfg_b2)

    np.testing.assert_allclose(
        np.asarray(out_a["student"]["dino_head"]["mlp"]["0"]["kernel"]),
        np.asarray(out_b["student"]["dino_head"]["mlp"]["0"]["kernel"]),
        rtol=1e-6, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(out_a["teacher"]["backbone"]["cls_token"]),
        np.asarray(out_b["teacher"]["backbone"]["cls_token"]),
        rtol=1e-6, atol=1e-7,
    )


def test_pretrain_e2e_and_resume(tmp_path):
    """4 tiny iterations end-to-end (sharded over the virtual mesh when
    present), then checkpoint layout, teacher export restorability, and a
    resume that continues from the saved iteration."""
    _write_images(tmp_path)
    cfg = _tiny_cfg(tmp_path)
    out = run_pretraining(cfg)

    ckpt_dir = os.path.join(cfg.output_dir, "checkpoints")
    assert sorted(os.listdir(ckpt_dir)) == ["checkpoint-2", "checkpoint-3"]
    # teacher export restores against a fresh init tree
    from omgsr_tpu.cli.pretrain_dinov3 import _meta_cfg, _vit_cfg
    from omgsr_tpu.models.dinov3_vit import init_dinov3_vit
    from omgsr_tpu.training.checkpoint import restore_train_state
    from omgsr_tpu.training.ssl_meta_arch import init_ssl_student

    tpath = os.path.join(cfg.output_dir, "eval", "teacher-3", "backbone")
    abstract = init_ssl_student(
        jax.random.key(1), _vit_cfg(cfg), _meta_cfg(cfg), init_dinov3_vit
    )["backbone"]
    restored = restore_train_state(tpath, abstract)
    np.testing.assert_allclose(
        np.asarray(restored["cls_token"]),
        np.asarray(out["teacher"]["backbone"]["cls_token"]),
    )
    # training moved the student off its teacher-initialization
    assert not np.allclose(
        np.asarray(out["student"]["dino_head"]["last_layer"]["kernel"]),
        np.asarray(out["teacher"]["dino_head"]["last_layer"]["kernel"]),
    )

    # resume past the end: restores checkpoint-3, runs nothing, stays valid
    out2 = run_pretraining(cfg)
    np.testing.assert_allclose(
        np.asarray(out2["student"]["dino_head"]["mlp"]["0"]["kernel"]),
        np.asarray(out["student"]["dino_head"]["mlp"]["0"]["kernel"]),
    )
