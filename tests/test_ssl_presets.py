"""Named SSL recipe presets (omgsr_tpu/configs/ssl_*.yml) vs the
reference's published training YAMLs (dinov3/configs/train/*.yaml):
every preset parses with zero unknown keys, pins the recipe's schedule
values, and drives run_pretraining end-to-end at tiny geometry."""

import dataclasses
import os

import numpy as np
import pytest

from omgsr_tpu.cli.pretrain_dinov3 import (
    build_ssl_schedulers,
    load_ssl_config,
    run_pretraining,
)

CONFIG_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "omgsr_tpu",
    "configs",
)

PRESETS = [
    "ssl_vit7b16_pretrain.yml",
    "ssl_vit7b16_gram_anchor.yml",
    "ssl_vit7b16_high_res_adapt.yml",
    "ssl_vitl16_distilled.yml",
]


def _load(name):
    return load_ssl_config(os.path.join(CONFIG_DIR, name), [])


@pytest.mark.parametrize("name", PRESETS)
def test_preset_parses_clean(name):
    """Every key in a preset maps to a real SSLPretrainConfig knob —
    nothing falls through into cfg.extra silently."""
    cfg = _load(name)
    assert cfg.extra == {}, f"unknown keys in {name}: {sorted(cfg.extra)}"
    assert cfg.dataset_paths is None  # REQUIRED placeholder, not a path


def test_pretrain_preset_pins_recipe():
    """dinov3_vit7b16_pretrain.yaml: absolute lr 5e-5 after a 100-epoch
    warmup, flat wd 0.04, flat momentum 0.994, temp 0.04->0.07/100ep,
    the 262144/98304 prototype heads, sinkhorn centering."""
    cfg = _load("ssl_vit7b16_pretrain.yml")
    assert cfg.arch == "vit7b16"
    assert cfg.epochs == 1000 and cfg.official_epoch_length == 1000
    assert cfg.dino_out_dim == 262144 and cfg.ibot_out_dim == 98304
    assert cfg.centering == "sinkhorn_knopp"
    assert cfg.gram_use_loss is False
    sched = build_ssl_schedulers(cfg, global_batch_size=16)
    ep, total = 1000, 1000 * 1000
    # absolute values — scaling_rule must NOT have scaled the peak
    assert sched["lr"][0] == pytest.approx(0.0, abs=1e-9)
    assert sched["lr"][100 * ep] == pytest.approx(5.0e-05, rel=1e-6)
    assert sched["lr"][total - 1] == pytest.approx(5.0e-05, rel=1e-6)
    assert sched["wd"][0] == sched["wd"][total - 1] == pytest.approx(0.04)
    assert sched["momentum"][0] == pytest.approx(0.994)
    assert sched["momentum"][total - 1] == pytest.approx(0.994)
    assert sched["teacher_temp"][0] == pytest.approx(0.04)
    assert sched["teacher_temp"][100 * ep] == pytest.approx(0.07)
    # freeze_last_layer_epochs=5 zeroes the last-layer lr group
    assert sched["last_layer_lr"][5 * ep - 1] == 0.0
    assert sched["last_layer_lr"][5 * ep] > 0.0
    assert sched["gram_weight"] is None
    assert sched["local_loss_weight"] is None


def test_gram_anchor_preset_pins_recipe():
    """dinov3_vit7b16_gram_anchor.yaml: lr 3e-5 flat after warmup, gram
    weight ramps 0->2.0 over the final cosine epoch, local DINO weight
    decays 1->0.5 over the same window, momentum flat 0.999."""
    cfg = _load("ssl_vit7b16_gram_anchor.yml")
    assert cfg.gram_use_loss is True and cfg.gram_ema_teacher is False
    assert cfg.gram_it_first_update == 1010000 and cfg.gram_max_updates == 3
    assert cfg.gram_teacher_crops_size == 512
    assert cfg.gram_teacher_no_distortions is True
    sched = build_ssl_schedulers(cfg, global_batch_size=16)
    ep, total = 1000, 1200 * 1000
    assert sched["lr"][100 * ep] == pytest.approx(3.0e-05, rel=1e-6)
    assert sched["momentum"][0] == pytest.approx(0.999)
    # gram: start 0, warmup_epochs 1000 (linear 0->0), cosine_epochs 1
    # rides the tail up to 2.0 by end-of-table
    assert sched["gram_weight"][0] == pytest.approx(0.0, abs=1e-9)
    assert sched["gram_weight"][total - 1] == pytest.approx(2.0, rel=1e-3)
    # local loss weight 1 -> 0.5 over the same tail
    assert sched["local_loss_weight"][0] == pytest.approx(1.0)
    assert sched["local_loss_weight"][total - 1] == pytest.approx(0.5, rel=1e-3)


def test_high_res_adapt_preset_pins_recipe():
    """dinov3_vit7b16_high_res_adapt.yaml: lr cosines 0 -> 1.25e-5 over
    the first 10 of 30 epochs then holds, flat gram 1.5, flat local 0.5,
    five multi-resolution crop triples with 0.3/0.3/0.3/0.05/0.05 draws."""
    cfg = _load("ssl_vit7b16_high_res_adapt.yml")
    assert cfg.global_crops_size == [512, 768, 768, 768, 768]
    assert cfg.local_crops_size == [112, 112, 168, 224, 336]
    assert cfg.gram_teacher_crops_size == [768, 1152, 1152, 1152, 1152]
    assert cfg.global_local_crop_pairs_ratios == [0.3, 0.3, 0.3, 0.05, 0.05]
    assert cfg.gram_rep_update is False
    sched = build_ssl_schedulers(cfg, global_batch_size=8)
    ep, total = 1000, 30 * 1000
    assert sched["lr"][0] == pytest.approx(0.0, abs=1e-9)
    assert sched["lr"][10 * ep] == pytest.approx(1.25e-05, rel=1e-3)
    assert sched["lr"][total - 1] == pytest.approx(1.25e-05, rel=1e-3)
    assert sched["gram_weight"][0] == pytest.approx(1.5)
    assert sched["gram_weight"][total - 1] == pytest.approx(1.5)
    assert sched["local_loss_weight"][total // 2] == pytest.approx(0.5)


def test_distilled_preset_pins_recipe():
    """dinov3_vitl16_lvd1689m_distilled.yaml: frozen 7B teacher over a
    ViT-L student, lr cosines 0 -> 5e-5 over the first 10 of 20 epochs,
    clip 3.0, layerwise decay 0.99, momentum 0.994 -> 1.0."""
    cfg = _load("ssl_vitl16_distilled.yml")
    assert cfg.arch == "vitl16"
    assert cfg.distillation_enabled is True
    assert cfg.distillation_arch == "vit7b16"
    assert cfg.clip_grad == 3.0 and cfg.layerwise_decay == 0.99
    sched = build_ssl_schedulers(cfg, global_batch_size=3)
    ep, total = 1250, 20 * 1250
    assert sched["lr"][10 * ep] == pytest.approx(5.0e-05, rel=1e-3)
    assert sched["lr"][total - 1] == pytest.approx(5.0e-05, rel=1e-3)
    assert sched["momentum"][0] == pytest.approx(0.994)
    assert sched["momentum"][total - 1] == pytest.approx(1.0)
    assert sched["teacher_temp"][0] == pytest.approx(0.07)  # warmup_epochs 0


# ---------------------------------------------------------------------------
# tiny-geometry dryruns: each preset's WIRING (gram / distillation /
# multi-resolution / schedules) drives run_pretraining for 2 iterations
# ---------------------------------------------------------------------------


def _shrink(cfg, tmp_path, **kw):
    """Scale a preset down to test geometry without touching its wiring."""
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(6):
        Image.fromarray(
            rng.integers(0, 255, (64, 80, 3), dtype=np.uint8), "RGB"
        ).save(d / f"{i}.png")
    tiny = dict(
        output_dir=str(tmp_path / "out"),
        dataset_paths=str(d),
        batch_size_per_device=1,
        official_epoch_length=2,
        epochs=1,
        saveckp_freq=5,
        print_freq=1,
        arch="custom",
        local_crops_number=4,
        dino_out_dim=64,
        dino_hidden_dim=32,
        dino_bottleneck_dim=16,
        dino_nlayers=2,
        ibot_out_dim=64,
        ibot_hidden_dim=32,
        ibot_bottleneck_dim=16,
        ibot_nlayers=2,
    )
    tiny.update(kw)
    cfg = dataclasses.replace(cfg, **tiny)
    cfg.extra = {
        "vit": {"embed_dim": 32, "depth": 2, "num_heads": 2, "patch_size": 8}
    }
    return cfg


def test_gram_anchor_preset_dryrun(tmp_path):
    cfg = _shrink(
        _load("ssl_vit7b16_gram_anchor.yml"),
        tmp_path,
        global_crops_size=32,
        local_crops_size=16,
        gram_teacher_crops_size=48,
        # fire one gram refresh inside the 2-iteration run
        gram_it_first_update=1,
        gram_update_frequency=1,
    )
    out = run_pretraining(cfg)
    assert out is not None


def test_high_res_adapt_preset_dryrun(tmp_path):
    cfg = _shrink(
        _load("ssl_vit7b16_high_res_adapt.yml"),
        tmp_path,
        epochs=2,  # 4 iterations: draw from both resolution triples
        global_crops_size=[32, 48],
        local_crops_size=[16, 16],
        gram_teacher_crops_size=[48, 64],
        global_local_crop_pairs_ratios=[0.5, 0.5],
    )
    out = run_pretraining(cfg)
    assert out is not None


def test_distilled_preset_dryrun(tmp_path):
    cfg = _shrink(
        _load("ssl_vitl16_distilled.yml"),
        tmp_path,
        global_crops_size=32,
        local_crops_size=16,
        distillation_arch="custom",
    )
    cfg.extra["teacher_vit"] = {
        "embed_dim": 48, "depth": 2, "num_heads": 3, "patch_size": 8
    }
    out = run_pretraining(cfg)
    assert out is not None
