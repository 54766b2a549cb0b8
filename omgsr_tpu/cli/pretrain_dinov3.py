"""DINOv3 SSL pretraining CLI — the end-to-end loop over the SSL stack.

    python -m omgsr_tpu.cli.pretrain_dinov3 --config cfg.yml [key=value ...]

Re-owns dinov3/train/train.py (get_args_parser:57-99, build_schedulers
:102-152, apply_optim_scheduler:227-236, do_train:382-560) the TPU way:

- ONE jitted step per iteration (training/ssl_meta_arch.make_ssl_train_step):
  teacher+student forward, all losses, grads, AdamW, EMA teacher, center
  EMA — donated state, no host sync beyond the logged metrics.
- Schedules are precomputed numpy tables (the reference's CosineScheduler
  form); the host indexes them and passes scalars into the step — no
  retrace. The last-layer lr freeze (train.py:142-147) rides a third
  injected hyperparam driving the `last_layer` leaves.
- Data parallelism comes from sharding the batch over a {data} mesh axis:
  XLA inserts every cross-device reduction (sinkhorn normalizers, loss
  means, grad psums) that the torch version issues by hand. The global
  batch is batch_size_per_device * len(jax.devices()), matching the
  reference's batch_size_per_gpu * world_size.
- Host-side multi-crop augmentation runs in a background thread (measured
  loader headroom is ~20x over a train step); randomness flows through one
  np.random.Generator seeded from (seed, iteration) so a resumed run
  replays the same crop stream.
- Full-state checkpoint/resume via orbax (student, teacher, opt_state,
  centers, iteration) — the reference's checkpointer/ round-trip — plus a
  standalone teacher-backbone export consumable by eval/probes and
  models/dinov3_vit.
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import logging
import math
import os
import queue
import threading
import time
from typing import Any, Optional

import numpy as np

logger = logging.getLogger("omgsr_tpu.pretrain_dinov3")


@dataclasses.dataclass
class SSLPretrainConfig:
    """Flat-key mirror of ssl_default_config.yaml's train/optim/teacher/
    crops/ibot/gram sections (only the knobs the TPU stack consumes)."""

    # train
    output_dir: str = "output_ssl"
    dataset_paths: Any = None  # dir | list of dirs of images
    batch_size_per_device: int = 4
    official_epoch_length: int = 1250
    seed: int = 0
    saveckp_freq: int = 500  # iterations between checkpoints (ref: 20 epochs)
    print_freq: int = 10
    resume: bool = True
    mixed_precision: str = "bf16"  # compute dtype for crops; params stay f32
    sampler: str = "infinite"  # infinite | sharded_infinite | epoch
    # student backbone
    arch: str = "vits16"  # key into models.configs.VIT_SIZES
    # hub .pth to initialize the student backbone from (the reference's
    # student.resume_from_teacher_chkpt, ssl_meta_arch.py:326-333 — the
    # high-res-adaptation entry point; the EMA teacher starts as a copy)
    student_init_checkpoint: str = ""
    # optim (yaml optim.*)
    epochs: int = 100
    warmup_epochs: int = 10
    lr: float = 0.004
    min_lr: float = 1.0e-6
    scaling_rule: str = "sqrt_wrt_1024"  # sqrt_wrt_1024 | linear_wrt_256 | none
    weight_decay: float = 0.04
    weight_decay_end: float = 0.4
    freeze_last_layer_epochs: int = 1
    clip_grad: float = 3.0
    layerwise_decay: float = 0.9
    patch_embed_lr_mult: float = 0.2
    dino_head_wd_multiplier: float = 1.0
    adamw_beta1: float = 0.9
    adamw_beta2: float = 0.999
    # teacher (yaml teacher.*)
    momentum_teacher: float = 0.992
    final_momentum_teacher: float = 1.0
    warmup_teacher_temp: float = 0.04
    teacher_temp: float = 0.07
    warmup_teacher_temp_epochs: int = 30
    # crops (yaml crops.*); the three sizes accept equal-length LISTS for
    # multi-resolution pretraining (train.py:334-380): each iteration's
    # batch is drawn from one resolution with probability
    # global_local_crop_pairs_ratios — one cached XLA graph per resolution
    global_crops_size: Any = 224
    local_crops_size: Any = 96
    global_local_crop_pairs_ratios: Any = 1.0
    global_crops_scale: Any = (0.32, 1.0)
    local_crops_scale: Any = (0.05, 0.32)
    local_crops_number: int = 8
    gram_teacher_crops_size: Optional[int] = None
    gram_teacher_no_distortions: bool = False
    teacher_no_color_jitter: bool = False
    horizontal_flips: bool = True
    # ibot (yaml ibot.*)
    mask_probability: float = 0.5
    mask_ratio_min_max: Any = (0.1, 0.5)
    # heads / losses (yaml dino.* / ibot.*) — SSLMetaConfig fields
    dino_out_dim: int = 65536
    dino_hidden_dim: int = 2048
    dino_bottleneck_dim: int = 256
    dino_nlayers: int = 3
    ibot_separate_head: bool = True
    ibot_out_dim: int = 65536
    ibot_hidden_dim: int = 2048
    ibot_bottleneck_dim: int = 256
    ibot_nlayers: int = 3
    dino_loss_weight: float = 1.0
    koleo_loss_weight: float = 0.1
    ibot_loss_weight: float = 1.0
    centering: str = "sinkhorn_knopp"
    # in-train eval (yaml evaluation.eval_period_iterations; the reference
    # submits eval jobs there, train.py:555-560 — here a k-NN probe runs
    # in-process on a dir-per-class ImageFolder pair)
    eval_period_iterations: int = 0
    eval_knn_train_dir: str = ""
    eval_knn_val_dir: str = ""
    eval_resize_size: int = 256
    eval_crop_size: int = 224
    # distillation (yaml distillation.*): frozen pretrained teacher; the
    # checkpoint is a hub backbone .pth (heads stay at init unless resumed)
    distillation_enabled: bool = False
    distillation_arch: str = ""  # teacher arch; "" -> same as student
    distillation_checkpoint: str = ""  # hub .pth for the teacher backbone
    # gram (yaml gram.*)
    gram_use_loss: bool = False
    gram_loss_weight: float = 1.0
    gram_img_level: bool = False
    gram_remove_neg: bool = False
    gram_tokens_used: str = "all"
    gram_ema_teacher: bool = False
    gram_ckpt: str = ""  # hub .pth for the frozen gram teacher backbone
    gram_rep_update: bool = True
    gram_update_frequency: int = 50000
    gram_it_first_update: int = 0
    gram_it_load_ema_teacher: int = -1
    gram_max_updates: Optional[int] = None
    gram_resize_method: str = "bicubic"
    # dict {start, peak, end, warmup_epochs[, cosine_epochs]} — replaces the
    # static gram_loss_weight with a tabulated schedule (ssl_meta_arch:186-201)
    gram_loss_weight_schedule: Any = None
    # dict {start, peak, end, warmup_epochs[, cosine_epochs]} — the
    # reference's dino.reweight_dino_local_loss + local_loss_weight_schedule
    # (ssl_meta_arch.py builds it when reweighting is on; used by the
    # vit7b16 gram-anchor / high-res-adapt recipes). Drives the
    # local_loss_weight step hyperparam (ssl_meta_arch.py:200,274).
    local_loss_weight_schedule: Any = None
    # dict {start, peak, end, warmup_epochs[, cosine_epochs]} — the
    # reference's explicit schedules.lr form (dinov3/configs/train/*.yaml);
    # when set it replaces the flat lr/min_lr/warmup_epochs cosine and is
    # taken as ABSOLUTE values (scaling_rule is not applied), matching how
    # the published recipes pin their peaks
    lr_schedule: Any = None
    extra: dict = dataclasses.field(default_factory=dict)


def load_ssl_config(path: Optional[str], overrides=None) -> SSLPretrainConfig:
    import yaml

    from omgsr_tpu.config import _coerce

    raw = {}
    if path:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
    for ov in overrides or []:
        key, _, value = ov.partition("=")
        raw[key.strip()] = _coerce(value)
    known = {f.name for f in dataclasses.fields(SSLPretrainConfig)}
    cfg = SSLPretrainConfig(**{k: v for k, v in raw.items() if k in known})
    cfg.extra = {k: v for k, v in raw.items() if k not in known}
    return cfg


def build_ssl_schedulers(cfg: SSLPretrainConfig, global_batch_size: int):
    """build_schedulers (train.py:102-152) + the lr scaling rule
    (config.py:40-55): tables for lr / wd / momentum / teacher_temp /
    last_layer_lr, all indexed by iteration with clamp-past-end."""
    from omgsr_tpu.training.ssl import (
        TabulatedSchedule,
        cosine_schedule,
        linear_warmup_cosine_decay,
    )

    ep = cfg.official_epoch_length
    total = cfg.epochs * ep
    lr_peak, lr_end = cfg.lr, cfg.min_lr
    if cfg.scaling_rule == "sqrt_wrt_1024":
        s = 4 * math.sqrt(global_batch_size / 1024.0)
        lr_peak, lr_end = lr_peak * s, lr_end * s
    elif cfg.scaling_rule == "linear_wrt_256":
        s = global_batch_size / 256.0
        lr_peak, lr_end = lr_peak * s, lr_end * s
    def _tabulate(sc: dict) -> np.ndarray:
        """{start, peak, end, warmup_epochs[, cosine_epochs]} -> table,
        with warmup AND cosine clamped into the run (short debug runs with
        epochs << the recipe's warmup/cosine windows must still build)."""
        warmup = min(int(sc.get("warmup_epochs", 0) * ep), total)
        cosine = (
            min(int(sc["cosine_epochs"] * ep), total - warmup)
            if "cosine_epochs" in sc
            else None
        )
        return linear_warmup_cosine_decay(
            start=sc.get("start", 0.0),
            peak=sc["peak"],
            end=sc["end"],
            warmup_iterations=warmup,
            total_iterations=total,
            cosine_iterations=cosine,
        )

    # clamp warmup into the run (short debug runs with epochs < warmup_epochs)
    lr_table = cosine_schedule(lr_peak, lr_end, total, min(cfg.warmup_epochs * ep, total))
    if cfg.lr_schedule:
        lr_table = _tabulate(dict(cfg.lr_schedule))
        lr_end = dict(cfg.lr_schedule)["end"]
    wd_table = cosine_schedule(cfg.weight_decay, cfg.weight_decay_end, total)
    mom_table = cosine_schedule(cfg.momentum_teacher, cfg.final_momentum_teacher, total)
    temp_warmup = cfg.warmup_teacher_temp_epochs * ep
    if temp_warmup <= 0:
        # schedules.teacher_temp.warmup_epochs: 0 -> the temp starts warm
        temp_table = np.full((1,), cfg.teacher_temp)
    else:
        temp_table = cosine_schedule(
            cfg.teacher_temp,
            cfg.teacher_temp,
            temp_warmup,
            warmup_iters=temp_warmup,
            start_warmup_value=cfg.warmup_teacher_temp,
        )
    last_layer_table = lr_table.copy()
    last_layer_table[: cfg.freeze_last_layer_epochs * ep] = 0.0
    gram_sched = None
    if cfg.gram_loss_weight_schedule:
        sc = dict(cfg.gram_loss_weight_schedule)
        gram_sched = TabulatedSchedule(_tabulate(sc), final_value=sc["end"])
    local_sched = None
    if cfg.local_loss_weight_schedule:
        sc = dict(cfg.local_loss_weight_schedule)
        local_sched = TabulatedSchedule(_tabulate(sc), final_value=sc["end"])
    return {
        "lr": TabulatedSchedule(lr_table, final_value=lr_end),
        "wd": TabulatedSchedule(wd_table, final_value=cfg.weight_decay_end),
        "momentum": TabulatedSchedule(mom_table, final_value=cfg.final_momentum_teacher),
        "teacher_temp": TabulatedSchedule(temp_table, final_value=cfg.teacher_temp),
        "last_layer_lr": TabulatedSchedule(last_layer_table, final_value=lr_end),
        "gram_weight": gram_sched,
        "local_loss_weight": local_sched,
    }


def list_ssl_images(paths):
    """Image sources for the SSL loader: dirs / .txt lists of paths, or a
    dataset-string spec ("ImageNet22k:root=...:extra=...", data/datasets.py)
    whose items are lazily decoded PIL images."""
    from omgsr_tpu.data.datasets import is_dataset_spec, make_dataset

    if is_dataset_spec(paths):
        return make_dataset(paths).images
    if isinstance(paths, str):
        paths = [paths]
    files: list[str] = []
    for p in paths or []:
        if os.path.isdir(p):
            for ext in ("png", "jpg", "jpeg", "JPEG", "webp"):
                files += glob.glob(os.path.join(p, f"*.{ext}"))
        elif p.endswith(".txt"):
            with open(p) as f:
                files += [ln.strip() for ln in f if ln.strip()]
        else:
            files.append(p)
    files = sorted(set(files))
    if not files:
        raise FileNotFoundError(f"no images found under {paths!r}")
    return files


class SSLLoader:
    """Sampler -> multi-crop augment -> static-shape collate, with a
    one-deep background-thread prefetch (the reference's DataLoader
    workers; host aug has ~20x headroom over the step)."""

    def __init__(self, cfg: SSLPretrainConfig, start_iter: int = 0):
        from PIL import Image

        from omgsr_tpu.data.ssl import (
            BlockMaskingGenerator,
            EpochSampler,
            InfiniteSampler,
            MultiCropAugmentation,
            MultiCropConfig,
            ShardedInfiniteSampler,
        )

        self.files = list_ssl_images(cfg.dataset_paths)
        self.batch = cfg.batch_size_per_device * _num_devices()
        self.cfg = cfg
        self._Image = Image
        self.aug = MultiCropAugmentation(
            MultiCropConfig(
                global_crops_scale=tuple(cfg.global_crops_scale),
                local_crops_scale=tuple(cfg.local_crops_scale),
                local_crops_number=cfg.local_crops_number,
                global_crops_size=cfg.global_crops_size,
                local_crops_size=cfg.local_crops_size,
                gram_teacher_crops_size=cfg.gram_teacher_crops_size,
                gram_teacher_no_distortions=cfg.gram_teacher_no_distortions,
                teacher_no_color_jitter=cfg.teacher_no_color_jitter,
                horizontal_flips=cfg.horizontal_flips,
            )
        )
        patch = _vit_cfg(cfg).patch_size
        self.mask_gen = BlockMaskingGenerator(cfg.global_crops_size // patch)
        n = len(self.files)
        advance = start_iter * self.batch
        if cfg.sampler == "epoch":

            def _epoch_stream():
                es = EpochSampler(size=n, sample_count=n, shuffle=True, seed=cfg.seed)
                epoch = 0
                while True:
                    es.set_epoch(epoch)
                    yield from iter(es)
                    epoch += 1

            self.sampler = _epoch_stream()
            for _ in range(advance):
                next(self.sampler)
        elif cfg.sampler == "sharded_infinite":
            self.sampler = iter(
                ShardedInfiniteSampler(
                    sample_count=n, shuffle=True, seed=cfg.seed, advance=advance
                )
            )
        else:
            self.sampler = iter(
                InfiniteSampler(
                    sample_count=n, shuffle=True, seed=cfg.seed, advance=advance
                )
            )
        self._iter = start_iter
        self._q: queue.Queue = queue.Queue(maxsize=2)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _make_batch(self, it: int) -> dict:
        from omgsr_tpu.data.ssl import collate_ssl_batch

        # seeded per-iteration: a resumed run replays the identical stream
        rng = np.random.default_rng((self.cfg.seed, it))
        samples = []
        for _ in range(self.batch):
            item = self.files[next(self.sampler)]
            if isinstance(item, str):  # path; datasets yield PIL directly
                with self._Image.open(item) as im:
                    samples.append(self.aug(rng, im.convert("RGB")))
            else:
                samples.append(self.aug(rng, item.convert("RGB")))
        return collate_ssl_batch(
            samples,
            rng,
            self.mask_gen,
            mask_ratio_tuple=tuple(self.cfg.mask_ratio_min_max),
            mask_probability=self.cfg.mask_probability,
        )

    def _worker(self):
        it = self._iter
        while not self._stop.is_set():
            try:
                batch = self._make_batch(it)
            except Exception as e:  # surface in the main thread
                self._q.put(e)
                return
            self._q.put(batch)
            it += 1

    def __next__(self) -> dict:
        out = self._q.get()
        if isinstance(out, Exception):
            raise out
        return out

    def close(self):
        self._stop.set()
        while True:  # drain so the worker's put() unblocks
            try:
                self._q.get_nowait()
            except queue.Empty:
                break


def _num_devices() -> int:
    import jax

    return len(jax.devices())


def _resolve_vit(arch: str, overrides):
    from omgsr_tpu.models.configs import VIT_SIZES, DinoV3ViTConfig

    if arch in VIT_SIZES:
        base = VIT_SIZES[arch]
    elif arch == "custom":
        base = DinoV3ViTConfig()
    else:
        raise KeyError(f"unknown arch {arch!r} (choices: {sorted(VIT_SIZES)})")
    if overrides:  # field-level overrides, e.g. tiny test configs
        base = dataclasses.replace(base, **overrides)
    return base


def _vit_cfg(cfg: SSLPretrainConfig):
    return _resolve_vit(cfg.arch, cfg.extra.get("vit"))


def _teacher_vit_cfg(cfg: SSLPretrainConfig):
    return _resolve_vit(
        cfg.distillation_arch or cfg.arch, cfg.extra.get("teacher_vit")
    )


def _meta_cfg(cfg: SSLPretrainConfig):
    from omgsr_tpu.training.ssl_meta_arch import SSLMetaConfig

    return SSLMetaConfig(
        n_global_crops=2,
        n_local_crops=cfg.local_crops_number,
        dino_out_dim=cfg.dino_out_dim,
        dino_hidden_dim=cfg.dino_hidden_dim,
        dino_bottleneck_dim=cfg.dino_bottleneck_dim,
        dino_nlayers=cfg.dino_nlayers,
        ibot_separate_head=cfg.ibot_separate_head,
        ibot_out_dim=cfg.ibot_out_dim,
        ibot_hidden_dim=cfg.ibot_hidden_dim,
        ibot_bottleneck_dim=cfg.ibot_bottleneck_dim,
        ibot_nlayers=cfg.ibot_nlayers,
        dino_loss_weight=cfg.dino_loss_weight,
        koleo_loss_weight=cfg.koleo_loss_weight,
        ibot_loss_weight=cfg.ibot_loss_weight,
        centering=cfg.centering,
        gram_loss_weight=cfg.gram_loss_weight if cfg.gram_use_loss else 0.0,
        gram_img_level=cfg.gram_img_level,
        gram_remove_neg=cfg.gram_remove_neg,
        gram_tokens_used=cfg.gram_tokens_used,
        gram_ema_teacher=cfg.gram_ema_teacher,
    )


def run_knn_eval(
    backbone,
    vit_cfg,
    train_dir: str,
    val_dir: str,
    *,
    ks=(10, 20),
    batch_size: int = 32,
    resize_size: int = 256,
    crop_size: int = 224,
):
    """In-train k-NN probe over dir-per-class ImageFolder splits: EMA
    teacher CLS features (L2-normalized), temperature-weighted vote
    (eval/probes.knn_classify == the reference KnnModule). Returns
    {f"knn_top1_k{k}": acc}."""
    import jax
    import jax.numpy as jnp

    from omgsr_tpu.eval.probes import (
        extract_features,
        knn_classify,
        list_imagefolder,
        make_eval_transform,
    )
    from omgsr_tpu.models.dinov3_vit import dinov3_vit_apply

    # paths, not decoded images — extract_features opens lazily per batch
    tr_imgs, tr_labels, classes = list_imagefolder(train_dir)
    va_imgs, va_labels, _ = list_imagefolder(val_dir)

    # params as a jit ARG (captured-constant big trees break the
    # remote-compile transport; see CLAUDE.md)
    @jax.jit
    def feat_fn(p, x):
        cls = dinov3_vit_apply(p, vit_cfg, x)["x_norm_clstoken"].astype(jnp.float32)
        return cls / jnp.maximum(jnp.linalg.norm(cls, axis=-1, keepdims=True), 1e-12)

    transform = make_eval_transform(resize_size, crop_size)
    tr_f = extract_features(
        lambda x: feat_fn(backbone, x), tr_imgs, batch_size, transform
    )
    va_f = extract_features(
        lambda x: feat_fn(backbone, x), va_imgs, batch_size, transform
    )
    usable_ks = [k for k in ks if k <= len(tr_labels)] or [len(tr_labels)]
    probs = knn_classify(
        jnp.asarray(tr_f),
        jnp.asarray(tr_labels),
        jnp.asarray(va_f),
        ks=usable_ks,
        num_classes=len(classes),
    )
    return {
        f"knn_top1_k{k}": float(np.mean(np.asarray(jnp.argmax(p, -1)) == va_labels))
        for k, p in probs.items()
    }


def export_teacher_backbone(output_dir: str, iteration: int, teacher):
    """Standalone EMA-teacher backbone export — the artifact the eval
    suite consumes (the reference's teacher_checkpoint), loadable with
    training/checkpoint.restore_train_state against an init_dinov3_vit
    tree."""
    import orbax.checkpoint as ocp
    import jax

    path = os.path.join(
        os.path.abspath(output_dir), "eval", f"teacher-{iteration}", "backbone"
    )
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, teacher["backbone"]), force=True)
    ckptr.wait_until_finished()
    return path


def run_pretraining(cfg: SSLPretrainConfig):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omgsr_tpu.parallel import create_mesh
    from omgsr_tpu.training.checkpoint import (
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )
    from omgsr_tpu.training.ssl import (
        last_layer_mask,
        make_ssl_optimizer,
        ssl_param_groups,
    )
    from omgsr_tpu.training.ssl_meta_arch import (
        init_center_state,
        init_distill_ema,
        init_ssl_student,
        make_distill_train_step,
        make_ssl_train_step,
    )
    from omgsr_tpu.models.dinov3_vit import init_dinov3_vit
    from omgsr_tpu.utils.observability import MetricLogger
    from omgsr_tpu.utils.dtypes import resolve_dtype

    os.makedirs(cfg.output_dir, exist_ok=True)
    import yaml

    with open(os.path.join(cfg.output_dir, "cfg.yml"), "w") as f:
        d = dataclasses.asdict(cfg)
        d.update(d.pop("extra", {}))
        yaml.safe_dump(d, f, sort_keys=False)

    vit_cfg = _vit_cfg(cfg)
    meta_cfg = _meta_cfg(cfg)
    n_dev = _num_devices()
    global_batch = cfg.batch_size_per_device * n_dev
    total_iters = cfg.epochs * cfg.official_epoch_length
    sched = build_ssl_schedulers(cfg, global_batch)
    dtype = resolve_dtype(cfg.mixed_precision)

    # init (SSLMetaArch.init_weights: teacher starts as a student copy; under
    # distillation the teacher slot carries the student-EMA and a separate
    # frozen pretrained model provides the targets, ssl_meta_arch.py:131-141)
    key = jax.random.key(cfg.seed)
    student = init_ssl_student(key, vit_cfg, meta_cfg, init_dinov3_vit)
    if cfg.student_init_checkpoint:
        from omgsr_tpu.convert import port_dinov3_vit

        student["backbone"] = port_dinov3_vit(cfg.student_init_checkpoint, cfg=vit_cfg)
        logger.info("student backbone initialized from %s", cfg.student_init_checkpoint)
    use_gram_teacher = cfg.gram_use_loss and not cfg.gram_ema_teacher
    if use_gram_teacher and cfg.distillation_enabled:
        raise NotImplementedError(
            "frozen gram teacher + distillation in one run is not wired; "
            "use gram_ema_teacher=true under distillation"
        )
    frozen_teacher = None
    if cfg.distillation_enabled:
        t_vit_cfg = _teacher_vit_cfg(cfg)
        frozen_teacher = init_ssl_student(
            jax.random.fold_in(key, 1), t_vit_cfg, meta_cfg, init_dinov3_vit
        )
        if cfg.distillation_checkpoint:
            from omgsr_tpu.convert import port_dinov3_vit

            frozen_teacher["backbone"] = port_dinov3_vit(
                cfg.distillation_checkpoint, cfg=t_vit_cfg
            )
        teacher = init_distill_ema(student)
    else:
        teacher = jax.tree.map(jnp.copy, student)
    lr_t, wd_t = ssl_param_groups(
        student,
        lr_decay_rate=cfg.layerwise_decay,
        num_layers=vit_cfg.depth,
        patch_embed_lr_mult=cfg.patch_embed_lr_mult,
        dino_head_wd_multiplier=cfg.dino_head_wd_multiplier,
    )
    tx = make_ssl_optimizer(
        lr_t,
        wd_t,
        b1=cfg.adamw_beta1,
        b2=cfg.adamw_beta2,
        clip_norm=cfg.clip_grad,
        last_layer_mask_tree=last_layer_mask(student),
    )
    opt_state = tx.init(student)
    centers = init_center_state(meta_cfg)

    # frozen gram teacher (gram.ema_teacher=false): ported hub backbone, or
    # the initial EMA teacher's as a from-scratch fallback (the reference
    # demands a ckpt, ssl_meta_arch.py:316-323 — warn accordingly)
    gram_backbone = None
    num_gram_updates = 0
    if use_gram_teacher:
        if cfg.gram_ckpt:
            from omgsr_tpu.convert import port_dinov3_vit

            gram_backbone = port_dinov3_vit(cfg.gram_ckpt, cfg=vit_cfg)
        else:
            logger.warning(
                "gram teacher without gram_ckpt — anchoring on the "
                "randomly-initialized backbone until the first EMA update"
            )
            gram_backbone = jax.tree.map(jnp.copy, teacher["backbone"])

    start_iter = 0
    state = {
        "student": student,
        "teacher": teacher,
        "opt": opt_state,
        "centers": centers,
        "step": np.asarray(0, np.int64),
    }
    if gram_backbone is not None:
        state["gram"] = gram_backbone
    if cfg.resume:
        path = latest_checkpoint(cfg.output_dir)
        if path:
            state = restore_train_state(path, state)
            start_iter = int(state["step"]) + 1
            logger.info("resumed from %s at iteration %d", path, start_iter)
    student, teacher = state["student"], state["teacher"]
    opt_state, centers = state["opt"], state["centers"]
    gram_backbone = state.get("gram", gram_backbone)
    if (
        use_gram_teacher
        and cfg.gram_rep_update
        and start_iter > 0
        and start_iter >= cfg.gram_it_first_update
    ):
        # replayed update count (train.py:441-452 resume bookkeeping)
        num_gram_updates = math.ceil(
            (start_iter + 1 - cfg.gram_it_first_update) / cfg.gram_update_frequency
        )

    mesh = create_mesh({"data": n_dev}) if n_dev > 1 else None
    if cfg.distillation_enabled:
        distill_step = jax.jit(
            make_distill_train_step(
                tx, cfg=meta_cfg, vit_cfg=vit_cfg, teacher_vit_cfg=_teacher_vit_cfg(cfg)
            ),
            donate_argnums=(0, 2, 3, 4),  # frozen teacher (1) is reused
        )

        def step(student, teacher, opt_state, centers, batch, **kw):
            return distill_step(
                student, frozen_teacher, teacher, opt_state, centers, batch, **kw
            )

    elif use_gram_teacher:
        from omgsr_tpu.training.ssl_meta_arch import make_gram_ssl_train_step

        gram_step = jax.jit(
            make_gram_ssl_train_step(
                tx, cfg=meta_cfg, vit_cfg=vit_cfg, resize_method=cfg.gram_resize_method
            ),
            donate_argnums=(0, 1, 3, 4),  # gram backbone (2) is reused
        )

        def step(student, teacher, opt_state, centers, batch, **kw):
            return gram_step(
                student, teacher, gram_backbone, opt_state, centers, batch, **kw
            )

    else:
        step = jax.jit(
            make_ssl_train_step(tx, cfg=meta_cfg, vit_cfg=vit_cfg),
            donate_argnums=(0, 1, 2, 3),
        )
    if mesh is not None:
        batch_shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        student, teacher, opt_state, centers = jax.device_put(
            (student, teacher, opt_state, centers), repl
        )
        if frozen_teacher is not None:
            frozen_teacher = jax.device_put(frozen_teacher, repl)
        if gram_backbone is not None:
            gram_backbone = jax.device_put(gram_backbone, repl)

    # multi-resolution loaders (train.py:334-380): one SSLLoader per crop
    # resolution, iteration-deterministic ratio sampling (reproducible on
    # resume by replaying the choice stream and advancing each loader by
    # its consumed count)
    sizes_g = (
        list(cfg.global_crops_size)
        if isinstance(cfg.global_crops_size, (list, tuple))
        else [cfg.global_crops_size]
    )
    sizes_l = (
        list(cfg.local_crops_size)
        if isinstance(cfg.local_crops_size, (list, tuple))
        else [cfg.local_crops_size] * len(sizes_g)
    )
    sizes_gt = (
        list(cfg.gram_teacher_crops_size)
        if isinstance(cfg.gram_teacher_crops_size, (list, tuple))
        else [cfg.gram_teacher_crops_size] * len(sizes_g)
    )
    ratios = cfg.global_local_crop_pairs_ratios
    ratios = (
        list(ratios) if isinstance(ratios, (list, tuple)) else [ratios] * len(sizes_g)
    )
    if not len(sizes_g) == len(sizes_l) == len(sizes_gt) == len(ratios):
        raise ValueError("crop size / ratio lists must have equal lengths")
    probs = np.asarray(ratios, np.float64)
    probs = probs / probs.sum()

    def _pick(i: int) -> int:
        if len(probs) == 1:
            return 0
        return int(np.random.default_rng((cfg.seed, 7919, i)).choice(len(probs), p=probs))

    consumed = [0] * len(probs)
    for i in range(start_iter):
        consumed[_pick(i)] += 1
    loaders = []
    for inc, (g, l, gt) in enumerate(zip(sizes_g, sizes_l, sizes_gt)):
        cfg_i = dataclasses.replace(
            cfg,
            global_crops_size=g,
            local_crops_size=l,
            gram_teacher_crops_size=gt,
            seed=cfg.seed + (inc + 1 if len(probs) > 1 else 0),
        )
        loaders.append(SSLLoader(cfg_i, start_iter=consumed[inc]))
    mlog = MetricLogger()
    t0 = time.time()
    it = start_iter - 1  # loop may be empty on resume-at-end
    try:
        for it in range(start_iter, total_iters):
            if use_gram_teacher and it == cfg.gram_it_load_ema_teacher:
                # load the EMA teacher into the gram teacher (train.py:473-475)
                logger.info("loading EMA teacher into gram teacher at it %d", it)
                gram_backbone = jax.tree.map(jnp.copy, teacher["backbone"])
            batch_np = next(loaders[_pick(it)])
            batch = {
                k: jnp.asarray(
                    v, dtype if np.issubdtype(np.asarray(v).dtype, np.floating) else None
                )
                for k, v in batch_np.items()
            }
            if mesh is not None:
                batch = {
                    k: jax.device_put(v, batch_shard) if np.ndim(v) > 0 else v
                    for k, v in batch.items()
                }
            student, teacher, opt_state, centers, metrics = step(
                student,
                teacher,
                opt_state,
                centers,
                batch,
                lr=sched["lr"][it],
                wd=sched["wd"][it],
                teacher_temp=sched["teacher_temp"][it],
                momentum=sched["momentum"][it],
                last_layer_lr=sched["last_layer_lr"][it],
                **(
                    {"gram_weight": sched["gram_weight"][it]}
                    if sched["gram_weight"] is not None
                    else {}
                ),
                **(
                    {"local_loss_weight": sched["local_loss_weight"][it]}
                    if sched["local_loss_weight"] is not None
                    else {}
                ),
            )
            if (
                use_gram_teacher
                and cfg.gram_rep_update
                and (it + 1) >= cfg.gram_it_first_update
                and (it + 1) % cfg.gram_update_frequency == 0
                and (cfg.gram_max_updates is None or num_gram_updates < cfg.gram_max_updates)
            ):
                # periodic gram-teacher refresh from the EMA (train.py:534-545)
                logger.info("updating gram teacher from EMA after it %d", it)
                gram_backbone = jax.tree.map(jnp.copy, teacher["backbone"])
                num_gram_updates += 1
            if (it + 1) % cfg.print_freq == 0 or it + 1 == total_iters:
                host = {k: float(v) for k, v in metrics.items()}
                if not math.isfinite(host["total_loss"]):
                    raise FloatingPointError(
                        f"non-finite total_loss at iteration {it}: {host}"
                    )
                mlog.update(**host)
                logger.info(
                    "it %d/%d | %s | lr=%.2e | %.3f s/it",
                    it + 1, total_iters, mlog, sched["lr"][it],
                    (time.time() - t0) / max(it + 1 - start_iter, 1),
                )
            if (
                cfg.eval_period_iterations > 0
                and cfg.eval_knn_train_dir
                and ((it + 1) % cfg.eval_period_iterations == 0 or it + 1 == total_iters)
            ):
                accs = run_knn_eval(
                    teacher["backbone"],
                    vit_cfg,
                    cfg.eval_knn_train_dir,
                    cfg.eval_knn_val_dir or cfg.eval_knn_train_dir,
                    resize_size=cfg.eval_resize_size,
                    crop_size=cfg.eval_crop_size,
                )
                logger.info(
                    "eval it %d | %s", it + 1,
                    " ".join(f"{k}={v:.4f}" for k, v in accs.items()),
                )
                eval_dir = os.path.join(cfg.output_dir, "eval")
                os.makedirs(eval_dir, exist_ok=True)
                import json

                with open(os.path.join(eval_dir, f"knn-{it}.json"), "w") as f:
                    json.dump(accs, f)
            if (it + 1) % cfg.saveckp_freq == 0 or it + 1 == total_iters:
                state = {
                    "student": student,
                    "teacher": teacher,
                    "opt": opt_state,
                    "centers": centers,
                    "step": np.asarray(it, np.int64),
                }
                if gram_backbone is not None:
                    state["gram"] = gram_backbone
                save_train_state(cfg.output_dir, state, it)
                export_teacher_backbone(cfg.output_dir, it, teacher)
    finally:
        for ld in loaders:
            ld.close()
    logger.info("pretraining done at iteration %d", it + 1)
    return {"student": student, "teacher": teacher, "opt": opt_state, "centers": centers}


def main(argv=None):
    parser = argparse.ArgumentParser("DINOv3 SSL pretraining")
    parser.add_argument("--config", type=str, default=None, help="yaml config path")
    parser.add_argument("overrides", nargs="*", help="key=value config overrides")
    args = parser.parse_args(argv)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s"
    )
    from omgsr_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_ssl_config(args.config, args.overrides)
    run_pretraining(cfg)


if __name__ == "__main__":
    main()
