"""DINOv3 SSL meta-architecture: the full pretraining step as one pure,
jittable function.

Re-owns dinov3/train/ssl_meta_arch.py (SSLMetaArch.forward_backward
:349-424, get_teacher_output :426-468, get_student_output :524-576,
compute_losses :578-678) the TPU way:

- ONE compiled graph per step: teacher forward (stop-gradient), student
  forward (global crops with iBOT masks + local crops), both heads, all
  four objectives, grads, optimizer, EMA — no graph breaks, no host sync.
- STATIC shapes throughout. The reference gathers masked patches with
  `index_select(mask_indices_list)` (dynamic length, :455-462); here the
  iBOT head runs on every patch token and the masked Sinkhorn / masked CE
  consume the (B, N) boolean mask directly (losses/ssl.py). A few extra
  head-MLP FLOPs buy a single XLA program with no retraces.
- State is threaded, never mutated: (student, teacher, opt_state,
  centers) in -> out. The EMA update and the center EMA are part of the
  same jitted step (ssl_meta_arch.py:707-720 does EMA in a separate
  foreach pass).
- Parallelism: run the step under pjit with the batch sharded over a
  `data` mesh axis — every batch statistic (Sinkhorn normalizers, center
  EMA, loss means) is a jnp reduction, so XLA inserts the psums the torch
  version issues by hand (async all_reduce in dino_clstoken_loss.py /
  ibot_patch_loss.py). Under pjit, KoLeo's nearest-neighbor search sees
  the GLOBAL batch — stronger than the reference's per-rank local KoLeo
  (koleo_loss_distributed: false); per-rank semantics are available via
  shard_map with the same code.

Defaults mirror dinov3/configs/ssl_default_config.yaml (dino/ibot/gram/
teacher sections).
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from omgsr_tpu.losses.ssl import (
    dino_loss,
    dino_softmax_center_teacher,
    dino_update_center,
    gram_loss,
    ibot_patch_loss,
    ibot_softmax_center_teacher,
    ibot_update_center,
    koleo_loss,
    masked_gram_loss,
    sinkhorn_knopp,
)
from omgsr_tpu.models.dinov3_vit import dinov3_vit_apply
from omgsr_tpu.training.ssl import dino_head_apply, ema_update, init_dino_head


@dataclasses.dataclass(frozen=True)
class SSLMetaConfig:
    """Loss/head knobs (ssl_default_config.yaml dino/ibot/gram/teacher)."""

    n_global_crops: int = 2
    n_local_crops: int = 8
    # dino head (yaml dino.head_*)
    dino_out_dim: int = 65536
    dino_hidden_dim: int = 2048
    dino_bottleneck_dim: int = 256
    dino_nlayers: int = 3
    # ibot head (yaml ibot.separate_head=true + ibot.head_*)
    ibot_separate_head: bool = True
    ibot_out_dim: int = 65536
    ibot_hidden_dim: int = 2048
    ibot_bottleneck_dim: int = 256
    ibot_nlayers: int = 3
    # loss weights (yaml dino.loss_weight / koleo_loss_weight, ibot.loss_weight)
    dino_loss_weight: float = 1.0
    koleo_loss_weight: float = 0.1
    ibot_loss_weight: float = 1.0
    dino_global_ignore_diagonal: bool = True
    student_temp: float = 0.1
    # centering: the vendored meta-arch asserts "sinkhorn_knopp"
    # (ssl_meta_arch.py:41); "softmax" kept for DINOv2-style runs
    centering: str = "sinkhorn_knopp"
    center_momentum: float = 0.9
    sinkhorn_iterations: int = 3
    # gram anchoring (yaml gram.*)
    gram_loss_weight: float = 0.0
    gram_img_level: bool = False
    gram_remove_neg: bool = False
    gram_tokens_used: str = "all"  # all | masked | unmasked
    gram_ema_teacher: bool = False


def init_ssl_student(key, vit_cfg, cfg: SSLMetaConfig, init_backbone):
    """Student param tree {backbone, dino_head[, ibot_head]}; the teacher
    starts as a copy (SSLMetaArch.init_weights:296-347 copies student ->
    teacher before training)."""
    kb, kd, ki = jax.random.split(key, 3)
    params = {
        "backbone": init_backbone(kb, vit_cfg),
        "dino_head": init_dino_head(
            kd,
            vit_cfg.embed_dim,
            cfg.dino_out_dim,
            cfg.dino_hidden_dim,
            cfg.dino_bottleneck_dim,
            cfg.dino_nlayers,
        ),
    }
    if cfg.ibot_separate_head:
        params["ibot_head"] = init_dino_head(
            ki,
            vit_cfg.embed_dim,
            cfg.ibot_out_dim,
            cfg.ibot_hidden_dim,
            cfg.ibot_bottleneck_dim,
            cfg.ibot_nlayers,
        )
    return params


def init_center_state(cfg: SSLMetaConfig):
    """EMA centers for softmax centering; carried (as zeros) in sinkhorn
    mode too so the step's pytree structure is mode-independent."""
    return {
        "dino": jnp.zeros((cfg.dino_out_dim,), jnp.float32),
        "ibot": jnp.zeros(
            (cfg.ibot_out_dim if cfg.ibot_separate_head else cfg.dino_out_dim,),
            jnp.float32,
        ),
    }


def _ibot_head_apply(params, cfg: SSLMetaConfig, x):
    head = params["ibot_head"] if cfg.ibot_separate_head else params["dino_head"]
    return dino_head_apply(head, x)


def init_distill_ema(student):
    """The separate student-EMA kept under distillation (ssl_meta_arch.py
    :131 `model_ema` is the teacher ONLY in self-distillation; with
    distillation.enabled a frozen pretrained teacher takes that slot and
    the EMA becomes its own copy of the student, :134-141)."""
    return jax.tree.map(jnp.copy, student)


def _teacher_targets(teacher, vit_cfg, cfg, crops, masks, teacher_temp, centers, axis_name):
    """get_teacher_output (:426-468): backbone -> heads -> centered
    targets. Returns (cls_probs (G*B, K), patch_probs (G*B, N, K),
    patch_pre_head, new_centers); everything stop-gradiented."""
    out = dinov3_vit_apply(teacher["backbone"], vit_cfg, crops)
    cls = out["x_norm_clstoken"]  # (G*B, D)
    patch = out["x_norm_patchtokens"]  # (G*B, N, D)
    cls_logits = dino_head_apply(teacher["dino_head"], cls)
    patch_logits = _ibot_head_apply(teacher, cfg, patch)
    new_centers = centers
    if cfg.centering == "sinkhorn_knopp":
        cls_probs = sinkhorn_knopp(
            cls_logits,
            teacher_temp,
            n_iterations=cfg.sinkhorn_iterations,
            axis_name=axis_name,
        )
        flat_logits = patch_logits.reshape(-1, patch_logits.shape[-1])
        patch_probs = sinkhorn_knopp(
            flat_logits,
            teacher_temp,
            n_iterations=cfg.sinkhorn_iterations,
            axis_name=axis_name,
            sample_mask=masks.reshape(-1),
        ).reshape(patch_logits.shape)
    elif cfg.centering == "softmax":
        cls_probs = dino_softmax_center_teacher(
            cls_logits, centers["dino"], teacher_temp
        )
        patch_probs = ibot_softmax_center_teacher(
            patch_logits, centers["ibot"], teacher_temp
        )
        new_centers = {
            "dino": dino_update_center(
                centers["dino"], cls_logits, cfg.center_momentum, axis_name
            ).reshape(-1),
            "ibot": ibot_update_center(
                centers["ibot"], patch_logits, cfg.center_momentum, axis_name
            ).reshape(-1),
        }
    else:
        raise ValueError(f"unknown centering {cfg.centering!r}")
    stop = jax.lax.stop_gradient
    return stop(cls_probs), stop(patch_probs), stop(patch), new_centers


def ssl_losses(
    student,
    teacher,
    batch,
    centers,
    *,
    cfg: SSLMetaConfig,
    vit_cfg,
    teacher_temp,
    local_loss_weight=1.0,
    gram_teacher_patches=None,
    gram_weight=None,
    teacher_vit_cfg=None,
    distillation=False,
    axis_name=None,
):
    """forward + compute_losses (:349-678) as a pure function.

    batch: dict from data/ssl.collate_ssl_batch — global_crops
    (G*B, S, S, 3), local_crops (L*B, s, s, 3), masks (G*B, N) bool,
    optional global_crops_teacher / gram_teacher_crops.
    gram_teacher_patches: precomputed (G*B, N, D) features from a frozen
    gram teacher (gram.ema_teacher=false path); when None and
    gram_loss_weight > 0, the EMA teacher's patch features anchor instead.

    Distillation (ssl_meta_arch.py:134-141, :263-294, :533): `teacher` is a
    frozen pretrained model, possibly a larger arch (`teacher_vit_cfg`;
    same patch size and head out-dims required), and the student's global
    forward skips the mask-token swap — the iBOT CE still reads the masked
    positions, so the student predicts the teacher's tokens from CLEAN
    pixels.

    Returns (total_loss, aux) with aux = {metrics, new_centers}.
    """
    g, l = cfg.n_global_crops, cfg.n_local_crops
    global_crops = batch["global_crops"]
    local_crops = batch["local_crops"]
    masks = batch["masks"]
    b = global_crops.shape[0] // g

    t_vit_cfg = vit_cfg if teacher_vit_cfg is None else teacher_vit_cfg
    if t_vit_cfg.patch_size != vit_cfg.patch_size:
        raise ValueError("distillation requires matching patch sizes (:273)")
    teacher_crops = batch.get("global_crops_teacher", global_crops)
    t_cls_probs, t_patch_probs, t_patch_pre_head, new_centers = _teacher_targets(
        teacher, t_vit_cfg, cfg, teacher_crops, masks, teacher_temp, centers, axis_name
    )

    # student forward: global crops see the iBOT masks (mask-token swap),
    # local crops don't (get_student_output:531-537); under distillation the
    # student sees clean pixels (masks=None, :533)
    s_global = dinov3_vit_apply(
        student["backbone"], vit_cfg, global_crops, None if distillation else masks
    )
    s_local = dinov3_vit_apply(student["backbone"], vit_cfg, local_crops)
    s_g_cls = s_global["x_norm_clstoken"]  # (G*B, D)
    s_g_patch = s_global["x_norm_patchtokens"]  # (G*B, N, K)
    s_g_cls_logits = dino_head_apply(student["dino_head"], s_g_cls)
    s_l_cls_logits = dino_head_apply(student["dino_head"], s_local["x_norm_clstoken"])
    s_patch_logits = _ibot_head_apply(student, cfg, s_g_patch)

    # loss scales (compute_losses:589-599, DINOv2 convention)
    g_terms = g * (g - 1) if cfg.dino_global_ignore_diagonal else g * g
    l_terms = g * l
    g_scale = g_terms / (g_terms + l_terms)
    l_scale = l_terms / (g_terms + l_terms)

    t_probs_crops = t_cls_probs.reshape(g, b, -1)
    dino_local = dino_loss(
        s_l_cls_logits.reshape(l, b, -1), t_probs_crops, cfg.student_temp
    )
    dino_global = dino_loss(
        s_g_cls_logits.reshape(g, b, -1),
        t_probs_crops,
        cfg.student_temp,
        ignore_diagonal=cfg.dino_global_ignore_diagonal,
    )
    koleo = (
        sum(koleo_loss(s_g_cls.reshape(g, b, -1)[i]) for i in range(g)) / g
    )
    ibot = ibot_patch_loss(s_patch_logits, t_patch_probs, masks, cfg.student_temp)

    total = (
        cfg.dino_loss_weight * (l_scale * local_loss_weight * dino_local + g_scale * dino_global)
        + cfg.koleo_loss_weight * g * koleo
        + cfg.ibot_loss_weight * ibot
    )
    metrics = {
        "dino_local_crops_loss": dino_local,
        "dino_global_crops_loss": dino_global,
        "koleo_loss": koleo,
        "ibot_loss": ibot,
    }

    if cfg.gram_loss_weight > 0.0:
        anchor = (
            t_patch_pre_head if gram_teacher_patches is None else gram_teacher_patches
        )
        anchor = jax.lax.stop_gradient(anchor)
        if cfg.gram_tokens_used == "all":
            gram = gram_loss(
                s_g_patch,
                anchor,
                img_level=cfg.gram_img_level,
                remove_neg=cfg.gram_remove_neg,
            )
        else:
            sel = masks if cfg.gram_tokens_used == "masked" else ~masks
            gram = masked_gram_loss(
                s_g_patch, anchor, sel, remove_neg=cfg.gram_remove_neg
            )
        # the loss_weight_schedule path (ssl_meta_arch.py:186-201) threads
        # the tabulated weight in as a scalar; None -> the static config
        w = cfg.gram_loss_weight if gram_weight is None else gram_weight
        total = total + w * gram
        metrics["gram_loss"] = gram

    metrics["total_loss"] = total
    return total, {"metrics": metrics, "centers": new_centers}


def resize_gram_teacher_patches(patches, src_hw, dst_hw, method="bicubic"):
    """Downsample a frozen gram teacher's patch grid to the student's
    (get_gram_teacher_output:493-508). (B, src_h*src_w, D) ->
    (B, dst_h*dst_w, D) via spatial resize. jax.image.resize half-pixel
    sampling == torch interpolate(align_corners=False); torch bicubic uses
    a=-0.75 vs jax cubic a=-0.5 — sub-1e-2 relative on smooth feature
    maps, documented deviation."""
    bsz, n, d = patches.shape
    sh, sw = src_hw
    dh, dw = dst_hw
    assert n == sh * sw
    grid = patches.reshape(bsz, sh, sw, d)
    out = jax.image.resize(grid, (bsz, dh, dw, d), method=method)
    return out.reshape(bsz, dh * dw, d)


def make_ssl_train_step(tx, *, cfg: SSLMetaConfig, vit_cfg, axis_name=None):
    """One SSL pretraining step: losses -> student grads -> optimizer ->
    EMA teacher -> center EMA, all in one jittable function.

    `tx` is the optax transformation from training/ssl.make_ssl_optimizer
    (inject_hyperparams): lr and wd cross the jit boundary as state
    leaves, the schedule scalars (teacher_temp, momentum, lr, wd,
    local_loss_weight) as arguments — the host reads them from the
    tabulated schedules each iteration (train/train.py:418-440) with no
    retrace."""

    def step(student, teacher, opt_state, centers, batch, *, lr, wd, teacher_temp, momentum, local_loss_weight=1.0, last_layer_lr=None, gram_teacher_patches=None, gram_weight=None):
        def loss_fn(p):
            return ssl_losses(
                p,
                teacher,
                batch,
                centers,
                cfg=cfg,
                vit_cfg=vit_cfg,
                teacher_temp=teacher_temp,
                local_loss_weight=local_loss_weight,
                gram_teacher_patches=gram_teacher_patches,
                gram_weight=gram_weight,
                axis_name=axis_name,
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(student)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        opt_state.hyperparams["weight_decay"] = jnp.asarray(wd, jnp.float32)
        if "last_layer_lr" in opt_state.hyperparams:
            opt_state.hyperparams["last_layer_lr"] = jnp.asarray(
                lr if last_layer_lr is None else last_layer_lr, jnp.float32
            )
        updates, opt_state = tx.update(grads, opt_state, student)
        student = jax.tree.map(lambda p, u: p + u, student, updates)
        teacher = ema_update(teacher, student, momentum)
        return student, teacher, opt_state, aux["centers"], aux["metrics"]

    return step


def make_gram_ssl_train_step(tx, *, cfg: SSLMetaConfig, vit_cfg, resize_method="bicubic", axis_name=None):
    """SSL step with a FROZEN gram-teacher backbone folded into the same
    compiled graph (get_gram_teacher_output:470-523, gram.ema_teacher=false):
    its patch features anchor the student's Gram matrices; when the gram
    crops are larger than the student's, the patch grid is resized down
    (:488-503). The host swaps the gram params from the EMA teacher on the
    reference's update schedule (train.py:534-545) — a pure data swap, no
    retrace. The optional gram loss_weight_schedule is not tabulated here;
    the weight is static in SSLMetaConfig (schedule support would thread it
    as one more scalar argument)."""
    base = make_ssl_train_step(tx, cfg=cfg, vit_cfg=vit_cfg, axis_name=axis_name)

    def step(student, teacher, gram_backbone, opt_state, centers, batch, **kw):
        crops = batch.get("gram_teacher_crops", batch["global_crops"])
        patches = dinov3_vit_apply(gram_backbone, vit_cfg, crops)["x_norm_patchtokens"]
        n_t, n_s = patches.shape[1], (
            batch["global_crops"].shape[1] // vit_cfg.patch_size
        ) * (batch["global_crops"].shape[2] // vit_cfg.patch_size)
        if n_t != n_s:
            src = int(round(n_t**0.5))
            dst = int(round(n_s**0.5))
            patches = resize_gram_teacher_patches(
                patches, (src, src), (dst, dst), method=resize_method
            )
        return base(
            student, teacher, opt_state, centers, batch,
            gram_teacher_patches=patches, **kw,
        )

    return step


def make_distill_train_step(tx, *, cfg: SSLMetaConfig, vit_cfg, teacher_vit_cfg=None, axis_name=None):
    """One distillation step (distillation.enabled=true): the frozen
    pretrained teacher provides the targets and never moves; the EMA tracks
    the STUDENT into `model_ema` (the eval artifact, ssl_meta_arch.py
    :131-141). Same losses, optimizer and schedule plumbing as the SSL
    step; the student's global forward skips the mask-token swap (:533)."""

    def step(student, teacher, model_ema, opt_state, centers, batch, *, lr, wd, teacher_temp, momentum, local_loss_weight=1.0, last_layer_lr=None, gram_weight=None):
        def loss_fn(p):
            return ssl_losses(
                p,
                teacher,
                batch,
                centers,
                cfg=cfg,
                vit_cfg=vit_cfg,
                teacher_vit_cfg=teacher_vit_cfg,
                teacher_temp=teacher_temp,
                local_loss_weight=local_loss_weight,
                gram_weight=gram_weight,
                distillation=True,
                axis_name=axis_name,
            )

        (_, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(student)
        if axis_name is not None:
            grads = jax.lax.pmean(grads, axis_name)
        opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
        opt_state.hyperparams["weight_decay"] = jnp.asarray(wd, jnp.float32)
        if "last_layer_lr" in opt_state.hyperparams:
            opt_state.hyperparams["last_layer_lr"] = jnp.asarray(
                lr if last_layer_lr is None else last_layer_lr, jnp.float32
            )
        updates, opt_state = tx.update(grads, opt_state, student)
        student = jax.tree.map(lambda p, u: p + u, student, updates)
        model_ema = ema_update(model_ema, student, momentum)
        return student, model_ema, opt_state, aux["centers"], aux["metrics"]

    return step
