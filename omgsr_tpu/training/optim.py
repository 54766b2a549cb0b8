"""Optimizers & LR schedules matching the reference's training recipe.

AdamW(lr 5e-5, betas (0.9, 0.999), weight decay 1e-4, eps 1e-8) with
clip-by-global-norm 1.0 and a constant-with-warmup schedule (500 steps),
grad accumulation 4 (configs/omgsr_s_512.yml:25-42,
train/train_omgsr_s.py:294-343, :469-475). Two independent chains: generator
(LoRA params) and discriminator heads.
"""

from __future__ import annotations

import optax

from omgsr_tpu.config import TrainConfig


def lr_schedule(cfg: TrainConfig):
    if cfg.lr_scheduler == "constant":
        if cfg.lr_warmup_steps > 0:
            return optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps)
        return optax.constant_schedule(cfg.learning_rate)
    if cfg.lr_scheduler == "cosine":
        return optax.warmup_cosine_decay_schedule(
            0.0, cfg.learning_rate, cfg.lr_warmup_steps, cfg.max_train_steps or 10000
        )
    if cfg.lr_scheduler == "linear":
        warm = optax.linear_schedule(0.0, cfg.learning_rate, cfg.lr_warmup_steps)
        decay = optax.linear_schedule(
            cfg.learning_rate, 0.0, (cfg.max_train_steps or 10000) - cfg.lr_warmup_steps
        )
        return optax.join_schedules([warm, decay], [cfg.lr_warmup_steps])
    raise ValueError(f"unsupported lr_scheduler: {cfg.lr_scheduler}")


def make_optimizer(cfg: TrainConfig, accumulate: bool = True):
    tx = optax.chain(
        optax.clip_by_global_norm(cfg.max_grad_norm),
        optax.adamw(
            learning_rate=lr_schedule(cfg),
            b1=cfg.adam_beta1,
            b2=cfg.adam_beta2,
            eps=cfg.adam_epsilon,
            weight_decay=cfg.adam_weight_decay,
        ),
    )
    if accumulate and cfg.gradient_accumulation_steps > 1:
        tx = optax.MultiSteps(tx, cfg.gradient_accumulation_steps)
    return tx
