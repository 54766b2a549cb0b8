"""OMGSR-S training CLI.

    python -m omgsr_tpu.cli.train_omgsr_s --config omgsr_tpu/configs/omgsr_s_512.yml [key=value ...]

Mirrors train/train_omgsr_s.py's flow: config -> prompt pre-encode ->
frozen VAE + LoRA(VAE-encoder rank 16, UNet rank 32) -> DISTS + multi-level
discriminator -> G/D AdamW loop with grad accumulation -> periodic image
triptychs + adapter exports; plus full-state orbax resume (the reference's
resume is a TODO stub, train/train_omgsr_s.py:394-419).
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.config import TrainConfig, load_config, save_config

logger = logging.getLogger("omgsr_tpu.train")


def build_frozen_s(cfg: TrainConfig, dtype):
    """Load frozen model bundle for -S from cfg.sd_path."""
    from omgsr_tpu.convert import (
        port_diffusers_unet,
        port_diffusers_vae,
        port_dinov3_convnext,
    )
    from omgsr_tpu.convert.hf_config import unet_config_from_json, vae_config_from_json
    from omgsr_tpu.losses.dists import init_dists
    from omgsr_tpu.models.configs import CONVNEXT_SIZES

    vae_dir = os.path.join(cfg.sd_path, "vae")
    unet_dir = os.path.join(cfg.sd_path, "unet")
    vae_cfg = vae_config_from_json(vae_dir)
    unet_cfg = unet_config_from_json(unet_dir)
    vae_params = port_diffusers_vae(vae_dir, cfg=vae_cfg, dtype=dtype)
    unet_params = port_diffusers_unet(unet_dir, cfg=unet_cfg, dtype=dtype)

    cn_cfg = CONVNEXT_SIZES[cfg.dinov3_convnext_size]
    dinov3_path = cfg.extra.get("dinov3_weights_path")
    if dinov3_path:
        backbone = port_dinov3_convnext(dinov3_path, cfg=cn_cfg, dtype=dtype)
    else:
        logger.warning("no dinov3_weights_path set — using random ConvNeXt backbone")
        from omgsr_tpu.models.convnext import init_convnext

        backbone = init_convnext(jax.random.key(0), cn_cfg, dtype=dtype)

    return {
        "vae": vae_params,
        "vae_cfg": vae_cfg,
        "unet": unet_params,
        "unet_cfg": unet_cfg,
        "backbone": backbone,
        "dists": init_dists(backbone, cn_cfg.dims),
    }, cn_cfg


def encode_fixed_prompt(cfg: TrainConfig, dtype):
    if cfg.fixed_prompt_path:
        from omgsr_tpu.cli.prompts import load_prompt_npz

        return load_prompt_npz(cfg.fixed_prompt_path)["prompt_embeds"].astype(dtype)
    from omgsr_tpu.cli.prompts import encode_prompt_sd

    return encode_prompt_sd(cfg.sd_path, cfg.fixed_prompt, dtype)


def save_triptych(path, lq, pred, hq):
    """lq|pred|hq stacked vertically, like the reference's save_image grid
    (train/train_omgsr_s.py:494-502)."""
    from omgsr_tpu.utils.image_io import array01_to_pil

    rows = [np.asarray(x[0], np.float32) * 0.5 + 0.5 for x in (lq, pred, hq)]
    array01_to_pil(np.concatenate(rows, axis=0)).save(path)


def append_metrics_jsonl(path, global_step, metrics, s_per_step):
    """One JSON line per optimizer step (opt-in via cfg.extra
    metrics_jsonl=path). The soak harness (tools/soak_train.py) reads this
    to verify loss trajectories, GAN balance, and resume continuity."""
    import json

    rec = {"step": global_step, "s_per_step": round(s_per_step, 4), "time": time.time()}
    rec.update({k: float(v) for k, v in jax.device_get(metrics).items()})
    with open(path, "a") as f:
        f.write(json.dumps(rec) + "\n")


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="omgsr_tpu/configs/omgsr_s_512.yml")
    parser.add_argument("overrides", nargs="*", help="key=value config overrides")
    args = parser.parse_args(argv)
    from omgsr_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(args.config, args.overrides)
    run_training(cfg)


def run_training(cfg: TrainConfig, frozen=None, loader=None, disc_bundle=None, trainer=None):
    """Programmatic entry (also used by tests with tiny models).

    trainer: pass a pre-built TrainerS to reuse its compiled step across
    runs (tests resume against the same instance to avoid recompiles);
    its cfg must match the loop-relevant fields of ``cfg``
    (gradient_accumulation_steps in particular).
    """
    from omgsr_tpu.data.degradation import RealESRGANDegrader
    from omgsr_tpu.data.dataset import PairedDataset, PairedLoader
    from omgsr_tpu.lora import SD_TARGET_MODULES, init_lora_tree
    from omgsr_tpu.losses.discriminator import init_discriminator
    from omgsr_tpu.training.checkpoint import (
        export_adapters,
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )
    from omgsr_tpu.training.trainer import TrainerS
    from omgsr_tpu.utils.dtypes import resolve_dtype
    import yaml

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s")
    os.makedirs(cfg.output_dir, exist_ok=True)
    save_config(cfg, os.path.join(cfg.output_dir, "cfg.yml"))
    dtype = resolve_dtype(cfg.mixed_precision)

    key = jax.random.key(cfg.seed)
    k_vae, k_unet, k_disc, key = jax.random.split(key, 4)
    if trainer is None:
        if frozen is None:
            frozen, cn_cfg = build_frozen_s(cfg, dtype)
            frozen["prompt_embeds"] = encode_fixed_prompt(cfg, dtype)
            channels = cn_cfg.dims[:3]
        else:
            channels = cfg.extra["disc_channels"]

        gen_lora = {
            "vae_encoder": init_lora_tree(
                k_vae, frozen["vae"]["encoder"], SD_TARGET_MODULES, cfg.vae_lora_rank
            ),
            "denoiser": init_lora_tree(k_unet, frozen["unet"], SD_TARGET_MODULES, cfg.unet_lora_rank),
        }
        if disc_bundle is None:
            disc_bundle = init_discriminator(k_disc, channels, cfg.resolution)

        trainer = TrainerS(cfg, frozen, gen_lora, disc_bundle)

    # resume (full state — beyond the reference's unimplemented stub).
    # state["step"] counts MICRO-steps (one per train_step call, in lockstep
    # with MultiSteps' mini_step); the optimizer/global step is its floor
    # division by the accumulation factor. Resuming micro_step from the
    # persisted count keeps the local `micro_step % accum` boundary aligned
    # with MultiSteps' internal counter even mid-accumulation.
    start_step = 0
    micro_step = 0
    if cfg.resume_from_checkpoint:
        path = (
            latest_checkpoint(cfg.output_dir)
            if cfg.resume_from_checkpoint == "latest"
            else cfg.resume_from_checkpoint
        )
        if path:
            trainer.state = restore_train_state(path, trainer.state)
            micro_step = int(trainer.state["step"])
            start_step = micro_step // max(cfg.gradient_accumulation_steps, 1)
            logger.info(
                "resumed from %s at optimizer step %d (micro step %d)",
                path, start_step, micro_step,
            )

    if loader is None:
        with open(
            cfg.degradation_params or "omgsr_tpu/configs/params_realesrgan.yml"
        ) as f:
            opt = yaml.safe_load(f)
        degrader = RealESRGANDegrader(opt, resolution=cfg.resolution, seed=cfg.seed)
        dataset = PairedDataset(cfg.dataset_txt_or_dir_paths, cfg.resolution, seed=cfg.seed)
        loader = PairedLoader(dataset, cfg.train_batch_size, degrader, seed=cfg.seed)

    if cfg.max_train_steps is None:
        # reference fallback: epochs * ceil(len(loader)/accum)
        # (train/train_omgsr_s.py:319-325)
        import math as _math

        cfg.max_train_steps = cfg.num_train_epochs * _math.ceil(
            len(loader) / cfg.gradient_accumulation_steps
        )

    global_step = start_step
    t0 = time.time()
    metrics_jsonl = cfg.extra.get("metrics_jsonl")
    adapter_names = {"vae_encoder": "vae_encoder_lora_adapter", "denoiser": "unet_lora_adapter"}
    while global_step < (cfg.max_train_steps or 0):
        for batch in loader:
            key, k_step = jax.random.split(key)
            batch = {k: jnp.asarray(v, dtype) for k, v in batch.items()}
            metrics, pred = trainer.train_step(batch, k_step)
            micro_step += 1
            if micro_step % cfg.gradient_accumulation_steps == 0:
                global_step += 1
                if metrics_jsonl:
                    append_metrics_jsonl(
                        metrics_jsonl, global_step, metrics,
                        (time.time() - t0) / max(global_step - start_step, 1),
                    )
                if global_step % 10 == 0:
                    logger.info(
                        "step %d | %s | %.2f s/it",
                        global_step,
                        " ".join(f"{k}={float(v):.4f}" for k, v in metrics.items()),
                        (time.time() - t0) / max(global_step - start_step, 1),
                    )
                if global_step % cfg.save_img_steps == 0:
                    save_triptych(
                        os.path.join(cfg.output_dir, f"img-{global_step}.jpg"),
                        batch["lq"], pred, batch["hq"],
                    )
                if global_step % cfg.checkpointing_steps == 0:
                    save_train_state(cfg.output_dir, trainer.state, global_step)
                    export_adapters(
                        cfg.output_dir, global_step, trainer.state["gen"]["lora"], cfg, adapter_names
                    )
                if global_step >= (cfg.max_train_steps or 0):
                    break
        else:
            continue
        break

    save_train_state(cfg.output_dir, trainer.state, global_step)
    export_adapters(cfg.output_dir, global_step, trainer.state["gen"]["lora"], cfg, adapter_names)
    logger.info("training done at step %d", global_step)
    return trainer


if __name__ == "__main__":
    main()
