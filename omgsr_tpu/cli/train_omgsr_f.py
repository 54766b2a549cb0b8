"""OMGSR-F training CLI.

    python -m omgsr_tpu.cli.train_omgsr_f --config omgsr_tpu/configs/omgsr_f_1024.yml [key=value ...]

Mirrors train/train_omgsr_f.py with the intended behavior at its two shipped
bugs (accelerate.device NameError :247, missing weight_dtype arg :540).
FLUX's 12B DiT is typically trained with gradient checkpointing (config) and
optionally FSDP-sharded params (mesh_shape: {data: N, fsdp: M}).
"""

from __future__ import annotations

import argparse
import logging
import os
import time

import jax
import jax.numpy as jnp

from omgsr_tpu.config import TrainConfig, load_config, save_config
from omgsr_tpu.cli.train_omgsr_s import append_metrics_jsonl, save_triptych

logger = logging.getLogger("omgsr_tpu.train_f")


def build_frozen_f(cfg: TrainConfig, dtype):
    from omgsr_tpu.convert import (
        port_diffusers_vae,
        port_dinov3_convnext,
        port_flux_transformer,
    )
    from omgsr_tpu.convert.hf_config import flux_config_from_json, vae_config_from_json
    from omgsr_tpu.losses.dists import init_dists
    from omgsr_tpu.models.configs import CONVNEXT_SIZES

    vae_dir = os.path.join(cfg.flux_path, "vae")
    flux_dir = os.path.join(cfg.flux_path, "transformer")
    vae_cfg = vae_config_from_json(vae_dir)
    flux_cfg = flux_config_from_json(flux_dir)
    vae_params = port_diffusers_vae(vae_dir, cfg=vae_cfg, dtype=dtype)
    if cfg.quantize_base in ("int8", "int4"):
        # 12B bf16 (23.8 GB) exceeds one chip: port on the host CPU backend,
        # stack + weight-only-quantize there, and place only the compressed
        # tree on device (int8 11.9 GB; int4 ~5.95 GB — the margin that fits
        # the full train step's ~20.3 GB int8 requirement into 15.75 GB);
        # LoRA trains in bf16 on top
        from omgsr_tpu.utils.quantize import quantize_flux_for_serving

        with jax.default_device(jax.devices("cpu")[0]):
            flux_params = port_flux_transformer(flux_dir, cfg=flux_cfg, dtype=dtype)
        flux_params = quantize_flux_for_serving(
            flux_params, bits=4 if cfg.quantize_base == "int4" else 8
        )
    else:
        flux_params = port_flux_transformer(flux_dir, cfg=flux_cfg, dtype=dtype)

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
        "flux": flux_params,
        "flux_cfg": flux_cfg,
        "backbone": backbone,
        "dists": init_dists(backbone, cn_cfg.dims),
    }, cn_cfg


def encode_fixed_prompt_f(cfg: TrainConfig, dtype):
    if cfg.fixed_prompt_path:
        from omgsr_tpu.cli.prompts import load_prompt_npz

        d = load_prompt_npz(cfg.fixed_prompt_path)
        return d["prompt_embeds"].astype(dtype), d["pooled_prompt_embeds"].astype(dtype)
    from omgsr_tpu.cli.prompts import encode_prompt_flux

    pe, pooled, _ = encode_prompt_flux(cfg.flux_path, cfg.fixed_prompt, dtype=dtype)
    return pe, pooled


def run_training(cfg: TrainConfig, frozen=None, loader=None, disc_bundle=None):
    import yaml

    from omgsr_tpu.data.degradation import RealESRGANDegrader
    from omgsr_tpu.data.dataset import PairedDataset, PairedLoader
    from omgsr_tpu.lora import FLUX_TARGET_MODULES, SD_TARGET_MODULES, init_lora_tree
    from omgsr_tpu.losses.discriminator import init_discriminator
    from omgsr_tpu.training.checkpoint import (
        export_adapters,
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )
    from omgsr_tpu.training.trainer import TrainerF
    from omgsr_tpu.utils.dtypes import resolve_dtype

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s")
    os.makedirs(cfg.output_dir, exist_ok=True)
    save_config(cfg, os.path.join(cfg.output_dir, "cfg.yml"))
    dtype = resolve_dtype(cfg.mixed_precision)

    if frozen is None:
        frozen, cn_cfg = build_frozen_f(cfg, dtype)
        pe, pooled = encode_fixed_prompt_f(cfg, dtype)
        frozen["prompt_embeds"] = pe
        frozen["pooled_prompt_embeds"] = pooled
        channels = cn_cfg.dims[:3]
    else:
        channels = cfg.extra["disc_channels"]

    key = jax.random.key(cfg.seed)
    k_vae, k_flux, k_disc, key = jax.random.split(key, 4)
    gen_lora = {
        "vae_encoder": init_lora_tree(
            k_vae, frozen["vae"]["encoder"], SD_TARGET_MODULES, cfg.vae_lora_rank
        ),
        "denoiser": init_lora_tree(
            k_flux, frozen["flux"], FLUX_TARGET_MODULES, cfg.flux_transformer_lora_rank
        ),
    }
    if disc_bundle is None:
        disc_bundle = init_discriminator(k_disc, channels, cfg.resolution)

    trainer = TrainerF(cfg, frozen, gen_lora, disc_bundle)

    # state["step"] counts MICRO-steps (lockstep with MultiSteps' mini_step);
    # the optimizer/global step is its floor division by the accumulation
    # factor. Resuming micro_step from the persisted count keeps the local
    # boundary check aligned with MultiSteps even mid-accumulation.
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
    # reference -F adapter names: train/train_omgsr_f.py:150,176
    adapter_names = {"vae_encoder": "vae_encoder_adapter", "denoiser": "flux_adapter"}
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


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", type=str, default="omgsr_tpu/configs/omgsr_f_1024.yml")
    parser.add_argument("overrides", nargs="*")
    args = parser.parse_args(argv)
    from omgsr_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(args.config, args.overrides)
    run_training(cfg)


if __name__ == "__main__":
    main()
