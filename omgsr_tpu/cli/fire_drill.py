"""Full-architecture fabricated-checkpoint fire drill — the real-weight-day
rehearsal, runnable today with zero mountable checkpoints.

One command exercises the ENTIRE real-weight chain at real architecture:

  1. FABRICATE a sharded HF-layout checkpoint dir on disk (full SD2.1
     VAE 83.654M + UNet 865.911M in f32, sharded at --max_shard_gb with a
     `*.safetensors.index.json`; or FLUX at full depth 19+38 with reduced
     width in bf16), plus LoRA adapters, a prompt .npz, and LQ/GT probe
     images;
  2. PORT + INFER: the production infer CLI (cli.infer_omgsr_s/_f) loads
     the dir through convert.porters (leaf-set validation on) and runs the
     one-step SR pipeline end-to-end (infer/omgsr_s_infer_model.py:11-23 is
     the reference chain being rehearsed);
  3. SCORE: cli.eval_sr computes PSNR/SSIM + DISTS/LPIPS/NIQE of the
     outputs vs the GT dir (README.md:45-90 eval protocol), writing
     metrics JSON;
  4. ADAPTER ROUND-TRIP: a LoRA tree over the full ported base is exported
     (save_adapter) and re-imported (load_adapter), asserted leaf-exact;
  5. TORCH PARITY: cli.validate_checkpoint re-ports the same weights and
     asserts every stage's max_rel deviation <= --tolerance (1e-3, the
     BASELINE.md fidelity target) against the independent torch reference.

    python -m omgsr_tpu.cli.fire_drill --family sd --root /tmp/drill_sd
    python -m omgsr_tpu.cli.fire_drill --family flux --root /tmp/drill_flux

Exit code 0 + `"passed": true` in <root>/drill_report.json = the day real
weights mount, the same chain is turnkey execution: run the production
CLIs (`validate_checkpoint --sd_path/--flux_path`, `infer_omgsr_*`,
`eval_sr`) directly against the real checkpoint dir — the drill proved
each of those stages at real architecture. `--root` itself is a SCRATCH
directory the drill owns: it must not already contain a checkpoint.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os
import shutil
import sys
import time

import numpy as np

logger = logging.getLogger("omgsr_tpu.fire_drill")

_INDEX_NAME = "diffusion_pytorch_model.safetensors.index.json"


def _torch_layout(params):
    """Param tree -> HF tensor dict (the porters' inverse). Kept in sync
    with tests/test_porters._to_torch_layout; duplicated here so the drill
    runs from an installed package too."""
    from omgsr_tpu.utils.tree import flatten_dict

    out = {}
    for path, v in flatten_dict(params).items():
        key = ".".join(path)
        arr = np.asarray(v)
        if path[-1] == "kernel":
            key = ".".join(path[:-1]) + ".weight"
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T
        elif path[-1] == "scale":
            key = ".".join(path[:-1]) + ".weight"
        out[key] = np.ascontiguousarray(arr)
    return out


def save_sharded_safetensors(tensors: dict, dirpath: str, max_shard_bytes: int):
    """Write an HF-style sharded checkpoint: model shards + weight_map
    index (the layout convert.porters.load_safetensors_dir consumes)."""
    from safetensors.numpy import save_file

    os.makedirs(dirpath, exist_ok=True)
    shards: list[dict] = [{}]
    sizes = [0]
    for key in sorted(tensors):
        nbytes = tensors[key].nbytes
        if sizes[-1] and sizes[-1] + nbytes > max_shard_bytes:
            shards.append({})
            sizes.append(0)
        shards[-1][key] = tensors[key]
        sizes[-1] += nbytes
    n = len(shards)
    if n == 1:
        save_file(shards[0], os.path.join(dirpath, "diffusion_pytorch_model.safetensors"))
        return 1
    weight_map = {}
    for i, shard in enumerate(shards):
        name = f"diffusion_pytorch_model-{i + 1:05d}-of-{n:05d}.safetensors"
        save_file(shard, os.path.join(dirpath, name))
        weight_map.update({k: name for k in shard})
    with open(os.path.join(dirpath, _INDEX_NAME), "w") as f:
        json.dump(
            {"metadata": {"total_size": int(sum(sizes))}, "weight_map": weight_map}, f
        )
    return n


# The reduced-width / full-depth FLUX drill architecture: every block type
# at the published depth (19 dual + 38 single, FluxConfig defaults), width
# cut 24->4 heads so the fabricate+port+torch-parity loop stays CPU-sized.
FLUX_DRILL_OVERRIDES = dict(
    num_attention_heads=4,  # width 512 (head_dim stays 128 = sum axes_dims_rope)
    joint_attention_dim=512,
    pooled_projection_dim=256,
)


def fabricate(family: str, root: str, seed: int, max_shard_gb: float):
    """Step 1: write the full-architecture checkpoint dir + adapters +
    probe inputs. Returns paths used by the later steps."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from omgsr_tpu.lora import (
        FLUX_TARGET_MODULES,
        SD_TARGET_MODULES,
        init_lora_tree,
        save_adapter,
    )
    from omgsr_tpu.models import vae as V
    from omgsr_tpu.models.configs import FLUX_DEV, FLUX_VAE, SD21_UNET, SD21_VAE

    max_shard = int(max_shard_gb * (1 << 30))
    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    for sub in ("vae", "unet", "transformer"):
        if os.path.isdir(os.path.join(root, sub)):
            raise SystemExit(
                f"--root {root!r} already contains {sub}/ — the drill "
                "fabricates (and later deletes) its own scratch checkpoint; "
                "point --root at an empty directory, never at real weights"
            )

    if family == "sd":
        from omgsr_tpu.models import unet_sd as U

        vae_cfg, denoiser_cfg = SD21_VAE, SD21_UNET
        logger.info("initializing full SD2.1 VAE (83.7M) + UNet (865.9M) in f32")
        vp = V.init_vae(jax.random.key(seed), vae_cfg, dtype=jnp.float32)
        dp = U.init_unet(jax.random.key(seed + 1), denoiser_cfg, dtype=jnp.float32)
        den_dir, den_cfg_json = "unet", {
            "block_out_channels": list(denoiser_cfg.block_out_channels),
            "attention_head_dim": [
                c // h
                for c, h in zip(
                    denoiser_cfg.block_out_channels, denoiser_cfg.num_attention_heads
                )
            ],
            "num_attention_heads": list(denoiser_cfg.num_attention_heads),
            "cross_attention_dim": denoiser_cfg.cross_attention_dim,
            "norm_num_groups": denoiser_cfg.norm_num_groups,
            "use_linear_projection": denoiser_cfg.use_linear_projection,
        }
        vae_cfg_json = {
            "block_out_channels": list(vae_cfg.block_out_channels),
            "norm_num_groups": vae_cfg.norm_num_groups,
            "latent_channels": vae_cfg.latent_channels,
            "scaling_factor": vae_cfg.scaling_factor,
        }
        lora_targets, den_lora_name = SD_TARGET_MODULES, "unet_lora_adapter"
        np.savez(
            os.path.join(root, "prompt.npz"),
            prompt_embeds=rng.normal(
                size=(1, 77, denoiser_cfg.cross_attention_dim)
            ).astype(np.float32),
        )
    elif family == "flux":
        from omgsr_tpu.models import flux as F

        vae_cfg = FLUX_VAE
        denoiser_cfg = dataclasses.replace(FLUX_DEV, **FLUX_DRILL_OVERRIDES)
        logger.info(
            "initializing FLUX at full depth %d+%d, width %d (bf16)",
            denoiser_cfg.num_layers, denoiser_cfg.num_single_layers,
            denoiser_cfg.num_attention_heads * denoiser_cfg.attention_head_dim,
        )
        vp = V.init_vae(jax.random.key(seed), vae_cfg, dtype=jnp.bfloat16)
        dp = F.init_flux(jax.random.key(seed + 1), denoiser_cfg, dtype=jnp.bfloat16)
        den_dir, den_cfg_json = "transformer", {
            "num_layers": denoiser_cfg.num_layers,
            "num_single_layers": denoiser_cfg.num_single_layers,
            "attention_head_dim": denoiser_cfg.attention_head_dim,
            "num_attention_heads": denoiser_cfg.num_attention_heads,
            "joint_attention_dim": denoiser_cfg.joint_attention_dim,
            "pooled_projection_dim": denoiser_cfg.pooled_projection_dim,
            "axes_dims_rope": list(denoiser_cfg.axes_dims_rope),
            "in_channels": denoiser_cfg.in_channels,
        }
        vae_cfg_json = {
            "block_out_channels": list(vae_cfg.block_out_channels),
            "norm_num_groups": vae_cfg.norm_num_groups,
            "latent_channels": vae_cfg.latent_channels,
            "scaling_factor": vae_cfg.scaling_factor,
            "shift_factor": vae_cfg.shift_factor,
            "use_quant_conv": vae_cfg.use_quant_conv,
            "use_post_quant_conv": vae_cfg.use_post_quant_conv,
        }
        # reference -F adapter names: train/train_omgsr_f.py:150,176
        lora_targets, den_lora_name = FLUX_TARGET_MODULES, "flux_adapter"
        np.savez(
            os.path.join(root, "prompt.npz"),
            prompt_embeds=rng.normal(
                size=(1, 128, denoiser_cfg.joint_attention_dim)
            ).astype(np.float32),
            pooled_prompt_embeds=rng.normal(
                size=(1, denoiser_cfg.pooled_projection_dim)
            ).astype(np.float32),
        )
    else:
        raise ValueError(f"unknown family {family!r}")

    t0 = time.time()
    n_vae = save_sharded_safetensors(
        _torch_layout(vp), os.path.join(root, "vae"), max_shard
    )
    n_den = save_sharded_safetensors(
        _torch_layout(dp), os.path.join(root, den_dir), max_shard
    )
    with open(os.path.join(root, "vae", "config.json"), "w") as f:
        json.dump(vae_cfg_json, f)
    with open(os.path.join(root, den_dir, "config.json"), "w") as f:
        json.dump(den_cfg_json, f)
    logger.info(
        "wrote checkpoint dir (%d vae + %d %s shards) in %.0fs",
        n_vae, n_den, den_dir, time.time() - t0,
    )

    # LoRA adapters at the production rank layout (zero-init B: attach must
    # be an exact no-op on outputs; training would move them)
    lora_dir = os.path.join(root, "lora")
    lv = init_lora_tree(jax.random.key(seed + 2), vp["encoder"], SD_TARGET_MODULES, 4)
    ld = init_lora_tree(jax.random.key(seed + 3), dp, lora_targets, 4)
    vae_ad = "vae_encoder_lora_adapter" if family == "sd" else "vae_encoder_adapter"
    save_adapter(lv, os.path.join(lora_dir, vae_ad),
                 rank=4, targets=SD_TARGET_MODULES)
    save_adapter(ld, os.path.join(lora_dir, den_lora_name),
                 rank=4, targets=lora_targets)

    # probe images: GT (reference output) + its bicubic-down LQ input
    gt_dir, lq_dir = os.path.join(root, "gt"), os.path.join(root, "lq")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(lq_dir, exist_ok=True)
    gt = rng.integers(0, 255, (128, 128, 3), dtype=np.uint8)
    Image.fromarray(gt).save(os.path.join(gt_dir, "probe.png"))
    Image.fromarray(gt).resize((32, 32), Image.BICUBIC).save(
        os.path.join(lq_dir, "probe.png")
    )
    return {"lora_dir": lora_dir, "gt_dir": gt_dir, "lq_dir": lq_dir,
            "den_dir": den_dir, "den_lora_name": den_lora_name,
            "lora_targets": lora_targets}


def run_drill(args) -> dict:
    import jax.numpy as jnp

    report = {"family": args.family, "root": args.root, "stages": {}}
    t_all = time.time()

    # ---- 1. fabricate -------------------------------------------------------
    t0 = time.time()
    paths = fabricate(args.family, args.root, args.seed, args.max_shard_gb)
    report["stages"]["fabricate_s"] = round(time.time() - t0, 1)

    # ---- 2. porter -> pipeline through the production infer CLI -------------
    t0 = time.time()
    out_dir = os.path.join(args.root, "sr_out")
    if args.family == "sd":
        from omgsr_tpu.cli.infer_omgsr_s import main as infer_main
        from omgsr_tpu.cli.infer_omgsr_s import parse_args as infer_parse

        infer_main(infer_parse([
            "--input_image", paths["lq_dir"], "--output_dir", out_dir,
            "--sd_path", args.root, "--lora_path", paths["lora_dir"],
            "--prompt_npz", os.path.join(args.root, "prompt.npz"),
            "--process_size", str(args.process_size), "--upscale", "4",
            "--align_method", "adain", "--weight_dtype", "fp32",
        ]))
    else:
        from omgsr_tpu.cli.infer_omgsr_f import main as infer_main
        from omgsr_tpu.cli.infer_omgsr_f import parse_args as infer_parse

        infer_main(infer_parse([
            "--input_image", paths["lq_dir"], "--output_dir", out_dir,
            "--flux_path", args.root, "--lora_path", paths["lora_dir"],
            "--prompt_npz", os.path.join(args.root, "prompt.npz"),
            "--process_size", str(args.process_size), "--upscale", "4",
            "--align_method", "adain", "--weight_dtype", "bf16",
        ]))
    outs = sorted(os.listdir(out_dir))
    assert outs, "infer CLI produced no outputs"
    report["stages"]["port_and_infer_s"] = round(time.time() - t0, 1)

    # ---- 3. eval_sr scores outputs vs GT ------------------------------------
    # full metric protocol: PSNR/SSIM + DISTS (tiny random backbone — the
    # drill fabricates no DINOv3 weights; exercises the metric path) + NIQE
    # against a pristine model fitted on the drill's own GT images
    t0 = time.time()
    from PIL import Image as _Image

    from omgsr_tpu.cli.eval_sr import main as eval_main
    from omgsr_tpu.utils.niqe import fit_pristine, save_pristine

    gt_imgs = [
        np.asarray(_Image.open(os.path.join(paths["gt_dir"], f)).convert("RGB"),
                   np.float64) / 255.0
        for f in sorted(os.listdir(paths["gt_dir"]))
    ]
    niqe_path = os.path.join(args.root, "niqe_pristine.npz")
    save_pristine(niqe_path, fit_pristine(gt_imgs))

    metrics_path = os.path.join(args.root, "sr_metrics.json")
    eval_main([
        "--sr_dir", out_dir, "--gt_dir", paths["gt_dir"],
        "--dists", "--dinov3_size", "tiny", "--lpips",
        "--niqe_params", niqe_path,
        "--output", metrics_path,
    ])
    with open(metrics_path) as f:
        metrics = json.load(f)
    report["stages"]["eval_sr"] = metrics
    report["stages"]["eval_sr_s"] = round(time.time() - t0, 1)

    # ---- 4. adapter export/import round-trip on the full ported tree --------
    t0 = time.time()
    import jax

    from omgsr_tpu.convert import port_diffusers_vae
    from omgsr_tpu.convert.hf_config import vae_config_from_json
    from omgsr_tpu.lora import init_lora_tree, load_adapter, save_adapter

    vae_cfg = vae_config_from_json(os.path.join(args.root, "vae"))
    vp = port_diffusers_vae(os.path.join(args.root, "vae"), cfg=vae_cfg, dtype=jnp.float32)
    from omgsr_tpu.lora import SD_TARGET_MODULES

    ltree = init_lora_tree(jax.random.key(99), vp["encoder"], SD_TARGET_MODULES, 4)
    rt_dir = os.path.join(args.root, "lora_roundtrip")
    save_adapter(ltree, rt_dir, rank=4, targets=SD_TARGET_MODULES)
    back, meta = load_adapter(rt_dir)
    assert meta["r"] == 4 or meta.get("rank") == 4, meta
    flat_a = jax.tree.leaves(ltree)
    flat_b = jax.tree.leaves(back)
    assert len(flat_a) == len(flat_b)
    max_dev = max(
        float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
        for a, b in zip(flat_a, flat_b)
    )
    assert max_dev == 0.0, f"adapter round-trip not leaf-exact: {max_dev}"
    report["stages"]["adapter_roundtrip_exact"] = True
    report["stages"]["adapter_roundtrip_s"] = round(time.time() - t0, 1)

    # ---- 5. torch parity at full architecture -------------------------------
    t0 = time.time()
    from omgsr_tpu.cli import validate_checkpoint as VC

    if args.family == "sd":
        parity = VC.validate_sd(args.root)
    else:
        parity = VC.validate_flux(args.root, tokens=args.flux_tokens)
    report["stages"]["torch_parity"] = parity
    report["stages"]["torch_parity_s"] = round(time.time() - t0, 1)
    worst = max(
        v["max_rel"] for v in parity.values() if isinstance(v, dict) and "max_rel" in v
    )
    report["worst_parity_max_rel"] = worst
    report["passed"] = bool(worst <= args.tolerance)
    report["total_s"] = round(time.time() - t_all, 1)
    return report


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    parser.add_argument("--family", choices=["sd", "flux"], required=True)
    parser.add_argument("--root", required=True,
                        help="scratch dir for the fabricated checkpoint + outputs")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--max_shard_gb", type=float, default=2.0,
                        help="shard size; SD2.1's 3.46 GB f32 UNet -> 2 shards")
    parser.add_argument("--process_size", type=int, default=128,
                        help="SR tile size for the infer step (full arch on "
                        "CPU: keep small; real-weight day uses 512/1024)")
    parser.add_argument("--flux_tokens", type=int, default=64)
    parser.add_argument("--tolerance", type=float, default=1e-3)
    parser.add_argument("--keep", action="store_true",
                        help="keep the fabricated checkpoint dir (default: "
                        "delete everything except drill_report.json)")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(levelname)s %(name)s %(message)s")

    pre_existing = set(os.listdir(args.root)) if os.path.isdir(args.root) else set()
    report = run_drill(args)
    report_path = os.path.join(args.root, "drill_report.json")
    if not args.keep:
        # delete only what the drill created this run — never pre-existing
        # user files that happened to share the scratch directory
        for name in set(os.listdir(args.root)) - pre_existing:
            p = os.path.join(args.root, name)
            shutil.rmtree(p) if os.path.isdir(p) else os.remove(p)
    with open(report_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    if not report["passed"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
