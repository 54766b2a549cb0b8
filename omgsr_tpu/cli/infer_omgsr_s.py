"""OMGSR-S inference CLI — flag-compatible with the reference
(infer/infer_omgsr_s.py:112-149).

    python -m omgsr_tpu.cli.infer_omgsr_s \
        --input_image tests/imgs --output_dir out \
        --sd_path /ckpts/stable-diffusion-2-1-base --lora_path /ckpts/omgsr_s \
        --upscale 4 --align_method adain --mid_timestep 273
"""

from __future__ import annotations

import argparse
import glob
import os

import jax
import jax.numpy as jnp

from omgsr_tpu.cli.prompts import encode_prompt_sd, load_prompt_npz
from omgsr_tpu.convert import port_diffusers_unet, port_diffusers_vae
from omgsr_tpu.inference.pipeline_s import OMGSRSPipeline
from omgsr_tpu.lora import import_peft_adapter, load_adapter, merge_lora
from omgsr_tpu.utils.dtypes import resolve_dtype


def collect_images(input_image: str) -> list[str]:
    """Reference path semantics: .txt list, directory glob, or single file
    (infer/infer_omgsr_s.py:54-62)."""
    if ".txt" in input_image:
        with open(input_image) as f:
            return [l.strip() for l in f.readlines()]
    if os.path.isdir(input_image):
        return sorted(
            glob.glob(f"{input_image}/*.png")
            + glob.glob(f"{input_image}/*.jpg")
            + glob.glob(f"{input_image}/*.jpeg")
        )
    return [input_image]


def load_adapter_dir(path: str):
    """Accept either this framework's adapter layout or a torch-PEFT dir."""
    cfg = os.path.join(path, "adapter_config.json")
    if os.path.exists(cfg):
        import json

        with open(cfg) as f:
            fmt = json.load(f).get("format")
        if fmt == "omgsr-tpu":
            return load_adapter(path)[0]
    return import_peft_adapter(path)[0]


def build_pipeline(args, dtype):
    from omgsr_tpu.convert.hf_config import unet_config_from_json, vae_config_from_json

    vae_dir = os.path.join(args.sd_path, "vae")
    unet_dir = os.path.join(args.sd_path, "unet")
    vae_cfg = vae_config_from_json(vae_dir)
    unet_cfg = unet_config_from_json(unet_dir)
    vae_params = port_diffusers_vae(vae_dir, cfg=vae_cfg, dtype=dtype)
    unet_params = port_diffusers_unet(unet_dir, cfg=unet_cfg, dtype=dtype)
    if args.lora_path:
        # reference adapter names: infer/omgsr_s_infer_model.py:16-21
        vae_ad = os.path.join(args.lora_path, "vae_encoder_lora_adapter")
        unet_ad = os.path.join(args.lora_path, "unet_lora_adapter")
        if os.path.isdir(vae_ad):
            vae_params["encoder"] = merge_lora(vae_params["encoder"], load_adapter_dir(vae_ad))
        if os.path.isdir(unet_ad):
            unet_params = merge_lora(unet_params, load_adapter_dir(unet_ad))
    pipe = OMGSRSPipeline(
        vae_params, unet_params, vae_cfg, unet_cfg, mid_timestep=args.mid_timestep,
        vae_tile=args.vae_tile, vae_stats=args.vae_stats,
    )
    if getattr(args, "shard", "none") == "tiles":
        import jax

        from omgsr_tpu.parallel import create_mesh

        n = len(jax.devices())
        if n < 2:
            print("--shard tiles: only one device visible — running unsharded")
        else:
            pipe.shard_for_mesh(create_mesh({"data": n}))
    return pipe


def main(args=None):
    if args is None:
        args = parse_args()
    from omgsr_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    dtype = resolve_dtype(args.weight_dtype)
    if args.prompt_npz:
        prompt_embeds = load_prompt_npz(args.prompt_npz)["prompt_embeds"].astype(dtype)
    else:
        prompt = " ".join(args.prompt) if isinstance(args.prompt, list) else args.prompt
        prompt_embeds = encode_prompt_sd(args.sd_path, prompt, dtype)

    pipe = build_pipeline(args, dtype)
    image_names = collect_images(args.input_image)
    print(f"There are {len(image_names)} images.")

    tile_size = args.process_size // 8
    tile_overlap = tile_size // 2

    from omgsr_tpu.inference.batch_runner import run_batch

    def infer_fn(lq, i):
        return pipe(jnp.asarray(lq, dtype), prompt_embeds, tile_size, tile_overlap, rng=jax.random.key(i))

    run_batch(
        image_names, infer_fn, args.output_dir, args.process_size, args.upscale,
        args.align_method, dtype, size_bucket=args.size_bucket,
        batch_size=args.batch_size,
    )


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="OMGSR-S Inference Script (TPU)")
    parser.add_argument("--input_image", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--sd_path", type=str, required=True)
    parser.add_argument("--lora_path", type=str, default=None)
    parser.add_argument("--device", type=str, default="tpu", help="accepted for parity; jax picks the backend")
    parser.add_argument("--process_size", type=int, default=512)
    parser.add_argument("--upscale", type=int, default=4)
    parser.add_argument("--align_method", type=str, default="adain", choices=["wavelet", "adain", "nofix"])
    parser.add_argument("--weight_dtype", type=str, default="bf16", choices=["fp32", "fp16", "bf16"])
    # reference parity: infer/infer_omgsr_s.py:137 takes nargs="+" so an
    # unquoted multi-word prompt parses; words are joined into ONE prompt here
    # (the reference's list form feeds a concat'd embedding batch that breaks
    # batch-1 SR downstream — joining is the usable semantics)
    parser.add_argument("--prompt", type=str, nargs="*", default="")
    parser.add_argument("--prompt_npz", type=str, default=None, help="precomputed prompt embeddings (.npz)")
    parser.add_argument("--mid_timestep", type=int, default=273)
    parser.add_argument("--vae_tile", type=int, default=None,
                        help="tile the VAE beyond this many pixels (vaehook equivalent; for 2K+ outputs)")
    parser.add_argument("--vae_stats", type=str, default="fast", choices=["fast", "exact", "auto"],
                        help="tiled-VAE GroupNorm statistics: fast (downsampled estimate, one XLA graph) or exact (tile-accumulated global stats == untiled output)")
    parser.add_argument("--shard", type=str, default="none", choices=["none", "tiles"],
                        help="multi-chip serving: replicate weights, shard the "
                             "protocol's tile batch over all visible devices")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="same-bucket serving batch size (images per device call)")
    parser.add_argument("--size_bucket", type=int, default=64,
                        help="pad inputs to multiples of this many px (one compiled graph per bucket); 0 disables")
    return parser.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
