"""OMGSR-F inference CLI — flag-compatible with the reference
(infer/infer_omgsr_f.py:114-154).

    python -m omgsr_tpu.cli.infer_omgsr_f \
        --input_image tests/imgs --output_dir out \
        --flux_path /ckpts/FLUX.1-dev --lora_path /ckpts/omgsr_f \
        --process_size 1024 --upscale 4 --mid_timestep 244
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp

from omgsr_tpu.cli.infer_omgsr_s import collect_images, load_adapter_dir
from omgsr_tpu.cli.prompts import encode_prompt_flux, load_prompt_npz
from omgsr_tpu.convert import port_diffusers_vae, port_flux_transformer
from omgsr_tpu.inference.pipeline_f import OMGSRFPipeline
from omgsr_tpu.lora import merge_lora
from omgsr_tpu.utils.dtypes import resolve_dtype


def build_pipeline(args, dtype):
    from omgsr_tpu.convert.hf_config import flux_config_from_json, vae_config_from_json

    vae_dir = os.path.join(args.flux_path, "vae")
    flux_dir = os.path.join(args.flux_path, "transformer")
    vae_cfg = vae_config_from_json(vae_dir)
    flux_cfg = flux_config_from_json(flux_dir)
    vae_params = port_diffusers_vae(vae_dir, cfg=vae_cfg, dtype=dtype)
    import contextlib

    # under --quantize int8 the DiT is ported, LoRA-merged, stacked and
    # quantized entirely on the host CPU backend: the 12B bf16 tree
    # (23.8 GB) must never touch the accelerator — only the int8 result
    # (11.9 GB) is placed on device by quantize_flux_for_serving
    stage_ctx = (
        jax.default_device(jax.devices("cpu")[0])
        if args.quantize.startswith("int")
        else contextlib.nullcontext()
    )
    with stage_ctx:
        flux_params = port_flux_transformer(flux_dir, cfg=flux_cfg, dtype=dtype)
        if args.lora_path:
            # reference adapter names: train/train_omgsr_f.py:150,176
            flux_ad = os.path.join(args.lora_path, "flux_adapter")
            if os.path.isdir(flux_ad):
                flux_params = merge_lora(flux_params, load_adapter_dir(flux_ad))
    if args.lora_path:
        vae_ad = os.path.join(args.lora_path, "vae_encoder_adapter")
        if os.path.isdir(vae_ad):
            vae_params["encoder"] = merge_lora(vae_params["encoder"], load_adapter_dir(vae_ad))
    if args.quantize.startswith("int"):
        from omgsr_tpu.utils.quantize import quantize_flux_for_serving

        flux_params = quantize_flux_for_serving(
            flux_params,
            act_quant=args.quantize == "int8_w8a8",
            bits=4 if args.quantize == "int4" else 8,
            min_params=args.quantize_min_params,
        )
    pipe = OMGSRFPipeline(
        vae_params,
        flux_params,
        vae_cfg,
        flux_cfg,
        mid_timestep=args.mid_timestep,
        guidance_scale=args.guidance_scale,
        vae_tile=args.vae_tile,
        vae_stats=args.vae_stats,
    )
    shard = getattr(args, "shard", "none")
    if shard != "none":
        from omgsr_tpu.parallel import create_mesh

        n = len(jax.devices())
        if n < 2:
            print(f"--shard {shard}: only one device visible — running unsharded")
        else:
            axis = "tp" if shard == "tp" else ("fsdp" if shard == "fsdp" else "data")
            pipe.shard_for_mesh(create_mesh({axis: n}), strategy=shard)
    return pipe


def main(args=None):
    if args is None:
        args = parse_args()
    from omgsr_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    dtype = resolve_dtype(args.weight_dtype)
    if args.prompt_npz:
        d = load_prompt_npz(args.prompt_npz)
        prompt_embeds = d["prompt_embeds"].astype(dtype)
        pooled = d["pooled_prompt_embeds"].astype(dtype)
    else:
        prompt = " ".join(args.prompt) if isinstance(args.prompt, list) else args.prompt
        prompt_embeds, pooled, _ = encode_prompt_flux(args.flux_path, prompt, dtype=dtype)

    pipe = build_pipeline(args, dtype)
    image_names = collect_images(args.input_image)
    print(f"There are {len(image_names)} images.")

    tile_size = args.process_size // 8
    tile_overlap = tile_size // 2

    from omgsr_tpu.inference.batch_runner import run_batch

    def infer_fn(lq, i):
        return pipe(jnp.asarray(lq, dtype), prompt_embeds, pooled, tile_size, tile_overlap, rng=jax.random.key(i))

    run_batch(
        image_names, infer_fn, args.output_dir, args.process_size, args.upscale,
        args.align_method, dtype, size_bucket=args.size_bucket,
        batch_size=args.batch_size,
    )


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="OMGSR-F Inference Script (TPU)")
    parser.add_argument("--input_image", type=str, required=True)
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--flux_path", type=str, required=True)
    parser.add_argument("--lora_path", type=str, default=None)
    parser.add_argument("--device", type=str, default="tpu")
    parser.add_argument("--process_size", type=int, default=1024)
    parser.add_argument("--upscale", type=int, default=4)
    parser.add_argument("--align_method", type=str, default="adain", choices=["wavelet", "adain", "nofix"])
    parser.add_argument("--weight_dtype", type=str, default="bf16", choices=["fp32", "fp16", "bf16"])
    # reference parity: --prompt accepts multiple tokens (nargs="+" upstream);
    # joined into one prompt (see infer_omgsr_s.py note)
    parser.add_argument("--prompt", type=str, nargs="*", default="")
    parser.add_argument("--prompt_npz", type=str, default=None)
    parser.add_argument("--mid_timestep", type=int, default=244)
    parser.add_argument("--guidance_scale", type=float, default=1.0)
    parser.add_argument("--quantize", type=str, default="none",
                        choices=["none", "int8", "int8_w8a8", "int4"],
                        help="int8: weight-only DiT compression (12B fits one 16 GB "
                             "chip); int8_w8a8: additionally run block matmuls "
                             "s8xs8->s32 on the MXU (per-token activation quant); "
                             "int4: group-wise (g=128) nibble-packed storage at "
                             "~5.95 GB — the minimum-memory mode; quality bound "
                             "per tools/probe_int4_quality.py, prefer int8 when "
                             "HBM allows")
    parser.add_argument("--quantize_min_params", type=int, default=1 << 16,
                        help="only dense kernels with at least this many elements "
                             "are quantized (small layers stay full precision); "
                             "lowered in tests to exercise quantization on tiny "
                             "configs")
    parser.add_argument("--vae_tile", type=int, default=None,
                        help="tile the VAE beyond this many pixels (vaehook equivalent; for 2K+ outputs)")
    parser.add_argument("--vae_stats", type=str, default="fast", choices=["fast", "exact", "auto"],
                        help="tiled-VAE GroupNorm statistics: fast (downsampled estimate, one XLA graph) or exact (tile-accumulated global stats == untiled output)")
    parser.add_argument("--shard", type=str, default="none",
                        choices=["none", "fsdp", "tp", "tiles"],
                        help="multi-chip serving over all visible devices: "
                             "fsdp/tp shard the 12B weights; tiles replicates "
                             "weights (int8 fits one v5e) and shards the "
                             "protocol's tile batch — near-linear per-image "
                             "latency scaling")
    parser.add_argument("--batch_size", type=int, default=1,
                        help="same-bucket serving batch size (images per device call)")
    parser.add_argument("--size_bucket", type=int, default=64,
                        help="pad inputs to multiples of this many px (one compiled graph per bucket); 0 disables")
    return parser.parse_args(argv)


if __name__ == "__main__":
    main(parse_args())
