"""Mid-timestep calibration CLI for OMGSR-F (flow-matching sigmas).

    python -m omgsr_tpu.cli.mid_timestep_flux \
        --dataset_txt_or_dir_paths /data/hq --flux_path /ckpts/FLUX.1-dev

Counterpart of mid_timestep/mid_timestep_flux.py with the sweep vectorized.
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np
import yaml

from omgsr_tpu.cli.mid_timestep_sd import run, save_plot
from omgsr_tpu.diffusion.calibration import snr_gap_flux


def main(argv=None):
    args = parse_args(argv)
    from omgsr_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from omgsr_tpu.convert import port_diffusers_vae
    from omgsr_tpu.convert.hf_config import vae_config_from_json
    from omgsr_tpu.data.degradation import RealESRGANDegrader
    from omgsr_tpu.data.dataset import PairedDataset, PairedLoader
    from omgsr_tpu.models.vae import vae_encode

    vae_dir = os.path.join(args.flux_path, "vae")
    vae_cfg = vae_config_from_json(vae_dir)
    vae_params = port_diffusers_vae(vae_dir, cfg=vae_cfg)

    with open(args.degradation_params) as f:
        opt = yaml.safe_load(f)
    degrader = RealESRGANDegrader(opt, resolution=args.resolution)
    dataset = PairedDataset(args.dataset_txt_or_dir_paths, args.resolution)
    loader = PairedLoader(dataset, args.batch_size, degrader)

    encode = jax.jit(lambda x, k: vae_encode(vae_params, vae_cfg, x, rng=k))

    t, avg = run(args, encode, loader, gap_fn=snr_gap_flux)
    save_plot(avg, t, f"Flux_{args.resolution}_optimal_mid-timestep.png")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Find optimal mid-timestep (FLUX / FM)")
    parser.add_argument("--dataset_txt_or_dir_paths", type=str, nargs="+", required=True)
    parser.add_argument("--flux_path", type=str, required=True)
    parser.add_argument("--resolution", type=int, default=1024)
    parser.add_argument("--device", default="tpu")
    parser.add_argument("--batch_size", type=int, default=1)
    parser.add_argument("--num_workers", type=int, default=1)
    parser.add_argument("--max_samples", type=int, default=None)
    parser.add_argument(
        "--degradation_params", type=str, default="omgsr_tpu/configs/params_realesrgan.yml"
    )
    return parser.parse_args(argv)


if __name__ == "__main__":
    main()
