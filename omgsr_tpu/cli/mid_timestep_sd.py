"""Mid-timestep calibration CLI for OMGSR-S.

    python -m omgsr_tpu.cli.mid_timestep_sd \
        --dataset_txt_or_dir_paths /data/hq --sd_path /ckpts/sd21 \
        --resolution 512 --max_samples 100

Flag-compatible with mid_timestep/mid_timestep_sd.py:142-159; the 1000-t
sweep runs as one jitted broadcast per batch instead of a Python loop.
"""

from __future__ import annotations

import argparse
import os

import jax
import jax.numpy as jnp
import numpy as np
import yaml

from omgsr_tpu.diffusion.calibration import calibrate, snr_gap_sd


def run(args, encode_fn, loader, gap_fn=snr_gap_sd):
    """encode_fn(img_pm1, key) -> latent; loader yields {'lq','hq'} in [-1,1]."""
    acc = np.zeros(1000, np.float64)
    count = 0
    gap = jax.jit(gap_fn)
    key = jax.random.key(0)
    for i, batch in enumerate(loader):
        if args.max_samples is not None and count >= args.max_samples:
            break
        key, k1, k2 = jax.random.split(key, 3)
        hq_lat = encode_fn(jnp.asarray(batch["hq"]), k1)
        lq_lat = encode_fn(jnp.asarray(batch["lq"]), k2)
        b = batch["hq"].shape[0]
        acc += np.asarray(gap(hq_lat, lq_lat), np.float64) * b
        count += b
        t, loss = calibrate(acc / max(count, 1))
        print(f"batch {i + 1}: best_t={t} loss={loss:.6f}")
    t, loss = calibrate(acc / max(count, 1))
    print(f"Optimal timestep t: {t}")
    print(f"Loss: {loss:.6f}")
    return t, acc / max(count, 1)


def save_plot(avg_gap, t_best, out_path):
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
    except ImportError:
        print("matplotlib unavailable; skipping plot")
        return
    plt.figure(figsize=(12, 7))
    plt.plot(np.arange(len(avg_gap)), avg_gap, linewidth=1)
    plt.plot(t_best, avg_gap[t_best], "ro", markersize=12, markerfacecolor="none")
    plt.title(f"Loss over timesteps (optimal t={t_best})")
    plt.xlabel("Timestep (t)")
    plt.ylabel("|SNR1 - SNR2|")
    plt.grid(True, linestyle="--", alpha=0.7)
    plt.tight_layout()
    plt.savefig(out_path, dpi=150)
    print(f"Saved {out_path}")


def main(argv=None):
    args = parse_args(argv)
    from omgsr_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    from omgsr_tpu.convert import port_diffusers_vae
    from omgsr_tpu.convert.hf_config import vae_config_from_json
    from omgsr_tpu.data.degradation import RealESRGANDegrader
    from omgsr_tpu.data.dataset import PairedDataset, PairedLoader
    from omgsr_tpu.models.vae import vae_encode

    vae_dir = os.path.join(args.sd_path, "vae")
    vae_cfg = vae_config_from_json(vae_dir)
    vae_params = port_diffusers_vae(vae_dir, cfg=vae_cfg)

    with open(args.degradation_params) as f:
        opt = yaml.safe_load(f)
    degrader = RealESRGANDegrader(opt, resolution=args.resolution)
    dataset = PairedDataset(args.dataset_txt_or_dir_paths, args.resolution)
    loader = PairedLoader(dataset, args.batch_size, degrader)

    encode = jax.jit(lambda x, k: vae_encode(vae_params, vae_cfg, x, rng=k))
    t, avg = run(args, encode, loader)
    save_plot(avg, t, f"Sd_{args.resolution}_optimal_mid-timestep.png")


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="Find optimal mid-timestep (SD / DDPM)")
    parser.add_argument("--dataset_txt_or_dir_paths", type=str, nargs="+", required=True)
    parser.add_argument("--sd_path", type=str, required=True)
    parser.add_argument("--resolution", type=int, default=512)
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
