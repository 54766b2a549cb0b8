"""SNR-based mid-timestep calibration.

Re-implements the sweep of mid_timestep/mid_timestep_sd.py:59-100 and
mid_timestep_flux.py:95-105 as one vectorized jnp computation over all
timesteps (the reference loops over t in Python, re-launching kernels 1000x
per batch):

  SD:   SNR1(t) = E[z_H^2] * abar_t / (1 - abar_t);
  FLUX: SNR1(t) = E[z_H^2] * (1-sigma_t)^2 / sigma_t^2;
  SNR2  = E[z_H^2] / E[(z_L - z_H)^2];
  t*    = argmin_t mean_batches |SNR1(t) - SNR2|.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.diffusion.schedules import ddpm_alphas_cumprod, flux_shifted_sigmas


def snr_gap_sd(hq_latent, lq_latent, alphas_cumprod=None):
    """Per-timestep |SNR1 - SNR2| (1000,) for one batch of latents."""
    if alphas_cumprod is None:
        alphas_cumprod = ddpm_alphas_cumprod()
    abar = jnp.asarray(alphas_cumprod, jnp.float32)
    sig = jnp.mean(hq_latent.astype(jnp.float32) ** 2)
    snr1 = sig * abar / (1.0 - abar)
    noise2 = jnp.mean((lq_latent.astype(jnp.float32) - hq_latent.astype(jnp.float32)) ** 2)
    snr2 = sig / noise2
    return jnp.abs(snr1 - snr2)


def snr_gap_flux(hq_latent, lq_latent, sigmas=None):
    """Per-index |SNR1 - SNR2| over the shifted FM schedule.

    Index convention matches the reference: entry i corresponds to
    sigma = sigmas[-(i+1)], so argmin is directly the mid_timestep
    (train/train_omgsr_f.py:259-262)."""
    if sigmas is None:
        sigmas = flux_shifted_sigmas()
    sig_t = jnp.asarray(sigmas[::-1], jnp.float32)  # sig_t[i] = sigmas[-(i+1)]
    sig_t = jnp.clip(sig_t, 1e-8, 1.0)
    sig = jnp.mean(hq_latent.astype(jnp.float32) ** 2)
    snr1 = sig * (1.0 - sig_t) ** 2 / sig_t**2
    noise2 = jnp.mean((lq_latent.astype(jnp.float32) - hq_latent.astype(jnp.float32)) ** 2)
    snr2 = sig / noise2
    return jnp.abs(snr1 - snr2)


def calibrate(gap_accumulator: np.ndarray):
    """argmin + value over the accumulated per-timestep gaps."""
    t = int(np.argmin(gap_accumulator))
    return t, float(gap_accumulator[t])
