import argparse

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.cli.mid_timestep_sd import run
from omgsr_tpu.diffusion.calibration import calibrate, snr_gap_flux, snr_gap_sd
from omgsr_tpu.diffusion.schedules import ddpm_alphas_cumprod


def test_snr_gap_sd_recovers_planted_timestep():
    """Plant lq noise with the SNR of a known timestep; the sweep's argmin
    must recover (approximately) that timestep."""
    ac = ddpm_alphas_cumprod()
    t_true = 273
    a = float(ac[t_true])
    rng = np.random.default_rng(0)
    hq = rng.normal(size=(4, 16, 16, 4)).astype(np.float32)
    # SNR2 = E[hq^2]/E[(lq-hq)^2]; want SNR2 == a*E/(1-a) -> noise var = (1-a)/a * E
    e = float((hq**2).mean())
    noise = rng.normal(size=hq.shape).astype(np.float32)
    noise *= np.sqrt((1 - a) / a * e) / noise.std()
    lq = hq + noise
    gaps = np.asarray(snr_gap_sd(jnp.asarray(hq), jnp.asarray(lq)))
    t_hat, _ = calibrate(gaps)
    assert abs(t_hat - t_true) <= 10


def test_snr_gap_flux_shape_and_monotone_region():
    rng = np.random.default_rng(1)
    hq = rng.normal(size=(1, 8, 8, 16)).astype(np.float32)
    lq = hq + 0.5 * rng.normal(size=hq.shape).astype(np.float32)
    gaps = np.asarray(snr_gap_flux(jnp.asarray(hq), jnp.asarray(lq)))
    assert gaps.shape == (1000,)
    assert np.isfinite(gaps[1:]).all()  # index 0 is sigma=1-> snr1=0 ok


def test_runner_accumulates_and_reports():
    ac = ddpm_alphas_cumprod()
    rng = np.random.default_rng(2)

    class Loader:
        def __iter__(self):
            for _ in range(3):
                hq = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
                yield {"hq": hq, "lq": hq + 0.3 * rng.normal(size=hq.shape).astype(np.float32)}

    args = argparse.Namespace(max_samples=None)
    # identity "encoder": latents are the images themselves
    t, avg = run(args, lambda x, k: jnp.asarray(x), Loader())
    assert 0 <= t < 1000
    assert avg.shape == (1000,)
