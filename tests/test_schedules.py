import math

import numpy as np
import pytest

from omgsr_tpu.diffusion import (
    ddpm_alphas_cumprod,
    flux_shifted_sigmas,
    flux_sigma_at_mid_timestep,
    mid_timestep_coeffs_sd,
)


def test_ddpm_alphas_cumprod_table():
    ac = ddpm_alphas_cumprod()
    assert ac.shape == (1000,)
    # endpoint values of the scaled-linear schedule
    assert ac[0] == pytest.approx(1 - 0.00085, rel=1e-12)
    assert np.all(np.diff(ac) < 0)
    assert 0 < ac[-1] < 0.01
    # golden: replicate diffusers' table arithmetic independently
    betas = np.linspace(math.sqrt(0.00085), math.sqrt(0.012), 1000) ** 2
    ref = np.cumprod(1 - betas)
    np.testing.assert_allclose(ac, ref, rtol=1e-12)


def test_mid_timestep_coeffs_sd_273():
    s_a, s_1ma = mid_timestep_coeffs_sd(273)
    assert s_a**2 + s_1ma**2 == pytest.approx(1.0, abs=1e-12)
    # t=273 sits in the mid regime: signal still dominant
    assert 0.7 < s_a < 0.95
    assert 0.3 < s_1ma < 0.7


def test_flux_shifted_sigmas_shape_and_endpoints():
    s = flux_shifted_sigmas()
    assert s.shape == (1000,)
    assert s[0] == pytest.approx(1.0)
    assert s[-1] == pytest.approx(0.0)
    assert np.all(np.diff(s) < 0)


def test_flux_shift_formula_golden():
    # golden check of the shift: mu(4096)=1.15, so sigma at t is
    # e^mu / (e^mu + 1/t - 1)
    s = flux_shifted_sigmas(num_steps=999, image_seq_len=4096)
    t = np.linspace(1, 0, 1000)
    emu = math.exp(1.15)
    expected = emu / (emu + (1 / t[1] - 1))
    assert s[1] == pytest.approx(expected, rel=1e-9)


def test_flux_sigma_at_mid_timestep_244():
    sig = flux_sigma_at_mid_timestep(244)
    s = flux_shifted_sigmas()
    assert sig == pytest.approx(float(s[1000 - 245]))
    assert 0.0 < sig < 1.0


def test_flux_unshifted_is_linear():
    s = flux_shifted_sigmas(num_steps=10, shift=False)
    np.testing.assert_allclose(s, np.linspace(1, 0, 11), atol=1e-12)
