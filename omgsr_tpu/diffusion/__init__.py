from omgsr_tpu.diffusion.schedules import (
    ddpm_alphas_cumprod,
    mid_timestep_coeffs_sd,
    flux_shifted_sigmas,
    flux_sigma_at_mid_timestep,
)
from omgsr_tpu.diffusion.packing import (
    pack_latents,
    unpack_latents,
    latent_image_ids,
)
from omgsr_tpu.diffusion.tiling import (
    gaussian_tile_weights,
    tile_grid_1d,
    tile_grid_2d,
)
