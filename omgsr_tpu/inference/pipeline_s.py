"""OMGSR-S one-step inference pipeline (SD2.1 UNet @ mid-timestep 273).

TPU-native equivalent of infer/omgsr_s_infer_model.py: VAE-encode the
upscaled LQ image, one UNet epsilon prediction at the calibrated
mid-timestep (tiled with gaussian stitching when the latent exceeds the tile
size), recover x0, VAE-decode, clamp. The whole step — encode, tiled UNet,
decode — compiles into ONE XLA graph per input shape (the reference
dispatches hundreds of separate kernels and round-trips tiles through
python, :108-134).

LoRA handling mirrors merge_and_unload (:16-23): adapters are folded into
the base weights at load time, so inference runs the plain architecture.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from omgsr_tpu.diffusion.schedules import mid_timestep_coeffs_sd
from omgsr_tpu.inference.tiled import tiled_denoise
from omgsr_tpu.models import unet_sd, vae
from omgsr_tpu.models.configs import SD21_UNET, SD21_VAE, UNetConfig, VAEConfig


class OMGSRSPipeline:
    def __init__(
        self,
        vae_params,
        unet_params,
        vae_cfg: VAEConfig = SD21_VAE,
        unet_cfg: UNetConfig = SD21_UNET,
        mid_timestep: int = 273,
        tile_batch: int | None = None,
        vae_tile: int | None = None,
        vae_stats: str = "fast",
    ):
        """vae_tile: when set, VAE encode/decode stream through overlap-padded
        tiles of this many pixels (inference.tiled_vae) — the vaehook
        equivalent for images too large for a full-image VAE pass.

        vae_stats: "fast" keeps the whole step one XLA graph (GroupNorm
        statistics estimated from a downsampled copy, vaehook fast mode);
        "exact" runs the VAE stages op-streamed on stored boundary buffers
        with tile-accumulated global statistics (== full-image VAE to float
        tolerance) while the tiled UNet mid-section stays one jitted graph —
        the single-chip exactness mode for 2-4K outputs."""
        from omgsr_tpu.inference.vae_routing import validate_vae_opts

        validate_vae_opts(vae_tile, vae_stats, vae_cfg.downscale)
        # NOTE cfg.fused_resblocks (the Pallas resblock kernel) stays OFF by
        # default: it wins 1.7x on an isolated resnet chain but measures
        # EXACT parity inside the composed decode (see ops/conv3x3 notes) —
        # the decode lever is closed; the flag remains for experimentation.
        self.vae_params = vae_params
        self.unet_params = unet_params
        self.vae_cfg = vae_cfg
        self.unet_cfg = unet_cfg
        self.mid_timestep = mid_timestep
        self.tile_batch = tile_batch
        self.vae_tile = vae_tile
        self.vae_stats = vae_stats
        self.sqrt_alpha, self.sqrt_one_minus_alpha = mid_timestep_coeffs_sd(
            mid_timestep
        )
        self._rebuild_jit()

    def _rebuild_jit(self):
        """Fresh jit wrappers (re-called by shard_for_mesh — the traces read
        self._tile_sharding, so sharding must invalidate cached executables)."""
        self._jitted = functools.partial(
            jax.jit, static_argnames=("tile_size", "tile_overlap", "sample_latent")
        )(self._forward)
        self._jitted_mid = functools.partial(
            jax.jit, static_argnames=("tile_size", "tile_overlap")
        )(self._latent_mid)

    def _latent_mid(self, unet_params, z, prompt_embeds, *, tile_size, tile_overlap):
        """latent -> x0 latent: tiled UNet epsilon at the mid-timestep."""

        def denoise(tiles):
            n = tiles.shape[0]
            ctx = jnp.broadcast_to(
                prompt_embeds, (n,) + prompt_embeds.shape[-2:]
            ).astype(tiles.dtype)
            return unet_sd.unet_apply(unet_params, self.unet_cfg, tiles, self.mid_timestep, ctx)

        eps = tiled_denoise(
            z, denoise, tile_size, tile_overlap, self.tile_batch,
            tile_sharding=getattr(self, "_tile_sharding", None),
        )
        return (z - self.sqrt_one_minus_alpha * eps) / self.sqrt_alpha

    def shard_for_mesh(self, mesh, strategy: str = "tiles"):
        """Multi-chip -S serving: the 866M stack fits every chip, so the
        only useful strategy is tile parallelism — weights replicated, the
        tiled UNet's tile batch sharded over the mesh's "data" axis (one
        all-gather of the latent predictions before the stitch)."""
        if strategy != "tiles":
            raise ValueError(f"OMGSR-S supports strategy='tiles', got {strategy!r}")
        from jax.sharding import NamedSharding, PartitionSpec as P

        from omgsr_tpu.parallel import replicated

        rep = replicated(mesh)
        self.vae_params = jax.tree.map(lambda x: jax.device_put(x, rep), self.vae_params)
        self.unet_params = jax.tree.map(lambda x: jax.device_put(x, rep), self.unet_params)
        self._tile_sharding = NamedSharding(mesh, P("data"))
        self._rebuild_jit()
        return self

    def _forward(
        self,
        vae_params,
        unet_params,
        lq_img,
        prompt_embeds,
        rng,
        *,
        tile_size: int,
        tile_overlap: int,
        sample_latent: bool,
    ):
        from omgsr_tpu.inference.vae_routing import routed_vae_decode, routed_vae_encode

        z = routed_vae_encode(
            vae_params, self.vae_cfg, lq_img, self.vae_tile, rng, sample_latent,
            stats=self.vae_stats,
        )
        z0 = self._latent_mid(
            unet_params, z, prompt_embeds, tile_size=tile_size, tile_overlap=tile_overlap
        )
        img = routed_vae_decode(
            vae_params, self.vae_cfg, z0, self.vae_tile, stats=self.vae_stats
        )
        return jnp.clip(img, -1.0, 1.0)

    def __call__(
        self,
        lq_img,
        prompt_embeds,
        tile_size: int = 64,
        tile_overlap: int = 32,
        rng=None,
        sample_latent: bool = True,
    ):
        """lq_img (1,H,W,3) in [-1,1]; returns SR image (1,H,W,3) in [-1,1]."""
        if rng is None:
            rng = jax.random.key(0)
            sample_latent = False
        from omgsr_tpu.inference.vae_routing import exact_one_step, wants_exact_path

        if wants_exact_path(self.vae_stats, self.vae_tile, lq_img):
            # exact mode is host-orchestrated (op-streamed VAE around the
            # jitted latent mid-section) — see __init__ docstring
            return exact_one_step(
                self.vae_params, self.vae_cfg, lq_img,
                lambda z: self._jitted_mid(
                    self.unet_params, z, prompt_embeds,
                    tile_size=tile_size, tile_overlap=tile_overlap,
                ),
                rng, sample_latent,
            )
        return self._jitted(
            self.vae_params,
            self.unet_params,
            lq_img,
            prompt_embeds,
            rng,
            tile_size=tile_size,
            tile_overlap=tile_overlap,
            sample_latent=sample_latent,
        )
