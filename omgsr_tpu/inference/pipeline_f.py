"""OMGSR-F one-step inference pipeline (FLUX DiT @ mid-timestep 244).

TPU-native equivalent of infer/omgsr_f_infer_model.py: FLUX-VAE encode,
per-tile 2x2 pack -> DiT velocity prediction at sigma_244 (guidance 1.0) ->
unpack, gaussian stitching, one Euler step z + (0 - sigma)*v (:316), decode.
RoPE ids are computed once for the tile size and shared by all tiles —
valid because every tile is exactly tile_size latents (the reference relies
on the same invariant, infer/infer_omgsr_f.py:50-55).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from omgsr_tpu.diffusion.packing import latent_image_ids, pack_latents, unpack_latents
from omgsr_tpu.diffusion.schedules import flux_sigma_at_mid_timestep
from omgsr_tpu.inference.tiled import tiled_denoise
from omgsr_tpu.models import flux, vae
from omgsr_tpu.models.configs import FLUX_DEV, FLUX_VAE, FluxConfig, VAEConfig


def flux_auto_tile_batch(tile_size: int, txt_len: int):
    """Default tile batch for the tiled-DiT path when the caller passes
    tile_batch=None. At seq >= 4096 tokens per tile each DiT forward is
    already compute-dense and batching tiles only adds layout/VPU cost:
    measured on the 12B w8a8 512->2048 protocol (9 seq-4608 tiles,
    interleaved A/B) tb1 runs 5.44 s/image vs the divisor heuristic's tb3
    at 6.11 s. Below that (e.g. seq-1536 tiles) the padding-free-divisor
    heuristic (tiled.auto_tile_batch, returned here as None) still wins —
    there the 3x weight-read amortization dominates."""
    return 1 if (tile_size // 2) ** 2 + txt_len >= 4096 else None


class OMGSRFPipeline:
    def __init__(
        self,
        vae_params,
        flux_params,
        vae_cfg: VAEConfig = FLUX_VAE,
        flux_cfg: FluxConfig = FLUX_DEV,
        mid_timestep: int = 244,
        guidance_scale: float = 1.0,
        tile_batch: int | None = None,
        scan_blocks: bool = True,
        vae_tile: int | None = None,
        vae_stats: str = "fast",
    ):
        """vae_tile / vae_stats mirror OMGSRSPipeline: when vae_tile is set,
        the VAE encode/decode stream through overlap-padded tiles for 2-4K
        images (vae_stats="fast" keeps one XLA graph with downsampled-stat
        GroupNorm; "exact" op-streams with tile-accumulated global stats ==
        full-image VAE to float tolerance, host-orchestrated around the
        jitted tiled-DiT mid-section)."""
        from omgsr_tpu.inference.vae_routing import validate_vae_opts

        validate_vae_opts(vae_tile, vae_stats, vae_cfg.downscale)
        # cfg.fused_resblocks stays OFF by default (see pipeline_s note)
        if scan_blocks and "stacked" not in flux_params.get("transformer_blocks", {}):
            # scan over stacked block params: one compiled block body instead
            # of 57 unrolled copies (compile time for the 12B DiT)
            flux_params = flux.stack_block_params(flux_params)
        self.vae_params = vae_params
        self.flux_params = flux_params
        self.vae_cfg = vae_cfg
        self.flux_cfg = flux_cfg
        self.mid_timestep = mid_timestep
        self.sigma_t = flux_sigma_at_mid_timestep(mid_timestep)
        self.guidance_scale = guidance_scale
        self.tile_batch = tile_batch
        self.vae_tile = vae_tile
        self.vae_stats = vae_stats
        self._rebuild_jit()

    def _rebuild_jit(self):
        """Fresh jit wrappers. Called again by shard_for_mesh: the traced
        functions read `self._tile_sharding` at trace time, so a pipeline
        that already ran unsharded must not serve a cached unsharded
        executable after sharding."""
        self._jitted = functools.partial(
            jax.jit, static_argnames=("tile_size", "tile_overlap", "sample_latent")
        )(self._forward)
        self._jitted_mid = functools.partial(
            jax.jit, static_argnames=("tile_size", "tile_overlap")
        )(self._latent_mid)

    def _latent_mid(
        self, flux_params, z, prompt_embeds, pooled_prompt_embeds,
        *, tile_size, tile_overlap,
    ):
        """latent -> x0 latent: tiled DiT velocity + Euler step to t=0."""
        txt_ids = jnp.zeros((prompt_embeds.shape[-2], 3), jnp.float32)

        def denoise(tiles):
            n, th, tw, c = tiles.shape
            img_ids = latent_image_ids(th // 2, tw // 2)
            packed = pack_latents(tiles)
            ctx = jnp.broadcast_to(prompt_embeds, (n,) + prompt_embeds.shape[-2:]).astype(tiles.dtype)
            pooled = jnp.broadcast_to(
                pooled_prompt_embeds, (n,) + pooled_prompt_embeds.shape[-1:]
            ).astype(tiles.dtype)
            v = flux.flux_apply(
                flux_params,
                self.flux_cfg,
                packed,
                self.sigma_t,
                self.guidance_scale,
                pooled,
                ctx,
                txt_ids,
                img_ids,
            )
            return unpack_latents(v, th, tw)

        tb = self.tile_batch
        if tb is None:
            # feed the selector the tile size tiled_denoise actually runs
            # (clamped to the latent), not the nominal request — on a
            # 96x160-latent image with tile 128 the real tiles are 96 px
            # (seq 2816), the regime where the divisor heuristic wins
            tb = flux_auto_tile_batch(
                min(tile_size, z.shape[1], z.shape[2]), prompt_embeds.shape[-2]
            )
        v = tiled_denoise(
            z, denoise, tile_size, tile_overlap, tb,
            tile_sharding=getattr(self, "_tile_sharding", None),
        )
        # Euler step to t=0: z + (0 - sigma_t) * v
        return z - self.sigma_t * v

    def _forward(
        self,
        vae_params,
        flux_params,
        lq_img,
        prompt_embeds,
        pooled_prompt_embeds,
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
            flux_params, z, prompt_embeds, pooled_prompt_embeds,
            tile_size=tile_size, tile_overlap=tile_overlap,
        )
        img = routed_vae_decode(
            vae_params, self.vae_cfg, z0, self.vae_tile, stats=self.vae_stats
        )
        return jnp.clip(img, -1.0, 1.0)

    def shard_for_mesh(self, mesh, strategy: str = "fsdp", *, min_size: int = 2**18):
        """Shard the 12B DiT parameters over the mesh so -F inference fits
        small slices. strategy="fsdp": ZeRO-3 weight sharding (XLA inserts
        the gathers). strategy="tp": Megatron-style tensor parallelism over
        the mesh's "tp" axis — attention heads and ffn hidden stay resident
        per-shard, so the per-block collective is one reduce per row-parallel
        projection instead of gathering every weight (the right trade when
        the DiT matmuls dominate, SURVEY §2c). strategy="tiles": replicated
        weights + the protocol's tile batch sharded over the "data" axis —
        near-linear single-image latency scaling when the model fits per
        chip (e.g. the int8 12B). The VAE (84M) stays replicated."""
        from omgsr_tpu.parallel import (
            device_put_params,
            replicated,
            shard_params_flux_tp,
            shard_params_fsdp,
        )

        if strategy == "tiles":
            # TILE-PARALLEL: weights replicated (int8 12B fits one v5e),
            # the tile batch sharded over the mesh's "data" axis — the
            # protocol's tiles are embarrassingly parallel, so single-image
            # latency scales ~linearly with chips and the only collective
            # is one all-gather of the small latent predictions before the
            # stitch. Use fsdp/tp when the model does NOT fit per chip.
            from jax.sharding import NamedSharding, PartitionSpec as P

            rep = replicated(mesh)
            self.flux_params = jax.tree.map(
                lambda x: jax.device_put(x, rep), self.flux_params
            )
            self.vae_params = jax.tree.map(
                lambda x: jax.device_put(x, rep), self.vae_params
            )
            self._tile_sharding = NamedSharding(mesh, P("data"))
            self._rebuild_jit()
            return self
        if strategy == "tp":
            shardings = shard_params_flux_tp(self.flux_params, mesh, min_size)
        elif strategy == "fsdp":
            shardings = shard_params_fsdp(self.flux_params, mesh, min_size)
        else:
            raise ValueError(f"strategy must be 'fsdp', 'tp' or 'tiles', got {strategy!r}")
        self.flux_params = device_put_params(self.flux_params, shardings)
        rep = replicated(mesh)
        self.vae_params = jax.tree.map(lambda x: jax.device_put(x, rep), self.vae_params)
        # a previous strategy="tiles" call may have left a tile sharding on
        # another mesh; fsdp/tp tiles run unsharded — clear it and retrace
        self._tile_sharding = None
        self._rebuild_jit()
        return self

    def __call__(
        self,
        lq_img,
        prompt_embeds,
        pooled_prompt_embeds,
        tile_size: int = 128,
        tile_overlap: int = 64,
        rng=None,
        sample_latent: bool = True,
    ):
        if rng is None:
            rng = jax.random.key(0)
            sample_latent = False
        from omgsr_tpu.inference.vae_routing import exact_one_step, wants_exact_path

        if wants_exact_path(self.vae_stats, self.vae_tile, lq_img):
            # exact mode is host-orchestrated (op-streamed VAE around the
            # jitted tiled-DiT mid-section) — see __init__ docstring
            return exact_one_step(
                self.vae_params, self.vae_cfg, lq_img,
                lambda z: self._jitted_mid(
                    self.flux_params, z, prompt_embeds, pooled_prompt_embeds,
                    tile_size=tile_size, tile_overlap=tile_overlap,
                ),
                rng, sample_latent,
            )
        return self._jitted(
            self.vae_params,
            self.flux_params,
            lq_img,
            prompt_embeds,
            pooled_prompt_embeds,
            rng,
            tile_size=tile_size,
            tile_overlap=tile_overlap,
            sample_latent=sample_latent,
        )
