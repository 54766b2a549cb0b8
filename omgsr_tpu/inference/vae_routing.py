"""Shared VAE routing for the one-step pipelines.

Both OMGSRSPipeline and OMGSRFPipeline offer the same three VAE execution
modes (full-image / streaming-tiled fast-stats / exact-tiled); this module
holds the routing, option validation, and batch handling ONCE so the two
pipelines cannot drift (the reference duplicates its vaehook wiring per
infer model, infer/omgsr_s_infer_model.py:34-54 vs omgsr_f_infer_model.py).

Batch handling: the streaming tiled VAE processes one image at a time
(bounded memory is the point); batched inputs — the --batch_size serving
path — are looped per image inside the jitted graph (static unroll) with a
folded PRNG per image, instead of crashing on the batch-1 assert.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omgsr_tpu.models import vae as vae_mod


def validate_vae_opts(vae_tile, vae_stats: str, downscale: int) -> None:
    """Raise early on option combinations that would silently corrupt output
    or crash at trace time: the streaming grid aligns tile offsets to the
    VAE's total downscale factor, so a tile that is not a multiple of it
    leaves unwritten bands in the latent; a tile below it makes the latent
    tile size zero."""
    if vae_stats not in ("fast", "exact", "auto"):
        raise ValueError(
            f"vae_stats must be 'fast', 'exact' or 'auto', got {vae_stats!r}"
        )
    if vae_tile is not None:
        if vae_tile < downscale or vae_tile % downscale != 0:
            raise ValueError(
                f"vae_tile must be a positive multiple of the VAE downscale "
                f"factor ({downscale}), got {vae_tile}"
            )


def _per_image(fn, x, rng):
    """Apply fn(x_i, rng_i) per image and re-stack. rng is folded per image
    UNCONDITIONALLY (including batch 1) so an image's noise draw does not
    depend on how requests were grouped into batches."""
    return jnp.concatenate(
        [fn(x[i : i + 1], jax.random.fold_in(rng, i)) for i in range(x.shape[0])],
        axis=0,
    )


def routed_vae_encode(params, cfg, x, vae_tile, rng, sample: bool, stats: str = "fast"):
    """Full-image or streaming-tiled encode; forwards sampling semantics to
    the streaming path too (note streaming draws per-tile noise from rng
    folded with the tile index — documented in streaming_vae_encode)."""
    # gate on the LARGEST dim like the reference (vaehook.py:554): a
    # 1024x8192 image must tile even though its short side fits
    if vae_tile and max(x.shape[1], x.shape[2]) > vae_tile:
        from omgsr_tpu.inference.tiled_vae import streaming_vae_encode

        return _per_image(
            lambda xi, ri: streaming_vae_encode(
                params, cfg, xi, rng=ri if sample else None, sample=sample,
                tile=vae_tile, est_size=vae_tile,
                stats="auto" if stats == "auto" else "fast",
            ),
            x, rng,
        )
    return vae_mod.vae_encode(params, cfg, x, rng=rng if sample else None)


def routed_vae_decode(params, cfg, z, vae_tile, stats: str = "fast"):
    lat_tile = vae_tile // cfg.downscale if vae_tile else 0
    if vae_tile and max(z.shape[1], z.shape[2]) > lat_tile:
        from omgsr_tpu.inference.tiled_vae import streaming_vae_decode

        # "exact" at this level routes through exact_one_step in the
        # pipelines; "auto" reaches here and escalates inside streaming_vae_*
        # past the measured-accurate downsample ratio
        return _per_image(
            lambda zi, _ri: streaming_vae_decode(
                params, cfg, zi, tile=lat_tile, est_size=lat_tile,
                stats="auto" if stats == "auto" else "fast",
            ),
            z, jax.random.key(0),
        )
    return vae_mod.vae_decode(params, cfg, z)


def wants_exact_path(vae_stats: str, vae_tile, lq_img) -> bool:
    """True when the host-orchestrated exact mode should run: explicit
    "exact", or "auto" past the measured-accurate fast-stats downsample
    ratio (tiled_vae.AUTO_EXACT_RATIO). Decided here — on static shapes,
    outside jit — because the exact op-streamed plan cannot live inside
    the one-graph fast path."""
    if not (vae_tile and max(lq_img.shape[1], lq_img.shape[2]) > vae_tile):
        return False
    if vae_stats == "exact":
        return True
    if vae_stats == "auto":
        from omgsr_tpu.inference.tiled_vae import AUTO_EXACT_RATIO

        ratio = max(lq_img.shape[1], lq_img.shape[2]) / vae_tile
        return ratio > AUTO_EXACT_RATIO
    return False


def exact_one_step(vae_params, cfg, lq_img, mid_fn, rng, sample: bool):
    """Host-orchestrated exact mode: op-streamed VAE with tile-accumulated
    global GroupNorm statistics around a jitted latent mid-section.
    mid_fn(z) -> x0 latent."""
    from omgsr_tpu.inference.tiled_vae import exact_vae_decode, exact_vae_encode

    z = exact_vae_encode(
        vae_params, cfg, lq_img, rng=rng if sample else None, sample=sample
    )
    z0 = mid_fn(z)
    img = exact_vae_decode(vae_params, cfg, z0)
    return jnp.clip(img, -1.0, 1.0)
