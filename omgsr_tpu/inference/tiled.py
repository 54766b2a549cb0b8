"""Tiled-latent denoiser aggregation, fully inside one jit.

Re-implements the reference's _forward_tile (infer/omgsr_s_infer_model.py:
88-168) the TPU way: the tile grid is computed at trace time, tiles are
gathered with dynamic slices, the denoiser runs under lax.scan in fixed-size
batches (one compiled UNet/DiT graph regardless of tile count — unlike the
reference, whose "batching" degenerates to one tile per call, :129), and
predictions are scatter-added with gaussian weights, then normalized by the
contributor sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.diffusion.tiling import gaussian_tile_weights, tile_grid_2d


def auto_tile_batch(n: int, cap: int = 8) -> int:
    """Largest divisor of n in [2, cap] — a padding-free denoiser batch (the
    9-tile 1024-px grid gets 3, the 49-tile 2048 grid gets 7). When n has no
    divisor in range (e.g. prime n), picks the candidate wasting the fewest
    padded tiles, ties to the larger batch (n=13 -> tb 7, 1 pad tile — not
    tb 4, 3 pad tiles)."""
    if n <= 1:
        return max(n, 1)
    for d in range(min(cap, n), 1, -1):
        if n % d == 0:
            return d
    return min(range(2, min(cap, n) + 1), key=lambda d: ((-n) % d, -d))


def tiled_denoise(
    latent: jnp.ndarray,
    denoise_tile,
    tile_size: int,
    tile_overlap: int,
    tile_batch: int | None = 1,
    tile_sharding=None,
):
    """latent (B, H, W, C); denoise_tile: (N, t, t, C) -> (N, t, t, C).

    Returns the stitched prediction, same shape as latent. B > 1 is handled
    by extending the tile list across the image batch (the batch index is a
    third tile coordinate), so one lax.scan covers every (image, tile) pair
    and the denoiser always sees full tile_batch-sized batches — unlike the
    reference, which processes one image and effectively one tile per call.
    tile_batch=None picks a padding-free divisor of the tile count
    (auto_tile_batch) — measured fastest on the 9-tile 1024-px protocol.

    tile_sharding (a NamedSharding over the tile-batch dim, e.g.
    P("data")): TILE-PARALLEL multi-chip inference — the protocol's tiles
    are embarrassingly parallel, so with replicated weights (the int8 12B
    fits one v5e) ONE batched denoiser call runs all tiles with the batch
    dim sharded across chips; XLA all-gathers the small latent predictions
    for the stitch. For single-image latency this beats TP (no per-block
    collectives) whenever the model fits per-chip; use TP/FSDP when it
    doesn't (pipeline_f.shard_for_mesh). Overrides tile_batch.
    """
    b, h, w, c = latent.shape
    t = min(tile_size, h, w)
    if h * w <= tile_size * tile_size:
        return denoise_tile(latent)

    # when the tile clamps to a short latent dim, scale the overlap with it
    # (overlap >= tile would make the grid stride non-positive): a 64x304
    # latent at the -F defaults 128/64 runs 64-px tiles with 32 overlap
    tile_overlap = min(tile_overlap, t // 2)
    grid = tile_grid_2d(h, w, t, tile_overlap)
    n = b * len(grid)
    if tile_sharding is not None:
        return _tile_sharded_denoise(
            latent, denoise_tile, t, grid, tile_sharding
        )
    if tile_batch is None:
        tile_batch = auto_tile_batch(n)
    # (bi, oy, ox) triples over the whole image batch
    triples = [(bi, oy, ox) for bi in range(b) for (oy, ox) in grid]
    pad = (-n) % tile_batch
    # duplicate the last tile to fill the final batch; its weight is counted
    # once because scatter offsets of duplicates coincide -> idempotent? No:
    # scatter-add would double-count. Instead mask duplicates to zero weight.
    offsets = np.asarray(triples + [triples[-1]] * pad, np.int32)  # (n+pad, 3)
    valid = np.asarray([1.0] * n + [0.0] * pad, np.float32)
    n_total = n + pad

    # stitch in float32 like the reference (omgsr_s_infer_model.py:137-139):
    # bf16 running sums round at ~2^-8/add, ~0.4% error in overlap regions
    weights = jnp.asarray(gaussian_tile_weights(t, t), jnp.float32)[None, :, :, None]

    offs = jnp.asarray(offsets).reshape(n_total // tile_batch, tile_batch, 3)
    valid = jnp.asarray(valid).reshape(n_total // tile_batch, tile_batch)

    def gather(off):
        return jax.lax.dynamic_slice(latent, (off[0], off[1], off[2], 0), (1, t, t, c))[0]

    scatter = _make_scatter(weights, t, c)

    def step(carry, inp):
        acc, contrib = carry
        off_b, valid_b = inp
        tiles = jax.vmap(gather)(off_b)  # (tb, t, t, C)
        preds = denoise_tile(tiles)
        (acc, contrib), _ = jax.lax.scan(
            scatter, (acc, contrib), (preds, off_b, valid_b.astype(jnp.float32))
        )
        return (acc, contrib), None

    acc = jnp.zeros(latent.shape, jnp.float32)
    contrib = jnp.zeros(latent.shape, jnp.float32)
    (acc, contrib), _ = jax.lax.scan(step, (acc, contrib), (offs, valid))
    return (acc / contrib).astype(latent.dtype)


def _make_scatter(weights, t, c):
    """lax.scan body adding one gaussian-weighted tile prediction into the
    (acc, contrib) stitch buffers — shared by the unsharded and
    tile-sharded paths so the stitch math cannot diverge between them."""

    def scatter(carry, inp):
        acc, contrib = carry
        pred, off, vld = inp
        wpred = (pred.astype(jnp.float32) * weights[0] * vld)[None]
        wcon = (weights[0] * vld)[None]
        start = (off[0], off[1], off[2], 0)
        cur = jax.lax.dynamic_slice(acc, start, (1, t, t, c))
        acc = jax.lax.dynamic_update_slice(acc, cur + wpred, start)
        curc = jax.lax.dynamic_slice(contrib, start, (1, t, t, c))
        contrib = jax.lax.dynamic_update_slice(contrib, curc + wcon, start)
        return (acc, contrib), None

    return scatter


def _tile_sharded_denoise(latent, denoise_tile, t, grid, tile_sharding):
    """One denoiser call over ALL tiles, batch dim sharded across the mesh
    axis; padded with copies of the last tile to a shard multiple (padding
    masked to zero stitch weight)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    b, h, w, c = latent.shape
    triples = [(bi, oy, ox) for bi in range(b) for (oy, ox) in grid]
    n = len(triples)
    mesh = tile_sharding.mesh
    n_shards = 1
    for ax in tile_sharding.spec:
        if ax is None:
            continue
        for a in ax if isinstance(ax, tuple) else (ax,):
            n_shards *= mesh.shape[a]
    pad = (-n) % n_shards
    offsets = jnp.asarray(triples + [triples[-1]] * pad, jnp.int32)
    valid = jnp.asarray([1.0] * n + [0.0] * pad, jnp.float32)

    def gather(off):
        return jax.lax.dynamic_slice(latent, (off[0], off[1], off[2], 0), (1, t, t, c))[0]

    tiles = jax.vmap(gather)(offsets)
    tiles = jax.lax.with_sharding_constraint(tiles, tile_sharding)
    preds = denoise_tile(tiles)
    # replicate the (small) latent predictions for the sequential stitch
    preds = jax.lax.with_sharding_constraint(preds, NamedSharding(mesh, P()))

    weights = jnp.asarray(gaussian_tile_weights(t, t), jnp.float32)[None, :, :, None]

    scatter = _make_scatter(weights, t, c)
    acc = jnp.zeros(latent.shape, jnp.float32)
    contrib = jnp.zeros(latent.shape, jnp.float32)
    (acc, contrib), _ = jax.lax.scan(scatter, (acc, contrib), (preds, offsets, valid))
    return (acc / contrib).astype(latent.dtype)
