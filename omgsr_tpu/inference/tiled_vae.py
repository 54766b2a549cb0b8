"""Tiled / spatially-sharded VAE for large images.

Replaces the reference's vaehook.py task-queue machine (infer/vaehook.py:
230-829) with two TPU-native strategies:

1. ``sharded_vae_encode/decode`` (multi-chip, EXACT): the input is sharded
   spatially over the mesh; XLA's spatial partitioner inserts the halo
   exchanges for every conv and the cross-device reductions for every
   GroupNorm automatically. This is the halo-exchange pipeline vaehook
   hand-builds with CPU round-trips (:757-825), derived from sharding
   annotations instead.

2. ``streaming_vae_encode/decode`` (single-chip, bounded memory): a
   two-pass scheme mirroring vaehook's fast mode (:714-735): pass 1 runs the
   network on a downsampled copy to record every GroupNorm's statistics
   (via models.vae._GN_HOOK); pass 2 streams overlap-padded tiles through
   the network under lax.scan with the recorded global statistics frozen,
   cropping each tile's valid center (pad 32 px encode / 11 latents decode,
   vaehook:546) — so tiles are seamless and normalization is globally
   consistent without keeping full-image activations alive.
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp

from omgsr_tpu.models import vae as vae_mod

ENCODER_PAD = 32  # pixels of context per tile side (vaehook.py:546)
DECODER_PAD = 11  # latents of context per tile side


# ----------------------------------------------------------------------------
# GroupNorm stat capture / replay hooks
# ----------------------------------------------------------------------------


class _CollectHook:
    def __init__(self):
        self.stats = []

    def __call__(self, p, x, groups):
        b, h, w, c = x.shape
        xg = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
        mean = xg.mean(axis=(1, 3))
        var = xg.var(axis=(1, 3))
        self.stats.append((mean, var))
        return _apply_gn(p, x, groups, mean, var)


class _ReplayHook:
    def __init__(self, stats):
        self.stats = list(stats)
        self.i = 0

    def __call__(self, p, x, groups):
        mean, var = self.stats[self.i]
        self.i += 1
        return _apply_gn(p, x, groups, mean, var)


def _apply_gn(p, x, groups, mean, var, eps=1e-6):
    b, h, w, c = x.shape
    orig = x.dtype
    xg = x.astype(jnp.float32).reshape(b, h, w, groups, c // groups)
    xg = (xg - mean[:, None, None, :, None]) * jax.lax.rsqrt(var[:, None, None, :, None] + eps)
    xn = xg.reshape(b, h, w, c)
    return (
        xn * p["scale"].astype(jnp.float32) + p["bias"].astype(jnp.float32)
    ).astype(orig)


class _use_hook:
    def __init__(self, hook):
        self.hook = hook

    def __enter__(self):
        self.prev = vae_mod._GN_HOOK
        vae_mod._GN_HOOK = self.hook
        return self.hook

    def __exit__(self, *a):
        vae_mod._GN_HOOK = self.prev


# ----------------------------------------------------------------------------
# single-chip streaming mode
# ----------------------------------------------------------------------------


def _net_encode(params, cfg, x, rng, sample):
    moments = vae_mod.vae_encode_features(params, cfg, x)
    z = vae_mod.sample_diagonal_gaussian(moments, rng, sample=sample and rng is not None)
    if cfg.shift_factor is not None:
        return (z - cfg.shift_factor) * cfg.scaling_factor
    return z * cfg.scaling_factor


def _streamed(params, cfg, x, net, tile: int, pad: int, scale_num: int, scale_den: int, est_size: int):
    """Shared streaming driver. net(params, cfg, x) must be shape-preserving
    up to the scale factor scale_num/scale_den.

    Windows are clamped *inside* the image (never synthetic-padded) so true
    image borders keep the conv stack's own zero-padding semantics — exactly
    like untiled execution; interior tile edges get ``pad`` elements of real
    context (vaehook's exactness-padding idea, :577-634).
    """
    b, h, w, c = x.shape
    assert b == 1, "streaming VAE expects batch 1"

    # pass 1: stats from a downsampled copy (vaehook fast mode, :714-735)
    est_h = max(min(est_size, h) // 8 * 8, 8)
    est_w = max(min(est_size, w) // 8 * 8, 8)
    small = jax.image.resize(x, (b, est_h, est_w, c), "linear")
    collect = _CollectHook()
    with _use_hook(collect):
        net(params, cfg, small)
    stats = tuple(collect.stats)

    win = tile + 2 * pad
    if h < win or w < win:
        # too small to tile: run whole input with the global stats
        with _use_hook(_ReplayHook(stats)):
            return net(params, cfg, x)

    # encoder windows must stay phase-aligned with the stride-2 downsamplers:
    # align window starts (and tile offsets) to the total downscale factor
    align = scale_den if scale_den > 1 else 1

    def grid_1d(size):
        n = math.ceil(size / tile)
        offs, wstarts = [], []
        for i in range(n):
            o = min(i * tile, size - tile) // align * align
            ws = min(max(0, o - pad), size - win) // align * align
            offs.append(o)
            wstarts.append(ws)
        return offs, wstarts

    ys, wys = grid_1d(h)
    xs, wxs = grid_1d(w)
    # per-tile: window start (wy,wx), output placement (oy,ox), crop offset
    tiles = [
        (wy, wx, oy, ox, oy - wy, ox - wx)
        for oy, wy in zip(ys, wys)
        for ox, wx in zip(xs, wxs)
    ]
    tiles_arr = jnp.asarray(tiles, jnp.int32)

    def tile_fn(window, crop_y, crop_x):
        with _use_hook(_ReplayHook(stats)):
            o = net(params, cfg, window)
        return jax.lax.dynamic_slice(
            o,
            (0, crop_y * scale_num // scale_den, crop_x * scale_num // scale_den, 0),
            (1, tile * scale_num // scale_den, tile * scale_num // scale_den, o.shape[-1]),
        )

    probe = jax.eval_shape(
        lambda win_: tile_fn(win_, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)),
        jax.ShapeDtypeStruct((1, win, win, c), x.dtype),
    )
    out = jnp.zeros(
        (1, h * scale_num // scale_den, w * scale_num // scale_den, probe.shape[-1]),
        probe.dtype,
    )

    def body(out, t):
        wy, wx, oy, ox, cy, cx = t[0], t[1], t[2], t[3], t[4], t[5]
        window = jax.lax.dynamic_slice(x, (0, wy, wx, 0), (1, win, win, c))
        o = tile_fn(window, cy, cx)
        out = jax.lax.dynamic_update_slice(
            out, o, (0, oy * scale_num // scale_den, ox * scale_num // scale_den, 0)
        )
        return out, None

    out, _ = jax.lax.scan(body, out, tiles_arr)
    return out


def streaming_vae_encode(
    params, cfg, x, rng=None, sample: bool = False, tile: int = 512, pad: int = ENCODER_PAD,
    est_size: int = 512,
):
    """pixels (1,H,W,3) -> scaled latent, bounded memory.

    Sampling uses the mean if rng is None. NOTE the latent noise is drawn
    per-tile deterministically from tile content when sampling — pass
    rng=None (mean) for strict tile-order invariance.
    """
    ds = cfg.downscale

    def net(p, c, xx):
        return _net_encode(p, c, xx, rng, sample)

    return _streamed(params, cfg, x, net, tile, pad, 1, ds, est_size)


def streaming_vae_decode(
    params, cfg, z, tile: int = 64, pad: int = DECODER_PAD, est_size: int = 64
):
    """scaled latent (1,h,w,C) -> pixels, bounded memory."""
    ds = cfg.downscale

    def net(p, c, zz):
        return vae_mod.vae_decode(p, c, zz)

    return _streamed(params, cfg, z, net, tile, pad, ds, 1, est_size)


# ----------------------------------------------------------------------------
# multi-chip spatially-sharded mode (exact)
# ----------------------------------------------------------------------------


def sharded_vae_decode(params, cfg, z, mesh, axis: str = "data"):
    """Exact decode with the latent sharded over H across ``axis``; XLA
    emits conv halo exchanges + global GroupNorm reductions."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    zs = jax.device_put(z, NamedSharding(mesh, P(None, axis, None, None)))
    fn = jax.jit(
        partial(vae_mod.vae_decode, cfg=cfg),
        out_shardings=NamedSharding(mesh, P()),
    )
    return fn(params, z=zs)


def sharded_vae_encode(params, cfg, x, mesh, axis: str = "data"):
    from jax.sharding import NamedSharding, PartitionSpec as P

    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))

    def enc(params, x):
        return vae_mod.vae_encode(params, cfg, x, rng=None)

    fn = jax.jit(enc, out_shardings=NamedSharding(mesh, P()))
    return fn(params, xs)
