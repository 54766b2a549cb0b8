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

3. ``exact_vae_encode/decode`` (single-chip, EXACT; also reachable as
   ``streaming_vae_*(..., stats="exact")``): the TPU-native analogue of
   vaehook's DEFAULT mode (per-tile GroupNorm stat accumulation before
   normalizing, infer/vaehook.py:459-534, :774-825). The network is executed
   as a flat op plan — each conv/resnet primitive is its own jitted call on a
   stored full-resolution boundary buffer, so the working set is a few widest
   -layer buffers instead of the fused whole-graph's — and every GroupNorm's
   statistics are accumulated TILE-WISE over row chunks of the stored buffer
   (fp32, two passes: mean, then centered second moment — no cancellation),
   then applied elementwise. Because chunk sums partition the image exactly,
   the result equals untiled execution to float tolerance — strictly stronger
   than vaehook's exact mode, whose summary() pixel-weight-averages per-tile
   VARIANCES (dropping the between-tile mean-variance term, :489-508).
   Mid-block attention policy: applied globally at 1/8 resolution (exact;
   its GroupNorm sees the full buffer). O(n_latent^2) attention cost bounds
   practical size — at 4K (512x512 latent) it is ~70 TFLOP, beyond that use
   the sharded mode or fast stats.
"""

from __future__ import annotations

import math
import threading
from functools import partial

import jax
import jax.numpy as jnp

from omgsr_tpu.models import vae as vae_mod

ENCODER_PAD = 32  # pixels of context per tile side (vaehook.py:546)
DECODER_PAD = 11  # latents of context per tile side

# Fast-mode accuracy (measured 2026-08-17, pink-noise/1/f "natural-like"
# latents, damped pretrained-like tiny VAE, decode; error relative to the
# untiled output's dynamic range, WITH the nearest-resize + moment
# -renormalization correction below — without it the same fixtures measure
# ~10x worse, e.g. ratio 4: mean 0.21 / q99 1.12 uncorrected):
#
#   downsample ratio (max(h,w)/est)   mean rel err   q99 rel err
#   1 (no downsample)                 0.0001         0.001
#   2                                 0.010          0.05
#   2.7                               0.013          0.08
#   4                                 0.019          0.12
#   6                                 0.035          0.23
#   8                                 0.019          0.11
#
# stats="auto" escalates from fast to exact above this ratio (mean error
# stays ~<2% below it; exact streaming costs only ~16% more wall-clock at
# 2K on a v5e — CLAUDE.md perf notes):
AUTO_EXACT_RATIO = 4.0


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


# vae_mod._GN_HOOK is process-global state consumed at TRACE time: two
# threads tracing streamed VAE graphs concurrently (e.g. the serving
# daemon's first requests at different shapes with --vae_tile) would
# interleave collect/replay streams. One lock serializes hook scopes.
_HOOK_LOCK = threading.RLock()


class _use_hook:
    def __init__(self, hook):
        self.hook = hook

    def __enter__(self):
        _HOOK_LOCK.acquire()
        self.prev = vae_mod._GN_HOOK
        vae_mod._GN_HOOK = self.hook
        return self.hook

    def __exit__(self, *a):
        vae_mod._GN_HOOK = self.prev
        _HOOK_LOCK.release()


# ----------------------------------------------------------------------------
# single-chip streaming mode
# ----------------------------------------------------------------------------


def _net_encode(params, cfg, x, rng, sample, idx=None):
    moments = vae_mod.vae_encode_features(params, cfg, x)
    if rng is not None and idx is not None:
        # per-tile key: identical keys + identical window shapes would give
        # every interior tile the SAME noise draw (a spatially periodic
        # noise pattern across the streamed latent)
        rng = jax.random.fold_in(rng, idx)
    z = vae_mod.sample_diagonal_gaussian(moments, rng, sample=sample and rng is not None)
    return vae_mod.scale_latent(cfg, z)


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

    # pass 1: stats from a downsampled copy (vaehook fast mode, :714-735).
    # Nearest resize keeps per-pixel value statistics (a linear filter
    # low-passes away variance); the downsample still shifts the per-channel
    # moments, so renormalize them back to the full image's and clamp to the
    # full image's range (vaehook.py:723-731, the @Kahsolt correction).
    win = tile + 2 * pad
    if h <= win and w <= win:
        # fits one window: whole-input execution costs the same activation
        # memory as untiled, so skip the stats pass and replay hook — local
        # GroupNorm stats ARE the global stats here (bit-exact with untiled)
        return net(params, cfg, x)

    est_h = max(min(est_size, h) // 8 * 8, 8)
    est_w = max(min(est_size, w) // 8 * 8, 8)
    small = jax.image.resize(x, (b, est_h, est_w, c), "nearest")
    if (est_h, est_w) != (h, w):
        x32 = x.astype(jnp.float32)
        s32 = small.astype(jnp.float32)
        mean_old = x32.mean(axis=(0, 1, 2))
        std_old = x32.std(axis=(0, 1, 2))
        mean_new = s32.mean(axis=(0, 1, 2))
        std_new = jnp.maximum(s32.std(axis=(0, 1, 2)), 1e-6)
        s32 = (s32 - mean_new) / std_new * std_old + mean_old
        s32 = jnp.clip(s32, x32.min(), x32.max())
        small = s32.astype(x.dtype)
    collect = _CollectHook()
    with _use_hook(collect):
        net(params, cfg, small)
    stats = tuple(collect.stats)

    # encoder windows must stay phase-aligned with the stride-2 downsamplers:
    # align window starts (and tile offsets) to the total downscale factor
    align = scale_den if scale_den > 1 else 1

    def axis_plan(size):
        """Per-axis tiling; a dim that fits one window is spanned whole (a
        1024x8192 input tiles along W only — the gate is on max(H, W))."""
        if size <= win:
            return [0], [0], size, size
        offs, wstarts = [], []
        for i in range(math.ceil(size / tile)):
            o = min(i * tile, size - tile) // align * align
            ws = min(max(0, o - pad), size - win) // align * align
            offs.append(o)
            wstarts.append(ws)
        return offs, wstarts, tile, win

    ys, wys, tile_h, win_h = axis_plan(h)
    xs, wxs, tile_w, win_w = axis_plan(w)
    # per-tile: window start (wy,wx), output placement (oy,ox), crop offset
    tiles = [
        (wy, wx, oy, ox, oy - wy, ox - wx)
        for oy, wy in zip(ys, wys)
        for ox, wx in zip(xs, wxs)
    ]
    tiles_arr = jnp.asarray(tiles, jnp.int32)

    def tile_fn(window, crop_y, crop_x, idx):
        with _use_hook(_ReplayHook(stats)):
            o = net(params, cfg, window, idx=idx)
        return jax.lax.dynamic_slice(
            o,
            (0, crop_y * scale_num // scale_den, crop_x * scale_num // scale_den, 0),
            (1, tile_h * scale_num // scale_den, tile_w * scale_num // scale_den,
             o.shape[-1]),
        )

    probe = jax.eval_shape(
        lambda win_: tile_fn(
            win_, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32),
            jnp.zeros((), jnp.int32),
        ),
        jax.ShapeDtypeStruct((1, win_h, win_w, c), x.dtype),
    )
    out = jnp.zeros(
        (1, h * scale_num // scale_den, w * scale_num // scale_den, probe.shape[-1]),
        probe.dtype,
    )

    def body(out, t_idx):
        t, idx = t_idx
        wy, wx, oy, ox, cy, cx = t[0], t[1], t[2], t[3], t[4], t[5]
        window = jax.lax.dynamic_slice(x, (0, wy, wx, 0), (1, win_h, win_w, c))
        o = tile_fn(window, cy, cx, idx)
        out = jax.lax.dynamic_update_slice(
            out, o, (0, oy * scale_num // scale_den, ox * scale_num // scale_den, 0)
        )
        return out, None

    out, _ = jax.lax.scan(body, out, (tiles_arr, jnp.arange(len(tiles), dtype=jnp.int32)))
    return out


def streaming_vae_encode(
    params, cfg, x, rng=None, sample: bool = False, tile: int = 512, pad: int = ENCODER_PAD,
    est_size: int = 512, stats: str = "fast",
):
    """pixels (1,H,W,3) -> scaled latent, bounded memory.

    stats="fast": GroupNorm statistics estimated from a downsampled copy
    (vaehook fast mode). stats="exact": exact global statistics via the
    op-streamed plan (``exact_vae_encode``; tile/pad/est_size unused).
    stats="auto": fast while the stat downsample ratio stays within the
    measured-accurate regime (AUTO_EXACT_RATIO), exact beyond it.

    Sampling uses the mean if rng is None. NOTE when sampling, each tile
    draws its noise from rng folded with the tile index (NOT the full-image
    draw, and NOT one repeated patch) — pass rng=None (mean) for strict
    equality with untiled mean-encoding.
    """
    if stats == "auto":
        ratio = max(x.shape[1], x.shape[2]) / est_size
        stats = "fast" if ratio <= AUTO_EXACT_RATIO else "exact"
    if stats == "exact":
        return exact_vae_encode(params, cfg, x, rng=rng, sample=sample)
    if stats != "fast":
        raise ValueError(f"stats must be 'fast', 'exact' or 'auto', got {stats!r}")
    ds = cfg.downscale

    def net(p, c, xx, idx=None):
        return _net_encode(p, c, xx, rng, sample, idx)

    return _streamed(params, cfg, x, net, tile, pad, 1, ds, est_size)


def streaming_vae_decode(
    params, cfg, z, tile: int = 64, pad: int = DECODER_PAD, est_size: int = 64,
    stats: str = "fast",
):
    """scaled latent (1,h,w,C) -> pixels, bounded memory. See
    streaming_vae_encode for the ``stats`` option."""
    if stats == "auto":
        ratio = max(z.shape[1], z.shape[2]) / est_size
        stats = "fast" if ratio <= AUTO_EXACT_RATIO else "exact"
    if stats == "exact":
        return exact_vae_decode(params, cfg, z)
    if stats != "fast":
        raise ValueError(f"stats must be 'fast', 'exact' or 'auto', got {stats!r}")
    ds = cfg.downscale

    def net(p, c, zz, idx=None):
        return vae_mod.vae_decode(p, c, zz)

    return _streamed(params, cfg, z, net, tile, pad, ds, 1, est_size)


# ----------------------------------------------------------------------------
# single-chip EXACT mode: op-streamed plan + tile-accumulated GN statistics
# ----------------------------------------------------------------------------


@partial(jax.jit, static_argnames=("padding",))
def _op_conv(p, h, padding):
    from omgsr_tpu.models.layers import conv2d

    return conv2d(p, h, padding=padding)


@jax.jit
def _op_downsample(p, h):
    return vae_mod.downsample_conv_2x(p, h)  # the ONE Downsample2D definition


@jax.jit
def _op_upsample(p, h):
    from omgsr_tpu.models.layers import upsample_conv_2x

    return upsample_conv_2x(p, h)


@jax.jit
def _op_add(a, b):
    return a + b


@jax.jit
def _op_shortcut_add(p, x, h):
    from omgsr_tpu.models.layers import conv2d

    return conv2d(p, x, padding=0) + h


@partial(jax.jit, static_argnames=("groups",))
def _op_attn(p, h, groups):
    # full-buffer apply: the attention block's GroupNorm computes its
    # statistics over the whole tensor here, which IS the global statistic
    return vae_mod._mid_attention(p, h, groups)


@partial(jax.jit, static_argnames=("groups",))
def _chunk_sum(x, groups):
    b, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    return xg.sum(axis=(1, 3))


@partial(jax.jit, static_argnames=("groups",))
def _chunk_sqdev(x, mean, groups):
    b, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(b, h * w, groups, c // groups)
    d = xg - mean[:, None, :, None]
    return (d * d).sum(axis=(1, 3))


def _tiled_gn_stats(h, groups, rows):
    """Exact global GroupNorm statistics accumulated over row-chunk tiles of
    the stored buffer (the math of vaehook's GroupNormParam accumulation,
    infer/vaehook.py:459-508, but with the exact two-pass combination).
    Chunk sums partition the image, so the totals equal full-image stats."""
    b, height, width, c = h.shape
    denom = height * width * (c // groups)
    rows = max(min(rows, height), 1)
    # slice inside the loops so each chunk's device buffer frees after its
    # partial sum — a pre-built chunk list would keep a full extra copy of
    # the buffer alive across both passes (the memory this mode bounds)
    starts = range(0, height, rows)
    s = None
    for i in starts:
        cs = _chunk_sum(h[:, i : min(i + rows, height)], groups)
        s = cs if s is None else _op_add(s, cs)
    mean = s / denom
    v = None
    for i in starts:
        cv = _chunk_sqdev(h[:, i : min(i + rows, height)], mean, groups)
        v = cv if v is None else _op_add(v, cv)
    var = v / denom
    return mean, var


@partial(jax.jit, static_argnames=("groups", "with_silu"))
def _op_gn_apply(p, h, mean, var, groups, with_silu):
    from omgsr_tpu.models.layers import silu

    y = _apply_gn(p, h, groups, mean, var)
    return silu(y) if with_silu else y


def _resnet_plan(rp, g):
    items = [
        ("push", None, None),
        ("gn", rp["norm1"], (g, True)),
        ("conv", rp["conv1"], 1),
        ("gn", rp["norm2"], (g, True)),
        ("conv", rp["conv2"], 1),
    ]
    if "conv_shortcut" in rp:
        items.append(("shortcut_add", rp["conv_shortcut"], None))
    else:
        items.append(("add", None, None))
    return items


def _mid_plan(mp, g):
    items = _resnet_plan(mp["resnets"]["0"], g)
    if "attentions" in mp:
        items.append(("attn", mp["attentions"]["0"], g))
    items += _resnet_plan(mp["resnets"]["1"], g)
    return items


def _encoder_plan(params, cfg):
    p = params["encoder"]
    g = cfg.norm_num_groups
    plan = [("conv", p["conv_in"], 1)]
    for i in range(len(cfg.block_out_channels)):
        blk = p["down_blocks"][str(i)]
        for j in range(cfg.layers_per_block):
            plan += _resnet_plan(blk["resnets"][str(j)], g)
        if "downsamplers" in blk:
            plan.append(("downsample", blk["downsamplers"]["0"]["conv"], None))
    plan += _mid_plan(p["mid_block"], g)
    plan.append(("gn", p["conv_norm_out"], (g, True)))
    plan.append(("conv", p["conv_out"], 1))
    if "quant_conv" in params:
        plan.append(("conv", params["quant_conv"], 0))
    return plan


def _decoder_plan(params, cfg):
    p = params["decoder"]
    g = cfg.norm_num_groups
    plan = []
    if "post_quant_conv" in params:
        plan.append(("conv", params["post_quant_conv"], 0))
    plan.append(("conv", p["conv_in"], 1))
    plan += _mid_plan(p["mid_block"], g)
    for i in range(len(cfg.block_out_channels)):
        blk = p["up_blocks"][str(i)]
        for j in range(cfg.layers_per_block + 1):
            plan += _resnet_plan(blk["resnets"][str(j)], g)
        if "upsamplers" in blk:
            plan.append(("upsample", blk["upsamplers"]["0"]["conv"], None))
    plan.append(("gn", p["conv_norm_out"], (g, True)))
    plan.append(("conv", p["conv_out"], 1))
    return plan


def _exec_plan(plan, h, stat_rows):
    stack = []
    for kind, p, meta in plan:
        if kind == "push":
            stack.append(h)
        elif kind == "add":
            h = _op_add(stack.pop(), h)
        elif kind == "shortcut_add":
            h = _op_shortcut_add(p, stack.pop(), h)
        elif kind == "conv":
            h = _op_conv(p, h, meta)
        elif kind == "downsample":
            h = _op_downsample(p, h)
        elif kind == "upsample":
            h = _op_upsample(p, h)
        elif kind == "attn":
            h = _op_attn(p, h, meta)
        elif kind == "gn":
            g, with_silu = meta
            mean, var = _tiled_gn_stats(h, g, stat_rows)
            h = _op_gn_apply(p, h, mean, var, g, with_silu)
        else:  # pragma: no cover
            raise ValueError(f"unknown plan op {kind}")
    return h


def exact_vae_encode(params, cfg, x, rng=None, sample: bool = False, stat_rows: int = 256):
    """pixels (1,H,W,3) -> scaled latent with EXACT global GroupNorm, single
    chip. stat_rows: rows per stat-accumulation tile (memory/step granularity
    of the GroupNorm sweeps)."""
    moments = _exec_plan(_encoder_plan(params, cfg), x, stat_rows)
    z = vae_mod.sample_diagonal_gaussian(moments, rng, sample=sample and rng is not None)
    return vae_mod.scale_latent(cfg, z)


def exact_vae_decode(params, cfg, z, stat_rows: int = 64, unscale: bool = True):
    """scaled latent (1,h,w,C) -> pixels with EXACT global GroupNorm."""
    if unscale:
        z = vae_mod.unscale_latent(cfg, z)
    return _exec_plan(_decoder_plan(params, cfg), z, stat_rows)


# ----------------------------------------------------------------------------
# multi-chip spatially-sharded mode (exact)
# ----------------------------------------------------------------------------


def sharded_vae_decode(params, cfg, z, mesh, axis: str = "data"):
    """Exact decode with the latent sharded over H across ``axis``; XLA
    emits conv halo exchanges + global GroupNorm reductions."""
    from dataclasses import replace

    from jax.sharding import NamedSharding, PartitionSpec as P

    if cfg.fused_resblocks:
        # the Pallas kernel is not spatially partitionable — GSPMD cannot
        # insert halo exchanges through a custom call
        cfg = replace(cfg, fused_resblocks=False)
    zs = jax.device_put(z, NamedSharding(mesh, P(None, axis, None, None)))
    fn = jax.jit(
        partial(vae_mod.vae_decode, cfg=cfg),
        out_shardings=NamedSharding(mesh, P()),
    )
    return fn(params, z=zs)


def sharded_vae_encode(params, cfg, x, mesh, axis: str = "data"):
    from dataclasses import replace

    from jax.sharding import NamedSharding, PartitionSpec as P

    if cfg.fused_resblocks:
        cfg = replace(cfg, fused_resblocks=False)  # see sharded_vae_decode
    xs = jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))

    def enc(params, x):
        return vae_mod.vae_encode(params, cfg, x, rng=None)

    fn = jax.jit(enc, out_shardings=NamedSharding(mesh, P()))
    return fn(params, xs)
