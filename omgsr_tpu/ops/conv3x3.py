"""Pallas 3x3 SAME conv for the VAE decoder's large-spatial stages.

Motivation (measured, CLAUDE.md perf notes): the composed decode at 1024 px
runs at ~25% MFU through XLA's conv lowering, and the JAX-level rewrites
(im2col patches / 9 shifted einsums) LOSE to the native conv — the only
remaining lever is a hand kernel. This kernel computes the conv as 9
accumulated (rows*cols, C_in) x (C_in, C_out) MXU dots over row-stripes of
the (pre-padded) input, DMA-ing each stripe's halo window from HBM into
VMEM, with an optional fused bias + SiLU epilogue (the elementwise ops that
follow every decoder conv).

Shapes: NHWC with C_in/C_out multiples of 128 (the decoder's 128/256/512
channel stages). Batch 1 per kernel call (vmapped outside if needed).

Reference behavior: torch.nn.Conv2d(3x3, padding=1) as used throughout
diffusers' VAE decoder (the reference runs it via infer/omgsr_s_infer_model
-> AutoencoderKL); numerics match ops tested in tests/test_conv3x3.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_hbm, w_ref, b_ref, o_ref, x_vmem, sem, *, bh, width, cin, cout, act):
    i = pl.program_id(0)
    # halo window: padded rows [i*bh, i*bh + bh + 2), all padded cols
    dma = pltpu.make_async_copy(
        x_hbm.at[0, pl.ds(i * bh, bh + 2)], x_vmem, sem
    )
    dma.start()
    dma.wait()

    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = x_vmem[dy : dy + bh, dx : dx + width, :]  # (bh, W, Cin)
            d = jax.lax.dot_general(
                xs,
                w_ref[dy, dx],  # (Cin, Cout)
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (bh, W, Cout)
            acc = d if acc is None else acc + d
    y = acc + b_ref[0].astype(jnp.float32)
    if act == "silu":
        y = y * jax.nn.sigmoid(y)
    o_ref[0] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("act", "bh"))
def conv3x3_pallas(x, w, b, act: str = "none", bh: int = 8):
    """x (1, H, W, C_in) NHWC, w (3, 3, C_in, C_out) HWIO, b (C_out,).
    SAME padding, stride 1. act: "none" | "silu" (fused epilogue).
    Requires H % bh == 0 and C_in, C_out multiples of 128."""
    n, h, width, cin = x.shape
    cout = w.shape[-1]
    assert n == 1 and h % bh == 0, (n, h, bh)
    # conv halo pad (1 px) + right-pad the column dim to a 32-multiple:
    # Mosaic requires DMA slice shapes aligned to the sublane tiling
    align_pad = (-(width + 2)) % 32
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + align_pad), (0, 0)))

    return pl.pallas_call(
        functools.partial(
            _kernel, bh=bh, width=width, cin=cin, cout=cout, act=act
        ),
        grid=(h // bh,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input stays in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, C_out)
        ],
        out_specs=pl.BlockSpec(
            (1, bh, width, cout), lambda i: (0, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, h, width, cout), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((bh + 2, width + 2 + align_pad, cin), x.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, w.astype(x.dtype), b.reshape(1, cout).astype(x.dtype))


def _kernel_rb(
    x_hbm, w_ref, b_ref, aff_ref, skip_hbm, o_ref, ssum_ref, ssq_ref,
    x_vmem, s_vmem, sem, sem2, *, bh, height, width, cin, cout, use_skip,
    emit_stats,
):
    """Resblock-fused conv stripe: GN+SiLU prologue as per-channel affine
    (zero padding preserved via masking), 9 MXU dots, bias + optional skip
    epilogue, optional per-channel sum/sumsq emission of the output."""
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(x_hbm.at[0, pl.ds(i * bh, bh + 2)], x_vmem, sem)
    dma.start()
    if use_skip:
        dma2 = pltpu.make_async_copy(skip_hbm.at[0, pl.ds(i * bh, bh)], s_vmem, sem2)
        dma2.start()
    dma.wait()

    # prologue: silu(x*a + c) on the interior, zeros kept on the pad ring
    # (the conv pads AFTER the activation in the reference graph)
    a = aff_ref[0].astype(jnp.float32)
    c = aff_ref[1].astype(jnp.float32)
    xw = x_vmem[...].astype(jnp.float32)
    rows = jax.lax.broadcasted_iota(jnp.int32, xw.shape, 0) + i * bh
    cols = jax.lax.broadcasted_iota(jnp.int32, xw.shape, 1)
    valid = (
        (rows >= 1) & (rows <= height) & (cols >= 1) & (cols <= width)
    )
    h = xw * a + c
    h = h * jax.nn.sigmoid(h)
    xa = jnp.where(valid, h, 0.0).astype(x_vmem.dtype)

    acc = None
    for dy in range(3):
        for dx in range(3):
            xs = xa[dy : dy + bh, dx : dx + width, :]
            d = jax.lax.dot_general(
                xs, w_ref[dy, dx],
                dimension_numbers=(((2,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            acc = d if acc is None else acc + d
    y = acc + b_ref[0].astype(jnp.float32)
    if use_skip:
        dma2.wait()
        y = y + s_vmem[...].astype(jnp.float32)
    o_ref[0] = y.astype(o_ref.dtype)
    if emit_stats:
        # (1, 8, cout) blocks: Mosaic needs the sublane dim divisible by 8,
        # so the per-stripe channel sums broadcast over 8 rows (row 0 read)
        ssum_ref[...] = jnp.broadcast_to(
            jnp.sum(y, axis=(0, 1)).reshape(1, 1, cout), (1, 8, cout)
        )
        ssq_ref[...] = jnp.broadcast_to(
            jnp.sum(y * y, axis=(0, 1)).reshape(1, 1, cout), (1, 8, cout)
        )


@functools.partial(jax.jit, static_argnames=("bh", "emit_stats"))
def conv3x3_gn_fused(x, w, b, gn_scale, gn_shift, skip=None, bh: int = 8,
                     emit_stats: bool = True):
    """Fused resblock half: y = conv3x3(silu(x * gn_scale + gn_shift)) + b
    [+ skip], also returning per-row-stripe per-channel (sum, sumsq) of y
    for the NEXT GroupNorm's statistics (E[x^2]-mean^2 form, f32 partials).

    gn_scale/gn_shift fold the GroupNorm: scale = gamma * rsqrt(var + eps),
    shift = beta - mean * scale (per channel). The conv's zero padding is
    applied to the ACTIVATED tensor (masked prologue), matching the
    reference op order GN -> SiLU -> pad -> conv.

    Shapes as conv3x3_pallas; skip (1, H, W, C_out) optional.
    Returns (y, ssum (H//bh, C_out) f32, ssq (H//bh, C_out) f32)."""
    n, h, width, cin = x.shape
    cout = w.shape[-1]
    assert n == 1 and h % bh == 0, (n, h, bh)
    align_pad = (-(width + 2)) % 32
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1 + align_pad), (0, 0)))
    use_skip = skip is not None
    if not use_skip:
        skip = jnp.zeros((1, bh, width, cout), x.dtype)  # placeholder operand
    aff = jnp.stack(
        [gn_scale.astype(jnp.float32), gn_shift.astype(jnp.float32)]
    )  # (2, C_in)

    grid = h // bh
    y, ssum, ssq = pl.pallas_call(
        functools.partial(
            _kernel_rb, bh=bh, height=h, width=width, cin=cin, cout=cout,
            use_skip=use_skip, emit_stats=emit_stats,
        ),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # padded input (HBM)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # weights
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bias (1, C_out)
            pl.BlockSpec(memory_space=pltpu.VMEM),  # gn affine (2, C_in)
            pl.BlockSpec(memory_space=pl.ANY),  # skip (HBM)
        ],
        out_specs=[
            pl.BlockSpec(
                (1, bh, width, cout), lambda i: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec((1, 8, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, cout), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, h, width, cout), x.dtype),
            jax.ShapeDtypeStruct((grid, 8, cout), jnp.float32),
            jax.ShapeDtypeStruct((grid, 8, cout), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((bh + 2, width + 2 + align_pad, cin), x.dtype),
            pltpu.VMEM((bh, width, cout), x.dtype),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA(()),
        ],
    )(xp, w.astype(x.dtype), b.reshape(1, cout).astype(x.dtype), aff, skip)
    return y, ssum[:, 0, :], ssq[:, 0, :]


def _pick_bh(h: int, width: int, cin: int, cout: int) -> int | None:
    """Largest row-stripe height whose kernel working set fits scoped VMEM
    (16 MB limit; budget 13 MB for margin). None if even bh=2 does not fit
    or h has no valid stripe divisor."""
    wp = width + 2 + ((-(width + 2)) % 32)
    for bh in (8, 4, 2):
        if h % bh:
            continue
        est = (
            (bh + 2) * wp * cin * (2 + 4 + 4)  # window bf16 + two f32 temps
            + bh * width * cout * 4  # f32 acc
            + 3 * bh * width * cout * 2  # out double-buffer + skip
            + 9 * cin * cout * 2  # weights
        )
        if est <= 13 * 2**20:
            return bh
    return None


def fused_resblock(p, x, groups: int, eps: float = 1e-6):
    """Whole VAE resblock via the fused Pallas conv: GN1 stats by one XLA
    reduce over the input, then conv1 with a folded GN+SiLU prologue that
    streams GN2's channel sums out, then conv2 with the folded GN2 prologue
    and the skip add (conv_shortcut applied via XLA 1x1 when present).

    Eligible when both convs' channels are multiples of 128 and a VMEM
    -feasible row stripe exists (_pick_bh); callers fall back to the XLA
    resblock otherwise. Inference-only (no custom VJP).

    MEASUREMENTS that close the decode mega-kernel lever (v5e, 2026-08-17,
    interleaved reps):
      * isolated 4-resblock chain at 1024x1024x128, bh=4: this kernel wins
        1.69-1.70x over the bare XLA chain (105 -> 62 ms);
      * INSIDE the composed SD-VAE 1024px decode: fused on ALL VMEM-feasible
        shapes (bh down to 2) is 0.83x — SLOWER (179 -> 216 ms; bh=2 pays
        (bh+2)/bh = 2x halo read amplification and forfeits XLA's cross-op
        fusion at stage seams);
      * restricted to the winning bh>=4 shapes (up3's 1024x1024x128
        resnets): EXACT parity, 0.998-1.003x decode, 1.000x on the full -S
        256->1024 protocol.
    XLA's cross-op fusion inside the composed decode already achieves what
    the hand kernel gains in isolation (same conclusion as the per-conv
    kernel and fused-GN experiments, CLAUDE.md perf notes) — so pipelines
    leave cfg.fused_resblocks OFF; the kernel remains for experimentation
    and as the building block for future shapes where the balance differs.

    GN statistics note: GN2/later stats are E[x^2]-mean^2 over the conv's
    f32 accumulator (before bf16 rounding of the stored tensor) — within
    bf16 noise of the two-pass XLA form on realistic ranges.
    """
    b, h, width, cin = x.shape
    cout = p["conv1"]["kernel"].shape[-1]
    per = cin // groups

    # GN1: one f32 reduce over the input (channel sums -> group stats)
    x32 = x.astype(jnp.float32)
    ssum0 = jnp.sum(x32, axis=(0, 1, 2))
    ssq0 = jnp.sum(x32 * x32, axis=(0, 1, 2))
    scale1, shift1 = gn_affine_from_channel_sums(
        ssum0[None], ssq0[None], h * width, groups,
        p["norm1"]["scale"], p["norm1"]["bias"], eps,
    )
    h1, ssum1, ssq1 = conv3x3_gn_fused(
        x, p["conv1"]["kernel"], p["conv1"]["bias"], scale1, shift1,
        bh=_pick_bh(h, width, cin, cout),
    )
    scale2, shift2 = gn_affine_from_channel_sums(
        ssum1, ssq1, h * width, groups, p["norm2"]["scale"], p["norm2"]["bias"], eps
    )
    if "conv_shortcut" in p:
        from omgsr_tpu.models.layers import conv2d

        skip = conv2d(p["conv_shortcut"], x, padding=0)
    else:
        skip = x
    y, _, _ = conv3x3_gn_fused(
        h1, p["conv2"]["kernel"], p["conv2"]["bias"], scale2, shift2,
        skip=skip, bh=_pick_bh(h, width, cout, cout), emit_stats=False,
    )
    return y


def fused_resblock_eligible(p, x, groups: int) -> bool:
    """Restrict to the measured-winning regime: stripes of at least 4 rows
    (bh=2 doubles the halo read amplification — (bh+2)/bh — and measured
    SLOWER than XLA in the composed 1024px decode: fused-everywhere 216 ms
    vs plain 179; the 1024x1024x128 bh=4 chain wins 1.7x in isolation)."""
    b, h, width, cin = x.shape
    cout = p["conv1"]["kernel"].shape[-1]
    bh1 = _pick_bh(h, width, cin, cout)
    bh2 = _pick_bh(h, width, cout, cout)
    return (
        b == 1
        and cin % 128 == 0
        and cout % 128 == 0
        and cin % groups == 0
        and bh1 is not None and bh1 >= 4
        and bh2 is not None and bh2 >= 4
    )


def gn_affine_from_channel_sums(ssum, ssq, hw: int, groups: int, gamma, beta,
                                eps: float = 1e-6):
    """Fold streamed per-channel (sum, sumsq) into the next conv's prologue
    affine: group mean/var (E[x^2]-mean^2, f32), then per-channel
    scale = gamma * rsqrt(var+eps), shift = beta - mean * scale."""
    c = ssum.shape[-1]
    per = c // groups
    s = ssum.sum(0).reshape(groups, per).sum(-1)
    q = ssq.sum(0).reshape(groups, per).sum(-1)
    cnt = hw * per
    mean = s / cnt
    var = jnp.maximum(q / cnt - mean * mean, 0.0)
    scale_g = jax.lax.rsqrt(var + eps)
    scale = jnp.repeat(scale_g, per) * gamma.astype(jnp.float32)
    shift = beta.astype(jnp.float32) - jnp.repeat(mean, per) * (
        jnp.repeat(scale_g, per) * gamma.astype(jnp.float32)
    )
    return scale, shift


def conv3x3_reference(x, w, b, act: str = "none"):
    """XLA-native equivalent (for parity tests and the A/B baseline)."""
    y = jax.lax.conv_general_dilated(
        x, w.astype(x.dtype), (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b.astype(x.dtype)
    if act == "silu":
        y = y * jax.nn.sigmoid(y.astype(jnp.float32)).astype(y.dtype)
    return y
