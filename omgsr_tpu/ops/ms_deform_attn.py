"""Multi-scale deformable attention (Deformable-DETR op).

Capability parity with the vendored tree's only native extension
(dinov3/eval/segmentation/models/utils/ops/: CUDA/C++ pybind11 module used
by the Mask2Former segmentation head; SURVEY.md §2b). Semantics follow the
canonical torch reference implementation ms_deform_attn_core_pytorch
(functions/ms_deform_attn_func.py:57-79): bilinear grid-sample with zero
padding and align_corners=False at locations 2*loc-1, weighted-summed over
levels and points.

This JAX version is jittable and differentiable (autodiff through the
gather); native/msda.cpp provides the C++ CPU kernel counterpart (the
reference's deployment shape) validated against this implementation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _bilinear_sample(value_l, x, y):
    """value_l (B, H, Wd, HW_heads...) — here (B, Hl, Wl, M, D);
    x, y (B, M, Q, P) pixel coords (align_corners=False already applied);
    zero padding outside. Returns (B, M, Q, P, D)."""
    b, hl, wl, m, d = value_l.shape
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    tx = (x - x0)[..., None]
    ty = (y - y0)[..., None]
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yi, xi):
        inb = (xi >= 0) & (xi < wl) & (yi >= 0) & (yi < hl)
        xc = jnp.clip(xi, 0, wl - 1)
        yc = jnp.clip(yi, 0, hl - 1)
        # (B, M, Q, P) indices into (B, Hl, Wl, M, D)
        bidx = jnp.arange(b)[:, None, None, None]
        midx = jnp.arange(m)[None, :, None, None]
        vals = value_l[bidx, yc, xc, midx]  # (B, M, Q, P, D)
        return vals * inb[..., None].astype(vals.dtype)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x0i + 1)
    v10 = gather(y0i + 1, x0i)
    v11 = gather(y0i + 1, x0i + 1)
    return (
        v00 * (1 - tx) * (1 - ty)
        + v01 * tx * (1 - ty)
        + v10 * (1 - tx) * ty
        + v11 * tx * ty
    )


def ms_deform_attn(value, spatial_shapes, sampling_locations, attention_weights):
    """value (B, S, M, D) with S = sum(Hl*Wl); spatial_shapes: list of
    (Hl, Wl); sampling_locations (B, Q, M, L, P, 2) in [0,1];
    attention_weights (B, Q, M, L, P). Returns (B, Q, M*D)."""
    b, s, m, d = value.shape
    _, q, _, L, p, _ = sampling_locations.shape
    start = 0
    out = jnp.zeros((b, m, q, d), jnp.float32)
    for lid, (hl, wl) in enumerate(spatial_shapes):
        value_l = value[:, start : start + hl * wl].reshape(b, hl, wl, m, d)
        start += hl * wl
        # align_corners=False: pix = loc * size - 0.5
        locs = sampling_locations[:, :, :, lid]  # (B, Q, M, P, 2)
        x = locs[..., 0].transpose(0, 2, 1, 3) * wl - 0.5  # (B, M, Q, P)
        y = locs[..., 1].transpose(0, 2, 1, 3) * hl - 0.5
        sampled = _bilinear_sample(value_l.astype(jnp.float32), x, y)  # (B,M,Q,P,D)
        w = attention_weights[:, :, :, lid].transpose(0, 2, 1, 3)  # (B,M,Q,P)
        out = out + (sampled * w[..., None].astype(jnp.float32)).sum(axis=3)
    return out.transpose(0, 2, 1, 3).reshape(b, q, m * d).astype(value.dtype)
