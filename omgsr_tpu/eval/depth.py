"""DINOv3 DPT depth-estimation head, TPU-native.

Re-owns dinov3/eval/dense/depth (models/dpt_head.py DPTHead:452-532,
ReassembleBlocks:278-358, FeatureFusionBlock:404-449,
PreActResidualConvUnit:361-401, UpConvHead:243-275; models/__init__.py
FeaturesToDepth:14-81, build_depther:134-186; models/encoder.py
DinoVisionTransformerWrapper + BackboneLayersSet; models/embed.py
CenterPadding/StretchToMultiple) as pure functions over param dicts whose
key paths mirror the torch state dict, so a trained depther checkpoint
ports mechanically (`port_dpt_state`).

TPU-first choices:
- torch `F.interpolate(bilinear)` becomes two dense (out, in) interpolation
  matrices contracted on the MXU (einsum over H then W) — exact linear
  weights for both align_corners conventions, no gathers. Matrices are
  cached as NUMPY and converted at use (JAX tracer-caching gotcha,
  CLAUDE.md).
- `ConvTranspose2d(k=s, stride=s)` (the reassemble up-projections) has
  non-overlapping taps, so it is computed as one einsum to (k*k*C_out) per
  pixel followed by a depth-to-space reshape — a single MXU matmul instead
  of a transposed-convolution lowering.
- The whole depther is one jittable function: pad -> frozen-ViT
  intermediate layers -> DPT head -> features-to-depth.

Init uses He-normal for conv kernels (the reference mixes kaiming-normal
ConvModules with torch-default kaiming-uniform raw convs; the distinction
is irrelevant for a head that is always trained or ported — parity tests
run through ported torch weights).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.models.layers import conv2d

__all__ = [
    "DPTConfig",
    "init_dpt_head",
    "dpt_head_apply",
    "features_to_depth",
    "backbone_out_indices",
    "center_pad",
    "stretch_to_multiple",
    "make_depther",
    "port_dpt_state",
]


@dataclasses.dataclass(frozen=True)
class DPTConfig:
    """DPTHead args (dpt_head.py:467-508)."""

    in_channels: Sequence[int] = (1024, 1024, 1024, 1024)
    channels: int = 256
    post_process_channels: Sequence[int] = (128, 256, 512, 1024)
    readout_type: str = "project"  # project | add | ignore
    expand_channels: bool = False
    n_output_channels: int = 256
    n_hidden_channels: int = 32
    # per-level SyncBatchNorm after readout, before the 1x1 project
    # (dpt_head.py:333-335,354; the hub depther config sets it True,
    # hub/depthers.py:34-41) — eval-mode running stats here
    use_batchnorm: bool = False

    @property
    def effective_post_channels(self):
        return [
            c * (2**i) if self.expand_channels else c
            for i, c in enumerate(self.post_process_channels)
        ]


# ---------------------------------------------------------------------------
# bilinear interpolation as MXU matmuls
# ---------------------------------------------------------------------------

_RESIZE_CACHE: dict = {}


def _resize_matrix(n_in: int, n_out: int, align_corners: bool) -> np.ndarray:
    """(n_out, n_in) linear-interpolation weights matching torch
    F.interpolate(mode="bilinear") along one axis."""
    key = (n_in, n_out, align_corners)
    m = _RESIZE_CACHE.get(key)
    if m is not None:
        return m
    if n_in == 1:
        m = np.ones((n_out, 1), np.float32)
    else:
        if align_corners and n_out > 1:
            pos = np.linspace(0.0, n_in - 1.0, n_out)
        else:
            pos = np.clip((np.arange(n_out) + 0.5) * (n_in / n_out) - 0.5, 0, n_in - 1)
        lo = np.floor(pos).astype(np.int64)
        hi = np.minimum(lo + 1, n_in - 1)
        w = (pos - lo).astype(np.float32)
        m = np.zeros((n_out, n_in), np.float32)
        np.add.at(m, (np.arange(n_out), lo), 1.0 - w)
        np.add.at(m, (np.arange(n_out), hi), w)
    _RESIZE_CACHE[key] = m
    return m


def bilinear_resize(x, out_hw, align_corners: bool):
    """NHWC bilinear resize via two dense matmuls (exact torch weights)."""
    h_in, w_in = x.shape[1], x.shape[2]
    h_out, w_out = out_hw
    if (h_in, w_in) == (h_out, w_out):
        return x
    mh = jnp.asarray(_resize_matrix(h_in, h_out, align_corners), x.dtype)
    mw = jnp.asarray(_resize_matrix(w_in, w_out, align_corners), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _he(key, shape, fan_out=None, dtype=jnp.float32):
    fan = fan_out if fan_out is not None else np.prod(shape[:-1])
    std = math.sqrt(2.0 / fan)
    return std * jax.random.normal(key, shape, dtype)


def _conv_p(key, kh, kw, cin, cout, bias=True, dtype=jnp.float32):
    p = {"kernel": _he(key, (kh, kw, cin, cout), kh * kw * cout, dtype)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def init_dpt_head(key, cfg: DPTConfig, dtype=jnp.float32):
    """Param tree with torch-state-dict key paths (dpt_head.py:484-508)."""
    keys = iter(jax.random.split(key, 64))
    post = cfg.effective_post_channels
    rb = {"projects": {}, "resize_layers": {}}
    if cfg.readout_type == "project":
        rb["readout_projects"] = {
            str(i): {
                "0": {
                    "kernel": _he(next(keys), (2 * c, c), 2 * c, dtype),
                    "bias": jnp.zeros((c,), dtype),
                }
            }
            for i, c in enumerate(cfg.in_channels)
        }
    if cfg.use_batchnorm:
        rb["batchnorm_layers"] = {
            str(i): {
                "scale": jnp.ones((c,), dtype),
                "bias": jnp.zeros((c,), dtype),
                "running_mean": jnp.zeros((c,), dtype),
                "running_var": jnp.ones((c,), dtype),
            }
            for i, c in enumerate(cfg.in_channels)
        }
    for i, c in enumerate(post):
        rb["projects"][str(i)] = {
            "conv": _conv_p(next(keys), 1, 1, cfg.in_channels[i], c, True, dtype)
        }
    # resize layers: ConvTranspose(k=4,s=4), ConvTranspose(k=2,s=2),
    # identity, Conv3x3 s2 — transpose kernels stored in the torch
    # (C_in, C_out, kh, kw) layout (see _conv_transpose_kxk)
    rb["resize_layers"]["0"] = {
        "kernel": _he(next(keys), (post[0], post[0], 4, 4), post[0] * 16, dtype),
        "bias": jnp.zeros((post[0],), dtype),
    }
    rb["resize_layers"]["1"] = {
        "kernel": _he(next(keys), (post[1], post[1], 2, 2), post[1] * 4, dtype),
        "bias": jnp.zeros((post[1],), dtype),
    }
    rb["resize_layers"]["3"] = _conv_p(next(keys), 3, 3, post[3], post[3], True, dtype)

    convs = {
        str(i): {"conv": _conv_p(next(keys), 3, 3, c, cfg.channels, False, dtype)}
        for i, c in enumerate(post)
    }

    def rcu():
        return {
            "conv1": {"conv": _conv_p(next(keys), 3, 3, cfg.channels, cfg.channels, False, dtype)},
            "conv2": {"conv": _conv_p(next(keys), 3, 3, cfg.channels, cfg.channels, False, dtype)},
        }

    fusion = {}
    for i in range(len(post)):
        blk = {
            "project": {"conv": _conv_p(next(keys), 1, 1, cfg.channels, cfg.channels, True, dtype)},
            "res_conv_unit2": rcu(),
        }
        if i != 0:  # fusion_blocks[0].res_conv_unit1 = None (dpt_head.py:501)
            blk["res_conv_unit1"] = rcu()
        fusion[str(i)] = blk

    return {
        "reassemble_blocks": rb,
        "convs": convs,
        "fusion_blocks": fusion,
        "project": {"conv": _conv_p(next(keys), 3, 3, cfg.channels, cfg.channels, True, dtype)},
        "conv_depth": {
            "head": {
                "0": _conv_p(next(keys), 3, 3, cfg.channels, cfg.channels // 2, True, dtype),
                "2": _conv_p(next(keys), 3, 3, cfg.channels // 2, cfg.n_hidden_channels, True, dtype),
                "4": _conv_p(next(keys), 1, 1, cfg.n_hidden_channels, cfg.n_output_channels, True, dtype),
            }
        },
    }


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _conv_transpose_kxk(p, x, k: int):
    """ConvTranspose2d with kernel==stride==k, padding 0: non-overlapping
    taps -> one einsum to (k, k, C_out) per input pixel + depth-to-space.
    Kernel layout is torch's (C_in, C_out, kh, kw)."""
    w = p["kernel"].astype(x.dtype)
    b, h, wd, _ = x.shape
    y = jnp.einsum("bhwc,cokl->bhkwlo", x, w)
    y = y.reshape(b, h * k, wd * k, w.shape[1])
    return y + p["bias"].astype(x.dtype)


def _rcu_apply(p, x):
    """PreActResidualConvUnit (dpt_head.py:361-401): (ReLU -> conv3x3)x2
    with residual; convs are bias-free."""
    h = conv2d(p["conv1"]["conv"], jax.nn.relu(x), padding=1)
    h = conv2d(p["conv2"]["conv"], jax.nn.relu(h), padding=1)
    return h + x


def _fusion_apply(p, x, res, align_corners=True):
    """FeatureFusionBlock.forward (dpt_head.py:429-449)."""
    if res is not None:
        if res.shape[1:3] != x.shape[1:3]:
            res = bilinear_resize(res, x.shape[1:3], align_corners=False)
        x = x + _rcu_apply(p["res_conv_unit1"], res)
    x = _rcu_apply(p["res_conv_unit2"], x)
    x = bilinear_resize(x, (2 * x.shape[1], 2 * x.shape[2]), align_corners)
    return conv2d(p["project"]["conv"], x, padding="VALID")


def dpt_head_apply(params, cfg: DPTConfig, feats):
    """feats: list of (patch NHWC map, cls (B, C)) pairs, shallowest first
    (the get_intermediate_layers layout). Returns (B, 2*h_top, 2*w_top,
    n_output_channels) raw depth features (DPTHead.forward:510-528)."""
    assert len(feats) == len(cfg.in_channels)
    rb = params["reassemble_blocks"]
    xs = []
    for i, (x, cls) in enumerate(feats):
        bsz, h, w, c = x.shape
        if cfg.readout_type == "project":
            r = jnp.broadcast_to(cls[:, None, None, :], x.shape)
            cat = jnp.concatenate([x, r], axis=-1)
            p = rb["readout_projects"][str(i)]["0"]
            x = jax.nn.gelu(
                cat @ p["kernel"].astype(cat.dtype) + p["bias"].astype(cat.dtype),
                approximate=False,
            )
        elif cfg.readout_type == "add":
            x = x + cls[:, None, None, :]
        if cfg.use_batchnorm:
            bn = rb["batchnorm_layers"][str(i)]
            inv = jax.lax.rsqrt(bn["running_var"].astype(jnp.float32) + 1e-5)
            x = (x - bn["running_mean"].astype(x.dtype)) * (
                inv * bn["scale"].astype(jnp.float32)
            ).astype(x.dtype) + bn["bias"].astype(x.dtype)
        x = conv2d(rb["projects"][str(i)]["conv"], x, padding="VALID")
        if i == 0:
            x = _conv_transpose_kxk(rb["resize_layers"]["0"], x, 4)
        elif i == 1:
            x = _conv_transpose_kxk(rb["resize_layers"]["1"], x, 2)
        elif i == 3:
            x = conv2d(rb["resize_layers"]["3"], x, stride=2, padding=1)
        xs.append(x)

    xs = [
        conv2d(params["convs"][str(i)]["conv"], x, padding=1) for i, x in enumerate(xs)
    ]
    out = _fusion_apply(params["fusion_blocks"]["0"], xs[-1], None)
    for i in range(1, len(xs)):
        out = _fusion_apply(params["fusion_blocks"][str(i)], out, xs[-(i + 1)])
    out = jax.nn.relu(conv2d(params["project"]["conv"], out, padding=1))

    # UpConvHead (dpt_head.py:243-275)
    hp = params["conv_depth"]["head"]
    out = conv2d(hp["0"], out, padding=1)
    out = bilinear_resize(out, (2 * out.shape[1], 2 * out.shape[2]), align_corners=True)
    out = jax.nn.relu(conv2d(hp["2"], out, padding=1))
    return conv2d(hp["4"], out, padding="VALID")


def features_to_depth(
    x,
    min_depth: float = 0.001,
    max_depth: float = 80.0,
    bins_strategy: str = "linear",
    norm_strategy: str = "linear",
):
    """(B, H, W, n_bins) -> (B, H, W, 1) depth (models/__init__.py:14-81,
    AdaBins-style weighted bins or pure regression)."""
    n_bins = x.shape[-1]
    if n_bins == 1:
        return jax.nn.relu(x) + min_depth
    if bins_strategy == "linear":
        bins = jnp.linspace(min_depth, max_depth, n_bins)
    elif bins_strategy == "log":
        bins = jnp.exp(jnp.linspace(math.log(min_depth), math.log(max_depth), n_bins))
    else:
        raise ValueError(bins_strategy)
    if norm_strategy == "linear":
        logit = jax.nn.relu(x) + 0.1
        logit = logit / jnp.sum(logit, axis=-1, keepdims=True)
    elif norm_strategy == "softmax":
        logit = jax.nn.softmax(x, axis=-1)
    elif norm_strategy == "sigmoid":
        logit = jax.nn.sigmoid(x)
        logit = logit / jnp.sum(logit, axis=-1, keepdims=True)
    else:
        raise ValueError(norm_strategy)
    return jnp.einsum("bhwk,k->bhw", logit, bins.astype(logit.dtype))[..., None]


# ---------------------------------------------------------------------------
# encoder wrapper (models/encoder.py)
# ---------------------------------------------------------------------------


def backbone_out_indices(n_blocks: int, mode: str = "FOUR_EVEN_INTERVALS"):
    """encoder.py:23-54 including the ViT-L backward-compat quirk
    ([4, 11, 17, 23] instead of the 'correct' [5, 11, 17, 23])."""
    if isinstance(mode, (list, tuple)):
        return list(mode)
    if mode == "LAST":
        return [n_blocks - 1]
    if mode == "FOUR_LAST":
        return list(range(n_blocks - 4, n_blocks))
    if mode == "FOUR_EVEN_INTERVALS":
        if n_blocks == 24:
            return [4, 11, 17, 23]
        return [i * (n_blocks // 4) - 1 for i in range(1, 5)]
    raise ValueError(mode)


def center_pad(x, multiple: int):
    """Zero-pad NHWC H/W up to a multiple, split left/right (embed.py:12-32)."""

    def pads(n):
        total = -n % multiple
        return total // 2, total - total // 2

    (t, b), (l, r) = pads(x.shape[1]), pads(x.shape[2])
    return jnp.pad(x, ((0, 0), (t, b), (l, r), (0, 0)))


def stretch_to_multiple(x, multiple: int):
    """Bilinear-stretch NHWC H/W up to a multiple (embed.py:35-49,
    align_corners=False)."""
    nh = -(-x.shape[1] // multiple) * multiple
    nw = -(-x.shape[2] // multiple) * multiple
    return bilinear_resize(x, (nh, nw), align_corners=False)


def make_depther(
    backbone_params,
    vit_cfg,
    head_params,
    head_cfg: DPTConfig,
    *,
    out_layers="FOUR_EVEN_INTERVALS",
    use_backbone_norm: bool = False,
    adapt_to_patch_size: str = "center_padding",
    min_depth: float = 0.001,
    max_depth: float = 10.0,
    bins_strategy: str = "linear",
    norm_strategy: str = "linear",
):
    """build_depther (models/__init__.py:134-186): one jittable
    image -> depth function over a frozen ViT backbone. Backbone params are
    closed over with stop_gradient (the reference freezes via
    requires_grad_(False)); jit it with params as args via
    `lambda hp, x: make_depther(bb, vc, hp, hc)(x)` when training the head.
    """
    from omgsr_tpu.models.dinov3_vit import get_intermediate_layers

    indices = backbone_out_indices(vit_cfg.depth, out_layers)

    def apply(x):
        if adapt_to_patch_size == "center_padding":
            x = center_pad(x, vit_cfg.patch_size)
        elif adapt_to_patch_size == "stretch":
            x = stretch_to_multiple(x, vit_cfg.patch_size)
        bb = jax.lax.stop_gradient(backbone_params)
        feats = get_intermediate_layers(
            bb, vit_cfg, x,
            n=indices, reshape=True, norm=use_backbone_norm,
            return_class_token=True,
        )
        raw = dpt_head_apply(head_params, head_cfg, feats)
        return features_to_depth(
            raw, min_depth=min_depth, max_depth=max_depth,
            bins_strategy=bins_strategy, norm_strategy=norm_strategy,
        )

    return apply


# ---------------------------------------------------------------------------
# torch checkpoint porter
# ---------------------------------------------------------------------------


def port_dpt_state(state_dict, dtype=jnp.float32):
    """torch DPTHead.state_dict() -> the param tree above. Conv weights
    (O, I, kh, kw) -> HWIO; linears (O, I) -> (I, O); ConvTranspose weights
    (I, O, kh, kw) kept as-is (the _conv_transpose_kxk layout)."""
    out: dict = {}
    for name, t in state_dict.items():
        arr = np.asarray(getattr(t, "detach", lambda: t)().cpu().numpy() if hasattr(t, "cpu") else t)
        parts = name.split(".")
        leaf = parts[-1]
        is_transpose = "resize_layers" in name and parts[parts.index("resize_layers") + 1] in ("0", "1")
        is_linear = "readout_projects" in name
        if leaf == "weight":
            key = "kernel"
            if arr.ndim == 1:  # batchnorm affine
                key = "scale"
            elif is_linear:
                arr = arr.T
            elif is_transpose:
                pass  # keep torch (I, O, kh, kw)
            elif arr.ndim == 4:
                arr = arr.transpose(2, 3, 1, 0)
        elif leaf == "bias":
            key = "bias"
        elif leaf in ("running_mean", "running_var"):
            key = leaf
        else:
            continue  # num_batches_tracked
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[key] = jnp.asarray(arr, dtype)
    return out
