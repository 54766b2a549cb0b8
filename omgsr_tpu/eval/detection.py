"""Plain-DETR detection suite (DINOv3 windowed backbone + two-stage
reparameterized decoder), TPU-native.

Re-owns dinov3/eval/detection — models/detr.py (PlainDETR:34-237,
PlainDETRReParam:238-381, PostProcess:384-430, MLP:432-445),
models/transformer.py (Transformer:29-337 incl. multi-level proposal
expansion, TransformerReParam:339-411), models/global_rpe_decomp_decoder.py
(GlobalCrossAttention:21-129, GlobalDecoderLayer:132-288, GlobalDecoder
:290-418), models/transformer_encoder.py, models/backbone.py
(DINOBackbone:37-90), models/windows.py (WindowsWrapper:16-82),
models/position_encoding.py, util/box_ops.py — as pure functions over
param dicts whose key paths mirror the torch state dicts
(`port_detr_state`).

TPU-first choices:
- Static shapes end-to-end: images arrive in same-size batches (the SR
  pipelines' size-bucket convention), so the NestedTensor padding-mask
  plumbing collapses — masks are all-valid, valid ratios are 1, and the
  proposal-validity tests reduce to the static image bounds. Ragged COCO
  batches are handled by bucketing on host, not by padding masks.
- The decomposed relative-position bias (cpb MLPs over per-axis deltas) is
  two dense MLPs + a broadcast add — pure MXU work; `jax.lax.top_k`
  replaces torch.topk for the two-stage proposal selection (static k).
- `jnp.take_along_axis` gathers the top-k proposals; everything jits as
  ONE graph including the 6-layer encoder, proposal generation, and the
  6-layer refining decoder.
- The windowed backbone evaluates all N windows + the resized global view
  through the same compiled backbone graph (equal window sizes).

Init follows the torch recipe where it shapes behavior (class-bias focal
prior, zeroed last bbox layer, xavier elsewhere); exact parity is held
through ported torch weights in tests/test_detection.py.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.eval.depth import _conv_transpose_kxk, bilinear_resize
from omgsr_tpu.eval.segmentation import _mha
from omgsr_tpu.models.layers import conv2d, dense, group_norm, init_norm, layer_norm

__all__ = [
    "DetectionConfig",
    "detection_sine_pos",
    "detection_backbone_features",
    "windowed_backbone_features",
    "init_plain_detr",
    "plain_detr_apply",
    "detr_postprocess",
    "box_cxcywh_to_xyxy",
    "box_xyxy_to_cxcywh",
    "delta2bbox",
    "inverse_sigmoid",
    "port_detr_state",
    "detr_transpose_paths",
]


@dataclasses.dataclass(frozen=True)
class DetectionConfig:
    """DetectionHeadConfig (config.py:12-65), published defaults."""

    num_classes: int = 91
    with_box_refine: bool = True
    two_stage: bool = True
    mixed_selection: bool = True
    look_forward_twice: bool = True
    num_queries_one2one: int = 300
    num_queries_one2many: int = 1500
    reparam: bool = True
    topk: int = 100
    hidden_dim: int = 256
    nheads: int = 8
    dec_layers: int = 6
    dim_feedforward: int = 2048
    norm_type: str = "pre_norm"  # pre_norm | post_norm
    proposal_feature_levels: int = 4
    proposal_in_stride: int = 16
    proposal_tgt_strides: Sequence[int] = (8, 16, 32, 64)
    proposal_min_size: int = 50
    decoder_rpe_hidden_dim: int = 512
    decoder_rpe_type: str = "linear"  # linear | abs_log8
    add_transformer_encoder: bool = True
    num_encoder_layers: int = 6
    # the torch Transformer never forwards norm_type OR dim_feedforward to
    # its encoder — post-norm, ffn 2048 regardless (transformer.py:44-52,
    # build_transformer:413-432 omits both)
    encoder_normalize_before: bool = False
    encoder_dim_feedforward: int = 2048
    aux_loss: bool = True

    @property
    def num_queries(self):
        return self.num_queries_one2one + self.num_queries_one2many


# ---------------------------------------------------------------------------
# box ops (util/box_ops.py)
# ---------------------------------------------------------------------------


def box_cxcywh_to_xyxy(x):
    cx, cy, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], -1)


def box_xyxy_to_cxcywh(x):
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate([(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], -1)


def delta2bbox(proposals, deltas, max_shape=None, wh_ratio_clip=16 / 1000):
    """box_ops.py:38-66 (clip_border, no ctr clamp): cxcywh proposals +
    (dxy, dwh) deltas -> xyxy, clamped to max_shape=(H, W) when given."""
    dxy, dwh = deltas[..., :2], deltas[..., 2:]
    pxy, pwh = proposals[..., :2], proposals[..., 2:]
    max_ratio = abs(math.log(wh_ratio_clip))
    gxy = pxy + pwh * dxy
    gwh = pwh * jnp.exp(jnp.clip(dwh, -max_ratio, max_ratio))
    x1y1 = gxy - gwh * 0.5
    x2y2 = gxy + gwh * 0.5
    boxes = jnp.concatenate([x1y1, x2y2], -1)
    if max_shape is not None:
        h, w = max_shape
        x = jnp.clip(boxes[..., 0::2], 0, w)
        y = jnp.clip(boxes[..., 1::2], 0, h)
        boxes = jnp.stack([x[..., 0], y[..., 0], x[..., 1], y[..., 1]], -1)
    return boxes


def inverse_sigmoid(x, eps=1e-5):
    x = jnp.clip(x, 0, 1)
    return jnp.log(jnp.clip(x, eps, None) / jnp.clip(1 - x, eps, None))


# ---------------------------------------------------------------------------
# backbone features + positions (models/backbone.py, windows.py,
# position_encoding.py)
# ---------------------------------------------------------------------------

_POS_CACHE: dict = {}


def detection_sine_pos(h, w, num_pos_feats, normalize=True, temperature=10000.0):
    """Detection's PositionEmbeddingSine with the -0.5 center offset
    (position_encoding.py:58-77), no padding. (h*w, 2*num_pos_feats)."""
    key = (h, w, num_pos_feats, normalize)
    out = _POS_CACHE.get(key)
    if out is not None:
        return out
    scale = 2 * math.pi
    y = np.arange(h, dtype=np.float64) + 1.0 - 0.5
    x = np.arange(w, dtype=np.float64) + 1.0 - 0.5
    if normalize:
        y = y / (h + 1e-6) * scale
        x = x / (w + 1e-6) * scale
    else:
        y, x = y * scale, x * scale
    dim_t = temperature ** (2 * (np.arange(num_pos_feats) // 2) / num_pos_feats)

    def enc(v):
        p = v[:, None] / dim_t
        return np.stack([np.sin(p[:, 0::2]), np.cos(p[:, 1::2])], -1).reshape(len(v), -1)

    out = np.concatenate(
        [np.repeat(enc(y), w, axis=0), np.tile(enc(x), (h, 1))], -1
    ).astype(np.float32)
    _POS_CACHE[key] = out
    return out


def detection_backbone_features(
    backbone_params, vit_cfg, x, layers_to_use=1, ln_params=None
):
    """DINOBackbone.forward (backbone.py:75-90): frozen-ViT intermediate
    patch maps (NHWC), optional per-layer LayerNorm2D, channel-concat."""
    from omgsr_tpu.models.dinov3_vit import get_intermediate_layers

    bb = jax.lax.stop_gradient(backbone_params)
    xs = get_intermediate_layers(bb, vit_cfg, x, n=layers_to_use, reshape=True)
    if ln_params is not None:
        xs = [layer_norm(ln_params[str(i)]["ln"], xi) for i, xi in enumerate(xs)]
    return jnp.concatenate(xs, axis=-1)


def windowed_backbone_features(feats_fn, x, n_windows: int, patch_size: int):
    """WindowsWrapper.forward (windows.py:42-82) for divisible inputs:
    n x n equal windows through the backbone, tiled back together, plus a
    window-sized resized global view upsampled to the full grid;
    channel-concat [global | windows] (num_channels doubles)."""
    b, h, w, _ = x.shape
    wh = -(-(h // n_windows) // patch_size) * patch_size
    ww = -(-(w // n_windows) // patch_size) * patch_size
    assert wh * n_windows == h and ww * n_windows == w, (
        "windowed path expects h, w divisible into equal patch-multiple windows"
    )
    rows = []
    for ih in range(n_windows):
        cols = [
            feats_fn(x[:, ih * wh : (ih + 1) * wh, iw * ww : (iw + 1) * ww])
            for iw in range(n_windows)
        ]
        rows.append(jnp.concatenate(cols, axis=2))
    window_feats = jnp.concatenate(rows, axis=1)
    resized = jax.image.resize(x, (b, wh, ww, x.shape[-1]), "linear")
    global_feats = feats_fn(resized)
    global_up = bilinear_resize(global_feats, window_feats.shape[1:3], False)
    return jnp.concatenate([global_up, window_feats], axis=-1)


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _xavier_dense(key, cin, cout, bias=True, dtype=jnp.float32):
    lim = math.sqrt(6.0 / (cin + cout))
    p = {"kernel": jax.random.uniform(key, (cin, cout), dtype, -lim, lim)}
    if bias:
        p["bias"] = jnp.zeros((cout,), dtype)
    return p


def _mlp3(key, din, dh, dout, dtype):
    ks = jax.random.split(key, 3)
    return {
        "layers": {
            "0": _xavier_dense(ks[0], din, dh, dtype=dtype),
            "1": _xavier_dense(ks[1], dh, dh, dtype=dtype),
            "2": _xavier_dense(ks[2], dh, dout, dtype=dtype),
        }
    }


def _mlp3_apply(p, x):
    for i in range(3):
        x = dense(p["layers"][str(i)], x)
        if i < 2:
            x = jax.nn.relu(x)
    return x


def _attn_p(key, d, dtype):
    return {
        "in_proj": _xavier_dense(key, d, 3 * d, dtype=dtype),
        "out_proj": _xavier_dense(jax.random.fold_in(key, 1), d, d, dtype=dtype),
    }


def init_plain_detr(key, cfg: DetectionConfig, backbone_channels: int, dtype=jnp.float32):
    """Param tree with torch state-dict key paths for the full PlainDETR
    (detr.py:64-119 wiring + transformer + decoder)."""
    d = cfg.hidden_dim
    ks = iter(jax.random.split(key, 256))
    n_pred = cfg.dec_layers + 1 if cfg.two_stage else cfg.dec_layers

    def class_embed():
        prior = 0.01
        return {
            "kernel": _xavier_dense(next(ks), d, cfg.num_classes, dtype=dtype)["kernel"],
            "bias": jnp.full((cfg.num_classes,), -math.log((1 - prior) / prior), dtype),
        }

    def bbox_embed():
        p = _mlp3(next(ks), d, d, 4, dtype)
        p["layers"]["2"]["kernel"] = jnp.zeros_like(p["layers"]["2"]["kernel"])
        p["layers"]["2"]["bias"] = jnp.zeros((4,), dtype)
        return p

    def decoder_layer():
        return {
            "cross_attn": {
                "cpb_mlp1": {
                    "0": _xavier_dense(next(ks), 2, cfg.decoder_rpe_hidden_dim, dtype=dtype),
                    "2": _xavier_dense(next(ks), cfg.decoder_rpe_hidden_dim, cfg.nheads, False, dtype),
                },
                "cpb_mlp2": {
                    "0": _xavier_dense(next(ks), 2, cfg.decoder_rpe_hidden_dim, dtype=dtype),
                    "2": _xavier_dense(next(ks), cfg.decoder_rpe_hidden_dim, cfg.nheads, False, dtype),
                },
                "q": _xavier_dense(next(ks), d, d, dtype=dtype),
                "k": _xavier_dense(next(ks), d, d, dtype=dtype),
                "v": _xavier_dense(next(ks), d, d, dtype=dtype),
                "proj": _xavier_dense(next(ks), d, d, dtype=dtype),
            },
            "norm1": init_norm(d, dtype),
            "self_attn": _attn_p(next(ks), d, dtype),
            "norm2": init_norm(d, dtype),
            "linear1": _xavier_dense(next(ks), d, cfg.dim_feedforward, dtype=dtype),
            "linear2": _xavier_dense(next(ks), cfg.dim_feedforward, d, dtype=dtype),
            "norm3": init_norm(d, dtype),
        }

    transformer = {
        "level_embed": jax.random.normal(next(ks), (1, d), dtype),
        "decoder": {
            "layers": {str(i): decoder_layer() for i in range(cfg.dec_layers)},
        },
    }
    if cfg.norm_type == "pre_norm":
        transformer["decoder"]["final_layer_norm"] = init_norm(d, dtype)
    if cfg.two_stage:
        transformer["enc_output"] = _xavier_dense(next(ks), d, d, dtype=dtype)
        transformer["enc_output_norm"] = init_norm(d, dtype)
        transformer["pos_trans"] = _xavier_dense(next(ks), 2 * d, 2 * d, dtype=dtype)
        transformer["pos_trans_norm"] = init_norm(2 * d, dtype)
    else:
        transformer["reference_points"] = _xavier_dense(next(ks), d, 2, dtype=dtype)
    if cfg.two_stage and cfg.proposal_feature_levels > 1:
        proj = {}
        for i, stride in enumerate(cfg.proposal_tgt_strides):
            if stride == cfg.proposal_in_stride:
                proj[str(i)] = {}
                continue
            scale = int(abs(math.log2(stride / cfg.proposal_in_stride)))
            node = {}
            for j in range(scale):
                idx = 3 * j  # conv/ct at 0, LN at 1, GELU at 2 per block
                node[str(idx)] = (
                    {"kernel": jax.random.normal(next(ks), (d, d, 2, 2), dtype) * 0.02,
                     "bias": jnp.zeros((d,), dtype)}
                    if stride < cfg.proposal_in_stride
                    else {"kernel": jax.random.normal(next(ks), (2, 2, d, d), dtype) * 0.02,
                          "bias": jnp.zeros((d,), dtype)}
                )
                if j < scale - 1:
                    node[str(idx + 1)] = {"ln": init_norm(d, dtype)}
            proj[str(i)] = node
        transformer["enc_output_proj"] = proj
    if cfg.add_transformer_encoder:
        transformer["encoder"] = {
            "layers": {
                str(i): {
                    "self_attn": _attn_p(next(ks), d, dtype),
                    "linear1": _xavier_dense(next(ks), d, cfg.encoder_dim_feedforward, dtype=dtype),
                    "linear2": _xavier_dense(next(ks), cfg.encoder_dim_feedforward, d, dtype=dtype),
                    "norm1": init_norm(d, dtype),
                    "norm2": init_norm(d, dtype),
                }
                for i in range(cfg.num_encoder_layers)
            }
        }
        if cfg.encoder_normalize_before:
            transformer["encoder"]["norm"] = init_norm(d, dtype)

    params = {
        "transformer": transformer,
        "input_proj": {
            "0": {"0": {"kernel": _xavier_dense(next(ks), backbone_channels, d, dtype=dtype)["kernel"].reshape(1, 1, backbone_channels, d), "bias": jnp.zeros((d,), dtype)}, "1": init_norm(d, dtype)}
        },
        "class_embed": {str(i): class_embed() for i in range(n_pred)},
        "bbox_embed": {str(i): bbox_embed() for i in range(n_pred)},
    }
    if not cfg.two_stage or cfg.mixed_selection:
        qdim = d if cfg.mixed_selection else 2 * d
        params["query_embed"] = {
            "weight": jax.random.normal(next(ks), (cfg.num_queries, qdim), dtype)
        }
    return params


# ---------------------------------------------------------------------------
# apply
# ---------------------------------------------------------------------------


def _encoder_apply(p, cfg, src, pos):
    """TransformerEncoder, pre/post-norm (transformer_encoder.py:48-114)."""
    pre = cfg.encoder_normalize_before
    for i in range(cfg.num_encoder_layers):
        lp = p["layers"][str(i)]
        if pre:
            s2 = layer_norm(lp["norm1"], src)
            src = src + _mha(lp["self_attn"], s2 + pos, s2 + pos, s2, cfg.nheads)
            s2 = layer_norm(lp["norm2"], src)
            src = src + dense(lp["linear2"], jax.nn.relu(dense(lp["linear1"], s2)))
        else:
            src = layer_norm(
                lp["norm1"], src + _mha(lp["self_attn"], src + pos, src + pos, src, cfg.nheads)
            )
            src = layer_norm(
                lp["norm2"], src + dense(lp["linear2"], jax.nn.relu(dense(lp["linear1"], src)))
            )
    if pre and "norm" in p:
        src = layer_norm(p["norm"], src)
    return src


def _global_cross_attention(p, cfg, query, reference_points, k_in, v_in, hw):
    """GlobalCrossAttention.forward (global_rpe_decomp_decoder.py:61-129),
    no padding mask. reference_points (B, Q, 1, 4) cxcywh — absolute pixels
    under reparam, normalized otherwise."""
    h, w = hw
    stride = cfg.proposal_in_stride
    centers, sizes = reference_points[..., :2], reference_points[..., 2:]
    ref_pts = jnp.concatenate([centers - sizes / 2, centers + sizes / 2], -1)
    if not cfg.reparam:
        ref_pts = ref_pts * jnp.asarray([w * stride, h * stride, w * stride, h * stride], ref_pts.dtype)
    pos_x = (np.arange(w, dtype=np.float32) + 0.5) * stride  # (w,)
    pos_y = (np.arange(h, dtype=np.float32) + 0.5) * stride
    delta_x = ref_pts[..., 0::2] - jnp.asarray(pos_x)[None, None, :, None]  # (B,Q,w,2)
    delta_y = ref_pts[..., 1::2] - jnp.asarray(pos_y)[None, None, :, None]  # (B,Q,h,2)
    if cfg.decoder_rpe_type == "abs_log8":
        delta_x = jnp.sign(delta_x) * jnp.log2(jnp.abs(delta_x) + 1.0) / math.log2(8)
        delta_y = jnp.sign(delta_y) * jnp.log2(jnp.abs(delta_y) + 1.0) / math.log2(8)
    elif cfg.decoder_rpe_type != "linear":
        raise ValueError(cfg.decoder_rpe_type)

    def cpb(mp, v):
        return dense(mp["2"], jax.nn.relu(dense(mp["0"], v)))

    rpe_x = cpb(p["cpb_mlp1"], delta_x)  # (B, Q, w, H)
    rpe_y = cpb(p["cpb_mlp2"], delta_y)  # (B, Q, h, H)
    rpe = rpe_x[:, :, None] + rpe_y[:, :, :, None]  # (B, Q, h, w, H)
    b, q = rpe.shape[:2]
    rpe = rpe.reshape(b, q, h * w, cfg.nheads).transpose(0, 3, 1, 2)  # (B, H, Q, S)

    dh = cfg.hidden_dim // cfg.nheads
    kk = dense(p["k"], k_in).reshape(b, -1, cfg.nheads, dh)
    vv = dense(p["v"], v_in).reshape(b, -1, cfg.nheads, dh)
    qq = dense(p["q"], query).reshape(b, q, cfg.nheads, dh)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qq, kk).astype(jnp.float32) * (dh**-0.5)
    attn = jax.nn.softmax(logits + rpe.astype(jnp.float32), axis=-1).astype(query.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", attn, vv).reshape(b, q, cfg.hidden_dim)
    return dense(p["proj"], out)


def _decoder_layer_apply(p, cfg, tgt, query_pos, reference_points, src, src_pos, hw, self_attn_mask):
    pre = cfg.norm_type == "pre_norm"
    if pre:
        t2 = layer_norm(p["norm2"], tgt)
        tgt = tgt + _mha(p["self_attn"], t2 + query_pos, t2 + query_pos, t2, cfg.nheads, self_attn_mask)
        t2 = layer_norm(p["norm1"], tgt)
        tgt = tgt + _global_cross_attention(
            p["cross_attn"], cfg, t2 + query_pos, reference_points, src + src_pos, src, hw
        )
        t2 = layer_norm(p["norm3"], tgt)
        tgt = tgt + dense(p["linear2"], jax.nn.relu(dense(p["linear1"], t2)))
    else:
        tgt = layer_norm(
            p["norm2"],
            tgt + _mha(p["self_attn"], tgt + query_pos, tgt + query_pos, tgt, cfg.nheads, self_attn_mask),
        )
        tgt = layer_norm(
            p["norm1"],
            tgt + _global_cross_attention(
                p["cross_attn"], cfg, tgt + query_pos, reference_points, src + src_pos, src, hw
            ),
        )
        tgt = layer_norm(
            p["norm3"], tgt + dense(p["linear2"], jax.nn.relu(dense(p["linear1"], tgt)))
        )
    return tgt


def _decoder_apply(params, cfg, tgt, reference_points, src, src_pos, hw, query_pos, self_attn_mask, max_shape):
    """GlobalDecoder.forward (:332-417) with box refinement and
    look-forward-twice; returns stacked intermediates."""
    dec = params["transformer"]["decoder"]
    output = tgt
    inter, inter_refs = [], []
    for lid in range(cfg.dec_layers):
        ref_input = reference_points[:, :, None]
        output = _decoder_layer_apply(
            dec["layers"][str(lid)], cfg, output, query_pos, ref_input, src, src_pos, hw, self_attn_mask
        )
        out_n = (
            layer_norm(dec["final_layer_norm"], output)
            if "final_layer_norm" in dec
            else output
        )
        if cfg.with_box_refine:
            tmp = _mlp3_apply(params["bbox_embed"][str(lid)], out_n)
            if cfg.reparam:
                new_refs = box_xyxy_to_cxcywh(delta2bbox(reference_points, tmp, max_shape))
            elif reference_points.shape[-1] == 4:
                new_refs = jax.nn.sigmoid(tmp + inverse_sigmoid(reference_points))
            else:  # 2-dim initial refs grow to 4-dim boxes (:399-405)
                new_refs = jax.nn.sigmoid(
                    jnp.concatenate(
                        [tmp[..., :2] + inverse_sigmoid(reference_points), tmp[..., 2:]], -1
                    )
                )
            reference_points = jax.lax.stop_gradient(new_refs)
        else:
            new_refs = reference_points
        inter.append(out_n)
        inter_refs.append(new_refs if cfg.look_forward_twice else reference_points)
    return jnp.stack(inter), jnp.stack(inter_refs)


def _proposal_pos_embed(proposals, d_model):
    """get_proposal_pos_embed (transformer.py:141-154): per-coordinate sine
    features, coordinate-major concat -> (B, L, 2*d_model)."""
    num_pos_feats = d_model // 2
    dim_t = 10000 ** (2 * (np.arange(num_pos_feats) // 2) / num_pos_feats)
    pos = proposals * (2 * math.pi)
    pos = pos[..., None] / jnp.asarray(dim_t, pos.dtype)  # (B, L, 4, npf)
    pos = jnp.stack([jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], -1)
    return pos.reshape(*pos.shape[:2], -1)


def _expand_encoder_output(params, cfg, memory, hw):
    """expand_encoder_output (transformer.py:205-225): project the single
    stride-16 map to the 4 proposal strides."""
    b, _, c = memory.shape
    h, w = hw
    grid = memory.reshape(b, h, w, c)
    proj = params["transformer"]["enc_output_proj"]
    mems, shapes = [], []
    for i, stride in enumerate(cfg.proposal_tgt_strides):
        m = grid
        if stride != cfg.proposal_in_stride:
            node = proj[str(i)]  # identity levels carry no params
            scale = int(abs(math.log2(stride / cfg.proposal_in_stride)))
            up = stride < cfg.proposal_in_stride
            for j in range(scale):
                idx = 3 * j
                if up:
                    m = _conv_transpose_kxk(node[str(idx)], m, 2)
                else:
                    m = conv2d(node[str(idx)], m, stride=2, padding="VALID")
                if j < scale - 1:
                    m = jax.nn.gelu(layer_norm(node[str(idx + 1)]["ln"], m), approximate=False)
        mems.append(m.reshape(b, -1, c))
        shapes.append(m.shape[1:3])
    return jnp.concatenate(mems, axis=1), shapes


def _gen_proposals(params, cfg, memory, hw):
    """gen_encoder_output_proposals — reparam (TransformerReParam:340-386,
    absolute-pixel anchors) and plain (Transformer:156-194, logit-space
    anchors). No padding: every in-bounds proposal is valid."""
    if cfg.proposal_feature_levels > 1:
        memory, shapes = _expand_encoder_output(params, cfg, memory, hw)
    else:
        shapes = [hw]
    b = memory.shape[0]
    props = []
    for lvl, (hl, wl) in enumerate(shapes):
        gy, gx = np.meshgrid(
            np.arange(hl, dtype=np.float32), np.arange(wl, dtype=np.float32), indexing="ij"
        )
        grid = np.stack([gx, gy], -1).reshape(-1, 2)
        if cfg.reparam:
            stride = cfg.proposal_tgt_strides[lvl]
            grid = (grid + 0.5) * stride
            wh = np.full_like(grid, cfg.proposal_min_size * (2.0**lvl))
        else:
            grid = (grid + 0.5) / np.asarray([wl, hl], np.float32)
            wh = np.full_like(grid, 0.05 * (2.0**lvl))
        props.append(np.concatenate([grid, wh], -1))
    proposals = jnp.asarray(np.concatenate(props, 0))[None]
    proposals = jnp.broadcast_to(proposals, (b, proposals.shape[1], 4))

    if cfg.reparam:
        h0, w0 = shapes[0]
        s0 = cfg.proposal_tgt_strides[0]
        img_hw = jnp.asarray([w0 * s0, h0 * s0, w0 * s0, h0 * s0], jnp.float32)
        valid = jnp.all(
            (proposals > 0.01 * img_hw) & (proposals < 0.99 * img_hw), -1, keepdims=True
        )
        fill = float(max(h0, w0) * s0)
        proposals = jnp.where(valid, proposals, fill)
        max_shape = (float(h0 * s0), float(w0 * s0))
    else:
        valid = jnp.all((proposals > 0.01) & (proposals < 0.99), -1, keepdims=True)
        proposals = jnp.where(valid, inverse_sigmoid(proposals), jnp.inf)
        max_shape = None
    mem = jnp.where(valid, memory, 0.0)
    mem = layer_norm(
        params["transformer"]["enc_output_norm"],
        dense(params["transformer"]["enc_output"], mem),
    )
    return mem, proposals, max_shape


def plain_detr_apply(params, cfg: DetectionConfig, feat, pos=None):
    """PlainDETR(ReParam).forward (detr.py:121-237 / :240-365) over a
    prepared backbone feature map (NHWC, stride proposal_in_stride).
    Returns the reference out dict (pred_logits, pred_boxes, one2many +
    aux + enc outputs)."""
    b, h, w, _ = feat.shape
    src = conv2d(params["input_proj"]["0"]["0"], feat, padding="VALID")
    src = group_norm(params["input_proj"]["0"]["1"], src, num_groups=32, eps=1e-5)
    d = cfg.hidden_dim
    src = src.reshape(b, h * w, d)
    if pos is None:
        pos = jnp.asarray(detection_sine_pos(h, w, d // 2))[None]
    pos = pos.reshape(1, h * w, d) + params["transformer"]["level_embed"][0][None, None]

    nq1 = cfg.num_queries_one2one
    self_attn_mask = np.zeros((cfg.num_queries, cfg.num_queries), bool)
    self_attn_mask[nq1:, :nq1] = True
    self_attn_mask[:nq1, nq1:] = True
    self_attn_mask = jnp.asarray(self_attn_mask)[None, None]

    t = params["transformer"]
    memory = (
        _encoder_apply(t["encoder"], cfg, src, pos.astype(src.dtype))
        if cfg.add_transformer_encoder
        else src
    )

    enc_out = None
    if cfg.two_stage:
        out_mem, proposals, max_shape = _gen_proposals(params, cfg, memory, (h, w))
        n_layers = cfg.dec_layers
        enc_cls = dense(params["class_embed"][str(n_layers)], out_mem)
        if cfg.reparam:
            enc_delta = _mlp3_apply(params["bbox_embed"][str(n_layers)], out_mem)
            enc_coord = box_xyxy_to_cxcywh(delta2bbox(proposals, enc_delta, max_shape))
        else:
            enc_delta = None
            enc_coord = _mlp3_apply(params["bbox_embed"][str(n_layers)], out_mem) + proposals
        k = cfg.num_queries
        _, top_idx = jax.lax.top_k(enc_cls[..., 0], k)
        top_coords = jnp.take_along_axis(enc_coord, top_idx[..., None], axis=1)
        top_coords = jax.lax.stop_gradient(top_coords)
        reference_points = top_coords if cfg.reparam else jax.nn.sigmoid(top_coords)
        pos_trans = layer_norm(
            t["pos_trans_norm"], dense(t["pos_trans"], _proposal_pos_embed(reference_points, d))
        )
        if cfg.mixed_selection:
            tgt = jnp.broadcast_to(params["query_embed"]["weight"][None], (b, k, d))
            query_pos = pos_trans[..., :d]
        else:
            query_pos, tgt = pos_trans[..., :d], pos_trans[..., d:]
        enc_out = {
            "pred_logits": enc_cls,
            "pred_boxes": enc_coord if cfg.reparam else jax.nn.sigmoid(enc_coord),
            "pred_boxes_old": proposals,
            "pred_deltas": enc_delta,
        }
    else:
        qe = params["query_embed"]["weight"]
        query_pos = jnp.broadcast_to(qe[None, :, :d], (b, cfg.num_queries, d))
        tgt = jnp.broadcast_to(qe[None, :, d:], (b, cfg.num_queries, d))
        reference_points = jax.nn.sigmoid(dense(t["reference_points"], query_pos))
        max_shape = None

    hs, inter_refs = _decoder_apply(
        params, cfg, tgt, reference_points, memory, pos.astype(memory.dtype), (h, w),
        query_pos, self_attn_mask, max_shape,
    )

    classes, coords, coords_old, deltas = [], [], [], []
    for lvl in range(cfg.dec_layers):
        ref = reference_points if lvl == 0 else inter_refs[lvl - 1]
        ocls = dense(params["class_embed"][str(lvl)], hs[lvl])
        tmp = _mlp3_apply(params["bbox_embed"][str(lvl)], hs[lvl])
        if cfg.reparam:
            ocoord = box_xyxy_to_cxcywh(delta2bbox(ref, tmp, max_shape))
        else:
            iref = inverse_sigmoid(ref)
            if ref.shape[-1] == 4:
                ocoord = jax.nn.sigmoid(tmp + iref)
            else:
                ocoord = jax.nn.sigmoid(
                    jnp.concatenate([tmp[..., :2] + iref, tmp[..., 2:]], -1)
                )
        classes.append(ocls)
        coords.append(ocoord)
        coords_old.append(ref)
        deltas.append(tmp)

    def split(xs):
        return (
            jnp.stack([x[:, :nq1] for x in xs]),
            jnp.stack([x[:, nq1:] for x in xs]),
        )

    cls_11, cls_1m = split(classes)
    box_11, box_1m = split(coords)
    out = {
        "pred_logits": cls_11[-1],
        "pred_boxes": box_11[-1],
        "pred_logits_one2many": cls_1m[-1],
        "pred_boxes_one2many": box_1m[-1],
    }
    if cfg.reparam:
        old_11, old_1m = split(coords_old)
        dl_11, dl_1m = split(deltas)
        out.update(
            pred_boxes_old=old_11[-1], pred_deltas=dl_11[-1],
            pred_boxes_old_one2many=old_1m[-1], pred_deltas_one2many=dl_1m[-1],
        )
    if cfg.aux_loss:
        out["aux_outputs"] = [
            {"pred_logits": cls_11[i], "pred_boxes": box_11[i]}
            for i in range(cfg.dec_layers - 1)
        ]
        out["aux_outputs_one2many"] = [
            {"pred_logits": cls_1m[i], "pred_boxes": box_1m[i]}
            for i in range(cfg.dec_layers - 1)
        ]
    if enc_out is not None:
        out["enc_outputs"] = enc_out
    return out


def detr_postprocess(outputs, target_sizes, topk=100, reparam=False, original_target_sizes=None):
    """PostProcess.forward (detr.py:384-430): per-image top-k boxes in
    absolute xyxy. target_sizes (B, 2) = (h, w)."""
    logits, boxes = outputs["pred_logits"], outputs["pred_boxes"]
    b, q, c = logits.shape
    prob = jax.nn.sigmoid(logits).reshape(b, -1)
    scores, idx = jax.lax.top_k(prob, topk)
    box_idx = idx // c
    labels = idx % c
    xyxy = box_cxcywh_to_xyxy(boxes)
    xyxy = jnp.take_along_axis(xyxy, box_idx[..., None], axis=1)
    img_h, img_w = target_sizes[:, 0], target_sizes[:, 1]
    if reparam:
        xyxy = jnp.stack(
            [
                jnp.clip(xyxy[..., 0], 0, img_w[:, None]),
                jnp.clip(xyxy[..., 1], 0, img_h[:, None]),
                jnp.clip(xyxy[..., 2], 0, img_w[:, None]),
                jnp.clip(xyxy[..., 3], 0, img_h[:, None]),
            ],
            -1,
        )
        scale_hw = original_target_sizes / target_sizes
        scale = jnp.stack(
            [scale_hw[:, 1], scale_hw[:, 0], scale_hw[:, 1], scale_hw[:, 0]], -1
        )
    else:
        scale = jnp.stack([img_w, img_h, img_w, img_h], -1)
    return {"scores": scores, "labels": labels, "boxes": xyxy * scale[:, None, :]}


# ---------------------------------------------------------------------------
# torch checkpoint porter
# ---------------------------------------------------------------------------


def detr_transpose_paths(cfg: DetectionConfig):
    """State-dict prefixes whose 4-D weights are ConvTranspose2d (kept in
    the torch (I, O, k, k) layout): the upsampling enc_output_proj stages."""
    out = []
    for i, stride in enumerate(cfg.proposal_tgt_strides):
        if stride < cfg.proposal_in_stride:
            scale = int(math.log2(cfg.proposal_in_stride / stride))
            for j in range(scale):
                out.append(f"enc_output_proj.{i}.{3 * j}.")
    return out


def port_detr_state(state_dict, cfg: DetectionConfig, dtype=jnp.float32):
    """torch PlainDETR(ReParam) state dict -> the tree above (same walker
    rules as port_m2f_state, plus the ConvTranspose prefix set)."""
    tposes = detr_transpose_paths(cfg)
    out: dict = {}
    for name, t in state_dict.items():
        arr = np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t)
        parts = name.split(".")
        leaf = parts[-1]
        path = parts[:-1]
        # LayerNorm2D nests its LN at ".ln"
        if leaf == "num_batches_tracked":
            continue
        if leaf == "in_proj_weight":
            path, key, arr = parts[:-1] + ["in_proj"], "kernel", arr.T
        elif leaf == "in_proj_bias":
            path, key = parts[:-1] + ["in_proj"], "bias"
        elif leaf == "level_embed":
            path, key = parts[:-1], "level_embed"
        elif leaf == "weight":
            if any(tp in name for tp in tposes):
                key = "kernel"  # ConvTranspose torch layout kept
            elif arr.ndim == 4:
                key, arr = "kernel", arr.transpose(2, 3, 1, 0)
            elif arr.ndim == 2:
                if parts[-2] == "query_embed":
                    key = "weight"
                else:
                    key, arr = "kernel", arr.T
            else:
                key = "scale"
        elif leaf == "bias":
            key = "bias"
        else:
            continue
        node = out
        for p in path:
            node = node.setdefault(p, {})
        node[key] = jnp.asarray(arr, dtype)
    return out
