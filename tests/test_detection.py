"""Plain-DETR detection suite (eval/detection.py) vs the ACTUAL vendored
torch implementation through the production porter — box ops, sine
positions, global RPE cross-attention, and the full two-stage
reparameterized PlainDETR forward."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from omgsr_tpu.eval.detection import (
    DetectionConfig,
    box_cxcywh_to_xyxy,
    box_xyxy_to_cxcywh,
    delta2bbox,
    detection_backbone_features,
    detection_sine_pos,
    detr_postprocess,
    init_plain_detr,
    inverse_sigmoid,
    plain_detr_apply,
    port_detr_state,
    windowed_backbone_features,
)

REF_ROOT = "/root/reference/dinov3_gan/facebookresearch_dinov3_main"
if REF_ROOT not in sys.path:
    sys.path.insert(0, REF_ROOT)

# util/misc.py imports torchvision (absent in this image) only for a
# version workaround — install the SHARED faithful shim (a permissive
# module-level stub here would pre-empt the degradation parity tests'
# transforms math, since whoever registers "torchvision" first wins)
from torchvision_shim import install_torchvision_shim

install_torchvision_shim()

TINY = DetectionConfig(
    num_classes=7,
    num_queries_one2one=6,
    num_queries_one2many=10,
    hidden_dim=32,
    nheads=4,
    dec_layers=2,
    dim_feedforward=64,
    decoder_rpe_hidden_dim=16,
    num_encoder_layers=2,
)


def test_box_ops_match_torch():
    from dinov3.eval.detection.util import box_ops as ref

    rng = np.random.default_rng(0)
    boxes = rng.uniform(0.1, 0.9, (2, 5, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(box_cxcywh_to_xyxy(jnp.asarray(boxes))),
        ref.box_cxcywh_to_xyxy(torch.from_numpy(boxes)).numpy(),
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(box_xyxy_to_cxcywh(jnp.asarray(boxes))),
        ref.box_xyxy_to_cxcywh(torch.from_numpy(boxes)).numpy(),
        rtol=1e-6,
    )
    proposals = np.abs(rng.normal(20, 5, (2, 5, 4))).astype(np.float32)
    deltas = rng.normal(0, 1, (2, 5, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(delta2bbox(jnp.asarray(proposals), jnp.asarray(deltas), (40.0, 50.0))),
        ref.delta2bbox(
            torch.from_numpy(proposals), torch.from_numpy(deltas), (40.0, 50.0)
        ).numpy(),
        rtol=1e-5, atol=1e-5,
    )


def test_detection_sine_pos_matches_torch():
    from dinov3.eval.detection.models.position_encoding import PositionEmbeddingSine
    from dinov3.eval.detection.util.misc import NestedTensor

    for normalize in (True, False):
        pe = PositionEmbeddingSine(16, normalize=normalize)
        x = torch.zeros(1, 32, 5, 7)
        mask = torch.zeros(1, 5, 7, dtype=torch.bool)
        want = pe(NestedTensor(x, mask)).permute(0, 2, 3, 1).reshape(35, 32).numpy()
        got = detection_sine_pos(5, 7, 16, normalize=normalize)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def _args(**kw):
    from dinov3.eval.detection.config import DetectionHeadConfig

    return DetectionHeadConfig(
        proposal_in_stride=16,
        proposal_tgt_strides=[8, 16, 32, 64],
        num_classes=TINY.num_classes,
        num_queries_one2one=TINY.num_queries_one2one,
        num_queries_one2many=TINY.num_queries_one2many,
        hidden_dim=TINY.hidden_dim,
        nheads=TINY.nheads,
        dec_layers=TINY.dec_layers,
        dim_feedforward=TINY.dim_feedforward,
        decoder_rpe_hidden_dim=TINY.decoder_rpe_hidden_dim,
        num_encoder_layers=TINY.num_encoder_layers,
        **kw,
    )


def test_plain_detr_reparam_matches_torch():
    """The full published path: post-norm-encoder + two-stage reparam
    proposals (4 expansion levels) + mixed selection + global-RPE decoder
    with box refinement + look-forward-twice."""
    from dinov3.eval.detection.models.detr import PlainDETRReParam
    from dinov3.eval.detection.models.transformer import build_transformer
    from dinov3.eval.detection.util.misc import NestedTensor
    from torch import nn

    args = _args()
    torch.manual_seed(0)
    transformer = build_transformer(args)

    c_feat = 40
    rng = np.random.default_rng(1)
    feat_np = rng.standard_normal((1, 4, 4, c_feat)).astype(np.float32)

    class StubBackbone(nn.Module):
        num_channels = [c_feat]
        strides = [16]

        def forward(self, samples):
            from dinov3.eval.detection.models.position_encoding import (
                PositionEmbeddingSine,
            )

            t = torch.from_numpy(feat_np).permute(0, 3, 1, 2).contiguous()
            mask = torch.zeros(1, 4, 4, dtype=torch.bool)
            nt = NestedTensor(t, mask)
            pos = PositionEmbeddingSine(args.hidden_dim // 2, normalize=True)(nt)
            return [nt], [pos]

    model = PlainDETRReParam(
        StubBackbone(),
        transformer,
        num_classes=args.num_classes,
        num_feature_levels=1,
        aux_loss=True,
        with_box_refine=True,
        two_stage=True,
        num_queries_one2one=args.num_queries_one2one,
        num_queries_one2many=args.num_queries_one2many,
        mixed_selection=True,
    )
    model.eval()

    with torch.no_grad():
        img = torch.zeros(1, 3, 64, 64)
        want = model(NestedTensor(img, torch.zeros(1, 64, 64, dtype=torch.bool)))

    sd = {k: v for k, v in model.state_dict().items() if not k.startswith("backbone.")}
    params = port_detr_state(sd, TINY)
    got = plain_detr_apply(params, TINY, jnp.asarray(feat_np))

    for k in ("pred_logits", "pred_boxes", "pred_logits_one2many", "pred_boxes_one2many",
              "pred_boxes_old", "pred_deltas"):
        np.testing.assert_allclose(
            np.asarray(got[k]), want[k].numpy(), rtol=2e-3, atol=2e-3, err_msg=k
        )
    np.testing.assert_allclose(
        np.asarray(got["enc_outputs"]["pred_logits"]),
        want["enc_outputs"]["pred_logits"].numpy(),
        rtol=2e-3, atol=2e-3,
    )
    np.testing.assert_allclose(
        np.asarray(got["enc_outputs"]["pred_boxes"]),
        want["enc_outputs"]["pred_boxes"].numpy(),
        rtol=2e-3, atol=2e-2,
    )
    assert len(got["aux_outputs"]) == len(want["aux_outputs"])


def test_detr_postprocess_matches_torch():
    from dinov3.eval.detection.models.detr import PostProcess

    rng = np.random.default_rng(2)
    out = {
        "pred_logits": rng.standard_normal((2, 9, TINY.num_classes)).astype(np.float32),
        "pred_boxes": rng.uniform(0.2, 0.8, (2, 9, 4)).astype(np.float32),
    }
    sizes = np.asarray([[48.0, 64.0], [32.0, 32.0]], np.float32)
    pp = PostProcess(topk=5, reparam=False)
    with torch.no_grad():
        want = pp(
            {k: torch.from_numpy(v) for k, v in out.items()}, torch.from_numpy(sizes)
        )
    got = detr_postprocess(
        {k: jnp.asarray(v) for k, v in out.items()}, jnp.asarray(sizes), topk=5
    )
    for i in range(2):
        np.testing.assert_allclose(np.asarray(got["scores"][i]), want[i]["scores"].numpy(), rtol=1e-5)
        np.testing.assert_array_equal(np.asarray(got["labels"][i]), want[i]["labels"].numpy())
        np.testing.assert_allclose(np.asarray(got["boxes"][i]), want[i]["boxes"].numpy(), rtol=1e-4, atol=1e-4)


def test_backbone_features_and_windows():
    from omgsr_tpu.models.configs import DinoV3ViTConfig
    from omgsr_tpu.models.dinov3_vit import init_dinov3_vit

    vit = DinoV3ViTConfig(embed_dim=32, depth=3, num_heads=2, patch_size=16)
    bb = init_dinov3_vit(jax.random.key(0), vit)
    x = jax.random.normal(jax.random.key(1), (1, 64, 64, 3))
    feats = detection_backbone_features(bb, vit, x, layers_to_use=2)
    assert feats.shape == (1, 4, 4, 64)  # 2 layers channel-concat

    fn = lambda img: detection_backbone_features(bb, vit, img, layers_to_use=1)
    wf = windowed_backbone_features(fn, x, n_windows=2, patch_size=16)
    # windows tile the full grid; global branch doubles channels
    assert wf.shape == (1, 4, 4, 64)
    # the window quadrants reproduce the per-crop features exactly
    top_left = fn(x[:, :32, :32])
    np.testing.assert_allclose(
        np.asarray(wf[:, :2, :2, 32:]), np.asarray(top_left), rtol=1e-6
    )


def test_plain_detr_end_to_end_jit():
    """Random-init jitted forward at the published structure (tiny dims):
    shapes, finiteness, box sanity under reparam."""
    params = init_plain_detr(jax.random.key(0), TINY, backbone_channels=40)
    feat = jax.random.normal(jax.random.key(1), (2, 4, 4, 40))
    out = jax.jit(lambda p, f: plain_detr_apply(p, TINY, f))(params, feat)
    assert out["pred_logits"].shape == (2, TINY.num_queries_one2one, TINY.num_classes)
    assert out["pred_boxes"].shape == (2, TINY.num_queries_one2one, 4)
    assert out["pred_logits_one2many"].shape == (2, TINY.num_queries_one2many, TINY.num_classes)
    for v in jax.tree.leaves(out):
        assert bool(jnp.all(jnp.isfinite(v)))
    # reparam boxes are absolute pixels within the (64, 64) proposal frame
    assert float(out["pred_boxes"][..., 2:].min()) >= 0.0
