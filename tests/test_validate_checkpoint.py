"""The real-checkpoint validation harness, driven end-to-end on fabricated
tiny HF-layout checkpoints: porter -> JAX vs independent-torch parity report
must pass the 1e-3 target (the same code path to run on real weights the
moment they become mountable)."""

import json

import jax
import pytest
from safetensors.numpy import save_file

from omgsr_tpu.models import flux as F
from omgsr_tpu.models import vae as V
from tests.test_e2e_cli import sd_checkpoint, input_images  # noqa: F401 (fixtures)
from tests.test_models import TINY_FLUX, TINY_FLUX_VAE
from tests.test_porters import _to_torch_layout


@pytest.fixture(scope="module")
def flux_checkpoint(tmp_path_factory):
    root = tmp_path_factory.mktemp("fake_flux_v")
    (root / "vae").mkdir()
    (root / "transformer").mkdir()
    vp = V.init_vae(jax.random.key(10), TINY_FLUX_VAE)
    fp = F.init_flux(jax.random.key(11), TINY_FLUX)
    save_file(_to_torch_layout(vp), str(root / "vae" / "diffusion_pytorch_model.safetensors"))
    save_file(_to_torch_layout(fp), str(root / "transformer" / "diffusion_pytorch_model.safetensors"))
    (root / "vae" / "config.json").write_text(
        json.dumps(
            {"block_out_channels": [8, 16], "norm_num_groups": 4, "latent_channels": 16,
             "scaling_factor": 0.3611, "shift_factor": 0.1159,
             "use_quant_conv": False, "use_post_quant_conv": False}
        )
    )
    (root / "transformer" / "config.json").write_text(
        json.dumps(
            {"num_layers": 2, "num_single_layers": 2, "attention_head_dim": 8,
             "num_attention_heads": 4, "joint_attention_dim": 16,
             "pooled_projection_dim": 8, "axes_dims_rope": [2, 4, 2], "in_channels": 64}
        )
    )
    return root


def test_validate_sd_checkpoint(sd_checkpoint, tmp_path):  # noqa: F811
    from omgsr_tpu.cli.validate_checkpoint import main

    report_path = tmp_path / "report.json"
    main(["--sd_path", str(sd_checkpoint), "--report", str(report_path)])
    report = json.loads(report_path.read_text())
    assert "sd" in report
    for stage in ("vae_encode_moments", "vae_decode", "unet_eps_t273"):
        assert report["sd"][stage]["max_rel"] < 1e-3, (stage, report["sd"][stage])
    assert report["passes_1e-3_target"]


def test_validate_flux_checkpoint(flux_checkpoint, tmp_path):
    from omgsr_tpu.cli.validate_checkpoint import main

    report_path = tmp_path / "report.json"
    main(["--flux_path", str(flux_checkpoint), "--flux_tokens", "16",
          "--report", str(report_path)])
    report = json.loads(report_path.read_text())
    for stage in ("flux_vae_encode_moments", "flux_dit_velocity"):
        assert report["flux"][stage]["max_rel"] < 1e-3, (stage, report["flux"][stage])
    assert report["passes_1e-3_target"]


def test_validate_dinov3_checkpoint(tmp_path):
    """A fabricated hub-layout ViT-S .pth round-trips: port -> JAX forward
    == the ACTUAL vendored torch DinoVisionTransformer on the same weights
    (forward_features + 4 intermediate layers), within the 1e-3 target."""
    import sys

    import torch

    from omgsr_tpu.cli.validate_checkpoint import _DINOV3_REF_ROOT, validate_dinov3

    if _DINOV3_REF_ROOT not in sys.path:
        sys.path.insert(0, _DINOV3_REF_ROOT)
    from dinov3.models.vision_transformer import DinoVisionTransformer

    torch.manual_seed(0)
    m = DinoVisionTransformer(
        img_size=32, patch_size=16, embed_dim=384, depth=12, num_heads=6,
        ffn_ratio=4.0, ffn_layer="mlp", qkv_bias=True, layerscale_init=1e-5,
        n_storage_tokens=4, mask_k_bias=True, pos_embed_rope_base=100.0,
        pos_embed_rope_normalize_coords="separate", pos_embed_rope_dtype="fp32",
        norm_layer="layernormbf16",  # the hub ViTs' LN(eps=1e-5)
    )
    m.init_weights()
    with torch.no_grad():
        # randomize what init leaves at zero/constant; give the k-masked
        # bias buffer the pretrained-checkpoint pattern (attention.py:36)
        for name, p in m.named_parameters():
            if p.ndim == 1 or "token" in name:
                p.add_(0.05 * torch.randn_like(p))
        for blk in m.blocks:
            bm = blk.attn.qkv.bias_mask
            third = bm.numel() // 3
            bm.fill_(1.0)
            bm[third : 2 * third] = 0.0
    pth = tmp_path / "dinov3_vits16_fake.pth"
    torch.save(m.state_dict(), pth)

    report = validate_dinov3(str(pth), arch="vits16", image_size=32)
    assert report["torch_load"]["missing"] == []
    assert report["torch_load"]["unexpected"] == []
    for k, stage in report.items():
        if isinstance(stage, dict) and "max_rel" in stage:
            assert stage["max_rel"] < 1e-3, (k, stage)
    assert any("intermediate_layer_" in k for k in report)


def test_validate_dinov3_convnext_checkpoint(tmp_path):
    """ConvNeXt branch of the DINOv3 validator: fabricated hub .pth,
    per-stage feature parity vs the vendored torch ConvNeXt."""
    import sys

    import torch

    from omgsr_tpu.cli.validate_checkpoint import _DINOV3_REF_ROOT, validate_dinov3

    if _DINOV3_REF_ROOT not in sys.path:
        sys.path.insert(0, _DINOV3_REF_ROOT)
    from dinov3.models.convnext import ConvNeXt

    torch.manual_seed(1)
    m = ConvNeXt(depths=[3, 3, 9, 3], dims=[96, 192, 384, 768])  # tiny
    m.eval()
    pth = tmp_path / "dinov3_convnext_tiny_fake.pth"
    torch.save(m.state_dict(), pth)
    report = validate_dinov3(str(pth), arch="convnext_tiny", image_size=64)
    stages = [k for k in report if k.startswith("convnext_stage")]
    assert len(stages) == 4
    for k in stages:
        assert report[k]["max_rel"] < 1e-3, (k, report[k])
