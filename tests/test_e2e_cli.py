"""End-to-end CLI smoke: synthesized tiny checkpoints -> infer CLIs -> PNGs.

Covers BASELINE config 1 (single small-image x4 SR, CPU-runnable): checkpoint
porting, LoRA adapter merge, pre-resize protocol, tiled + no-tile paths,
color fix, and output geometry."""

import json
import os

import jax
import numpy as np
import pytest
from PIL import Image
from safetensors.numpy import save_file

from omgsr_tpu.lora import SD_TARGET_MODULES, init_lora_tree, save_adapter
from omgsr_tpu.models import flux as F
from omgsr_tpu.models import unet_sd as U
from omgsr_tpu.models import vae as V
from tests.test_models import TINY_FLUX, TINY_FLUX_VAE, TINY_UNET, TINY_VAE
from tests.test_porters import _to_torch_layout


def make_fake_sd_checkpoint(root):
    """Fabricate a tiny HF-layout SD checkpoint dir + LoRA adapters under
    `root` (shared with test_serving)."""
    (root / "vae").mkdir()
    (root / "unet").mkdir()
    vp = V.init_vae(jax.random.key(0), TINY_VAE)
    up = U.init_unet(jax.random.key(1), TINY_UNET)
    save_file(_to_torch_layout(vp), str(root / "vae" / "diffusion_pytorch_model.safetensors"))
    save_file(_to_torch_layout(up), str(root / "unet" / "diffusion_pytorch_model.safetensors"))
    (root / "vae" / "config.json").write_text(
        json.dumps(
            {"block_out_channels": [8, 16], "norm_num_groups": 4, "latent_channels": 4,
             "scaling_factor": 0.18215}
        )
    )
    (root / "unet" / "config.json").write_text(
        json.dumps(
            {"block_out_channels": [8, 16, 16, 16], "attention_head_dim": [1, 2, 2, 2],
             "cross_attention_dim": 16, "norm_num_groups": 4}
        )
    )
    lora_dir = root / "lora"
    lv = init_lora_tree(jax.random.key(2), vp["encoder"], SD_TARGET_MODULES, 2)
    lu = init_lora_tree(jax.random.key(3), up, SD_TARGET_MODULES, 2)
    save_adapter(lv, str(lora_dir / "vae_encoder_lora_adapter"), rank=2, targets=SD_TARGET_MODULES)
    save_adapter(lu, str(lora_dir / "unet_lora_adapter"), rank=2, targets=SD_TARGET_MODULES)
    return root


@pytest.fixture(scope="module")
def sd_checkpoint(tmp_path_factory):
    return make_fake_sd_checkpoint(tmp_path_factory.mktemp("fake_sd"))


@pytest.fixture(scope="module")
def input_images(tmp_path_factory):
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (24, 16, 3), dtype=np.uint8)).save(d / "small.png")
    np.savez(d / "prompt.npz", prompt_embeds=rng.normal(size=(1, 7, 16)).astype(np.float32))
    np.savez(
        d / "prompt_f.npz",
        prompt_embeds=rng.normal(size=(1, 5, 16)).astype(np.float32),
        pooled_prompt_embeds=rng.normal(size=(1, 8)).astype(np.float32),
    )
    return d


def test_infer_omgsr_s_cli(sd_checkpoint, input_images, tmp_path):
    from omgsr_tpu.cli.infer_omgsr_s import main, parse_args

    # a second same-shaped input so --batch_size 2 exercises same-bucket
    # batching (one device call for both images)
    img2 = np.asarray(Image.open(input_images / "small.png"))[::-1].copy()
    Image.fromarray(img2).save(input_images / "small2.png")

    out_dir = tmp_path / "out"
    args = parse_args(
        [
            "--input_image", str(input_images),
            "--output_dir", str(out_dir),
            "--sd_path", str(sd_checkpoint),
            "--lora_path", str(sd_checkpoint / "lora"),
            "--prompt_npz", str(input_images / "prompt.npz"),
            "--process_size", "64", "--upscale", "4",
            "--align_method", "wavelet", "--weight_dtype", "fp32",
            "--batch_size", "2",
        ]
    )
    main(args)
    out = Image.open(out_dir / "small.png")
    # min-side guard triggered (16 < 64/4=16? no: 16 >= 16) -> x4 then snap/8
    # 16x24 -> 64x96 -> snap (64, 96); final resize-back not triggered
    assert out.size == (64, 96)
    assert np.asarray(out).std() > 0  # non-degenerate image
    out2 = Image.open(out_dir / "small2.png")
    assert out2.size == (64, 96)
    # distinct inputs through one batched call give distinct outputs
    assert np.abs(
        np.asarray(out).astype(int) - np.asarray(out2).astype(int)
    ).mean() > 1


def make_fake_flux_checkpoint(root):
    """Fabricate a tiny HF-layout FLUX checkpoint dir under `root` (shared
    with test_serving)."""
    (root / "vae").mkdir()
    (root / "transformer").mkdir()
    vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
    fp = F.init_flux(jax.random.key(1), TINY_FLUX)
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


def test_infer_omgsr_f_cli(input_images, tmp_path_factory, tmp_path):
    root = make_fake_flux_checkpoint(tmp_path_factory.mktemp("fake_flux"))

    from omgsr_tpu.cli.infer_omgsr_f import main, parse_args

    out_dir = tmp_path / "out_f"
    args = parse_args(
        [
            "--input_image", str(input_images / "small.png"),
            "--output_dir", str(out_dir),
            "--flux_path", str(root),
            "--prompt_npz", str(input_images / "prompt_f.npz"),
            "--process_size", "64", "--upscale", "4",
            "--align_method", "adain", "--weight_dtype", "fp32",
        ]
    )
    main(args)
    out = Image.open(out_dir / "small.png")
    assert out.size == (64, 96)

    # --quantize int8: same CLI path with the weight-compressed DiT (the
    # single-chip 12B serving mode); output should stay close to full precision
    out_dir_q = tmp_path / "out_f_int8"
    args_q = parse_args(
        [
            "--input_image", str(input_images / "small.png"),
            "--output_dir", str(out_dir_q),
            "--flux_path", str(root),
            "--prompt_npz", str(input_images / "prompt_f.npz"),
            "--process_size", "64", "--upscale", "4",
            "--align_method", "adain", "--weight_dtype", "fp32",
            "--quantize", "int8",
        ]
    )
    main(args_q)
    out_q = Image.open(out_dir_q / "small.png")
    assert out_q.size == (64, 96)
    diff = np.abs(
        np.asarray(out_q).astype(np.float32) - np.asarray(out).astype(np.float32)
    ).mean()
    assert diff < 16.0  # uint8 scale: int8 weights stay close to bf16/f32

    # --quantize int8_w8a8: the s8xs8->s32 MXU serving mode end-to-end
    out_dir_w = tmp_path / "out_f_w8a8"
    args_w = parse_args(
        [
            "--input_image", str(input_images / "small.png"),
            "--output_dir", str(out_dir_w),
            "--flux_path", str(root),
            "--prompt_npz", str(input_images / "prompt_f.npz"),
            "--process_size", "64", "--upscale", "4",
            "--align_method", "adain", "--weight_dtype", "fp32",
            "--quantize", "int8_w8a8",
        ]
    )
    main(args_w)
    out_w = Image.open(out_dir_w / "small.png")
    assert out_w.size == (64, 96)
    diff_w = np.abs(
        np.asarray(out_w).astype(np.float32) - np.asarray(out).astype(np.float32)
    ).mean()
    assert diff_w < 20.0  # act quant adds ~sqrt(2)x rounding over weight-only

    # --quantize int4: the group-wise nibble-packed minimum-memory mode
    # end-to-end (documented as lower fidelity than int8 — bound is looser)
    out_dir_4 = tmp_path / "out_f_int4"
    args_4 = parse_args(
        [
            "--input_image", str(input_images / "small.png"),
            "--output_dir", str(out_dir_4),
            "--flux_path", str(root),
            "--prompt_npz", str(input_images / "prompt_f.npz"),
            "--process_size", "64", "--upscale", "4",
            "--align_method", "adain", "--weight_dtype", "fp32",
            "--quantize", "int4", "--quantize_min_params", "1",
        ]
    )
    main(args_4)
    out_4 = Image.open(out_dir_4 / "small.png")
    assert out_4.size == (64, 96)
    diff_4 = np.abs(
        np.asarray(out_4).astype(np.float32) - np.asarray(out).astype(np.float32)
    ).mean()
    assert diff_4 < 48.0  # int4's 7-code grid: documented quality tradeoff
    assert diff_4 > 0.0  # actually quantized, not silently full-precision


def test_infer_omgsr_s_cli_shard_tiles(sd_checkpoint, input_images, tmp_path):
    """--shard tiles: the CLI builds a {data: n_devices} mesh, replicates
    weights, and shards the tile batch; output matches the unsharded run."""
    import jax

    if len(jax.devices()) < 2:
        import pytest

        pytest.skip("needs multiple devices")
    from omgsr_tpu.cli.infer_omgsr_s import main, parse_args

    base = [
        "--input_image", str(input_images / "small.png"),
        "--sd_path", str(sd_checkpoint),
        "--lora_path", str(sd_checkpoint / "lora"),
        "--prompt_npz", str(input_images / "prompt.npz"),
        "--process_size", "64", "--upscale", "4",
        "--align_method", "nofix", "--weight_dtype", "fp32",
    ]
    out_ref = tmp_path / "ref"
    main(parse_args(base + ["--output_dir", str(out_ref)]))
    out_sh = tmp_path / "sh"
    main(parse_args(base + ["--output_dir", str(out_sh), "--shard", "tiles"]))
    a = np.asarray(Image.open(out_ref / "small.png"), np.int32)
    b = np.asarray(Image.open(out_sh / "small.png"), np.int32)
    assert np.abs(a - b).max() <= 1  # identical up to uint8 rounding
