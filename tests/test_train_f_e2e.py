"""OMGSR-F training CLI end-to-end: fabricated HF-layout FLUX checkpoint
on disk -> build_frozen_f (int4 frozen base) -> LoRA init over the
quantized tree -> 2 micro-steps through the real loop -> orbax state +
reference-layout adapter export. The CLI-path complement to
tests/test_trainer.py's TrainerF unit coverage (reference:
train/train_omgsr_f.py:193 main)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from omgsr_tpu.config import TrainConfig
from omgsr_tpu.models import flux as F
from omgsr_tpu.models import vae as V
from omgsr_tpu.models.configs import FluxConfig, VAEConfig
from tests.test_porters import _to_torch_layout

# big enough that quantize_flux_for_serving's default min_params (1<<16)
# actually quantizes the block denses (256x256 = 65536), small enough for
# a CPU compile: width 256 (4 heads x 64), depth 2+2
E2E_FLUX = FluxConfig(
    num_layers=2, num_single_layers=2, attention_head_dim=64,
    num_attention_heads=4, joint_attention_dim=64, pooled_projection_dim=32,
    axes_dims_rope=(16, 24, 24), in_channels=64,
)
E2E_VAE = VAEConfig(
    block_out_channels=(8, 16), norm_num_groups=4, latent_channels=16,
    scaling_factor=0.3611, shift_factor=0.1159,
    use_quant_conv=False, use_post_quant_conv=False,
)


def _make_flux_checkpoint(root):
    (root / "vae").mkdir(parents=True)
    (root / "transformer").mkdir()
    vp = V.init_vae(jax.random.key(0), E2E_VAE)
    fp = F.init_flux(jax.random.key(1), E2E_FLUX)
    save_file(_to_torch_layout(vp), str(root / "vae" / "diffusion_pytorch_model.safetensors"))
    save_file(_to_torch_layout(fp), str(root / "transformer" / "diffusion_pytorch_model.safetensors"))
    (root / "vae" / "config.json").write_text(json.dumps({
        "block_out_channels": [8, 16], "norm_num_groups": 4,
        "latent_channels": 16, "scaling_factor": 0.3611,
        "shift_factor": 0.1159, "use_quant_conv": False,
        "use_post_quant_conv": False,
    }))
    (root / "transformer" / "config.json").write_text(json.dumps({
        "num_layers": 2, "num_single_layers": 2, "attention_head_dim": 64,
        "num_attention_heads": 4, "joint_attention_dim": 64,
        "pooled_projection_dim": 32, "axes_dims_rope": [16, 24, 24],
        "in_channels": 64,
    }))
    return root


@pytest.mark.heavy
def test_train_f_cli_e2e_int4_base(tmp_path):
    from PIL import Image

    from omgsr_tpu.cli.train_omgsr_f import run_training

    ckpt = _make_flux_checkpoint(tmp_path / "flux")
    data_dir = tmp_path / "hq"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (160, 160, 3), dtype=np.uint8), "RGB"
        ).save(data_dir / f"{i}.png")
    np.savez(
        tmp_path / "prompt.npz",
        prompt_embeds=rng.normal(size=(1, 5, 64)).astype(np.float32),
        pooled_prompt_embeds=rng.normal(size=(1, 32)).astype(np.float32),
    )

    cfg = TrainConfig(
        model="omgsr_f_1024",
        output_dir=str(tmp_path / "run"),
        flux_path=str(ckpt),
        dataset_txt_or_dir_paths=[str(data_dir)],
        fixed_prompt_path=str(tmp_path / "prompt.npz"),
        resolution=128,  # smallest size the 512-px head config's
        # blur-pool pyramid survives (64 collapses to 1x1 spatial)
        mid_timestep=244,
        train_batch_size=1,
        gradient_accumulation_steps=2,
        max_train_steps=1,          # 1 optimizer step = 2 micro-steps
        checkpointing_steps=1,
        save_img_steps=1,
        lr_warmup_steps=0,
        learning_rate=1e-3,
        mixed_precision="fp32",
        gradient_checkpointing=True,
        quantize_base="int4",
        vae_lora_rank=2,
        flux_transformer_lora_rank=2,
        dinov3_convnext_size="tiny",
        seed=0,
    )
    trainer = run_training(cfg)

    # the frozen base really is int4 on the trainer's state
    leaves = jax.tree.leaves(trainer.frozen["flux"])
    assert any(x.dtype == jnp.uint8 for x in leaves), "base not int4-quantized"
    assert not any(
        x.dtype == jnp.float32 and x.ndim == 3 and x.size > 1 << 16 for x in leaves
    )
    # on-disk artifacts: cfg snapshot, triptych, checkpoint, the reference's
    # -F adapter dir names (train/train_omgsr_f.py:150,176)
    out = cfg.output_dir
    assert os.path.exists(os.path.join(out, "cfg.yml"))
    assert os.path.exists(os.path.join(out, "img-1.jpg"))
    ckpt_dir = os.path.join(out, "checkpoints", "checkpoint-1")
    assert os.path.isdir(ckpt_dir)
    # reference-layout adapter export: weight-{step}/<adapter_name>
    for name in ("vae_encoder_adapter", "flux_adapter"):
        d = os.path.join(out, "weight-1", name)
        assert os.path.isdir(d), (name, sorted(os.listdir(out)))
        assert os.path.exists(os.path.join(d, "adapter_model.safetensors"))
    # LoRA moved: lora_B starts zero-init; one optimizer step makes it
    # nonzero (the int4 base is frozen; adapters carry the learning)
    from omgsr_tpu.utils.tree import flatten_dict

    lora = trainer.state["gen"]["lora"]
    b_max = max(
        float(jnp.abs(v).max())
        for p, v in flatten_dict(lora).items()
        if p[-1] == "lora_B"
    )
    assert np.isfinite(b_max) and b_max > 0.0


@pytest.mark.heavy
def test_train_s_cli_e2e_from_checkpoint_dir(tmp_path):
    """The -S counterpart: build_frozen_s loads a fabricated HF-layout SD
    dir through the porters, then the real loop runs one optimizer step
    and exports the reference's -S adapter dir names
    (infer/omgsr_s_infer_model.py:16-21)."""
    from PIL import Image

    from omgsr_tpu.cli.train_omgsr_s import run_training
    from tests.test_e2e_cli import make_fake_sd_checkpoint

    (tmp_path / "sd").mkdir()
    ckpt = make_fake_sd_checkpoint(tmp_path / "sd")
    data_dir = tmp_path / "hq"
    data_dir.mkdir()
    rng = np.random.default_rng(0)
    for i in range(4):
        Image.fromarray(
            rng.integers(0, 255, (160, 160, 3), dtype=np.uint8), "RGB"
        ).save(data_dir / f"{i}.png")
    np.savez(
        tmp_path / "prompt.npz",
        prompt_embeds=rng.normal(size=(1, 7, 16)).astype(np.float32),
    )

    cfg = TrainConfig(
        model="omgsr_s_512",
        output_dir=str(tmp_path / "run"),
        sd_path=str(ckpt),
        dataset_txt_or_dir_paths=[str(data_dir)],
        fixed_prompt_path=str(tmp_path / "prompt.npz"),
        resolution=128,
        mid_timestep=273,
        train_batch_size=1,
        gradient_accumulation_steps=2,
        max_train_steps=1,
        checkpointing_steps=1,
        save_img_steps=1,
        lr_warmup_steps=0,
        learning_rate=1e-3,
        mixed_precision="fp32",
        vae_lora_rank=2,
        unet_lora_rank=2,
        dinov3_convnext_size="tiny",
        seed=0,
    )
    trainer = run_training(cfg)

    out = cfg.output_dir
    assert os.path.exists(os.path.join(out, "cfg.yml"))
    assert os.path.isdir(os.path.join(out, "checkpoints", "checkpoint-1"))
    for name in ("vae_encoder_lora_adapter", "unet_lora_adapter"):
        d = os.path.join(out, "weight-1", name)
        assert os.path.isdir(d), (name, sorted(os.listdir(out)))
    from omgsr_tpu.utils.tree import flatten_dict

    b_max = max(
        float(jnp.abs(v).max())
        for p, v in flatten_dict(trainer.state["gen"]["lora"]).items()
        if p[-1] == "lora_B"
    )
    assert np.isfinite(b_max) and b_max > 0.0
