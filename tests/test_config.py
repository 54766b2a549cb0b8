import os

from omgsr_tpu.config import TrainConfig, load_config, save_config

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "omgsr_tpu", "configs")


def test_load_s_config():
    cfg = load_config(os.path.join(CFG_DIR, "omgsr_s_512.yml"))
    assert cfg.model == "omgsr_s_512"
    assert cfg.mid_timestep == 273
    assert cfg.vae_lora_rank == 16
    assert cfg.unet_lora_rank == 32
    assert cfg.lambda_LRR == 5 and cfg.lambda_GAN == 0.5
    assert cfg.resolution == 512
    assert cfg.mixed_precision == "bf16"
    assert not cfg.is_flux


def test_load_f_config():
    cfg = load_config(os.path.join(CFG_DIR, "omgsr_f_1024.yml"))
    assert cfg.mid_timestep == 244
    assert cfg.flux_transformer_lora_rank == 64
    assert cfg.gradient_checkpointing is True
    assert cfg.is_flux


def test_overrides_and_roundtrip(tmp_path):
    cfg = load_config(
        os.path.join(CFG_DIR, "omgsr_s_512.yml"),
        overrides=["learning_rate=1e-4", "resolution=256", "custom_key=7"],
    )
    assert cfg.learning_rate == 1e-4
    assert cfg.resolution == 256
    assert cfg.extra["custom_key"] == 7

    p = tmp_path / "cfg.yml"
    save_config(cfg, str(p))
    cfg2 = load_config(str(p))
    assert cfg2.resolution == 256
    assert cfg2.extra["custom_key"] == 7


def test_defaults_match_reference_hyperparams():
    cfg = TrainConfig()
    assert cfg.adam_beta1 == 0.9 and cfg.adam_beta2 == 0.999
    assert cfg.adam_weight_decay == 1e-4 and cfg.adam_epsilon == 1e-8
    assert cfg.max_grad_norm == 1.0
    assert cfg.lr_warmup_steps == 500
