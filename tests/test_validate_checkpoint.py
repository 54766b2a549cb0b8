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
