"""Fire drill (cli.fire_drill): the real-weight-day rehearsal at real
architecture — fabricate sharded HF-layout checkpoints on disk, port, run
the production infer CLI, score with eval_sr, round-trip adapters, and
assert 1e-3 torch parity. These are the slowest tests in the suite by
design: they execute the exact chain real weights will."""

import json
import os

import numpy as np
import pytest


def test_sharded_safetensors_roundtrip(tmp_path):
    """save_sharded_safetensors writes the HF shard+index layout the
    porters' load_safetensors_dir consumes, byte-exact."""
    from omgsr_tpu.cli.fire_drill import save_sharded_safetensors
    from omgsr_tpu.convert.porters import load_safetensors_dir

    rng = np.random.default_rng(0)
    tensors = {
        f"block.{i}.weight": rng.normal(size=(64, 64)).astype(np.float32)
        for i in range(8)
    }
    d = str(tmp_path / "ckpt")
    # 40 KB shards -> 16 KB tensors force multiple shards + an index
    n = save_sharded_safetensors(tensors, d, max_shard_bytes=40 * 1024)
    assert n > 1
    assert any(f.endswith(".index.json") for f in os.listdir(d))
    back = load_safetensors_dir(d)
    assert set(back) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(np.asarray(back[k]), tensors[k])
    # single-shard form (no index) loads through the same path
    d1 = str(tmp_path / "ckpt1")
    save_sharded_safetensors(tensors, d1, max_shard_bytes=1 << 30)
    back1 = load_safetensors_dir(d1)
    assert set(back1) == set(tensors)


def _run_drill(family, root):
    from omgsr_tpu.cli.fire_drill import main

    main(["--family", family, "--root", str(root)])
    with open(os.path.join(str(root), "drill_report.json")) as f:
        report = json.load(f)
    assert report["passed"], report
    assert report["worst_parity_max_rel"] <= 1e-3
    assert report["stages"]["adapter_roundtrip_exact"]
    # eval_sr produced finite scores for the probe image
    summary = report["stages"]["eval_sr"]["summary"]
    assert np.isfinite(summary["psnr_mean"])
    assert 0.0 <= summary["ssim_mean"] <= 1.0
    assert np.isfinite(summary["lpips_mean"])  # perceptual path exercised
    # the scratch tree is cleaned, only the report remains
    assert os.listdir(str(root)) == ["drill_report.json"]
    return report


@pytest.mark.heavy
def test_fire_drill_flux_full_depth(tmp_path):
    """FLUX at the published depth (19 dual + 38 single), reduced width."""
    _run_drill("flux", tmp_path / "flux")


@pytest.mark.heavy
def test_fire_drill_sd_full_architecture(tmp_path):
    """The FULL SD2.1 stack (83.7M VAE + 865.9M UNet, f32, sharded at 2 GB)
    through porter -> infer CLI -> eval_sr -> adapters -> torch parity."""
    report = _run_drill("sd", tmp_path / "sd")
    # full f32 UNet is 3.46 GB: the 2 GB default shards it (index path taken)
    assert report["stages"]["fabricate_s"] > 0
