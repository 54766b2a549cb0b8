"""Tests for the eval_sr CLI (PSNR/SSIM folder evaluation)."""

import json

import numpy as np
import pytest
from PIL import Image

from omgsr_tpu.cli import eval_sr


def _save(path, arr01):
    Image.fromarray((np.clip(arr01, 0, 1) * 255).round().astype(np.uint8)).save(path)


@pytest.fixture()
def folders(tmp_path):
    gt = tmp_path / "gt"
    sr = tmp_path / "sr"
    gt.mkdir()
    sr.mkdir()
    rng = np.random.default_rng(0)
    imgs = {}
    for name in ("a", "b"):
        img = rng.uniform(0.2, 0.8, (40, 48, 3)).astype(np.float32)
        _save(gt / f"{name}.png", img)
        imgs[name] = np.asarray(Image.open(gt / f"{name}.png"), np.float32) / 255.0
    # a: identical copy; b: uniform +0.1 offset (=> PSNR exactly 20 dB)
    _save(sr / "a.png", imgs["a"])
    _save(sr / "b_out.png", np.clip(imgs["b"] + 0.1, 0, 1))
    return sr, gt, imgs


def test_eval_identical_and_offset(folders, tmp_path):
    sr, gt, imgs = folders
    out = tmp_path / "m.json"
    summary = eval_sr.main(
        ["--sr_dir", str(sr), "--gt_dir", str(gt), "--output", str(out)]
    )
    assert summary["n"] == 2
    data = json.load(open(out))
    by_name = {r["name"]: r for r in data["per_image"]}
    assert by_name["a.png"]["psnr"] > 60  # identical up to uint8 round-trip
    assert by_name["a.png"]["ssim"] == pytest.approx(1.0, abs=1e-4)
    # +0.1 offset clipped at 1.0 — most pixels are exact => PSNR near 20 dB
    assert by_name["b_out.png"]["psnr"] == pytest.approx(20.0, abs=1.0)
    assert data["summary"]["psnr_mean"] == pytest.approx(
        np.mean([r["psnr"] for r in data["per_image"]])
    )


def test_eval_y_channel_and_crop(folders):
    sr, gt, _ = folders
    summary = eval_sr.main(
        ["--sr_dir", str(sr), "--gt_dir", str(gt), "--crop_border", "4", "--y_channel"]
    )
    assert summary["crop_border"] == 4 and summary["y_channel"]
    assert np.isfinite(summary["psnr_mean"])


def test_eval_unmatched_sr_skipped(folders, capsys):
    sr, gt, imgs = folders
    _save(sr / "orphan.png", imgs["a"])
    summary = eval_sr.main(["--sr_dir", str(sr), "--gt_dir", str(gt)])
    assert summary["n"] == 2
    assert "orphan" in capsys.readouterr().out


def test_eval_ambiguous_suffix_not_paired(folders, capsys):
    """Two SR files that strip to the same GT stem must both be skipped, not
    silently scored against the wrong reference."""
    sr, gt, imgs = folders
    _save(sr / "a_1.png", imgs["a"])
    _save(sr / "a_2.png", imgs["a"])
    summary = eval_sr.main(["--sr_dir", str(sr), "--gt_dir", str(gt)])
    # a.png claims gt a exactly; a_1/a_2 are ambiguous fallbacks -> skipped
    assert summary["n"] == 2
    out = capsys.readouterr().out
    assert "a_1" in out and "a_2" in out


def test_eval_niqe_small_image_skipped_not_fatal(folders, tmp_path, capsys):
    """A too-small image must skip NIQE with a warning (row NaN), not abort
    the whole evaluation; the summary omits the mean when nothing scored."""
    sr, gt, _ = folders  # 40x48 fixtures are below the NIQE block minimum
    mdl = tmp_path / "pristine.npz"
    np.savez(mdl, mu=np.zeros(36), cov=np.eye(36))
    out = tmp_path / "m.json"
    summary = eval_sr.main(
        ["--sr_dir", str(sr), "--gt_dir", str(gt),
         "--niqe_params", str(mdl), "--output", str(out)]
    )
    assert summary["n"] == 2 and "niqe_mean" not in summary
    data = json.load(open(out))
    assert all(r["niqe"] is None for r in data["per_image"])  # strict-JSON null
    assert "NIQE skipped" in capsys.readouterr().out


def test_eval_metric_crop_buckets_one_shape(tmp_path, monkeypatch):
    """--metric_crop N center-crops both images to multiples of N before the
    DISTS/LPIPS forwards, so shape-diverse folders compile one bucket, not
    one graph per image shape."""
    gt = tmp_path / "gt"
    sr = tmp_path / "sr"
    gt.mkdir()
    sr.mkdir()
    rng = np.random.default_rng(1)
    for name, (h, w) in {"p": (70, 66), "q": (66, 70)}.items():
        img = rng.uniform(0.2, 0.8, (h, w, 3)).astype(np.float32)
        _save(gt / f"{name}.png", img)
        _save(sr / f"{name}.png", np.clip(img + 0.05, 0, 1))
    seen = []

    def fake_build(path, size):
        def fn(a, b):
            assert a.shape == b.shape
            seen.append(a.shape)
            return 0.25

        return fn

    monkeypatch.setattr(eval_sr, "build_dists_fn", fake_build)
    summary = eval_sr.main(
        ["--sr_dir", str(sr), "--gt_dir", str(gt), "--dists", "--metric_crop", "64"]
    )
    assert summary["dists_mean"] == pytest.approx(0.25)
    assert set(seen) == {(64, 64, 3)}  # both shapes landed in one bucket


def test_eval_lpips_random_weight_path(folders, tmp_path):
    """--lpips without checkpoints: random-weight LPIPS column is finite,
    zero for the identical pair, positive for the offset pair."""
    sr, gt, _ = folders
    out = tmp_path / "m.json"
    summary = eval_sr.main(
        ["--sr_dir", str(sr), "--gt_dir", str(gt), "--lpips", "--output", str(out)]
    )
    assert np.isfinite(summary["lpips_mean"])
    by_name = {r["name"]: r for r in json.load(open(out))["per_image"]}
    assert by_name["a.png"]["lpips"] == pytest.approx(0.0, abs=1e-5)
    assert by_name["b_out.png"]["lpips"] > 1e-5


def test_eval_clipiqa_random_tower_path(folders, monkeypatch):
    """--clipiqa: no-reference scores in [0,1] from one shared compiled
    graph (built-in resize); tiny tower substituted for speed."""
    import functools

    from omgsr_tpu.models.clip_vision import CLIPVisionConfig

    tiny = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=16,
    )
    monkeypatch.setattr(
        eval_sr, "build_clipiqa_fn",
        functools.partial(eval_sr.build_clipiqa_fn, cfg=tiny),
    )
    sr, gt, _ = folders
    summary = eval_sr.main(["--sr_dir", str(sr), "--gt_dir", str(gt), "--clipiqa"])
    assert 0.0 <= summary["clipiqa_mean"] <= 1.0


def test_eval_size_mismatch_raises(tmp_path):
    gt = tmp_path / "gt"
    sr = tmp_path / "sr"
    gt.mkdir()
    sr.mkdir()
    _save(gt / "x.png", np.zeros((32, 32, 3)))
    _save(sr / "x.png", np.zeros((16, 16, 3)))
    with pytest.raises(ValueError, match="size mismatch"):
        eval_sr.main(["--sr_dir", str(sr), "--gt_dir", str(gt)])
