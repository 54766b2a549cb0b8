"""Downstream DINOv3 inference CLI (cli/infer_dinov3.py) driven end-to-end
at tiny override sizes: depth / segmentation / detection / dinotxt outputs
land with the documented formats."""

import json
import os

import numpy as np
import pytest

from omgsr_tpu.cli.infer_dinov3 import main
from tests.test_dinotxt_cli import _write_tokenizer

TINY_VIT = '{"embed_dim": 32, "depth": 4, "num_heads": 2, "patch_size": 16}'


@pytest.fixture()
def imgs(tmp_path):
    from PIL import Image

    d = tmp_path / "in"
    d.mkdir()
    rng = np.random.default_rng(0)
    for i in range(2):
        Image.fromarray(
            rng.integers(0, 255, (40, 56, 3), dtype=np.uint8), "RGB"
        ).save(d / f"im{i}.png")
    return str(d)


def test_depth_task(imgs, tmp_path):
    out = str(tmp_path / "out")
    main([
        "--task", "depth", "--input_dir", imgs, "--output_dir", out,
        "--image_size", "32", "--backbone_overrides", TINY_VIT,
        "--head_overrides",
        '{"channels": 8, "post_process_channels": [8, 8, 8, 8],'
        ' "n_output_channels": 4, "n_hidden_channels": 4}',
    ])
    d = np.load(os.path.join(out, "im0_depth.npy"))
    assert d.shape == (32, 32) and np.isfinite(d).all()
    assert os.path.exists(os.path.join(out, "im1_depth.png"))


def test_segmentation_task(imgs, tmp_path):
    from PIL import Image

    out = str(tmp_path / "out")
    main([
        "--task", "segmentation", "--input_dir", imgs, "--output_dir", out,
        "--image_size", "64", "--num_classes", "7",
        "--backbone_overrides", TINY_VIT,
        "--adapter_overrides", '{"interaction_indexes": [0, 1, 2, 3]}',
        "--head_overrides",
        '{"num_queries": 5, "nheads": 4, "dim_feedforward": 64,'
        ' "enc_layers": 1, "dec_layers": 1, "hidden_dim": 32}',
    ])
    seg = np.asarray(Image.open(os.path.join(out, "im0_seg.png")))
    assert seg.shape == (64, 64)
    assert seg.max() < 7


def test_segmentation_slide_mode(imgs, tmp_path):
    from PIL import Image

    out = str(tmp_path / "out")
    main([
        "--task", "segmentation", "--input_dir", imgs, "--output_dir", out,
        "--image_size", "64", "--num_classes", "7",
        "--slide", "--slide_crop", "32", "--slide_stride", "16",
        "--backbone_overrides", TINY_VIT,
        "--adapter_overrides", '{"interaction_indexes": [0, 1, 2, 3]}',
        "--head_overrides",
        '{"num_queries": 5, "nheads": 4, "dim_feedforward": 64,'
        ' "enc_layers": 1, "dec_layers": 1, "hidden_dim": 32}',
    ])
    seg = np.asarray(Image.open(os.path.join(out, "im0_seg.png")))
    assert seg.shape == (64, 64) and seg.max() < 7


def test_detection_task(imgs, tmp_path):
    out = str(tmp_path / "out")
    main([
        "--task", "detection", "--input_dir", imgs, "--output_dir", out,
        # 40 is NOT divisible into the 2x16 window grid: the CLI must snap
        # the resize up to 64 instead of tripping the windowed-path assert
        "--image_size", "40", "--score_threshold", "0.0",
        "--backbone_overrides", TINY_VIT,
        "--head_overrides",
        '{"num_classes": 7, "num_queries_one2one": 6, "num_queries_one2many": 10,'
        ' "hidden_dim": 32, "nheads": 4, "dec_layers": 2, "dim_feedforward": 64,'
        ' "decoder_rpe_hidden_dim": 16, "num_encoder_layers": 2, "topk": 5}',
    ])
    det = json.load(open(os.path.join(out, "im0_det.json")))
    assert len(det["scores"]) == 5  # threshold 0 keeps all topk
    b = np.asarray(det["boxes"])
    # boxes are mapped back to the 56 x 40 original frame
    assert b.shape == (5, 4) and np.isfinite(b).all()


def test_dinotxt_task(imgs, tmp_path):
    tok_dir, vocab = _write_tokenizer(tmp_path)
    out = str(tmp_path / "out")
    main([
        "--task", "dinotxt", "--input_dir", imgs, "--output_dir", out,
        "--image_size", "32", "--backbone_overrides", TINY_VIT,
        "--tokenizer_dir", tok_dir,
        "--model_overrides", '{"embed_dim": 64}',
        "--text_overrides",
        '{"context_length": 16, "vocab_size": %d, "dim": 32,'
        ' "num_heads": 2, "num_layers": 1, "ffn_ratio": 2.0}' % vocab,
        "--prompts", "a red square", "the blue cat",
    ])
    res = json.load(open(os.path.join(out, "dinotxt_zeroshot.json")))
    assert set(res) == {"im0", "im1"}
    for v in res.values():
        assert v["best"] in ("a red square", "the blue cat")
        assert abs(sum(v["probs"].values()) - 1.0) < 1e-5
