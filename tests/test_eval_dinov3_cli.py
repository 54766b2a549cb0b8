"""eval_dinov3 CLI: ImageFolder probes end-to-end on a tiny backbone."""

import json
import os

import numpy as np

from omgsr_tpu.cli.eval_dinov3 import main


def _write_folders(tmp_path):
    from PIL import Image

    rng = np.random.default_rng(0)
    for split, n in (("train", 8), ("val", 4)):
        for ci, color in enumerate([(220, 40, 40), (40, 220, 40), (40, 40, 220)]):
            d = tmp_path / split / f"class{ci}"
            d.mkdir(parents=True)
            for i in range(n):
                arr = np.full((40, 44, 3), color, np.int16)
                arr = np.clip(
                    arr + rng.integers(-40, 40, arr.shape), 0, 255
                ).astype(np.uint8)
                Image.fromarray(arr, "RGB").save(d / f"{i}.png")


def test_eval_dinov3_cli_knn_and_linear(tmp_path):
    _write_folders(tmp_path)
    out = str(tmp_path / "results.json")
    res = main([
        "--mode", "knn",
        "--train_dir", str(tmp_path / "train"),
        "--val_dir", str(tmp_path / "val"),
        "--arch", "custom",
        "--vit_overrides", '{"embed_dim": 32, "depth": 2, "num_heads": 2, "patch_size": 8}',
        "--resize_size", "36", "--crop_size", "32",
        "--knn_ks", "3", "5",
        "--output", out,
    ])
    # strongly color-separated classes: even a random tiny backbone's
    # features classify perfectly under k-NN
    assert res["knn_top1_k3"] == 1.0
    assert json.load(open(out))["num_classes"] == 3

    res2 = main([
        "--mode", "linear",
        "--train_dir", str(tmp_path / "train"),
        "--val_dir", str(tmp_path / "val"),
        "--arch", "custom",
        "--vit_overrides", '{"embed_dim": 32, "depth": 2, "num_heads": 2, "patch_size": 8}',
        "--resize_size", "36", "--crop_size", "32",
        "--probe_epochs", "200",
    ])
    assert res2["linear_top1"] > 0.9


def test_eval_dinov3_cli_zeroshot(tmp_path):
    """--mode zeroshot: dinotxt zero-shot classification runs end-to-end
    and reports top-1 over the class-prompt logits."""
    from tests.test_dinotxt_cli import _write_tokenizer

    _write_folders(tmp_path)
    tok_dir, vocab = _write_tokenizer(tmp_path)
    out = str(tmp_path / "zs.json")
    res = main([
        "--mode", "zeroshot",
        "--val_dir", str(tmp_path / "val"),
        "--arch", "custom",
        "--vit_overrides", '{"embed_dim": 32, "depth": 2, "num_heads": 2, "patch_size": 8}',
        "--resize_size", "36", "--crop_size", "32",
        "--tokenizer_dir", tok_dir,
        "--dinotxt_model_overrides", '{"embed_dim": 64}',
        "--dinotxt_text_overrides",
        '{"context_length": 16, "vocab_size": %d, "dim": 32,'
        ' "num_heads": 2, "num_layers": 1, "ffn_ratio": 2.0}' % vocab,
        "--output", out,
    ])
    assert res["num_classes"] == 3 and res["n_val"] == 12
    assert 0.0 <= res["zeroshot_top-1"] <= 1.0
    assert json.load(open(out))["zeroshot_top-1"] == res["zeroshot_top-1"]


def test_eval_dinov3_cli_convnext_backbone(tmp_path):
    """ConvNeXt backbones probe through convnext_forward_features."""
    _write_folders(tmp_path)
    res = main([
        "--mode", "knn",
        "--train_dir", str(tmp_path / "train"),
        "--val_dir", str(tmp_path / "val"),
        "--arch", "convnext_custom",
        "--vit_overrides", '{"depths": [1, 1, 1, 1], "dims": [8, 12, 16, 24]}',
        "--resize_size", "40", "--crop_size", "32",
        "--knn_ks", "3",
    ])
    # color-separated classes classify perfectly even on random features
    assert res["knn_top1_k3"] == 1.0
