"""dinotxt training CLI (cli/train_dinotxt.py) — the reference's
eval/text/train_dinotxt.py loop: param groups, data pairing, end-to-end
tiny training with checkpoint pruning and resume."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omgsr_tpu.cli.train_dinotxt import (
    DinoTxtTrainConfig,
    list_caption_pairs,
    load_dinotxt_config,
    make_dinotxt_optimizer,
    run_training,
)

CAPTIONS = ["a red square", "the blue cat", "green grass 7", "tiny dog", "a house", "sea at night"]


def _write_tokenizer(tmp_path):
    """Minimal valid HF CLIPTokenizer files (lowercase ascii + digits)."""
    d = tmp_path / "tok"
    d.mkdir(exist_ok=True)
    chars = [chr(c) for c in range(ord("a"), ord("z") + 1)] + [str(i) for i in range(10)]
    vocab, i = {}, 0
    for ch in chars:
        vocab[ch] = i
        vocab[ch + "</w>"] = i + 1
        i += 2
    vocab["<|startoftext|>"] = i
    vocab["<|endoftext|>"] = i + 1
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    return str(d), len(vocab)


def _write_pairs(tmp_path, n=6):
    from PIL import Image

    d = tmp_path / "imgs"
    d.mkdir(exist_ok=True)
    rng = np.random.default_rng(0)
    for i in range(n):
        Image.fromarray(
            rng.integers(0, 255, (48, 64, 3), dtype=np.uint8), "RGB"
        ).save(d / f"{i}.png")
        (d / f"{i}.txt").write_text(CAPTIONS[i % len(CAPTIONS)])
    return str(d)


def _tiny_cfg(tmp_path, vocab_size, **kw):
    base = dict(
        output_dir=str(tmp_path / "out"),
        dataset_paths=str(tmp_path / "imgs"),
        tokenizer_dir=str(tmp_path / "tok"),
        batch_size_per_device=1,
        max_iteration=3,
        warmup_length=1,
        checkpointing_period=2,
        max_checkpoints_to_keep=1,
        eval_freq=3,
        print_freq=1,
        lr=1e-3,
        crop_size=16,
        arch="custom",
        embed_dim=32,
        vision_model_num_head_blocks=1,
        extra={
            "vit": {"embed_dim": 32, "depth": 2, "num_heads": 2, "patch_size": 8},
            "text": {
                "context_length": 16, "vocab_size": vocab_size, "dim": 32,
                "num_heads": 2, "num_layers": 1, "ffn_ratio": 2.0,
            },
        },
    )
    base.update(kw)
    return DinoTxtTrainConfig(**base)


def test_list_caption_pairs_sidecars_and_tsv(tmp_path):
    d = _write_pairs(tmp_path)
    pairs = list_caption_pairs(d)
    assert len(pairs) == 6
    assert pairs[0][1] == CAPTIONS[0]
    # one image without sidecar is skipped with a warning
    from PIL import Image

    Image.fromarray(np.zeros((8, 8, 3), np.uint8), "RGB").save(tmp_path / "imgs" / "nocap.png")
    assert len(list_caption_pairs(d)) == 6
    # tsv manifest with relative paths
    tsv = tmp_path / "pairs.tsv"
    tsv.write_text("imgs/0.png\thello world\nimgs/1.png\tsecond caption\n")
    pairs = list_caption_pairs(str(tsv))
    assert len(pairs) == 2
    assert pairs[0][0] == str(tmp_path / "imgs" / "0.png")
    assert pairs[1][1] == "second caption"
    (tmp_path / "empty.tsv").write_text("")
    with pytest.raises(FileNotFoundError):
        list_caption_pairs(str(tmp_path / "empty.tsv"))


def test_load_config_overrides(tmp_path):
    p = tmp_path / "cfg.yml"
    p.write_text("lr: 0.002\nmax_iteration: 7\ntext:\n  dim: 64\n")
    cfg = load_dinotxt_config(str(p), ["max_iteration=9", "use_gram_loss=true"])
    assert cfg.lr == 0.002
    assert cfg.max_iteration == 9
    assert cfg.use_gram_loss is True
    assert cfg.extra["text"]["dim"] == 64


def test_optimizer_param_groups():
    """train_dinotxt.py:60-64: weight decay hits only ndim>=2 non-logit-scale
    leaves; freeze_text_backbone zeroes that subtree's updates."""
    params = {
        "visual_model": {"head": {"linear_projection": {"kernel": jnp.ones((4, 4))}}},
        "text_model": {
            "backbone": {"token_embedding": {"weight": jnp.ones((8, 4))}},
            "head": {"ln_final": {"scale": jnp.ones((4,)), "bias": jnp.zeros((4,))}},
        },
        "logit_scale": jnp.full((1,), 2.0),
    }
    tx = make_dinotxt_optimizer(
        params, lr0=1.0, weight_decay=0.5, b1=0.9, b2=0.99, eps=1e-8
    )
    st = tx.init(params)
    zero_grads = jax.tree.map(jnp.zeros_like, params)
    upd, _ = tx.update(zero_grads, st, params)
    # decayed leaves move under zero grads; non-decayed (1-D, logit_scale) don't
    assert np.all(np.asarray(upd["visual_model"]["head"]["linear_projection"]["kernel"]) != 0)
    assert np.all(np.asarray(upd["text_model"]["backbone"]["token_embedding"]["weight"]) != 0)
    np.testing.assert_array_equal(np.asarray(upd["text_model"]["head"]["ln_final"]["scale"]), 0.0)
    np.testing.assert_array_equal(np.asarray(upd["logit_scale"]), 0.0)

    tx_f = make_dinotxt_optimizer(
        params, lr0=1.0, weight_decay=0.0, b1=0.9, b2=0.99, eps=1e-8,
        freeze_text_backbone=True,
    )
    st_f = tx_f.init(params)
    ones = jax.tree.map(jnp.ones_like, params)
    upd_f, _ = tx_f.update(ones, st_f, params)
    np.testing.assert_array_equal(
        np.asarray(upd_f["text_model"]["backbone"]["token_embedding"]["weight"]), 0.0
    )
    assert np.all(np.asarray(upd_f["visual_model"]["head"]["linear_projection"]["kernel"]) != 0)


def test_train_e2e_checkpoint_prune_resume(tmp_path):
    """3 tiny iterations end-to-end: finite losses, logit-scale clamp
    telemetry, keep-last-1 pruning, model export, then a resume that
    continues to iteration 5."""
    tok_dir, vocab = _write_tokenizer(tmp_path)
    _write_pairs(tmp_path)
    cfg = _tiny_cfg(tmp_path, vocab)
    out = run_training(cfg)

    ckpt_dir = os.path.join(cfg.output_dir, "checkpoints")
    # saved at steps 1 and 2; keep-last-1 pruned checkpoint-1
    assert sorted(os.listdir(ckpt_dir)) == ["checkpoint-2"]
    assert os.path.isdir(os.path.join(cfg.output_dir, "eval", "model-2"))
    # logit scale stayed inside the OpenCLIP clamp
    scale = float(np.asarray(out["params"]["logit_scale"])[0])
    assert 0.0 <= scale <= np.log(100.0) + 1e-6

    # the exported model restores against a fresh init tree
    from omgsr_tpu.cli.train_dinotxt import _load_backbone, _model_cfgs
    from omgsr_tpu.eval.dinotxt import init_dinotxt
    from omgsr_tpu.training.checkpoint import restore_train_state

    _, vit_cfg = _load_backbone(cfg)
    dtx_cfg, text_cfg = _model_cfgs(cfg)
    abstract = init_dinotxt(jax.random.key(0), dtx_cfg, vit_cfg, text_cfg)
    restored = restore_train_state(
        os.path.join(cfg.output_dir, "eval", "model-2"), abstract
    )
    np.testing.assert_allclose(
        np.asarray(restored["logit_scale"]), np.asarray(out["params"]["logit_scale"])
    )

    # resume: continues from step 3 to 5, checkpoints advance
    cfg2 = _tiny_cfg(tmp_path, vocab, max_iteration=5)
    out2 = run_training(cfg2)
    assert sorted(os.listdir(ckpt_dir)) == ["checkpoint-4"]
    assert not np.allclose(
        np.asarray(out2["params"]["logit_scale"]), np.asarray(out["params"]["logit_scale"])
    )


def test_train_gram_loss_path(tmp_path):
    """use_gram_loss=True: the gram regularizer contributes and stays finite."""
    tok_dir, vocab = _write_tokenizer(tmp_path)
    _write_pairs(tmp_path)
    cfg = _tiny_cfg(
        tmp_path, vocab,
        max_iteration=1, checkpointing_period=5, eval_freq=0,
        use_gram_loss=True, patch_sampling_rate_for_gram_loss=0.5,
    )
    out = run_training(cfg)
    assert out is not None
