"""CLIP vision tower parity vs the ACTUAL HuggingFace transformers
implementation (tiny random configs through the production porter), plus
CLIP-IQA metric behavior."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from omgsr_tpu.convert.porters import _convert
from omgsr_tpu.models.clip_vision import (
    CLIPVisionConfig,
    clip_image_features,
    clip_vision_apply,
    clipiqa_score,
    init_clip_vision,
)

TINY = CLIPVisionConfig(
    hidden_size=32, intermediate_size=64, num_hidden_layers=2,
    num_attention_heads=2, image_size=32, patch_size=8, projection_dim=16,
    hidden_act="quick_gelu",
)


def _hf_model():
    from transformers import CLIPVisionConfig as HFCfg
    from transformers import CLIPVisionModelWithProjection

    hf_cfg = HFCfg(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=2, image_size=32, patch_size=8,
        projection_dim=16, hidden_act="quick_gelu",
    )
    torch.manual_seed(0)
    return CLIPVisionModelWithProjection(hf_cfg).eval()


def _port(model):
    tensors = {k: v.numpy() for k, v in model.state_dict().items()}
    return _convert(
        tensors,
        keep_2d=("position_embedding.weight",),
        skip=("vision_model.embeddings.position_ids",),
    )


def test_clip_vision_matches_transformers():
    model = _hf_model()
    params = _port(model)
    rng = np.random.default_rng(0)
    px = rng.normal(0, 1, (2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = model(
            pixel_values=torch.from_numpy(px.transpose(0, 3, 1, 2)),
            output_hidden_states=True,
        )
    hidden, pooled = clip_vision_apply(params, TINY, jnp.asarray(px))
    feats = clip_image_features(params, TINY, jnp.asarray(px))
    np.testing.assert_allclose(
        np.asarray(hidden), out.last_hidden_state.numpy(), atol=2e-5, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(feats), out.image_embeds.numpy(), atol=2e-5, rtol=1e-4
    )
    assert pooled.shape == (2, 32)


def test_clipiqa_score_properties():
    """Scores are probabilities; an image embedding aligned with the positive
    prompt scores ~1, aligned with the negative ~0."""
    params = init_clip_vision(jax.random.key(0), TINY)
    rng = np.random.default_rng(1)
    img = rng.uniform(0, 1, (2, 48, 40, 3)).astype(np.float32)
    from omgsr_tpu.models.clip_vision import clip_preprocess

    feats = clip_image_features(params, TINY, clip_preprocess(jnp.asarray(img), TINY))
    # prompt pair = [aligned with image 0's embedding, its negation]
    prompts = np.stack([np.asarray(feats[0]), -np.asarray(feats[0])])
    s = np.asarray(clipiqa_score(params, TINY, jnp.asarray(img), prompts))
    assert s.shape == (2,)
    assert np.all((s >= 0) & (s <= 1))
    assert s[0] > 0.99  # cosine +1 vs -1 at scale 100


def test_clipiqa_prompt_embeds_match_hf_get_text_features(tmp_path):
    """The --clipiqa_prompts_npz producer: ported text tower + the
    checkpoint's text_projection == HF CLIPModel.get_text_features."""
    import json

    from safetensors.numpy import save_file
    from transformers import CLIPConfig as HFClipConfig
    from transformers import CLIPModel

    from omgsr_tpu.models.clip_vision import clipiqa_prompt_embeds_from_clip_dir

    hf_cfg = HFClipConfig(
        text_config={
            "vocab_size": 64, "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "max_position_embeddings": 16, "hidden_act": "quick_gelu",
            "bos_token_id": 62, "eos_token_id": 63,
        },
        vision_config={
            "hidden_size": 32, "intermediate_size": 64,
            "num_hidden_layers": 2, "num_attention_heads": 2,
            "image_size": 32, "patch_size": 8,
        },
        projection_dim=16,
    )
    torch.manual_seed(2)
    model = CLIPModel(hf_cfg).eval()
    d = tmp_path / "clip"
    d.mkdir()
    save_file({k: v.numpy() for k, v in model.state_dict().items()},
              str(d / "model.safetensors"))
    (d / "config.json").write_text(json.dumps(hf_cfg.to_dict()))

    ids = np.array([[5, 7, 10, 63] + [0] * 12, [3, 63] + [0] * 14], np.int64)
    ours = clipiqa_prompt_embeds_from_clip_dir(str(d), input_ids=ids)
    with torch.no_grad():
        ref = model.get_text_features(input_ids=torch.from_numpy(ids)).numpy()
    np.testing.assert_allclose(ours, ref, atol=2e-5, rtol=1e-4)


def test_porter_validates_and_accepts_missing_projection():
    from safetensors.numpy import save_file

    from omgsr_tpu.convert.porters import port_clip_vision

    model = _hf_model()
    tensors = {k: v.numpy() for k, v in model.state_dict().items()}

    import tempfile

    with tempfile.TemporaryDirectory() as d:
        save_file(tensors, d + "/model.safetensors")
        params = port_clip_vision(d, cfg=TINY)
        assert "visual_projection" in params
        # vision-only checkpoint (no projection head) also ports clean
        vo = {k: v for k, v in tensors.items() if k.startswith("vision_model")}
        with tempfile.TemporaryDirectory() as d2:
            save_file(vo, d2 + "/model.safetensors")
            params2 = port_clip_vision(d2, cfg=TINY)
            assert "visual_projection" not in params2
