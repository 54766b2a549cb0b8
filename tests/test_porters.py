"""Porter round-trip tests: synthesize torch-layout checkpoints from tiny
models' param trees, port them back, and require exact equality."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from safetensors.numpy import save_file

from omgsr_tpu.convert import (
    port_clip_text,
    port_diffusers_unet,
    port_diffusers_vae,
    port_t5_encoder,
)
from omgsr_tpu.models import clip_text as C
from omgsr_tpu.models import t5 as T
from omgsr_tpu.models import unet_sd as U
from omgsr_tpu.models import vae as V
from omgsr_tpu.models.configs import CLIPTextConfig, T5Config
from omgsr_tpu.utils.tree import flatten_dict
from tests.test_models import TINY_UNET, TINY_VAE


def _to_torch_layout(params, keep_2d=()):
    """Inverse of the porter's layout conversion."""
    out = {}
    for path, v in flatten_dict(params).items():
        key = ".".join(path)
        arr = np.asarray(v, np.float32)
        if path[-1] == "kernel":
            key = ".".join(path[:-1]) + ".weight"
            arr = arr.transpose(3, 2, 0, 1) if arr.ndim == 4 else arr.T
        elif path[-1] == "scale":
            key = ".".join(path[:-1]) + ".weight"
        out[key] = np.ascontiguousarray(arr)
    return out


def _roundtrip(tmp_path, params, porter, cfg, keep_2d=()):
    tensors = _to_torch_layout(params, keep_2d)
    f = tmp_path / "diffusion_pytorch_model.safetensors"
    save_file(tensors, str(f))
    ported = porter(str(tmp_path), cfg=cfg)
    got = flatten_dict(ported)
    want = flatten_dict(params)
    assert set(got) == set(want)
    for p in want:
        np.testing.assert_allclose(
            np.asarray(got[p]), np.asarray(want[p], np.float32), atol=0, err_msg=str(p)
        )


def test_vae_roundtrip(tmp_path):
    p = V.init_vae(jax.random.key(0), TINY_VAE)
    _roundtrip(tmp_path, p, port_diffusers_vae, TINY_VAE)


def test_unet_roundtrip(tmp_path):
    p = U.init_unet(jax.random.key(0), TINY_UNET)
    _roundtrip(tmp_path, p, port_diffusers_unet, TINY_UNET)


def test_clip_roundtrip(tmp_path):
    cfg = CLIPTextConfig(
        vocab_size=50, hidden_size=8, intermediate_size=16, num_hidden_layers=2,
        num_attention_heads=2, eos_token_id=49,
    )
    p = C.init_clip_text(jax.random.key(0), cfg)
    tensors = {}
    for path, v in flatten_dict(p).items():
        key = ".".join(path)
        arr = np.asarray(v, np.float32)
        if path[-1] == "kernel":
            key = ".".join(path[:-1]) + ".weight"
            arr = arr.T
        elif path[-1] == "scale":
            key = ".".join(path[:-1]) + ".weight"
        elif path[-1] == "weight" and path[-2] in ("token_embedding", "position_embedding"):
            pass  # embeddings stay untransposed
        tensors[key] = np.ascontiguousarray(arr)
    # distractor keys the porter must skip
    tensors["text_model.embeddings.position_ids"] = np.arange(5, dtype=np.int64)[None]
    save_file(tensors, str(tmp_path / "model.safetensors"))
    ported = port_clip_text(str(tmp_path), cfg=cfg)
    got, want = flatten_dict(ported), flatten_dict(p)
    assert set(got) == set(want)
    for k in want:
        np.testing.assert_allclose(np.asarray(got[k]), np.asarray(want[k]), atol=0)


def test_t5_roundtrip_with_shards(tmp_path):
    cfg = T5Config(vocab_size=50, d_model=8, d_kv=2, d_ff=16, num_layers=2, num_heads=4)
    p = T.init_t5_encoder(jax.random.key(0), cfg)
    tensors = {}
    for path, v in flatten_dict(p).items():
        key = ".".join(path)
        arr = np.asarray(v, np.float32)
        if path[-1] == "kernel":
            key = ".".join(path[:-1]) + ".weight"
            arr = arr.T
        elif path[-1] == "scale":
            key = ".".join(path[:-1]) + ".weight"
        tensors[key] = np.ascontiguousarray(arr)
    # shard into two files + index (HF big-model layout)
    keys = sorted(tensors)
    half = len(keys) // 2
    shard1 = {k: tensors[k] for k in keys[:half]}
    shard2 = {k: tensors[k] for k in keys[half:]}
    save_file(shard1, str(tmp_path / "model-00001-of-00002.safetensors"))
    save_file(shard2, str(tmp_path / "model-00002-of-00002.safetensors"))
    wm = {k: "model-00001-of-00002.safetensors" for k in keys[:half]}
    wm.update({k: "model-00002-of-00002.safetensors" for k in keys[half:]})
    (tmp_path / "model.safetensors.index.json").write_text(json.dumps({"weight_map": wm}))
    ported = port_t5_encoder(str(tmp_path), cfg=cfg)
    got, want = flatten_dict(ported), flatten_dict(p)
    assert set(got) == set(want)


def test_porter_detects_missing_keys(tmp_path):
    p = V.init_vae(jax.random.key(0), TINY_VAE)
    tensors = _to_torch_layout(p)
    removed = sorted(tensors)[0]
    del tensors[removed]
    save_file(tensors, str(tmp_path / "model.safetensors"))
    with pytest.raises(ValueError, match="missing"):
        port_diffusers_vae(str(tmp_path), cfg=TINY_VAE)
