import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.lora import (
    FLUX_TARGET_MODULES,
    SD_TARGET_MODULES,
    attach_lora,
    import_peft_adapter,
    init_lora_tree,
    load_adapter,
    lora_param_count,
    merge_lora,
    path_matches_targets,
    save_adapter,
    split_lora,
)
from omgsr_tpu.models import unet_sd as U
from omgsr_tpu.models import vae as V
from omgsr_tpu.models.layers import conv2d, dense
from omgsr_tpu.utils.tree import flatten_dict
from tests.test_models import TINY_UNET, TINY_VAE


def test_path_matching():
    assert path_matches_targets("down_blocks.0.resnets.0.conv1", SD_TARGET_MODULES)
    assert path_matches_targets("mid_block.attentions.0.to_q", SD_TARGET_MODULES)
    assert path_matches_targets("up_blocks.1.attentions.2.to_out.0", SD_TARGET_MODULES)
    assert not path_matches_targets("conv_norm_out", SD_TARGET_MODULES)
    assert not path_matches_targets("time_embedding.linear_1", SD_TARGET_MODULES)
    # FLUX: "attn.to_q" must match scoped attention projections only
    assert path_matches_targets("transformer_blocks.0.attn.to_q", FLUX_TARGET_MODULES)
    assert path_matches_targets("x_embedder", FLUX_TARGET_MODULES)
    assert not path_matches_targets("norm_out.linear", FLUX_TARGET_MODULES)


def test_zero_init_is_identity():
    p = U.init_unet(jax.random.key(0), TINY_UNET)
    lt = init_lora_tree(jax.random.key(1), p, SD_TARGET_MODULES, rank=4)
    combined = attach_lora(p, lt)
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(3), (1, 7, 16))
    base_out = U.unet_apply(p, TINY_UNET, x, 273, ctx)
    lora_out = U.unet_apply(combined, TINY_UNET, x, 273, ctx)
    # atol covers float-order noise: LoRA-adapted upsamplers take the plain
    # upsample+conv path while base uses the phase-decomposed fused one
    np.testing.assert_allclose(np.asarray(base_out), np.asarray(lora_out), atol=2e-5)


def test_nonzero_lora_changes_output_and_merge_matches():
    p = U.init_unet(jax.random.key(0), TINY_UNET)
    lt = init_lora_tree(jax.random.key(1), p, SD_TARGET_MODULES, rank=4)
    # make B nonzero
    lt = jax.tree.map(lambda a: a + 0.05, lt)
    combined = attach_lora(p, lt)
    x = jax.random.normal(jax.random.key(2), (1, 16, 16, 4))
    ctx = jax.random.normal(jax.random.key(3), (1, 7, 16))
    base_out = np.asarray(U.unet_apply(p, TINY_UNET, x, 273, ctx))
    lora_out = np.asarray(U.unet_apply(combined, TINY_UNET, x, 273, ctx))
    assert np.abs(base_out - lora_out).max() > 1e-4

    merged = merge_lora(p, lt)
    merged_out = np.asarray(U.unet_apply(merged, TINY_UNET, x, 273, ctx))
    np.testing.assert_allclose(merged_out, lora_out, atol=2e-5)


def test_conv_lora_runtime_equals_merged():
    key = jax.random.key(0)
    from omgsr_tpu.models.layers import init_conv

    p = init_conv(key, 3, 3, 8, 16)
    lt = init_lora_tree(jax.random.key(1), {"conv": p}, ("conv",), rank=2)
    lt = jax.tree.map(lambda a: a + 0.1, lt)
    combined = attach_lora({"conv": p}, lt)["conv"]
    x = jax.random.normal(jax.random.key(2), (1, 10, 10, 8))
    runtime = np.asarray(conv2d(combined, x, stride=2, padding=1))
    merged = merge_lora({"conv": p}, lt)["conv"]
    folded = np.asarray(conv2d(merged, x, stride=2, padding=1))
    np.testing.assert_allclose(runtime, folded, atol=1e-4, rtol=1e-4)


def test_split_attach_roundtrip():
    p = V.init_vae(jax.random.key(0), TINY_VAE)["encoder"]
    lt = init_lora_tree(jax.random.key(1), p, SD_TARGET_MODULES, rank=2)
    combined = attach_lora(p, lt)
    base2, lora2 = split_lora(combined)
    assert jax.tree.structure(base2) == jax.tree.structure(p)
    assert jax.tree.structure(lora2) == jax.tree.structure(lt)


def test_adapter_save_load_roundtrip(tmp_path):
    p = V.init_vae(jax.random.key(0), TINY_VAE)["encoder"]
    lt = init_lora_tree(jax.random.key(1), p, SD_TARGET_MODULES, rank=2)
    lt = jax.tree.map(lambda a: a + 0.01, lt)
    save_adapter(lt, str(tmp_path / "ad"), rank=2, targets=SD_TARGET_MODULES)
    lt2, meta = load_adapter(str(tmp_path / "ad"))
    assert meta["r"] == 2
    for (p1, v1), (p2, v2) in zip(
        sorted(flatten_dict(lt).items()), sorted(flatten_dict(lt2).items())
    ):
        assert p1 == p2
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), atol=1e-7)


def test_peft_import(tmp_path):
    """Synthesize a torch-PEFT-layout adapter and import it."""
    import json

    from safetensors.numpy import save_file

    rng = np.random.default_rng(0)
    r, alpha = 2, 4  # alpha != r -> scaling 2.0 folded into B
    tensors = {
        # Linear to_q: in=8, out=8
        "base_model.model.mid_block.attentions.0.to_q.lora_A.weight": rng.normal(
            size=(r, 8)
        ).astype(np.float32),
        "base_model.model.mid_block.attentions.0.to_q.lora_B.weight": rng.normal(
            size=(8, r)
        ).astype(np.float32),
        # Conv conv1: in=4, out=6, k=3
        "base_model.model.down_blocks.0.resnets.0.conv1.lora_A.weight": rng.normal(
            size=(r, 4, 3, 3)
        ).astype(np.float32),
        "base_model.model.down_blocks.0.resnets.0.conv1.lora_B.weight": rng.normal(
            size=(6, r, 1, 1)
        ).astype(np.float32),
    }
    d = tmp_path / "peft"
    d.mkdir()
    save_file(tensors, str(d / "adapter_model.safetensors"))
    (d / "adapter_config.json").write_text(json.dumps({"r": r, "lora_alpha": alpha}))

    tree, meta = import_peft_adapter(str(d))
    flat = flatten_dict(tree)
    a = flat[("mid_block", "attentions", "0", "to_q", "lora_A")]
    b = flat[("mid_block", "attentions", "0", "to_q", "lora_B")]
    assert a.shape == (8, r) and b.shape == (r, 8)
    np.testing.assert_allclose(
        np.asarray(b),
        tensors["base_model.model.mid_block.attentions.0.to_q.lora_B.weight"].T * 2.0,
        rtol=1e-6,
    )
    ca = flat[("down_blocks", "0", "resnets", "0", "conv1", "lora_A")]
    cb = flat[("down_blocks", "0", "resnets", "0", "conv1", "lora_B")]
    assert ca.shape == (3, 3, 4, r) and cb.shape == (1, 1, r, 6)


def test_lora_param_counts_match_reference_scale():
    """SD2.1 UNet rank-32 LoRA should land in the tens-of-millions range the
    reference reports via print_trainable_parameters."""
    p = U.init_unet(jax.random.key(0), TINY_UNET)
    lt = init_lora_tree(jax.random.key(1), p, SD_TARGET_MODULES, rank=4)
    n = lora_param_count(lt)
    assert n > 0
    # every matched module contributes A and B
    flat = flatten_dict(lt)
    assert all(p[-1] in ("lora_A", "lora_B") for p in flat)


def test_stack_unstack_lora_roundtrip():
    """unstack (adapter export) and stack (attach-to-stacked-base) invert
    each other; arbitrary numeric keys (resnets.0, to_out.0) are untouched."""
    import numpy as np

    from omgsr_tpu.lora import (
        FLUX_TARGET_MODULES, init_lora_tree, stack_lora_tree, unstack_lora_tree,
    )
    from omgsr_tpu.models import flux as F
    from omgsr_tpu.utils.quantize import quantize_tree_int8
    from tests.test_models import TINY_FLUX

    fp = quantize_tree_int8(
        F.stack_block_params(F.init_flux(jax.random.key(1), TINY_FLUX)),
        min_params=1 << 6,
    )
    lora = init_lora_tree(jax.random.key(2), fp, FLUX_TARGET_MODULES, 2)
    # attach a non-scan numeric-key subtree to check it is left alone
    lora["x_embedder_extra"] = {"to_out": {"0": {"lora_A": jnp.ones((4, 2)),
                                                 "lora_B": jnp.zeros((2, 4))}}}
    rt = stack_lora_tree(unstack_lora_tree(lora))
    assert "stacked" in rt["transformer_blocks"]
    assert "0" in rt["x_embedder_extra"]["to_out"]  # untouched
    for a, b in zip(jax.tree.leaves(lora), jax.tree.leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
