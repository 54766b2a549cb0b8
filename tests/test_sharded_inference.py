"""FSDP-sharded FLUX inference == replicated inference (8-dev CPU mesh)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omgsr_tpu.inference.pipeline_f import OMGSRFPipeline
from omgsr_tpu.models import flux as F
from omgsr_tpu.models import vae as V
from tests.test_models import TINY_FLUX, TINY_FLUX_VAE


def test_fsdp_sharded_pipeline_matches_replicated():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from omgsr_tpu.parallel import create_mesh

    vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
    fp = F.init_flux(jax.random.key(1), TINY_FLUX)
    lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 32, 32, 3)))
    ctx = jax.random.normal(jax.random.key(3), (1, 5, 16))
    pooled = jax.random.normal(jax.random.key(4), (1, 8))

    pipe_ref = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    ref = np.asarray(pipe_ref(lq, ctx, pooled, tile_size=16, tile_overlap=8))

    mesh = create_mesh({"data": 2, "fsdp": 4})
    pipe_sh = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    pipe_sh.shard_for_mesh(mesh, min_size=64)  # tiny threshold: force sharding
    out = np.asarray(pipe_sh(lq, ctx, pooled, tile_size=16, tile_overlap=8))

    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)
    # sanity: at least one param actually got sharded over fsdp
    shardings = jax.tree.leaves(
        jax.tree.map(lambda x: x.sharding.spec if hasattr(x.sharding, "spec") else None,
                     pipe_sh.flux_params)
    )
    assert any(s is not None and "fsdp" in str(s) for s in shardings)


def test_tp_sharded_pipeline_matches_replicated():
    """Megatron TP over attention heads + ffn hidden (shard_params_flux_tp):
    sharded == replicated, and qkv/ff kernels actually carry the "tp" axis."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from omgsr_tpu.parallel import create_mesh

    vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
    fp = F.init_flux(jax.random.key(1), TINY_FLUX)
    lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 32, 32, 3)))
    ctx = jax.random.normal(jax.random.key(3), (1, 5, 16))
    pooled = jax.random.normal(jax.random.key(4), (1, 8))

    pipe_ref = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    ref = np.asarray(pipe_ref(lq, ctx, pooled, tile_size=16, tile_overlap=8))

    # tp=2 splits the 4 heads 2-per-shard and the ffn hidden 64-per-shard
    mesh = create_mesh({"data": 2, "tp": 2, "fsdp": 2})
    pipe_tp = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    pipe_tp.shard_for_mesh(mesh, min_size=64, strategy="tp")
    out = np.asarray(pipe_tp(lq, ctx, pooled, tile_size=16, tile_overlap=8))

    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)

    import jax.tree_util as jtu

    leaves = jtu.tree_leaves_with_path(pipe_tp.flux_params)
    specs = {jtu.keystr(p): str(getattr(x.sharding, "spec", "")) for p, x in leaves}
    qkv = [s for k, s in specs.items() if "to_q" in k and "kernel" in k]
    outp = [s for k, s in specs.items() if "to_out" in k and "kernel" in k]
    assert qkv and all("tp" in s for s in qkv), qkv
    assert outp and all("tp" in s for s in outp), outp


def test_tp_sharded_int8_pipeline_matches_replicated():
    """TP composes with weight-only int8 (the multi-chip quantized serving
    path): column shards carry "tp" on kernel_q AND kernel_scale, row shards
    replicate the scale (it has no "in" dim), outputs match replicated."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from omgsr_tpu.parallel import create_mesh
    from omgsr_tpu.utils.quantize import quantize_tree_int8

    vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
    fp = quantize_tree_int8(F.init_flux(jax.random.key(1), TINY_FLUX), min_params=1 << 6)
    lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 32, 32, 3)))
    ctx = jax.random.normal(jax.random.key(3), (1, 5, 16))
    pooled = jax.random.normal(jax.random.key(4), (1, 8))

    pipe_ref = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    ref = np.asarray(pipe_ref(lq, ctx, pooled, tile_size=16, tile_overlap=8))

    mesh = create_mesh({"data": 2, "tp": 2, "fsdp": 2})
    pipe_tp = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    pipe_tp.shard_for_mesh(mesh, min_size=64, strategy="tp")
    out = np.asarray(pipe_tp(lq, ctx, pooled, tile_size=16, tile_overlap=8))

    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)

    import jax.tree_util as jtu

    leaves = jtu.tree_leaves_with_path(pipe_tp.flux_params)
    specs = {jtu.keystr(p): str(getattr(x.sharding, "spec", "")) for p, x in leaves}
    q_col = [s for k, s in specs.items() if "to_q" in k and "kernel_q" in k]
    scale_row = [s for k, s in specs.items() if "to_out" in k and "kernel_scale" in k]
    assert q_col and all("tp" in s for s in q_col), q_col
    assert scale_row and all("tp" not in s for s in scale_row), scale_row


def test_tp_specs_unrolled_layout_ff_classification():
    """Unrolled (non-scanned) blocks carry numeric block indices in the key
    path; ff up/down classification must not collide with them (block '0'
    vs net.'0', block '2' vs net.'2')."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import jax.tree_util as jtu

    from omgsr_tpu.models.configs import FluxConfig
    from omgsr_tpu.parallel import create_mesh, shard_params_flux_tp

    cfg = FluxConfig(
        num_layers=3, num_single_layers=3, attention_head_dim=8,
        num_attention_heads=4, joint_attention_dim=16,
        pooled_projection_dim=8, axes_dims_rope=(2, 4, 2),
    )
    fp = F.init_flux(jax.random.key(0), cfg)  # unrolled: blocks "0".."2"
    mesh = create_mesh({"data": 4, "tp": 2})
    specs = {
        jtu.keystr(p): s.spec
        for p, s in jtu.tree_leaves_with_path(shard_params_flux_tp(fp, mesh, min_size=1))
    }
    for blk in ("0", "1", "2"):
        up = specs[f"['transformer_blocks']['{blk}']['ff']['net']['0']['proj']['kernel']"]
        down = specs[f"['transformer_blocks']['{blk}']['ff']['net']['2']['kernel']"]
        assert up[-1] == "tp" and up[-2] is None, (blk, up)       # column: out dim
        assert down[-2] == "tp" and down[-1] is None, (blk, down)  # row: in dim
        down_bias = specs[f"['transformer_blocks']['{blk}']['ff']['net']['2']['bias']"]
        assert all(a is None for a in down_bias), (blk, down_bias)
        sp = specs[f"['single_transformer_blocks']['{blk}']['proj_out']['kernel']"]
        assert sp[-2] == "tp" and sp[-1] is None, (blk, sp)
        mlp = specs[f"['single_transformer_blocks']['{blk}']['proj_mlp']['kernel']"]
        assert mlp[-1] == "tp", (blk, mlp)


def test_tp_sharded_w8a8_pipeline_matches_replicated():
    """TP composes with w8a8: the per-token activation absmax is a reduce
    over the row-sharded contraction dim (GSPMD makes it global, so every
    shard quantizes with the same scale), act_quant marker leaves stay
    replicated, outputs match the unsharded w8a8 pipeline."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from omgsr_tpu.parallel import create_mesh
    from omgsr_tpu.utils.quantize import quantize_tree_int8

    vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
    fp = quantize_tree_int8(
        F.init_flux(jax.random.key(1), TINY_FLUX), min_params=1 << 6,
        act_quant=True,
    )
    lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 32, 32, 3)))
    ctx = jax.random.normal(jax.random.key(3), (1, 5, 16))
    pooled = jax.random.normal(jax.random.key(4), (1, 8))

    pipe_ref = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    ref = np.asarray(pipe_ref(lq, ctx, pooled, tile_size=16, tile_overlap=8))

    mesh = create_mesh({"data": 2, "tp": 2, "fsdp": 2})
    pipe_tp = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    pipe_tp.shard_for_mesh(mesh, min_size=64, strategy="tp")
    out = np.asarray(pipe_tp(lq, ctx, pooled, tile_size=16, tile_overlap=8))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)

    import jax.tree_util as jtu

    leaves = jtu.tree_leaves_with_path(pipe_tp.flux_params)
    markers = [
        str(getattr(x.sharding, "spec", ""))
        for p, x in leaves
        if "act_quant" in jtu.keystr(p)
    ]
    assert markers and all("tp" not in s for s in markers), markers


def test_tile_parallel_pipeline_matches_replicated():
    """strategy='tiles': replicated weights, tile batch sharded over "data"
    — the embarrassingly-parallel protocol scale-out. Output == single
    -device for both -F and -S."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from omgsr_tpu.parallel import create_mesh

    vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
    fp = F.init_flux(jax.random.key(1), TINY_FLUX)
    lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 32, 32, 3)))
    ctx = jax.random.normal(jax.random.key(3), (1, 5, 16))
    pooled = jax.random.normal(jax.random.key(4), (1, 8))

    pipe_ref = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    ref = np.asarray(pipe_ref(lq, ctx, pooled, tile_size=16, tile_overlap=8))

    mesh = create_mesh({"data": 8})
    pipe_t = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    pipe_t.shard_for_mesh(mesh, strategy="tiles")
    out = np.asarray(pipe_t(lq, ctx, pooled, tile_size=16, tile_overlap=8))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)

    # -S side
    from omgsr_tpu.inference.pipeline_s import OMGSRSPipeline
    from omgsr_tpu.models import unet_sd as U
    from tests.test_models import TINY_UNET, TINY_VAE

    svp = V.init_vae(jax.random.key(5), TINY_VAE)
    sup = U.init_unet(jax.random.key(6), TINY_UNET)
    emb = jax.random.normal(jax.random.key(7), (1, 7, TINY_UNET.cross_attention_dim))
    s_ref = OMGSRSPipeline(svp, sup, TINY_VAE, TINY_UNET)
    want = np.asarray(s_ref(lq, emb, tile_size=16, tile_overlap=8))
    s_t = OMGSRSPipeline(svp, sup, TINY_VAE, TINY_UNET)
    s_t.shard_for_mesh(mesh)
    got = np.asarray(s_t(lq, emb, tile_size=16, tile_overlap=8))
    np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_tile_parallel_w8a8_pipeline_matches_replicated():
    """The recommended multi-chip config — int8 w8a8 weights (fit per chip)
    + tile parallelism — equals its unsharded self."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from omgsr_tpu.parallel import create_mesh
    from omgsr_tpu.utils.quantize import quantize_tree_int8

    vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
    fp = quantize_tree_int8(
        F.init_flux(jax.random.key(1), TINY_FLUX), min_params=1 << 6,
        act_quant=True,
    )
    lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 32, 32, 3)))
    ctx = jax.random.normal(jax.random.key(3), (1, 5, 16))
    pooled = jax.random.normal(jax.random.key(4), (1, 8))

    pipe_ref = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    ref = np.asarray(pipe_ref(lq, ctx, pooled, tile_size=16, tile_overlap=8))

    pipe_t = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    pipe_t.shard_for_mesh(create_mesh({"data": 8}), strategy="tiles")
    out = np.asarray(pipe_t(lq, ctx, pooled, tile_size=16, tile_overlap=8))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)


def test_shard_for_mesh_after_first_call_invalidates_trace():
    """A pipeline that already ran unsharded must re-trace after
    shard_for_mesh (the tile-sharding constraint is read at trace time)."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from omgsr_tpu.parallel import create_mesh

    vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
    fp = F.init_flux(jax.random.key(1), TINY_FLUX)
    lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 32, 32, 3)))
    ctx = jax.random.normal(jax.random.key(3), (1, 5, 16))
    pooled = jax.random.normal(jax.random.key(4), (1, 8))

    pipe = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    ref = np.asarray(pipe(lq, ctx, pooled, tile_size=16, tile_overlap=8))
    pipe.shard_for_mesh(create_mesh({"data": 8}), strategy="tiles")
    out = np.asarray(pipe(lq, ctx, pooled, tile_size=16, tile_overlap=8))
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)
    # the sharded trace actually carries the constraint
    assert pipe._tile_sharding is not None


def test_reshard_tiles_then_fsdp_clears_tile_sharding():
    """shard_for_mesh(strategy='fsdp') after 'tiles' must drop the stale
    tile sharding (possibly on another mesh) and retrace — previously the
    fsdp branch kept the old P('data') constraint."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from omgsr_tpu.parallel import create_mesh

    vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
    fp = F.init_flux(jax.random.key(1), TINY_FLUX)
    lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 32, 32, 3)))
    ctx = jax.random.normal(jax.random.key(3), (1, 5, 16))
    pooled = jax.random.normal(jax.random.key(4), (1, 8))

    pipe_ref = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    ref = np.asarray(pipe_ref(lq, ctx, pooled, tile_size=8, tile_overlap=4))

    pipe = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
    pipe.shard_for_mesh(create_mesh({"data": 8}), strategy="tiles")
    mid = np.asarray(pipe(lq, ctx, pooled, tile_size=8, tile_overlap=4))
    pipe.shard_for_mesh(create_mesh({"data": 2, "fsdp": 4}), min_size=64, strategy="fsdp")
    assert pipe._tile_sharding is None
    out = np.asarray(pipe(lq, ctx, pooled, tile_size=8, tile_overlap=4))
    np.testing.assert_allclose(mid, ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=1e-3)
