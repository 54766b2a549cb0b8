"""End-to-end train-step tests on tiny models, incl. data-parallel mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omgsr_tpu.config import TrainConfig
from omgsr_tpu.lora import FLUX_TARGET_MODULES, SD_TARGET_MODULES, init_lora_tree
from omgsr_tpu.losses.discriminator import init_discriminator
from omgsr_tpu.losses.dists import init_dists
from omgsr_tpu.models import convnext as CN
from omgsr_tpu.models import flux as F
from omgsr_tpu.models import unet_sd as U
from omgsr_tpu.models import vae as V
from omgsr_tpu.models.configs import ConvNeXtConfig
from omgsr_tpu.training.trainer import TrainerF, TrainerS
from tests.test_models import TINY_FLUX, TINY_FLUX_VAE, TINY_UNET, TINY_VAE

TINY_CN = ConvNeXtConfig(depths=(1, 1, 1, 1), dims=(8, 16, 24, 32))
# shallow disc heads so 64px images survive the downsampling chain
TINY_HEADS = [([0.5], [1]), ([0.5], [1]), ([0.5], [1])]


def _build_trainer_s(cfg=None, res=64):
    cfg = cfg or TrainConfig(
        mid_timestep=273, gradient_accumulation_steps=1, lr_warmup_steps=0,
        learning_rate=1e-3,
    )
    vp = V.init_vae(jax.random.key(0), TINY_VAE)
    up = U.init_unet(jax.random.key(1), TINY_UNET)
    bp = CN.init_convnext(jax.random.key(2), TINY_CN)
    frozen = {
        "vae": vp,
        "vae_cfg": TINY_VAE,
        "unet": up,
        "unet_cfg": TINY_UNET,
        "backbone": bp,
        "dists": init_dists(bp, TINY_CN.dims),
        "prompt_embeds": jax.random.normal(jax.random.key(3), (1, 7, 16)),
    }
    gen_lora = {
        "vae_encoder": init_lora_tree(jax.random.key(4), vp["encoder"], SD_TARGET_MODULES, 2),
        "denoiser": init_lora_tree(jax.random.key(5), up, SD_TARGET_MODULES, 2),
    }
    disc = init_discriminator(jax.random.key(6), TINY_CN.dims[:3], configs=TINY_HEADS)
    return TrainerS(cfg, frozen, gen_lora, disc)


import functools


@functools.lru_cache(maxsize=1)
def _shared_trainer():
    """One compiled trainer shared by read-mostly tests (compile is ~3 min on
    CPU; state mutation is fine since each test only steps forward)."""
    return _build_trainer_s()


def _batch(res=64, b=2):
    k1, k2 = jax.random.split(jax.random.key(7))
    return {
        "lq": jnp.tanh(jax.random.normal(k1, (b, res, res, 3))),
        "hq": jnp.tanh(jax.random.normal(k2, (b, res, res, 3))),
    }


class TestTrainerS:
    def test_step_runs_and_updates(self):
        tr = _shared_trainer()
        before = [np.asarray(x) for x in jax.tree.leaves(tr.state["gen"]["lora"])]
        metrics, pred = tr.train_step(_batch(), jax.random.key(0))
        for k in ("loss_LRR", "loss_Dv3D", "loss_L1", "loss_G", "loss_D_fake", "loss_D_real"):
            assert np.isfinite(float(metrics[k])), k
        after = [np.asarray(x) for x in jax.tree.leaves(tr.state["gen"]["lora"])]
        deltas = [float(np.abs(a - b).max()) for a, b in zip(after, before)]
        assert max(deltas) > 0  # LoRA actually moved
        assert int(tr.state["step"]) == 1
        assert pred.shape == (2, 64, 64, 3)

    def test_disc_updates_and_sn_state_changes(self):
        tr = _shared_trainer()
        sn_before = [np.asarray(x) for x in jax.tree.leaves(tr.state["disc"]["sn"])]
        d_before = [np.asarray(x) for x in jax.tree.leaves(tr.state["disc"]["params"])]
        tr.train_step(_batch(), jax.random.key(0))
        sn_after = [np.asarray(x) for x in jax.tree.leaves(tr.state["disc"]["sn"])]
        d_after = [np.asarray(x) for x in jax.tree.leaves(tr.state["disc"]["params"])]
        assert max(float(np.abs(np.asarray(a) - b).max()) for a, b in zip(sn_after, sn_before)) > 0
        assert max(float(np.abs(np.asarray(a) - b).max()) for a, b in zip(d_after, d_before)) > 0

    def test_frozen_models_untouched(self):
        tr = _shared_trainer()
        vae_before = jax.tree.map(lambda x: np.asarray(x).copy(), tr.frozen["vae"])
        tr.train_step(_batch(), jax.random.key(0))
        for a, b in zip(jax.tree.leaves(tr.frozen["vae"]), jax.tree.leaves(vae_before)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_losses_decrease_on_repeated_batch(self):
        """A few steps on one batch should reduce the G total (sanity that
        gradients point the right way)."""
        tr = _shared_trainer()
        batch = _batch(b=2)
        losses = []
        for i in range(8):
            m, _ = tr.train_step(batch, jax.random.key(42))  # fixed rng: deterministic objective
            losses.append(float(m["loss_total_G"]))
        assert losses[-1] < losses[0]

    def test_grad_accumulation(self):
        cfg = TrainConfig(
            mid_timestep=273, gradient_accumulation_steps=2, lr_warmup_steps=0,
            learning_rate=1e-3,
        )
        tr = _build_trainer_s(cfg)
        before = [np.asarray(x) for x in jax.tree.leaves(tr.state["gen"]["lora"])]
        tr.train_step(_batch(b=1), jax.random.key(0))
        mid = [np.asarray(x) for x in jax.tree.leaves(tr.state["gen"]["lora"])]
        # first micro-step: no update applied yet (MultiSteps accumulating)
        assert max(float(np.abs(np.asarray(a) - b).max()) for a, b in zip(mid, before)) == 0
        tr.train_step(_batch(b=1), jax.random.key(1))
        after = [np.asarray(x) for x in jax.tree.leaves(tr.state["gen"]["lora"])]
        assert max(float(np.abs(np.asarray(a) - b).max()) for a, b in zip(after, mid)) > 0


class TestTrainerF:
    def test_step_runs(self):
        cfg = TrainConfig(
            model="omgsr_f_1024", mid_timestep=244, gradient_accumulation_steps=1,
            lr_warmup_steps=0, learning_rate=1e-3,
        )
        vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
        fp = F.init_flux(jax.random.key(1), TINY_FLUX)
        bp = CN.init_convnext(jax.random.key(2), TINY_CN)
        frozen = {
            "vae": vp,
            "vae_cfg": TINY_FLUX_VAE,
            "flux": fp,
            "flux_cfg": TINY_FLUX,
            "backbone": bp,
            "dists": init_dists(bp, TINY_CN.dims),
            "prompt_embeds": jax.random.normal(jax.random.key(3), (1, 5, 16)),
            "pooled_prompt_embeds": jax.random.normal(jax.random.key(4), (1, 8)),
        }
        gen_lora = {
            "vae_encoder": init_lora_tree(jax.random.key(5), vp["encoder"], SD_TARGET_MODULES, 2),
            "denoiser": init_lora_tree(jax.random.key(6), fp, FLUX_TARGET_MODULES, 2),
        }
        disc = init_discriminator(jax.random.key(7), TINY_CN.dims[:3], configs=TINY_HEADS)
        tr = TrainerF(cfg, frozen, gen_lora, disc)
        metrics, pred = tr.train_step(_batch(), jax.random.key(0))
        assert np.isfinite(float(metrics["loss_total_G"]))
        assert np.isfinite(float(metrics["loss_total_D"]))
        assert pred.shape == (2, 64, 64, 3)

    def test_step_runs_int8_stacked_base_with_remat(self):
        """The 12B-scale recipe at tiny size: frozen DiT scan-stacked +
        weight-only int8, bf16 LoRA with the same leading block axis, per
        -block remat. Losses finite, LoRA moves, base stays int8."""
        from omgsr_tpu.utils.quantize import quantize_tree_int8

        cfg = TrainConfig(
            model="omgsr_f_1024", mid_timestep=244, gradient_accumulation_steps=1,
            lr_warmup_steps=0, learning_rate=1e-3, gradient_checkpointing=True,
            quantize_base="int8",
        )
        vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
        fp = quantize_tree_int8(
            F.stack_block_params(F.init_flux(jax.random.key(1), TINY_FLUX)),
            min_params=1 << 6,
        )
        assert any(
            x.dtype == jnp.int8 for x in jax.tree.leaves(fp)
        ), "fixture must actually quantize"
        bp = CN.init_convnext(jax.random.key(2), TINY_CN)
        frozen = {
            "vae": vp,
            "vae_cfg": TINY_FLUX_VAE,
            "flux": fp,
            "flux_cfg": TINY_FLUX,
            "backbone": bp,
            "dists": init_dists(bp, TINY_CN.dims),
            "prompt_embeds": jax.random.normal(jax.random.key(3), (1, 5, 16)),
            "pooled_prompt_embeds": jax.random.normal(jax.random.key(4), (1, 8)),
        }
        gen_lora = {
            "vae_encoder": init_lora_tree(jax.random.key(5), vp["encoder"], SD_TARGET_MODULES, 2),
            "denoiser": init_lora_tree(jax.random.key(6), fp, FLUX_TARGET_MODULES, 2),
        }
        # stacked LoRA factors carry the block axis
        dual_lora = gen_lora["denoiser"]["transformer_blocks"]["stacked"]
        assert dual_lora["attn"]["to_q"]["lora_A"].shape[0] == TINY_FLUX.num_layers
        disc = init_discriminator(jax.random.key(7), TINY_CN.dims[:3], configs=TINY_HEADS)
        tr = TrainerF(cfg, frozen, gen_lora, disc)
        before = [np.asarray(x) for x in jax.tree.leaves(tr.state["gen"]["lora"])]
        metrics, pred = tr.train_step(_batch(), jax.random.key(0))
        assert np.isfinite(float(metrics["loss_total_G"]))
        assert np.isfinite(float(metrics["loss_total_D"]))
        after = [np.asarray(x) for x in jax.tree.leaves(tr.state["gen"]["lora"])]
        assert max(float(np.abs(a - b).max()) for a, b in zip(after, before)) > 0
        assert pred.shape == (2, 64, 64, 3)

    def test_step_runs_int4_stacked_base_with_remat(self):
        """The single-chip 12B recipe at tiny size: frozen DiT scan-stacked
        + nibble-packed int4 (the storage mode that fits the full train
        step on one v5e), bf16 LoRA on top. Losses finite, LoRA moves,
        base stays packed uint8."""
        from omgsr_tpu.utils.quantize import quantize_tree_int4

        cfg = TrainConfig(
            model="omgsr_f_1024", mid_timestep=244, gradient_accumulation_steps=1,
            lr_warmup_steps=0, learning_rate=1e-3, gradient_checkpointing=True,
            quantize_base="int4",
        )
        vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
        fp = quantize_tree_int4(
            F.stack_block_params(F.init_flux(jax.random.key(1), TINY_FLUX)),
            min_params=1 << 6,
        )
        assert any(
            x.dtype == jnp.uint8 for x in jax.tree.leaves(fp)
        ), "fixture must actually int4-quantize"
        bp = CN.init_convnext(jax.random.key(2), TINY_CN)
        frozen = {
            "vae": vp,
            "vae_cfg": TINY_FLUX_VAE,
            "flux": fp,
            "flux_cfg": TINY_FLUX,
            "backbone": bp,
            "dists": init_dists(bp, TINY_CN.dims),
            "prompt_embeds": jax.random.normal(jax.random.key(3), (1, 5, 16)),
            "pooled_prompt_embeds": jax.random.normal(jax.random.key(4), (1, 8)),
        }
        gen_lora = {
            "vae_encoder": init_lora_tree(jax.random.key(5), vp["encoder"], SD_TARGET_MODULES, 2),
            "denoiser": init_lora_tree(jax.random.key(6), fp, FLUX_TARGET_MODULES, 2),
        }
        # LoRA A sized by the TRUE in dim (packed dim doubled back)
        dual_lora = gen_lora["denoiser"]["transformer_blocks"]["stacked"]
        assert dual_lora["attn"]["to_q"]["lora_A"].shape[-2] == TINY_FLUX.num_attention_heads * TINY_FLUX.attention_head_dim
        disc = init_discriminator(jax.random.key(7), TINY_CN.dims[:3], configs=TINY_HEADS)
        tr = TrainerF(cfg, frozen, gen_lora, disc)
        before = [np.asarray(x) for x in jax.tree.leaves(tr.state["gen"]["lora"])]
        metrics, pred = tr.train_step(_batch(), jax.random.key(0))
        assert np.isfinite(float(metrics["loss_total_G"]))
        assert np.isfinite(float(metrics["loss_total_D"]))
        after = [np.asarray(x) for x in jax.tree.leaves(tr.state["gen"]["lora"])]
        assert max(float(np.abs(a - b).max()) for a, b in zip(after, before)) > 0
        assert pred.shape == (2, 64, 64, 3)


class TestDataParallel:
    def test_dp_step_matches_single_device(self):
        """8-way data-parallel train step == single-device step on the same
        batch (SURVEY.md §4 multi-device strategy)."""
        from jax.sharding import NamedSharding, PartitionSpec as P

        from omgsr_tpu.parallel import batch_sharding, create_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        batch = _batch(b=8)

        tr1 = _build_trainer_s()
        m1, _ = tr1.train_step(batch, jax.random.key(0))

        tr2 = _build_trainer_s()
        mesh = create_mesh({"data": 8})
        sharded_batch = {
            k: jax.device_put(v, batch_sharding(mesh, v.ndim)) for k, v in batch.items()
        }
        rep = NamedSharding(mesh, P())
        tr2.state = jax.tree.map(lambda x: jax.device_put(x, rep), tr2.state)
        m2, _ = tr2.train_step(sharded_batch, jax.random.key(0))

        for k in m1:
            np.testing.assert_allclose(
                float(m1[k]), float(m2[k]), rtol=2e-4, atol=1e-5, err_msg=k
            )


class TestGradientCheckpointing:
    def test_step_runs_with_remat(self):
        cfg = TrainConfig(
            mid_timestep=273, gradient_accumulation_steps=1, lr_warmup_steps=0,
            learning_rate=1e-3, gradient_checkpointing=True,
        )
        tr = _build_trainer_s(cfg)
        metrics, _ = tr.train_step(_batch(b=1), jax.random.key(0))
        assert np.isfinite(float(metrics["loss_total_G"]))

    def test_remat_same_losses_as_plain(self):
        cfg_a = TrainConfig(
            mid_timestep=273, gradient_accumulation_steps=1, lr_warmup_steps=0,
            learning_rate=1e-3, gradient_checkpointing=False,
        )
        cfg_b = TrainConfig(
            mid_timestep=273, gradient_accumulation_steps=1, lr_warmup_steps=0,
            learning_rate=1e-3, gradient_checkpointing=True,
        )
        ta = _build_trainer_s(cfg_a)
        tb = _build_trainer_s(cfg_b)
        batch = _batch(b=1)
        ma, _ = ta.train_step(batch, jax.random.key(5))
        mb, _ = tb.train_step(batch, jax.random.key(5))
        np.testing.assert_allclose(
            float(ma["loss_total_G"]), float(mb["loss_total_G"]), rtol=1e-4
        )
