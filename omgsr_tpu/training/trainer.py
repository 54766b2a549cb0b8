"""LoRA-GAN trainers for OMGSR-S and OMGSR-F.

One pjit-compiled train step re-implementing the reference's loop body
(train/train_omgsr_s.py:438-491, train/train_omgsr_f.py:528-591):

  G step: hq -> frozen-VAE latent, noised to the mid-timestep; lq -> LoRA-VAE
  latent; LRR latent-MSE; one-step denoiser prediction -> decoded image;
  DISTS + L1 + GAN-G losses; AdamW on the LoRA params with global-norm clip.

  D step: multi-level discriminator BCE on detached prediction (fake) and hq
  (real); AdamW on the head params.

Deliberate divergences from the reference (SURVEY.md "defects to not
replicate"): the G-step's discriminator-head gradients do NOT leak into the
D update (the reference forgets to zero them, train_omgsr_s.py:465-491);
the LoRA-VAE forward participates in gradient sync (the reference bypasses
its DDP wrapper, :450); spectral-norm u vectors update once per D forward
pair rather than on the G forward too (functional state, same fixed point).

Data parallelism: batch sharded over the mesh "data" axis, params
replicated (optionally FSDP-sharded over "fsdp") — XLA inserts the gradient
psum that DDP/NCCL performed in the reference (SURVEY.md §2c).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import optax

from omgsr_tpu.config import TrainConfig
from omgsr_tpu.diffusion.packing import latent_image_ids, pack_latents, unpack_latents
from omgsr_tpu.diffusion.schedules import (
    ddpm_alphas_cumprod,
    flux_sigma_at_mid_timestep,
)
from omgsr_tpu.lora import attach_lora
from omgsr_tpu.losses.discriminator import discriminator_loss
from omgsr_tpu.losses.dists import dists_loss
from omgsr_tpu.models import flux as flux_mod
from omgsr_tpu.models import unet_sd, vae
from omgsr_tpu.training.optim import make_optimizer


def l1_loss(a, b):
    return jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).mean()


def mse_loss(a, b):
    d = a.astype(jnp.float32) - b.astype(jnp.float32)
    return (d * d).mean()


def _vae_cfg_for_grad(cfg, vae_cfg):
    """VAE config for the differentiated path: per-resblock remat under
    gradient checkpointing (the 1024px decode backward otherwise holds
    ~0.5 GB f32 temps per GN/conv — see VAEConfig.remat_blocks)."""
    if not cfg.gradient_checkpointing:
        return vae_cfg
    from dataclasses import replace

    return replace(vae_cfg, remat_blocks=True)


class BaseTrainer:
    """Shared G/D optimization skeleton; subclasses provide encode/predict."""

    def __init__(self, cfg: TrainConfig, frozen, gen_lora, disc_bundle):
        """frozen: dict with model params/cfgs the step closes over.
        gen_lora: {"vae_encoder": tree, "denoiser": tree}.
        disc_bundle: (disc_params, sn_state, strides_meta).
        """
        self.cfg = cfg
        self.frozen = frozen
        disc_params, sn_state, self.disc_meta = disc_bundle
        self.gen_tx = make_optimizer(cfg)
        self.disc_tx = make_optimizer(cfg)
        self.state = {
            "step": jnp.zeros((), jnp.int32),
            "gen": {"lora": gen_lora, "opt": self.gen_tx.init(gen_lora)},
            "disc": {
                "params": disc_params,
                "sn": sn_state,
                "opt": self.disc_tx.init(disc_params),
            },
        }
        self._step_fn = jax.jit(self._train_step, donate_argnums=(0,))

    @property
    def _frozen_arrays(self):
        # frozen model weights enter the jitted step as ARGUMENTS, not
        # captured constants — capturing 2+ GB of frozen params inflates the
        # lowered HLO payload (and breaks remote-compile services); static
        # config objects stay closed over. Computed per call so callers may
        # re-shard self.frozen (e.g. dryrun_multichip's fsdp placement).
        return {
            k: v
            for k, v in self.frozen.items()
            if not k.endswith("_cfg") and k != "dists"
        }

    def _assemble_frozen(self, frozen_arrays):
        """Rebuild the full frozen bundle from the explicit array argument
        plus the static (non-array) pieces: *_cfg objects and the DISTS
        channel list. No instance state is mutated; every array the traced
        step touches flows through `frozen_arrays`."""
        frozen = {k: v for k, v in self.frozen.items() if k.endswith("_cfg")}
        frozen.update(frozen_arrays)
        if "dists" in self.frozen and "backbone" in frozen_arrays:
            frozen["dists"] = {
                "backbone": frozen_arrays["backbone"],
                "channels": self.frozen["dists"]["channels"],
            }
        return frozen

    # ---- model hooks -------------------------------------------------------
    def encode_fixed(self, frozen, img, rng):
        raise NotImplementedError

    def encode_lora(self, frozen, lora_vae_encoder, img, rng):
        raise NotImplementedError

    def noisy_latent(self, hq_latent, noise):
        raise NotImplementedError

    def one_step_pred(self, frozen, lora_denoiser, lq_latent):
        raise NotImplementedError

    # ---- train step --------------------------------------------------------
    def _gen_loss(self, lora, batch, rngs, frozen, disc_params, disc_sn):
        cfg = self.cfg
        lq, hq = batch["lq"], batch["hq"]
        hq_latent = self.encode_fixed(frozen, hq, rngs["hq"])
        noise = jax.random.normal(rngs["noise"], hq_latent.shape, hq_latent.dtype)
        noisy = self.noisy_latent(hq_latent, noise)
        lq_latent = self.encode_lora(frozen, lora["vae_encoder"], lq, rngs["lq"])

        loss_lrr = mse_loss(noisy, lq_latent) * cfg.lambda_LRR
        pred = self.one_step_pred(frozen, lora["denoiser"], lq_latent)
        meta = self.disc_meta

        def disc_g(dp, sn, bb, rng, x):
            return discriminator_loss(dp, sn, meta, bb, rng, x, for_G=True)

        dists_fn = dists_loss
        if cfg.gradient_checkpointing:
            # the ConvNeXt-L feature pyramids at 1024 px (DISTS + GAN-G) are
            # ~GBs of residuals; remat them rather than hold them across the
            # denoiser's backward
            dists_fn = jax.checkpoint(dists_loss)
            disc_g = jax.checkpoint(disc_g)
        loss_dv3d = dists_fn(frozen["dists"], pred, hq) * cfg.lambda_Dv3D
        loss_l1 = l1_loss(pred, hq) * cfg.lambda_L1
        loss_g, _ = disc_g(
            jax.lax.stop_gradient(disc_params),
            disc_sn,
            frozen["backbone"],
            rngs["disc_g"],
            pred,
        )
        loss_g = loss_g * cfg.lambda_GAN
        total = loss_lrr + loss_dv3d + loss_l1 + loss_g
        metrics = {
            "loss_LRR": loss_lrr,
            "loss_Dv3D": loss_dv3d,
            "loss_L1": loss_l1,
            "loss_G": loss_g,
        }
        return total, (metrics, pred)

    def _disc_loss(self, disc_params, sn, fake, real, rngs, frozen):
        cfg = self.cfg
        l_fake, sn = discriminator_loss(
            disc_params, sn, self.disc_meta, frozen["backbone"],
            rngs["disc_fake"], fake, for_real=False,
        )
        l_real, sn = discriminator_loss(
            disc_params, sn, self.disc_meta, frozen["backbone"],
            rngs["disc_real"], real, for_real=True,
        )
        total = l_fake * cfg.lambda_GAN + l_real * cfg.lambda_GAN
        return total, (sn, {"loss_D_fake": l_fake * cfg.lambda_GAN, "loss_D_real": l_real * cfg.lambda_GAN})

    def _train_step(self, state, batch, rng, frozen_arrays):
        frozen = self._assemble_frozen(frozen_arrays)
        names = ["hq", "noise", "lq", "disc_g", "disc_fake", "disc_real"]
        keys = jax.random.split(rng, len(names))
        rngs = dict(zip(names, keys))

        # disc params enter the G loss as explicit (stop-gradient'd) args
        (g_total, (g_metrics, pred)), g_grads = jax.value_and_grad(
            self._gen_loss, has_aux=True
        )(state["gen"]["lora"], batch, rngs, frozen, state["disc"]["params"], state["disc"]["sn"])
        g_updates, g_opt = self.gen_tx.update(
            g_grads, state["gen"]["opt"], state["gen"]["lora"]
        )
        gen_lora = optax.apply_updates(state["gen"]["lora"], g_updates)

        fake = jax.lax.stop_gradient(pred)
        (d_total, (sn, d_metrics)), d_grads = jax.value_and_grad(
            self._disc_loss, has_aux=True
        )(state["disc"]["params"], state["disc"]["sn"], fake, batch["hq"], rngs, frozen)
        d_updates, d_opt = self.disc_tx.update(
            d_grads, state["disc"]["opt"], state["disc"]["params"]
        )
        disc_params = optax.apply_updates(state["disc"]["params"], d_updates)

        new_state = {
            "step": state["step"] + 1,
            "gen": {"lora": gen_lora, "opt": g_opt},
            "disc": {"params": disc_params, "sn": sn, "opt": d_opt},
        }
        metrics = {"loss_total_G": g_total, "loss_total_D": d_total}
        metrics.update(g_metrics)
        metrics.update(d_metrics)
        # pre-clip global grad norms — the soak/observability signal for GAN
        # balance (the reference only eyeballs tqdm loss postfixes,
        # train/train_omgsr_s.py:520-528)
        metrics["grad_norm_G"] = optax.global_norm(g_grads)
        metrics["grad_norm_D"] = optax.global_norm(d_grads)
        return new_state, (metrics, pred)

    def train_step(self, batch, rng):
        """batch: {"lq": (B,H,W,3), "hq": (B,H,W,3)} in [-1,1]."""
        self.state, (metrics, pred) = self._step_fn(
            self.state, batch, rng, self._frozen_arrays
        )
        return metrics, pred


class TrainerS(BaseTrainer):
    """OMGSR-S: SD2.1 UNet, DDPM mid-timestep 273 (train/train_omgsr_s.py)."""

    def __init__(self, cfg, frozen, gen_lora, disc_bundle):
        a = float(ddpm_alphas_cumprod()[cfg.mid_timestep])
        self.sqrt_a = math.sqrt(a)
        self.sqrt_1ma = math.sqrt(1 - a)
        super().__init__(cfg, frozen, gen_lora, disc_bundle)

    def encode_fixed(self, frozen, img, rng):
        return vae.vae_encode(frozen["vae"], frozen["vae_cfg"], img, rng)

    def encode_lora(self, frozen, lora_enc, img, rng):
        params = dict(frozen["vae"])
        params["encoder"] = attach_lora(frozen["vae"]["encoder"], lora_enc)
        encode = vae.vae_encode
        if self.cfg.gradient_checkpointing:
            # lora_vae.enable_gradient_checkpointing parity
            # (train/train_omgsr_s.py:256-258)
            encode = jax.checkpoint(encode, static_argnums=(1,))
        return encode(params, _vae_cfg_for_grad(self.cfg, frozen["vae_cfg"]), img, rng)

    def noisy_latent(self, hq_latent, noise):
        return self.sqrt_a * hq_latent + self.sqrt_1ma * noise

    def one_step_pred(self, frozen, lora_unet, lq_latent):
        unet_params = attach_lora(frozen["unet"], lora_unet)
        apply = unet_sd.unet_apply
        if self.cfg.gradient_checkpointing:
            apply = jax.checkpoint(apply, static_argnums=(1,))
        ctx = frozen["prompt_embeds"].astype(lq_latent.dtype)
        ctx = jnp.broadcast_to(ctx, (lq_latent.shape[0],) + ctx.shape[-2:])
        eps = apply(unet_params, frozen["unet_cfg"], lq_latent, self.cfg.mid_timestep, ctx)
        x0 = (lq_latent - self.sqrt_1ma * eps) / self.sqrt_a
        dec_cfg = _vae_cfg_for_grad(self.cfg, frozen["vae_cfg"])
        img = vae.vae_decode(frozen["vae"], dec_cfg, x0)
        return jnp.clip(img, -1.0, 1.0)


class TrainerF(BaseTrainer):
    """OMGSR-F: FLUX DiT, flow-matching sigma at mid-timestep 244
    (train/train_omgsr_f.py; implements the intended behavior at :247 and
    :540 rather than the shipped NameError / missing-arg bugs)."""

    def __init__(self, cfg, frozen, gen_lora, disc_bundle):
        self.sigma_t = flux_sigma_at_mid_timestep(cfg.mid_timestep)
        super().__init__(cfg, frozen, gen_lora, disc_bundle)

    def encode_fixed(self, frozen, img, rng):
        return vae.vae_encode(frozen["vae"], frozen["vae_cfg"], img, rng)

    def encode_lora(self, frozen, lora_enc, img, rng):
        params = dict(frozen["vae"])
        params["encoder"] = attach_lora(frozen["vae"]["encoder"], lora_enc)
        encode = vae.vae_encode
        if self.cfg.gradient_checkpointing:
            encode = jax.checkpoint(encode, static_argnums=(1,))
        return encode(params, _vae_cfg_for_grad(self.cfg, frozen["vae_cfg"]), img, rng)

    def noisy_latent(self, hq_latent, noise):
        return (1.0 - self.sigma_t) * hq_latent + self.sigma_t * noise

    def one_step_pred(self, frozen, lora_flux, lq_latent):
        flux_params = attach_lora(frozen["flux"], lora_flux)
        b, h, w, c = lq_latent.shape
        packed = pack_latents(lq_latent)
        img_ids = latent_image_ids(h // 2, w // 2)
        ctx = frozen["prompt_embeds"].astype(lq_latent.dtype)
        ctx = jnp.broadcast_to(ctx, (b,) + ctx.shape[-2:])
        pooled = frozen["pooled_prompt_embeds"].astype(lq_latent.dtype)
        pooled = jnp.broadcast_to(pooled, (b,) + pooled.shape[-1:])
        txt_ids = jnp.zeros((ctx.shape[1], 3), jnp.float32)

        apply = flux_mod.flux_apply
        flux_cfg = frozen["flux_cfg"]
        if self.cfg.gradient_checkpointing:
            if "stacked" in flux_params.get("transformer_blocks", {}):
                # scan-stacked layout: remat per block (cfg flag) instead of
                # wrapping the whole apply — the inner scan would otherwise
                # store every block's attention/MLP internals during the
                # recomputed forward, defeating the checkpoint at 12B scale
                from dataclasses import replace

                flux_cfg = replace(flux_cfg, remat_blocks=True)
            else:
                apply = jax.checkpoint(apply, static_argnums=(1,))
        v = apply(
            flux_params, flux_cfg, packed, self.sigma_t, 1.0,
            pooled, ctx, txt_ids, img_ids,
        )
        z0 = packed - self.sigma_t * v
        z0 = unpack_latents(z0, h, w)
        decode = vae.vae_decode
        if self.cfg.gradient_checkpointing:
            # decode activations at 1024 px are ~GBs; remat so they are not
            # held concurrently with the DiT's per-block carries
            decode = jax.checkpoint(decode, static_argnums=(1,))
        # the -F reference decodes without clamping (train/train_omgsr_f.py:525)
        return decode(frozen["vae"], _vae_cfg_for_grad(self.cfg, frozen["vae_cfg"]), z0)
