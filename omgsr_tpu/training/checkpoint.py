"""Checkpoint/resume.

The reference saves PEFT adapters every `checkpointing_steps`
(train/train_omgsr_s.py:507-518) but its resume branch is an unimplemented
TODO (:394-419) and optimizer state is never persisted. Here:

  * full train state (LoRA + both optimizers + spectral-norm state + step)
    is saved with orbax and restorable — real resume;
  * adapters are ALSO exported per-step in the reference's directory layout
    (weight-{step}/{adapter_name}) via lora.save_adapter for inference
    parity.
"""

from __future__ import annotations

import os

import jax
import numpy as np
import orbax.checkpoint as ocp

from omgsr_tpu.lora import save_adapter


def _ckpt_dir(output_dir: str) -> str:
    return os.path.join(os.path.abspath(output_dir), "checkpoints")


def save_train_state(output_dir: str, state, step: int):
    path = os.path.join(_ckpt_dir(output_dir), f"checkpoint-{step}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, state), force=True)
    ckptr.wait_until_finished()
    return path


def _checkpoint_steps(output_dir: str) -> list[int]:
    """Sorted step numbers of the checkpoint-* dirs under output_dir."""
    d = _ckpt_dir(output_dir)
    if not os.path.isdir(d):
        return []
    steps = []
    for name in os.listdir(d):
        if name.startswith("checkpoint-"):
            try:
                steps.append(int(name.split("-")[1]))
            except ValueError:
                pass
    return sorted(steps)


def latest_checkpoint(output_dir: str):
    steps = _checkpoint_steps(output_dir)
    if not steps:
        return None
    return os.path.join(_ckpt_dir(output_dir), f"checkpoint-{steps[-1]}")


def keep_last_n_checkpoints(output_dir: str, n):
    """Prune all but the n highest-step checkpoint-* dirs (the reference
    checkpointer's keep_last_n_checkpoints). n=None keeps everything."""
    if not n:
        return
    import shutil

    for step in _checkpoint_steps(output_dir)[:-n]:
        shutil.rmtree(
            os.path.join(_ckpt_dir(output_dir), f"checkpoint-{step}"),
            ignore_errors=True,
        )


def restore_train_state(path: str, abstract_state):
    """abstract_state: a pytree of arrays (or ShapeDtypeStructs) matching the
    saved structure — typically the freshly-initialized state."""
    ckptr = ocp.StandardCheckpointer()
    target = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype) if hasattr(x, "shape") else x,
        abstract_state,
    )
    return ckptr.restore(path, target)


def export_adapters(output_dir: str, step: int, gen_lora, cfg, adapter_names: dict):
    """Write reference-layout adapter dirs: weight-{step}/<name>.

    adapter_names e.g. {"vae_encoder": "vae_encoder_lora_adapter",
    "denoiser": "unet_lora_adapter"} (-S; infer/omgsr_s_infer_model.py:16-21)
    or {"vae_encoder": "vae_encoder_adapter", "denoiser": "flux_adapter"}
    (-F; train/train_omgsr_f.py:150,176).
    """
    from omgsr_tpu.lora import FLUX_TARGET_MODULES, SD_TARGET_MODULES

    weight_path = os.path.join(output_dir, f"weight-{step}")
    targets = {
        "vae_encoder": SD_TARGET_MODULES,
        "denoiser": FLUX_TARGET_MODULES if cfg.is_flux else SD_TARGET_MODULES,
    }
    ranks = {
        "vae_encoder": cfg.vae_lora_rank,
        "denoiser": cfg.flux_transformer_lora_rank if cfg.is_flux else cfg.unet_lora_rank,
    }
    from omgsr_tpu.lora import unstack_lora_tree

    for part, name in adapter_names.items():
        save_adapter(
            # scan-stacked LoRA (int8-base 12B training) exports per-block
            # indexed paths so adapters interchange with unstacked layouts
            unstack_lora_tree(gen_lora[part]),
            os.path.join(weight_path, name),
            rank=ranks[part],
            targets=targets[part],
        )
    return weight_path
