"""Checkpoint/resume tests.

Covers the round-1 verdict's two resume gaps: (a) save -> restore -> continue
must equal uninterrupted training bitwise (full state incl. both optimizer
chains and MultiSteps' mini_step — also from a MID-accumulation save), and
(b) the full run_training loop with resume must count OPTIMIZER steps, not
micro-steps (state["step"] is a micro-step counter; with accumulation=2 the
old code resumed at 2x the true step). The reference's resume is an
unimplemented TODO (train/train_omgsr_s.py:394-419) — this path exceeds it
and therefore needs its own coverage.

All tests share ONE compiled trainer (compile is ~3 min on CPU); each test
resets its state from a host-side snapshot of the freshly-initialized state.
"""

import dataclasses
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.config import TrainConfig
from omgsr_tpu.training.checkpoint import (
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)
from tests.test_trainer import _batch, _build_trainer_s

ACCUM = 2

BASE_CFG = TrainConfig(
    mid_timestep=273,
    gradient_accumulation_steps=ACCUM,
    lr_warmup_steps=0,
    learning_rate=1e-3,
    mixed_precision="no",
    resolution=64,
    train_batch_size=1,
    max_train_steps=2,
    checkpointing_steps=2,
    save_img_steps=1,
)


@functools.lru_cache(maxsize=1)
def _accum_trainer():
    """One compiled accumulation-2 trainer + a host snapshot of its fresh state."""
    tr = _build_trainer_s(dataclasses.replace(BASE_CFG))
    snap = jax.tree.map(lambda x: np.asarray(x).copy(), tr.state)
    return tr, snap


def _reset(tr, snap):
    tr.state = jax.tree.map(jnp.asarray, snap)


def _state_np(tr):
    return jax.tree.map(lambda x: np.asarray(x).copy(), tr.state)


def _assert_states_equal(a, b):
    la, lb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


class TestSaveRestore:
    def test_restore_then_continue_equals_uninterrupted(self, tmp_path):
        """Save at an optimizer-step boundary, continue 2 micro-steps, then
        restore and replay the same 2 micro-steps: states must match bitwise
        (catches any un-persisted optimizer/spectral-norm/step state)."""
        tr, snap = _accum_trainer()
        _reset(tr, snap)
        batch = _batch(b=1)
        keys = [jax.random.key(i) for i in range(4)]

        for k in keys[:2]:  # one full optimizer step (accum=2)
            tr.train_step(batch, k)
        path = save_train_state(str(tmp_path), tr.state, step=1)
        for k in keys[2:]:
            tr.train_step(batch, k)
        uninterrupted = _state_np(tr)

        _reset(tr, snap)  # scramble back to init — restore must recover
        tr.state = restore_train_state(path, tr.state)
        assert int(tr.state["step"]) == ACCUM  # micro-step counter
        for k in keys[2:]:
            tr.train_step(batch, k)
        _assert_states_equal(uninterrupted, _state_np(tr))

    def test_restore_mid_accumulation(self, tmp_path):
        """Save after 1 of 2 micro-steps: MultiSteps' accumulated grads and
        mini_step must persist so the post-restore micro-step applies the
        same update as the uninterrupted run."""
        tr, snap = _accum_trainer()
        _reset(tr, snap)
        batch = _batch(b=1)

        tr.train_step(batch, jax.random.key(0))  # mini_step=1, no update yet
        path = save_train_state(str(tmp_path), tr.state, step=0)
        tr.train_step(batch, jax.random.key(1))  # boundary: update applies
        uninterrupted = _state_np(tr)

        _reset(tr, snap)
        tr.state = restore_train_state(path, tr.state)
        assert int(tr.state["step"]) == 1
        tr.train_step(batch, jax.random.key(1))
        got = _state_np(tr)
        _assert_states_equal(uninterrupted, got)
        # and the boundary actually moved the LoRA params vs init
        deltas = [
            float(np.abs(np.asarray(a) - np.asarray(b)).max())
            for a, b in zip(
                jax.tree.leaves(got["gen"]["lora"]),
                jax.tree.leaves(snap["gen"]["lora"]),
            )
        ]
        assert max(deltas) > 0


class _FakeLoader:
    """Deterministic host-side loader matching PairedLoader's iteration API."""

    def __init__(self, n=16, res=64, b=1):
        rng = np.random.default_rng(0)
        self._items = [
            {
                "lq": np.tanh(rng.normal(size=(b, res, res, 3))).astype(np.float32),
                "hq": np.tanh(rng.normal(size=(b, res, res, 3))).astype(np.float32),
            }
            for _ in range(n)
        ]

    def __len__(self):
        return len(self._items)

    def __iter__(self):
        return iter(self._items)


class TestRunTrainingResume:
    def test_e2e_train_checkpoint_resume_accounting(self, tmp_path):
        """Full CLI loop: train 2 optimizer steps (accum=2), assert the
        on-disk artifacts (cfg snapshot, triptychs, orbax checkpoint,
        reference-layout adapter dirs), then resume 'latest' to 4 steps and
        assert the final micro-step count is 4*ACCUM — the old bug resumed
        global_step at the MICRO count and silently skipped training."""
        from omgsr_tpu.cli.train_omgsr_s import run_training

        tr, snap = _accum_trainer()
        _reset(tr, snap)
        out = str(tmp_path / "run")
        cfg1 = dataclasses.replace(BASE_CFG, output_dir=out)
        loader = _FakeLoader(n=16)

        run_training(cfg1, loader=loader, trainer=tr)

        assert os.path.exists(os.path.join(out, "cfg.yml"))
        assert os.path.exists(os.path.join(out, "img-1.jpg"))
        assert os.path.exists(os.path.join(out, "img-2.jpg"))
        ckpt = latest_checkpoint(out)
        assert ckpt and ckpt.endswith("checkpoint-2")
        for name in ("vae_encoder_lora_adapter", "unet_lora_adapter"):
            d = os.path.join(out, "weight-2", name)
            assert os.path.isdir(d) and os.listdir(d), d
        assert int(tr.state["step"]) == 2 * ACCUM

        # resume to a higher step budget with a freshly-initialized state:
        # restore must bring back step accounting AND parameters
        _reset(tr, snap)
        cfg2 = dataclasses.replace(
            cfg1, max_train_steps=4, resume_from_checkpoint="latest"
        )
        run_training(cfg2, loader=loader, trainer=tr)

        assert int(tr.state["step"]) == 4 * ACCUM
        ckpt = latest_checkpoint(out)
        assert ckpt and ckpt.endswith("checkpoint-4")
        assert os.path.isdir(os.path.join(out, "weight-4", "unet_lora_adapter"))
