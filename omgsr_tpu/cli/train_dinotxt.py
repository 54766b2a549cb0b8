"""dinotxt training CLI — CLIP-style text alignment over a frozen DINOv3 ViT.

    python -m omgsr_tpu.cli.train_dinotxt --config cfg.yml [key=value ...]

Re-owns dinov3/eval/text/train_dinotxt.py (train:67-241, main:254-339) and
build_dinotxt.py's training setup the TPU way:

- ONE jitted step per iteration (eval/dinotxt.make_dinotxt_train_step):
  frozen-vision-backbone forward, text tower, symmetric InfoNCE (+optional
  gram regularization), grads, AdamW, OpenCLIP logit-scale clamp — donated
  state, scalars only on the host.
- The reference's MemoryEfficientClipLoss NCCL ring becomes `clip_loss` on
  a batch sharded over a {data} mesh axis: XLA shards the global logit
  matrix and inserts the collectives (see eval/dinotxt.py module notes).
- Two AdamW groups (train_dinotxt.py:60-64 exclude/include: ndim<2 /
  norm / bias / logit_scale get weight_decay 0) via an optax mask; LR is
  the reference's linear_warmup_cosine_decay(0 -> lr -> 0) table.
- Image-caption data: a directory of images with same-stem `.txt` caption
  sidecars, or `.tsv` manifests of `path<TAB>caption` lines. Augmentation
  is the reference's classification train transform (RandomResizedCrop
  bicubic + hflip + ImageNet normalize, data/transforms.py:79-93), run in
  a background prefetch thread with a per-iteration-seeded Generator so a
  resumed run replays the identical stream.
- Captions tokenize through any local HF CLIPTokenizer
  (eval/dinotxt.make_hf_tokenizer == the bundled SimpleTokenizer layout).
- Full-state checkpoint/resume via orbax + keep-last-N pruning
  (checkpointer.keep_last_n_checkpoints), and a standalone model export
  every `eval_freq` iterations (the reference's test() dump,
  train_dinotxt.py:41-52).
"""

from __future__ import annotations

import argparse
import dataclasses
import glob
import logging
import math
import os
import queue
import threading
import time
from typing import Any, Optional

import numpy as np

logger = logging.getLogger("omgsr_tpu.train_dinotxt")


@dataclasses.dataclass
class DinoTxtTrainConfig:
    """Flat-key mirror of the reference trainer config (train_dinotxt.py
    main:254-339 reads these off an OmegaConf yaml)."""

    output_dir: str = "output_dinotxt"
    dataset_paths: Any = None  # dir w/ .txt sidecars | .tsv manifest | list
    tokenizer_dir: str = ""  # local HF CLIPTokenizer files (vocab+merges)
    batch_size_per_device: int = 32
    max_iteration: int = 5000
    warmup_length: int = 500
    checkpointing_period: int = 500
    max_checkpoints_to_keep: Optional[int] = 3
    eval_freq: int = 1000  # standalone model export period (ref test())
    print_freq: int = 10
    seed: int = 11
    resume: bool = True
    mixed_precision: str = "bf16"  # compute dtype for images; params f32
    sampler: str = "infinite"  # infinite | sharded_infinite
    # optim (trainer config lr/weight_decay/beta1/beta2/eps)
    lr: float = 1e-3
    weight_decay: float = 0.1
    beta1: float = 0.9
    beta2: float = 0.99
    eps: float = 1e-8
    # data / transform
    crop_size: int = 224
    hflip_prob: float = 0.5
    # frozen vision backbone
    arch: str = "vitl16"
    backbone_weights: str = ""  # hub .pth or orbax backbone dir
    # model (DINOTxtConfig knobs; vit/text field overrides ride extra)
    embed_dim: int = 2048
    vision_model_use_class_token: bool = True
    vision_model_use_patch_tokens: bool = True
    vision_model_num_head_blocks: int = 2
    vision_model_use_linear_projection: bool = True
    vision_model_patch_tokens_pooler_type: str = "mean"
    vision_model_patch_token_layer: int = 1
    text_model_freeze_backbone: bool = False
    text_model_num_head_blocks: int = 0
    text_model_head_blocks_is_causal: bool = False
    text_model_tokens_pooler_type: str = "argmax"
    text_model_use_linear_projection: bool = True
    init_logit_scale: float = math.log(1 / 0.07)
    freeze_logit_scale: bool = False
    # gram regularization (vision_model_use_gram_loss etc.)
    use_gram_loss: bool = False
    patch_sampling_rate_for_gram_loss: float = 0.5
    normalize_patch_tokens_for_gram_loss: bool = False
    gram_loss_weight: float = 1.0
    extra: dict = dataclasses.field(default_factory=dict)


def load_dinotxt_config(path: Optional[str], overrides=None) -> DinoTxtTrainConfig:
    import yaml

    from omgsr_tpu.config import _coerce

    raw = {}
    if path:
        with open(path) as f:
            raw = yaml.safe_load(f) or {}
    for ov in overrides or []:
        key, _, value = ov.partition("=")
        raw[key.strip()] = _coerce(value)
    known = {f.name for f in dataclasses.fields(DinoTxtTrainConfig)}
    cfg = DinoTxtTrainConfig(**{k: v for k, v in raw.items() if k in known})
    cfg.extra = {k: v for k, v in raw.items() if k not in known}
    return cfg


def list_caption_pairs(paths) -> list[tuple[str, str]]:
    """(image path, caption) pairs from dirs with same-stem .txt sidecars,
    .tsv manifests (`path<TAB>caption`, paths relative to the tsv), or a
    "CocoCaptions:split=TRAIN:root=..." dataset spec (data/datasets.py) —
    whose captions are TUPLES: one is drawn per access, the reference's
    random.choice target (coco_captions.py:86-87)."""
    from omgsr_tpu.data.datasets import is_dataset_spec, make_dataset

    if is_dataset_spec(paths):
        return make_dataset(paths).get_pairs()
    if isinstance(paths, str):
        paths = [paths]
    pairs: list[tuple[str, str]] = []
    for p in paths or []:
        if os.path.isdir(p):
            files = []
            for ext in ("png", "jpg", "jpeg", "JPEG", "webp"):
                files += glob.glob(os.path.join(p, f"*.{ext}"))
            skipped = 0
            for f in sorted(files):
                sidecar = os.path.splitext(f)[0] + ".txt"
                if os.path.exists(sidecar):
                    with open(sidecar) as fh:
                        pairs.append((f, fh.read().strip()))
                else:
                    skipped += 1
            if skipped:
                logger.warning("%d images under %s have no .txt caption sidecar", skipped, p)
        elif p.endswith(".tsv"):
            base = os.path.dirname(os.path.abspath(p))
            with open(p) as fh:
                for ln in fh:
                    ln = ln.rstrip("\n")
                    if not ln:
                        continue
                    img, _, cap = ln.partition("\t")
                    if not os.path.isabs(img):
                        img = os.path.join(base, img)
                    pairs.append((img, cap))
        else:
            raise ValueError(f"dataset path {p!r} is neither a directory nor a .tsv manifest")
    if not pairs:
        raise FileNotFoundError(f"no (image, caption) pairs found under {paths!r}")
    return pairs


class CaptionLoader:
    """Sampler -> RandomResizedCrop/hflip/normalize + tokenize, with a
    one-deep background-thread prefetch. Randomness flows through one
    np.random.Generator seeded from (seed, iteration): a resumed run
    replays the same crop stream."""

    def __init__(self, cfg: DinoTxtTrainConfig, tokenize, context_length: int, start_iter: int = 0):
        from PIL import Image

        from omgsr_tpu.data.ssl import InfiniteSampler, ShardedInfiniteSampler

        self.pairs = list_caption_pairs(cfg.dataset_paths)
        self.batch = cfg.batch_size_per_device * _num_devices()
        self.cfg = cfg
        self.tokenize = tokenize
        self.context_length = context_length
        self._Image = Image
        n = len(self.pairs)
        advance = start_iter * self.batch
        sampler_cls = (
            ShardedInfiniteSampler if cfg.sampler == "sharded_infinite" else InfiniteSampler
        )
        self.sampler = iter(
            sampler_cls(sample_count=n, shuffle=True, seed=cfg.seed, advance=advance)
        )
        self._q: queue.Queue = queue.Queue(maxsize=2)
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._worker, args=(start_iter,), daemon=True)
        self._thread.start()

    def _make_batch(self, it: int) -> dict:
        from omgsr_tpu.data.ssl import _normalize, random_resized_crop

        rng = np.random.default_rng((self.cfg.seed, it))
        imgs, captions = [], []
        for _ in range(self.batch):
            path, caption = self.pairs[next(self.sampler)]
            if isinstance(caption, tuple):  # caption list: draw one per access
                caption = str(caption[rng.integers(len(caption))])
            with self._Image.open(path) as im:
                im = random_resized_crop(
                    rng, im.convert("RGB"), self.cfg.crop_size, scale=(0.08, 1.0)
                )
            if self.cfg.hflip_prob and rng.random() < self.cfg.hflip_prob:
                im = im.transpose(self._Image.FLIP_LEFT_RIGHT)
            imgs.append(_normalize(im))
            captions.append(caption)
        return {
            "images": np.stack(imgs),
            "token_ids": np.asarray(self.tokenize(captions), np.int32),
        }

    def _worker(self, start_iter: int):
        it = start_iter
        while not self._stop.is_set():
            try:
                batch = self._make_batch(it)
            except Exception as e:  # surface in the main thread
                self._q.put(e)
                return
            self._q.put(batch)
            it += 1

    def __next__(self) -> dict:
        out = self._q.get()
        if isinstance(out, Exception):
            raise out
        return out

    def close(self):
        self._stop.set()
        while True:  # drain so the worker's put() unblocks
            try:
                self._q.get_nowait()
            except queue.Empty:
                break


def _num_devices() -> int:
    import jax

    return len(jax.devices())


def _tree_paths_mask(params, fn):
    """bool tree from fn(joined_path, leaf)."""
    import jax

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, path + (k,)) for k, v in node.items()}
        return fn(".".join(path), node)

    return walk(params, ())


def make_dinotxt_optimizer(
    params,
    *,
    lr0: float,
    weight_decay: float,
    b1: float,
    b2: float,
    eps: float,
    freeze_text_backbone: bool = False,
):
    """AdamW with the reference's two param groups (train_dinotxt.py:60-64):
    weight decay 0 for ndim<2 / norm / bias / logit_scale leaves. The
    frozen-text-backbone option zeroes that subtree's updates (the torch
    side flips requires_grad, text_tower.py freeze_backbone)."""
    import optax

    def decays(path, leaf):
        return (
            getattr(leaf, "ndim", 0) >= 2
            and "logit_scale" not in path
            and not path.endswith("bias")
        )

    wd_mask = _tree_paths_mask(params, decays)

    def make_tx(learning_rate):
        tx = optax.adamw(
            learning_rate, b1=b1, b2=b2, eps=eps,
            weight_decay=weight_decay, mask=wd_mask,
        )
        if freeze_text_backbone:
            frozen = _tree_paths_mask(
                params, lambda path, _: path.startswith("text_model.backbone")
            )
            tx = optax.chain(tx, optax.masked(optax.set_to_zero(), frozen))
        return tx

    return optax.inject_hyperparams(make_tx)(learning_rate=lr0)


def _load_backbone(cfg: DinoTxtTrainConfig):
    import jax

    from omgsr_tpu.models.configs import VIT_SIZES, DinoV3ViTConfig
    from omgsr_tpu.models.dinov3_vit import init_dinov3_vit

    vit_cfg = VIT_SIZES[cfg.arch] if cfg.arch in VIT_SIZES else DinoV3ViTConfig()
    if cfg.extra.get("vit"):
        vit_cfg = dataclasses.replace(vit_cfg, **cfg.extra["vit"])
    if cfg.backbone_weights.endswith(".pth"):
        from omgsr_tpu.convert import port_dinov3_vit

        return port_dinov3_vit(cfg.backbone_weights, cfg=vit_cfg), vit_cfg
    if cfg.backbone_weights:  # orbax backbone export (cli.pretrain_dinov3)
        from omgsr_tpu.training.checkpoint import restore_train_state

        abstract = init_dinov3_vit(jax.random.key(0), vit_cfg)
        return restore_train_state(cfg.backbone_weights, abstract), vit_cfg
    logger.warning("no backbone_weights given — aligning to a randomly initialized backbone")
    return init_dinov3_vit(jax.random.key(cfg.seed), vit_cfg), vit_cfg


def _model_cfgs(cfg: DinoTxtTrainConfig):
    from omgsr_tpu.eval.dinotxt import DINOTxtConfig, TextTransformerConfig

    dtx = DINOTxtConfig(
        embed_dim=cfg.embed_dim,
        vision_model_freeze_backbone=True,
        vision_model_use_class_token=cfg.vision_model_use_class_token,
        vision_model_use_patch_tokens=cfg.vision_model_use_patch_tokens,
        vision_model_num_head_blocks=cfg.vision_model_num_head_blocks,
        vision_model_use_linear_projection=cfg.vision_model_use_linear_projection,
        vision_model_patch_tokens_pooler_type=cfg.vision_model_patch_tokens_pooler_type,
        vision_model_patch_token_layer=cfg.vision_model_patch_token_layer,
        text_model_freeze_backbone=cfg.text_model_freeze_backbone,
        text_model_num_head_blocks=cfg.text_model_num_head_blocks,
        text_model_head_blocks_is_causal=cfg.text_model_head_blocks_is_causal,
        text_model_tokens_pooler_type=cfg.text_model_tokens_pooler_type,
        text_model_use_linear_projection=cfg.text_model_use_linear_projection,
        init_logit_scale=cfg.init_logit_scale,
        freeze_logit_scale=cfg.freeze_logit_scale,
    )
    text_cfg = TextTransformerConfig(**cfg.extra.get("text", {}))
    return dtx, text_cfg


def export_model(output_dir: str, iteration, params):
    """Standalone trained-weights export — the reference's test() sharded
    model dump (train_dinotxt.py:41-52), restorable against init_dinotxt."""
    import jax
    import orbax.checkpoint as ocp

    path = os.path.join(os.path.abspath(output_dir), "eval", f"model-{iteration}")
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, jax.tree.map(np.asarray, params), force=True)
    ckptr.wait_until_finished()
    return path


def run_training(cfg: DinoTxtTrainConfig):
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from omgsr_tpu.eval.dinotxt import init_dinotxt, make_dinotxt_train_step, make_hf_tokenizer
    from omgsr_tpu.parallel import create_mesh
    from omgsr_tpu.training.checkpoint import (
        keep_last_n_checkpoints,
        latest_checkpoint,
        restore_train_state,
        save_train_state,
    )
    from omgsr_tpu.training.ssl import TabulatedSchedule, linear_warmup_cosine_decay
    from omgsr_tpu.utils.dtypes import resolve_dtype
    from omgsr_tpu.utils.observability import MetricLogger

    os.makedirs(cfg.output_dir, exist_ok=True)
    import yaml

    with open(os.path.join(cfg.output_dir, "cfg.yml"), "w") as f:
        d = dataclasses.asdict(cfg)
        d.update(d.pop("extra", {}))
        yaml.safe_dump(d, f, sort_keys=False)

    backbone, vit_cfg = _load_backbone(cfg)
    dtx_cfg, text_cfg = _model_cfgs(cfg)
    if not cfg.tokenizer_dir:
        raise ValueError("tokenizer_dir is required (local HF CLIPTokenizer files)")
    tokenize = make_hf_tokenizer(cfg.tokenizer_dir, text_cfg.context_length)
    dtype = resolve_dtype(cfg.mixed_precision)

    key = jax.random.key(cfg.seed)
    params = init_dinotxt(key, dtx_cfg, vit_cfg, text_cfg)
    tx = make_dinotxt_optimizer(
        params,
        lr0=cfg.lr,
        weight_decay=cfg.weight_decay,
        b1=cfg.beta1,
        b2=cfg.beta2,
        eps=cfg.eps,
        freeze_text_backbone=cfg.text_model_freeze_backbone,
    )
    opt_state = tx.init(params)
    lr_table = TabulatedSchedule(
        linear_warmup_cosine_decay(
            0.0, cfg.lr, 0.0,
            warmup_iterations=min(cfg.warmup_length, cfg.max_iteration),
            total_iterations=cfg.max_iteration,
        ),
        final_value=0.0,
    )

    start_iter = 0
    state = {"params": params, "opt": opt_state, "step": np.asarray(0, np.int64)}
    if cfg.resume:
        path = latest_checkpoint(cfg.output_dir)
        if path:
            state = restore_train_state(path, state)
            start_iter = int(state["step"]) + 1
            logger.info("resumed from %s at iteration %d", path, start_iter)
    params, opt_state = state["params"], state["opt"]

    n_dev = _num_devices()
    mesh = create_mesh({"data": n_dev}) if n_dev > 1 else None
    step = jax.jit(
        make_dinotxt_train_step(
            tx,
            cfg=dtx_cfg,
            vit_cfg=vit_cfg,
            text_cfg=text_cfg,
            use_gram_loss=cfg.use_gram_loss,
            patch_sampling_rate=cfg.patch_sampling_rate_for_gram_loss,
            normalize_patch_tokens=cfg.normalize_patch_tokens_for_gram_loss,
            gram_loss_weight=cfg.gram_loss_weight,
        ),
        donate_argnums=(0, 1),  # backbone (2) is reused every step
    )
    if mesh is not None:
        batch_shard = NamedSharding(mesh, P("data"))
        repl = NamedSharding(mesh, P())
        params, opt_state, backbone = jax.device_put((params, opt_state, backbone), repl)

    loader = CaptionLoader(cfg, tokenize, text_cfg.context_length, start_iter=start_iter)
    mlog = MetricLogger()
    t0 = time.time()
    it = start_iter - 1  # loop may be empty on resume-at-end
    try:
        for it in range(start_iter, cfg.max_iteration):
            batch_np = next(loader)
            images = jnp.asarray(batch_np["images"], dtype)
            token_ids = jnp.asarray(batch_np["token_ids"])
            if mesh is not None:
                images = jax.device_put(images, batch_shard)
                token_ids = jax.device_put(token_ids, batch_shard)
            params, opt_state, metrics = step(
                params, opt_state, backbone, images, token_ids,
                lr=lr_table[it], key=jax.random.fold_in(jax.random.key(cfg.seed), it),
            )
            save_now = (it + 1) % cfg.checkpointing_period == 0 or it + 1 == cfg.max_iteration
            # abort on non-finite loss before logging AND before any save —
            # a NaN run must never checkpoint (and keep-last-N-prune away
            # the good states); the reference aborts every iteration
            # (train_dinotxt.py:195-198)
            if save_now or (it + 1) % cfg.print_freq == 0 or it + 1 == cfg.max_iteration:
                host = {k: float(v) for k, v in metrics.items()}
                if not math.isfinite(host["total_loss"]):
                    raise FloatingPointError(f"non-finite total_loss at iteration {it}: {host}")
            if (it + 1) % cfg.print_freq == 0 or it + 1 == cfg.max_iteration:
                mlog.update(**host)
                logger.info(
                    "it %d/%d | %s | lr=%.2e | %.3f s/it",
                    it + 1, cfg.max_iteration, mlog, lr_table[it],
                    (time.time() - t0) / max(it + 1 - start_iter, 1),
                )
            if save_now:
                save_train_state(
                    cfg.output_dir,
                    {"params": params, "opt": opt_state, "step": np.asarray(it, np.int64)},
                    it,
                )
                keep_last_n_checkpoints(cfg.output_dir, cfg.max_checkpoints_to_keep)
            if cfg.eval_freq > 0 and ((it + 1) % cfg.eval_freq == 0 or it + 1 == cfg.max_iteration):
                export_model(cfg.output_dir, it, params)
    finally:
        loader.close()
    logger.info("dinotxt training done at iteration %d", it + 1)
    return {"params": params, "opt": opt_state}


def main(argv=None):
    parser = argparse.ArgumentParser("dinotxt training")
    parser.add_argument("--config", type=str, default=None, help="yaml config path")
    parser.add_argument("overrides", nargs="*", help="key=value config overrides")
    args = parser.parse_args(argv)
    logging.basicConfig(
        level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s"
    )
    from omgsr_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_dinotxt_config(args.config, args.overrides)
    run_training(cfg)


if __name__ == "__main__":
    main()
