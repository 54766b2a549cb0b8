"""DINOv3 representation-quality eval CLI — k-NN / linear probe / logistic
regression over ImageFolder splits.

    python -m omgsr_tpu.cli.eval_dinov3 --mode knn \\
        --train_dir /data/train --val_dir /data/val \\
        --arch vitl16 --weights /ckpts/dinov3_vitl16.pth

The user-facing entry for the probe library (eval/probes.py), re-owning the
reference's eval runners (dinov3/eval/knn.py eval_knn:214-330, linear.py
run_eval_linear:501-640, log_regression.py eval_log_regression:...) minus
the SLURM/distributed submission shell:

- backbone: hub .pth via the production porter, an orbax teacher export
  from cli.pretrain_dinov3 (--orbax), or random init (--weights "").
- features extracted once through one jitted forward (params as jit args),
  then every probe runs on-device: temperature-weighted k-NN vote, the
  vmapped full-lr-grid linear probe (one compile trains the entire grid),
  and the L-BFGS logistic regression with C sweep.
- dir-per-class layout; results printed and written as JSON.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging

import numpy as np

logger = logging.getLogger("omgsr_tpu.eval_dinov3")


def load_imagefolder(d: str):
    """(paths, labels, classes) — lazy: extract_features decodes per batch
    (an ImageNet-sized split would not fit host memory decoded up front).
    Also accepts a dataset spec ("ImageNet:split=VAL:root=...:extra=..." /
    "ImageNet22k:root=...:extra=...", data/datasets.py) — the reference's
    preprocessed benchmark layouts, probed without re-foldering."""
    from omgsr_tpu.data.datasets import dataset_type, is_dataset_spec, make_dataset
    from omgsr_tpu.eval.probes import list_imagefolder

    if is_dataset_spec(d):
        if not hasattr(dataset_type(d), "get_paths_labels"):
            raise ValueError(f"dataset {d!r} has no class labels to probe")
        return make_dataset(d).get_paths_labels()
    return list_imagefolder(d)


def load_backbone(args):
    import jax

    from omgsr_tpu.models.configs import VIT_SIZES, DinoV3ViTConfig
    from omgsr_tpu.models.dinov3_vit import init_dinov3_vit

    if args.arch.startswith("convnext"):
        return _load_convnext_backbone(args)
    cfg = VIT_SIZES[args.arch] if args.arch in VIT_SIZES else DinoV3ViTConfig()
    if args.vit_overrides:
        cfg = dataclasses.replace(cfg, **json.loads(args.vit_overrides))
    if args.weights and args.weights.endswith(".pth"):
        from omgsr_tpu.convert import port_dinov3_vit

        return port_dinov3_vit(args.weights, cfg=cfg), cfg
    if args.weights:  # orbax teacher export (cli.pretrain_dinov3 eval/ dir)
        from omgsr_tpu.training.checkpoint import restore_train_state

        abstract = init_dinov3_vit(jax.random.key(0), cfg)
        return restore_train_state(args.weights, abstract), cfg
    logger.warning("no --weights given — probing a randomly initialized backbone")
    return init_dinov3_vit(jax.random.key(args.seed), cfg), cfg


def _load_convnext_backbone(args):
    """hub ConvNeXt backbones probe through convnext_forward_features (the
    vendored forward_features layout, convnext.py:207-235)."""
    import jax

    from omgsr_tpu.models.configs import CONVNEXT_SIZES, ConvNeXtConfig
    from omgsr_tpu.models.convnext import init_convnext

    size = args.arch.split("_", 1)[1] if "_" in args.arch else ""
    cfg = CONVNEXT_SIZES.get(size, ConvNeXtConfig())
    if args.vit_overrides:  # same flag: JSON overrides for the active arch
        cfg = dataclasses.replace(cfg, **json.loads(args.vit_overrides))
    if args.weights and args.weights.endswith(".pth"):
        from omgsr_tpu.convert import port_dinov3_convnext

        return port_dinov3_convnext(args.weights, cfg=cfg), cfg
    if args.weights:  # orbax backbone dir (same contract as the ViT path)
        from omgsr_tpu.training.checkpoint import restore_train_state

        abstract = init_convnext(jax.random.key(0), cfg, with_final_norm=True)
        return restore_train_state(args.weights, abstract), cfg
    logger.warning("no --weights given — probing a randomly initialized backbone")
    return init_convnext(jax.random.key(args.seed), cfg, with_final_norm=True), cfg


def main(argv=None):
    parser = argparse.ArgumentParser("DINOv3 k-NN / linear / logreg eval")
    parser.add_argument(
        "--mode", choices=["knn", "linear", "logreg", "all", "zeroshot"], default="all"
    )
    parser.add_argument(
        "--train_dir",
        default="",
        help="ImageFolder dir or dataset spec 'ImageNet:split=TRAIN:root=..."
        ":extra=...' / 'ImageNet22k:root=...:extra=...'; unused by zeroshot",
    )
    parser.add_argument("--val_dir", required=True)
    parser.add_argument("--arch", default="vitl16")
    parser.add_argument("--weights", default="", help=".pth (hub) or orbax backbone dir")
    parser.add_argument("--vit_overrides", default="", help='JSON DinoV3ViTConfig overrides')
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--resize_size", type=int, default=256)
    parser.add_argument("--crop_size", type=int, default=224)
    parser.add_argument("--knn_ks", type=int, nargs="+", default=[10, 20, 100, 200])
    parser.add_argument("--knn_temperature", type=float, default=0.07)
    parser.add_argument("--probe_blocks", type=int, default=1, help="last-n-blocks probe input")
    parser.add_argument("--probe_avgpool", action="store_true")
    parser.add_argument("--probe_epochs", type=int, default=10)
    parser.add_argument("--logreg_cs", type=float, nargs="+", default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--output", default="")
    # zeroshot (dinotxt) mode
    parser.add_argument("--dinotxt_weights", default="",
                        help="dinotxt vision-head+text-encoder .pth (zeroshot)")
    parser.add_argument("--tokenizer_dir", default="",
                        help="local HF CLIPTokenizer dir (zeroshot)")
    parser.add_argument("--prompt_template", default="a photo of a {}",
                        help="class-name prompt template (zeroshot)")
    parser.add_argument("--dinotxt_model_overrides", default="",
                        help="JSON DINOTxtConfig overrides (zeroshot)")
    parser.add_argument("--dinotxt_text_overrides", default="",
                        help="JSON TextTransformerConfig overrides (zeroshot)")
    args = parser.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(name)s %(message)s")
    from omgsr_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    import jax
    import jax.numpy as jnp

    if args.mode == "zeroshot":
        return _run_zeroshot(args)
    if not args.train_dir:
        parser.error("--train_dir is required for knn/linear/logreg modes")

    from omgsr_tpu.eval.probes import (
        create_linear_input,
        extract_features,
        knn_classify,
        make_eval_transform,
        sweep_logreg_C,
        train_linear_probes,
    )
    from omgsr_tpu.models.dinov3_vit import get_intermediate_layers

    backbone, vit_cfg = load_backbone(args)
    tr_imgs, tr_labels, classes = load_imagefolder(args.train_dir)
    va_imgs, va_labels, va_classes = load_imagefolder(args.val_dir)
    if classes != va_classes:
        raise ValueError("train/val class sets differ")
    logger.info(
        "%d train / %d val images, %d classes", len(tr_imgs), len(va_imgs), len(classes)
    )

    n_blocks = max(args.probe_blocks, 1)

    if args.arch.startswith("convnext"):
        from omgsr_tpu.models.convnext import convnext_forward_features

        if n_blocks > 1:
            # ConvNeXt probes only the final (normed) features; silently
            # reporting a "last-n-blocks" number that wasn't would mislabel
            # the protocol
            parser.error("--probe_blocks > 1 is a ViT protocol; ConvNeXt "
                         "archs probe the final feature stage only")

        @jax.jit
        def feats_fn(p, x):
            out = convnext_forward_features(p, x)
            return create_linear_input(
                [(out["x_norm_patchtokens"], out["x_norm_clstoken"])],
                1, args.probe_avgpool,
            )
    else:

        @jax.jit
        def feats_fn(p, x):
            outs = get_intermediate_layers(
                p, vit_cfg, x, n=n_blocks, return_class_token=True
            )
            return create_linear_input(outs, n_blocks, args.probe_avgpool)

    transform = make_eval_transform(args.resize_size, args.crop_size)
    tr_f = extract_features(lambda x: feats_fn(backbone, x), tr_imgs, args.batch_size, transform)
    va_f = extract_features(lambda x: feats_fn(backbone, x), va_imgs, args.batch_size, transform)

    results = {"num_classes": len(classes), "n_train": len(tr_imgs), "n_val": len(va_imgs)}

    if args.mode in ("knn", "all"):
        # k-NN on L2-normalized features (knn.py normalizes cls features)
        trn = tr_f / np.linalg.norm(tr_f, axis=-1, keepdims=True)
        van = va_f / np.linalg.norm(va_f, axis=-1, keepdims=True)
        usable = [k for k in args.knn_ks if k <= len(tr_labels)] or [len(tr_labels)]
        probs = knn_classify(
            jnp.asarray(trn), jnp.asarray(tr_labels), jnp.asarray(van),
            ks=usable, T=args.knn_temperature, num_classes=len(classes),
        )
        for k, p in probs.items():
            acc = float(np.mean(np.asarray(jnp.argmax(p, -1)) == va_labels))
            results[f"knn_top1_k{k}"] = acc
            logger.info("knn k=%d top-1 %.4f", k, acc)

    if args.mode in ("linear", "all"):
        res = train_linear_probes(
            jax.random.key(args.seed),
            jnp.asarray(tr_f), jnp.asarray(tr_labels),
            jnp.asarray(va_f), jnp.asarray(va_labels),
            num_classes=len(classes), epochs=args.probe_epochs,
            batch_size=min(128, len(tr_labels)),
        )
        results["linear_top1"] = float(res.best_accuracy)
        results["linear_best_lr"] = float(res.best_lr)
        logger.info("linear probe top-1 %.4f (lr %.2e)", res.best_accuracy, res.best_lr)

    if args.mode in ("logreg", "all"):
        kw = {"c_powers": np.log10(args.logreg_cs)} if args.logreg_cs else {}
        best_c, acc, _ = sweep_logreg_C(
            jnp.asarray(tr_f), jnp.asarray(tr_labels),
            jnp.asarray(va_f), jnp.asarray(va_labels),
            num_classes=len(classes), **kw,
        )
        results["logreg_top1"] = float(acc)
        results["logreg_best_C"] = float(best_c)
        logger.info("logreg top-1 %.4f (C %.3g)", acc, best_c)

    print(json.dumps(results, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)
    return results


def _run_zeroshot(args):
    """CLIP-style zero-shot classification: dinotxt image features vs
    class-prompt text features, top-1/top-5 on an ImageFolder val split.
    The reference ships the pieces (build_model_for_eval returns
    model+transform+tokenizer, build_dinotxt.py:199-238) and leaves the
    protocol to an external harness; this is that harness, TPU-side."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from omgsr_tpu import hub
    from omgsr_tpu.eval.probes import extract_features, make_eval_transform, top_k_accuracy

    if not args.tokenizer_dir:
        raise SystemExit("--mode zeroshot requires --tokenizer_dir")
    ov = lambda s: json.loads(s) if s else None  # noqa: E731
    model = hub.dinov3_vitl16_dinotxt_tet1280d20h24l(
        weights=args.dinotxt_weights or None,
        backbone_weights=args.weights or None,
        tokenizer_dir=args.tokenizer_dir,
        backbone_arch=args.arch,
        backbone_overrides=ov(args.vit_overrides),
        model_overrides=ov(args.dinotxt_model_overrides),
        text_overrides=ov(args.dinotxt_text_overrides),
    )
    va_imgs, va_labels, classes = load_imagefolder(args.val_dir)
    prompts = [args.prompt_template.format(c.replace("_", " ")) for c in classes]
    ids = jnp.asarray(model.extras["tokenize"](prompts))
    txt = np.asarray(model.extras["encode_text"](model.params, ids))

    enc = jax.jit(lambda p, x: model.extras["encode_image"](p, x))
    transform = make_eval_transform(args.resize_size, args.crop_size)
    img = extract_features(
        lambda x: enc(model.params, x), va_imgs, args.batch_size, transform
    )
    logits = img @ txt.T
    results = {"num_classes": len(classes), "n_val": len(va_imgs)}
    ks = (1, 5) if len(classes) >= 5 else (1,)
    results.update(
        {f"zeroshot_{k}": v for k, v in top_k_accuracy(logits, va_labels, ks=ks).items()}
    )
    for k, v in results.items():
        logger.info("%s: %s", k, v)
    print(json.dumps(results, indent=2))
    if args.output:
        with open(args.output, "w") as f:
            json.dump(results, f, indent=2)
    return results


if __name__ == "__main__":
    main()
