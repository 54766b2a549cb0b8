"""DINOv3 downstream inference CLI — depth / segmentation / detection /
dinotxt zero-shot over an image folder, built on the hub builders.

    python -m omgsr_tpu.cli.infer_dinov3 --task depth \\
        --input_dir imgs/ --output_dir out/ --arch vitl16 \\
        --backbone_weights /ckpts/dinov3_vitl16.pth --weights /ckpts/dpt.pth

User-facing runner for the downstream suites the reference drives through
its eval configs (dinov3/eval/{dense/depth,segmentation,detection,text});
model composition and weight loading go through `omgsr_tpu.hub` (the same
head configurations as the torch hub entry points). Outputs:

- depth: <stem>_depth.npy (float32 H x W) + a 16-bit PNG visualization
- segmentation: <stem>_seg.png (argmax class ids, uint8/uint16) via the
  512-px predict path (whole mode) or --slide crop inference
- detection: <stem>_det.json {scores, labels, boxes[xyxy]} above
  --score_threshold
- dinotxt: zero-shot prompt ranking — <stem>: best prompt + softmax scores
  into one summary JSON (requires --prompts and --tokenizer_dir)

One jitted graph per task; params are jit arguments; images are resized to
--image_size (detection snaps the resize up to the backbone's window grid,
e.g. 512 -> 528 for the 3-window ViT-7B).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import logging
import os

import numpy as np

logger = logging.getLogger("omgsr_tpu.infer_dinov3")

from omgsr_tpu.data.ssl import IMAGENET_MEAN, IMAGENET_STD  # noqa: E402

_TASK_DEFAULT_ARCH = {
    "depth": "vitl16",
    "segmentation": "vitl16",
    "detection": "vitl16plus",
    "dinotxt": "vitl16",
}


def list_images(d: str):
    exts = (".png", ".jpg", ".jpeg", ".webp", ".bmp")
    out = [
        os.path.join(d, f)
        for f in sorted(os.listdir(d))
        if f.lower().endswith(exts)
    ]
    if not out:
        raise FileNotFoundError(f"no images under {d}")
    return out


def load_normalized(path: str, size: int):
    """RGB -> bilinear size x size -> ImageNet-normalized NHWC float32."""
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB")
        orig = im.size  # (W, H)
        im = im.resize((size, size), Image.BILINEAR)
    x = np.asarray(im, np.float32) / 255.0
    return ((x - IMAGENET_MEAN) / IMAGENET_STD)[None], orig


def _overrides(s: str):
    return json.loads(s) if s else None


def build_model(args):
    import jax.numpy as jnp

    from omgsr_tpu import hub

    kw = dict(
        weights=args.weights or None,
        backbone_weights=args.backbone_weights or None,
        dtype=jnp.float32 if args.dtype == "float32" else jnp.bfloat16,
        backbone_overrides=_overrides(args.backbone_overrides),
    )
    arch = args.arch or _TASK_DEFAULT_ARCH[args.task]
    if args.task == "depth":
        builder = {"vitl16": hub.dinov3_vitl16_dd, "vit7b16": hub.dinov3_vit7b16_dd}[arch]
        return builder(head_overrides=_overrides(args.head_overrides), **kw)
    if args.task == "segmentation":
        builder = {"vitl16": hub.dinov3_vitl16_ms, "vit7b16": hub.dinov3_vit7b16_ms}[arch]
        return builder(
            num_classes=args.num_classes,
            adapter_overrides=_overrides(args.adapter_overrides),
            head_overrides=_overrides(args.head_overrides),
            **kw,
        )
    if args.task == "detection":
        builder = {
            "vitl16plus": hub.dinov3_vitl16plus_de,
            "vit7b16": hub.dinov3_vit7b16_de,
        }[arch]
        return builder(head_overrides=_overrides(args.head_overrides), **kw)
    if args.task == "dinotxt":
        return hub.dinov3_vitl16_dinotxt_tet1280d20h24l(
            tokenizer_dir=args.tokenizer_dir,
            backbone_arch=arch,
            model_overrides=_overrides(args.model_overrides),
            text_overrides=_overrides(args.text_overrides),
            **kw,
        )
    raise ValueError(args.task)


def run_depth(model, paths, args):
    import jax
    from PIL import Image

    fwd = jax.jit(model.apply)
    for p in paths:
        x, _ = load_normalized(p, args.image_size)
        d = np.asarray(fwd(model.params, x))[0, :, :, 0].astype(np.float32)
        stem = os.path.splitext(os.path.basename(p))[0]
        np.save(os.path.join(args.output_dir, f"{stem}_depth.npy"), d)
        lo, hi = float(d.min()), float(d.max())
        vis = ((d - lo) / max(hi - lo, 1e-9) * 65535).astype(np.uint16)
        Image.fromarray(vis).save(os.path.join(args.output_dir, f"{stem}_depth.png"))
        logger.info("%s: depth range [%.4f, %.4f]", stem, lo, hi)


def run_segmentation(model, paths, args):
    import jax
    from PIL import Image

    if args.slide:
        from omgsr_tpu.eval.segmentation import slide_inference

        # slide_inference calls predict(crop, rescale_to=(h_crop, w_crop));
        # every crop is exactly h_crop x w_crop, so ONE jitted graph serves
        # all of them (rescale_to is a static int tuple)
        predict_jit = jax.jit(
            lambda prm, img, rescale_to: model.extras["predict"](
                prm, img, rescale_to=rescale_to
            ),
            static_argnames=("rescale_to",),
        )
        predict = lambda img, rescale_to: predict_jit(  # noqa: E731
            model.params, img, rescale_to
        )
        fwd = None
    else:
        fwd = jax.jit(lambda prm, x: model.extras["predict"](
            prm, x, rescale_to=(args.image_size, args.image_size)
        ))
    for p in paths:
        x, _ = load_normalized(p, args.image_size)
        if args.slide:
            probs = slide_inference(
                predict, x,
                crop_size=args.slide_crop,
                stride=args.slide_stride,
                n_classes=args.num_classes,
            )
        else:
            probs = fwd(model.params, x)
        ids = np.asarray(probs)[0].argmax(-1)
        stem = os.path.splitext(os.path.basename(p))[0]
        arr = ids.astype(np.uint8 if args.num_classes <= 255 else np.uint16)
        Image.fromarray(arr).save(os.path.join(args.output_dir, f"{stem}_seg.png"))
        logger.info("%s: %d distinct classes", stem, len(np.unique(ids)))


def run_detection(model, paths, args):
    import jax

    fwd = jax.jit(model.apply)
    # the windowed backbone needs h/w divisible into n_windows equal
    # patch-multiple windows — snap the square resize up to that grid
    # (e.g. vit7b16: 3 windows x patch 16 -> multiples of 48; 512 -> 528)
    grid = model.extras["n_windows"] * model.cfgs["backbone"].patch_size
    size = -(-args.image_size // grid) * grid
    if size != args.image_size:
        logger.info("detection: image_size %d snapped to %d (window grid %d)",
                    args.image_size, size, grid)
    for p in paths:
        x, (ow, oh) = load_normalized(p, size)
        out = fwd(model.params, x)
        scores = np.asarray(out["scores"])[0]
        keep = scores >= args.score_threshold
        boxes = np.asarray(out["boxes"])[0][keep]
        # map back to the original resolution
        boxes[:, 0::2] *= ow / size
        boxes[:, 1::2] *= oh / size
        det = {
            "scores": scores[keep].tolist(),
            "labels": np.asarray(out["labels"])[0][keep].tolist(),
            "boxes": boxes.tolist(),
        }
        stem = os.path.splitext(os.path.basename(p))[0]
        with open(os.path.join(args.output_dir, f"{stem}_det.json"), "w") as f:
            json.dump(det, f, indent=1)
        logger.info("%s: %d detections >= %.2f", stem, len(det["scores"]), args.score_threshold)


def run_dinotxt(model, paths, args):
    import jax
    import jax.numpy as jnp

    if not args.prompts:
        raise SystemExit("--task dinotxt requires --prompts")
    if "tokenize" not in model.extras:
        raise SystemExit("--task dinotxt requires --tokenizer_dir")
    ids = jnp.asarray(model.extras["tokenize"](list(args.prompts)))
    enc_i = jax.jit(lambda prm, x: model.extras["encode_image"](prm, x))
    enc_t = jax.jit(lambda prm, t: model.extras["encode_text"](prm, t))
    txt = enc_t(model.params, ids)
    scale = float(np.exp(np.asarray(model.params["model"]["logit_scale"]))[0])
    results = {}
    for p in paths:
        x, _ = load_normalized(p, args.image_size)
        img = enc_i(model.params, x)
        sims = np.asarray(img @ txt.T)[0]
        probs = np.exp(scale * sims - (scale * sims).max())
        probs /= probs.sum()
        stem = os.path.splitext(os.path.basename(p))[0]
        results[stem] = {
            "best": args.prompts[int(probs.argmax())],
            "probs": {pr: float(v) for pr, v in zip(args.prompts, probs)},
        }
        logger.info("%s -> %s", stem, results[stem]["best"])
    with open(os.path.join(args.output_dir, "dinotxt_zeroshot.json"), "w") as f:
        json.dump(results, f, indent=1)


def main(argv=None):
    parser = argparse.ArgumentParser(description="DINOv3 downstream inference")
    parser.add_argument("--task", required=True,
                        choices=["depth", "segmentation", "detection", "dinotxt"])
    parser.add_argument("--input_dir", required=True)
    parser.add_argument("--output_dir", required=True)
    parser.add_argument("--arch", default="",
                        help="backbone arch (default per task: dd/ms=vitl16, de=vitl16plus)")
    parser.add_argument("--backbone_weights", default="", help="hub backbone .pth")
    parser.add_argument("--weights", default="", help="head/model .pth")
    parser.add_argument("--image_size", type=int, default=512)
    parser.add_argument("--dtype", choices=["float32", "bfloat16"], default="float32")
    parser.add_argument("--num_classes", type=int, default=150)
    parser.add_argument("--score_threshold", type=float, default=0.3)
    parser.add_argument("--slide", action="store_true", help="segmentation slide mode")
    parser.add_argument("--slide_crop", type=int, default=512)
    parser.add_argument("--slide_stride", type=int, default=341)
    parser.add_argument("--prompts", nargs="+", default=None)
    parser.add_argument("--tokenizer_dir", default="")
    parser.add_argument("--backbone_overrides", default="", help="JSON DinoV3ViTConfig overrides")
    parser.add_argument("--head_overrides", default="", help="JSON head-config overrides")
    parser.add_argument("--adapter_overrides", default="", help="JSON AdapterConfig overrides")
    parser.add_argument("--model_overrides", default="", help="JSON DINOTxtConfig overrides")
    parser.add_argument("--text_overrides", default="", help="JSON TextTransformerConfig overrides")
    args = parser.parse_args(argv)
    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(levelname)s %(message)s")

    from omgsr_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    os.makedirs(args.output_dir, exist_ok=True)
    paths = list_images(args.input_dir)
    model = build_model(args)
    runner = {
        "depth": run_depth,
        "segmentation": run_segmentation,
        "detection": run_detection,
        "dinotxt": run_dinotxt,
    }[args.task]
    runner(model, paths, args)
    logger.info("done: %d images -> %s", len(paths), args.output_dir)


if __name__ == "__main__":
    main()
