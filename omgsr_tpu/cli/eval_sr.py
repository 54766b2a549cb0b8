"""Quantitative SR evaluation: PSNR / SSIM over an output/GT folder pair.

The reference evaluates on RealSR/DRealSR/RealLQ250 protocols but ships no
eval script (its README.md:45-90 links qualitative imgsli comparisons only);
this CLI closes that gap: it pairs SR outputs with ground-truth images by
filename stem and reports per-image and mean PSNR/SSIM, with the standard
SR-paper conventions (optional border crop and Y-channel evaluation).

    python -m omgsr_tpu.cli.eval_sr --sr_dir out/ --gt_dir gt/ \
        --crop_border 4 --y_channel --output metrics.json
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from omgsr_tpu.data.dataset import collect_paths


def _load01(path: str) -> np.ndarray:
    from PIL import Image

    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def _to_y(arr: np.ndarray) -> np.ndarray:
    """BT.601 luma (the SR-paper convention): Y in [0,1] from RGB in [0,1]."""
    y = arr @ np.asarray([65.481, 128.553, 24.966], np.float32) + 16.0
    return (y / 255.0)[..., None]


def pair_by_stem(sr_paths: list[str], gt_paths: list[str]):
    """Exact-stem pairing, plus a single-trailing-suffix fallback
    (`name_out.png` -> `name.png`) that only fires when UNAMBIGUOUS — if two
    SR files would strip to the same ground truth, both are reported missing
    rather than silently scored against the wrong reference."""
    gt_by_stem: dict[str, str] = {}
    for p in gt_paths:
        stem = os.path.splitext(os.path.basename(p))[0]
        if stem in gt_by_stem and gt_by_stem[stem] != p:
            raise ValueError(
                f"duplicate ground-truth stem {stem!r}: {gt_by_stem[stem]} vs {p} "
                "— pass disjoint --gt_dir trees or rename"
            )
        gt_by_stem[stem] = p
    pairs, missing, fallback = [], [], {}
    claimed = set()
    for sp in sorted(sr_paths):
        stem = os.path.splitext(os.path.basename(sp))[0]
        hit = gt_by_stem.get(stem)
        if hit:
            pairs.append((sp, hit))
            claimed.add(hit)
        else:
            fallback.setdefault(stem.rsplit("_", 1)[0], []).append(sp)
    for base, sps in sorted(fallback.items()):
        hit = gt_by_stem.get(base)
        if hit and len(sps) == 1 and hit not in claimed:
            pairs.append((sps[0], hit))
        else:
            missing.extend(sps)
    return pairs, missing


def build_dists_fn(dinov3_weights_path=None, size: str = "large"):
    """DISTS metric closure over a (ported or random) DINOv3-ConvNeXt
    backbone — the same perceptual stack the training objective uses
    (losses/dists.py ≙ dinov3_gan/dinov3_convnext_dists.py:79-108)."""
    import jax

    from omgsr_tpu.losses.dists import dists_loss, init_dists
    from omgsr_tpu.models.configs import CONVNEXT_SIZES

    cn_cfg = CONVNEXT_SIZES[size]
    if dinov3_weights_path:
        from omgsr_tpu.convert import port_dinov3_convnext

        backbone = port_dinov3_convnext(dinov3_weights_path, cfg=cn_cfg)
    else:
        import logging

        logging.getLogger("omgsr_tpu.eval_sr").warning(
            "no --dinov3_weights_path — DISTS uses a random ConvNeXt backbone "
            "(scores self-consistent, not comparable to published numbers)"
        )
        from omgsr_tpu.models.convnext import init_convnext

        backbone = init_convnext(jax.random.key(0), cn_cfg)
    bundle = init_dists(backbone, cn_cfg.dims)
    loss = jax.jit(dists_loss)

    def fn(a01, b01):
        import jax.numpy as jnp

        return float(loss(bundle, jnp.asarray(a01)[None] * 2 - 1, jnp.asarray(b01)[None] * 2 - 1))

    return fn


def build_lpips_fn(vgg_pth=None, lins_pth=None):
    """LPIPS-VGG metric closure (utils/lpips.py). Random weights with a
    warning when the official checkpoints aren't provided."""
    import jax

    from omgsr_tpu.utils.lpips import init_lpips, lpips, port_lpips

    if vgg_pth and lins_pth:
        params = port_lpips(vgg_pth, lins_pth)
    else:
        import logging

        logging.getLogger("omgsr_tpu.eval_sr").warning(
            "no --lpips_vgg/--lpips_lins — LPIPS uses random weights "
            "(scores self-consistent, not comparable to published numbers)"
        )
        params = init_lpips(jax.random.key(0))
    score = jax.jit(lpips)

    def fn(a01, b01):
        import jax.numpy as jnp

        return float(score(params, jnp.asarray(a01)[None] * 2 - 1,
                           jnp.asarray(b01)[None] * 2 - 1)[0])

    return fn


def build_clipiqa_fn(clip_vision_path=None, prompts_npz=None, cfg=None):
    """CLIP-IQA no-reference metric closure (models/clip_vision.py): softmax
    over cosine similarity against an antonym prompt pair, higher=better.
    The built-in preprocessing resizes to the tower's input size, so every
    image shape shares ONE compiled graph."""
    import jax

    from omgsr_tpu.models.clip_vision import (
        CLIP_L_VISION,
        clip_preprocess,
        clipiqa_score_preprocessed,
        init_clip_vision,
    )

    cfg = cfg or CLIP_L_VISION
    if clip_vision_path:
        from omgsr_tpu.convert.porters import port_clip_vision

        params = port_clip_vision(clip_vision_path, cfg=cfg)
        if "visual_projection" not in params:
            raise SystemExit(
                "--clip_vision_path checkpoint has no visual_projection head "
                "(CLIP-IQA needs CLIPModel / CLIPVisionModelWithProjection "
                "weights)"
            )
        if not prompts_npz:
            # real tower + random prompts would yield plausible-looking but
            # meaningless scores — encode the antonym pair from the same dir
            # (works when it holds full CLIPModel weights + tokenizer files)
            from omgsr_tpu.models.clip_vision import (
                clipiqa_prompt_embeds_from_clip_dir,
            )

            try:
                prompts = clipiqa_prompt_embeds_from_clip_dir(clip_vision_path)
            except Exception as e:
                raise SystemExit(
                    "--clipiqa with a real tower needs real prompt "
                    "embeddings: pass --clipiqa_prompts_npz (build one with "
                    "models.clip_vision.clipiqa_prompt_embeds_from_clip_dir) "
                    f"— auto-encode from the checkpoint dir failed: {e}"
                )
    else:
        import logging

        logging.getLogger("omgsr_tpu.eval_sr").warning(
            "no --clip_vision_path — CLIP-IQA uses a random tower (scores "
            "self-consistent, not comparable to published numbers)"
        )
        params = init_clip_vision(jax.random.key(0), cfg)
        if not prompts_npz:
            prompts = np.asarray(
                jax.random.normal(jax.random.key(1), (2, cfg.projection_dim))
            )
    if prompts_npz:
        import numpy as _np

        prompts = _np.load(prompts_npz)["prompt_embeds"]
        if prompts.shape != (2, cfg.projection_dim):
            raise SystemExit(
                f"--clipiqa_prompts_npz prompt_embeds must be "
                f"(2, {cfg.projection_dim}), got {prompts.shape}"
            )
    # params/prompts are jit ARGS (captured-constant weights crash the
    # remote-compile transport — CLAUDE.md); the shape-dependent resize runs
    # eagerly OUTSIDE the jit so every image shape shares one compiled tower
    score = jax.jit(
        lambda p, t, px: clipiqa_score_preprocessed(p, cfg, px, t)
    )

    def fn(a01):
        import jax.numpy as jnp

        px = clip_preprocess(jnp.asarray(a01)[None], cfg)
        return float(score(params, prompts, px)[0])

    return fn


def _center_crop_multiple(a, b, n):
    h = (a.shape[0] // n) * n
    w = (a.shape[1] // n) * n
    if not (h and w):
        return a, b
    y0, x0 = (a.shape[0] - h) // 2, (a.shape[1] - w) // 2
    return a[y0:y0 + h, x0:x0 + w], b[y0:y0 + h, x0:x0 + w]


def evaluate_pairs(pairs, crop_border: int = 0, y_channel: bool = False,
                   dists_fn=None, niqe_pristine=None, metric_crop: int = 0,
                   lpips_fn=None, clipiqa_fn=None):
    import jax
    import jax.numpy as jnp

    from omgsr_tpu.utils.metrics import psnr, ssim

    @jax.jit
    def both(a, b):
        return psnr(a, b)[0], ssim(a, b)[0]

    rows = []
    for sr_path, gt_path in pairs:
        a, b = _load01(sr_path), _load01(gt_path)
        if a.shape != b.shape:
            raise ValueError(
                f"size mismatch: {sr_path} {a.shape} vs {gt_path} {b.shape}"
            )
        if crop_border:
            a = a[crop_border:-crop_border, crop_border:-crop_border]
            b = b[crop_border:-crop_border, crop_border:-crop_border]
        a_rgb, b_rgb = a, b
        if y_channel:
            a, b = _to_y(a), _to_y(b)
        p, s = both(jnp.asarray(a)[None], jnp.asarray(b)[None])
        row = {"name": os.path.basename(sr_path), "psnr": float(p), "ssim": float(s)}
        da, db = a_rgb, b_rgb
        if metric_crop:
            da, db = _center_crop_multiple(a_rgb, b_rgb, metric_crop)
        if dists_fn is not None:
            row["dists"] = dists_fn(da, db)
        if lpips_fn is not None:
            row["lpips"] = lpips_fn(da, db)
        if clipiqa_fn is not None:
            row["clipiqa"] = clipiqa_fn(a_rgb)  # no-reference: SR image only
        if niqe_pristine is not None:
            from omgsr_tpu.utils.niqe import niqe

            try:
                row["niqe"] = niqe(a_rgb, niqe_pristine)
            except ValueError as e:
                # e.g. image smaller than the NIQE block grid — score the
                # rest of the folder rather than aborting the whole eval
                print(f"WARNING: NIQE skipped for {sr_path}: {e}")
                row["niqe"] = float("nan")
        rows.append(row)
    return rows


def main(args=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sr_dir", type=str, required=True, nargs="+",
                        help="SR output dir(s) or .txt list(s)")
    parser.add_argument("--gt_dir", type=str, required=True, nargs="+",
                        help="ground-truth dir(s) or .txt list(s)")
    parser.add_argument("--crop_border", type=int, default=0,
                        help="pixels cropped from every edge before scoring "
                        "(SR convention: the upscale factor)")
    parser.add_argument("--y_channel", action="store_true",
                        help="evaluate on the BT.601 Y channel (SR-paper convention)")
    parser.add_argument("--output", type=str, default=None,
                        help="write per-image + summary metrics as JSON")
    parser.add_argument("--dists", action="store_true",
                        help="also report DISTS (DINOv3-ConvNeXt perceptual "
                        "distance, lower=better; uses --dinov3_weights_path)")
    parser.add_argument("--dinov3_weights_path", type=str, default=None,
                        help="DINOv3 ConvNeXt .pth for DISTS (random backbone "
                        "with a warning when absent)")
    parser.add_argument("--dinov3_size", type=str, default="large")
    parser.add_argument("--metric_crop", type=int, default=0,
                        help="center-crop images to multiples of N before the "
                        "DISTS/LPIPS forwards (bounds one backbone compile "
                        "per size bucket instead of per distinct image shape; "
                        "0 = full-image, faithful to the reference impls)")
    parser.add_argument("--lpips", action="store_true",
                        help="also report LPIPS-VGG (lower=better; random "
                        "weights with a warning unless --lpips_vgg and "
                        "--lpips_lins are given)")
    parser.add_argument("--lpips_vgg", type=str, default=None,
                        help="torchvision vgg16 state-dict .pth")
    parser.add_argument("--lpips_lins", type=str, default=None,
                        help="lpips package linear weights "
                        "(lpips/weights/v0.1/vgg.pth)")
    parser.add_argument("--clipiqa", action="store_true",
                        help="also report CLIP-IQA (no-reference, "
                        "higher=better; random tower with a warning unless "
                        "--clip_vision_path is given)")
    parser.add_argument("--clip_vision_path", type=str, default=None,
                        help="HF CLIPModel / CLIPVisionModelWithProjection "
                        "dir (safetensors) for CLIP-IQA")
    parser.add_argument("--clipiqa_prompts_npz", type=str, default=None,
                        help=".npz with prompt_embeds (2, proj_dim): CLIP "
                        "text embeddings of the antonym prompt pair "
                        "('Good photo.', 'Bad photo.')")
    parser.add_argument("--niqe_params", type=str, default=None,
                        help="pristine-model .npz (keys mu/cov; build one with "
                        "utils.niqe.fit_pristine) — enables the no-reference "
                        "NIQE score (lower=better)")
    args = parser.parse_args(args)

    # metric math is trivial; run it on the host CPU backend so every
    # distinct image shape doesn't pay a (remote) accelerator compile
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass  # backend already initialized (in-process use) — keep it

    pairs, missing = pair_by_stem(collect_paths(args.sr_dir), collect_paths(args.gt_dir))
    for m in missing:
        print(f"WARNING: no ground truth for {m}, skipped")
    if not pairs:
        raise SystemExit("no (SR, GT) pairs found")

    dists_fn = (
        build_dists_fn(args.dinov3_weights_path, args.dinov3_size) if args.dists else None
    )
    niqe_pristine = None
    if args.niqe_params:
        from omgsr_tpu.utils.niqe import load_pristine

        niqe_pristine = load_pristine(args.niqe_params)

    lpips_fn = (
        build_lpips_fn(args.lpips_vgg, args.lpips_lins) if args.lpips else None
    )
    clipiqa_fn = (
        build_clipiqa_fn(args.clip_vision_path, args.clipiqa_prompts_npz)
        if args.clipiqa else None
    )
    rows = evaluate_pairs(pairs, args.crop_border, args.y_channel,
                          dists_fn=dists_fn, niqe_pristine=niqe_pristine,
                          metric_crop=args.metric_crop, lpips_fn=lpips_fn,
                          clipiqa_fn=clipiqa_fn)
    for r in rows:
        line = f"{r['name']:40s} PSNR {r['psnr']:7.3f}  SSIM {r['ssim']:.4f}"
        if "dists" in r:
            line += f"  DISTS {r['dists']:.4f}"
        if "lpips" in r:
            line += f"  LPIPS {r['lpips']:.4f}"
        if "clipiqa" in r:
            line += f"  CLIPIQA {r['clipiqa']:.4f}"
        if "niqe" in r:
            line += f"  NIQE {r['niqe']:.3f}"
        print(line)
    summary = {
        "n": len(rows),
        "psnr_mean": float(np.mean([r["psnr"] for r in rows])),
        "ssim_mean": float(np.mean([r["ssim"] for r in rows])),
        "crop_border": args.crop_border,
        "y_channel": args.y_channel,
    }
    for k in ("dists", "lpips", "clipiqa", "niqe"):
        if rows and k in rows[0]:
            vals = [r[k] for r in rows if np.isfinite(r[k])]
            if vals:
                summary[f"{k}_mean"] = float(np.mean(vals))
                if len(vals) < len(rows):
                    summary[f"{k}_n"] = len(vals)
    print(
        f"mean over {summary['n']} images: PSNR {summary['psnr_mean']:.3f} "
        f"SSIM {summary['ssim_mean']:.4f}"
        + (f" DISTS {summary['dists_mean']:.4f}" if "dists_mean" in summary else "")
        + (f" LPIPS {summary['lpips_mean']:.4f}" if "lpips_mean" in summary else "")
        + (f" CLIPIQA {summary['clipiqa_mean']:.4f}" if "clipiqa_mean" in summary else "")
        + (f" NIQE {summary['niqe_mean']:.3f}" if "niqe_mean" in summary else "")
    )
    if args.output:
        # skipped metrics are NaN in-process; serialize as null (strict JSON)
        ser = [
            {k: (None if isinstance(v, float) and not np.isfinite(v) else v)
             for k, v in r.items()}
            for r in rows
        ]
        with open(args.output, "w") as f:
            json.dump({"summary": summary, "per_image": ser}, f, indent=2)
    return summary


if __name__ == "__main__":
    main()
