"""Real-checkpoint fidelity validation — ready to run the moment HF-layout
weights become mountable (the standing capability item: everything else is
validated on tiny random configs only).

For each component of a checkpoint directory it:
  1. ports the safetensors into this framework's param trees
     (convert.porters, with leaf-set validation);
  2. runs the SAME ported tree through an independent torch re-implementation
     (tests/torch_ref_models.py) and through the actual HuggingFace
     `transformers` towers where those exist in this image (CLIP/T5 — fully
     independent reference code), on fixed probe inputs;
  3. reports per-stage max/mean relative deviation against the 1e-3 target
     (BASELINE.md "output fidelity" row).

    python -m omgsr_tpu.cli.validate_checkpoint --sd_path /ckpts/sd21 \
        [--probe_image img.png] [--report report.json]
    python -m omgsr_tpu.cli.validate_checkpoint --flux_path /ckpts/flux \
        [--report report.json]

Runs everything in float32 on CPU (bit-comparable to torch; the 12B FLUX
forward in torch-CPU takes minutes — probes use short token counts).
Reference loading path being validated: infer/omgsr_s_infer_model.py:11-23,
infer/omgsr_f_infer_model.py:103 (diffusers from_pretrained).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _rel(a, b):
    import numpy as np

    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    denom = max(float(np.abs(b).max()), 1e-12)
    return {
        "max_abs": float(np.abs(a - b).max()),
        "max_rel": float(np.abs(a - b).max() / denom),
        "mean_rel": float(np.abs(a - b).mean() / denom),
    }


def _torch_ref():
    """Import the independent torch re-implementations (shipped under
    tests/ — this harness is a developer validation tool)."""
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if root not in sys.path:
        sys.path.insert(0, root)
    try:
        from tests import torch_ref_models as T  # noqa: PLC0415
    except ImportError as e:  # pragma: no cover
        raise SystemExit(
            "validate_checkpoint needs the repo's tests/torch_ref_models.py "
            f"(run from a full checkout): {e}"
        )
    return T


def validate_sd(sd_path: str, probe_image=None):
    import jax
    import jax.numpy as jnp
    import numpy as np
    import torch

    from omgsr_tpu.convert import port_diffusers_unet, port_diffusers_vae
    from omgsr_tpu.convert.hf_config import unet_config_from_json, vae_config_from_json
    from omgsr_tpu.models import unet_sd, vae

    T = _torch_ref()
    report = {}
    rng = np.random.default_rng(0)

    vae_dir, unet_dir = os.path.join(sd_path, "vae"), os.path.join(sd_path, "unet")
    vae_cfg = vae_config_from_json(vae_dir)
    unet_cfg = unet_config_from_json(unet_dir)
    vp = port_diffusers_vae(vae_dir, cfg=vae_cfg, dtype=jnp.float32)
    up = port_diffusers_unet(unet_dir, cfg=unet_cfg, dtype=jnp.float32)

    def nchw(a):
        return torch.from_numpy(np.asarray(a, np.float32).transpose(0, 3, 1, 2))

    def nhwc(t):
        return t.detach().numpy().transpose(0, 2, 3, 1)

    if probe_image is not None:
        x = probe_image
    else:
        x = np.tanh(rng.normal(size=(1, 128, 128, 3))).astype(np.float32)
    with torch.no_grad():
        ref_moments = nhwc(T.torch_vae_encode_features(vp, vae_cfg, nchw(x)))
    ours_moments = np.asarray(vae.vae_encode_features(vp, vae_cfg, jnp.asarray(x)))
    report["vae_encode_moments"] = _rel(ours_moments, ref_moments)

    z_raw = ours_moments[..., : vae_cfg.latent_channels].astype(np.float32)
    with torch.no_grad():
        ref_img = nhwc(T.torch_vae_decode(vp, vae_cfg, nchw(z_raw)))
    ours_img = np.asarray(vae.vae_decode(vp, vae_cfg, jnp.asarray(z_raw), unscale=False))
    report["vae_decode"] = _rel(ours_img, ref_img)

    ctx = rng.normal(size=(1, 77, unet_cfg.cross_attention_dim)).astype(np.float32)
    z_in = (z_raw * vae_cfg.scaling_factor).astype(np.float32)
    with torch.no_grad():
        ref_eps = nhwc(
            T.torch_unet_apply(up, unet_cfg, nchw(z_in), 273, torch.from_numpy(ctx))
        )
    ours_eps = np.asarray(unet_sd.unet_apply(up, unet_cfg, jnp.asarray(z_in), 273, jnp.asarray(ctx)))
    report["unet_eps_t273"] = _rel(ours_eps, ref_eps)

    # text tower vs the ACTUAL transformers implementation, same weights
    te_dir = os.path.join(sd_path, "text_encoder")
    if os.path.isdir(te_dir):
        try:
            from transformers import CLIPTextModel, AutoTokenizer

            tok = AutoTokenizer.from_pretrained(sd_path, subfolder="tokenizer")
            hf = CLIPTextModel.from_pretrained(te_dir, torch_dtype=torch.float32)
            ids = tok(
                "a photo of a cat", max_length=tok.model_max_length,
                padding="max_length", truncation=True, return_tensors="pt",
            ).input_ids
            with torch.no_grad():
                ref_txt = hf(ids)[0].numpy()
            from omgsr_tpu.cli.prompts import encode_prompt_sd

            ours_txt = np.asarray(
                encode_prompt_sd(sd_path, "a photo of a cat", jnp.float32)
            )
            report["clip_text_vs_transformers"] = _rel(ours_txt, ref_txt)
        except Exception as e:  # noqa: BLE001
            report["clip_text_vs_transformers"] = {"error": f"{type(e).__name__}: {e}"}
    return report


def validate_flux(flux_path: str, tokens: int = 64):
    import jax.numpy as jnp
    import numpy as np
    import torch

    from omgsr_tpu.convert import port_diffusers_vae, port_flux_transformer
    from omgsr_tpu.convert.hf_config import flux_config_from_json, vae_config_from_json
    from omgsr_tpu.diffusion.packing import latent_image_ids
    from omgsr_tpu.models import flux as flux_mod
    from omgsr_tpu.models import vae

    T = _torch_ref()
    report = {}
    rng = np.random.default_rng(1)

    vae_dir = os.path.join(flux_path, "vae")
    fx_dir = os.path.join(flux_path, "transformer")
    vae_cfg = vae_config_from_json(vae_dir)
    fx_cfg = flux_config_from_json(fx_dir)
    vp = port_diffusers_vae(vae_dir, cfg=vae_cfg, dtype=jnp.float32)

    x = np.tanh(rng.normal(size=(1, 64, 64, 3))).astype(np.float32)
    with torch.no_grad():
        ref_m = (
            T.torch_vae_encode_features(
                vp, vae_cfg, torch.from_numpy(x.transpose(0, 3, 1, 2))
            ).numpy().transpose(0, 2, 3, 1)
        )
    ours_m = np.asarray(vae.vae_encode_features(vp, vae_cfg, jnp.asarray(x)))
    report["flux_vae_encode_moments"] = _rel(ours_m, ref_m)

    fp = port_flux_transformer(fx_dir, cfg=fx_cfg, dtype=jnp.float32)
    side = int(tokens ** 0.5)
    s_img = side * side
    img = rng.normal(size=(1, s_img, fx_cfg.in_channels)).astype(np.float32) * 0.3
    txt = rng.normal(size=(1, 16, fx_cfg.joint_attention_dim)).astype(np.float32) * 0.3
    pooled = rng.normal(size=(1, fx_cfg.pooled_projection_dim)).astype(np.float32)
    img_ids = np.asarray(latent_image_ids(side, side), np.float32)
    txt_ids = np.zeros((16, 3), np.float32)
    with torch.no_grad():
        ref_v = T.torch_flux_apply(
            fp, fx_cfg, torch.from_numpy(img), 0.5, 1.0,
            torch.from_numpy(pooled), torch.from_numpy(txt),
            torch.from_numpy(txt_ids), torch.from_numpy(img_ids),
        ).numpy()
    ours_v = np.asarray(
        flux_mod.flux_apply(
            fp, fx_cfg, jnp.asarray(img), 0.5, 1.0, jnp.asarray(pooled),
            jnp.asarray(txt), jnp.asarray(txt_ids), jnp.asarray(img_ids),
        )
    )
    report["flux_dit_velocity"] = _rel(ours_v, ref_v)
    return report


_DINOV3_REF_ROOT = (
    "/root/reference/dinov3_gan/facebookresearch_dinov3_main"
)


def validate_dinov3(pth_path: str, arch: str = "vitl16", image_size: int = 224,
                    probe_image=None, ref_root: str = _DINOV3_REF_ROOT):
    """DINOv3 hub ViT/ConvNeXt .pth -> port -> forward parity against the
    ACTUAL vendored torch implementation (dinov3/models/*.py — fully
    independent reference code on disk), same weights, eval mode.

    Stronger than the SD/FLUX paths (whose torch side is a re-implementation):
    here the comparison target is the code the checkpoint was trained with.
    Covers forward_features (cls/storage/patch tokens) and a 4-layer
    get_intermediate_layers probe — the exact features every downstream suite
    (DPT/M2F/DETR/dinotxt/probes) consumes."""
    import numpy as np
    import torch

    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    report = {}
    rng = np.random.default_rng(2)
    if probe_image is not None:
        x = probe_image  # NHWC, ImageNet-normalize below
        x = (x + 1.0) / 2.0  # validate_* probes arrive in [-1, 1]
        mean = np.array([0.485, 0.456, 0.406], np.float32)
        std = np.array([0.229, 0.224, 0.225], np.float32)
        x = ((x - mean) / std).astype(np.float32)
    else:
        x = rng.standard_normal((1, image_size, image_size, 3)).astype(np.float32)

    if arch.startswith("convnext"):
        import jax.numpy as jnp

        from omgsr_tpu.convert.porters import port_dinov3_convnext
        from omgsr_tpu.models.configs import CONVNEXT_SIZES
        from omgsr_tpu.models.convnext import convnext_features

        size = arch.split("_", 1)[1]
        cfg = CONVNEXT_SIZES[size]
        params = port_dinov3_convnext(pth_path, cfg=cfg, dtype=jnp.float32)
        from dinov3.models.convnext import ConvNeXt

        depths, dims = list(cfg.depths), list(cfg.dims)
        m = ConvNeXt(depths=depths, dims=dims)
        sd = torch.load(pth_path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "model" in sd:
            sd = sd["model"]
        m.load_state_dict(sd, strict=False)
        m.eval()
        ours = convnext_features(params, jnp.asarray(x), num_stages=4)
        with torch.no_grad():
            tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
            for i, (dl, st) in enumerate(zip(m.downsample_layers, m.stages)):
                tx = st(dl(tx))
                report[f"convnext_stage{i}"] = _rel(
                    np.asarray(ours[i]), tx.numpy().transpose(0, 2, 3, 1)
                )
        return report

    import jax.numpy as jnp

    from omgsr_tpu.convert.porters import port_dinov3_vit
    from omgsr_tpu.models.configs import VIT_SIZES
    from omgsr_tpu.models.dinov3_vit import dinov3_vit_apply, get_intermediate_layers

    from dinov3.models.vision_transformer import DinoVisionTransformer

    cfg = VIT_SIZES[arch]
    params = port_dinov3_vit(pth_path, cfg=cfg, dtype=jnp.float32)
    m = DinoVisionTransformer(
        img_size=image_size,
        patch_size=cfg.patch_size,
        embed_dim=cfg.embed_dim,
        depth=cfg.depth,
        num_heads=cfg.num_heads,
        ffn_ratio=cfg.ffn_ratio,
        ffn_layer=cfg.ffn_layer,
        qkv_bias=cfg.qkv_bias,
        layerscale_init=cfg.layerscale_init,
        n_storage_tokens=cfg.n_storage_tokens,
        mask_k_bias=True,
        pos_embed_rope_base=cfg.rope_base,
        pos_embed_rope_normalize_coords=cfg.rope_normalize_coords,
        pos_embed_rope_dtype="fp32",
        # hub models ship "layernormbf16" = plain LN(eps=1e-5)
        # (vision_transformer.py:27-30; our cfg.norm_eps mirrors it)
        norm_layer="layernormbf16",
        untie_global_and_local_cls_norm=cfg.untie_cls_and_patch_norms,
    )
    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    missing, unexpected = m.load_state_dict(sd, strict=False)
    report["torch_load"] = {
        "missing": [k for k in missing if "local_cls_norm" not in k],
        "unexpected": list(unexpected),
    }
    m.eval()
    with torch.no_grad():
        tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ref = m.forward_features(tx)
        idx = [i * cfg.depth // 4 - 1 for i in range(1, 5)]
        ref_layers = m.get_intermediate_layers(tx, n=idx, reshape=True, norm=True)
    out = dinov3_vit_apply(params, cfg, jnp.asarray(x))
    for k in ("x_norm_clstoken", "x_storage_tokens", "x_norm_patchtokens"):
        report[k] = _rel(np.asarray(out[k]), ref[k].numpy())
    ours_layers = get_intermediate_layers(
        params, cfg, jnp.asarray(x), n=idx, reshape=True, norm=True
    )
    for i, (o, r) in enumerate(zip(ours_layers, ref_layers)):
        report[f"intermediate_layer_{idx[i]}"] = _rel(
            np.asarray(o), r.numpy().transpose(0, 2, 3, 1)
        )
    return report


def main(argv=None):
    parser = argparse.ArgumentParser(description="Real-checkpoint fidelity validation")
    parser.add_argument("--sd_path", type=str, default=None)
    parser.add_argument("--flux_path", type=str, default=None)
    parser.add_argument("--dinov3_pth", type=str, default=None,
                        help="DINOv3 hub backbone .pth (ViT or ConvNeXt)")
    parser.add_argument("--dinov3_arch", type=str, default="vitl16",
                        help="vits16|...|vit7b16|convnext_{tiny,small,base,large}")
    parser.add_argument("--probe_image", type=str, default=None)
    parser.add_argument("--report", type=str, default=None)
    parser.add_argument("--flux_tokens", type=int, default=64,
                        help="image tokens for the DiT probe (torch-CPU cost grows with this)")
    args = parser.parse_args(argv)
    if not (args.sd_path or args.flux_path or args.dinov3_pth):
        parser.error("pass --sd_path, --flux_path and/or --dinov3_pth")

    import jax

    jax.config.update("jax_platforms", "cpu")  # f32 CPU: bit-comparable to torch

    probe = None
    if args.probe_image:
        import numpy as np
        from PIL import Image

        im = np.asarray(Image.open(args.probe_image).convert("RGB"), np.float32)
        side = min(im.shape[0], im.shape[1], 256) // 8 * 8
        probe = (im[None, :side, :side] / 127.5 - 1.0).astype(np.float32)

    report = {}
    if args.sd_path:
        report["sd"] = validate_sd(args.sd_path, probe)
    if args.flux_path:
        report["flux"] = validate_flux(args.flux_path, args.flux_tokens)
    if args.dinov3_pth:
        report["dinov3"] = validate_dinov3(
            args.dinov3_pth, arch=args.dinov3_arch, probe_image=probe
        )

    worst = 0.0
    errored = []
    for name, comp in report.items():
        for stage_name, stage in comp.items():
            if isinstance(stage, dict) and "max_rel" in stage:
                worst = max(worst, stage["max_rel"])
            elif isinstance(stage, dict) and "error" in stage:
                errored.append(f"{name}.{stage_name}")
    report["worst_max_rel"] = worst
    # an errored stage was never compared — it must fail the report, not
    # silently drop out of `worst`
    report["errored_stages"] = errored
    report["passes_1e-3_target"] = bool(worst <= 1e-3 and not errored)
    out = json.dumps(report, indent=2)
    print(out)
    if args.report:
        with open(args.report, "w") as f:
            f.write(out)


if __name__ == "__main__":
    main()
