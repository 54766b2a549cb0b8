"""Host-side image IO + the reference's pre/post resize protocol.

Mirrors infer/infer_omgsr_s.py:69-107: optional min-side guard upscale,
x`upscale` enlargement, snap to a multiple of 8 with LANCZOS, and the final
resize-back when the guard triggered. PIL runs on host (not a hot path);
everything on-device is NHWC float.
"""

from __future__ import annotations

import numpy as np
from PIL import Image


def load_image_rgb(path: str) -> Image.Image:
    return Image.open(path).convert("RGB")


def prepare_input(img: Image.Image, process_size: int, upscale: int):
    """Returns (resized PIL image, resize_flag, original (w, h))."""
    ow, oh = img.size
    resize_flag = False
    if ow < process_size // upscale or oh < process_size // upscale:
        scale = (process_size // upscale) / min(ow, oh)
        img = img.resize((int(scale * ow), int(scale * oh)))
        resize_flag = True
    img = img.resize((img.size[0] * upscale, img.size[1] * upscale))
    new_w = img.width - img.width % 8
    new_h = img.height - img.height % 8
    img = img.resize((new_w, new_h), Image.LANCZOS)
    return img, resize_flag, (ow, oh)


def pil_to_array_pm1(img: Image.Image, dtype=np.float32) -> np.ndarray:
    """PIL -> (1, H, W, 3) in [-1, 1]."""
    arr = np.asarray(img, np.float32) / 255.0
    return (arr[None] * 2.0 - 1.0).astype(dtype)


def pil_to_array_01(img: Image.Image, dtype=np.float32) -> np.ndarray:
    return (np.asarray(img, np.float32) / 255.0)[None].astype(dtype)


def array01_to_pil(arr: np.ndarray) -> Image.Image:
    """(1,H,W,3) or (H,W,3) in [0,1] -> PIL (uint8, clipped)."""
    if arr.ndim == 4:
        arr = arr[0]
    arr = np.clip(np.asarray(arr, np.float32), 0.0, 1.0)
    return Image.fromarray((arr * 255.0).round().astype(np.uint8))


def finalize_output(out_pil: Image.Image, resize_flag: bool, orig_size, upscale: int) -> Image.Image:
    if resize_flag:
        ow, oh = orig_size
        out_pil = out_pil.resize((int(upscale * ow), int(upscale * oh)))
    return out_pil


def preprocess_sr_input(img: Image.Image, process_size: int, upscale: int, size_bucket: int):
    """The full SR input protocol shared by the batch runner and the serving
    daemon: pre-resize (reference infer/infer_omgsr_s.py:69-84), [-1,1] and
    [0,1] arrays, and reflect-pad up to the compile-shape bucket.

    Returns (lq (1,H,W,3) [-1,1] bucket-padded, src01, resize_flag,
    orig (w,h), true_hw before padding)."""
    inp, resize_flag, orig = prepare_input(img, process_size, upscale)
    lq = pil_to_array_pm1(inp)
    src01 = pil_to_array_01(inp)
    true_hw = lq.shape[1:3]
    if size_bucket:
        ph = (-lq.shape[1]) % size_bucket
        pw = (-lq.shape[2]) % size_bucket
        if ph or pw:
            lq = np.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")
    return lq, src01, resize_flag, orig, true_hw


def postprocess_sr_output(
    out_dev, src01, true_hw, fix_jit, resize_flag, orig_size, upscale: int,
    already01: bool = False,
) -> Image.Image:
    """Inverse protocol: crop the bucket pad, [-1,1]->[0,1], optional jitted
    color fix against src01, fetch, and undo the pre-resize. already01=True
    means the device batch is already color-fixed [0,1] (the serving
    daemon's fused graph) — only crop + fetch remain."""
    import jax  # deferred: keep this module importable without a backend

    out_dev = out_dev[:, : true_hw[0], : true_hw[1], :]
    if already01:
        out01 = out_dev.astype(np.float32)
    else:
        out01 = out_dev.astype(np.float32) * 0.5 + 0.5
        if fix_jit is not None:
            out01 = fix_jit(out01, src01)
    out01 = np.asarray(jax.block_until_ready(out01))
    out_pil = array01_to_pil(out01)
    return finalize_output(out_pil, resize_flag, orig_size, upscale)
