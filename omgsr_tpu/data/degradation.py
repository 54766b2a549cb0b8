"""Real-ESRGAN two-stage degradation pipeline, TPU-jitted.

Re-implements RealESRGAN_degradation.degrade_process
(dataset/realesrgan.py:203-314):

  stage 1: blur(kernel1) -> random resize (area|bilinear|bicubic, scale
  U[0.3,1.5]) -> gaussian|poisson noise -> DiffJPEG;
  stage 2: blur(kernel2, p=0.5) -> random resize toward 1/sf -> noise ->
  {JPEG then [resize-back+sinc]} or {[resize-back+sinc] then JPEG} (p=0.5);
  optional grayscale / color jitter; optional resize back to full res;
  final uint8 round-trip emulation (clamp(round(x*255))/255).

TPU split of responsibilities:
  * structure decisions (branch taken, resize modes, intermediate sizes) are
    drawn on HOST into a DegradationPlan — they select the traced graph;
  * heavy tensor work (filter2d, matmul-resizes, noise, DiffJPEG) runs
    jitted on device with JAX PRNG.

Intermediate sizes can be snapped to a multiple (size_snap) to bound the
number of distinct compiled graphs; snap=1 reproduces the reference's exact
sizes.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from omgsr_tpu.data.kernels import KernelSynthesisConfig, random_kernels
from omgsr_tpu.ops.diffjpeg import diffjpeg
from omgsr_tpu.ops.filters import filter2d
from omgsr_tpu.ops.noise import add_gaussian_noise, add_poisson_noise
from omgsr_tpu.ops.resize import resize

_MODES = ("area", "bilinear", "bicubic")


@dataclass(frozen=True)
class DegradationPlan:
    """Host-drawn per-batch structure decisions (hashable -> jit static)."""

    size1: tuple  # stage-1 resize target (h, w)
    mode1: str
    gaussian1: bool
    second_blur: bool
    size2: tuple  # stage-2 resize target (h, w)
    mode2: str
    gaussian2: bool
    resize_then_jpeg: bool  # order of [resize-back+sinc] vs JPEG
    final_mode: str
    gray: bool
    jitter: bool
    jitter_order: tuple  # permutation of (brightness, contrast, saturation, hue)
    resize_bak: bool
    bak_mode: str


def _snap(v: int, snap: int) -> int:
    if snap <= 1:
        return max(1, v)
    return max(snap, round(v / snap) * snap)


def draw_plan(
    rng: np.random.Generator,
    opt: dict,
    h: int,
    w: int,
    scale_factor: int,
    resize_bak: bool,
    size_snap: int = 1,
) -> DegradationPlan:
    """Draw the branch structure, mirroring the reference's host randomness
    (dataset/realesrgan.py:218-312)."""

    def rand_scale(prob, rng_range):
        t = rng.choice(["up", "down", "keep"], p=np.asarray(prob) / np.sum(prob))
        if t == "up":
            return rng.uniform(1, rng_range[1])
        if t == "down":
            return rng.uniform(rng_range[0], 1)
        return 1.0

    s1 = rand_scale(opt["resize_prob"], opt["resize_range"])
    size1 = (_snap(int(h * s1), size_snap), _snap(int(w * s1), size_snap))
    s2 = rand_scale(opt["resize_prob2"], opt["resize_range2"])
    size2 = (
        _snap(int(h / scale_factor * s2), size_snap),
        _snap(int(w / scale_factor * s2), size_snap),
    )
    return DegradationPlan(
        size1=size1,
        mode1=str(rng.choice(_MODES)),
        gaussian1=bool(rng.uniform() < opt["gaussian_noise_prob"]),
        second_blur=bool(rng.uniform() < opt["second_blur_prob"]),
        size2=size2,
        mode2=str(rng.choice(_MODES)),
        gaussian2=bool(rng.uniform() < opt["gaussian_noise_prob2"]),
        resize_then_jpeg=bool(rng.uniform() < 0.5),
        final_mode=str(rng.choice(_MODES)),
        gray=bool(rng.uniform() < opt.get("gray_prob", 0.0)),
        jitter=bool(rng.uniform() < opt.get("color_jitter_prob", 0.0)),
        jitter_order=tuple(int(i) for i in rng.permutation(4)),
        resize_bak=resize_bak,
        bak_mode=str(rng.choice(_MODES)),
    )


def _color_jitter(key, img, order=(0, 1, 2, 3), brightness=(0.5, 1.5), contrast=(0.5, 1.5), saturation=(0, 1.5), hue=(-0.1, 0.1)):
    """torchvision-style jitter applied in host-shuffled ``order``
    (reference shuffles per call via randperm, dataset/realesrgan.py:101-119)."""
    kb, kc, ks, kh = jax.random.split(key, 4)

    def do_brightness(img):
        f = jax.random.uniform(kb, (), jnp.float32, *brightness)
        return jnp.clip(img * f, 0, 1)

    def do_contrast(img):
        f = jax.random.uniform(kc, (), jnp.float32, *contrast)
        gray = (img * jnp.asarray([0.2989, 0.587, 0.114])).sum(-1, keepdims=True)
        return jnp.clip(gray.mean((1, 2, 3), keepdims=True) * (1 - f) + img * f, 0, 1)

    def do_saturation(img):
        f = jax.random.uniform(ks, (), jnp.float32, *saturation)
        gray = (img * jnp.asarray([0.2989, 0.587, 0.114])).sum(-1, keepdims=True)
        return jnp.clip(gray * (1 - f) + img * f, 0, 1)

    def do_hue(img):
        f = jax.random.uniform(kh, (), jnp.float32, *hue) * 2 * math.pi
        yiq = jnp.einsum(
            "bhwc,cd->bhwd", img,
            jnp.asarray([[0.299, 0.596, 0.211], [0.587, -0.274, -0.523], [0.114, -0.322, 0.312]], jnp.float32),
        )
        cosf, sinf = jnp.cos(f), jnp.sin(f)
        rot = jnp.stack(
            [jnp.asarray([1.0, 0, 0]), jnp.stack([jnp.zeros(()), cosf, -sinf]), jnp.stack([jnp.zeros(()), sinf, cosf])]
        )
        yiq = jnp.einsum("bhwc,cd->bhwd", yiq, rot.T)
        img = jnp.einsum(
            "bhwc,cd->bhwd", yiq,
            jnp.asarray([[1.0, 1.0, 1.0], [0.956, -0.272, -1.106], [0.621, -0.647, 1.703]], jnp.float32),
        )
        return jnp.clip(img, 0, 1)

    fns = [do_brightness, do_contrast, do_saturation, do_hue]
    for i in order:
        img = fns[i](img)
    return img


def degrade(img_gt, kernels, key, plan: DegradationPlan, opt: dict):
    """img_gt (B, H, W, 3) in [0,1] -> img_lq per the plan. Jit with
    plan/opt-derived statics via functools.partial."""
    k1, k2, sinc = kernels
    keys = jax.random.split(key, 6)
    out = img_gt

    # ---- stage 1 ----
    out = filter2d(out, k1)
    out = resize(out, *plan.size1, plan.mode1)
    if plan.gaussian1:
        out = add_gaussian_noise(keys[0], out, opt["noise_range"], opt["gray_noise_prob"])
    else:
        out = add_poisson_noise(keys[0], out, opt["poisson_scale_range"], opt["gray_noise_prob"])
    q = jax.random.uniform(keys[1], (out.shape[0],), jnp.float32, *opt["jpeg_range"])
    out = diffjpeg(jnp.clip(out, 0, 1), q)

    # ---- stage 2 ----
    if plan.second_blur:
        out = filter2d(out, k2)
    out = resize(out, *plan.size2, plan.mode2)
    if plan.gaussian2:
        out = add_gaussian_noise(keys[2], out, opt["noise_range2"], opt["gray_noise_prob2"])
    else:
        out = add_poisson_noise(keys[2], out, opt["poisson_scale_range2"], opt["gray_noise_prob2"])

    h, w = img_gt.shape[1:3]
    final_size = (h // opt["scale"], w // opt["scale"])
    if plan.resize_then_jpeg:
        out = resize(out, *final_size, plan.final_mode)
        out = filter2d(out, sinc)
        q = jax.random.uniform(keys[3], (out.shape[0],), jnp.float32, *opt["jpeg_range2"])
        out = diffjpeg(jnp.clip(out, 0, 1), q)
    else:
        q = jax.random.uniform(keys[3], (out.shape[0],), jnp.float32, *opt["jpeg_range2"])
        out = diffjpeg(jnp.clip(out, 0, 1), q)
        out = resize(out, *final_size, plan.final_mode)
        out = filter2d(out, sinc)

    if plan.gray:
        g = (out * jnp.asarray([0.2989, 0.587, 0.114], out.dtype)).sum(-1, keepdims=True)
        out = jnp.broadcast_to(g, out.shape)  # reference returns 1ch (would
        # break its own trainer); replicated to 3ch here
    if plan.jitter:
        out = _color_jitter(keys[4], out, plan.jitter_order)

    if plan.resize_bak:
        out = resize(out, h, w, plan.bak_mode)

    # uint8 round-trip emulation (dataset/realesrgan.py:312)
    return jnp.clip(jnp.round(out * 255.0), 0, 255) / 255.0


class RealESRGANDegrader:
    """Stateful convenience wrapper: host RNG for structure + kernels, JAX
    PRNG for on-device noise; jit-cached per plan structure."""

    def __init__(self, opt: dict, resolution: int = 512, size_snap: int = 16, seed: int = 0):
        import functools

        self.opt = dict(opt)
        self.opt["scale"] = 4 if resolution == 512 else 8
        self.kcfg = KernelSynthesisConfig.from_opt(opt, resolution)
        self.rng = np.random.default_rng(seed)
        self.size_snap = size_snap
        self._degrade = functools.lru_cache(maxsize=None)(self._build)

    def _build(self, plan: DegradationPlan):
        import functools

        opt = self.opt
        return jax.jit(functools.partial(degrade, plan=plan, opt=opt))

    def __call__(self, img_gt, key=None, resize_bak: bool = True):
        """img_gt (B,H,W,3) [0,1] -> (img_gt, img_lq), like degrade_process
        (dataset/realesrgan.py:204)."""
        b, h, w, _ = img_gt.shape
        ks = [random_kernels(self.rng, self.kcfg) for _ in range(b)]
        kernels = tuple(jnp.stack([k[i] for k in ks]) for i in range(3))
        plan = draw_plan(
            self.rng, self.opt, h, w, self.kcfg.scale_factor, resize_bak, self.size_snap
        )
        if key is None:
            key = jax.random.key(int(self.rng.integers(0, 2**31)))
        img_lq = self._degrade(plan)(img_gt, kernels, key)
        return img_gt, img_lq
