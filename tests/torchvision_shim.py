"""Faithful torchvision shim for reference-code imports (torchvision is
not installed in this image). Transforms math matches torchvision's
_functional_tensor semantics (needed by the Real-ESRGAN parity tests);
`ops`/`__version__` satisfy dinov3 detection's util/misc.py import.
Shared by test_degradation_reference_parity and test_detection — whoever
installs first must provide everything the other needs.
"""

import sys
import types

import numpy as np
import torch


def install_torchvision_shim():
    if "torchvision" in sys.modules:
        return

    def rgb_to_grayscale(img, num_output_channels=1):
        r, g, b = img.unbind(dim=-3)
        l_img = (0.2989 * r + 0.587 * g + 0.114 * b).to(img.dtype).unsqueeze(-3)
        if num_output_channels == 3:
            return l_img.expand(img.shape)
        return l_img

    def _blend(img1, img2, ratio):
        return (float(ratio) * img1 + (1.0 - float(ratio)) * img2).clamp(0, 1.0)

    def adjust_brightness(img, f):
        return _blend(img, torch.zeros_like(img), f)

    def adjust_contrast(img, f):
        mean = rgb_to_grayscale(img).mean((-3, -2, -1), keepdim=True)
        return _blend(img, mean, f)

    def adjust_saturation(img, f):
        return _blend(img, rgb_to_grayscale(img), f)

    def adjust_hue(img, f):
        # YIQ rotation (equivalent up to gamut clipping; unused by the
        # shipped config, which has color_jitter_prob=0)
        m = torch.tensor(
            [[0.299, 0.587, 0.114], [0.596, -0.274, -0.322], [0.211, -0.523, 0.312]],
            dtype=img.dtype,
        )
        yiq = torch.einsum("...chw,dc->...dhw", img, m)
        a = 2 * np.pi * float(f)
        rot = torch.tensor(
            [[1, 0, 0], [0, np.cos(a), -np.sin(a)], [0, np.sin(a), np.cos(a)]],
            dtype=img.dtype,
        )
        yiq = torch.einsum("...chw,dc->...dhw", yiq, rot)
        return torch.einsum("...chw,dc->...dhw", yiq, torch.linalg.inv(m)).clamp(0, 1)

    import importlib.machinery

    tv = types.ModuleType("torchvision")
    tr = types.ModuleType("torchvision.transforms")
    ft = types.ModuleType("torchvision.transforms._functional_tensor")
    fn = types.ModuleType("torchvision.transforms.functional")
    ft.rgb_to_grayscale = rgb_to_grayscale
    fn.rgb_to_grayscale = rgb_to_grayscale
    fn.adjust_brightness = adjust_brightness
    fn.adjust_contrast = adjust_contrast
    fn.adjust_saturation = adjust_saturation
    fn.adjust_hue = adjust_hue
    tv.transforms = tr
    tr._functional_tensor = ft
    tr.functional = fn
    tv.__version__ = "0.99.0-shim"
    ops = types.ModuleType("torchvision.ops")
    ops.misc = types.ModuleType("torchvision.ops.misc")
    tv.ops = ops

    # transforms.v2 functional (dinov3 detection windows.py): crop + resize
    v2 = types.ModuleType("torchvision.transforms.v2")
    v2fn = types.ModuleType("torchvision.transforms.v2.functional")

    def _crop(img, top, left, height, width):
        return img[..., top : top + height, left : left + width]

    def _resize(img, size):
        return torch.nn.functional.interpolate(
            img.float(), size=tuple(size), mode="bilinear", antialias=True
        ).to(img.dtype)

    v2fn.crop = _crop
    v2fn.resize = _resize
    v2.functional = v2fn
    tr.v2 = v2
    tv.transforms.v2 = v2
    for mod in (tv, tr, ft, fn, ops, ops.misc, v2, v2fn):
        # a registered module with __spec__=None breaks importlib.util
        # .find_spec for everyone else in the process (e.g. transformers'
        # availability probing in test_hf_text_parity)
        mod.__spec__ = importlib.machinery.ModuleSpec(mod.__name__, None)
        sys.modules[mod.__name__] = mod
