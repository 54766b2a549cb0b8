"""Degradation-stack tests: torch-parity goldens for resize/filter2d, DCT
identities for DiffJPEG, statistical checks for noise, pipeline smoke."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import yaml

from omgsr_tpu.data.degradation import RealESRGANDegrader, DegradationPlan, degrade, draw_plan
from omgsr_tpu.data.kernels import (
    KernelSynthesisConfig,
    bivariate_gaussian,
    circular_lowpass_kernel,
    random_kernels,
)
from omgsr_tpu.ops.diffjpeg import diffjpeg, quality_to_factor
from omgsr_tpu.ops.filters import filter2d, usm_sharp
from omgsr_tpu.ops.noise import add_gaussian_noise, add_poisson_noise
from omgsr_tpu.ops.resize import resize

OPT_PATH = "omgsr_tpu/configs/params_realesrgan.yml"


def _opt():
    with open(OPT_PATH) as f:
        return yaml.safe_load(f)


class TestResizeTorchParity:
    @pytest.mark.parametrize("mode", ["bilinear", "bicubic", "area"])
    @pytest.mark.parametrize("shape", [(17, 31, 9, 13), (8, 8, 16, 16), (20, 10, 15, 30)])
    def test_matches_torch(self, mode, shape):
        import torch
        import torch.nn.functional as TF

        ih, iw, oh, ow = shape
        rng = np.random.default_rng(0)
        x = rng.uniform(0, 1, (2, ih, iw, 3)).astype(np.float32)
        ours = np.asarray(resize(jnp.asarray(x), oh, ow, mode))
        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        ref = TF.interpolate(xt, size=(oh, ow), mode=mode).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=2e-5, err_msg=f"{mode} {shape}")


class TestFilter2D:
    def test_matches_torch_reflect(self):
        import torch
        import torch.nn.functional as TF

        rng = np.random.default_rng(1)
        x = rng.uniform(0, 1, (2, 12, 14, 3)).astype(np.float32)
        k = rng.uniform(0, 1, (2, 5, 5)).astype(np.float32)
        k /= k.sum(axis=(1, 2), keepdims=True)
        ours = np.asarray(filter2d(jnp.asarray(x), jnp.asarray(k)))

        xt = torch.from_numpy(x.transpose(0, 3, 1, 2))
        kt = torch.from_numpy(k)
        b, c, h, w = xt.shape
        pad = 2
        xp = TF.pad(xt, (pad, pad, pad, pad), mode="reflect")
        xg = xp.reshape(1, b * c, h + 4, w + 4)
        kg = kt.view(b, 1, 5, 5).repeat(1, c, 1, 1).view(b * c, 1, 5, 5)
        ref = TF.conv2d(xg, kg, groups=b * c).view(b, c, h, w).numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(ours, ref, atol=1e-5)

    def test_shared_kernel(self):
        x = jnp.ones((1, 8, 8, 3))
        k = jnp.ones((3, 3)) / 9.0
        out = filter2d(x, k)
        np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


class TestKernels:
    def test_gaussian_normalized_symmetric(self):
        k = bivariate_gaussian(21, 2.0)
        assert k.shape == (21, 21)
        np.testing.assert_allclose(k.sum(), 1.0, atol=1e-9)
        np.testing.assert_allclose(k, k.T, atol=1e-12)
        assert k[10, 10] == k.max()

    def test_sinc_kernel_matches_reference_formula(self):
        from scipy import special

        k = circular_lowpass_kernel(np.pi / 2, 7)
        np.testing.assert_allclose(k.sum(), 1.0, atol=1e-9)
        # center value before normalization: cutoff^2/(4pi); check relative
        # structure against direct formula at one off-center point
        cutoff = np.pi / 2
        r = np.sqrt(2.0)  # position (2,2) from center... radius sqrt(8)? use (3,2)->(0,-1): r=1
        raw_center = cutoff**2 / (4 * np.pi)
        raw_r1 = cutoff * special.j1(cutoff * 1.0) / (2 * np.pi * 1.0)
        np.testing.assert_allclose(k[3, 2] / k[3, 3], raw_r1 / raw_center, rtol=1e-6)

    def test_random_kernels_padded_shapes(self):
        opt = _opt()
        cfg = KernelSynthesisConfig.from_opt(opt, 512)
        rng = np.random.default_rng(0)
        for _ in range(10):
            k1, k2, sinc = random_kernels(rng, cfg)
            assert k1.shape == (21, 21) and k2.shape == (21, 21) and sinc.shape == (21, 21)
            np.testing.assert_allclose(k1.sum(), 1.0, atol=1e-5)
            np.testing.assert_allclose(sinc.sum(), 1.0, atol=1e-5)
        cfg2 = KernelSynthesisConfig.from_opt(opt, 1024)
        k1, _, _ = random_kernels(rng, cfg2)
        assert k1.shape == (41, 41)


class TestDiffJPEG:
    def test_quality_factor_table(self):
        # reference mapping (dataset/degradations.py:905-918)
        assert float(quality_to_factor(50.0)) == pytest.approx(1.0)
        assert float(quality_to_factor(100.0)) == pytest.approx(0.0)
        assert float(quality_to_factor(10.0)) == pytest.approx(5.0)
        assert float(quality_to_factor(95.0)) == pytest.approx(0.1)

    def test_high_quality_near_identity(self):
        # smooth image: chroma subsampling loss is small, so q=99 is near-
        # lossless (a per-pixel-noise image would be dominated by the 2x2
        # chroma averaging, as with real JPEG)
        rng = np.random.default_rng(2)
        base = rng.uniform(0.2, 0.8, (8, 8, 3))
        x = np.kron(base, np.ones((4, 4, 1)))[None].astype(np.float32)
        out = np.asarray(diffjpeg(jnp.asarray(x), 99.0))
        assert np.abs(out - x).mean() < 0.02

    def test_low_quality_degrades_more(self):
        rng = np.random.default_rng(3)
        base = rng.uniform(0, 1, (16, 16, 3))
        x = np.kron(base, np.ones((4, 4, 1)))[None].astype(np.float32)
        hi = np.asarray(diffjpeg(jnp.asarray(x), 95.0))
        lo = np.asarray(diffjpeg(jnp.asarray(x), 20.0))
        assert np.abs(lo - x).mean() > np.abs(hi - x).mean() * 1.5

    def test_nondivisible_sizes_pad(self):
        x = jnp.asarray(np.random.default_rng(4).uniform(0, 1, (2, 30, 47, 3)).astype(np.float32))
        out = diffjpeg(x, jnp.asarray([80.0, 40.0]))
        assert out.shape == x.shape

    def test_matches_real_jpeg_roughly(self):
        """DiffJPEG should land near PIL's actual JPEG at same quality."""
        import io

        from PIL import Image

        rng = np.random.default_rng(5)
        base = rng.uniform(0, 1, (16, 16, 3))
        # smooth image (JPEG-friendly)
        x = np.kron(base, np.ones((4, 4, 1)))[None].astype(np.float32)
        q = 75
        ours = np.asarray(diffjpeg(jnp.asarray(x), float(q)))[0]
        im = Image.fromarray((x[0] * 255).round().astype(np.uint8))
        buf = io.BytesIO()
        im.save(buf, "JPEG", quality=q)
        buf.seek(0)
        ref = np.asarray(Image.open(buf), np.float32) / 255.0
        # DiffJPEG deliberately differs slightly from libjpeg (nearest chroma
        # upsampling, no DC prediction — the reference notes the same vs cv2,
        # dataset/degradations.py:1327); require same ballpark, not equality
        assert np.abs(ours - ref).mean() < 0.08


class TestNoise:
    def test_gaussian_noise_statistics(self):
        x = jnp.full((4, 64, 64, 3), 0.5, jnp.float32)
        out = add_gaussian_noise(jax.random.key(0), x, (10.0, 10.0), gray_prob=0.0, clip=False)
        std = float(np.asarray(out - x).std())
        assert abs(std - 10.0 / 255.0) < 0.002

    def test_gray_noise_identical_channels(self):
        x = jnp.full((2, 32, 32, 3), 0.5, jnp.float32)
        out = np.asarray(
            add_gaussian_noise(jax.random.key(1), x, (15.0, 15.0), gray_prob=1.0, clip=False)
        )
        np.testing.assert_allclose(out[..., 0], out[..., 1], atol=1e-7)
        np.testing.assert_allclose(out[..., 0], out[..., 2], atol=1e-7)

    def test_poisson_noise_scales_with_vals(self):
        rng = np.random.default_rng(6)
        x = jnp.asarray(rng.uniform(0.1, 0.9, (2, 32, 32, 3)).astype(np.float32))
        out = add_poisson_noise(jax.random.key(2), x, (1.0, 1.0), gray_prob=0.0)
        d = np.abs(np.asarray(out) - np.asarray(x))
        assert 0.001 < d.mean() < 0.2  # shot noise present, bounded

    def test_poisson_unique_vals_histogram(self):
        from omgsr_tpu.ops.noise import _quantize_255, _unique_vals

        # image with exactly 3 distinct levels -> vals = 4
        x = jnp.asarray(np.array([0.0, 0.5, 1.0] * 100, np.float32).reshape(1, 10, 30, 1))
        v = float(_unique_vals(_quantize_255(x))[0])
        assert v == 4.0


class TestUSM:
    def test_usm_sharpens_edges(self):
        # unsaturated step edge (a 0/1 edge is a fixpoint: overshoot clips away)
        x = np.full((1, 64, 64, 3), 0.2, np.float32)
        x[:, :, 32:] = 0.8
        out = np.asarray(usm_sharp(jnp.asarray(x), radius=10))
        assert out.min() >= 0 and out.max() <= 1
        # overshoot: brighter than 0.8 just right of the edge, darker than
        # 0.2 just left of it
        assert out[:, :, 32:36].max() > 0.85
        assert out[:, :, 28:32].min() < 0.15


class TestPipeline:
    def test_degrader_end_to_end(self):
        opt = _opt()
        deg = RealESRGANDegrader(opt, resolution=512, size_snap=16, seed=0)
        rng = np.random.default_rng(7)
        hq = jnp.asarray(rng.uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
        gt, lq = deg(hq)
        assert np.asarray(gt).shape == (1, 128, 128, 3)
        assert np.asarray(lq).shape == (1, 128, 128, 3)  # resize_bak=True
        l = np.asarray(lq)
        assert np.isfinite(l).all() and l.min() >= 0 and l.max() <= 1
        # degradation actually changed the image
        assert np.abs(l - np.asarray(gt)).mean() > 0.005

    def test_degrader_no_resize_bak(self):
        opt = _opt()
        deg = RealESRGANDegrader(opt, resolution=512, size_snap=16, seed=1)
        hq = jnp.asarray(np.random.default_rng(8).uniform(0, 1, (1, 128, 128, 3)).astype(np.float32))
        _, lq = deg(hq, resize_bak=False)
        assert np.asarray(lq).shape == (1, 32, 32, 3)  # /4 for 512-res recipe

    def test_plan_determinism(self):
        opt = _opt()
        r1 = np.random.default_rng(3)
        r2 = np.random.default_rng(3)
        p1 = draw_plan(r1, {**opt, "scale": 4}, 128, 128, 4, True, 16)
        p2 = draw_plan(r2, {**opt, "scale": 4}, 128, 128, 4, True, 16)
        assert p1 == p2


class TestPairedLoader:
    def _make_ds(self, tmp_path, n=5, res=64):
        from PIL import Image

        from omgsr_tpu.data.dataset import PairedDataset

        rng = np.random.default_rng(9)
        for i in range(n):
            arr = rng.integers(0, 255, (96, 96, 3), dtype=np.uint8)
            Image.fromarray(arr).save(tmp_path / f"im{i}.png")
        return PairedDataset([str(tmp_path)], resolution=res)

    def test_pipelined_iteration_yields_all_batches(self, tmp_path):
        """The one-deep device pipeline must yield every batch exactly once
        (incl. the final pending one) as device arrays in [-1,1]."""
        from omgsr_tpu.data.dataset import PairedLoader

        ds = self._make_ds(tmp_path, n=5)
        deg = RealESRGANDegrader(_opt(), resolution=512, size_snap=16, seed=2)
        loader = PairedLoader(ds, batch_size=2, degrader=deg, seed=0)
        batches = list(loader)
        assert len(batches) == len(loader) == 2  # drop_last on 5 items
        for b in batches:
            assert b["hq"].shape == (2, 64, 64, 3)
            assert b["lq"].shape == (2, 64, 64, 3)
            assert isinstance(b["lq"], jnp.ndarray)  # stays on device
            lq = np.asarray(b["lq"])
            assert np.isfinite(lq).all() and lq.min() >= -1.001 and lq.max() <= 1.001

    def test_identity_loader_without_degrader(self, tmp_path):
        from omgsr_tpu.data.dataset import PairedLoader

        ds = self._make_ds(tmp_path, n=2)
        loader = PairedLoader(ds, batch_size=2, degrader=None, shuffle=False)
        (batch,) = list(loader)
        np.testing.assert_allclose(
            np.asarray(batch["lq"]), np.asarray(batch["hq"])
        )
