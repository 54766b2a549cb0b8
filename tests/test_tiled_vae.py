import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omgsr_tpu.inference.tiled_vae import (
    exact_vae_decode,
    exact_vae_encode,
    sharded_vae_decode,
    sharded_vae_encode,
    streaming_vae_decode,
    streaming_vae_encode,
)
from omgsr_tpu.models import vae as V
from tests.test_models import TINY_FLUX_VAE, TINY_VAE


@pytest.fixture(scope="module")
def vae_params():
    return V.init_vae(jax.random.key(0), TINY_VAE)


class TestShardedVAE:
    def test_decode_exact_vs_unsharded(self, vae_params):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from omgsr_tpu.parallel import create_mesh

        mesh = create_mesh({"data": 8})
        z = jax.random.normal(jax.random.key(1), (1, 16, 24, 4)) * 0.2
        ref = V.vae_decode(vae_params, TINY_VAE, z)
        out = sharded_vae_decode(vae_params, TINY_VAE, z, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)

    def test_encode_exact_vs_unsharded(self, vae_params):
        if len(jax.devices()) < 8:
            pytest.skip("needs 8 virtual devices")
        from omgsr_tpu.parallel import create_mesh

        mesh = create_mesh({"data": 8})
        x = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 64, 32, 3)))
        ref = V.vae_encode(vae_params, TINY_VAE, x, rng=None)
        out = sharded_vae_encode(vae_params, TINY_VAE, x, mesh)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5, rtol=1e-4)


class TestStreamingVAE:
    def test_decode_exact_with_exact_stats_no_attention(self):
        """With full-size stat collection and no mid-block attention (the
        only global op besides GroupNorm), tiled streaming must reproduce
        the untiled decode exactly — validates window/crop/halo logic."""
        from omgsr_tpu.models.configs import VAEConfig

        cfg = VAEConfig(
            block_out_channels=(8, 16), norm_num_groups=4, latent_channels=4,
            mid_block_attention=False,
        )
        p = V.init_vae(jax.random.key(0), cfg)
        z = jax.random.normal(jax.random.key(3), (1, 40, 48, 4)) * 0.2
        ref = np.asarray(V.vae_decode(p, cfg, z))
        out = np.asarray(
            streaming_vae_decode(p, cfg, z, tile=16, pad=11, est_size=48)
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_encode_exact_with_exact_stats_no_attention(self):
        from omgsr_tpu.models.configs import VAEConfig

        cfg = VAEConfig(
            block_out_channels=(8, 16), norm_num_groups=4, latent_channels=4,
            mid_block_attention=False,
        )
        p = V.init_vae(jax.random.key(0), cfg)
        x = jnp.tanh(jax.random.normal(jax.random.key(4), (1, 160, 128, 3)))
        ref = np.asarray(V.vae_encode(p, cfg, x, rng=None))
        out = np.asarray(
            streaming_vae_encode(p, cfg, x, tile=64, pad=32, est_size=160)
        )
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_decode_fast_mode_bounded(self, vae_params):
        """Downsampled-stat fast mode (vaehook :714-735 analogue): result
        stays in the right ballpark; per-tile mid attention is local, as in
        the reference."""
        z = jax.random.normal(jax.random.key(3), (1, 40, 48, 4)) * 0.2
        ref = np.asarray(V.vae_decode(vae_params, TINY_VAE, z))
        out = np.asarray(
            streaming_vae_decode(vae_params, TINY_VAE, z, tile=16, pad=8, est_size=24)
        )
        assert out.shape == ref.shape
        assert np.isfinite(out).all()
        # no numeric bound at raw random init (it amplifies the distribution
        # shift arbitrarily); the quantitative bound lives in
        # test_decode_fast_mode_error_bounded_on_smooth_fixture

    def test_decode_fast_mode_error_bounded_on_smooth_fixture(self):
        """Quantitative fast-mode accuracy on a pretrained-like fixture:
        conv kernels damped toward identity-scale responses and a smooth
        low-frequency latent (the regime the downsampled-stat estimate is
        designed for, vaehook :714-735). The fast streaming decode must stay
        within a small fraction of the untiled output's dynamic range."""
        from omgsr_tpu.models.configs import VAEConfig

        cfg = VAEConfig(
            block_out_channels=(8, 16), norm_num_groups=4, latent_channels=4,
            mid_block_attention=False,
        )
        p = V.init_vae(jax.random.key(11), cfg)
        # damp conv responses: pretrained VAEs have near-unit-gain blocks,
        # random kaiming init does not
        p = jax.tree.map(lambda x: x * 0.3 if x.ndim == 4 else x, p)
        # smooth latent: upsampled low-resolution noise
        low = jax.random.normal(jax.random.key(12), (1, 5, 6, 4)) * 0.5
        z = jax.image.resize(low, (1, 40, 48, 4), "cubic")

        ref = np.asarray(V.vae_decode(p, cfg, z))
        out = np.asarray(
            streaming_vae_decode(p, cfg, z, tile=16, pad=8, est_size=24)
        )
        scale = np.abs(ref).max() + 1e-6
        d = np.abs(out - ref) / scale
        # measured on this fixture: mean 0.028, q99 0.24 (isolated seam
        # pixels reach ~0.47 — the downsampled estimate is approximate by
        # design, vaehook :714); bounds carry ~1.5x margin and fail loudly
        # on catastrophic stat drift, which is O(1) everywhere
        assert d.mean() < 0.05, f"mean rel err {d.mean():.4f}"
        assert np.quantile(d, 0.99) < 0.35, f"q99 rel err {np.quantile(d, 0.99):.4f}"

    def test_decode_fast_mode_error_bounded_on_pink_noise_fixture(self):
        """Quantitative fast-mode accuracy on a ROUGH fixture: 1/f-spectrum
        ("pink") latent noise, the natural-image-like regime where the
        nearest-resize + moment-renormalization correction (vaehook.py
        :719-731) matters. Without the correction this fixture measures mean
        rel err ~0.19 / q99 ~1.0 (r2 code, measured); with it, mean 0.019 /
        q99 0.12 at downsample ratio 4 — bounds carry ~2x margin."""
        from omgsr_tpu.models.configs import VAEConfig

        cfg = VAEConfig(
            block_out_channels=(8, 16), norm_num_groups=4, latent_channels=4,
            mid_block_attention=False,
        )
        p = V.init_vae(jax.random.key(11), cfg)
        p = jax.tree.map(lambda x: x * 0.3 if x.ndim == 4 else x, p)

        rng = np.random.default_rng(777)
        h = w = 96
        fy = np.fft.fftfreq(h)[:, None]
        fx = np.fft.fftfreq(w)[None, :]
        f = np.sqrt(fy * fy + fx * fx)
        f[0, 0] = 1.0
        spec = (rng.normal(size=(h, w, 4)) + 1j * rng.normal(size=(h, w, 4))) / f[..., None]
        img = np.fft.ifft2(spec, axes=(0, 1)).real
        img = (img - img.mean((0, 1))) / (img.std((0, 1)) + 1e-9)
        z = jnp.asarray(img[None].astype(np.float32)) * 0.5

        ref = np.asarray(V.vae_decode(p, cfg, z))
        out = np.asarray(
            streaming_vae_decode(p, cfg, z, tile=16, pad=8, est_size=24)
        )
        scale = np.abs(ref).max() + 1e-6
        d = np.abs(out - ref) / scale
        assert d.mean() < 0.04, f"mean rel err {d.mean():.4f}"
        assert np.quantile(d, 0.99) < 0.25, f"q99 rel err {np.quantile(d, 0.99):.4f}"

    def test_auto_stats_dispatch(self, vae_params):
        """auto = fast within AUTO_EXACT_RATIO, exact beyond it."""
        from omgsr_tpu.inference import tiled_vae as TV

        z = jax.random.normal(jax.random.key(9), (1, 40, 48, 4)) * 0.2
        # ratio 48/24 = 2 <= 4 -> fast path
        fast = np.asarray(
            streaming_vae_decode(vae_params, TINY_VAE, z, tile=16, pad=8, est_size=24)
        )
        auto = np.asarray(
            streaming_vae_decode(
                vae_params, TINY_VAE, z, tile=16, pad=8, est_size=24, stats="auto"
            )
        )
        np.testing.assert_allclose(auto, fast, atol=1e-6, rtol=1e-6)
        # ratio 48/8 = 6 > 4 -> escalates to exact
        auto_hi = np.asarray(
            streaming_vae_decode(
                vae_params, TINY_VAE, z, tile=16, pad=8, est_size=8, stats="auto"
            )
        )
        exact = np.asarray(TV.exact_vae_decode(vae_params, TINY_VAE, z))
        np.testing.assert_allclose(auto_hi, exact, atol=1e-6, rtol=1e-6)

    def test_decode_nondivisible_size(self, vae_params):
        z = jax.random.normal(jax.random.key(5), (1, 21, 13, 4)) * 0.2
        out = streaming_vae_decode(vae_params, TINY_VAE, z, tile=8, pad=4, est_size=16)
        assert out.shape == (1, 42, 26, 3)
        assert np.isfinite(np.asarray(out)).all()

    def test_hook_restored_after_use(self, vae_params):
        from omgsr_tpu.models import vae as vm

        z = jax.random.normal(jax.random.key(6), (1, 16, 16, 4)) * 0.2
        streaming_vae_decode(vae_params, TINY_VAE, z, tile=8, pad=4, est_size=16)
        assert vm._GN_HOOK is None


class TestExactVAE:
    """Single-chip exact mode (vaehook's DEFAULT per-tile-stat path,
    infer/vaehook.py:459-534): GroupNorm statistics are accumulated over row
    chunks of stored boundary buffers, so the result must equal untiled
    execution to float tolerance — including mid-block attention, which is
    applied globally."""

    def test_decode_matches_untiled_with_attention(self, vae_params):
        z = jax.random.normal(jax.random.key(3), (1, 24, 40, 4)) * 0.2
        ref = np.asarray(V.vae_decode(vae_params, TINY_VAE, z))
        # stat_rows=5 on 24..48-row buffers -> many non-divisible chunks:
        # exercises the partition-sum accumulation, not full-buffer stats
        out = np.asarray(exact_vae_decode(vae_params, TINY_VAE, z, stat_rows=5))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_encode_matches_untiled_with_attention(self, vae_params):
        x = jnp.tanh(jax.random.normal(jax.random.key(4), (1, 96, 64, 3)))
        ref = np.asarray(V.vae_encode(vae_params, TINY_VAE, x, rng=None))
        out = np.asarray(exact_vae_encode(vae_params, TINY_VAE, x, stat_rows=7))
        assert out.shape == ref.shape
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_flux_style_cfg_encode(self):
        """shift_factor path + no quant convs (FLUX VAE layout)."""
        p = V.init_vae(jax.random.key(7), TINY_FLUX_VAE)
        x = jnp.tanh(jax.random.normal(jax.random.key(8), (1, 64, 48, 3)))
        ref = np.asarray(V.vae_encode(p, TINY_FLUX_VAE, x, rng=None))
        out = np.asarray(exact_vae_encode(p, TINY_FLUX_VAE, x, stat_rows=9))
        np.testing.assert_allclose(out, ref, atol=1e-4, rtol=1e-4)

    def test_streaming_entry_dispatch(self, vae_params):
        z = jax.random.normal(jax.random.key(9), (1, 16, 24, 4)) * 0.2
        ref = np.asarray(streaming_vae_decode(vae_params, TINY_VAE, z, stats="exact"))
        via_exact = np.asarray(exact_vae_decode(vae_params, TINY_VAE, z))
        np.testing.assert_allclose(ref, via_exact, atol=1e-6, rtol=1e-6)
        with pytest.raises(ValueError):
            streaming_vae_decode(vae_params, TINY_VAE, z, stats="bogus")
        with pytest.raises(ValueError):
            streaming_vae_encode(
                vae_params, TINY_VAE, jnp.zeros((1, 32, 32, 3)), stats="bogus"
            )


class TestAutoRouting:
    def test_wants_exact_path_auto_threshold(self):
        from omgsr_tpu.inference.vae_routing import wants_exact_path

        img_small = jnp.zeros((1, 128, 128, 3))
        img_big = jnp.zeros((1, 640, 640, 3))
        # ratio 128/64 = 2 <= 4: stay on the jitted fast path
        assert not wants_exact_path("auto", 64, img_small)
        # ratio 640/64 = 10 > 4: escalate to the host exact path
        assert wants_exact_path("auto", 64, img_big)
        # explicit modes unchanged
        assert wants_exact_path("exact", 64, img_small)
        assert not wants_exact_path("fast", 64, img_big)
        # no tiling -> never exact-path
        assert not wants_exact_path("auto", None, img_big)
        assert not wants_exact_path("auto", 256, img_small)

    def test_pipeline_accepts_auto(self, vae_params):
        """End-to-end: a pipeline constructed with vae_stats="auto" runs the
        fast streaming path under the ratio threshold and matches the
        explicit fast configuration."""
        from omgsr_tpu.inference.pipeline_s import OMGSRSPipeline
        from tests.test_models import TINY_UNET
        from omgsr_tpu.models import unet_sd as U

        up = U.init_unet(jax.random.key(1), TINY_UNET)
        lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 96, 96, 3)))
        mk = lambda stats: OMGSRSPipeline(  # noqa: E731
            vae_params, up, TINY_VAE, TINY_UNET,
            vae_tile=64, vae_stats=stats,
        )
        fast = np.asarray(mk("fast")(lq, jnp.zeros((1, 7, 16)), tile_size=8, tile_overlap=4))
        auto = np.asarray(mk("auto")(lq, jnp.zeros((1, 7, 16)), tile_size=8, tile_overlap=4))
        np.testing.assert_allclose(auto, fast, atol=1e-5, rtol=1e-5)


class TestReviewRegressions:
    def test_streaming_tiles_wide_aspect_one_axis(self, vae_params):
        """max()-gated routing sends 1-axis-large inputs here: a dim that
        fits one window spans whole, the long dim tiles (bounded memory)."""
        z = jax.random.normal(jax.random.key(5), (1, 16, 96, 4))
        ref = np.asarray(V.vae_decode(vae_params, TINY_VAE, z))
        out = np.asarray(
            streaming_vae_decode(vae_params, TINY_VAE, z, tile=16, pad=8, est_size=24)
        )
        assert out.shape == ref.shape
        assert np.isfinite(out).all()
        assert np.abs(out - ref).mean() < 0.1  # fast-stats tolerance

    def test_streaming_encode_sampling_not_periodic(self, vae_params):
        """Per-tile rng fold: a CONSTANT input must not produce bit-identical
        noise patches tile-to-tile (the pre-fix behavior: same key + same
        window shape -> one repeated noise patch across the latent)."""
        x = jnp.ones((1, 32, 96, 3))
        z = np.asarray(
            streaming_vae_encode(
                vae_params, TINY_VAE, x, rng=jax.random.key(3), sample=True,
                tile=16, pad=8, est_size=24,
            )
        )
        lt = 16 // TINY_VAE.downscale  # latent tile extent
        patches = [z[0, :, i * lt : (i + 1) * lt, :] for i in range(z.shape[2] // lt)]
        diffs = [np.abs(patches[i] - patches[i + 1]).max() for i in range(len(patches) - 1)]
        assert min(diffs) > 0.0

    def test_routing_gates_on_max_dim(self):
        from omgsr_tpu.inference.vae_routing import wants_exact_path

        wide = np.zeros((1, 256, 2048, 3))
        # min() gating would skip tiling entirely (256 is not > 256)
        assert wants_exact_path("exact", 256, wide)
        small = np.zeros((1, 256, 256, 3))
        assert not wants_exact_path("exact", 256, small)
