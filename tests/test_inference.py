import jax
import jax.numpy as jnp
import numpy as np
import pytest

from omgsr_tpu.inference.pipeline_f import OMGSRFPipeline
from omgsr_tpu.inference.pipeline_s import OMGSRSPipeline
from omgsr_tpu.inference.tiled import tiled_denoise
from omgsr_tpu.models import flux as F
from omgsr_tpu.models import unet_sd as U
from omgsr_tpu.models import vae as V
from omgsr_tpu.ops.color import adain_color_fix, wavelet_color_fix, wavelet_decomposition
from tests.test_models import TINY_FLUX, TINY_FLUX_VAE, TINY_UNET, TINY_VAE


class TestTiledDenoise:
    def test_identity_denoiser_reconstructs_input(self):
        """With denoise=identity, stitching must reproduce the latent exactly
        (weights cancel through the contributor normalization)."""
        x = jax.random.normal(jax.random.key(0), (1, 24, 40, 4))
        out = jax.jit(lambda x: tiled_denoise(x, lambda t: t, 16, 8, tile_batch=3))(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x), rtol=1e-5, atol=1e-5)

    def test_no_tile_path(self):
        x = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
        out = tiled_denoise(x, lambda t: t * 2.0, 16, 8)
        np.testing.assert_allclose(np.asarray(out), np.asarray(x) * 2, rtol=1e-6)

    def test_linear_denoiser_matches_untiled(self):
        """A pointwise denoiser must commute with tiling+stitching."""
        x = jax.random.normal(jax.random.key(1), (1, 32, 48, 4))
        f = lambda t: jnp.tanh(t) * 0.5 + t
        tiled = tiled_denoise(x, f, 16, 8, tile_batch=2)
        np.testing.assert_allclose(np.asarray(tiled), np.asarray(f(x)), rtol=1e-4, atol=1e-5)

    def test_matches_reference_stitch_algorithm(self):
        """Compare against a direct numpy transcription of the reference's
        gather/stitch loop (infer/omgsr_s_infer_model.py:88-161) with a
        non-trivial (but tile-local) denoiser."""
        from omgsr_tpu.diffusion.tiling import gaussian_tile_weights, tile_grid_2d

        rng = np.random.default_rng(0)
        x = rng.normal(size=(1, 24, 40, 4)).astype(np.float32)
        t, ov = 16, 8

        def denoise_np(tile):  # tile (1,t,t,C)
            return np.tanh(tile) + 0.25 * tile

        grid = tile_grid_2d(24, 40, t, ov)
        w = gaussian_tile_weights(t, t)[None, :, :, None]
        acc = np.zeros_like(x)
        con = np.zeros_like(x)
        for y, xx in grid:
            tile = x[:, y : y + t, xx : xx + t, :]
            acc[:, y : y + t, xx : xx + t, :] += denoise_np(tile) * w
            con[:, y : y + t, xx : xx + t, :] += w
        expected = acc / con

        ours = tiled_denoise(
            jnp.asarray(x), lambda tt: jnp.tanh(tt) + 0.25 * tt, t, ov, tile_batch=4
        )
        np.testing.assert_allclose(np.asarray(ours), expected, rtol=1e-4, atol=1e-5)

    def test_auto_tile_batch_divisors(self):
        from omgsr_tpu.inference.tiled import auto_tile_batch

        assert auto_tile_batch(9) == 3
        assert auto_tile_batch(49) == 7
        assert auto_tile_batch(16) == 8
        assert auto_tile_batch(4) == 4
        # prime: padded fallback picks the least-waste batch (13 -> tb 7
        # pads 1 tile; the old hardcoded 4 padded 3)
        assert auto_tile_batch(13) == 7
        assert auto_tile_batch(11) == 6  # 11 -> 6 pads 1; ties to larger tb
        assert auto_tile_batch(5) == 5  # n <= cap is its own divisor
        assert auto_tile_batch(2) == 2
        assert auto_tile_batch(1) == 1

    def test_flux_auto_tile_batch_token_aware(self):
        from omgsr_tpu.inference.pipeline_f import flux_auto_tile_batch

        # -F tile 128 + T5 len 512 -> seq 4608: compute-dense, batch 1
        # (measured: tb1 5.44 s vs tb3 6.11 s on the 12B 2048 protocol)
        assert flux_auto_tile_batch(128, 512) == 1
        # tile 64 + 512 -> seq 1536: defer to the divisor heuristic
        assert flux_auto_tile_batch(64, 512) is None

    def test_auto_tile_batch_matches_explicit(self):
        x = jax.random.normal(jax.random.key(3), (1, 32, 48, 4))
        f = lambda t: jnp.tanh(t) + 0.25 * t
        auto = tiled_denoise(x, f, 16, 8, tile_batch=None)
        explicit = tiled_denoise(x, f, 16, 8, tile_batch=3)
        np.testing.assert_allclose(np.asarray(auto), np.asarray(explicit), rtol=1e-5, atol=1e-6)

    def test_image_batch_matches_per_image(self):
        """B>1: the cross-image tile list must give the same result as
        running each image alone (same-bucket serving batches)."""
        x = jax.random.normal(jax.random.key(2), (3, 24, 40, 4))
        f = lambda t: jnp.tanh(t) + 0.25 * t
        batched = tiled_denoise(x, f, 16, 8, tile_batch=4)
        singles = jnp.concatenate(
            [tiled_denoise(x[i : i + 1], f, 16, 8, tile_batch=4) for i in range(3)]
        )
        np.testing.assert_allclose(
            np.asarray(batched), np.asarray(singles), rtol=1e-4, atol=1e-5
        )


class TestPipelines:
    def test_omgsr_s_pipeline(self):
        vp = V.init_vae(jax.random.key(0), TINY_VAE)
        up = U.init_unet(jax.random.key(1), TINY_UNET)
        pipe = OMGSRSPipeline(vp, up, TINY_VAE, TINY_UNET, mid_timestep=273, tile_batch=2)
        lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 96, 64, 3)))
        ctx = jax.random.normal(jax.random.key(3), (1, 7, 16))
        out = pipe(lq, ctx, tile_size=16, tile_overlap=8)
        assert out.shape == lq.shape
        o = np.asarray(out)
        assert np.isfinite(o).all() and o.min() >= -1 and o.max() <= 1

    def test_omgsr_s_no_tile_equals_tile_when_small(self):
        vp = V.init_vae(jax.random.key(0), TINY_VAE)
        up = U.init_unet(jax.random.key(1), TINY_UNET)
        pipe = OMGSRSPipeline(vp, up, TINY_VAE, TINY_UNET)
        lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 32, 32, 3)))
        ctx = jax.random.normal(jax.random.key(3), (1, 7, 16))
        a = pipe(lq, ctx, tile_size=16, tile_overlap=8)  # latent is 16x16 -> no tile
        b = pipe(lq, ctx, tile_size=64, tile_overlap=32)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_omgsr_f_pipeline(self):
        vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
        fp = F.init_flux(jax.random.key(1), TINY_FLUX)
        pipe = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX, mid_timestep=244)
        lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 64, 32, 3)))
        ctx = jax.random.normal(jax.random.key(3), (1, 5, 16))
        pooled = jax.random.normal(jax.random.key(4), (1, 8))
        out = pipe(lq, ctx, pooled, tile_size=8, tile_overlap=4)
        assert out.shape == lq.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_omgsr_f_single_pass_when_tile_covers_latent(self):
        # The reference -F geometry (infer/infer_omgsr_f.py:90 with
        # --process_size 1024) sets latent tile == the whole latent for a
        # 256->1024 x4 job, so the DiT runs ONE full-image pass. Pin that
        # tile_size == latent size takes the no-tile path (identical to any
        # larger tile) rather than a degenerate 1-tile stitch.
        vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
        fp = F.init_flux(jax.random.key(1), TINY_FLUX)
        pipe = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX, mid_timestep=244)
        lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 64, 64, 3)))
        ctx = jax.random.normal(jax.random.key(3), (1, 5, 16))
        pooled = jax.random.normal(jax.random.key(4), (1, 8))
        # TINY_FLUX_VAE downscales by 2 -> latent 32x32
        a = pipe(lq, ctx, pooled, tile_size=32, tile_overlap=16)
        b = pipe(lq, ctx, pooled, tile_size=128, tile_overlap=64)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestColorFix:
    def test_adain_moves_stats(self):
        rng = np.random.default_rng(0)
        target = jnp.asarray(rng.uniform(0.2, 0.4, (1, 32, 32, 3)).astype(np.float32))
        source = jnp.asarray(rng.uniform(0.5, 0.9, (1, 32, 32, 3)).astype(np.float32))
        fixed = np.asarray(jax.jit(adain_color_fix)(target, source))
        np.testing.assert_allclose(
            fixed.mean(axis=(1, 2)), np.asarray(source).mean(axis=(1, 2)), atol=1e-3
        )
        np.testing.assert_allclose(
            fixed.std(axis=(1, 2)), np.asarray(source).std(axis=(1, 2)), atol=1e-3
        )

    def test_adain_identity(self):
        x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
        np.testing.assert_allclose(np.asarray(adain_color_fix(x, x)), np.asarray(x), atol=1e-4)

    def test_wavelet_decomposition_sums(self):
        x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
        high, low = wavelet_decomposition(x)
        np.testing.assert_allclose(np.asarray(high + low), np.asarray(x), atol=1e-5)

    def test_wavelet_fix_takes_source_low_freq(self):
        rng = np.random.default_rng(3)
        t = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        s = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
        fixed = wavelet_color_fix(t, s)
        t_high, _ = wavelet_decomposition(t)
        _, s_low = wavelet_decomposition(s)
        np.testing.assert_allclose(np.asarray(fixed), np.asarray(t_high + s_low), atol=1e-5)

    def test_wavelet_matches_reference_torch_semantics(self):
        """Replicate wavelet_blur (infer/wavelet_color_fix.py:77-96) in numpy
        with replicate pad + dilated conv and compare one level."""
        from omgsr_tpu.ops.color import wavelet_blur

        rng = np.random.default_rng(4)
        x = rng.uniform(0, 1, (1, 8, 8, 3)).astype(np.float32)
        radius = 2
        kern = np.asarray(
            [[0.0625, 0.125, 0.0625], [0.125, 0.25, 0.125], [0.0625, 0.125, 0.0625]],
            np.float32,
        )
        xp = np.pad(x, ((0, 0), (radius, radius), (radius, radius), (0, 0)), mode="edge")
        expected = np.zeros_like(x)
        for dy in range(3):
            for dx in range(3):
                expected += (
                    kern[dy, dx]
                    * xp[:, dy * radius : dy * radius + 8, dx * radius : dx * radius + 8, :]
                )
        ours = np.asarray(wavelet_blur(jnp.asarray(x), radius))
        np.testing.assert_allclose(ours, expected, atol=1e-5)


class TestMaskedColorFix:
    """The serving daemon's in-graph color fix on bucket-padded canvases must
    equal crop -> fix (the CLI path) on the valid region, for both methods
    and any pad width (including pads below and above the wavelet's largest
    blur radius)."""

    @pytest.mark.parametrize("hw", [(64, 64), (50, 61), (33, 64)])
    def test_masked_equals_crop_then_fix(self, hw):
        from omgsr_tpu.ops.color import (
            masked_adain_color_fix, masked_wavelet_color_fix,
        )

        h, w = hw
        H = W = 64  # bucket canvas
        rng = np.random.default_rng(5)
        t_full = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
        s_full = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
        # the pad region carries unrelated content (host reflect-pad garbage)
        t = jnp.asarray(t_full)
        s = jnp.asarray(s_full)
        tc = jnp.asarray(t_full[:, :h, :w])
        sc = jnp.asarray(s_full[:, :h, :w])

        want = np.asarray(adain_color_fix(tc, sc))
        got = np.asarray(
            jax.jit(masked_adain_color_fix)(t, s, jnp.int32(h), jnp.int32(w))
        )[:, :h, :w]
        np.testing.assert_allclose(got, want, atol=2e-5)

        want_w = np.asarray(wavelet_color_fix(tc, sc))
        got_w = np.asarray(
            jax.jit(masked_wavelet_color_fix)(t, s, jnp.int32(h), jnp.int32(w))
        )[:, :h, :w]
        np.testing.assert_allclose(got_w, want_w, atol=2e-5)


class TestPipelineVAETile:
    def test_streaming_vae_path_close_to_full(self):
        """vae_tile routes encode/decode through the streaming tiled VAE;
        with mean-sampling the result should stay close to the full-VAE path
        (stats estimated at tile size). The 128-px image exceeds the
        48 + 2*32 encode window, so the tile-grid scan actually runs
        (a 96-px image would silently take the whole-input fallback)."""
        vp = V.init_vae(jax.random.key(0), TINY_VAE)
        up = U.init_unet(jax.random.key(1), TINY_UNET)
        full = OMGSRSPipeline(vp, up, TINY_VAE, TINY_UNET)
        tiled = OMGSRSPipeline(vp, up, TINY_VAE, TINY_UNET, vae_tile=48)
        lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 128, 128, 3)))
        ctx = jax.random.normal(jax.random.key(3), (1, 7, 16))
        a = np.asarray(full(lq, ctx, tile_size=16, tile_overlap=8))
        b = np.asarray(tiled(lq, ctx, tile_size=16, tile_overlap=8))
        assert b.shape == a.shape
        assert np.isfinite(b).all()

    def test_streaming_vae_batched_input(self):
        """--batch_size serving + vae_tile: batched inputs stream per image
        (previously the streaming VAE's batch-1 assert crashed) and each
        image equals its own single-image run."""
        vp = V.init_vae(jax.random.key(0), TINY_VAE)
        up = U.init_unet(jax.random.key(1), TINY_UNET)
        tiled = OMGSRSPipeline(vp, up, TINY_VAE, TINY_UNET, vae_tile=48)
        lq = jnp.tanh(jax.random.normal(jax.random.key(6), (2, 128, 128, 3)))
        ctx = jax.random.normal(jax.random.key(7), (1, 7, 16))
        batched = np.asarray(tiled(lq, ctx, tile_size=16, tile_overlap=8))
        singles = np.concatenate(
            [np.asarray(tiled(lq[i : i + 1], ctx, tile_size=16, tile_overlap=8))
             for i in range(2)]
        )
        np.testing.assert_allclose(batched, singles, atol=2e-4, rtol=1e-3)

    def test_vae_tile_validation(self):
        """vae_tile not aligned to the VAE downscale would leave unwritten
        latent bands (silent corruption) — must be rejected up front."""
        vp = V.init_vae(jax.random.key(0), TINY_VAE)
        up = U.init_unet(jax.random.key(1), TINY_UNET)
        import pytest

        with pytest.raises(ValueError, match="multiple of"):
            OMGSRSPipeline(vp, up, TINY_VAE, TINY_UNET, vae_tile=49)
        with pytest.raises(ValueError, match="multiple of"):
            OMGSRSPipeline(vp, up, TINY_VAE, TINY_UNET, vae_tile=1)

    def test_exact_vae_stats_equals_full_pipeline(self):
        """vae_stats=\"exact\" must reproduce the full-image-VAE pipeline to
        float tolerance — the single-chip exactness contract for 2-4K."""
        vp = V.init_vae(jax.random.key(0), TINY_VAE)
        up = U.init_unet(jax.random.key(1), TINY_UNET)
        full = OMGSRSPipeline(vp, up, TINY_VAE, TINY_UNET)
        exact = OMGSRSPipeline(
            vp, up, TINY_VAE, TINY_UNET, vae_tile=48, vae_stats="exact"
        )
        lq = jnp.tanh(jax.random.normal(jax.random.key(4), (1, 96, 96, 3)))
        ctx = jax.random.normal(jax.random.key(5), (1, 7, 16))
        a = np.asarray(full(lq, ctx, tile_size=16, tile_overlap=8))
        b = np.asarray(exact(lq, ctx, tile_size=16, tile_overlap=8))
        np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-3)

    def test_vae_stats_validation(self):
        vp = V.init_vae(jax.random.key(0), TINY_VAE)
        up = U.init_unet(jax.random.key(1), TINY_UNET)
        import pytest

        with pytest.raises(ValueError):
            OMGSRSPipeline(vp, up, TINY_VAE, TINY_UNET, vae_stats="bogus")

    def test_f_streaming_vae_path_runs(self):
        """OMGSRFPipeline(vae_tile=...) routes through the streaming tiled
        VAE (the -F 2-4K serving path, mirroring -S). 128 px > the 48+2*32
        encode window, so the tile-grid scan actually executes."""
        vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
        fp = F.init_flux(jax.random.key(1), TINY_FLUX)
        tiled = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX, vae_tile=48)
        lq = jnp.tanh(jax.random.normal(jax.random.key(2), (1, 128, 128, 3)))
        ctx = jax.random.normal(jax.random.key(3), (1, 5, 16))
        pooled = jax.random.normal(jax.random.key(4), (1, 8))
        out = np.asarray(tiled(lq, ctx, pooled, tile_size=16, tile_overlap=8))
        assert out.shape == (1, 128, 128, 3)
        assert np.isfinite(out).all()

    def test_f_exact_vae_stats_equals_full_pipeline(self):
        """-F vae_stats="exact" reproduces the full-image-VAE -F pipeline to
        float tolerance (single-chip 2-4K exactness, FLUX 16-ch shift/scale
        VAE included)."""
        vp = V.init_vae(jax.random.key(0), TINY_FLUX_VAE)
        fp = F.init_flux(jax.random.key(1), TINY_FLUX)
        full = OMGSRFPipeline(vp, fp, TINY_FLUX_VAE, TINY_FLUX)
        exact = OMGSRFPipeline(
            vp, fp, TINY_FLUX_VAE, TINY_FLUX, vae_tile=48, vae_stats="exact"
        )
        lq = jnp.tanh(jax.random.normal(jax.random.key(5), (1, 96, 96, 3)))
        ctx = jax.random.normal(jax.random.key(6), (1, 5, 16))
        pooled = jax.random.normal(jax.random.key(7), (1, 8))
        a = np.asarray(full(lq, ctx, pooled, tile_size=16, tile_overlap=8))
        b = np.asarray(exact(lq, ctx, pooled, tile_size=16, tile_overlap=8))
        np.testing.assert_allclose(b, a, atol=2e-4, rtol=1e-3)


class TestReviewRegressions:
    def test_tile_grid_rejects_overlap_ge_tile(self):
        import pytest

        from omgsr_tpu.diffusion.tiling import tile_grid_1d

        with pytest.raises(ValueError):
            tile_grid_1d(300, 64, 64)  # stride 0 used to loop forever

    def test_tiled_denoise_clamps_overlap_with_tile(self):
        """Wide-aspect latent where the tile clamps to the short dim: the
        overlap must clamp too (64-overlap at 16-px tiles = stride 0 hang)."""
        x = jax.random.normal(jax.random.key(7), (1, 16, 72, 4))
        out = tiled_denoise(x, lambda t: jnp.tanh(t), 32, 16)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()

    def test_run_batch_skips_unreadable_image(self, tmp_path):
        from PIL import Image

        from omgsr_tpu.inference.batch_runner import run_batch

        good = tmp_path / "good.png"
        Image.fromarray(np.zeros((16, 16, 3), np.uint8)).save(good)
        bad = tmp_path / "bad.png"
        bad.write_bytes(b"not a png at all")
        out_dir = tmp_path / "out"
        run_batch(
            [str(bad), str(good)],
            lambda lq, i: jnp.asarray(lq),
            str(out_dir), process_size=64, upscale=4,
            align_method="nofix", dtype=jnp.float32,
        )
        assert (out_dir / "good.png").exists()  # pipeline completed
        assert not (out_dir / "bad.png").exists()  # corrupt input skipped
