"""Serving daemon tests: SRServer dispatch + HTTP surface + cli.serve.

Tiny random models on CPU (conftest forces the platform); the HTTP layer is
exercised over a real socket on an ephemeral port."""

import io
import json
import threading
import urllib.error
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from omgsr_tpu.inference.pipeline_s import OMGSRSPipeline
from omgsr_tpu.models import unet_sd as U
from omgsr_tpu.models import vae as V
from omgsr_tpu.serving import ServeOptions, SRServer
from tests.test_models import TINY_UNET, TINY_VAE


def _tiny_infer_fn():
    vp = V.init_vae(jax.random.key(0), TINY_VAE)
    up = U.init_unet(jax.random.key(1), TINY_UNET)
    pipe = OMGSRSPipeline(vp, up, TINY_VAE, TINY_UNET)
    prompt = jax.random.normal(jax.random.key(2), (1, 7, 16))

    def infer_fn(lq, i):
        return pipe(jnp.asarray(lq, jnp.float32), prompt, 16, 8, rng=jax.random.key(i))

    return infer_fn


def _png_bytes(h, w, seed=0):
    rng = np.random.default_rng(seed)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(buf, format="PNG")
    return buf.getvalue()


@pytest.fixture(scope="module")
def server():
    srv = SRServer(
        _tiny_infer_fn(),
        ServeOptions(process_size=32, upscale=4, size_bucket=16, warmup_sizes=((8, 8),)),
        np_dtype=np.float32,
    )
    httpd = srv.make_httpd("127.0.0.1", 0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    srv.warmup()
    # warmup compiled (8,8) but isn't counted as served traffic
    assert srv.metrics()["requests"] == 0
    host, port = httpd.server_address[:2]
    yield srv, f"http://{host}:{port}"
    srv.shutdown()


class TestSRServerHTTP:
    def test_healthz(self, server):
        _, base = server
        with urllib.request.urlopen(f"{base}/healthz") as r:
            h = json.loads(r.read())
        assert h["status"] == "ok"
        assert h["warm"] == [[8, 8]]

    def test_sr_roundtrip(self, server):
        srv, base = server
        req = urllib.request.Request(f"{base}/v1/sr?align=wavelet", data=_png_bytes(8, 6), method="POST")
        with urllib.request.urlopen(req) as r:
            assert r.headers["Content-Type"] == "image/png"
            out = Image.open(io.BytesIO(r.read()))
        # 8x6 -> x4 = 32x24, snapped to /8 multiples by prepare_input
        assert out.size == (24, 32)
        assert np.asarray(out).std() > 0
        m = srv.metrics()
        assert m["requests"] >= 1 and m["latency_ms_p50"] is not None

    def test_concurrent_requests_distinct_outputs(self, server):
        _, base = server
        outs = {}

        def post(seed):
            req = urllib.request.Request(
                f"{base}/v1/sr?align=nofix", data=_png_bytes(8, 8, seed), method="POST"
            )
            with urllib.request.urlopen(req) as r:
                outs[seed] = np.asarray(Image.open(io.BytesIO(r.read())))

        ts = [threading.Thread(target=post, args=(s,)) for s in (1, 2)]
        [t.start() for t in ts]
        [t.join() for t in ts]
        assert outs[1].shape == outs[2].shape
        assert np.abs(outs[1].astype(int) - outs[2].astype(int)).mean() > 1

    def test_bad_body_is_400(self, server):
        _, base = server
        req = urllib.request.Request(f"{base}/v1/sr", data=b"not an image", method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400

    def test_unknown_align_is_400(self, server):
        _, base = server
        req = urllib.request.Request(f"{base}/v1/sr?align=bogus", data=_png_bytes(8, 8), method="POST")
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req)
        assert e.value.code == 400

    def test_unknown_path_is_404(self, server):
        _, base = server
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(f"{base}/nope")
        assert e.value.code == 404


class TestDispatch:
    def test_device_fault_is_502(self):
        def boom(lq, i):
            raise RuntimeError("backend fell over")

        srv = SRServer(boom, ServeOptions(process_size=32, upscale=4, size_bucket=16))
        httpd = srv.make_httpd("127.0.0.1", 0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        host, port = httpd.server_address[:2]
        try:
            req = urllib.request.Request(
                f"http://{host}:{port}/v1/sr", data=_png_bytes(8, 8), method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req)
            assert e.value.code == 502  # retryable server fault, not 400
        finally:
            srv.shutdown()

    def test_timeout_is_504(self):
        import time as _time

        def slow(lq, i):
            _time.sleep(1.0)
            raise AssertionError("unreached by the handler")

        srv = SRServer(
            slow,
            ServeOptions(process_size=32, upscale=4, size_bucket=16, request_timeout_s=0.05),
        )
        httpd = srv.make_httpd("127.0.0.1", 0)
        threading.Thread(target=httpd.serve_forever, daemon=True).start()
        host, port = httpd.server_address[:2]
        try:
            req = urllib.request.Request(
                f"http://{host}:{port}/v1/sr", data=_png_bytes(8, 8), method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req)
            assert e.value.code == 504
        finally:
            srv.shutdown()

    def test_shutdown_fails_queued_requests(self):
        """Requests still queued at shutdown get an error, not a hang."""
        import time as _time

        def slow(lq, i):
            _time.sleep(0.5)
            raise RuntimeError("never completes in time")

        srv = SRServer(slow, ServeOptions(process_size=32, upscale=4, size_bucket=16))
        errors = []

        def call():
            try:
                srv.process_image(_png_bytes(8, 8), align="nofix")
            except Exception as e:  # noqa: BLE001
                errors.append(e)

        ts = [threading.Thread(target=call) for _ in range(3)]
        [t.start() for t in ts]
        _time.sleep(0.1)  # let one dispatch start, leave the rest queued
        srv.shutdown()
        [t.join(timeout=10) for t in ts]
        assert not any(t.is_alive() for t in ts)
        assert len(errors) == 3

    def test_backpressure_503(self):
        srv = SRServer(
            _tiny_infer_fn(),
            ServeOptions(process_size=32, upscale=4, size_bucket=16, queue_depth=0),
        )
        httpd = srv.make_httpd("127.0.0.1", 0)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        host, port = httpd.server_address[:2]
        try:
            req = urllib.request.Request(
                f"http://{host}:{port}/v1/sr", data=_png_bytes(8, 8), method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(req)
            assert e.value.code == 503
            assert srv.metrics()["errors"] == 1
        finally:
            srv.shutdown()

    def test_micro_batch_groups_and_pads(self):
        """max_batch=2: two co-arriving same-bucket requests ride ONE padded
        device call; a lone request is padded to the same fixed batch (one
        compiled graph per bucket)."""
        srv = SRServer(
            _tiny_infer_fn(),
            ServeOptions(
                process_size=32, upscale=4, size_bucket=16,
                max_batch=2, batch_window_ms=2000.0,
            ),
        )
        try:
            srv.process_image(_png_bytes(8, 8), align="nofix")  # compile (padded to 2)
            base_batches = srv.metrics()["batches"]
            results = {}

            def call(seed):
                results[seed] = srv.process_image(_png_bytes(8, 8, seed), align="nofix")

            ts = [threading.Thread(target=call, args=(s,)) for s in (1, 2)]
            [t.start() for t in ts]
            [t.join() for t in ts]
            m = srv.metrics()
            assert m["batches"] == base_batches + 1  # grouped, not 2 dispatches
            a = np.asarray(Image.open(io.BytesIO(results[1])))
            b = np.asarray(Image.open(io.BytesIO(results[2])))
            assert np.abs(a.astype(int) - b.astype(int)).mean() > 1
        finally:
            srv.shutdown()


class TestFusedServing:
    def test_fused_matches_two_dispatch_path(self):
        """The fused SR+color-fix graph must reproduce the classic path
        (separate jitted fix on the cropped image) for every align method,
        on an input whose bucket pad is real (32x24 padded to 32x32)."""
        from omgsr_tpu.serving.server import make_fused_infer

        vp = V.init_vae(jax.random.key(0), TINY_VAE)
        up = U.init_unet(jax.random.key(1), TINY_UNET)
        pipe = OMGSRSPipeline(vp, up, TINY_VAE, TINY_UNET)
        prompt = jax.random.normal(jax.random.key(2), (1, 7, 16))

        def pipe_call(lq, i):
            return pipe(lq, prompt, 16, 8, rng=jax.random.key(i))

        def infer_fn(lq, i):
            return pipe_call(jnp.asarray(lq, jnp.float32), i)

        opts = ServeOptions(process_size=32, upscale=4, size_bucket=16)
        srv_a = SRServer(infer_fn, opts, np_dtype=np.float32)
        srv_b = SRServer(
            infer_fn, opts, np_dtype=np.float32,
            fused_infer_fn=make_fused_infer(pipe_call, jnp.float32),
        )
        body = _png_bytes(8, 6, seed=3)  # -> 32x24, bucket-padded to 32x32
        try:
            for align in ("nofix", "adain", "wavelet"):
                # same per-server request index -> same latent noise draw
                a = np.asarray(Image.open(io.BytesIO(srv_a.process_image(body, align=align))))
                b = np.asarray(Image.open(io.BytesIO(srv_b.process_image(body, align=align))))
                assert a.shape == b.shape
                assert np.abs(a.astype(int) - b.astype(int)).max() <= 1, align
        finally:
            srv_a.shutdown()
            srv_b.shutdown()


class TestServeCLI:
    def test_build_and_drive(self, tmp_path_factory, tmp_path):
        from omgsr_tpu.cli.serve import main, parse_args
        from tests.test_e2e_cli import make_fake_sd_checkpoint

        ckpt = make_fake_sd_checkpoint(tmp_path_factory.mktemp("fake_sd_serve"))
        rng = np.random.default_rng(0)
        np.savez(tmp_path / "prompt.npz", prompt_embeds=rng.normal(size=(1, 7, 16)).astype(np.float32))
        args = parse_args(
            [
                "--pipeline", "s",
                "--sd_path", str(ckpt),
                "--lora_path", str(ckpt / "lora"),
                "--prompt_npz", str(tmp_path / "prompt.npz"),
                "--process_size", "64", "--upscale", "4",
                "--weight_dtype", "fp32", "--port", "0",
            ]
        )
        assert args.mid_timestep == 273  # -s default filled in
        server, httpd = main(args, serve_forever=False)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        host, port = httpd.server_address[:2]
        try:
            req = urllib.request.Request(
                f"http://{host}:{port}/v1/sr", data=_png_bytes(24, 16), method="POST"
            )
            with urllib.request.urlopen(req) as r:
                out = Image.open(io.BytesIO(r.read()))
            assert out.size == (64, 96)  # same geometry as the infer CLI e2e
        finally:
            server.shutdown()

    def test_split_dispatch_matches_fused(self, tmp_path_factory, tmp_path):
        """--color_fix_dispatch split (two jitted dispatches; required on
        remote-compile tunnels whose compiler rejects the fused mega-module)
        serves the fused default's pixels (<=1 uint8 rounding step, same
        bound as test_fused_matches_two_dispatch_path)."""
        from omgsr_tpu.cli.serve import main, parse_args
        from tests.test_e2e_cli import make_fake_sd_checkpoint

        ckpt = make_fake_sd_checkpoint(tmp_path_factory.mktemp("fake_sd_split"))
        rng = np.random.default_rng(0)
        np.savez(tmp_path / "prompt.npz",
                 prompt_embeds=rng.normal(size=(1, 7, 16)).astype(np.float32))
        base = [
            "--pipeline", "s", "--sd_path", str(ckpt),
            "--prompt_npz", str(tmp_path / "prompt.npz"),
            "--process_size", "64", "--upscale", "4",
            "--weight_dtype", "fp32", "--port", "0",
            "--align_method", "adain",
        ]
        outs = {}
        body = _png_bytes(24, 16)
        for mode in ("fused", "split"):
            args = parse_args(base + ["--color_fix_dispatch", mode])
            server, httpd = main(args, serve_forever=False)
            assert (server.fused_infer_fn is not None) == (mode == "fused")
            t = threading.Thread(target=httpd.serve_forever, daemon=True)
            t.start()
            host, port = httpd.server_address[:2]
            try:
                req = urllib.request.Request(
                    f"http://{host}:{port}/v1/sr", data=body, method="POST"
                )
                with urllib.request.urlopen(req) as r:
                    outs[mode] = np.asarray(Image.open(io.BytesIO(r.read())))
            finally:
                server.shutdown()
        assert outs["fused"].shape == outs["split"].shape
        assert np.abs(
            outs["fused"].astype(int) - outs["split"].astype(int)
        ).max() <= 1

    def test_reload_hot_swaps_adapter(self, tmp_path_factory, tmp_path):
        from omgsr_tpu.cli.serve import main, parse_args
        from omgsr_tpu.lora import SD_TARGET_MODULES, init_lora_tree, save_adapter
        from omgsr_tpu.models import unet_sd as U
        from omgsr_tpu.models import vae as V
        from tests.test_e2e_cli import make_fake_sd_checkpoint
        from tests.test_models import TINY_UNET, TINY_VAE

        ckpt = make_fake_sd_checkpoint(tmp_path_factory.mktemp("fake_sd_reload"))
        # a second adapter with NON-zero B factors (fresh LoRA inits B=0 and
        # merges as identity, which a swap test couldn't see)
        vp = V.init_vae(jax.random.key(0), TINY_VAE)
        up = U.init_unet(jax.random.key(1), TINY_UNET)
        prng = np.random.default_rng(7)
        perturb = lambda t: jax.tree.map(  # noqa: E731
            lambda x: x + 0.05 * prng.standard_normal(x.shape).astype(np.float32), t
        )
        lora2 = tmp_path / "lora2"
        save_adapter(
            perturb(init_lora_tree(jax.random.key(4), vp["encoder"], SD_TARGET_MODULES, 2)),
            str(lora2 / "vae_encoder_lora_adapter"), rank=2, targets=SD_TARGET_MODULES,
        )
        save_adapter(
            perturb(init_lora_tree(jax.random.key(5), up, SD_TARGET_MODULES, 2)),
            str(lora2 / "unet_lora_adapter"), rank=2, targets=SD_TARGET_MODULES,
        )

        rng = np.random.default_rng(0)
        np.savez(tmp_path / "prompt.npz", prompt_embeds=rng.normal(size=(1, 7, 16)).astype(np.float32))
        args = parse_args(
            [
                "--pipeline", "s", "--sd_path", str(ckpt),
                "--lora_path", str(ckpt / "lora"),
                "--prompt_npz", str(tmp_path / "prompt.npz"),
                "--process_size", "64", "--upscale", "4",
                "--weight_dtype", "fp32", "--port", "0", "--align_method", "nofix",
                "--latent", "mean",  # deterministic: output differences below
                # can only come from the swapped adapter
            ]
        )
        server, httpd = main(args, serve_forever=False)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        host, port = httpd.server_address[:2]
        base = f"http://{host}:{port}"
        body = _png_bytes(8, 8)
        try:
            def sr():
                req = urllib.request.Request(f"{base}/v1/sr", data=body, method="POST")
                with urllib.request.urlopen(req) as r:
                    return np.asarray(Image.open(io.BytesIO(r.read())))

            before = sr()
            np.testing.assert_array_equal(before, sr())  # mean-latent: deterministic
            payload = json.dumps({"lora_path": str(lora2)}).encode()
            req = urllib.request.Request(f"{base}/v1/reload", data=payload, method="POST")
            with urllib.request.urlopen(req) as r:
                assert json.loads(r.read())["status"] == "reloaded"
            after = sr()
            # same input, new adapter -> different SR output
            assert np.abs(before.astype(int) - after.astype(int)).mean() > 0.5
            # unknown fields are rejected, server keeps serving
            bad = urllib.request.Request(
                f"{base}/v1/reload", data=json.dumps({"sd_path": "/x"}).encode(), method="POST"
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(bad)
            assert e.value.code == 400
            assert sr().shape == after.shape
            # failed REBUILD (value that breaks pipeline construction):
            # 400, the previous model is restored, and the committed config
            # is not poisoned — output matches the post-swap result exactly
            bad2 = urllib.request.Request(
                f"{base}/v1/reload",
                data=json.dumps({"mid_timestep": "nope"}).encode(), method="POST",
            )
            with pytest.raises(urllib.error.HTTPError) as e:
                urllib.request.urlopen(bad2)
            assert e.value.code == 400
            np.testing.assert_array_equal(sr(), after)
        finally:
            server.shutdown()

    def test_parse_requires_ckpt(self):
        from omgsr_tpu.cli.serve import parse_args

        with pytest.raises(SystemExit):
            parse_args(["--pipeline", "f"])  # --flux_path missing

    def test_build_and_drive_f_quantized(self, tmp_path_factory, tmp_path):
        """Regression: serving a quantized -f pipeline must build (the serve
        parser once lacked --quantize_min_params while build_pipeline read
        it), and one request must round-trip through the int8 DiT."""
        from omgsr_tpu.cli.serve import main, parse_args
        from tests.test_e2e_cli import make_fake_flux_checkpoint

        ckpt = make_fake_flux_checkpoint(tmp_path_factory.mktemp("fake_flux_serve"))
        rng = np.random.default_rng(0)
        np.savez(
            tmp_path / "prompt_f.npz",
            prompt_embeds=rng.normal(size=(1, 5, 16)).astype(np.float32),
            pooled_prompt_embeds=rng.normal(size=(1, 8)).astype(np.float32),
        )
        args = parse_args(
            [
                "--pipeline", "f",
                "--flux_path", str(ckpt),
                "--prompt_npz", str(tmp_path / "prompt_f.npz"),
                "--process_size", "64", "--upscale", "4",
                "--weight_dtype", "fp32", "--port", "0",
                "--quantize", "int8", "--quantize_min_params", "1",
            ]
        )
        assert args.mid_timestep == 244  # -f default filled in
        server, httpd = main(args, serve_forever=False)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        host, port = httpd.server_address[:2]
        try:
            req = urllib.request.Request(
                f"http://{host}:{port}/v1/sr", data=_png_bytes(24, 16), method="POST"
            )
            with urllib.request.urlopen(req) as r:
                out = Image.open(io.BytesIO(r.read()))
            assert out.size == (64, 96)
        finally:
            server.shutdown()
