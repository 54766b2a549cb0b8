"""OMGSR serving daemon — a long-lived HTTP process around either pipeline.

The reference has no serving story beyond re-running its folder loop
(infer/infer_omgsr_s.py:69-107, full checkpoint load + warmup per run);
here the weights stage once, the XLA graphs compile once (and persist via
the compilation cache), and requests stream through warm graphs:

    python -m omgsr_tpu.cli.serve --pipeline s \
        --sd_path /ckpts/sd21 --lora_path /ckpts/omgsr_s \
        --prompt_npz prompts.npz --port 8000 --warmup 256x256

    curl -X POST --data-binary @lq.png \
        "http://localhost:8000/v1/sr?align=adain" -o sr.png

Pipeline construction and flags are shared with the infer CLIs (same
checkpoint layouts, LoRA adapters, quantization, tiled VAE, mesh sharding).
Dispatch defaults to serial batch-1 — measured optimal on one chip (see
serving/server.py) — with opt-in fixed-size micro-batching for sharded
meshes.
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp

from omgsr_tpu.serving.server import ServeOptions, SRServer
from omgsr_tpu.utils.dtypes import resolve_dtype


def _make_infer_fn(args, dtype):
    """Build a pipeline + prompt embeddings from the CLI args and return
    (infer_fn, fused_infer_fn | None). Called again on /v1/reload hot-swaps.

    fused_infer_fn folds the per-request color fix into the SR graph (one
    device dispatch per request instead of two — see
    serving.server.make_fused_infer); it exists whenever the pipeline's
    one-graph path applies, i.e. unless --vae_tile may route through the
    host-orchestrated exact tiled-VAE mode."""
    from omgsr_tpu.cli.prompts import load_prompt_npz
    from omgsr_tpu.serving.server import make_fused_infer

    tile_size = args.process_size // 8
    tile_overlap = tile_size // 2

    if args.pipeline == "s":
        from omgsr_tpu.cli.infer_omgsr_s import build_pipeline

        if args.prompt_npz:
            prompt_embeds = load_prompt_npz(args.prompt_npz)["prompt_embeds"].astype(dtype)
        else:
            from omgsr_tpu.cli.prompts import encode_prompt_sd

            prompt = " ".join(args.prompt) if isinstance(args.prompt, list) else args.prompt
            prompt_embeds = encode_prompt_sd(args.sd_path, prompt, dtype)
        pipe = build_pipeline(args, dtype)

        def pipe_call(lq, i):
            return pipe(
                lq, prompt_embeds, tile_size, tile_overlap,
                rng=jax.random.key(i), sample_latent=args.latent == "sample",
            )

    else:
        from omgsr_tpu.cli.infer_omgsr_f import build_pipeline

        if args.prompt_npz:
            d = load_prompt_npz(args.prompt_npz)
            prompt_embeds = d["prompt_embeds"].astype(dtype)
            pooled = d["pooled_prompt_embeds"].astype(dtype)
        else:
            from omgsr_tpu.cli.prompts import encode_prompt_flux

            prompt = " ".join(args.prompt) if isinstance(args.prompt, list) else args.prompt
            prompt_embeds, pooled, _ = encode_prompt_flux(args.flux_path, prompt, dtype=dtype)
        pipe = build_pipeline(args, dtype)

        def pipe_call(lq, i):
            return pipe(
                lq, prompt_embeds, pooled, tile_size, tile_overlap,
                rng=jax.random.key(i), sample_latent=args.latent == "sample",
            )

    def infer_fn(lq, i):
        return pipe_call(jnp.asarray(lq, dtype), i)

    # --color_fix_dispatch split keeps SR and color fix as two jitted
    # dispatches: one extra device roundtrip per request (~free co-located),
    # but the fused mega-module (full pipeline + vmapped 3-branch fix) is
    # too large for some remote-compile services — measured on the axon
    # tunnel: fix alone compiles in 102 s, fused-with-tiny-model in 75 s,
    # fused-with-the-865M-UNet hangs ~30 min then breaks the compiler pipe
    # (twice). Default stays fused for co-located TPU hosts.
    fused_fn = (
        None
        if (args.vae_tile or getattr(args, "color_fix_dispatch", "fused") == "split")
        else make_fused_infer(pipe_call, dtype)
    )
    return infer_fn, fused_fn


def build_server(args) -> SRServer:
    import json

    from omgsr_tpu.inference.batch_runner import dtype_np

    dtype = resolve_dtype(args.weight_dtype)
    warmup = tuple(
        tuple(int(v) for v in s.split("x")) for s in (args.warmup or [])
    )
    opts = ServeOptions(
        process_size=args.process_size,
        upscale=args.upscale,
        align_method=args.align_method,
        size_bucket=args.size_bucket,
        max_batch=args.max_batch,
        batch_window_ms=args.batch_window_ms,
        queue_depth=args.queue_depth,
        warmup_sizes=warmup,
    )
    infer_fn, fused_fn = _make_infer_fn(args, dtype)
    server = SRServer(
        infer_fn, opts, np_dtype=dtype_np(dtype), fused_infer_fn=fused_fn
    )

    def reload_route(body: bytes) -> dict:
        """POST /v1/reload {"lora_path": "...", "mid_timestep": n?} — rebuild
        the pipeline from disk with a new adapter and hot-swap it behind the
        dispatcher. Base weights re-port from safetensors; with the
        persistent XLA cache the retrace is a disk hit.

        The OLD pipeline's device buffers are released BEFORE the new build —
        required for --quantize int8, where the 12B DiT fills most of one
        v5e's HBM and two copies cannot coexist. Requests arriving during
        the rebuild fail fast with 502 (retryable) instead of queuing behind
        a minutes-long 12B restage."""
        import copy
        import gc
        import time

        req = json.loads(body or b"{}")
        allowed = {"lora_path", "mid_timestep", "guidance_scale"}
        unknown = set(req) - allowed
        if unknown:
            raise ValueError(f"unknown reload fields: {sorted(unknown)}")
        # build from a copy: a failed rebuild must not poison the args the
        # next reload starts from
        new_args = copy.copy(args)
        for k, v in req.items():
            setattr(new_args, k, v)
        with server._reload_lock:
            old_fns = (server.infer_fn, server.fused_infer_fn)

            def rebuilding(lq, i):
                raise RuntimeError("model reloading, retry shortly")

            server.swap_infer_fn(rebuilding)
            with server._dispatch_busy:  # wait out any in-flight dispatch
                pass
            del old_fns  # the only live references to the old pipeline
            gc.collect()
            try:
                server.swap_infer_fn(*_make_infer_fn(new_args, dtype))
            except Exception:
                # device memory was freed; restore a working model from the
                # still-committed args rather than serving the raising stub.
                # The restore itself can fail transiently (remote-compile
                # hiccup) — retry with backoff instead of leaving the server
                # permanently on the 'rebuilding' stub with no way out
                gc.collect()  # drop any partially-built device buffers first
                restore_err = None
                for attempt in range(3):
                    try:
                        server.swap_infer_fn(*_make_infer_fn(args, dtype))
                        restore_err = None
                        break
                    except Exception as e:  # noqa: BLE001
                        restore_err = e
                        gc.collect()
                        time.sleep(2.0 * (attempt + 1))
                if restore_err is not None:
                    # fatal: make the stub say so explicitly so clients stop
                    # retrying and the operator restarts the process
                    def fatal(lq, i, _e=restore_err):
                        raise RuntimeError(
                            f"model reload failed and restore failed ({_e}); "
                            "server requires restart"
                        )

                    server.swap_infer_fn(fatal)
                raise
            args.__dict__.update(new_args.__dict__)  # commit on success only
        return {"status": "reloaded", **{k: req[k] for k in req}}

    server.post_routes["/v1/reload"] = reload_route
    return server


def main(args=None, serve_forever: bool = True):
    if args is None:
        args = parse_args()
    from omgsr_tpu.utils.compilation_cache import enable_compilation_cache

    enable_compilation_cache()
    server = build_server(args)
    httpd = server.make_httpd(args.host, args.port)
    if server.opts.warmup_sizes:
        print(f"warming {list(server.opts.warmup_sizes)} ...", flush=True)
        server.warmup()
    host, port = httpd.server_address[:2]
    print(f"omgsr-tpu serving on http://{host}:{port} "
          f"(pipeline={args.pipeline}, process_size={args.process_size})", flush=True)
    if serve_forever:
        try:
            httpd.serve_forever()
        except KeyboardInterrupt:
            pass
        finally:
            server.shutdown()
    return server, httpd


def parse_args(argv=None):
    parser = argparse.ArgumentParser(description="OMGSR serving daemon (TPU)")
    parser.add_argument("--pipeline", type=str, default="s", choices=["s", "f"])
    parser.add_argument("--sd_path", type=str, default=None, help="SD2.1 dir (pipeline=s)")
    parser.add_argument("--flux_path", type=str, default=None, help="FLUX.1-dev dir (pipeline=f)")
    parser.add_argument("--lora_path", type=str, default=None)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    parser.add_argument("--process_size", type=int, default=None,
                        help="default 512 for -s, 1024 for -f")
    parser.add_argument("--upscale", type=int, default=4)
    parser.add_argument("--align_method", type=str, default="adain",
                        choices=["wavelet", "adain", "nofix"])
    parser.add_argument("--weight_dtype", type=str, default="bf16",
                        choices=["fp32", "fp16", "bf16"])
    parser.add_argument("--prompt", type=str, nargs="*", default="")
    parser.add_argument("--prompt_npz", type=str, default=None)
    parser.add_argument("--mid_timestep", type=int, default=None,
                        help="default 273 for -s, 244 for -f")
    parser.add_argument("--guidance_scale", type=float, default=1.0)
    parser.add_argument("--quantize", type=str, default="none",
                        choices=["none", "int8", "int8_w8a8", "int4"],
                        help="int8 DiT serving (pipeline=f; 12B fits one 16 GB "
                        "v5e); int4: group-wise minimum-memory mode (~5.95 GB "
                        "— prefer int8 when HBM allows)")
    parser.add_argument("--quantize_min_params", type=int, default=1 << 16,
                        help="only quantize kernels with at least this many "
                        "parameters (pipeline=f)")
    parser.add_argument("--color_fix_dispatch", type=str, default="fused",
                        choices=["fused", "split"],
                        help="fused: color fix inside the SR graph (one "
                        "dispatch/request; co-located default). split: two "
                        "dispatches — required on remote-compile tunnels "
                        "whose compiler rejects the fused mega-module")
    parser.add_argument("--vae_tile", type=int, default=None)
    parser.add_argument("--vae_stats", type=str, default="fast",
                        choices=["fast", "exact", "auto"])
    parser.add_argument("--shard", type=str, default="none",
                        choices=["none", "fsdp", "tp", "tiles"])
    parser.add_argument("--size_bucket", type=int, default=64)
    parser.add_argument("--max_batch", type=int, default=1,
                        help=">1 only pays on sharded meshes; single-chip is fastest at 1")
    parser.add_argument("--batch_window_ms", type=float, default=5.0)
    parser.add_argument("--queue_depth", type=int, default=64)
    parser.add_argument("--latent", type=str, default="sample", choices=["sample", "mean"],
                        help="mean = deterministic output per input (no per-request noise draw)")
    parser.add_argument("--warmup", type=str, nargs="*", default=None,
                        metavar="HxW", help="input sizes to pre-compile, e.g. 256x256")
    args = parser.parse_args(argv)
    if args.pipeline == "s" and not args.sd_path:
        parser.error("--sd_path is required with --pipeline s")
    if args.pipeline == "f" and not args.flux_path:
        parser.error("--flux_path is required with --pipeline f")
    if args.process_size is None:
        args.process_size = 512 if args.pipeline == "s" else 1024
    if args.mid_timestep is None:
        args.mid_timestep = 273 if args.pipeline == "s" else 244
    return args


if __name__ == "__main__":
    main()
