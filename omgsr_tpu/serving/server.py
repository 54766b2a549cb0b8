"""Long-lived HTTP serving for the OMGSR pipelines.

The reference ships folder CLIs only — its serving story is "run the serial
loop again" (infer/infer_omgsr_s.py:69-107), paying checkpoint load + CUDA
warmup per invocation. A TPU deployment wants the opposite shape: stage the
weights once, keep the compiled XLA graphs warm (first 512-px compile on the
tunnel is ~75 s; steady-state is ~90 ms), and answer requests from a
long-lived process. This module provides that: a stdlib-only HTTP server
(no new dependencies) around the same `infer_fn(lq_batch, index)` contract
the batch CLIs use.

Dispatch design follows the measured single-chip scaling (CLAUDE.md perf
notes): composed SR graphs are compute-dense at batch 1 on one v5e (1024-px
protocol: bs1 2.81 imgs/s vs bs4 2.46), so the dispatcher defaults to
serial bs-1 dispatch with host decode/encode overlapped in handler threads
— micro-batching would LOWER device throughput here. Fixed-size padded
micro-batches (`max_batch > 1`) are opt-in for mesh-sharded serving, where
`shard_for_mesh(strategy="tiles"|"fsdp")` pipelines turn batch into
near-linear chip scaling; padding to a fixed batch keeps one compiled graph
per size bucket instead of one per arrival count.

Endpoints:
  GET  /healthz      -> {"status": "ok", backend, warm bucket list}
  GET  /metrics      -> request/error/batch counters + latency percentiles
  POST /v1/sr?align=adain|wavelet|nofix  (body: png/jpeg bytes) -> png bytes
"""

from __future__ import annotations

import io
import json
import queue
import threading
import time
from collections import deque
from dataclasses import dataclass, field
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

from omgsr_tpu.utils.image_io import postprocess_sr_output, preprocess_sr_input


@dataclass
class ServeOptions:
    process_size: int = 512
    upscale: int = 4
    align_method: str = "adain"  # per-request override via ?align=
    size_bucket: int = 64
    max_batch: int = 1  # >1 only pays on mesh-sharded pipelines (see module doc)
    batch_window_ms: float = 5.0  # max wait for co-batchable arrivals (max_batch>1)
    queue_depth: int = 64  # back-pressure: 503 beyond this many queued requests
    warmup_sizes: tuple = ()  # (H, W) input sizes to pre-compile at startup
    request_timeout_s: float = 900.0  # 504 after this; covers a cold remote compile


@dataclass
class _Request:
    lq: np.ndarray  # (1, H, W, 3) in [-1, 1], bucket-padded
    index: int
    true_hw: tuple = (0, 0)  # valid extent before bucket padding
    align: str = "nofix"  # resolved per-request method (fused dispatch)
    done: threading.Event = field(default_factory=threading.Event)
    result: object = None  # device array slice (1, H, W, 3) when done
    error: Exception | None = None
    # which path the dispatcher ACTUALLY ran (set in _dispatch_group). The
    # handler must postprocess based on this, not on a submit-time snapshot:
    # a swap_infer_fn between submit and dispatch would otherwise make the
    # handler treat an un-color-fixed [-1,1] canvas as already-[0,1]
    fused_used: bool = False


class SRServer:
    """Owns the dispatcher thread; HTTP handlers only decode/encode images.

    infer_fn(lq (B,H,W,3) float32 [-1,1], index) -> SR batch in [-1,1],
    asynchronously dispatched — the same contract as
    `inference.batch_runner.run_batch`.
    """

    def __init__(
        self,
        infer_fn,
        opts: ServeOptions | None = None,
        np_dtype=np.float32,
        fused_infer_fn=None,
    ):
        """fused_infer_fn (optional): `(lq (B,H,W,3) [-1,1], index, hw (B,2)
        int32, align_idx (B,) int32) -> color-fixed batch in [0,1]` — the SR
        step AND the per-request color fix in ONE jitted dispatch (the fix
        runs masked on the bucket-padded canvas, exactly equal to
        crop-then-fix; see ops/color.py). Removes the separate fix dispatch
        + src01 upload + extra device roundtrip per request. When absent,
        the classic two-dispatch path (infer_fn, then jitted fix on the
        handler thread) is used."""
        import jax

        from omgsr_tpu.ops.color import adain_color_fix, wavelet_color_fix

        self.infer_fn = infer_fn
        self.fused_infer_fn = fused_infer_fn
        self.opts = opts or ServeOptions()
        self.np_dtype = np_dtype
        self._fix = {
            "adain": jax.jit(adain_color_fix),
            "wavelet": jax.jit(wavelet_color_fix),
        }
        self._queue: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self._latencies: deque = deque(maxlen=2048)  # seconds, end-to-end
        self._stats = {"requests": 0, "errors": 0, "batches": 0, "batched_images": 0}
        self._in_flight = 0
        self._t0 = time.time()
        self._warm: list = []
        self._seq = 0
        self._stop = threading.Event()
        # extra POST routes (path -> fn(body_bytes) -> dict), e.g. the CLI's
        # /v1/reload adapter hot-swap; registered before make_httpd
        self.post_routes: dict = {}
        self._reload_lock = threading.Lock()
        self._dispatch_busy = threading.Lock()  # held across each device dispatch
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._dispatcher.start()
        self._httpd: ThreadingHTTPServer | None = None

    # ---- dispatch -----------------------------------------------------------

    def _dispatch_loop(self):
        opts = self.opts
        held = None  # a different-bucket request becomes the NEXT group's
        # first (keeps FIFO fairness: re-queuing it behind later arrivals
        # would let sustained same-bucket traffic starve it)
        while not self._stop.is_set():
            if held is not None:
                first, held = held, None
            else:
                try:
                    first = self._queue.get(timeout=0.1)
                except queue.Empty:
                    continue
            group = [first]
            if opts.max_batch > 1:
                deadline = time.perf_counter() + opts.batch_window_ms / 1e3
                while len(group) < opts.max_batch:
                    wait = deadline - time.perf_counter()
                    if wait <= 0:
                        break
                    try:
                        nxt = self._queue.get(timeout=wait)
                    except queue.Empty:
                        break
                    if nxt.lq.shape == first.lq.shape:
                        group.append(nxt)
                    else:
                        held = nxt
                        break
            try:
                self._dispatch_group(group)
            except Exception as e:  # noqa: BLE001 — keep the dispatcher alive
                for r in group:
                    r.error = DispatchError(f"{type(e).__name__}: {e}")
                    r.done.set()
        # stop: fail everything still queued so no handler blocks forever
        leftovers = [held] if held is not None else []
        while True:
            try:
                leftovers.append(self._queue.get_nowait())
            except queue.Empty:
                break
        for r in leftovers:
            r.error = DispatchError("server shutting down")
            r.done.set()

    def _dispatch_group(self, group):
        opts = self.opts
        n = len(group)
        # read BOTH fns once: a concurrent swap_infer_fn must not be observed
        # half-way (dtype chosen for one path, dispatch taking the other)
        fused_fn, plain_fn = self.fused_infer_fn, self.infer_fn
        # pad to the fixed batch so each bucket compiles exactly once. The
        # fused graph takes float32 (color-fix statistics at CLI precision)
        # and downcasts to the model dtype inside the graph.
        b = opts.max_batch if opts.max_batch > 1 else 1
        lq = np.concatenate([r.lq for r in group] + [group[-1].lq] * (b - n)).astype(
            np.float32 if fused_fn is not None else self.np_dtype
        )
        with self._dispatch_busy:
            try:
                if fused_fn is not None:
                    from omgsr_tpu.ops.color import ALIGN_IDX

                    pad = [group[-1]] * (b - n)
                    hw = np.asarray(
                        [r.true_hw for r in group + pad], np.int32
                    )
                    align = np.asarray(
                        [ALIGN_IDX[r.align] for r in group + pad], np.int32
                    )
                    out = fused_fn(lq, group[0].index, hw, align)
                else:
                    out = plain_fn(lq, group[0].index)  # async device dispatch
                for j, r in enumerate(group):
                    r.result = out[j : j + 1]
                    r.fused_used = fused_fn is not None
            except Exception as e:  # noqa: BLE001 — a device/model fault, not bad input
                for r in group:
                    r.error = DispatchError(f"{type(e).__name__}: {e}")
        for r in group:
            r.done.set()
        with self._lock:
            self._stats["batches"] += 1
            self._stats["batched_images"] += n

    # ---- request path -------------------------------------------------------

    def process_image(self, body: bytes, align: str | None = None) -> bytes:
        """Decode -> enqueue -> stitch/fix/encode. Runs on a handler thread;
        everything device-side happens via the dispatcher's single call."""
        from PIL import Image

        t_start = time.perf_counter()
        opts = self.opts
        img = Image.open(io.BytesIO(body)).convert("RGB")
        lq, src01, resize_flag, orig, true_hw = preprocess_sr_input(
            img, opts.process_size, opts.upscale, opts.size_bucket
        )

        method = align if align is not None else opts.align_method
        with self._lock:
            if self._stop.is_set():
                raise DispatchError("server shutting down")
            if self._in_flight >= opts.queue_depth:
                raise OverloadedError(self._in_flight)
            self._in_flight += 1
            self._seq += 1
            req = _Request(lq=lq, index=self._seq, true_hw=true_hw, align=method)
        try:
            self._queue.put(req)
            if not req.done.wait(timeout=opts.request_timeout_s):
                raise RequestTimeout(
                    f"no result within {opts.request_timeout_s}s (first compile "
                    "in flight? use --warmup to pre-compile)"
                )
            if req.error is not None:
                raise req.error
            fused = req.fused_used  # the path the dispatcher ACTUALLY ran
            out_pil = postprocess_sr_output(
                req.result, src01, true_hw,
                None if fused else self._fix.get(method),
                resize_flag, orig, opts.upscale, already01=fused,
            )
            buf = io.BytesIO()
            out_pil.save(buf, format="PNG")
            with self._lock:
                self._stats["requests"] += 1
                self._latencies.append(time.perf_counter() - t_start)
            return buf.getvalue()
        finally:
            with self._lock:
                self._in_flight -= 1

    def warmup(self):
        """Pre-compile each configured (H, W) input size (plus its bucket pad)
        so the first real request doesn't pay the XLA compile. Uses a noise
        image and the configured align_method so the jitted color-fix graph
        warms too (a constant image would degenerate adain's per-channel
        std)."""
        rng = np.random.default_rng(0)
        for h, w in self.opts.warmup_sizes:
            png = io.BytesIO()
            from PIL import Image

            Image.fromarray(rng.integers(0, 255, (h, w, 3), dtype=np.uint8)).save(
                png, format="PNG"
            )
            self.process_image(png.getvalue())
            self._warm.append([h, w])
        with self._lock:  # warmup traffic shouldn't count as served requests
            n = len(self.opts.warmup_sizes)
            self._stats["requests"] -= n
            for _ in range(min(n, len(self._latencies))):
                self._latencies.pop()

    def swap_infer_fn(self, infer_fn, fused_infer_fn=None):
        """Atomically replace the model behind the dispatcher (adapter
        hot-swap). In-flight groups finish on the old fn; queued requests
        take the new one. The first request after a swap retraces — with the
        persistent compilation cache that's a disk hit, not a fresh compile."""
        # order matters for lock-free readers: requests dispatched between
        # these two assignments run the OLD fused graph or the NEW plain fn —
        # both are complete models, never a mixed half-swap
        self.fused_infer_fn = fused_infer_fn
        self.infer_fn = infer_fn

    # ---- introspection ------------------------------------------------------

    def health(self) -> dict:
        import jax

        return {
            "status": "ok",
            "backend": jax.default_backend(),
            "devices": len(jax.devices()),
            "warm": list(self._warm),
            "uptime_s": round(time.time() - self._t0, 1),
        }

    def metrics(self) -> dict:
        with self._lock:
            lats = sorted(self._latencies)
            stats = dict(self._stats)
            in_flight = self._in_flight
        q = lambda p: round(lats[min(int(p * len(lats)), len(lats) - 1)] * 1e3, 2) if lats else None  # noqa: E731
        return {
            **stats,
            "in_flight": in_flight,
            "avg_batch": round(stats["batched_images"] / stats["batches"], 3)
            if stats["batches"]
            else None,
            "latency_ms_p50": q(0.50),
            "latency_ms_p90": q(0.90),
            "latency_ms_p99": q(0.99),
            "uptime_s": round(time.time() - self._t0, 1),
        }

    # ---- HTTP layer ---------------------------------------------------------

    def make_httpd(self, host: str = "127.0.0.1", port: int = 0) -> ThreadingHTTPServer:
        server = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet by default; metrics cover it
                pass

            def _send(self, code, body: bytes, ctype="application/json"):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _send_json(self, code, obj):
                self._send(code, json.dumps(obj).encode())

            def do_GET(self):
                if self.path.split("?")[0] == "/healthz":
                    self._send_json(200, server.health())
                elif self.path.split("?")[0] == "/metrics":
                    self._send_json(200, server.metrics())
                else:
                    self._send_json(404, {"error": "not found"})

            def do_POST(self):
                path, _, query = self.path.partition("?")
                if path in server.post_routes:
                    try:
                        n = int(self.headers.get("Content-Length", 0))
                        self._send_json(200, server.post_routes[path](self.rfile.read(n)))
                    except Exception as e:  # noqa: BLE001
                        with server._lock:
                            server._stats["errors"] += 1
                        self._send_json(400, {"error": f"{type(e).__name__}: {e}"})
                    return
                if path != "/v1/sr":
                    self._send_json(404, {"error": "not found"})
                    return
                params = dict(
                    p.split("=", 1) for p in query.split("&") if "=" in p
                )
                align = params.get("align")
                if align is not None and align not in ("adain", "wavelet", "nofix"):
                    self._send_json(400, {"error": f"unknown align {align!r}"})
                    return
                try:
                    n = int(self.headers.get("Content-Length", 0))
                    body = self.rfile.read(n)
                    png = server.process_image(body, align=align)
                    self._send(200, png, ctype="image/png")
                except OverloadedError as e:
                    with server._lock:
                        server._stats["errors"] += 1
                    self._send_json(503, {"error": f"overloaded ({e.args[0]} queued)"})
                except RequestTimeout as e:
                    with server._lock:
                        server._stats["errors"] += 1
                    self._send_json(504, {"error": str(e)})
                except DispatchError as e:  # device/model fault — retryable 5xx
                    with server._lock:
                        server._stats["errors"] += 1
                    self._send_json(502, {"error": str(e)})
                except Exception as e:  # noqa: BLE001 — bad input (undecodable image, ...)
                    with server._lock:
                        server._stats["errors"] += 1
                    self._send_json(400, {"error": f"{type(e).__name__}: {e}"})

        httpd = ThreadingHTTPServer((host, port), Handler)
        self._httpd = httpd
        return httpd

    def shutdown(self):
        self._stop.set()
        if self._httpd is not None:
            self._httpd.shutdown()
        self._dispatcher.join(timeout=5)


def make_fused_infer(pipeline_call, model_dtype):
    """Build the fused serving contract from a TRACEABLE pipeline call
    (`pipeline_call(lq, index) -> SR batch in [-1,1]` — the pipelines'
    default one-graph path; NOT the host-orchestrated exact-VAE mode).

    Returns `fused_fn(lq (B,H,W,3) f32 [-1,1], index, hw (B,2), align_idx
    (B,)) -> color-fixed batch in [0,1]`: SR + per-request masked color fix
    in ONE jitted dispatch. lq enters as float32 so the fix statistics see
    the same source precision as the CLI path; the SR step downcasts to
    `model_dtype` inside the graph."""
    import jax
    import jax.numpy as jnp

    from omgsr_tpu.ops.color import switched_color_fix_batch

    @jax.jit
    def fused(lq32, index, hw, align_idx):
        out = pipeline_call(lq32.astype(model_dtype), index)
        out01 = out.astype(jnp.float32) * 0.5 + 0.5
        src01 = lq32 * 0.5 + 0.5
        return switched_color_fix_batch(out01, src01, hw, align_idx)

    def fused_fn(lq, index, hw, align_idx):
        return fused(
            jnp.asarray(lq, jnp.float32),
            jnp.int32(index),
            jnp.asarray(hw, jnp.int32),
            jnp.asarray(align_idx, jnp.int32),
        )

    return fused_fn


class OverloadedError(RuntimeError):
    """Queue depth exceeded -> 503."""


class DispatchError(RuntimeError):
    """Device/model fault during dispatch (not a client error) -> 502."""


class RequestTimeout(RuntimeError):
    """No result within request_timeout_s -> 504."""
