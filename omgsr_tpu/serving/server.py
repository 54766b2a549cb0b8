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

from omgsr_tpu.utils.image_io import (
    array01_to_pil,
    finalize_output,
    pil_to_array_01,
    pil_to_array_pm1,
    prepare_input,
)


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


@dataclass
class _Request:
    lq: np.ndarray  # (1, H, W, 3) in [-1, 1], bucket-padded
    index: int
    done: threading.Event = field(default_factory=threading.Event)
    result: object = None  # device array slice (1, H, W, 3) when done
    error: Exception | None = None


class SRServer:
    """Owns the dispatcher thread; HTTP handlers only decode/encode images.

    infer_fn(lq (B,H,W,3) float32 [-1,1], index) -> SR batch in [-1,1],
    asynchronously dispatched — the same contract as
    `inference.batch_runner.run_batch`.
    """

    def __init__(self, infer_fn, opts: ServeOptions | None = None, np_dtype=np.float32):
        import jax

        from omgsr_tpu.ops.color import adain_color_fix, wavelet_color_fix

        self.infer_fn = infer_fn
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
        self._dispatcher = threading.Thread(target=self._dispatch_loop, daemon=True)
        self._dispatcher.start()
        self._httpd: ThreadingHTTPServer | None = None

    # ---- dispatch -----------------------------------------------------------

    def _dispatch_loop(self):
        opts = self.opts
        while not self._stop.is_set():
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
                        # different bucket: dispatch it on its own next round
                        self._queue.put(nxt)
                        break
            self._dispatch_group(group)

    def _dispatch_group(self, group):
        opts = self.opts
        n = len(group)
        # pad to the fixed batch so each bucket compiles exactly once
        b = opts.max_batch if opts.max_batch > 1 else 1
        lq = np.concatenate([r.lq for r in group] + [group[-1].lq] * (b - n)).astype(
            self.np_dtype
        )
        try:
            out = self.infer_fn(lq, group[0].index)  # async device dispatch
            for j, r in enumerate(group):
                r.result = out[j : j + 1]
        except Exception as e:  # noqa: BLE001 — surfaced per-request as 500s
            for r in group:
                r.error = e
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

        import jax

        t_start = time.perf_counter()
        opts = self.opts
        img = Image.open(io.BytesIO(body)).convert("RGB")
        inp, resize_flag, orig = prepare_input(img, opts.process_size, opts.upscale)
        lq = pil_to_array_pm1(inp)
        src01 = pil_to_array_01(inp)
        true_hw = lq.shape[1:3]
        if opts.size_bucket:
            ph = (-lq.shape[1]) % opts.size_bucket
            pw = (-lq.shape[2]) % opts.size_bucket
            if ph or pw:
                lq = np.pad(lq, ((0, 0), (0, ph), (0, pw), (0, 0)), mode="reflect")

        with self._lock:
            if self._in_flight >= opts.queue_depth:
                raise OverloadedError(self._in_flight)
            self._in_flight += 1
            self._seq += 1
            req = _Request(lq=lq, index=self._seq)
        try:
            self._queue.put(req)
            req.done.wait()
            if req.error is not None:
                raise req.error
            out = req.result[:, : true_hw[0], : true_hw[1], :]
            out01 = out.astype(np.float32) * 0.5 + 0.5
            method = align if align is not None else opts.align_method
            fix = self._fix.get(method)
            if fix is not None:
                out01 = fix(out01, src01)
            out01 = np.asarray(jax.block_until_ready(out01))
            out_pil = array01_to_pil(out01)
            out_pil = finalize_output(out_pil, resize_flag, orig, opts.upscale)
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
        so the first real request doesn't pay the XLA compile."""
        for h, w in self.opts.warmup_sizes:
            png = io.BytesIO()
            from PIL import Image

            Image.new("RGB", (w, h)).save(png, format="PNG")
            self.process_image(png.getvalue(), align="nofix")
            self._warm.append([h, w])
        with self._lock:  # warmup traffic shouldn't count as served requests
            n = len(self.opts.warmup_sizes)
            self._stats["requests"] -= n
            for _ in range(min(n, len(self._latencies))):
                self._latencies.pop()

    def swap_infer_fn(self, infer_fn):
        """Atomically replace the model behind the dispatcher (adapter
        hot-swap). In-flight groups finish on the old fn; queued requests
        take the new one. The first request after a swap retraces — with the
        persistent compilation cache that's a disk hit, not a fresh compile."""
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
                except Exception as e:  # noqa: BLE001 — bad input or device error
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


class OverloadedError(RuntimeError):
    pass
