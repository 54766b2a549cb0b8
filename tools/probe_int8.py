"""Reproducible probe for the device's effective int8 matmul rate.

Round-3 finding (CLAUDE.md perf notes): s8 x s8 -> s32 `dot_general` in a
scanned chain peaks ~140-160 TOPS on the v5e through BOTH XLA and a Pallas
blocked kernel — not the datasheet 394 TOPS — so w8a8 buys ~1.3-1.4x over
bf16, not 2x. This script re-runs that measurement in one command so the
ceiling can be re-checked whenever libtpu/XLA updates land (roadmap item 3).

Method: a chain of DEPTH dependent matmuls over scan-stacked weights (the
shape class the FLUX w8a8 path actually executes — see
omgsr_tpu/models/layers.py dense), timed with scalar-fetch fencing and fresh
urandom-seeded inputs (bare block_until_ready lies on the tunnel — CLAUDE.md
timing gotchas). The bf16 and int8 reps are INTERLEAVED pairwise — tunnel
throughput drifts up to ~1.7x run-to-run, so back-to-back blocks corrupt the
ratio; the per-round paired ratio is drift-immune and the report carries the
median AND max of each series (r4 recorded a 87.5 TOP/s outlier where
history says 140-160 — single-shot medians over sequential blocks are not
noise-robust). Prints one JSON line per dtype config plus a summary.

Usage:
    python tools/probe_int8.py [--m 4608] [--k 3072] [--n 3072] [--depth 32]
"""

from __future__ import annotations

import argparse
import json
import os
import time

import numpy as np


def _fresh(rng, shape, dtype):
    if dtype == "int8":
        return rng.integers(-127, 128, shape, dtype=np.int8)
    return rng.standard_normal(shape, dtype=np.float32)


def _make_chain(m, k, n, depth, lhs_dtype, rhs_dtype, acc_dtype):
    """Returns (timed_rep_fn, ops): timed_rep_fn() runs one fenced chain on a
    fresh input and returns elapsed seconds; compiled+warmed on first call
    via `warmup()`."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(int.from_bytes(os.urandom(4), "little"))
    w = jnp.asarray(_fresh(rng, (depth, k, n), rhs_dtype)).astype(rhs_dtype)

    @jax.jit
    def chain(x, w):
        # keep the lhs FIXED and accumulate a full reduction of each product:
        # feeding outputs forward needs a per-step renorm whose elementwise
        # int32 passes cost as much as the dot itself (measured: it halves
        # the apparent rate) — the reduction forces every dot to execute
        # (y.sum() cannot be narrowed to fewer lhs rows) at ~1 cheap pass
        def body(acc, wi):
            y = jax.lax.dot_general(
                x, wi, (((1,), (0,)), ((), ())),
                preferred_element_type=acc_dtype,
            )
            return acc + y.astype(jnp.float32).sum(), None

        acc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), w)
        return acc

    def fresh_input():
        return jnp.asarray(_fresh(rng, (m, k), lhs_dtype)).astype(lhs_dtype)

    def warmup():
        float(jnp.mean(chain(fresh_input(), w).astype(jnp.float32)))

    def rep():
        x = jax.block_until_ready(fresh_input())
        t0 = time.perf_counter()
        float(jnp.mean(chain(x, w).astype(jnp.float32)))  # scalar-fetch fence
        return time.perf_counter() - t0

    return warmup, rep, 2.0 * m * k * n * depth


def probe_interleaved(m, k, n, depth, iters):
    """Paired bf16/int8 rounds; returns the summary dict (also printed)."""
    import jax.numpy as jnp

    wu_bf, rep_bf, ops = _make_chain(m, k, n, depth, jnp.bfloat16, jnp.bfloat16, jnp.float32)
    wu_s8, rep_s8, _ = _make_chain(m, k, n, depth, "int8", "int8", jnp.int32)
    wu_bf()
    wu_s8()
    t_bf, t_s8 = [], []
    for _ in range(iters):
        t_bf.append(rep_bf())
        t_s8.append(rep_s8())
    tf = lambda ts: ops / np.asarray(ts) / 1e12  # noqa: E731 — TOP/s series
    r_bf, r_s8 = tf(t_bf), tf(t_s8)
    ratios = r_s8 / r_bf  # paired per round: tunnel drift cancels
    out = {
        "m": m, "k": k, "n": n, "depth": depth, "rounds": iters,
        "bf16_tf_per_s_median": round(float(np.median(r_bf)), 1),
        "bf16_tf_per_s_max": round(float(np.max(r_bf)), 1),
        "int8_top_per_s_median": round(float(np.median(r_s8)), 1),
        "int8_top_per_s_max": round(float(np.max(r_s8)), 1),
        "int8_over_bf16_median": round(float(np.median(ratios)), 3),
        "int8_over_bf16_max": round(float(np.max(ratios)), 3),
        "int8_path_opened": bool(np.median(ratios) > 1.6),
        "note": "datasheet v5e ratio is 2.0; ~1.1-1.4 measured through this "
                "stack as of 2026-08 (CLAUDE.md) — int8_path_opened flags a "
                "jump toward 2x meaning w8a8 should be re-tuned",
    }
    print(json.dumps(out), flush=True)
    return out


def probe(name, m, k, n, depth, iters, lhs_dtype, rhs_dtype, acc_dtype):
    """Single-dtype probe (kept for ad-hoc use; the interleaved path is the
    noise-robust default)."""
    warmup, rep, ops = _make_chain(m, k, n, depth, lhs_dtype, rhs_dtype, acc_dtype)
    warmup()
    times = [rep() for _ in range(iters)]
    sec = float(np.median(times))
    print(json.dumps({
        "probe": name, "m": m, "k": k, "n": n, "depth": depth,
        "s": round(sec, 5), "top_per_s": round(ops / sec / 1e12, 3),
        "top_per_s_max": round(ops / min(times) / 1e12, 3),
    }), flush=True)
    return ops / sec / 1e12


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--m", type=int, default=4608, help="tokens (the -F@1024 seq)")
    p.add_argument("--k", type=int, default=3072, help="model dim (FLUX width)")
    p.add_argument("--n", type=int, default=3072)
    p.add_argument("--depth", type=int, default=32, help="chained matmuls")
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args(argv)

    import jax

    print(f"# devices: {jax.devices()}", flush=True)
    probe_interleaved(args.m, args.k, args.n, args.depth, args.iters)


if __name__ == "__main__":
    main()
