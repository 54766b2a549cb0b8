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
timing gotchas). Prints one JSON line per dtype config with achieved TOP/s.

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


def probe(name, m, k, n, depth, iters, lhs_dtype, rhs_dtype, acc_dtype):
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

    out = chain(fresh_input(), w)  # compile + warmup
    float(jnp.mean(out.astype(jnp.float32)))
    times = []
    for _ in range(iters):
        x = jax.block_until_ready(fresh_input())
        t0 = time.perf_counter()
        float(jnp.mean(chain(x, w).astype(jnp.float32)))  # scalar-fetch fence
        times.append(time.perf_counter() - t0)
    sec = float(np.median(times))
    ops = 2.0 * m * k * n * depth
    print(json.dumps({
        "probe": name, "m": m, "k": k, "n": n, "depth": depth,
        "s": round(sec, 5), "top_per_s": round(ops / sec / 1e12, 3),
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
    import jax.numpy as jnp

    print(f"# devices: {jax.devices()}", flush=True)
    m, k, n, d, it = args.m, args.k, args.n, args.depth, args.iters
    bf16 = probe("bf16xbf16->f32", m, k, n, d, it, jnp.bfloat16, jnp.bfloat16, jnp.float32)
    s8 = probe("s8xs8->s32", m, k, n, d, it, "int8", "int8", jnp.int32)
    print(json.dumps({
        "int8_over_bf16": round(s8 / bf16, 3),
        "note": "datasheet v5e ratio is 2.0; ~0.7-0.85 measured through this "
                "stack as of 2026-08 (see CLAUDE.md) — a jump toward 2x means "
                "the int8 MXU path opened up and w8a8 should be re-tuned",
    }), flush=True)


if __name__ == "__main__":
    main()
