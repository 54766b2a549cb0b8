"""On-chip latency probe for the int4 minimum-memory serving mode.

The infer CLIs expose `--quantize int4` as a documented ~5.95 GB storage
mode (weight-only; act-quant over an int4 tree raises — see
utils/quantize.py). Its QUALITY cost is quantified by
tools/probe_int4_quality.py; this probe pins down the LATENCY side at the
full 12B scale on the primary protocol geometry (-F 256->1024 x4, one
seq-4608 DiT pass, reference infer_omgsr_f.sh --process_size 1024):
int4 halves the weight bytes read per block vs int8 but adds the nibble
unpack + group-scale dequant to bf16 on the VPU — whether that nets out
faster or slower at a compute-dense seq-4608 pass is an empirical
question, answered here with bench.py's fencing discipline (fresh
urandom-seeded inputs, scalar-reduction fetch).

Usage:
  python tools/probe_int4_latency.py [--bits 4] [--iters 3]
Prints one JSON line: {"bits": B, "tree_gib": …, "s_per_image_p50": …}.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--bits", type=int, choices=[4, 8], default=4)
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from omgsr_tpu.inference.pipeline_f import OMGSRFPipeline
    from omgsr_tpu.models import vae
    from omgsr_tpu.models.configs import FLUX_DEV, FLUX_VAE
    from omgsr_tpu.ops.resize import resize
    from omgsr_tpu.utils.compilation_cache import enable_compilation_cache
    from omgsr_tpu.utils.quantize import init_flux_int8, tree_bytes

    enable_compilation_cache()
    rng = np.random.default_rng(int.from_bytes(__import__("os").urandom(4), "little"))
    dtype = jnp.bfloat16

    t0 = time.perf_counter()
    flux_q = init_flux_int8(
        jax.random.key(5), FLUX_DEV, block_dtype=dtype, repeat_blocks=True,
        bits=args.bits,
    )
    stage_s = time.perf_counter() - t0
    gib = tree_bytes(flux_q) / 2**30
    fvae = vae.init_vae(jax.random.key(6), FLUX_VAE, dtype=dtype)
    pipe = OMGSRFPipeline(fvae, flux_q, FLUX_VAE, FLUX_DEV)
    prompt = jnp.asarray(rng.normal(size=(1, 512, 4096)), dtype)
    pooled = jnp.asarray(rng.normal(size=(1, 768)), dtype)
    up = jax.jit(lambda x: resize(x, 1024, 1024, "bicubic"))

    def sr(lq256):
        return pipe(up(lq256), prompt, pooled, tile_size=128, tile_overlap=64)

    times = []
    for _ in range(args.iters + 1):  # first rep includes compile; dropped
        x = jnp.asarray(rng.uniform(-1, 1, (1, 256, 256, 3)), dtype)
        x = jax.block_until_ready(x)
        t = time.perf_counter()
        out = sr(x)
        float(jnp.mean(out))  # fence with a scalar fetch (CLAUDE.md timing gotcha)
        times.append(time.perf_counter() - t)
    reps = sorted(times[1:])
    print(json.dumps({
        "bits": args.bits,
        "tree_gib": round(gib, 3),
        "stage_s": round(stage_s, 1),
        "compile_rep_s": round(times[0], 2),
        "s_per_image_p50": round(reps[len(reps) // 2], 4),
        "reps": [round(t, 4) for t in times[1:]],
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
