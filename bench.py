"""Benchmark: OMGSR-S-512 one-step SR latency on the current backend.

Prints ONE JSON line:
  {"metric": "omgsr_s_512_one_step_s_per_image", "value": <p50 seconds>,
   "unit": "s/image", "vs_baseline": <value / 1.0s north-star>}

The measured graph is the full production inference step at 512 px — VAE
encode, SD2.1 UNet (865M, bf16) at mid-timestep 273, x0 recovery, VAE
decode, clamp — compiled as ONE XLA program (random weights; latency is
weight-independent). Every iteration uses a fresh, run-unique input and is
individually fenced with block_until_ready, so request/result caches in the
execution path (e.g. the axon terminal's) cannot short-circuit the
measurement. The north-star reference point is the driver's <1 s/image
target (BASELINE.md); lower is better, vs_baseline < 1 beats it.
"""

import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import entry

    fn, args = entry()
    vae_params, unet_params, _, prompt = args
    jfn = jax.jit(fn)

    seed = int.from_bytes(os.urandom(4), "little")
    rng = np.random.default_rng(seed)

    def fresh_input():
        return jnp.asarray(
            rng.uniform(-1, 1, (1, 512, 512, 3)).astype(np.float32), jnp.bfloat16
        )

    # compile + warmup (scalar fetch forces end-to-end completion)
    out = jfn(vae_params, unet_params, fresh_input(), prompt)
    float(jnp.mean(out))

    times = []
    for _ in range(5):
        lq = jax.block_until_ready(fresh_input())
        t0 = time.perf_counter()
        out = jfn(vae_params, unet_params, lq, prompt)
        # a scalar reduction fetch cannot be served without running the
        # computation, unlike bare block_until_ready on some remote backends
        float(jnp.mean(out))
        times.append(time.perf_counter() - t0)

    p50 = float(np.median(times))
    result = {
        "metric": "omgsr_s_512_one_step_s_per_image",
        "value": round(p50, 5),
        "unit": "s/image",
        "vs_baseline": round(p50 / 1.0, 5),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
