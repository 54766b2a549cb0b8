"""int4-vs-int8 frozen-base fidelity at real DiT width — one command.

Quantifies what the int4 train-memory mode (utils.quantize bits=4, the
single-v5e 12B -F train fit) costs in forward fidelity relative to the
int8 serving storage, at the FULL 3072-wide FLUX block geometry (depth
reduced to keep staging fast; per-output-channel quantization error is a
function of width/weight statistics, not depth — every block is the same
distribution). Reports relative output deviation of the packed one-step
DiT forward against the bf16 reference on identical weights.

    python tools/probe_int4_quality.py [--layers 2 --single 3 --tokens 1024]

Run on CPU (force with OMGSR_PROBE_CPU=1) or the chip; the comparison is
weight-math, not latency — CLAUDE.md timing gotchas don't apply.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--single", type=int, default=3)
    p.add_argument("--tokens", type=int, default=1024)
    p.add_argument("--txt_tokens", type=int, default=128)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--weights", choices=["uniform", "normal", "heavytail"],
                   default="uniform",
                   help="weight statistics: uniform = raw kaiming init (absmax "
                   "saturates per group, so group scales buy ~nothing); normal / "
                   "heavytail (2%% of in-rows x8) approximate trained-checkpoint "
                   "regimes where group-wise int4 wins")
    args = p.parse_args(argv)

    if os.environ.get("OMGSR_PROBE_CPU") == "1":
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from dataclasses import replace

    from omgsr_tpu.diffusion.packing import latent_image_ids
    from omgsr_tpu.models import flux as F
    from omgsr_tpu.models.configs import FLUX_DEV
    from omgsr_tpu.utils.quantize import quantize_tree_int8, tree_bytes

    cfg = replace(FLUX_DEV, num_layers=args.layers, num_single_layers=args.single)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        params = F.stack_block_params(
            F.init_flux(jax.random.key(args.seed), cfg, dtype=jnp.float32)
        )
        if args.weights != "uniform":
            # redraw every quantizable dense kernel with the requested
            # statistics (std matched to the kaiming init's) — the uniform
            # init's absmax saturates inside any 128-sample group, hiding
            # the group-scale benefit real trained weights exhibit
            wrng = np.random.default_rng(args.seed + 1)

            def redraw(path, leaf):
                is_kernel = any(
                    getattr(k, "key", None) == "kernel" for k in path[-1:]
                )
                if not (is_kernel and leaf.ndim in (2, 3) and leaf.size >= 1 << 16):
                    return leaf
                std = float(np.asarray(leaf, np.float64).std())
                w = wrng.normal(0.0, std, leaf.shape)
                if args.weights == "heavytail":
                    n_in = leaf.shape[-2]
                    rows = wrng.choice(n_in, size=max(n_in // 50, 1), replace=False)
                    w[..., rows, :] *= 8.0  # outlier input channels
                return jnp.asarray(w, jnp.float32)

            params = jax.tree_util.tree_map_with_path(redraw, params)
        p8 = quantize_tree_int8(params)
        p4 = quantize_tree_int8(params, bits=4)  # group-wise (INT4_GROUP_SIZE)
        p4pc = quantize_tree_int8(params, bits=4, group_size=None)  # legacy per-channel
        p4g64 = quantize_tree_int8(params, bits=4, group_size=64)

    rng = np.random.default_rng(args.seed)
    side = int(args.tokens ** 0.5)
    img = jnp.asarray(rng.normal(size=(1, side * side, cfg.in_channels)), jnp.float32)
    txt = jnp.asarray(
        rng.normal(size=(1, args.txt_tokens, cfg.joint_attention_dim)), jnp.float32
    )
    pooled = jnp.asarray(
        rng.normal(size=(1, cfg.pooled_projection_dim)), jnp.float32
    )
    img_ids = latent_image_ids(side, side)
    txt_ids = jnp.zeros((args.txt_tokens, 3))

    @jax.jit
    def run(pp):
        return F.flux_apply(pp, cfg, img, 0.5, 1.0, pooled, txt, txt_ids, img_ids)

    ref = np.asarray(run(params), np.float64)
    out = {}
    for name, pp in (
        ("int8", p8), ("int4", p4), ("int4_perchannel", p4pc), ("int4_g64", p4g64),
    ):
        got = np.asarray(run(pp), np.float64)
        out[f"{name}_rel_dev"] = float(
            np.linalg.norm(got - ref) / max(np.linalg.norm(ref), 1e-12)
        )
        out[f"{name}_gib"] = round(tree_bytes(pp) / 2**30, 3)
    out["bf16_equiv_gib"] = round(tree_bytes(params) / 2**31, 3)  # f32/2
    out["width"] = cfg.num_attention_heads * cfg.attention_head_dim
    out["layers"] = [args.layers, args.single]
    out["weights"] = args.weights
    out["int4_over_int8_dev_ratio"] = round(
        out["int4_rel_dev"] / max(out["int8_rel_dev"], 1e-12), 2
    )
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    main()
