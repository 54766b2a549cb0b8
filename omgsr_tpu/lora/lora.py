"""LoRA: injection by module-path matching, functional application, merge.

Reference semantics re-implemented (peft.LoraConfig usage at
train/train_omgsr_s.py:60-115, train/train_omgsr_f.py:131-178):
  * targets matched by dotted-name suffix against module paths, e.g. "to_q",
    "conv1", "to_out.0", "ff.net.0.proj";
  * rank r with alpha == r (scaling 1.0 — the reference always sets
    lora_alpha=rank; the PEFT importer folds alpha/r into B otherwise);
  * "gaussian" init: A ~ N(0, 1/r), B = 0  (peft init_lora_weights="gaussian");
  * dense delta  = x @ A(in,r) @ B(r,out);
  * conv delta   = conv(x, A(kh,kw,in,r)) then 1x1 conv B(1,1,r,out)
    (peft wraps Conv2d the same way);
  * merge-and-unload folds the delta into the base kernel
    (infer/omgsr_s_infer_model.py:16-23).

Mechanically: a LoRA tree mirrors the base param tree at matched modules
with {"lora_A","lora_B"} leaves. ``attach_lora`` returns a combined tree the
model apply-fns consume — ``layers.dense``/``layers.conv2d`` add the
low-rank delta whenever those keys are present. Training differentiates
w.r.t. the LoRA tree only; ``attach_lora`` is pure tree surgery (free under
jit).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from omgsr_tpu.utils.tree import flatten_dict, unflatten_dict

# train/train_omgsr_s.py:60-100 (same list for VAE encoder and UNet)
SD_TARGET_MODULES = (
    "conv1",
    "conv2",
    "conv_in",
    "conv_shortcut",
    "conv",
    "conv_out",
    "to_k",
    "to_q",
    "to_v",
    "to_out.0",
)

# train/train_omgsr_f.py:154-169
FLUX_TARGET_MODULES = (
    "x_embedder",
    "attn.to_k",
    "attn.to_q",
    "attn.to_v",
    "attn.to_out.0",
    "attn.add_k_proj",
    "attn.add_q_proj",
    "attn.add_v_proj",
    "attn.to_add_out",
    "ff.net.0.proj",
    "ff.net.2",
    "ff_context.net.0.proj",
    "ff_context.net.2",
)


def path_matches_targets(module_path: str, targets) -> bool:
    """peft-style suffix match on the dotted module path."""
    for t in targets:
        if module_path == t or module_path.endswith("." + t):
            return True
    return False


def _iter_matched_kernels(params, targets):
    flat = flatten_dict(params)
    for path, leaf in flat.items():
        if path[-1] not in ("kernel", "kernel_q", "kernel_q4"):
            continue
        # strip the scan-stack marker so suffix matching sees the module path
        # (transformer_blocks.stacked.attn.to_q -> transformer_blocks.attn.to_q)
        mkeys = tuple(k for k in path[:-1] if k != "stacked")
        module_path = ".".join(mkeys)
        if path_matches_targets(module_path, targets):
            stacked = "stacked" in path
            yield path[:-1], leaf, stacked, path[-1] == "kernel_q4"


def init_lora_tree(key, params, targets, rank: int, dtype=None):
    """Build a LoRA tree for every matched kernel in ``params``.

    Also covers scan-stacked layouts (a leading block axis on every kernel,
    models.flux.stack_block_params) and int8/int4-quantized frozen bases
    (``kernel_q``/``kernel_q4`` leaves, utils.quantize — int4's in dim is
    the packed dim doubled): LoRA factors get the same leading axis so
    lax.scan slices them alongside the block params, and default to
    bfloat16 when the base is quantized (training the adapters in the
    compute dtype while the frozen base stays compressed)."""
    out = {}
    matched = list(_iter_matched_kernels(params, targets))
    if not matched:
        raise ValueError(f"no modules matched targets {targets}")
    keys = jax.random.split(key, len(matched))
    for k, (mpath, kernel, stacked, packed4) in zip(keys, matched):
        kdtype = dtype or (
            jnp.bfloat16
            if kernel.dtype in (jnp.int8, jnp.uint8)
            else kernel.dtype
        )
        ndim = kernel.ndim - (1 if stacked else 0)
        lead = (kernel.shape[0],) if stacked else ()
        if ndim == 2:  # dense (in, out)
            in_dim, out_dim = kernel.shape[-2:]
            if packed4:  # int4 stores two in-rows per byte (utils.quantize)
                in_dim *= 2
            a = jax.random.normal(k, lead + (in_dim, rank), kdtype) * (1.0 / rank)
            b = jnp.zeros(lead + (rank, out_dim), kdtype)
        elif ndim == 4:  # conv (kh, kw, in, out)
            kh, kw, in_ch, out_ch = kernel.shape[-4:]
            a = jax.random.normal(k, lead + (kh, kw, in_ch, rank), kdtype) * (1.0 / rank)
            b = jnp.zeros(lead + (1, 1, rank, out_ch), kdtype)
        else:
            raise ValueError(f"unsupported kernel ndim {kernel.ndim} at {mpath}")
        out[mpath + ("lora_A",)] = a
        out[mpath + ("lora_B",)] = b
    return unflatten_dict(out)


def attach_lora(base_params, lora_tree):
    """Combined tree: matched module dicts gain lora_A/lora_B keys."""
    flat = flatten_dict(base_params)
    flat.update(flatten_dict(lora_tree))
    return unflatten_dict(flat)


def split_lora(combined):
    """Inverse of attach_lora: -> (base_params, lora_tree)."""
    base, lora = {}, {}
    for path, leaf in flatten_dict(combined).items():
        (lora if path[-1] in ("lora_A", "lora_B") else base)[path] = leaf
    return unflatten_dict(base), unflatten_dict(lora)


def _merged_kernel(kernel, a, b):
    if kernel.ndim == 2:
        delta = a.astype(jnp.float32) @ b.astype(jnp.float32)
    elif kernel.ndim == 3:  # scan-stacked dense (L, in, out)
        delta = jnp.einsum("lir,lro->lio", a.astype(jnp.float32), b.astype(jnp.float32))
    else:
        delta = jnp.einsum("hwir,xyro->hwio", a.astype(jnp.float32), b.astype(jnp.float32))
    return (kernel.astype(jnp.float32) + delta).astype(kernel.dtype)


def merge_lora(base_params, lora_tree):
    """Fold the LoRA delta into base kernels ("merge_and_unload" parity,
    infer/omgsr_s_infer_model.py:22-23)."""
    flat = flatten_dict(base_params)
    lflat = flatten_dict(lora_tree)
    mpaths = {p[:-1] for p in lflat if p[-1] == "lora_A"}
    for mpath in mpaths:
        if mpath + ("kernel",) not in flat and (
            mpath + ("kernel_q",) in flat or mpath + ("kernel_q4",) in flat
        ):
            raise ValueError(
                f"cannot merge LoRA into a quantized kernel at {'.'.join(mpath)}: "
                "merge into the float base before quantize_tree_int8/int4, or keep "
                "the adapter attached (attach_lora applies it at run time)"
            )
        flat[mpath + ("kernel",)] = _merged_kernel(
            flat[mpath + ("kernel",)], lflat[mpath + ("lora_A",)], lflat[mpath + ("lora_B",)]
        )
    return unflatten_dict(flat)


# containers whose numeric children are scan-stacked blocks (models.flux
# .stack_block_params) — NOT arbitrary numeric keys like resnets.0/to_out.0
_SCAN_CONTAINERS = ("transformer_blocks", "single_transformer_blocks")


def stack_lora_tree(lora_tree):
    """Inverse of unstack_lora_tree: per-block indexed LoRA subtrees under
    the scan containers gain a leading block axis under a "stacked" key — so
    an exported (interchange-format) adapter can attach to a scan-stacked
    base (stacked int8 serving/training trees)."""

    def rec(node, key=None):
        if not isinstance(node, dict):
            return node
        keys = list(node.keys())
        if key in _SCAN_CONTAINERS and keys and all(k.isdigit() for k in keys):
            sub = [node[k] for k in sorted(keys, key=int)]
            return {"stacked": jax.tree.map(lambda *xs: jnp.stack(xs), *sub)}
        return {k: rec(v, k) for k, v in node.items()}

    return rec(lora_tree)


def unstack_lora_tree(lora_tree):
    """Convert a scan-stacked LoRA tree ({"stacked": subtree with a leading
    block axis on every leaf}) into per-block indexed layout ({"0": ..},
    matching the unstacked param tree and the adapter interchange format)."""
    import numpy as np

    def rec(node):
        if not isinstance(node, dict):
            return node
        if tuple(node.keys()) == ("stacked",):
            leaves = jax.tree.leaves(node["stacked"])
            n = int(leaves[0].shape[0])
            return {
                str(i): jax.tree.map(lambda x: np.asarray(x)[i], node["stacked"])
                for i in range(n)
            }
        return {k: rec(v) for k, v in node.items()}

    return rec(lora_tree)


def lora_param_count(lora_tree) -> int:
    import numpy as np

    return sum(int(np.prod(l.shape)) for l in jax.tree.leaves(lora_tree))
