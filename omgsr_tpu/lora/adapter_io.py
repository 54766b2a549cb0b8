"""LoRA adapter (de)serialization.

Two formats:
  * native: one safetensors file of the LoRA tree with dotted keys +
    adapter_config.json (rank/targets), written per checkpoint step like the
    reference's ``weight-{step}/{adapter_name}`` layout
    (train/train_omgsr_s.py:507-518);
  * PEFT import: reads the reference's torch-PEFT adapter_model.safetensors
    (keys ``base_model.model.<module>.lora_{A,B}.weight``, torch layouts) so
    published OMGSR adapters can validate this pipeline.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np
from safetensors.numpy import load_file, save_file

from omgsr_tpu.utils.tree import flatten_dict, unflatten_dict


def save_adapter(lora_tree, path: str, *, rank: int, targets, extra_meta: dict | None = None):
    os.makedirs(path, exist_ok=True)
    flat = {
        ".".join(p): np.asarray(v, dtype=np.float32)
        for p, v in flatten_dict(lora_tree).items()
    }
    save_file(flat, os.path.join(path, "adapter_model.safetensors"))
    meta = {"r": rank, "lora_alpha": rank, "target_modules": list(targets), "format": "omgsr-tpu"}
    meta.update(extra_meta or {})
    with open(os.path.join(path, "adapter_config.json"), "w") as f:
        json.dump(meta, f, indent=2)


def load_adapter(path: str, dtype=jnp.float32):
    flat = load_file(os.path.join(path, "adapter_model.safetensors"))
    with open(os.path.join(path, "adapter_config.json")) as f:
        meta = json.load(f)
    tree = unflatten_dict(
        {tuple(k.split(".")): jnp.asarray(v, dtype) for k, v in flat.items()}
    )
    return tree, meta


def import_peft_adapter(path: str, dtype=jnp.float32):
    """Convert a torch-PEFT adapter dir (the reference's save format) into a
    LoRA tree matching this framework's param paths.

    Torch layouts converted: Linear lora_A (r, in) -> (in, r), lora_B
    (out, r) -> (r, out); Conv2d lora_A (r, in, kh, kw) -> (kh, kw, in, r),
    lora_B (out, r, 1, 1) -> (1, 1, r, out). If lora_alpha != r, alpha/r is
    folded into B so runtime scaling stays 1.0.
    """
    flat = load_file(os.path.join(path, "adapter_model.safetensors"))
    with open(os.path.join(path, "adapter_config.json")) as f:
        meta = json.load(f)
    scale = float(meta.get("lora_alpha", meta["r"])) / float(meta["r"])

    out = {}
    for key, w in flat.items():
        k = key
        for prefix in ("base_model.model.", "base_model."):
            if k.startswith(prefix):
                k = k[len(prefix) :]
                break
        # strip trailing ".weight" and ".default" adapter scoping
        k = k.replace(".default.weight", "").replace(".weight", "")
        if k.endswith(".lora_A"):
            mpath, leaf = k[: -len(".lora_A")], "lora_A"
        elif k.endswith(".lora_B"):
            mpath, leaf = k[: -len(".lora_B")], "lora_B"
        else:
            continue
        if w.ndim == 2:
            arr = w.T  # (r,in)->(in,r) or (out,r)->(r,out)
        elif w.ndim == 4:
            arr = w.transpose(2, 3, 1, 0)  # (o,i,kh,kw)->(kh,kw,i,o) with o/i = r pairs
        else:
            raise ValueError(f"unexpected adapter tensor ndim {w.ndim} for {key}")
        if leaf == "lora_B":
            arr = arr * scale
        out[tuple(mpath.split(".")) + (leaf,)] = jnp.asarray(np.ascontiguousarray(arr), dtype)
    return unflatten_dict(out), meta
