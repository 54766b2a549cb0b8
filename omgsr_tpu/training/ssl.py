"""DINOv3 SSL pretraining building blocks — heads, schedules, param groups.

Re-owns the trainer-side pieces of the vendored SSL stack that sit off
OMGSR's execution path (dinov3/layers/dino_head.py, dinov3/train/
cosine_lr_scheduler.py, dinov3/train/param_groups.py, and the EMA teacher
update in dinov3/train/ssl_meta_arch.py:707-720). Design choices for TPU:

- The DINO/iBOT projection head is a pure function over a param dict whose
  key paths mirror the torch state dict (mlp.0 / mlp.2 / ... / last_layer),
  so a hub checkpoint ports mechanically and the torch parity test is a
  straight tree walk.
- Schedules are precomputed numpy tables (exactly like the reference's
  CosineScheduler, cosine_lr_scheduler.py:13-51): the host indexes the
  table and passes scalars into the jitted step — no iteration-dependent
  retracing, no dynamic control flow under jit.
- Param groups become two multiplier *trees* (lr, wd) aligned with the
  param tree, consumed by `scale_by_tree` / masked weight decay inside one
  optax chain — the functional equivalent of torch param groups
  (param_groups.py:56-109 semantics, including the code's actual
  weight-decay condition, not its comment).
- The EMA teacher update is a jittable tree_map; momentum arrives as a
  scalar argument from the schedule table.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

__all__ = [
    "init_dino_head",
    "dino_head_apply",
    "cosine_schedule",
    "linear_warmup_cosine_decay",
    "TabulatedSchedule",
    "vit_lr_decay_rate",
    "ssl_param_groups",
    "last_layer_mask",
    "scale_by_tree",
    "make_ssl_optimizer",
    "ema_update",
]


# ---------------------------------------------------------------------------
# DINO head (dino_head.py:11-68)
# ---------------------------------------------------------------------------


def _trunc_normal(key, shape, std=0.02, dtype=jnp.float32):
    # torch trunc_normal_(std=0.02) truncates at +-2 std
    return jax.random.truncated_normal(key, -2.0, 2.0, shape, jnp.float32).astype(
        dtype
    ) * std


def _init_head_dense(key, in_dim, out_dim, bias=True, dtype=jnp.float32):
    p = {"kernel": _trunc_normal(key, (in_dim, out_dim), 0.02, dtype)}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), dtype)
    return p


def init_dino_head(
    key,
    in_dim: int,
    out_dim: int,
    hidden_dim: int = 2048,
    bottleneck_dim: int = 256,
    nlayers: int = 3,
    mlp_bias: bool = True,
    dtype=jnp.float32,
):
    """3-layer MLP -> L2 normalize -> prototype layer (dino_head.py:11-50).

    Key paths mirror the torch Sequential state dict: for nlayers >= 2 the
    MLP lives at mlp.{0, 2, 4, ...} (GELUs occupy the odd slots); for
    nlayers == 1 `mlp` is the single dense itself. `last_layer` has no bias
    (the K prototypes). trunc_normal(0.02) / zero-bias init (:34-41).
    """
    nlayers = max(nlayers, 1)
    keys = jax.random.split(key, nlayers + 1)
    if nlayers == 1:
        mlp = _init_head_dense(keys[0], in_dim, bottleneck_dim, mlp_bias, dtype)
    else:
        mlp = {"0": _init_head_dense(keys[0], in_dim, hidden_dim, mlp_bias, dtype)}
        for i in range(nlayers - 2):
            mlp[str(2 * (i + 1))] = _init_head_dense(
                keys[i + 1], hidden_dim, hidden_dim, mlp_bias, dtype
            )
        mlp[str(2 * (nlayers - 1))] = _init_head_dense(
            keys[nlayers - 1], hidden_dim, bottleneck_dim, mlp_bias, dtype
        )
    return {
        "mlp": mlp,
        "last_layer": _init_head_dense(keys[nlayers], bottleneck_dim, out_dim, False, dtype),
    }


def _head_dense(p, x):
    y = x @ p["kernel"].astype(x.dtype)
    if "bias" in p:
        y = y + p["bias"].astype(x.dtype)
    return y


def dino_head_apply(params, x, no_last_layer: bool = False, only_last_layer: bool = False):
    """(..., in_dim) -> (..., out_dim) logits (dino_head.py:43-50)."""
    if not only_last_layer:
        mlp = params["mlp"]
        if "kernel" in mlp:  # nlayers == 1
            x = _head_dense(mlp, x)
        else:
            for i, idx in enumerate(sorted(mlp, key=int)):
                if i > 0:
                    x = jax.nn.gelu(x, approximate=False)
                x = _head_dense(mlp[idx], x)
        eps = 1e-6 if x.dtype == jnp.float16 else 1e-12
        x32 = x.astype(jnp.float32)
        x = (x32 / jnp.maximum(jnp.linalg.norm(x32, axis=-1, keepdims=True), eps)).astype(
            x.dtype
        )
    if not no_last_layer:
        x = _head_dense(params["last_layer"], x)
    return x


# ---------------------------------------------------------------------------
# Schedules (cosine_lr_scheduler.py:13-90)
# ---------------------------------------------------------------------------


def cosine_schedule(
    base_value: float,
    final_value: float,
    total_iters: int,
    warmup_iters: int = 0,
    start_warmup_value: float = 0.0,
    freeze_iters: int = 0,
    trunc_extra: float = 0.0,
) -> np.ndarray:
    """The reference CosineScheduler's precomputed table (:24-46):
    [freeze zeros | linear warmup | (possibly truncated) cosine]."""
    freeze = np.zeros((freeze_iters,))
    warmup = np.linspace(start_warmup_value, base_value, warmup_iters)
    cosine_steps = total_iters - warmup_iters - freeze_iters
    if trunc_extra == 0.0:
        iters = np.arange(cosine_steps)
        sched = final_value + 0.5 * (base_value - final_value) * (
            1 + np.cos(np.pi * iters / len(iters))
        )
    else:
        iters = np.linspace(0, np.pi, int((1 + trunc_extra) * cosine_steps))[:cosine_steps]
        sched = (np.cos(iters) + 1) / 2
        sched = (sched - sched[-1]) / (1 - sched[-1])
        sched = sched * (base_value - final_value) + final_value
    out = np.concatenate((freeze, warmup, sched), dtype=np.float64)
    assert len(out) == total_iters
    return out


def linear_warmup_cosine_decay(
    start: float,
    peak: float,
    end: float,
    warmup_iterations: int,
    total_iterations: int,
    cosine_iterations: int | None = None,
) -> np.ndarray:
    """linear warmup -> cosine -> constant tail (:54-90)."""
    linear = np.linspace(start, peak, warmup_iterations, endpoint=False)
    if cosine_iterations is None:
        cosine_iterations = total_iterations - warmup_iterations
    cos = (np.cos(np.linspace(0, np.pi, cosine_iterations)) + 1) / 2
    cos = (peak - end) * cos + end
    remaining = total_iterations - cosine_iterations - warmup_iterations
    assert remaining >= 0
    return np.concatenate([linear, cos, np.full((remaining,), end)])


class TabulatedSchedule:
    """__getitem__ semantics of the reference CosineScheduler (:47-51):
    clamp past the end to final_value. Wraps any precomputed table."""

    def __init__(self, table: np.ndarray, final_value: float | None = None):
        self.table = np.asarray(table, np.float64)
        self.final_value = float(table[-1]) if final_value is None else float(final_value)

    def __len__(self):
        return len(self.table)

    def __getitem__(self, it: int) -> float:
        return self.final_value if it >= len(self.table) else float(self.table[it])


# ---------------------------------------------------------------------------
# Param groups (param_groups.py:12-109) as multiplier trees
# ---------------------------------------------------------------------------

_LAYER0_MARKERS = ("pos_embed", "patch_embed", "mask_token", "cls_token", "storage_tokens")


def vit_lr_decay_rate(path: str, lr_decay_rate: float, num_layers: int) -> float:
    """Layerwise lr decay for one param path (param_groups.py:12-53,
    force_is_backbone branch): embeddings/tokens get layer 0, blocks.N gets
    N+1, everything else (final norm, heads) num_layers+1."""
    layer_id = num_layers + 1
    if any(m in path for m in _LAYER0_MARKERS):
        layer_id = 0
    elif "blocks." in path and "residual." not in path:
        layer_id = int(path[path.find("blocks.") :].split(".")[1]) + 1
    return lr_decay_rate ** (num_layers + 1 - layer_id)


def ssl_param_groups(
    params,
    lr_decay_rate: float = 1.0,
    num_layers: int = 12,
    patch_embed_lr_mult: float = 1.0,
    dino_head_wd_multiplier: float = 1.0,
):
    """(lr_mult_tree, wd_mult_tree) aligned with `params`.

    Mirrors get_params_groups_with_decay (param_groups.py:56-109): the
    weight-decay zero set is exactly the code's condition — paths ending in
    "bias" or containing "norm"/"gamma" (biases, LN/RMS scale+bias via the
    norm path component, LayerScale gamma). Frozen buffers (rope periods)
    get lr multiplier 0 — they are torch *buffers*, absent from
    named_parameters, so the reference never optimizes them either.
    """

    def walk(node, path):
        if isinstance(node, dict):
            lr, wd = {}, {}
            for k, v in node.items():
                lr[k], wd[k] = walk(v, f"{path}.{k}" if path else k)
            return lr, wd
        name = path
        if "rope_embed" in name:
            return 0.0, 0.0
        lr_mult = vit_lr_decay_rate(name, lr_decay_rate, num_layers)
        if "patch_embed" in name:
            lr_mult *= patch_embed_lr_mult
        wd_mult = 1.0
        if "dino_head" in name:
            wd_mult = dino_head_wd_multiplier
        # our "scale" is torch's norm weight; the torch condition catches it
        # via the module path containing "norm", which our paths share
        if name.endswith("bias") or "norm" in name or "gamma" in name:
            wd_mult = 0.0
        return lr_mult, wd_mult

    return walk(params, "")


def last_layer_mask(params):
    """Static bool tree marking the DINO/iBOT head prototype layers — the
    reference's `is_last_layer` param group (param_groups.py:93-100), whose
    lr is overridden by the last_layer_lr schedule (zeroed for the first
    freeze_last_layer_epochs, train/train.py:142-147, :481-487)."""

    def walk(node, path):
        if isinstance(node, dict):
            return {k: walk(v, f"{path}.{k}" if path else k) for k, v in node.items()}
        return "last_layer" in path

    return walk(params, "")


def scale_by_tree(mult_tree):
    """optax transform multiplying each update leaf by its multiplier."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return (
            jax.tree.map(lambda u, m: u * m, updates, mult_tree),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def _decay_by_tree(wd_mult_tree, weight_decay):
    """Decoupled AdamW weight decay with per-leaf multipliers: adds
    wd * mult * param to the (pre-lr) update direction."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        if params is None:
            raise ValueError("weight decay needs params")
        new = jax.tree.map(
            lambda u, p, m: u + weight_decay * m * p, updates, params, wd_mult_tree
        )
        return new, state

    return optax.GradientTransformation(init_fn, update_fn)


def _scale_by_split_lr(mask_tree, learning_rate, last_layer_lr):
    """Final (negated) lr scale with a per-leaf static choice between the
    main lr and the last-layer lr — torch's two schedule-driven groups
    (train/train.py apply_optim_scheduler:227-236) as one transform."""

    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        return (
            jax.tree.map(
                lambda u, is_ll: u * (-last_layer_lr if is_ll else -learning_rate),
                updates,
                mask_tree,
            ),
            state,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def make_ssl_optimizer(
    lr_mult_tree,
    wd_mult_tree,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    clip_norm: float = 3.0,
    last_layer_mask_tree=None,
):
    """AdamW with per-leaf lr and weight-decay multipliers — the functional
    equivalent of the reference's fused param groups driven by its
    schedule tables (train/train.py applies lr/wd schedules to every group
    each iteration; param_groups.py:111-123 fuses groups by multiplier).

    `learning_rate` and `weight_decay` are injected hyperparams: the host
    reads them from the schedule tables and overwrites
    `opt_state.hyperparams[...]` each step — scalars cross the jit
    boundary as state leaves, so no retrace.

    With `last_layer_mask_tree` (from `last_layer_mask`), a third injected
    hyperparam `last_layer_lr` drives the masked leaves instead of
    `learning_rate` — the reference's separate last-layer group whose lr is
    zeroed for the first freeze_last_layer_epochs (train.py:142-147)."""
    if last_layer_mask_tree is None:
        return optax.inject_hyperparams(
            lambda learning_rate, weight_decay: optax.chain(
                optax.clip_by_global_norm(clip_norm),
                optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
                scale_by_tree(lr_mult_tree),
                _decay_by_tree(wd_mult_tree, weight_decay),
                optax.scale_by_learning_rate(learning_rate),
            )
        )(learning_rate=0.0, weight_decay=0.0)
    return optax.inject_hyperparams(
        lambda learning_rate, weight_decay, last_layer_lr: optax.chain(
            optax.clip_by_global_norm(clip_norm),
            optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
            scale_by_tree(lr_mult_tree),
            _decay_by_tree(wd_mult_tree, weight_decay),
            _scale_by_split_lr(last_layer_mask_tree, learning_rate, last_layer_lr),
        )
    )(learning_rate=0.0, weight_decay=0.0, last_layer_lr=0.0)


# ---------------------------------------------------------------------------
# EMA teacher (ssl_meta_arch.py:707-720)
# ---------------------------------------------------------------------------


def ema_update(teacher_params, student_params, momentum):
    """teacher <- m * teacher + (1 - m) * student, jittable; momentum is a
    scalar from the schedule table (ssl_meta_arch.py:707-720's
    torch._foreach_mul_/add_ pass)."""
    m = jnp.asarray(momentum, jnp.float32)
    return jax.tree.map(
        lambda t, s: (m * t.astype(jnp.float32) + (1.0 - m) * s.astype(jnp.float32)).astype(
            t.dtype
        ),
        teacher_params,
        student_params,
    )
