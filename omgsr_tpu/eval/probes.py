"""Frozen-feature evaluation probes: weighted k-NN, linear grid, logistic
regression.

Re-owns the classification heads of the vendored eval suite
(dinov3/eval/{knn,linear,log_regression}.py) the TPU way:

- k-NN (knn.py KnnModule:96-185): the torch version hand-rolls a
  rank-by-rank broadcast + partial-topk + gather pipeline over NCCL. Here
  the similarity matmul, top-k, and temperature-softmax vote are plain jnp
  in one jitted graph — shard the test batch over a `data` mesh axis and
  XLA reproduces that pipeline from shardings.
- Linear probe (linear.py:148-235): the torch version trains a dict of
  classifier modules in one optimizer. Here the (lr-)grid is a single
  vmapped SGD+momentum+cosine train loop via lax.scan — every grid member
  trains simultaneously on the MXU from one compile.
- Logistic regression (log_regression.py:110-230): replaces the
  sklearn/cuml L-BFGS dependency with optax.lbfgs on the identical
  objective (sum CE + ||W||^2 / (2C), bias unpenalized) and the same
  C sweep grid 10**linspace(-6, 5, 45).

Feature extraction uses the standard 256-resize/224-center-crop eval
transform (data/transforms.py make_classification_eval_transform).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from PIL import Image

from omgsr_tpu.data.ssl import IMAGENET_MEAN, IMAGENET_STD

# log_regression.py:61
C_POWER_RANGE = np.linspace(-6, 5, 45)


# ---------------------------------------------------------------------------
# eval transform + feature extraction
# ---------------------------------------------------------------------------


def make_eval_transform(resize_size: int = 256, crop_size: int = 224):
    """Resize-shortest-side -> center crop -> ImageNet normalize
    (data/transforms.py:76-95 classification eval preset)."""

    def transform(img: Image.Image) -> np.ndarray:
        w, h = img.size
        scale = resize_size / min(w, h)
        img = img.resize((round(w * scale), round(h * scale)), Image.BICUBIC)
        w, h = img.size
        left, top = (w - crop_size) // 2, (h - crop_size) // 2
        img = img.crop((left, top, left + crop_size, top + crop_size))
        x = np.asarray(img.convert("RGB"), np.float32) / 255.0
        return (x - IMAGENET_MEAN) / IMAGENET_STD

    return transform


def list_imagefolder(d: str):
    """dir-per-class listing -> (paths, labels, classes). Returns PATHS, not
    decoded images: ImageNet-scale splits (1.28M train images) cannot be
    held as resident RGB buffers — extract_features decodes lazily per
    batch."""
    import os

    classes = sorted(x for x in os.listdir(d) if os.path.isdir(os.path.join(d, x)))
    if not classes:
        raise FileNotFoundError(f"no class subdirectories under {d}")
    paths, labels = [], []
    for ci, c in enumerate(classes):
        cd = os.path.join(d, c)
        for f in sorted(os.listdir(cd)):
            paths.append(os.path.join(cd, f))
            labels.append(ci)
    return paths, np.asarray(labels), classes


def extract_features(
    apply_fn: Callable,
    images: Sequence,
    batch_size: int = 64,
    transform=None,
):
    """Run `apply_fn` (params-closed jitted forward returning (B, D)) over
    images host-batched; pads the tail batch so one graph serves every
    step (eval/utils.py extract_features, minus the distributed gather —
    shardings handle that under pjit). Items may be PIL images, arrays, or
    path strings — paths are opened lazily per batch and closed after the
    transform, so memory stays O(batch) regardless of split size."""
    transform = transform or make_eval_transform()

    def load(im):
        if isinstance(im, (str, bytes)) or hasattr(im, "__fspath__"):
            with Image.open(im) as f:
                return transform(f.convert("RGB"))
        return transform(im)

    feats = []
    for i in range(0, len(images), batch_size):
        chunk = [load(im) for im in images[i : i + batch_size]]
        n = len(chunk)
        while len(chunk) < batch_size:
            chunk.append(chunk[-1])
        out = np.asarray(apply_fn(jnp.asarray(np.stack(chunk))))
        feats.append(out[:n])
    return np.concatenate(feats, axis=0)


# ---------------------------------------------------------------------------
# k-NN (knn.py:96-185)
# ---------------------------------------------------------------------------


def knn_classify(
    train_features,
    train_labels,
    test_features,
    *,
    ks: Sequence[int] = (10, 20, 100, 200),
    T: float = 0.07,
    num_classes: int,
    skip_first_nn: bool = False,
):
    """Temperature-weighted k-NN vote (KnnModule.forward:168-185).

    similarity = test @ train.T; top max(ks) (+1 when skipping self);
    vote = softmax(sims / T); class probability = sum of one-hot neighbor
    labels weighted by the vote over the first k neighbors. Returns
    {k: (B, num_classes)} probabilities. Features should be L2-normalized
    by the caller (cosine similarity), as upstream does.
    """
    max_k = max(ks) + int(skip_first_nn)
    sims = test_features.astype(jnp.float32) @ train_features.astype(jnp.float32).T
    topk_sims, idx = jax.lax.top_k(sims, min(max_k, sims.shape[1]))
    neighbor_labels = jnp.take(train_labels, idx)  # (B, max_k)
    if skip_first_nn:
        topk_sims = topk_sims[:, 1:]
        neighbor_labels = neighbor_labels[:, 1:]
    vote = jax.nn.softmax(topk_sims / T, axis=1)  # (B, max_k)
    onehot = jax.nn.one_hot(neighbor_labels, num_classes, dtype=vote.dtype)
    weighted = onehot * vote[:, :, None]
    return {k: jnp.sum(weighted[:, :k, :], axis=1) for k in ks}


# ---------------------------------------------------------------------------
# Linear probe grid (linear.py:148-235, Evaluator:274-350)
# ---------------------------------------------------------------------------

# linear.py:81
DEFAULT_LR_LIST = (1e-5, 2e-5, 5e-5, 1e-4, 2e-4, 5e-4, 1e-3, 2e-3, 5e-3, 1e-2, 2e-2, 5e-2, 0.1)


def create_linear_input(x_tokens_list, use_n_blocks: int, use_avgpool: bool):
    """(patch, cls) pairs from get_intermediate_layers -> probe input
    (linear.py:148-160): concat the last n blocks' cls tokens, optionally
    + the last block's mean patch token."""
    tail = x_tokens_list[-use_n_blocks:]
    out = jnp.concatenate([cls for _, cls in tail], axis=-1)
    if use_avgpool:
        out = jnp.concatenate([out, jnp.mean(tail[-1][0], axis=1)], axis=-1)
    return out.astype(jnp.float32)


def scale_lr(lr, batch_size):
    """linear.py:208-209: lr * global_batch / 256."""
    return lr * batch_size / 256.0


@dataclasses.dataclass
class LinearProbeResult:
    accuracies: np.ndarray  # (n_lrs,)
    best_lr: float
    best_accuracy: float
    params: dict  # best classifier {kernel, bias}


def train_linear_probes(
    key,
    train_features,
    train_labels,
    val_features,
    val_labels,
    *,
    num_classes: int,
    learning_rates: Sequence[float] = DEFAULT_LR_LIST,
    epochs: int = 10,
    batch_size: int = 128,
    momentum: float = 0.9,
) -> LinearProbeResult:
    """Train the whole lr grid simultaneously: one vmapped SGD(momentum)
    + cosine-annealed lr loop over minibatches via lax.scan. Init matches
    linear.py:172-174 (weight ~ N(0, 0.01), zero bias). Returns per-lr
    val accuracy and the argmax classifier, mirroring
    _evaluate_linear_classifiers' best-head selection (linear.py:295-350).
    """
    n, d = train_features.shape
    lrs = jnp.asarray(learning_rates, jnp.float32)
    n_lr = len(learning_rates)
    steps_per_epoch = max(n // batch_size, 1)
    total_steps = epochs * steps_per_epoch

    k_w, k_perm = jax.random.split(jax.random.fold_in(key, 0))
    w0 = {
        "kernel": jax.random.normal(k_w, (n_lr, d, num_classes), jnp.float32) * 0.01,
        "bias": jnp.zeros((n_lr, num_classes), jnp.float32),
    }
    vel0 = jax.tree.map(jnp.zeros_like, w0)

    # one epoch-agnostic permutation stream: fixed-size minibatches via
    # reshaped gather indices (static shapes; tail drop like drop_last)
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, n)[: steps_per_epoch * batch_size]
    )(jax.random.split(k_perm, epochs))
    batches = perms.reshape(total_steps, batch_size)

    x = jnp.asarray(train_features, jnp.float32)
    y = jnp.asarray(train_labels)

    def loss_fn(p, xb, yb):
        logits = xb @ p["kernel"] + p["bias"]
        return jnp.mean(
            -jax.nn.log_softmax(logits)[jnp.arange(xb.shape[0]), yb]
        )

    grad_one = jax.grad(loss_fn)

    def step(carry, inp):
        w, vel, it = carry
        idx = inp
        xb, yb = x[idx], y[idx]
        # cosine annealing to 0 (linear.py SchedulerType.COSINE_ANNEALING)
        sched = 0.5 * (1.0 + jnp.cos(jnp.pi * it / total_steps))
        grads = jax.vmap(lambda wk, bk: grad_one({"kernel": wk, "bias": bk}, xb, yb))(
            w["kernel"], w["bias"]
        )
        lr_t = (lrs * sched)[:, None, None]
        vel = {
            "kernel": momentum * vel["kernel"] + grads["kernel"],
            "bias": momentum * vel["bias"] + grads["bias"],
        }
        w = {
            "kernel": w["kernel"] - lr_t * vel["kernel"],
            "bias": w["bias"] - lr_t[:, 0] * vel["bias"],
        }
        return (w, vel, it + 1.0), None

    (w, _, _), _ = jax.lax.scan(step, (w0, vel0, jnp.float32(0)), batches)

    logits = jnp.einsum("bd,ldc->lbc", jnp.asarray(val_features, jnp.float32), w["kernel"]) + w["bias"][:, None]
    acc = jnp.mean(
        (jnp.argmax(logits, -1) == jnp.asarray(val_labels)[None]).astype(jnp.float32),
        axis=1,
    )
    accs = np.asarray(acc)
    best = int(np.argmax(accs))
    return LinearProbeResult(
        accuracies=accs,
        best_lr=float(learning_rates[best]),
        best_accuracy=float(accs[best]),
        params={
            "kernel": np.asarray(w["kernel"][best]),
            "bias": np.asarray(w["bias"][best]),
        },
    )


# ---------------------------------------------------------------------------
# Logistic regression (log_regression.py:110-230)
# ---------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("num_classes", "max_iters"))
def _fit_logreg(x, y, c, *, num_classes: int, max_iters: int):
    """One compile serves every C in a sweep: C enters as a TRACED scalar
    (a closure-captured Python float would force one XLA compile per C —
    45 remote compiles on the default grid)."""
    import optax

    d = x.shape[1]
    params = {
        "kernel": jnp.zeros((d, num_classes), jnp.float32),
        "bias": jnp.zeros((num_classes,), jnp.float32),
    }

    def objective(p):
        logits = x @ p["kernel"] + p["bias"]
        ce = -jax.nn.log_softmax(logits)[jnp.arange(x.shape[0]), y]
        return jnp.sum(ce) + jnp.sum(p["kernel"] ** 2) / (2.0 * c)

    opt = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(objective)
    state = opt.init(params)

    def body(_, carry):
        params, state = carry
        value, grad = value_and_grad(params, state=state)
        updates, state = opt.update(
            grad, state, params, value=value, grad=grad, value_fn=objective
        )
        return optax.apply_updates(params, updates), state

    params, _ = jax.lax.fori_loop(0, max_iters, body, (params, state))
    return params


def logistic_regression(
    train_features,
    train_labels,
    *,
    num_classes: int,
    C: float = 1.0,
    max_iters: int = 200,
):
    """Full-batch multinomial logistic regression via optax.lbfgs on the
    sklearn objective the reference fits (LogRegModule:110-143): minimize
    sum_i CE_i + ||W||^2 / (2C), bias unpenalized. Returns {kernel, bias}."""
    x = jnp.asarray(train_features, jnp.float32)
    y = jnp.asarray(train_labels)
    return _fit_logreg(
        x, y, jnp.float32(C), num_classes=num_classes, max_iters=max_iters
    )


def sweep_logreg_C(
    train_features,
    train_labels,
    val_features,
    val_labels,
    *,
    num_classes: int,
    c_powers: Sequence[float] | None = None,
    max_iters: int = 100,
):
    """sweep_C_values (log_regression.py:167-218): fit per C, pick the
    best val accuracy. Returns (best_C, best_acc, {C: acc})."""
    powers = C_POWER_RANGE if c_powers is None else np.asarray(c_powers)
    results = {}
    best = (None, -1.0, None)
    for p in powers:
        c = float(10.0**p)
        params = logistic_regression(
            train_features, train_labels, num_classes=num_classes, C=c, max_iters=max_iters
        )
        logits = jnp.asarray(val_features, jnp.float32) @ params["kernel"] + params["bias"]
        acc = float(
            jnp.mean((jnp.argmax(logits, -1) == jnp.asarray(val_labels)).astype(jnp.float32))
        )
        results[c] = acc
        if acc > best[1]:
            best = (c, acc, params)
    return best[0], best[1], results


# ---------------------------------------------------------------------------
# classification metrics (eval/metrics/{classification,imagenet_c}.py)
# ---------------------------------------------------------------------------


def top_k_accuracy(logits, labels, ks: Sequence[int] = (1, 5)):
    """Micro-averaged top-k accuracies (build_topk_accuracy_metric,
    eval/metrics/classification.py:141-146, torchmetrics semantics).
    Returns {"top-k": float}."""
    logits = jnp.asarray(logits)
    labels = jnp.asarray(labels)
    kmax = int(max(ks))
    _, topi = jax.lax.top_k(logits, min(kmax, logits.shape[-1]))
    hits = topi == labels[:, None]
    return {
        f"top-{k}": float(jnp.mean(jnp.any(hits[:, : min(k, hits.shape[1])], axis=1)))
        for k in ks
    }


# Published AlexNet baseline corruption errors (Hendrycks & Dietterich,
# ImageNet-C) — the normalization constants the reference carries at
# eval/metrics/imagenet_c.py:23-157; level order 1..5.
ALEXNET_INVERSE_SCORES = {
    "GAUSSIAN_NOISE": (0.69528, 0.82542, 0.93554, 0.98138, 0.99452),
    "SHOT_NOISE": (0.71224, 0.85108, 0.93574, 0.98182, 0.99146),
    "IMPULSE_NOISE": (0.78374, 0.89808, 0.9487, 0.9872, 0.99548),
    "DEFOCUS_BLUR": (0.656239999999999, 0.73202, 0.85036, 0.91364, 0.94714),
    "GLASS_BLUR": (0.64308, 0.75054, 0.88806, 0.91622, 0.93344),
    "MOTION_BLUR": (0.5843, 0.70048, 0.82108, 0.8975, 0.92638),
    "ZOOM_BLUR": (0.70008, 0.769919999999999, 0.80784, 0.84198, 0.87198),
    "SNOW": (0.71726, 0.88392, 0.86468, 0.9187, 0.94952),
    "FROST": (0.6139, 0.797339999999999, 0.8879, 0.89942, 0.9343),
    "FOG": (0.67474, 0.7605, 0.84378, 0.8726, 0.945),
    "BRIGHTNESS": (0.4514, 0.48502, 0.54048, 0.62166, 0.724399999999999),
    "CONTRAST": (0.64548, 0.7615, 0.88874, 0.9776, 0.9927),
    "ELASTIC_TRANSFORM": (0.52596, 0.70116, 0.55686, 0.64076, 0.80554),
    "PIXELATE": (0.52218, 0.5462, 0.737279999999999, 0.87092, 0.91262),
    "JPEG_COMPRESSION": (0.510019999999999, 0.54718, 0.57294, 0.654579999999999, 0.74778),
    "SPECKLE_NOISE": (0.66192, 0.7444, 0.90246, 0.94548, 0.97268),
    "GAUSSIAN_BLUR": (0.54732, 0.70444, 0.82574, 0.89864, 0.9594),
    "SPATTER": (0.47196, 0.621939999999999, 0.75052, 0.84132, 0.90182),
    "SATURATE": (0.59342, 0.65514, 0.51174, 0.70834, 0.8226),
}


def imagenet_c_mce(scores: dict, inv_scores_ref: dict | None = None) -> float:
    """Mean corruption error relative to the AlexNet baseline
    (compute_relative_average_scores, eval/metrics/imagenet_c.py:168-185;
    lower is better). scores: {corruption: {level: top-1 accuracy}} —
    corruptions absent from `scores` are skipped, like the reference."""
    ref = inv_scores_ref or {
        k: {level + 1: v for level, v in enumerate(vals)}
        for k, vals in ALEXNET_INVERSE_SCORES.items()
    }
    rel = []
    for corruption, ref_levels in ref.items():
        if corruption not in scores:
            continue
        errs, ref_errs = [], []
        for level in sorted(ref_levels):
            if level not in scores[corruption]:
                continue
            errs.append(1.0 - scores[corruption][level])
            ref_errs.append(ref_levels[level])
        rel.append(np.mean(errs) / np.mean(ref_errs))
    return float(np.mean(rel))
