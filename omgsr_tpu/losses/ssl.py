"""DINOv3 SSL objectives (DINO cls-token, iBOT patch, KoLeo, Gram) — pure jnp.

Re-owns the vendored SSL loss library the reference ships off OMGSR's
execution path (dinov3/loss/{dino_clstoken_loss,ibot_patch_loss,koleo_loss,
gram_loss}.py). The torch originals are stateful nn.Modules with async NCCL
all-reduces baked in; here every loss is a pure function and the
"distributed" variants take an optional mesh `axis_name` — under pjit /
shard_map the same code runs single-device (axis_name=None) or batch-sharded
(psum over the data axis replaces torch.distributed.all_reduce). Centering
state (the EMA `center` buffer) is threaded explicitly: `update_center`
returns the new center instead of mutating a module buffer.

Parity is tested against the vendored implementations themselves under a
1-process torch.distributed group (tests/test_ssl_losses.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _psum(x, axis_name):
    return jax.lax.psum(x, axis_name) if axis_name is not None else x


def _l2_normalize(x, eps=1e-8):
    # torch F.normalize: x / max(||x||, eps)
    n = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return x / jnp.maximum(n, eps)


# ---------------------------------------------------------------------------
# DINO cls-token loss (dino_clstoken_loss.py:16-126)
# ---------------------------------------------------------------------------


def dino_softmax_center_teacher(teacher_logits, center, teacher_temp):
    """Centered+sharpened teacher distribution (:36-40). teacher_logits
    (..., K), center (1, K) or (K,)."""
    return jax.nn.softmax(
        (teacher_logits - center.reshape(1, -1)) / teacher_temp, axis=-1
    )


def dino_update_center(center, teacher_logits, momentum=0.9, axis_name=None):
    """EMA center update (:104-126), functional: returns the new center.
    teacher_logits (B, K); under a sharded batch pass axis_name to average
    over the global batch (the torch version's async all_reduce)."""
    batch_sum = jnp.sum(teacher_logits, axis=0, keepdims=True)
    count = jnp.asarray(teacher_logits.shape[0], batch_sum.dtype)
    batch_sum = _psum(batch_sum, axis_name)
    count = _psum(count, axis_name)
    return center * momentum + (batch_sum / count) * (1.0 - momentum)


def sinkhorn_knopp(
    teacher_logits,
    teacher_temp,
    n_iterations: int = 3,
    axis_name=None,
    total_samples=None,
    sample_mask=None,
):
    """Sinkhorn-Knopp teacher assignment (:42-71): rows (prototypes) ->
    uniform 1/K mass, columns (samples) -> uniform 1/B. teacher_logits
    (B, K) local shard; total_samples overrides the global sample count
    (the iBOT variant passes the global number of masked patches). Returns
    (B, K) assignments summing to 1 per sample.

    `sample_mask` (B,) bool is the static-shape TPU replacement for the
    reference's dynamic masked-patch gather (ssl_meta_arch.py:455-462
    index_select + n_masked_patches_tensor): excluded samples carry zero
    mass through every normalization, so the masked rows of the result
    equal running the reference on the gathered subset exactly while the
    array shape stays (B, K) for a single compiled graph. Excluded rows
    come back as zeros."""
    q = jnp.exp(teacher_logits.astype(jnp.float32) / teacher_temp).T  # (K, B)
    k = q.shape[0]
    if sample_mask is not None:
        q = q * sample_mask[None].astype(q.dtype)
    if total_samples is None:
        count = (
            jnp.sum(sample_mask.astype(jnp.float32))
            if sample_mask is not None
            else jnp.asarray(q.shape[1], jnp.float32)
        )
        total_samples = _psum(count, axis_name)
    b = jnp.asarray(total_samples, jnp.float32)
    q = q / _psum(jnp.sum(q), axis_name)

    def body(_, q):
        rows = _psum(jnp.sum(q, axis=1, keepdims=True), axis_name)
        q = q / rows / k
        cols = jnp.sum(q, axis=0, keepdims=True)
        # excluded columns are exactly zero; keep them zero instead of 0/0
        q = jnp.where(cols > 0, q / jnp.where(cols > 0, cols, 1.0) / b, 0.0)
        return q

    q = jax.lax.fori_loop(0, n_iterations, body, q)
    return (q * b).T


def dino_loss(
    student_logits, teacher_probs, student_temp=0.1, ignore_diagonal=False
):
    """Cross-entropy between teacher probabilities and student log-softmax
    (:73-101). student_logits (S, B, K) — S student crops; teacher_probs
    (T, B, K) summing to 1 over K. ignore_diagonal skips s == t pairs
    (same-crop self-distillation)."""
    s_crops, b, _ = student_logits.shape
    t_crops = teacher_probs.shape[0]
    logp = jax.nn.log_softmax(
        student_logits.astype(jnp.float32) / student_temp, axis=-1
    )
    per_pair = -jnp.einsum("sbk,tbk->st", logp, teacher_probs.astype(jnp.float32))
    if not ignore_diagonal:
        return jnp.sum(per_pair) / (b * s_crops * t_crops)
    m = min(s_crops, t_crops)
    per_pair = per_pair - per_pair * jnp.eye(s_crops, t_crops, dtype=per_pair.dtype)
    return jnp.sum(per_pair) / (b * s_crops * t_crops - b * m)


# ---------------------------------------------------------------------------
# iBOT patch loss (ibot_patch_loss.py:62-146)
# ---------------------------------------------------------------------------


def ibot_softmax_center_teacher(teacher_patch_logits, center, teacher_temp):
    """(:78-82). teacher_patch_logits (B, N, K), center broadcastable (K,)."""
    return jax.nn.softmax(
        (teacher_patch_logits - center.reshape(1, 1, -1)) / teacher_temp, axis=-1
    )


def ibot_update_center(center, teacher_patch_logits, momentum=0.9, axis_name=None):
    """EMA over the per-image patch mean (:124-146)."""
    batch_sum = jnp.sum(
        jnp.mean(teacher_patch_logits, axis=1), axis=0, keepdims=True
    )
    count = jnp.asarray(teacher_patch_logits.shape[0], batch_sum.dtype)
    return center * momentum + (
        _psum(batch_sum, axis_name) / _psum(count, axis_name)
    ) * (1.0 - momentum)


def ibot_patch_loss(
    student_patch_logits, teacher_probs, student_masks, student_temp=0.1
):
    """Masked-patch cross-entropy (:84-96): per image, mean CE over the
    masked patches; then mean over images. student_patch_logits /
    teacher_probs (B, N, K); student_masks (B, N) bool."""
    logp = jax.nn.log_softmax(
        student_patch_logits.astype(jnp.float32) / student_temp, axis=-1
    )
    ce = jnp.sum(teacher_probs.astype(jnp.float32) * logp, axis=-1)  # (B, N)
    w = student_masks.astype(jnp.float32)
    per_image = jnp.sum(ce * w, axis=-1) / jnp.clip(jnp.sum(w, axis=-1), 1.0)
    return -jnp.mean(per_image)


# ---------------------------------------------------------------------------
# KoLeo (koleo_loss.py:14-44)
# ---------------------------------------------------------------------------


def koleo_loss(student_output, eps=1e-8):
    """Kozachenko-Leonenko differential-entropy regularizer: -mean log of
    the distance to each sample's nearest neighbor (:33-44). L2-normalizes,
    finds NN by max inner product (diagonal excluded), and mirrors torch
    PairwiseDistance's ||x - y + eps|| epsilon placement."""
    x = _l2_normalize(student_output.astype(jnp.float32), eps)
    dots = x @ x.T
    n = x.shape[0]
    dots = jnp.where(jnp.eye(n, dtype=bool), -1.0, dots)
    idx = jnp.argmax(dots, axis=1)
    distances = jnp.linalg.norm(x - x[idx] + eps, axis=-1)
    return -jnp.mean(jnp.log(distances + eps))


# ---------------------------------------------------------------------------
# Gram loss (gram_loss.py:11-86)
# ---------------------------------------------------------------------------


def gram_loss(
    output_feats,
    target_feats,
    apply_norm: bool = True,
    img_level: bool = True,
    remove_neg: bool = True,
    remove_only_teacher_neg: bool = False,
):
    """MSE between student and teacher feature Gram (similarity) matrices
    (:34-86). img_level=True computes per-image (B, N, N) similarities;
    False flattens to one (B*N, B*N) matrix. remove_neg zeroes negative
    similarities on both sides; remove_only_teacher_neg reproduces the
    upstream branch order exactly (the teacher mask is applied first, so
    the student-side condition can never fire — an upstream no-op kept for
    behavioral parity)."""
    assert not (remove_neg and remove_only_teacher_neg)
    s = output_feats.astype(jnp.float32)
    t = target_feats.astype(jnp.float32)
    if apply_norm:
        s = _l2_normalize(s)
        t = _l2_normalize(t)
    if not img_level:
        if s.ndim == 3:
            s = s.reshape(-1, s.shape[-1])
        if t.ndim == 3:
            t = t.reshape(-1, t.shape[-1])
    t_sim = t @ jnp.swapaxes(t, -1, -2)
    s_sim = s @ jnp.swapaxes(s, -1, -2)
    if remove_neg:
        t_sim = jnp.maximum(t_sim, 0.0)
        s_sim = jnp.maximum(s_sim, 0.0)
    elif remove_only_teacher_neg:
        t_sim = jnp.maximum(t_sim, 0.0)
        s_sim = jnp.where((s_sim < 0) & (t_sim < 0), 0.0, s_sim)
    return jnp.mean((s_sim - t_sim) ** 2)


def masked_gram_loss(
    output_feats,
    target_feats,
    mask,
    apply_norm: bool = True,
    remove_neg: bool = True,
    remove_only_teacher_neg: bool = False,
):
    """gram_loss restricted to the rows selected by `mask` — the
    static-shape TPU form of the reference's `patches[masks]` boolean
    gather (ssl_meta_arch.py:509-512, then gram_loss.py on the (n_sel, D)
    subset). Row L2-normalization is per-row, so selecting before or after
    normalizing is identical; the subset Gram MSE equals the full-batch
    pairwise error weighted by w_i * w_j and renormalized. Exact, shapes
    static. output/target (B, N, D) or (M, D); mask matches the leading
    dims."""
    assert not (remove_neg and remove_only_teacher_neg)
    s = output_feats.astype(jnp.float32).reshape(-1, output_feats.shape[-1])
    t = target_feats.astype(jnp.float32).reshape(-1, target_feats.shape[-1])
    w = mask.astype(jnp.float32).reshape(-1)
    if apply_norm:
        s = _l2_normalize(s)
        t = _l2_normalize(t)
    t_sim = t @ t.T
    s_sim = s @ s.T
    if remove_neg:
        t_sim = jnp.maximum(t_sim, 0.0)
        s_sim = jnp.maximum(s_sim, 0.0)
    elif remove_only_teacher_neg:
        t_sim = jnp.maximum(t_sim, 0.0)
        s_sim = jnp.where((s_sim < 0) & (t_sim < 0), 0.0, s_sim)
    pair_w = w[:, None] * w[None, :]
    denom = jnp.maximum(jnp.sum(pair_w), 1.0)
    return jnp.sum(pair_w * (s_sim - t_sim) ** 2) / denom
