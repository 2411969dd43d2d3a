"""SESS-style teacher-student consistency losses (reference
mmdet3d/models/losses/consistency.py — unused by the shipped configs,
kept for capability parity).

Teacher proposals are aligned into the student's augmented frame, matched
by chamfer, then center / class / size consistency terms are computed.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _align_teacher_centers(ema_center, flip_x, flip_y, rot_mat, scale):
    """Apply the student's augmentation record to teacher centers.

    Args:
        ema_center: (B, P, 3); flip_x/flip_y: (B,) bool;
        rot_mat: (B, 3, 3); scale: (B, 1, 3) or (B,).
    """
    c = ema_center
    c = c.at[..., 0].set(jnp.where(flip_x[:, None], -c[..., 0], c[..., 0]))
    c = c.at[..., 1].set(jnp.where(flip_y[:, None], -c[..., 1], c[..., 1]))
    c = jnp.einsum("bpj,bij->bpi", c, rot_mat)
    scale = scale.reshape(scale.shape[0], 1, -1)
    return c * scale


def decode_votenet_size(size_scores, size_residuals, mean_size_arr):
    """VoteNet-style size decode (reference consistency.py:83-97).

    Args:
        size_scores: (B, P, S) cluster logits; size_residuals: (B, P, S, 3);
        mean_size_arr: (S, 3).
    Returns (B, P, 3) decoded sizes.
    """
    cls = jnp.argmax(size_scores, axis=-1)
    res = jnp.take_along_axis(
        size_residuals, cls[..., None, None], axis=2)[:, :, 0]
    return jnp.asarray(mean_size_arr)[cls] + res


def consistency_losses(
    center,
    sem_scores,
    size,
    ema_center,
    ema_sem_scores,
    ema_size,
    flip_x,
    flip_y,
    rot_mat,
    scale,
):
    """Returns dict(center/class/size consistency) + total.

    Faithful to reference consistency.py:6-104 (oracle-tested in
    tests/test_reference_oracle5.py): proposals are matched per *teacher*
    proposal (``map_ind = ind2`` of ``nn_distance(center, ema_center)``,
    consistency.py:54-58), the class term is ``2 * F.kl_div(...,
    reduction='mean')`` i.e. an elementwise mean over B*P*C
    (consistency.py:71-74), and the size term is an elementwise-mean MSE
    between the map_ind-aligned student sizes and the scale-adjusted
    teacher sizes (consistency.py:98-102).

    Args:
        center/ema_center: (B, P, 3); sem_scores: (B, P, C) logits;
        size/ema_size: (B, P, 3) decoded sizes (``decode_votenet_size``);
        aug record as in ``_align_teacher_centers``.
    """
    ema_center = _align_teacher_centers(ema_center, flip_x, flip_y, rot_mat, scale)

    d = jnp.sum((center[:, :, None] - ema_center[:, None]) ** 2, axis=-1)
    dist1 = jnp.min(d, axis=2)           # student -> nearest teacher
    dist2 = jnp.min(d, axis=1)           # teacher -> nearest student
    ind2 = jnp.argmin(d, axis=1)         # per-teacher nearest student
    center_loss = jnp.mean(dist1 + dist2)
    map_ind = ind2

    # class consistency: student log-probs gathered per teacher proposal,
    # KL vs the teacher distribution, elementwise mean, x2.
    log_p = jax.nn.log_softmax(sem_scores, axis=-1)
    log_p_aligned = jnp.take_along_axis(log_p, map_ind[..., None], axis=1)
    q = jax.nn.softmax(ema_sem_scores, axis=-1)
    class_loss = 2.0 * jnp.mean(
        q * (jnp.log(jnp.maximum(q, 1e-12)) - log_p_aligned))

    size_aligned = jnp.take_along_axis(size, map_ind[..., None], axis=1)
    ema_size_s = ema_size * scale.reshape(scale.shape[0], 1, -1)
    size_loss = jnp.mean((size_aligned - ema_size_s) ** 2)

    total = center_loss + class_loss + size_loss
    return total, dict(
        center_consistency_loss=center_loss,
        class_consistency_loss=class_loss,
        size_consistency_loss=size_loss,
    )


def lovasz_grad(gt_sorted):
    """Gradient of the Lovasz extension w.r.t. sorted errors."""
    gts = jnp.sum(gt_sorted)
    n = gt_sorted.shape[0]
    intersection = gts - jnp.cumsum(gt_sorted)
    union = gts + jnp.cumsum(1.0 - gt_sorted)
    jaccard = 1.0 - intersection / jnp.maximum(union, 1e-12)
    return jnp.concatenate([jaccard[:1], jaccard[1:] - jaccard[:-1]])


def lovasz_hinge(logits, labels):
    """Binary Lovasz hinge (reference lovasz_loss.py, flattened).

    Args:
        logits: (N,); labels: (N,) in {0, 1}.
    """
    signs = 2.0 * labels - 1.0
    errors = 1.0 - logits * signs
    order = jnp.argsort(-errors)
    errors_sorted = errors[order]
    grad = lovasz_grad(labels[order])
    return jnp.sum(jax.nn.relu(errors_sorted) * grad)


def lovasz_softmax(probs, labels, num_classes: int, classes: str = "present"):
    """Multi-class Lovasz-softmax over flattened predictions.

    Faithful to reference lovasz_loss.py:52-82 (oracle-tested):
    ``classes="present"`` (the reference Lovasz3DLoss default) averages
    only over classes that appear in ``labels``; ``classes="all"``
    averages over every class (an absent class then contributes its
    largest predicted probability).

    Args:
        probs: (N, C) softmax probabilities; labels: (N,) int.
    """
    losses = []
    present = []
    for c in range(num_classes):
        fg = (labels == c).astype(probs.dtype)
        errors = jnp.abs(fg - probs[:, c])
        order = jnp.argsort(-errors)
        losses.append(jnp.sum(errors[order] * lovasz_grad(fg[order])))
        present.append(jnp.sum(fg) > 0)
    losses = jnp.stack(losses)
    if classes == "all":
        return jnp.mean(losses)
    mask = jnp.stack(present).astype(losses.dtype)
    return jnp.sum(losses * mask) / jnp.maximum(jnp.sum(mask), 1.0)
