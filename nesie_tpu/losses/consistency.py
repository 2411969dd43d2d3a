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

    Args:
        center/ema_center: (B, P, 3); sem_scores: (B, P, C) logits;
        size: (B, P, 3) decoded sizes; aug record as in
        ``_align_teacher_centers``.
    """
    ema_center = _align_teacher_centers(ema_center, flip_x, flip_y, rot_mat, scale)

    d = jnp.sum((center[:, :, None] - ema_center[:, None]) ** 2, axis=-1)
    dist1 = jnp.min(d, axis=2)           # student -> nearest teacher
    ind1 = jnp.argmin(d, axis=2)
    dist2 = jnp.min(d, axis=1)           # teacher -> nearest student
    ind2 = jnp.argmin(d, axis=1)
    center_loss = jnp.mean(dist1 + dist2)

    # class consistency: KL(student_p || teacher_p at matched proposal)
    p_student = jax.nn.log_softmax(sem_scores, axis=-1)
    p_teacher = jax.nn.softmax(
        jnp.take_along_axis(ema_sem_scores, ind1[..., None], axis=1), axis=-1
    )
    class_loss = jnp.mean(
        jnp.sum(p_teacher * (jnp.log(jnp.maximum(p_teacher, 1e-12)) - p_student), -1)
    )

    size_teacher = jnp.take_along_axis(ema_size, ind1[..., None], axis=1)
    size_teacher = size_teacher * scale.reshape(scale.shape[0], 1, -1)
    size_loss = jnp.mean(jnp.sum((size - size_teacher) ** 2, axis=-1))

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


def lovasz_softmax(probs, labels, num_classes: int):
    """Multi-class Lovasz-softmax over flattened predictions.

    Args:
        probs: (N, C) softmax probabilities; labels: (N,) int.
    """
    losses = []
    for c in range(num_classes):
        fg = (labels == c).astype(probs.dtype)
        errors = jnp.abs(fg - probs[:, c])
        order = jnp.argsort(-errors)
        losses.append(jnp.sum(errors[order] * lovasz_grad(fg[order])))
    return jnp.mean(jnp.stack(losses))
