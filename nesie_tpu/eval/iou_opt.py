"""Test-time IoU optimization (reference iou_opt_test,
votenet_nesie.py:501-571): a few steps of gradient *ascent* on the
predicted IoU score w.r.t. proposal center and size before NMS.

In JAX this is simply ``jax.grad`` of the quality module inside a
``fori_loop`` — no optimizer object or autograd bookkeeping needed.
Off by default in every shipped config (test_cfg.iou_opt=False); provided
for capability parity.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def iou_opt_boxes(
    model,
    variables,
    results,
    opt_rate: float = 5e-4,
    opt_step: int = 10,
    dataset_name: str = "ScanNet",
):
    """Returns results with bbox_preds refined by IoU-score ascent."""
    bbox = results["bbox_preds"]
    heading = bbox[..., 6]
    heading_q = jnp.zeros_like(heading) if dataset_name == "ScanNet" else heading

    def iou_sum(center, size):
        iou = model.apply(
            variables,
            results,
            center,
            size,
            heading_q,
            method=type(model).quality_scores,
        )
        return jnp.sum(iou)

    grad_fn = jax.grad(iou_sum, argnums=(0, 1))

    def body(_, cs):
        center, size = cs
        gc, gs = grad_fn(center, size)
        return center + opt_rate * gc, size + opt_rate * gs

    # the reference's `while True: ...; count += 1; if count > opt_step:
    # break` applies opt_step + 1 gradient updates (votenet_nesie.py:
    # 540-560), not opt_step
    center, size = jax.lax.fori_loop(
        0, opt_step + 1, body, (bbox[..., :3], bbox[..., 3:6])
    )
    refined = jnp.concatenate([center, size, heading[..., None]], axis=-1)
    out = dict(results)
    out["bbox_preds"] = refined
    return out
