"""Gaussian heatmap utilities (reference mmdet3d/core/utils/gaussian.py —
CenterPoint-legacy helpers, unused by the shipped configs)."""
from __future__ import annotations

import jax.numpy as jnp


def gaussian_2d(shape, sigma: float = 1.0):
    """(m, n) gaussian kernel."""
    m, n = ((s - 1.0) / 2.0 for s in shape)
    y = jnp.arange(-m, m + 1)[:, None]
    x = jnp.arange(-n, n + 1)[None, :]
    h = jnp.exp(-(x * x + y * y) / (2 * sigma * sigma))
    return jnp.where(h < jnp.finfo(h.dtype).eps * h.max(), 0.0, h)


def draw_heatmap_gaussian(heatmap, center, radius: int, k: float = 1.0):
    """Splat one gaussian of given integer radius at integer center
    (max-composited, as the reference does)."""
    d = 2 * radius + 1
    g = gaussian_2d((d, d), sigma=d / 6.0) * k
    H, W = heatmap.shape
    cx, cy = center
    y = jnp.arange(H)[:, None]
    x = jnp.arange(W)[None, :]
    gy = jnp.clip(y - (cy - radius), 0, d - 1)
    gx = jnp.clip(x - (cx - radius), 0, d - 1)
    vals = g[gy, gx]
    inside = (
        (y >= cy - radius) & (y <= cy + radius)
        & (x >= cx - radius) & (x <= cx + radius)
    )
    return jnp.maximum(heatmap, jnp.where(inside, vals, 0.0))


def gaussian_radius(det_size, min_overlap: float = 0.5):
    """Radius so that shifted boxes keep >= min_overlap IoU (CornerNet)."""
    height, width = det_size

    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = jnp.sqrt(b1**2 - 4 * a1 * c1)
    r1 = (b1 + sq1) / 2

    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = jnp.sqrt(b2**2 - 4 * a2 * c2)
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = jnp.sqrt(b3**2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2
    return jnp.minimum(jnp.minimum(r1, r2), r3)
