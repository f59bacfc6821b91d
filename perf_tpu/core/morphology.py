"""Image morphology + small filters in pure jnp.

Replaces the reference's kornia calls (laplacian edge masks in
``sup_info.py:76-81`` / ``geo_utils.py:189-197``; ellipse-kernel
erosion/dilation in ``nerf.py:345-358`` and ``sup_info.py:289-301``) with
jit-compatible shift-and-reduce implementations. Flat structuring elements
only — exactly what the reference uses.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

_BIG = 1e9


def ellipse_kernel(size: int) -> np.ndarray:
    """Binary ellipse structuring element (cv2.getStructuringElement parity)."""
    # cv2's MORPH_ELLIPSE: inscribed ellipse with special-cased small radii.
    r = size // 2
    inv_r2 = 1.0 / (r * r) if r > 0 else 0.0
    k = np.zeros((size, size), dtype=np.float32)
    for i in range(size):
        dy = i - r
        if abs(dy) <= r:
            dx = int(round(r * np.sqrt(max(0.0, 1.0 - dy * dy * inv_r2)))) if r > 0 else 0
        else:
            dx = -1
        if dx >= 0:
            k[i, r - dx: r + dx + 1] = 1.0
    return k


def _morph(img: jnp.ndarray, se: np.ndarray, is_dilation: bool) -> jnp.ndarray:
    """Flat morphology on [H, W] or [H, W, C] via shifted-slice reduction.

    Border handling is "geodesic": out-of-image neighbors never win
    (pad with -inf for dilation, +inf for erosion).
    """
    squeeze = False
    if img.ndim == 2:
        img = img[..., None]
        squeeze = True
    kh, kw = se.shape
    cy, cx = kh // 2, kw // 2
    pad_val = -_BIG if is_dilation else _BIG
    padded = jnp.pad(img, ((cy, kh - 1 - cy), (cx, kw - 1 - cx), (0, 0)),
                     constant_values=pad_val)
    h, w = img.shape[0], img.shape[1]
    acc = None
    for dy, dx in np.argwhere(se > 0):
        sl = padded[dy: dy + h, dx: dx + w]
        if acc is None:
            acc = sl
        elif is_dilation:
            acc = jnp.maximum(acc, sl)
        else:
            acc = jnp.minimum(acc, sl)
    out = acc if acc is not None else img
    return out[..., 0] if squeeze else out


def dilation(img: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return _morph(img, se, is_dilation=True)


def erosion(img: jnp.ndarray, se: np.ndarray) -> jnp.ndarray:
    return _morph(img, se, is_dilation=False)


def laplacian3(img: jnp.ndarray) -> jnp.ndarray:
    """Normalized 3x3 laplacian (kornia parity: kernel/16, reflect border).

    img [H, W] or [H, W, 1] -> same shape.
    """
    squeeze = False
    if img.ndim == 3:
        img = img[..., 0]
        squeeze = True
    padded = jnp.pad(img, 1, mode="reflect")
    h, w = img.shape
    acc = -8.0 * img
    for dy in (0, 1, 2):
        for dx in (0, 1, 2):
            if dy == 1 and dx == 1:
                continue
            acc = acc + padded[dy: dy + h, dx: dx + w]
    out = acc / 16.0
    return out[..., None] if squeeze else out


def edge_keep_mask(val: jnp.ndarray, threshold: float = 0.01) -> jnp.ndarray:
    """Mask of NON-edge pixels of a scalar map (1 = keep for supervision).

    Counterpart of the reference's depth-Laplacian edge filter
    (``sup_info.py:76-81``): |laplacian| < thr, then 3x3 erosion and 3x3
    dilation (morphological opening). val [H, W] or [H, W, 1]; returns bool of
    the same rank with trailing dim 1.
    """
    if val.ndim == 2:
        val = val[..., None]
    lap = laplacian3(val[..., 0])
    keep = (jnp.abs(lap) < threshold).astype(jnp.float32)
    se = np.ones((3, 3), dtype=np.float32)
    keep = dilation(erosion(keep, se), se)
    return (keep > 0.5)[..., None]


def binary_open_close(mask: jnp.ndarray, small: int, large: int,
                      dilate_first: bool = True) -> jnp.ndarray:
    """Dilate with a small ellipse then erode with a large one.

    The reference applies this to visibility masks (dilate 5, erode 9 —
    ``nerf.py:345-358``) and conflict masks (dilate 3, erode 9 —
    ``sup_info.py:289-301``) to despeckle and shrink them conservatively.
    mask [H, W] float/bool in {0, 1} -> float [H, W].
    """
    m = mask.astype(jnp.float32)
    if dilate_first:
        m = dilation(m, ellipse_kernel(small))
        m = erosion(m, ellipse_kernel(large))
    else:
        m = erosion(m, ellipse_kernel(large))
        m = dilation(m, ellipse_kernel(small))
    return m


def align_scale(a, b, mask, q: float = 0.95) -> float:
    """Quantile-trimmed global scale b/a (reference ``geo_utils.py:200-219``)."""
    a = jnp.asarray(a)
    b = jnp.asarray(b)
    mask = jnp.asarray(mask).astype(bool)

    def clipped(x):
        lo = jnp.quantile(x, 1.0 - q)
        hi = jnp.quantile(x, q)
        return (x >= lo) & (x <= hi)

    m = mask & clipped(a) & clipped(b)
    w = m.astype(a.dtype)
    mean_a = jnp.sum(a * w) / jnp.maximum(jnp.sum(w), 1.0)
    mean_b = jnp.sum(b * w) / jnp.maximum(jnp.sum(w), 1.0)
    return float(mean_b / mean_a)
