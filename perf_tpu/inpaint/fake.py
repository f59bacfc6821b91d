"""Fake inpainter: multiscale normalized-convolution hole fill.

Stands in for LaMa/Stable-Diffusion in hermetic tests (SURVEY §4): fills
holes with a smooth extension of the surrounding content — no checkpoint,
fully jitted, deterministic. Quality is obviously below a diffusion model,
but the pipeline contract (plausible colors where mask==1, exact passthrough
where mask==0) holds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .interface import Inpainter


def _avg3(x: jnp.ndarray) -> jnp.ndarray:
    """3x3 box filter on [H, W, C] with zero padding."""
    h, w = x.shape[0], x.shape[1]
    p = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    acc = None
    for dy in range(3):
        for dx in range(3):
            s = p[dy:dy + h, dx:dx + w]
            acc = s if acc is None else acc + s
    return acc / 9.0


def _down2(x: jnp.ndarray) -> jnp.ndarray:
    h, w, c = x.shape
    return x[: h // 2 * 2, : w // 2 * 2].reshape(h // 2, 2, w // 2, 2, c).mean((1, 3))


def _up2(x: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    y = jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)
    return y[:h, :w]


def normalized_fill(img: jnp.ndarray, known: jnp.ndarray,
                    n_levels: int = 5, smooth_iters: int = 4) -> jnp.ndarray:
    """Pull-push fill: average known content down a pyramid, push back up
    into holes, then relax with a few normalized 3x3 smoothing passes."""
    h, w = img.shape[0], img.shape[1]
    imgs = [img * known]
    ws = [known]
    for _ in range(n_levels):
        if min(imgs[-1].shape[0], imgs[-1].shape[1]) < 4:
            break
        imgs.append(_down2(imgs[-1]))
        ws.append(_down2(ws[-1]))
    # coarsest: normalize
    cur = imgs[-1] / jnp.maximum(ws[-1], 1e-6)
    for lvl in range(len(imgs) - 2, -1, -1):
        hi, wi = imgs[lvl].shape[0], imgs[lvl].shape[1]
        up = _up2(cur, hi, wi)
        filled = imgs[lvl] + up * (1.0 - ws[lvl])
        wl = ws[lvl] + (1.0 - ws[lvl])
        cur = filled / jnp.maximum(wl, 1e-6)
    out = img * known + cur * (1.0 - known)
    for _ in range(smooth_iters):
        sm = _avg3(out)
        out = img * known + sm * (1.0 - known)
    return jnp.clip(out, 0.0, 1.0)


class FakeInpainter(Inpainter):
    def __init__(self, n_levels: int = 6, smooth_iters: int = 4):
        self.n_levels = n_levels
        self.smooth_iters = smooth_iters
        self._fill = jax.jit(lambda i, k: normalized_fill(
            i, k, self.n_levels, self.smooth_iters))

    def inpaint(self, img, mask):
        img = jnp.asarray(img)
        h, w = img.shape[0], img.shape[1]
        known = 1.0 - jnp.asarray(mask).reshape(h, w, -1)[..., :1].astype(jnp.float32)
        return self._fill(img, known)

    def inpaint_rgbd(self, img, distance, mask):
        out = self.inpaint(img, mask)
        dist = self.inpaint(jnp.repeat(jnp.asarray(distance).reshape(
            img.shape[0], img.shape[1], 1), 3, axis=-1), mask)[..., :1]
        return out, dist
