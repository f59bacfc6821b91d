"""LR schedule + loss primitives shared by all training loops."""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    """Trapezoid + cosine schedule (reference ``NeRFScene.update_lr``,
    ``nerf.py:300-311``): linear ramp init_lr -> peak_lr over the first
    ``peak_at`` fraction, then cosine decay to ``peak_lr * lr_alpha``."""

    init_lr: float = 0.0
    peak_lr: float = 1e-2
    peak_at: float = 0.2
    lr_alpha: float = 1e-2


def lr_at(progress, cfg: OptimConfig):
    """LR at training progress in [0, 1]. jnp-traceable."""
    progress = jnp.asarray(progress)
    ramp = progress / cfg.peak_at
    lr_ramp = cfg.peak_lr * ramp + cfg.init_lr * (1.0 - ramp)
    local = (progress - cfg.peak_at) / (1.0 - cfg.peak_at)
    factor = ((jnp.cos(local * jnp.pi) + 1.0) * 0.5 * (1.0 - cfg.lr_alpha)
              + cfg.lr_alpha)
    lr_cos = cfg.peak_lr * factor
    return jnp.where(progress < cfg.peak_at, lr_ramp, lr_cos)


def smooth_l1(pred, target, beta: float):
    """torch.nn.functional.smooth_l1_loss(beta=...) with mean reduction."""
    d = jnp.abs(pred - target)
    return jnp.mean(jnp.where(d < beta, 0.5 * d * d / beta, d - 0.5 * beta))


def cosine_two_phase_lr(progress, init_lr: float, lr_alpha: float = 1e-2):
    """Pure cosine decay to init_lr * lr_alpha — the geometry-distillation
    schedule (reference ``pano_joint_predictor.py:216-224``)."""
    progress = jnp.asarray(progress)
    ratio = (jnp.cos(progress * jnp.pi) + 1.0) * (1.0 - lr_alpha) + lr_alpha
    return init_lr * ratio
