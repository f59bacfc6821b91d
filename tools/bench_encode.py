"""Microbenchmark: brick encode fwd / fwd+bwd at the flagship train shape.

Compares per-level gathers (round-1 behavior, forced via _MAX_GROUP_ROWS=1)
against stride-grouped gathers. Run on the real TPU chip:

    python tools/bench_encode.py [--rays 8192] [--samples 256] [--iters 10]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from perf_tpu.kernels import brickgrid
    from perf_tpu.kernels.brickgrid import (
        BrickGridConfig, init_brick_table, brick_encode_ray)
    from perf_tpu.kernels.hashgrid import level_strides

    cfg = BrickGridConfig()
    strides = level_strides(cfg, 5e-4, args.samples)
    print("strides:", strides)
    table = init_brick_table(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    # ray-structured coords (the train-step access pattern): origin center,
    # random directions, contiguous t window starting at a random surface hit
    dirs = rng.normal(size=(args.rays, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    t0 = rng.uniform(0.3, 0.8, (args.rays, 1))
    t = t0 + np.arange(args.samples)[None, :] * 5e-4
    pts = 0.5 + 0.5 * dirs[:, None, :] * t[:, :, None] * 0.9
    x, y, z = (jnp.asarray(pts[..., i], jnp.float32) for i in range(3))

    def encode_loss(t):
        return jnp.sum(brick_encode_ray(t, x, y, z, cfg, strides) ** 2)

    def timed(fn, *a):
        out = fn(*a)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / args.iters * 1e3

    for mode, cap in (("per-level", 1), ("grouped", 4 << 20)):
        brickgrid._MAX_GROUP_ROWS = cap
        fwd = jax.jit(lambda t: brick_encode_ray(t, x, y, z, cfg, strides))
        bwd = jax.jit(jax.value_and_grad(encode_loss))
        t_f = timed(fwd, table)
        t_b = timed(bwd, table)
        print(f"{mode:10s} fwd {t_f:7.1f} ms   fwd+bwd {t_b:7.1f} ms")


if __name__ == "__main__":
    main()
