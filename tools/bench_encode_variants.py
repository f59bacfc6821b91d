"""Encode design-space microbench (round 2): interp strategies.

All variants share the SAME fast 256-lane row gather (measured at full gather
bandwidth); they differ in how the 8 trilinear corners get extracted:

  gather-only : no interp (lower bound)
  dense       : production 125-lane weight outer product (round-1)
  lanegather  : take_along_axis per corner, [M]-shaped accumulation chains
  onehot      : corner weights synthesized per lane inside the reduce
                (pure elementwise + reduce -> fusible into the gather)

And backward strategies for the table cotangent (timed standalone):

  bwd-dense   : w125 outer product f32 rows + row scatter-add (round-1)
  bwd-onehot16: one-hot-synthesized bf16 g-rows + row scatter-add

Run: python tools/bench_encode_variants.py [--samples 256]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, *a, iters=10):
    # float() forces a real D2H readback — on the tunneled axon backend
    # block_until_ready alone has been observed to return before execution
    out = fn(*a)
    float(jnp.sum(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    float(jnp.sum(out))
    return (time.perf_counter() - t0) / iters * 1e3


CORNERS = [(dx, dy, dz) for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=256)
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from perf_tpu.kernels.brickgrid import (
        BrickGridConfig, init_brick_table, _axis_split, _brick_index,
        BLANE, ROW)

    def _axis_weight_vec(local, frac):
        # two-nonzero 5-vector (the round-1 dense-interp formulation, kept
        # here for the historical 'dense' variant)
        lanes = jnp.arange(BLANE, dtype=jnp.int32)
        l = local[..., None]
        w = frac[..., None]
        return (lanes == l) * (1.0 - w) + (lanes == l + 1) * w
    from perf_tpu.kernels.hashgrid import level_strides

    cfg = BrickGridConfig()
    strides = level_strides(cfg, 5e-4, args.samples)
    table = init_brick_table(jax.random.PRNGKey(0), cfg)
    table_flat = table.reshape(-1, table.shape[-1])
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(args.rays, 3))
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    t0v = rng.uniform(0.3, 0.8, (args.rays, 1))
    t = t0v + np.arange(args.samples)[None, :] * 5e-4
    pts = 0.5 + 0.5 * dirs[:, None, :] * t[:, :, None] * 0.9
    X, Y, Z = (jnp.asarray(pts[..., i], jnp.float32) for i in range(3))

    def level_inputs(x, y, z, lvl):
        k = strides[lvl]
        if k > 1:
            x = jnp.concatenate([x[:, ::k], x[:, -1:]], axis=1)
            y = jnp.concatenate([y[:, ::k], y[:, -1:]], axis=1)
            z = jnp.concatenate([z[:, ::k], z[:, -1:]], axis=1)
        res = cfg.level_res(lvl)
        nb = cfg.level_bricks(lvl)
        bx, lx, fx = _axis_split(x, res, False)
        by, ly, fy = _axis_split(y, res, False)
        bz, lz, fz = _axis_split(z, res, False)
        rows = _brick_index(bx, by, bz, nb, cfg.n_bricks) + lvl * cfg.n_bricks
        base = lx * 25 + ly * 5 + lz
        return rows, base, fx, fy, fz, lx, ly, lz

    def gather_only(tf, x, y, z):
        acc = 0.0
        for lvl in range(cfg.n_levels):
            rows, *_ = level_inputs(x, y, z, lvl)
            v = tf.astype(jnp.bfloat16)[rows].astype(jnp.float32)
            acc = acc + jnp.sum(v)
        return acc

    def dense(tf, x, y, z):
        acc = 0.0
        for lvl in range(cfg.n_levels):
            rows, base, fx, fy, fz, lx, ly, lz = level_inputs(x, y, z, lvl)
            wx = _axis_weight_vec(lx, fx)
            wy = _axis_weight_vec(ly, fy)
            wz = _axis_weight_vec(lz, fz)
            w = (wx[..., :, None, None] * wy[..., None, :, None]
                 * wz[..., None, None, :]).reshape(*rows.shape, BLANE ** 3)
            v = tf.astype(jnp.bfloat16)[rows].astype(jnp.float32)
            for f in range(2):
                acc = acc + jnp.sum(
                    jnp.sum(v[..., f * ROW: f * ROW + BLANE ** 3] * w, -1))
        return acc

    def lanegather(tf, x, y, z):
        acc = 0.0
        for lvl in range(cfg.n_levels):
            rows, base, fx, fy, fz, *_ = level_inputs(x, y, z, lvl)
            v = tf.astype(jnp.bfloat16)[rows]                # [N, P, 256]
            for f in range(2):
                out = 0.0
                for dx, dy, dz in CORNERS:
                    lane = base + (dx * 25 + dy * 5 + dz) + f * ROW
                    val = jnp.take_along_axis(v, lane[..., None],
                                              axis=-1)[..., 0]
                    wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                           * (fz if dz else 1 - fz))
                    out = out + val.astype(jnp.float32) * wgt
                acc = acc + jnp.sum(out)
        return acc

    def onehot(tf, x, y, z):
        lanes = jnp.arange(ROW, dtype=jnp.int32)
        acc = 0.0
        for lvl in range(cfg.n_levels):
            rows, base, fx, fy, fz, *_ = level_inputs(x, y, z, lvl)
            v = tf.astype(jnp.bfloat16)[rows].astype(jnp.float32)
            lane_eq = lanes[None, None, :]
            w_lane = 0.0
            for dx, dy, dz in CORNERS:
                tgt = (base + dx * 25 + dy * 5 + dz)[..., None]
                wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                       * (fz if dz else 1 - fz))[..., None]
                w_lane = w_lane + (lane_eq == tgt) * wgt
            for f in range(2):
                acc = acc + jnp.sum(v[..., f * ROW: f * ROW + ROW] * w_lane)
        return acc

    print(f"shape {args.rays}x{args.samples}")
    for name, fn in (("gather-only", gather_only), ("dense", dense),
                     ("lanegather", lanegather), ("onehot", onehot)):
        f = jax.jit(fn)
        print(f"  {name:12s} fwd {timed(f, table_flat, X, Y, Z, iters=args.iters):7.1f} ms",
              flush=True)

    # ---- backward strategies: cotangent-row build + scatter-add ----------
    # bwd benches run at half the rays: the stand-in keeps several grow
    # buffers alive concurrently (the real code's scatters serialize them)
    XH, YH, ZH = X[:4096], Y[:4096], Z[:4096]

    def bwd_dense(tf, x, y, z):
        gt = jnp.zeros(tf.shape, jnp.float32)
        for lvl in range(cfg.n_levels):
            rows, base, fx, fy, fz, lx, ly, lz = level_inputs(x, y, z, lvl)
            g0 = fx + fy            # stand-in per-feature output cotangents
            g1 = fx - fz
            wx = _axis_weight_vec(lx, fx)
            wy = _axis_weight_vec(ly, fy)
            wz = _axis_weight_vec(lz, fz)
            w = (wx[..., :, None, None] * wy[..., None, :, None]
                 * wz[..., None, None, :]).reshape(*rows.shape, BLANE ** 3)
            pad = jnp.zeros((*rows.shape, ROW - BLANE ** 3))
            grow = jnp.concatenate(
                [w * g0[..., None], pad, w * g1[..., None], pad], axis=-1)
            gt = gt.at[rows].add(grow)
        return jnp.sum(gt)

    def bwd_onehot16(tf, x, y, z):
        lanes = jnp.arange(2 * ROW, dtype=jnp.int32)
        gt = jnp.zeros(tf.shape, jnp.float32)
        for lvl in range(cfg.n_levels):
            rows, base, fx, fy, fz, *_ = level_inputs(x, y, z, lvl)
            g = (fx + fy, fx - fz)
            grow = 0.0
            lane_eq = lanes[None, None, :]
            for dx, dy, dz in CORNERS:
                off = base + dx * 25 + dy * 5 + dz
                wgt = ((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                       * (fz if dz else 1 - fz))
                for f in range(2):
                    grow = grow + ((lane_eq == (off + f * ROW)[..., None])
                                   * (wgt * g[f])[..., None])
            gt = gt.at[rows].add(grow.astype(jnp.bfloat16).astype(jnp.float32))
        return jnp.sum(gt)

    for name, fn in (("bwd-dense", bwd_dense), ("bwd-onehot16", bwd_onehot16)):
        f = jax.jit(fn)
        print(f"  {name:12s} (4096 rays) "
              f"{timed(f, table_flat, XH, YH, ZH, iters=args.iters):7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
