"""Stride-GROUPED brick ray encode: one gather per distinct stride, A/B'd
against the shipped per-level encode (kernels/brickgrid.brick_encode_ray).

Hypothesis (VERDICT r3 item 2): the bucketed geo step issues one gather +
one scatter PER LEVEL (16 each at the flagship ladder); levels sharing a
subsampling stride read the same sample positions, so stacking them into
the row index (exactly like brick_encode_stacked, kernels/brickgrid.py:268)
turns 16 gather/scatter pairs into <=5 — same rows, same math, fewer ops.
At 8192x112-256 flagship shapes each op carries fixed scheduling cost, and
the round-2 trace attributed ~230 ms of the 620 ms r1 step to scheduling
gaps between exactly these ops.

Run CPU parity first (free), then on the idle chip:

    python tools/bench_grouped_encode.py --cpu      # parity + CPU timing
    python tools/bench_grouped_encode.py            # chip A/B

If the grouped path wins, it moves into kernels/brickgrid.py behind the
same brick_encode_ray contract (strides tuple), replacing the per-level
loop wholesale (no knob — same numerics).
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def brick_encode_ray_grouped(table, x, y, z, cfg, strides):
    """Drop-in for brick_encode_ray: x/y/z [N, S] -> [N, S, L*F], ONE
    row gather (and one vjp scatter) per distinct stride value.

    Levels with the same stride share subsampled coords; their rows stack
    along a leading group axis with a +lvl*n_bricks offset into the flat
    [L*n_bricks, C] table view — the brick_encode_stacked plan
    (kernels/brickgrid.py:268-310) applied per stride-group on the ray
    layout. Output ordering matches brick_encode_ray exactly
    (level-major, features interleaved within level).
    """
    from perf_tpu.kernels.brickgrid import (
        _axis_split, _brick_index, _interp_from_rows, corner_interp_lowp,
    )
    from perf_tpu.kernels.hashgrid import _lerp_upsample

    smooth = cfg.interpolation == "smoothstep"
    n, s = x.shape
    nf = cfg.n_features
    nb_rows = table.shape[1]
    flat_table = table.reshape(cfg.n_levels * nb_rows, table.shape[-1])

    groups = {}
    for lvl in range(cfg.n_levels):
        groups.setdefault(strides[lvl], []).append(lvl)

    outs = [None] * (cfg.n_levels * nf)
    for k, lvls in sorted(groups.items()):
        if k == 1:
            xs, ys, zs = x, y, z
        else:
            assert s % k == 0
            xs = jnp.concatenate([x[:, ::k], x[:, -1:]], axis=1)
            ys = jnp.concatenate([y[:, ::k], y[:, -1:]], axis=1)
            zs = jnp.concatenate([z[:, ::k], z[:, -1:]], axis=1)
        rows_l, locs_l, fracs_l = [], [], []
        for lvl in lvls:
            res = cfg.level_res(lvl)
            nb = cfg.level_bricks(lvl)
            bx, lx, fx = _axis_split(xs, res, smooth)
            by, ly, fy = _axis_split(ys, res, smooth)
            bz, lz, fz = _axis_split(zs, res, smooth)
            rows_l.append(_brick_index(bx, by, bz, nb, nb_rows)
                          + lvl * nb_rows)
            locs_l.append((lx, ly, lz))
            fracs_l.append((fx, fy, fz))
        rows = jnp.stack(rows_l)                         # [G, N, P]
        locs = tuple(jnp.stack([locs_l[g][a] for g in range(len(lvls))])
                     for a in range(3))
        fracs = tuple(jnp.stack([fracs_l[g][a] for g in range(len(lvls))])
                      for a in range(3))
        if cfg.bf16_table:
            feats = corner_interp_lowp(nf, flat_table, rows, locs, fracs)
        else:
            feats = _interp_from_rows(flat_table[rows], locs, fracs, nf)
        for gi, lvl in enumerate(lvls):
            for f in range(nf):
                outs[lvl * nf + f] = _lerp_upsample(feats[f][gi], k, s)
    return jnp.stack(outs, axis=-1)


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[0])


def timed(fn, *a, iters=10):
    out = fn(*a)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*a)
    _sync(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--rays", type=int, default=8192)
    ap.add_argument("--samples", type=int, default=112,
                    help="flagship adaptive budget (also try 256 = cap)")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import perf_tpu
    perf_tpu.enable_persistent_compilation_cache()

    from perf_tpu.kernels.brickgrid import BrickGridConfig, brick_encode_ray
    from perf_tpu.kernels.hashgrid import level_strides

    cfg = BrickGridConfig()
    step = 5e-4
    n, s = args.rays, args.samples
    strides = level_strides(cfg, step, s)
    print(f"strides: {strides} -> {len(set(strides))} gather groups "
          f"(vs {cfg.n_levels} per-level ops)")

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    table = jax.random.uniform(k1, (cfg.n_levels, cfg.n_bricks, 128),
                               minval=-1e-1, maxval=1e-1)
    # ray-structured coords: random origins, small increasing t (t-ordered)
    o = jax.random.uniform(k2, (n, 3), minval=0.1, maxval=0.9)
    d = jax.random.normal(k3, (n, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.cumsum(jax.random.uniform(k4, (n, s), minval=2e-4, maxval=1e-3),
                   axis=1)
    x = jnp.clip(o[:, 0:1] + d[:, 0:1] * t, 0.0, 1.0)
    y = jnp.clip(o[:, 1:2] + d[:, 1:2] * t, 0.0, 1.0)
    z = jnp.clip(o[:, 2:3] + d[:, 2:3] * t, 0.0, 1.0)

    base = jax.jit(lambda tb, x, y, z: brick_encode_ray(tb, x, y, z, cfg,
                                                        strides))
    grouped = jax.jit(lambda tb, x, y, z: brick_encode_ray_grouped(
        tb, x, y, z, cfg, strides))

    # -- parity (fwd + table grads) --------------------------------------
    fa = base(table, x, y, z)
    fb = grouped(table, x, y, z)
    err = float(jnp.max(jnp.abs(fa - fb)))
    print(f"fwd parity: max|diff| = {err:.2e}")
    assert err < 1e-5, "grouped encode diverges from per-level encode"

    def loss_a(tb):
        return jnp.sum(jnp.sin(brick_encode_ray(tb, x, y, z, cfg, strides)))

    def loss_b(tb):
        return jnp.sum(jnp.sin(brick_encode_ray_grouped(tb, x, y, z, cfg,
                                                        strides)))

    ga = jax.jit(jax.grad(loss_a))(table)
    gb = jax.jit(jax.grad(loss_b))(table)
    gerr = float(jnp.max(jnp.abs(ga - gb)))
    scale = float(jnp.max(jnp.abs(ga))) + 1e-12
    print(f"grad parity: max|diff| = {gerr:.2e} (rel {gerr / scale:.2e})")
    assert gerr / scale < 1e-4, "grouped vjp diverges"

    # -- timing -----------------------------------------------------------
    I = args.iters
    res = {
        "per-level fwd": timed(base, table, x, y, z, iters=I),
        "grouped   fwd": timed(grouped, table, x, y, z, iters=I),
        "per-level fwd+bwd": timed(jax.jit(jax.grad(loss_a)), table, iters=I),
        "grouped   fwd+bwd": timed(jax.jit(jax.grad(loss_b)), table, iters=I),
    }
    print(f"\nshape: {n} rays x {s} samples, "
          f"platform {jax.devices()[0].platform}")
    for k, v in res.items():
        print(f"  {k:20s} {v:8.1f} ms")
    speedup = res["per-level fwd+bwd"] / res["grouped   fwd+bwd"]
    print(f"\nfwd+bwd speedup: {speedup:.2f}x "
          f"({'WIN — wire into brickgrid' if speedup > 1.05 else 'no win'})")


if __name__ == "__main__":
    main()
